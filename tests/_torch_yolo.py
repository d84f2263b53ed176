"""A pure-torch replica of the Ultralytics YOLOv8 DetectionModel.

Built from the public yolov8 architecture description so that
``state_dict()`` reproduces the exact key layout of a real ``yolov8*.pt``
checkpoint (``model.{i}.<sub>`` with the yaml layer indices 0-22) and the
forward pass reproduces its numerics. Used by tests/test_pretrained.py to
prove models/pretrained.import_yolov8 maps real-layout checkpoints
correctly: keys, shapes AND outputs (reference consumes such checkpoints at
eval_all.py:47-54).
"""

import torch
from torch import nn

from robust_object_detection_tpu.models.layers import (scale_channels,
                                                       scale_depth)

REG_MAX = 16


class Conv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class Bottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True):
        super().__init__()
        self.cv1 = Conv(c1, c2, 3)
        self.cv2 = Conv(c2, c2, 3)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = Conv(c1, 2 * self.c, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            Bottleneck(self.c, self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class SPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1)
        self.cv2 = Conv(c_ * 4, c2, 1)
        self.m = nn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class DFL(nn.Module):
    def __init__(self, c1=REG_MAX):
        super().__init__()
        self.conv = nn.Conv2d(c1, 1, 1, bias=False)
        self.conv.weight.data[:] = torch.arange(
            c1, dtype=torch.float).view(1, c1, 1, 1)
        self.conv.weight.requires_grad_(False)


class Detect(nn.Module):
    def __init__(self, nc, ch):
        super().__init__()
        c2 = max(16, ch[0] // 4, REG_MAX * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(Conv(x, c2, 3), Conv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * REG_MAX, 1)) for x in ch)
        self.cv3 = nn.ModuleList(
            nn.Sequential(Conv(x, c3, 3), Conv(c3, c3, 3),
                          nn.Conv2d(c3, nc, 1)) for x in ch)
        self.dfl = DFL()

    def forward(self, feats):
        # raw per-level maps, matching models/yolov8.Head output
        return [(self.cv2[i](f), self.cv3[i](f))
                for i, f in enumerate(feats)]


class Upsample(nn.Module):
    def forward(self, x):
        return nn.functional.interpolate(x, scale_factor=2, mode="nearest")


class Concat(nn.Module):
    def forward(self, xs):
        return torch.cat(xs, 1)


class DetectionModel(nn.Module):
    """Layer indices match the yolov8 yaml so state_dict keys are
    ``model.{i}...`` exactly as a real checkpoint's."""

    def __init__(self, nc=6, variant="n"):
        super().__init__()
        from robust_object_detection_tpu.models.yolov8 import VARIANTS
        d, w, mc = VARIANTS[variant]

        def c(base):
            return scale_channels(base, w, mc)

        def n(base):
            return scale_depth(base, d)

        self.model = nn.ModuleList([
            Conv(3, c(64), 3, 2),                       # 0
            Conv(c(64), c(128), 3, 2),                  # 1
            C2f(c(128), c(128), n(3), True),            # 2
            Conv(c(128), c(256), 3, 2),                 # 3
            C2f(c(256), c(256), n(6), True),            # 4
            Conv(c(256), c(512), 3, 2),                 # 5
            C2f(c(512), c(512), n(6), True),            # 6
            Conv(c(512), c(1024), 3, 2),                # 7
            C2f(c(1024), c(1024), n(3), True),          # 8
            SPPF(c(1024), c(1024)),                     # 9
            Upsample(),                                 # 10
            Concat(),                                   # 11
            C2f(c(1024) + c(512), c(512), n(3)),        # 12
            Upsample(),                                 # 13
            Concat(),                                   # 14
            C2f(c(512) + c(256), c(256), n(3)),         # 15
            Conv(c(256), c(256), 3, 2),                 # 16
            Concat(),                                   # 17
            C2f(c(512) + c(256), c(512), n(3)),         # 18
            Conv(c(512), c(512), 3, 2),                 # 19
            Concat(),                                   # 20
            C2f(c(1024) + c(512), c(1024), n(3)),       # 21
            Detect(nc, (c(256), c(512), c(1024))),      # 22
        ])

    def forward(self, x):
        m = self.model
        x = m[1](m[0](x))
        x = m[2](x)
        p3 = m[4](m[3](x))
        p4 = m[6](m[5](p3))
        x = m[8](m[7](p4))
        p5 = m[9](x)
        t4 = m[12](m[11]([m[10](p5), p4]))
        t3 = m[15](m[14]([m[13](t4), p3]))
        b4 = m[18](m[17]([m[16](t3), t4]))
        b5 = m[21](m[20]([m[19](b4), p5]))
        return m[22]([t3, b4, b5])


def randomize(model: nn.Module, seed: int = 0) -> nn.Module:
    """Non-trivial weights + running stats so parity tests are meaningful."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "dfl" in name:
                continue
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(1.0 + torch.rand(b.shape, generator=g) * 0.5)
    return model.eval()
