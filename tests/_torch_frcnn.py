"""Pure-torch replica of torchvision's ``fasterrcnn_resnet50_fpn_v2``.

Reproduces the exact ``state_dict()`` key layout of the checkpoint the
reference fine-tunes from (train_frcnn_baseline.py:139) — backbone.body
ResNet-50, backbone.fpn inner/layer Conv2dNormActivation blocks, the v2
two-conv rpn.head and the conv+FC roi_heads.box_head — plus forward helpers
for the pieces our static-shape pipeline shares (pyramid, RPN maps, box
head), so tests/test_pretrained.py can assert numerical parity after
models/pretrained.import_frcnn.
"""

import torch
from torch import nn
import torch.nn.functional as Fn


class Bottleneck(nn.Module):
    def __init__(self, c_in, width, stride=1):
        super().__init__()
        c_out = width * 4
        self.conv1 = nn.Conv2d(c_in, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, c_out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(c_out)
        self.relu = nn.ReLU(inplace=True)
        if stride != 1 or c_in != c_out:
            self.downsample = nn.Sequential(
                nn.Conv2d(c_in, c_out, 1, stride, bias=False),
                nn.BatchNorm2d(c_out))
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idn)


class ResNetBody(nn.Module):
    def __init__(self, stages=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        c_in = 64
        for i, n in enumerate(stages):
            width = 64 * 2 ** i
            blocks = []
            for j in range(n):
                stride = 2 if (j == 0 and i > 0) else 1
                blocks.append(Bottleneck(c_in, width, stride))
                c_in = width * 4
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return [c2, c3, c4, c5]


def _cna(c_in, c_out, k):
    """Conv2dNormActivation(activation=None): conv bias-free + BN."""
    return nn.Sequential(nn.Conv2d(c_in, c_out, k, 1, k // 2, bias=False),
                         nn.BatchNorm2d(c_out))


class FPN(nn.Module):
    def __init__(self, in_channels=(256, 512, 1024, 2048), out=256):
        super().__init__()
        self.inner_blocks = nn.ModuleList(
            _cna(c, out, 1) for c in in_channels)
        self.layer_blocks = nn.ModuleList(
            _cna(out, out, 3) for _ in in_channels)

    def forward(self, feats):
        inners = [b(f) for b, f in zip(self.inner_blocks, feats)]
        outs = [inners[-1]]
        for inner in inners[-2::-1]:
            outs.insert(0, inner + Fn.interpolate(
                outs[0], scale_factor=2, mode="nearest"))
        outs = [b(o) for b, o in zip(self.layer_blocks, outs)]
        outs.append(Fn.max_pool2d(outs[-1], 1, 2))   # LastLevelMaxPool
        return outs


class Backbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.body = ResNetBody()
        self.fpn = FPN()

    def forward(self, x):
        return self.fpn(self.body(x))


class RPNHead(nn.Module):
    """v2: conv_depth=2 Conv2dNormActivation(norm=None) = conv+bias."""

    def __init__(self, c=256, num_anchors=3):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Sequential(nn.Conv2d(c, c, 3, 1, 1)),
            nn.Sequential(nn.Conv2d(c, c, 3, 1, 1)))
        self.cls_logits = nn.Conv2d(c, num_anchors, 1)
        self.bbox_pred = nn.Conv2d(c, num_anchors * 4, 1)

    def forward(self, feats):
        objs, boxes = [], []
        for f in feats:
            h = f
            for blk in self.conv:
                h = Fn.relu(blk(h))
            objs.append(self.cls_logits(h))
            boxes.append(self.bbox_pred(h))
        return objs, boxes


class RPN(nn.Module):
    def __init__(self):
        super().__init__()
        self.head = RPNHead()


class BoxHead(nn.Module):
    """v2 FastRCNNConvFCHead((256,7,7), [256]*4, [1024], BN)."""

    def __init__(self):
        super().__init__()
        layers = [_cna(256, 256, 3) for _ in range(4)]
        layers.append(nn.Flatten())
        layers.append(nn.Linear(256 * 7 * 7, 1024))
        self.blocks = nn.Sequential(*layers)

    def forward(self, x):
        for i in range(4):
            x = Fn.relu(self.blocks[i](x))
        x = self.blocks[4](x)
        return Fn.relu(self.blocks[5](x))


class BoxPredictor(nn.Module):
    def __init__(self, num_classes=7):
        super().__init__()
        self.cls_score = nn.Linear(1024, num_classes)
        self.bbox_pred = nn.Linear(1024, num_classes * 4)


class RoiHeads(nn.Module):
    def __init__(self, num_classes=7):
        super().__init__()
        self.box_head = BoxHead()
        self.box_predictor = BoxPredictor(num_classes)


class FasterRCNN(nn.Module):
    """Keys: backbone.body.*, backbone.fpn.*, rpn.head.*, roi_heads.* —
    the torchvision layout (box_head Sequential indices via `blocks` being
    renamed below)."""

    def __init__(self, num_classes=7):
        super().__init__()
        self.backbone = Backbone()
        self.rpn = RPN()
        self.roi_heads = RoiHeads(num_classes)

    def state_dict_torchvision(self):
        """state_dict with roi_heads.box_head.blocks.{i} -> box_head.{i}
        (torchvision's FastRCNNConvFCHead IS the Sequential)."""
        out = {}
        for k, v in self.state_dict().items():
            out[k.replace("box_head.blocks.", "box_head.")] = v
        return out

    def forward_parts(self, x, rois):
        """(pyramid, rpn_objs, rpn_boxes, scores, deltas) for parity tests.
        rois: (N, 256, 7, 7) pooled features."""
        pyramid = self.backbone(x)
        objs, boxes = self.rpn.head(pyramid)
        h = self.roi_heads.box_head(rois)
        return (pyramid, objs, boxes,
                self.roi_heads.box_predictor.cls_score(h),
                self.roi_heads.box_predictor.bbox_pred(h))


def randomize(model: nn.Module, seed: int = 0) -> nn.Module:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(1.0 + torch.rand(b.shape, generator=g) * 0.5)
    return model.eval()
