"""Pure-torch replica of the Ultralytics RT-DETR-L (``rtdetr-l.pt``).

Reproduces the exact ``state_dict()`` key layout — ``model.{i}`` yaml
indices 0-9 (HGNetv2 backbone), 10-27 (hybrid encoder) and 28
(RTDETRDecoder) — and the eval-mode forward numerics (grid_sample
deformable attention, AIFI sincos orientation, anchor generation), so
tests/test_pretrained.py can assert that models/pretrained.import_rtdetr
maps real-layout checkpoints onto models/rtdetr.py with output parity.
Reference consumes such checkpoints at train_rtdetr_augmented.py:25 and
eval_all.py:162-192.
"""

import math

import torch
from torch import nn
import torch.nn.functional as Fn


class Conv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, act=True):
        super().__init__()
        if p is None:
            p = k // 2
        self.conv = nn.Conv2d(c1, c2, k, s, p, groups=g, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = (nn.SiLU() if act is True
                    else act if isinstance(act, nn.Module)
                    else nn.Identity())

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class HGStem(nn.Module):
    def __init__(self, c1, cm, c2):
        super().__init__()
        self.stem1 = Conv(c1, cm, 3, 2, act=nn.ReLU())
        self.stem2a = Conv(cm, cm // 2, 2, 1, 0, act=nn.ReLU())
        self.stem2b = Conv(cm // 2, cm, 2, 1, 0, act=nn.ReLU())
        self.stem3 = Conv(cm * 2, cm, 3, 2, act=nn.ReLU())
        self.stem4 = Conv(cm, c2, 1, 1, act=nn.ReLU())
        self.pool = nn.MaxPool2d(2, 1, 0, ceil_mode=True)

    def forward(self, x):
        x = self.stem1(x)
        x = Fn.pad(x, [0, 1, 0, 1])
        x2 = self.stem2a(x)
        x2 = Fn.pad(x2, [0, 1, 0, 1])
        x2 = self.stem2b(x2)
        x1 = self.pool(x)
        x = torch.cat([x1, x2], dim=1)
        return self.stem4(self.stem3(x))


class LightConv(nn.Module):
    def __init__(self, c1, c2, k):
        super().__init__()
        self.conv1 = Conv(c1, c2, 1, act=False)
        self.conv2 = Conv(c2, c2, k, g=c2, act=nn.ReLU())

    def forward(self, x):
        return self.conv2(self.conv1(x))


class HGBlock(nn.Module):
    def __init__(self, c1, cm, c2, k=3, n=6, lightconv=False,
                 shortcut=False):
        super().__init__()
        block = LightConv if lightconv else lambda a, b, kk: Conv(
            a, b, kk, act=nn.ReLU())
        self.m = nn.ModuleList(
            block(c1 if i == 0 else cm, cm, k) for i in range(n))
        self.sc = Conv(c1 + n * cm, c2 // 2, 1, act=nn.ReLU())
        self.ec = Conv(c2 // 2, c2, 1, act=nn.ReLU())
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = [x]
        for m in self.m:
            y.append(m(y[-1]))
        out = self.ec(self.sc(torch.cat(y, 1)))
        return out + x if self.add else out


class DWConv(Conv):
    def __init__(self, c1, c2, k, s, act=False):
        super().__init__(c1, c2, k, s, g=math.gcd(c1, c2), act=act)


class AIFI(nn.Module):
    def __init__(self, c, cm=1024, heads=8):
        super().__init__()
        self.ma = nn.MultiheadAttention(c, heads, batch_first=True)
        self.fc1 = nn.Linear(c, cm)
        self.fc2 = nn.Linear(cm, c)
        self.norm1 = nn.LayerNorm(c)
        self.norm2 = nn.LayerNorm(c)

    @staticmethod
    def pos_embed(w, h, c, temp=10000.0):
        gw, gh = torch.meshgrid(torch.arange(w, dtype=torch.float32),
                                torch.arange(h, dtype=torch.float32),
                                indexing="ij")
        pos_dim = c // 4
        omega = 1.0 / (temp ** (torch.arange(
            pos_dim, dtype=torch.float32) / pos_dim))
        out_w = gw.flatten()[..., None] @ omega[None]
        out_h = gh.flatten()[..., None] @ omega[None]
        return torch.cat([torch.sin(out_w), torch.cos(out_w),
                          torch.sin(out_h), torch.cos(out_h)], 1)[None]

    def forward(self, x):
        b, c, h, w = x.shape
        seq = x.flatten(2).permute(0, 2, 1)
        pos = self.pos_embed(w, h, c)
        q = seq + pos
        attn, _ = self.ma(q, q, seq)
        seq = self.norm1(seq + attn)
        ff = self.fc2(Fn.gelu(self.fc1(seq)))
        seq = self.norm2(seq + ff)
        return seq.permute(0, 2, 1).reshape(b, c, h, w)


class RepConv(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = Conv(c, c, 3, act=False)
        self.conv2 = Conv(c, c, 1, act=False)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.conv1(x) + self.conv2(x))


class RepC3(nn.Module):
    def __init__(self, c1, c2, n=3):
        super().__init__()
        self.cv1 = Conv(c1, c2, 1)
        self.cv2 = Conv(c1, c2, 1)
        self.m = nn.Sequential(*[RepConv(c2) for _ in range(n)])

    def forward(self, x):
        return self.m(self.cv1(x)) + self.cv2(x)


class MSDeformAttn(nn.Module):
    def __init__(self, c=256, levels=3, heads=8, points=4):
        super().__init__()
        self.h, self.l, self.p = heads, levels, points
        self.dh = c // heads
        self.sampling_offsets = nn.Linear(c, heads * levels * points * 2)
        self.attention_weights = nn.Linear(c, heads * levels * points)
        self.value_proj = nn.Linear(c, c)
        self.output_proj = nn.Linear(c, c)

    def forward(self, query, refer_bbox, value, shapes):
        """query (B,Q,C); refer_bbox (B,Q,4) cxcywh [0,1]; value (B,S,C);
        shapes [(h,w)]."""
        b, q, c = query.shape
        v = self.value_proj(value)
        off = self.sampling_offsets(query).view(
            b, q, self.h, self.l, self.p, 2)
        attn = self.attention_weights(query).view(
            b, q, self.h, self.l * self.p)
        attn = attn.softmax(-1).view(b, q, self.h, self.l, self.p)
        loc = (refer_bbox[:, :, None, None, None, :2]
               + off / self.p * refer_bbox[:, :, None, None, None, 2:]
               * 0.5)
        # split per level, grid_sample with zeros padding
        sizes = [h * w for h, w in shapes]
        vs = v.split(sizes, dim=1)
        out = 0
        for li, (h, w) in enumerate(shapes):
            vl = vs[li].view(b, h, w, self.h, self.dh).permute(
                0, 3, 4, 1, 2).reshape(b * self.h, self.dh, h, w)
            g = loc[:, :, :, li] * 2 - 1                   # (B,Q,H,P,2)
            g = g.permute(0, 2, 1, 3, 4).reshape(
                b * self.h, q, self.p, 2)
            s = Fn.grid_sample(vl, g, mode="bilinear",
                               padding_mode="zeros", align_corners=False)
            # s: (B*H, dh, Q, P)
            s = s.view(b, self.h, self.dh, q, self.p)
            a = attn[:, :, :, li].permute(0, 2, 1, 3)      # (B,H,Q,P)
            out = out + (s * a[:, :, None]).sum(-1)        # (B,H,dh,Q)
        out = out.permute(0, 3, 1, 2).reshape(b, q, c)
        return self.output_proj(out)


class MLP(nn.Module):
    def __init__(self, c_in, hidden, c_out, num_layers):
        super().__init__()
        dims = [c_in] + [hidden] * (num_layers - 1)
        self.layers = nn.ModuleList(
            nn.Linear(a, b) for a, b in zip(dims, dims[1:] + [c_out]))

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = l(x) if i == len(self.layers) - 1 else Fn.relu(l(x))
        return x


class DecoderLayer(nn.Module):
    def __init__(self, c=256, heads=8, ffn=1024):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(c, heads, batch_first=True)
        self.norm1 = nn.LayerNorm(c)
        self.cross_attn = MSDeformAttn(c)
        self.norm2 = nn.LayerNorm(c)
        self.linear1 = nn.Linear(c, ffn)
        self.linear2 = nn.Linear(ffn, c)
        self.norm3 = nn.LayerNorm(c)

    def forward(self, embed, refer_bbox, value, shapes, query_pos):
        q = k = embed + query_pos
        sa, _ = self.self_attn(q, k, embed)
        embed = self.norm1(embed + sa)
        ca = self.cross_attn(embed + query_pos, refer_bbox, value, shapes)
        embed = self.norm2(embed + ca)
        ff = self.linear2(Fn.relu(self.linear1(embed)))
        return self.norm3(embed + ff)


class Decoder(nn.Module):
    def __init__(self, layers=6):
        super().__init__()
        self.layers = nn.ModuleList(DecoderLayer() for _ in range(layers))


class RTDETRDecoder(nn.Module):
    def __init__(self, nc=6, ch=(256, 256, 256), hd=256, nq=300, ndl=6):
        super().__init__()
        self.nc, self.nq, self.ndl = nc, nq, ndl
        self.input_proj = nn.ModuleList(
            nn.Sequential(nn.Conv2d(c, hd, 1, bias=False),
                          nn.BatchNorm2d(hd)) for c in ch)
        self.decoder = Decoder(ndl)
        self.denoising_class_embed = nn.Embedding(nc, hd)
        self.query_pos_head = MLP(4, 2 * hd, hd, 2)
        self.enc_output = nn.Sequential(nn.Linear(hd, hd),
                                        nn.LayerNorm(hd))
        self.enc_score_head = nn.Linear(hd, nc)
        self.enc_bbox_head = MLP(hd, hd, 4, 3)
        self.dec_score_head = nn.ModuleList(
            nn.Linear(hd, nc) for _ in range(ndl))
        self.dec_bbox_head = nn.ModuleList(
            MLP(hd, hd, 4, 3) for _ in range(ndl))

    @staticmethod
    def _anchors(shapes, grid_size=0.05, eps=1e-2):
        anchors = []
        for i, (h, w) in enumerate(shapes):
            gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                    torch.arange(w, dtype=torch.float32),
                                    indexing="ij")
            xy = (torch.stack([gx, gy], -1) + 0.5) / torch.tensor(
                [w, h], dtype=torch.float32)
            wh = torch.ones_like(xy) * grid_size * (2.0 ** i)
            anchors.append(torch.cat([xy, wh], -1).view(1, h * w, 4))
        a = torch.cat(anchors, 1)
        valid = ((a > eps) & (a < 1 - eps)).all(-1, keepdim=True)
        a = torch.log(a / (1 - a))
        a = a.masked_fill(~valid, float("inf"))
        return a, valid

    def forward(self, feats):
        shapes = [(f.shape[2], f.shape[3]) for f in feats]
        projected = [p(f) for p, f in zip(self.input_proj, feats)]
        flat = torch.cat([f.flatten(2).permute(0, 2, 1)
                          for f in projected], 1)
        anchors, valid = self._anchors(shapes)
        mem = self.enc_output(valid * flat)
        enc_scores = self.enc_score_head(mem)
        topk = enc_scores.max(-1).values.topk(
            min(self.nq, enc_scores.shape[1]), dim=1).indices
        bi = torch.arange(flat.shape[0])[:, None]
        top_feats = mem[bi, topk]
        top_anchors = anchors[0][topk]
        refer = (self.enc_bbox_head(top_feats) + top_anchors).sigmoid()
        enc_boxes = refer
        enc_logits = enc_scores[bi, topk]
        embed = top_feats.detach()
        refer = refer.detach()

        dec_boxes, dec_logits = [], []
        for i, layer in enumerate(self.decoder.layers):
            pos = self.query_pos_head(refer)
            embed = layer(embed, refer, flat, shapes, pos)
            delta = self.dec_bbox_head[i](embed)
            refer = (delta + torch.log(refer / (1 - refer))).sigmoid()
            dec_logits.append(self.dec_score_head[i](embed))
            dec_boxes.append(refer)
        return enc_logits, enc_boxes, dec_logits, dec_boxes


class RTDETRModel(nn.Module):
    """model.{i} indices match the rtdetr-l yaml."""

    def __init__(self, nc=6):
        super().__init__()
        relu = nn.ReLU()
        self.model = nn.ModuleList([
            HGStem(3, 32, 48),                             # 0
            HGBlock(48, 48, 128, 3, lightconv=False),      # 1
            DWConv(128, 128, 3, 2),                        # 2
            HGBlock(128, 96, 512, 3),                      # 3
            DWConv(512, 512, 3, 2),                        # 4
            HGBlock(512, 192, 1024, 5, lightconv=True),    # 5
            HGBlock(1024, 192, 1024, 5, lightconv=True,
                    shortcut=True),                        # 6
            HGBlock(1024, 192, 1024, 5, lightconv=True,
                    shortcut=True),                        # 7
            DWConv(1024, 1024, 3, 2),                      # 8
            HGBlock(1024, 384, 2048, 5, lightconv=True),   # 9
            Conv(2048, 256, 1, act=False),                 # 10 proj P5
            AIFI(256, 1024, 8),                            # 11
            Conv(256, 256, 1),                             # 12 lateral Y5
            nn.Upsample(scale_factor=2, mode="nearest"),   # 13
            Conv(1024, 256, 1, act=False),                 # 14 proj P4
            nn.Identity(),                                 # 15 concat
            RepC3(512, 256),                               # 16
            Conv(256, 256, 1),                             # 17 lateral Y4
            nn.Upsample(scale_factor=2, mode="nearest"),   # 18
            Conv(512, 256, 1, act=False),                  # 19 proj P3
            nn.Identity(),                                 # 20 concat
            RepC3(512, 256),                               # 21 X3
            Conv(256, 256, 3, 2),                          # 22 down
            nn.Identity(),                                 # 23 concat
            RepC3(512, 256),                               # 24
            Conv(256, 256, 3, 2),                          # 25 down
            nn.Identity(),                                 # 26 concat
            RepC3(512, 256),                               # 27
            RTDETRDecoder(nc),                             # 28
        ])
        del relu

    def forward(self, x):
        m = self.model
        x = m[0](x)
        x = m[1](x)
        x = m[2](x)
        p3 = m[3](x)
        x = m[4](p3)
        x = m[5](x)
        x = m[6](x)
        p4 = m[7](x)
        x = m[8](p4)
        p5 = m[9](x)
        y5 = m[11](m[10](p5))
        lat5 = m[12](y5)
        t4 = m[16](torch.cat([m[13](lat5), m[14](p4)], 1))
        lat4 = m[17](t4)
        t3 = m[21](torch.cat([m[18](lat4), m[19](p3)], 1))
        o4 = m[24](torch.cat([m[22](t3), lat4], 1))
        o5 = m[27](torch.cat([m[25](o4), lat5], 1))
        return m[28]([t3, o4, o5])


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
