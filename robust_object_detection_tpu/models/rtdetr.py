"""RT-DETR-L (Flax, NHWC): HGNetv2 backbone, hybrid encoder, deformable-
attention decoder with 300 queries — NMS-free detection.

Reference capability: Ultralytics `RTDETR("rtdetr-l.pt")` trained/evaluated
at imgsz=1024 (train_rtdetr_augmented.py:21-42, eval_all.py:162-192). This
is a from-scratch TPU-native implementation of the RT-DETR architecture
(Zhao et al., 2023 + Deformable DETR sampling):

  * HGNetv2-L backbone (HGStem, HGBlocks with LightConv, DWConv
    downsamples) -> P3/P4/P5,
  * hybrid encoder: 1x1 projections to 256ch, AIFI (one transformer encoder
    layer with 2D sincos positional encoding) on P5, CCFF top-down +
    bottom-up fusion with RepC3-style blocks,
  * two-stage query selection: per-anchor encoder head proposes boxes, the
    top-300 become decoder queries (content = detached encoder features),
  * 6 decoder layers: self-attention, multi-scale deformable cross-attention
    (8 heads x 3 levels x 4 points, gather-based bilinear sampling — the
    CUDA kernel's XLA equivalent), FFN, iterative box refinement in
    inverse-sigmoid space,
  * every intermediate is static-shape; padded GTs never change shapes.

Decoding is NMS-free: top-300 of the (Q x nc) sigmoid scores.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import deform
from .layers import (ConvBnAct, _BNParams, _ConvBNParams, _DenseParams,
                     _Kernel)

relu = nn.relu


@dataclasses.dataclass(frozen=True)
class RtDetrConfig:
    num_classes: int = 6
    hidden: int = 256
    heads: int = 8
    ffn: int = 1024
    levels: int = 3                  # P3, P4, P5
    points: int = 4
    dec_layers: int = 6
    queries: int = 300
    # order decoder queries spatially (row-major cell of the initial
    # reference center) so the slot-layout deformable kernels see narrow
    # value-tile bounds; one permutation is shared by all 6 layers and
    # undone on the outputs — numerics differ only by fp summation order,
    # and the param tree is unchanged (checkpoints stay interchangeable)
    spatial_sort: bool = True


# ── HGNetv2 backbone ─────────────────────────────────────────────────────

class LightConv(nn.Module):
    """1x1 conv (no act) + depthwise kxk conv (act) — PP-HGNet's cheap conv."""
    features: int
    kernel: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = ConvBnAct(self.features, 1, act=False, dtype=self.dtype)(x, train)
        x = ConvBnAct(self.features, self.kernel, groups=self.features,
                      act_fn=relu, dtype=self.dtype)(x, train)
        return x


class Conv2x2Pad(nn.Module):
    """PP-HGNet stem conv: right/bottom zero-pad then 2x2 VALID conv + BN
    + ReLU (Ultralytics HGStem stem2a/stem2b: F.pad(x, [0,1,0,1]) before a
    k=2 p=0 Conv).

    TPU formulation: out(i,j) = sum_{dy,dx in {0,1}} x(i+dy, j+dx) @
    k(dy,dx) as FOUR SHIFTED MATMULS accumulated in f32. XLA's conv
    lowering at these channel counts (16/32 of 128 lanes) ran ~10.8 ms
    fwd+bwd at (8, 512, 512) on v5e — and the literal asymmetric-pad 2x2
    conv additionally aborts XLA's space-to-batch converter in the
    backward. The shifted-matmul form is exact (each dot accumulates
    f32 on the MXU; the four partials add in f32), autodiffs to shifted
    matmuls (no conv-transpose), and measured ~2 ms for the same shapes.
    The parameter stays (2,2,cin,cout) so torch checkpoints import 1:1.
    """
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        from .layers import current_bn_dtype
        b, h, w, cin = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, cin, self.features))
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (0, 1), (0, 1), (0, 0)))
        k = kernel.astype(self.dtype)
        y = sum(
            jax.lax.dot_general(
                xp[:, dy:dy + h, dx:dx + w, :], k[dy, dx],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for dy in (0, 1) for dx in (0, 1)).astype(self.dtype)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=current_bn_dtype())(y)
        return relu(y)


class HGStem(nn.Module):
    """PP-HGNetv2 stem, faithful to Ultralytics HGStem: 3x3/2 ->
    [2x2-pool path | stem2a/stem2b 2x2-conv path] -> concat(pool, conv) ->
    3x3/2 -> 1x1. The 2x2 convs use the symmetric embedding (Conv2x2Pad);
    the 2x2 stride-1 ceil-mode pool becomes a right/bottom-padded max-pool
    (equivalent for the ReLU'd, hence non-negative, stem1 output).

    On TPU at supported sizes (H mult 64, W mult 256) the stem1..stem3
    chain routes to the fused planes-layout Pallas op
    (ops/pallas_stem.py): the XLA path's small-channel NHWC tensors are
    4-42x lane-padded and its train-mode BatchNorms cost two full-tensor
    passes each (~38 ms fwd+bwd of the 221 ms RT-DETR step at bs8/1024px,
    device-traced, incl. ~6 ms of pure relayout copies). The parameter
    tree is IDENTICAL in both paths, so checkpoints and torch importers
    are unaffected.

    Negative result (r3, device-traced): reformulating stem1 as a
    space-to-depth K=48 matmul at the XLA level is in-situ NEUTRAL — XLA
    materialises the pad (2.5 ms) and the 6-D s2d transpose (3.2 ms),
    exactly offsetting the conv win. Only a kernel that never
    round-trips padded NHWC tiles recovers the time."""
    cm: int = 32
    out: int = 48
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        from ..ops import pallas_stem as PS
        use_fused = (PS.supported(x.shape)
                     and (jax.default_backend() == "tpu" or PS._INTERPRET)
                     and self.cm == 32)
        if use_fused:
            x = self._fused(x, train)
        else:
            x = self._xla(x, train)
        x = ConvBnAct(self.out, 1, act_fn=relu, dtype=self.dtype,
                      name="stem4")(x, train)
        return x

    def _xla(self, x, train):
        x = ConvBnAct(self.cm, 3, 2, act_fn=relu, dtype=self.dtype,
                      name="stem1")(x, train)
        a = Conv2x2Pad(self.cm // 2, dtype=self.dtype, name="stem2a")(
            x, train)
        a = Conv2x2Pad(self.cm, dtype=self.dtype, name="stem2b")(a, train)
        # pool as max of four shifted views (see class docstring)
        bh, hh, ww, cc = x.shape
        bp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        b = jnp.maximum(
            jnp.maximum(bp[:, :hh, :ww], bp[:, 1:, :ww]),
            jnp.maximum(bp[:, :hh, 1:], bp[:, 1:, 1:]))
        x = jnp.concatenate([b, a], -1)            # pool first (cat order)
        return ConvBnAct(self.cm, 3, 2, act_fn=relu, dtype=self.dtype,
                         name="stem3")(x, train)

    def _fused(self, x, train):
        from ..models.layers import current_bn_dtype
        from ..ops import pallas_stem as PS
        cm = self.cm
        k1, sc1, bi1, rm1, rv1 = _ConvBNParams((3, 3, 3, cm),
                                               name="stem1")()
        k2a, sc2a, bi2a, rm2a, rv2a = _ConvBNParams(
            (2, 2, cm, cm // 2), conv_scope=None, name="stem2a")()
        k2b, sc2b, bi2b, rm2b, rv2b = _ConvBNParams(
            (2, 2, cm // 2, cm), conv_scope=None, name="stem2b")()
        k3, sc3, bi3, rm3, rv3 = _ConvBNParams((3, 3, 2 * cm, cm),
                                               name="stem3")()
        if train:
            y3, means, variances = PS.stem_fused(
                x, k1, sc1, bi1, k2a, sc2a, bi2a, k2b, sc2b, bi2b, k3,
                dtype=self.dtype)
            m3, v3 = means[3], variances[3]
            if not self.is_initializing():
                mom = 0.97
                for rm, rv, m, v in ((rm1, rv1, means[0], variances[0]),
                                     (rm2a, rv2a, means[1], variances[1]),
                                     (rm2b, rv2b, means[2], variances[2]),
                                     (rm3, rv3, m3, v3)):
                    rm.value = mom * rm.value + (1 - mom) * m
                    rv.value = mom * rv.value + (1 - mom) * v
        else:
            means = (rm1.value, rm2a.value, rm2b.value, rm3.value)
            variances = (rv1.value, rv2a.value, rv2b.value, rv3.value)
            y3 = PS.stem_fused_inference(
                x, k1, sc1, bi1, k2a, sc2a, bi2a, k2b, sc2b, bi2b, k3,
                means, variances, dtype=self.dtype)
            m3, v3 = means[3], variances[3]
        # BN3 apply + ReLU (flax-exact: f32 normalize, cast to bn dtype)
        yn = (y3.astype(jnp.float32) - m3) * jax.lax.rsqrt(v3 + PS.EPS)
        yn = yn * sc3 + bi3
        return relu(yn.astype(current_bn_dtype()))


class HGBlock(nn.Module):
    """n chained (Light)Convs, concat all taps, squeeze+excite 1x1 convs.

    For the dense (light=False, kernel=3) stage-1 configuration on TPU,
    the whole block runs in PLANES layout (B, H, C, W): the 48-channel
    NHWC tensors would be 2.7x lane-padded and cost ~24 ms fwd+bwd of the
    RT-DETR step (bs8/1024px, device-traced). In planes, every tensor is
    tile-compact; the 3x3 convs go through the Pallas planes kernel
    (ops/pallas_conv.py) and the BN/ReLU/concat/1x1 work stays in XLA,
    which handles the layout efficiently. Parameter tree is identical in
    both paths (ConvBnAct_0..7/Conv_0 + BatchNorm_0)."""
    cm: int
    out: int
    kernel: int = 3
    n: int = 6
    light: bool = False
    shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        from ..ops import pallas_conv as PC
        from ..ops import pallas_stem as PS
        b, hh, ww, cin = x.shape
        use_fused = (not self.light and self.kernel == 3
                     and (jax.default_backend() == "tpu" or PS._INTERPRET)
                     and cin == self.cm
                     and PC.supported((b, hh, self.cm, ww)))
        if use_fused:
            return self._fused_planes(x, train)
        taps = [x]
        h = x
        for _ in range(self.n):
            if self.light:
                h = LightConv(self.cm, self.kernel, dtype=self.dtype)(h,
                                                                      train)
            else:
                h = ConvBnAct(self.cm, self.kernel, act_fn=relu,
                              dtype=self.dtype)(h, train)
            taps.append(h)
        y = jnp.concatenate(taps, -1)
        y = ConvBnAct(self.out // 2, 1, act_fn=relu, dtype=self.dtype)(
            y, train)                                       # squeeze
        y = ConvBnAct(self.out, 1, act_fn=relu, dtype=self.dtype)(
            y, train)                                       # excite
        if self.shortcut and x.shape[-1] == self.out:
            y = y + x
        return y

    def _bn_relu(self, y_planes, sc, bi, rm, rv, train):
        """flax-BatchNorm-parity normalize + ReLU on (B, H, C, W): f32
        fast-variance stats over (B, H, W), clamped; running update with
        momentum 0.97; result cast to the bn compute dtype."""
        from ..models.layers import current_bn_dtype
        from ..ops.pallas_stem import EPS
        yf = y_planes.astype(jnp.float32)
        if train:
            m = yf.mean((0, 1, 3))
            v = jnp.maximum(0.0, (yf * yf).mean((0, 1, 3)) - m * m)
            if not self.is_initializing():
                mom = 0.97
                rm.value = mom * rm.value + (1 - mom) * m
                rv.value = mom * rv.value + (1 - mom) * v
        else:
            m, v = rm.value, rv.value
        # exact flax association: mul = rsqrt(var+eps) * scale, then
        # (x - mean) * mul + bias (grad parity chains through 8 BNs here;
        # a different f32 association order amplifies to ~5% param grads)
        mul = jax.lax.rsqrt(v + EPS) * sc
        yn = (yf - m[:, None]) * mul[:, None] + bi[:, None]
        return relu(yn.astype(current_bn_dtype()))

    def _fused_planes(self, x, train):
        from ..ops import pallas_conv as PC
        cm, out = self.cm, self.out
        convs = [_ConvBNParams((3, 3, cm, cm), name=f"ConvBnAct_{i}")()
                 for i in range(self.n)]
        sq = _ConvBNParams((1, 1, (self.n + 1) * cm, out // 2),
                           name=f"ConvBnAct_{self.n}")()
        ex = _ConvBNParams((1, 1, out // 2, out),
                           name=f"ConvBnAct_{self.n + 1}")()
        xp = x.transpose(0, 1, 3, 2).astype(self.dtype)  # (B, H, C, W)
        taps = [xp]
        h = xp
        for (k, sc, bi, rm, rv) in convs:
            y = PC.conv3x3_planes(h, k, self.dtype)
            h = self._bn_relu(y, sc, bi, rm, rv, train)
            taps.append(h)
        cat = jnp.concatenate(taps, 2)                   # (B, H, 7cm, W)
        k, sc, bi, rm, rv = sq
        y = jnp.einsum("bhcw,cd->bhdw", cat.astype(self.dtype),
                       k[0, 0].astype(self.dtype),
                       preferred_element_type=jnp.float32)
        y = self._bn_relu(y, sc, bi, rm, rv, train)      # squeeze
        k, sc, bi, rm, rv = ex
        y = jnp.einsum("bhcw,cd->bhdw", y.astype(self.dtype),
                       k[0, 0].astype(self.dtype),
                       preferred_element_type=jnp.float32)
        y = self._bn_relu(y, sc, bi, rm, rv, train)      # excite
        y = y.transpose(0, 1, 3, 2)                      # NHWC
        if self.shortcut and x.shape[-1] == self.out:
            y = y + x
        return y


class HGNetV2L(nn.Module):
    """HGNetv2-L: returns (P3 512ch, P4 1024ch, P5 2048ch)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        x = HGStem(32, 48, d)(x, train)
        x = HGBlock(48, 128, 3, light=False, dtype=d)(x, train)
        x = ConvBnAct(128, 3, 2, groups=128, act=False, dtype=d)(x, train)
        p3 = x = HGBlock(96, 512, 3, light=False, dtype=d)(x, train)
        x = ConvBnAct(512, 3, 2, groups=512, act=False, dtype=d)(x, train)
        x = HGBlock(192, 1024, 5, light=True, shortcut=False, dtype=d)(x,
                                                                       train)
        x = HGBlock(192, 1024, 5, light=True, shortcut=True, dtype=d)(x,
                                                                      train)
        p4 = x = HGBlock(192, 1024, 5, light=True, shortcut=True,
                         dtype=d)(x, train)
        x = ConvBnAct(1024, 3, 2, groups=1024, act=False, dtype=d)(x, train)
        p5 = HGBlock(384, 2048, 5, light=True, dtype=d)(x, train)
        return p3, p4, p5


# ── Hybrid encoder ───────────────────────────────────────────────────────

def sincos_pos_embed_2d(h: int, w: int, dim: int,
                        temperature: float = 10000.0) -> np.ndarray:
    """(h*w, dim) 2D sine-cosine positional embedding (AIFI).

    Replicates Ultralytics build_2d_sincos_position_embedding exactly,
    including its meshgrid(w, h, indexing="ij") orientation: the first
    sin/cos half runs over flat_index // h and the second over
    flat_index % h (for square maps: row-index first) — required for
    rtdetr-l.pt output parity."""
    pos_dim = dim // 4
    omega = 1.0 / (temperature ** (np.arange(pos_dim, dtype=np.float32)
                                   / pos_dim))
    gw, gh = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32), indexing="ij")
    out_w = gw.reshape(-1, 1) * omega[None]
    out_h = gh.reshape(-1, 1) * omega[None]
    return np.concatenate([np.sin(out_w), np.cos(out_w),
                           np.sin(out_h), np.cos(out_h)],
                          axis=1).astype(np.float32)


class AIFI(nn.Module):
    """One transformer encoder layer over the flattened P5 map
    (post-norm, GELU FFN — the Ultralytics AIFI defaults)."""
    hidden: int = 256
    heads: int = 8
    ffn: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c).astype(jnp.float32)
        pos = jnp.asarray(sincos_pos_embed_2d(h, w, c))[None]
        q = seq + pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="ma")(q, q, seq)
        seq = nn.LayerNorm(epsilon=1e-5, name="norm1")(seq + attn)
        ff = nn.Dense(self.ffn, dtype=self.dtype, name="fc1")(seq)
        ff = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(
            jax.nn.gelu(ff, approximate=False))
        seq = nn.LayerNorm(epsilon=1e-5, name="norm2")(
            seq + ff.astype(jnp.float32))
        return seq.reshape(b, h, w, c)


class RepConv(nn.Module):
    """Structural-reparam conv (train form): parallel 3x3 + 1x1 conv-BN
    branches summed, then SiLU (Ultralytics RepConv with bn=False)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        a = ConvBnAct(self.features, 3, act=False, dtype=self.dtype,
                      name="conv1")(x, train)
        b = ConvBnAct(self.features, 1, act=False, dtype=self.dtype,
                      name="conv2")(x, train)
        return nn.silu(a + b)


class RepC3(nn.Module):
    """CSP-style fusion block: cv2(x) + RepConv-chain(cv1(x)) — the
    Ultralytics RepC3 (cv3 is Identity at equal widths; convs are SiLU)."""
    features: int
    n: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        a = ConvBnAct(self.features, 1, dtype=self.dtype, name="cv1")(
            x, train)
        for i in range(self.n):
            a = RepConv(self.features, dtype=self.dtype, name=f"m{i}")(
                a, train)
        b = ConvBnAct(self.features, 1, dtype=self.dtype, name="cv2")(
            x, train)
        return a + b


class HybridEncoder(nn.Module):
    cfg: RtDetrConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train=False):
        """CCFF exactly as the rtdetr-l yaml head (layers 10-27): SiLU
        lateral/downsample convs (Ultralytics Conv default act), act-free
        1x1 input projections, RepC3 fusion."""
        c = self.cfg.hidden
        d = self.dtype
        p3, p4, p5 = [ConvBnAct(c, 1, act=False, dtype=d,
                                name=f"proj{i}")(f, train)
                      for i, f in enumerate(feats)]
        p5 = AIFI(c, self.cfg.heads, self.cfg.ffn, d, name="aifi")(
            p5, train)
        # top-down (CCFF); concat order is (upsampled, lateral) — yaml
        # Concat[[-2,-1]] puts the earlier (upsample) branch first
        lat5 = ConvBnAct(c, 1, dtype=d, name="lateral0")(p5, train)
        up5 = _up2x(lat5)
        t4 = RepC3(c, dtype=d, name="fpn0")(
            jnp.concatenate([up5, p4], -1), train)
        lat4 = ConvBnAct(c, 1, dtype=d, name="lateral1")(t4, train)
        up4 = _up2x(lat4)
        t3 = RepC3(c, dtype=d, name="fpn1")(
            jnp.concatenate([up4, p3], -1), train)
        # bottom-up
        d3 = ConvBnAct(c, 3, 2, dtype=d, name="down0")(t3, train)
        o4 = RepC3(c, dtype=d, name="pan0")(
            jnp.concatenate([d3, lat4], -1), train)
        d4 = ConvBnAct(c, 3, 2, dtype=d, name="down1")(o4, train)
        o5 = RepC3(c, dtype=d, name="pan1")(
            jnp.concatenate([d4, lat5], -1), train)
        return t3, o4, o5


def _up2x(x):
    n, h, w, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :],
                            (n, h, 2, w, 2, c)).reshape(n, 2 * h, 2 * w, c)


# ── Deformable attention ─────────────────────────────────────────────────

def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention (gather-based bilinear sampling)."""
    cfg: RtDetrConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, ref_boxes, value_levels, train=False):
        """query: (B, Q, C); ref_boxes: (B, Q, 4) normalised cxcywh;
        value_levels: list of (B, H_l, W_l, C) maps."""
        cfg = self.cfg
        b, q, c = query.shape
        n_h, n_l, n_p = cfg.heads, cfg.levels, cfg.points
        dh = c // n_h

        offsets = nn.Dense(n_h * n_l * n_p * 2,
                           kernel_init=nn.initializers.zeros,
                           bias_init=_offset_bias_init(n_h, n_l, n_p),
                           name="sampling_offsets")(query)
        attn = nn.Dense(n_h * n_l * n_p, name="attention_weights")(query)
        attn = jax.nn.softmax(
            attn.reshape(b, q, n_h, n_l * n_p), -1
        ).reshape(b, q, n_h, n_l, n_p)

        offsets = offsets.reshape(b, q, n_h, n_l, n_p, 2)
        ref_xy = ref_boxes[..., None, None, None, :2]
        ref_wh = ref_boxes[..., None, None, None, 2:]
        loc = ref_xy + offsets / n_p * ref_wh * 0.5     # normalised [0,1]

        # fused multi-scale core: project each level, concat the flat
        # maps, and run the one-kernel gather/weight/reduce
        # (ops/deform.py). The projection is computed TRANSPOSED —
        # kernel^T @ memory^T emits (B, C, HW) natively, which is exactly
        # the v^T layout the Pallas kernels consume; the memory^T inputs
        # are identical across the 6 decoder layers, so XLA CSE keeps ONE
        # transpose for the whole decoder instead of a relayout copy per
        # layer per direction (~3 ms/step at bs8/1024px, device-traced).
        kv, bv = _DenseParams(c, c, name="value_proj")()
        shapes = tuple((f.shape[1], f.shape[2]) for f in value_levels)
        kvt = kv.astype(self.dtype)
        values_t = (jnp.concatenate(
            [jnp.einsum("cd,bcn->bdn", kvt,
                        f.reshape(b, -1, c).transpose(0, 2, 1
                                                      ).astype(self.dtype))
             for f in value_levels], -1)
            + bv.astype(self.dtype)[None, :, None]
        ).reshape(b, n_h, dh, -1)
        out = deform.ms_deform_attn_slots(values_t, shapes, loc, attn)
        out = out.reshape(b, q, c)
        return nn.Dense(c, dtype=self.dtype, name="output_proj")(out)


def _offset_bias_init(n_h, n_l, n_p):
    """Deformable-DETR init: heads point at a ring of directions."""
    thetas = np.arange(n_h, dtype=np.float32) * (2 * np.pi / n_h)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid /= np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_l, n_p, 1))
    for p in range(n_p):
        grid[:, :, p, :] *= p + 1
    flat = grid.reshape(-1)

    def init(key, shape, dtype=jnp.float32):
        return jnp.asarray(flat, dtype)
    return init


@jax.custom_vjp
def _permute_rows(x, order, inv):
    """x[b, order[b], ...] with a gather BACKWARD. XLA differentiates
    take_along_axis into a scatter (serialised on TPU); for a permutation
    the cotangent is just the inverse gather, so tell autodiff that."""
    return jnp.take_along_axis(x, order.reshape(order.shape + (1,) *
                                                (x.ndim - 2)), 1)


def _permute_rows_fwd(x, order, inv):
    return _permute_rows(x, order, inv), (inv, x.ndim)


def _permute_rows_bwd(res, g):
    inv, ndim = res
    gx = jnp.take_along_axis(g, inv.reshape(inv.shape + (1,) * (ndim - 2)),
                             1)
    zero = np.zeros(inv.shape, jax.dtypes.float0)
    return gx, zero, zero


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


# ── Decoder ──────────────────────────────────────────────────────────────

class MLP(nn.Module):
    hidden: int
    out: int
    layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(self.layers - 1):
            x = relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        return nn.Dense(self.out)(x).astype(jnp.float32)


class DecoderLayer(nn.Module):
    cfg: RtDetrConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, ref_boxes, value_levels, query_pos,
                 train=False, attn_mask=None):
        q = query + query_pos
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.cfg.heads, dtype=self.dtype, name="self_attn")(
            q, q, query, mask=attn_mask)
        query = nn.LayerNorm(epsilon=1e-5, name="norm1")(query + sa)
        ca = MSDeformAttn(self.cfg, self.dtype, name="cross_attn")(
            query + query_pos, ref_boxes, value_levels, train)
        query = nn.LayerNorm(epsilon=1e-5, name="norm2")(query + ca)
        ff = nn.Dense(self.cfg.ffn, dtype=self.dtype, name="linear1")(query)
        ff = nn.Dense(self.cfg.hidden, dtype=self.dtype,
                      name="linear2")(relu(ff))
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(
            query + ff.astype(jnp.float32))


class RTDETR(nn.Module):
    cfg: RtDetrConfig = RtDetrConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False, dn=None):
        """x: (B, S, S, 3) in [0,1]. Returns dict:
          enc_logits (B, A, nc), enc_boxes (B, A, 4) sigmoid cxcywh,
          logits (L, B, Q, nc), boxes (L, B, Q, 4) — per decoder layer.

        dn (optional, training): contrastive-denoising queries —
        dict(classes (B, D) int32 [-1 = empty slot], boxes (B, D, 4)
        noised normalised cxcywh, group_ids (B, D) int32 [-1 = empty]).
        When given, outputs gain dn_logits/dn_boxes (L, B, D, ...) and the
        decoder self-attention is masked so dn groups see only themselves
        (+ every real query stays blind to all dn queries)."""
        cfg = self.cfg
        feats = HGNetV2L(self.dtype)(x, train)
        levels = HybridEncoder(cfg, self.dtype, name="encoder")(feats,
                                                                train)

        b = x.shape[0]
        c = cfg.hidden
        # decoder input projections (RTDETRDecoder.input_proj: 1x1 conv-BN
        # per level, applied before both query selection and the
        # deformable-attention value maps)
        levels = [ConvBnAct(c, 1, act=False, dtype=self.dtype,
                            name=f"dec_proj{i}")(f, train)
                  for i, f in enumerate(levels)]
        flat = jnp.concatenate([f.reshape(b, -1, c) for f in levels], 1)
        anchors, valid_mask = _build_anchors(
            [(f.shape[1], f.shape[2]) for f in levels])

        mem = nn.Dense(c, dtype=self.dtype, name="enc_output")(flat)
        mem = nn.LayerNorm(epsilon=1e-5, name="enc_norm")(mem)
        enc_logits = nn.Dense(cfg.num_classes, name="enc_score")(mem
                                                                 ).astype(
            jnp.float32)
        enc_logits = jnp.where(valid_mask[None, :, None], enc_logits, -1e4)
        enc_delta = MLP(c, 4, 3, self.dtype, name="enc_bbox")(mem)
        enc_boxes = jax.nn.sigmoid(enc_delta + anchors[None])

        # top-k query selection (clamped for tiny trace shapes)
        topv, topi = jax.lax.top_k(enc_logits.max(-1),
                                   min(cfg.queries, enc_logits.shape[1]))
        content = jnp.take_along_axis(mem, topi[..., None], 1)
        # enc aux-loss targets keep their gradients; the decoder inputs are
        # detached (RT-DETR two-stage query selection)
        enc_topk_logits = jnp.take_along_axis(enc_logits, topi[..., None], 1)
        enc_topk_boxes = jnp.take_along_axis(enc_boxes, topi[..., None], 1)
        content = jax.lax.stop_gradient(content)
        ref = jax.lax.stop_gradient(enc_topk_boxes)

        # contrastive denoising queries prepend the matching queries.
        # The embed table is created unconditionally so the param tree is
        # identical with and without dn (checkpoints stay interchangeable).
        cls_embed = nn.Embed(cfg.num_classes + 1, c, name="dn_class_embed")
        n_dn = 0
        attn_mask = None
        if dn is None:
            content = content + 0.0 * cls_embed(
                jnp.zeros((b, 1), jnp.int32)).astype(jnp.float32).mean()
        else:
            n_dn = dn["classes"].shape[1]
            dn_content = cls_embed(
                jnp.clip(dn["classes"], 0, cfg.num_classes)).astype(
                jnp.float32)
            dn_ref = dn["boxes"]
            content = jnp.concatenate([dn_content, content], 1)
            ref = jnp.concatenate([dn_ref, ref], 1)
            attn_mask = _dn_attention_mask(dn["group_ids"],
                                           content.shape[1])

        # spatial query ordering (see RtDetrConfig.spatial_sort): sort by
        # the row-major 128-grid cell of the initial reference center —
        # exactly level-0 cell order, so consecutive queries sample
        # neighbouring value tiles in every decoder layer's deformable
        # attention. Self-attention is permutation-equivariant (the dn
        # mask is permuted consistently); outputs are unpermuted below.
        inv = None
        if cfg.spatial_sort and content.shape[1] > 1:
            grid = 128
            cell = (jnp.clip((ref[..., 1] * grid).astype(jnp.int32),
                             0, grid - 1) * grid
                    + jnp.clip((ref[..., 0] * grid).astype(jnp.int32),
                               0, grid - 1))
            order = jnp.argsort(cell, 1)                 # (B, total)
            inv = jnp.argsort(order, 1)
            content = _permute_rows(content, order, inv)
            ref = _permute_rows(ref, order, inv)
            if attn_mask is not None:
                attn_mask = jnp.take_along_axis(
                    attn_mask, order[:, None, :, None], 2)
                attn_mask = jnp.take_along_axis(
                    attn_mask, order[:, None, None, :], 3)

        def unperm(x):
            if inv is None:
                return x
            return _permute_rows(x, inv, order)

        layers_logits, layers_boxes = [], []
        query = content
        pos_mlp = MLP(2 * c, c, 2, self.dtype, name="query_pos")
        for li in range(cfg.dec_layers):
            # per-layer score/bbox heads (RTDETRDecoder.dec_score_head /
            # dec_bbox_head are ModuleLists, one entry per decoder layer)
            query_pos = pos_mlp(ref)
            query = DecoderLayer(cfg, self.dtype, name=f"layer{li}")(
                query, ref, levels, query_pos, train, attn_mask)
            delta = MLP(c, 4, 3, self.dtype, name=f"dec_bbox{li}")(query)
            new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(ref))
            layers_logits.append(unperm(
                nn.Dense(cfg.num_classes, name=f"dec_score{li}")(
                    query).astype(jnp.float32)))
            layers_boxes.append(unperm(new_ref))
            ref = jax.lax.stop_gradient(new_ref)
        logits = jnp.stack(layers_logits)       # (L, B, D+Q, nc)
        boxes = jnp.stack(layers_boxes)
        out = {"enc_logits": enc_topk_logits, "enc_boxes": enc_topk_boxes,
               "logits": logits[:, :, n_dn:], "boxes": boxes[:, :, n_dn:]}
        if dn is not None:
            out["dn_logits"] = logits[:, :, :n_dn]
            out["dn_boxes"] = boxes[:, :, :n_dn]
        return out


def _dn_attention_mask(group_ids: jax.Array, total: int) -> jax.Array:
    """Self-attention mask for CDN: (B, 1, total, total) bool, True = may
    attend. dn slot i attends only its own group; matching queries attend
    only each other; empty dn slots (group -1) are isolated."""
    b, d = group_ids.shape
    q_gid = jnp.full((b, total - d), -2, jnp.int32)     # matching queries
    gid = jnp.concatenate([group_ids, q_gid], 1)        # (B, total)
    same = gid[:, :, None] == gid[:, None, :]
    valid = gid[:, None, :] != -1                       # empty dn: no keys
    # dn queries may also read the matching queries (DN-DETR convention);
    # the reverse stays blocked so real queries never leak gt information
    dn_sees_match = (gid[:, :, None] >= 0) & (gid[:, None, :] == -2)
    diag = jnp.eye(total, dtype=bool)[None]
    return ((same & valid) | dn_sees_match | diag)[:, None]


def _build_anchors(shapes: Sequence[Tuple[int, int]],
                   grid_size: float = 0.05):
    """Per-anchor init boxes in inverse-sigmoid space + validity mask."""
    anchors, valids = [], []
    for lvl, (h, w) in enumerate(shapes):
        gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
        cx = (gx + 0.5) / w
        cy = (gy + 0.5) / h
        wh = np.full_like(cx, grid_size * (2.0 ** lvl))
        a = np.stack([cx, cy, wh, wh], -1).reshape(-1, 4)
        valid = ((a > 0.01) & (a < 0.99)).all(-1)
        anchors.append(a)
        valids.append(valid)
    a = np.concatenate(anchors)
    v = np.concatenate(valids)
    a = np.log(a / (1 - a), where=(a > 0) & (a < 1),
               out=np.zeros_like(a))
    a[~v] = 0.0
    return jnp.asarray(a), jnp.asarray(v)


def create(num_classes: int = 6, dtype: Any = jnp.float32) -> RTDETR:
    return RTDETR(RtDetrConfig(num_classes=num_classes), dtype)


def init_variables(model: RTDETR, key: jax.Array, img_size: int = 64) -> dict:
    init = jax.jit(lambda k, x: model.init(k, x, train=False))
    return init(key, jnp.zeros((1, img_size, img_size, 3), jnp.float32))


def param_count(variables: dict) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(variables["params"]))


def postprocess(outputs: dict, img_size: int, max_det: int = 300):
    """NMS-free decode, Ultralytics val semantics: each query contributes
    its max-class sigmoid score (RTDETRValidator.postprocess takes
    ``score, cls = scores.max(-1)`` per query — the protocol behind the
    reference's RT-DETR numbers, eval_all.py:162-192), then the top
    max_det queries by score.

    Returns (boxes xyxy px, scores, classes, valid) with fixed capacity.
    """
    logits = outputs["logits"][-1]                  # (B, Q, nc)
    boxes = outputs["boxes"][-1]                    # (B, Q, 4) cxcywh [0,1]
    b, q, nc = logits.shape
    scores = jax.nn.sigmoid(logits)
    q_scores = jnp.max(scores, -1)                  # (B, Q)
    q_cls = jnp.argmax(scores, -1).astype(jnp.int32)
    k = min(max_det, q)
    top_s, q_idx = jax.lax.top_k(q_scores, k)
    cls = jnp.take_along_axis(q_cls, q_idx, 1)
    bsel = jnp.take_along_axis(boxes, q_idx[..., None], 1)
    cx, cy, w, h = (bsel[..., 0], bsel[..., 1], bsel[..., 2], bsel[..., 3])
    xyxy = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     -1) * img_size
    valid = top_s > 0.0
    return xyxy, top_s, cls, valid
