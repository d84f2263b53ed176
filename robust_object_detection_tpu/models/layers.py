"""Shared detector building blocks (Flax, NHWC).

The reference's detectors live inside torchvision/Ultralytics (SURVEY.md
§2.2); these are the TPU-native equivalents of the blocks they are built
from: Conv-BN-SiLU, YOLO C2f/SPPF, and ResNet bottlenecks. Conventions:

  * NHWC everywhere (XLA:TPU's native conv layout),
  * optional bfloat16 compute (`dtype`) with float32 BatchNorm statistics,
  * SAME-style explicit padding identical to torch's Conv2d(padding=k//2).
"""

from __future__ import annotations

import contextlib
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# BatchNorm compute dtype. float32 matches torch-AMP semantics (the
# reference trains amp=True with f32 norms). bf16 halves the dominant
# normalisation HBM traffic (+26% step rate on yolov8m@1024 measured on
# v5e) — XLA reduces with an f32 accumulator, so the batch statistics stay
# accurate; opt in via `bn_dtype_scope(jnp.bfloat16)` around model
# construction AND every apply/init trace.
_BN_DTYPE = [jnp.float32]


@contextlib.contextmanager
def bn_dtype_scope(dtype: Any):
    _BN_DTYPE.append(dtype)
    try:
        yield
    finally:
        _BN_DTYPE.pop()


def current_bn_dtype() -> Any:
    return _BN_DTYPE[-1]


_SHIFT_DEPTHWISE = False     # measured SLOWER than XLA's grouped conv
#                              (HGNetv2 backbone fwd+bwd 142 vs 97 ms at
#                              bs8/1024 bf16) — kept for the record and
#                              as a fallback should a backend regress


class _ShiftDepthwise(nn.Module):
    """Depthwise k x k conv as k^2 shifted multiply-accumulates.

    Hypothesis was that XLA lowers feature_group_count==channels convs
    poorly on TPU; MEASURED OTHERWISE (see _SHIFT_DEPTHWISE above), so
    this path is off by default. The parameter keeps flax nn.Conv's
    depthwise shape/name ((k, k, 1, C) under "kernel"), so flipping the
    flag never touches checkpoints or torch importers; padding is the
    same symmetric torch-style (k//2, k//2)."""
    features: int
    kernel: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s = self.kernel, self.stride
        p = k // 2
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, 1, self.features))
        xd = x.astype(self.dtype)
        wd = w.astype(self.dtype)
        xp = jnp.pad(xd, ((0, 0), (p, p), (p, p), (0, 0)))
        h = (x.shape[1] + 2 * p - k) // s + 1
        wdt = (x.shape[2] + 2 * p - k) // s + 1
        out = None
        for dy in range(k):
            for dx in range(k):
                sl = xp[:, dy:dy + (h - 1) * s + 1:s,
                        dx:dx + (wdt - 1) * s + 1:s, :]
                term = sl * wd[dy, dx, 0]
                out = term if out is None else out + term
        return out


class ConvBnAct(nn.Module):
    """Conv2d(bias=False) + BatchNorm + activation (YOLO `Conv` uses SiLU;
    HGNetv2 blocks use ReLU via `act_fn`)."""
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: bool = True
    act_fn: Any = None           # defaults to silu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        p = self.kernel // 2
        if (_SHIFT_DEPTHWISE and self.groups > 1
                and self.groups == self.features == x.shape[-1]):
            # true depthwise: shift-MAC formulation (same param tree)
            x = _ShiftDepthwise(self.features, self.kernel, self.stride,
                                self.dtype, name="Conv_0")(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=((p, p), (p, p)), use_bias=False,
                        feature_group_count=self.groups,
                        dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=current_bn_dtype())(x)
        if self.act:
            x = (self.act_fn or nn.silu)(x)
        return x


class _Kernel(nn.Module):
    """Bare conv-kernel parameter with nn.Conv's exact path and init."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class _BNParams(nn.Module):
    """flax BatchNorm's parameter/stat tree without its compute: lets a
    fused kernel own the normalize while checkpoints and importers see
    the identical BatchNorm_0 scale/bias + batch_stats mean/var."""
    features: int

    @nn.compact
    def __call__(self):
        sc = self.param("scale", nn.initializers.ones, (self.features,))
        bi = self.param("bias", nn.initializers.zeros, (self.features,))
        rm = self.variable("batch_stats", "mean",
                           lambda: jnp.zeros((self.features,)))
        rv = self.variable("batch_stats", "var",
                           lambda: jnp.ones((self.features,)))
        return sc, bi, rm, rv


class _DenseParams(nn.Module):
    """nn.Dense's parameter tree (kernel/bias, same inits) without its
    compute — for call sites that apply the projection in a custom
    layout (e.g. transposed matmuls feeding Pallas kernels)."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _ConvBNParams(nn.Module):
    """Param holder matching ConvBnAct's tree (conv_scope='Conv_0') or
    Conv2x2Pad's (conv_scope=None: kernel at the module root)."""
    kshape: Tuple[int, ...]
    conv_scope: Any = "Conv_0"

    @nn.compact
    def __call__(self):
        if self.conv_scope:
            k = _Kernel(self.kshape, name=self.conv_scope)()
        else:
            k = self.param("kernel", nn.initializers.lecun_normal(),
                           self.kshape)
        sc, bi, rm, rv = _BNParams(self.kshape[-1], name="BatchNorm_0")()
        return k, sc, bi, rm, rv


def planes_batchnorm(y_planes, sc, bi, rm, rv, train, initializing,
                     act=nn.silu, eps=1e-3, momentum=0.97):
    """flax-BatchNorm-parity normalize + activation on (B, H, C, W):
    f32 fast-variance stats over (B, H, W), clamped; running update;
    result cast to the bn compute dtype. Association order matches flax
    ((x - mean) * (rsqrt(var+eps) * scale) + bias) — grad parity chains
    through many BNs, and a different f32 order amplifies to ~5% param
    grads (measured for the RT-DETR HGBlock)."""
    yf = y_planes.astype(jnp.float32)
    if train:
        m = yf.mean((0, 1, 3))
        v = jnp.maximum(0.0, (yf * yf).mean((0, 1, 3)) - m * m)
        if not initializing:
            rm.value = momentum * rm.value + (1 - momentum) * m
            rv.value = momentum * rv.value + (1 - momentum) * v
    else:
        m, v = rm.value, rv.value
    mul = jax.lax.rsqrt(v + eps) * sc
    yn = (yf - m[:, None]) * mul[:, None] + bi[:, None]
    return act(yn.astype(current_bn_dtype()))


class Bottleneck(nn.Module):
    """YOLO residual bottleneck: two 3x3 convs + optional shortcut."""
    features: int
    shortcut: bool = True
    expansion: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = int(self.features * self.expansion)
        y = ConvBnAct(hidden, 3, dtype=self.dtype)(x, train)
        y = ConvBnAct(self.features, 3, dtype=self.dtype)(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class _BottleneckParams(nn.Module):
    """Param holder matching Bottleneck's tree (two anonymous ConvBnActs
    -> ConvBnAct_0 / ConvBnAct_1)."""
    c: int

    @nn.compact
    def __call__(self):
        a = _ConvBNParams((3, 3, self.c, self.c), name="ConvBnAct_0")()
        b = _ConvBNParams((3, 3, self.c, self.c), name="ConvBnAct_1")()
        return a, b


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks (YOLOv8's core block).

    cv1 projects to 2 chunks; each bottleneck consumes the running last chunk
    and appends its output; cv2 fuses the (2+n) chunks.

    With ``planes_io=True`` the input/output are PLANES tensors
    (B, H, C, W) and the whole block runs in that layout on TPU: the 3x3
    bottleneck convs go through the Pallas planes kernel
    (ops/pallas_conv.py) and the BN/SiLU/concat/1x1 work stays in XLA on
    tile-compact tensors (a 48-channel NHWC tensor is 2.7x lane-padded;
    the backbone's first C2f costs ~27 ms fwd+bwd of the 179 ms YOLOv8m
    step at bs16/1024px, device-traced). The parameter tree is identical
    to the NHWC path, so checkpoints and importers are unaffected."""
    features: int
    n: int = 1
    shortcut: bool = False
    dtype: Any = jnp.float32
    planes_io: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.planes_io:
            return self._planes(x, train)
        c = self.features // 2
        y = ConvBnAct(2 * c, 1, dtype=self.dtype,
                      name="ConvBnAct_0")(x, train)
        chunks = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            chunks.append(Bottleneck(c, self.shortcut, expansion=1.0,
                                     dtype=self.dtype,
                                     name=f"Bottleneck_{i}")(
                                         chunks[-1], train))
        return ConvBnAct(self.features, 1, dtype=self.dtype,
                         name="ConvBnAct_1")(
            jnp.concatenate(chunks, axis=-1), train)

    def _planes(self, x, train):
        """x: (B, H, C_in, W) planes. Same math/params as the NHWC path."""
        from ..ops import pallas_conv as PC
        c = self.features // 2
        cin = x.shape[2]
        ini = self.is_initializing()
        cv1 = _ConvBNParams((1, 1, cin, 2 * c), name="ConvBnAct_0")()
        bots = [_BottleneckParams(c, name=f"Bottleneck_{i}")()
                for i in range(self.n)]
        cv2 = _ConvBNParams((1, 1, (2 + self.n) * c, self.features),
                            name="ConvBnAct_1")()

        def conv1x1(t, k):
            return jnp.einsum("bhcw,cd->bhdw", t.astype(self.dtype),
                              k[0, 0].astype(self.dtype),
                              preferred_element_type=jnp.float32)

        k, sc, bi, rm, rv = cv1
        y = planes_batchnorm(conv1x1(x, k), sc, bi, rm, rv, train, ini)
        chunks = [y[:, :, :c], y[:, :, c:]]
        for (p1, p2) in bots:
            h = chunks[-1]
            k, sc, bi, rm, rv = p1
            a = planes_batchnorm(
                PC.conv3x3_planes(h.astype(self.dtype), k, self.dtype),
                sc, bi, rm, rv, train, ini)
            k, sc, bi, rm, rv = p2
            b = planes_batchnorm(
                PC.conv3x3_planes(a.astype(self.dtype), k, self.dtype),
                sc, bi, rm, rv, train, ini)
            chunks.append(h + b if self.shortcut else b)
        cat = jnp.concatenate(chunks, 2)
        k, sc, bi, rm, rv = cv2
        return planes_batchnorm(conv1x1(cat, k), sc, bi, rm, rv,
                                train, ini).astype(self.dtype)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 stride-1 max-pools."""
    features: int
    pool: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1] // 2
        x = ConvBnAct(c, 1, dtype=self.dtype)(x, train)
        outs = [x]
        p = self.pool // 2
        for _ in range(3):
            outs.append(nn.max_pool(outs[-1], (self.pool, self.pool),
                                    strides=(1, 1),
                                    padding=((p, p), (p, p))))
        return ConvBnAct(self.features, 1, dtype=self.dtype)(
            jnp.concatenate(outs, axis=-1), train)


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsample (torch nn.Upsample(scale=2))."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def make_divisible(v: float, divisor: int = 8) -> int:
    """Ultralytics channel rounding."""
    return max(divisor, int(v + divisor / 2) // divisor * divisor)


def scale_channels(base: int, width: float, max_channels: int) -> int:
    return make_divisible(min(base, max_channels) * width, 8)


def scale_depth(base: int, depth: float) -> int:
    return max(1, round(base * depth))
