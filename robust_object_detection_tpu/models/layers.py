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


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks (YOLOv8's core block).

    cv1 projects to 2 chunks; each bottleneck consumes the running last chunk
    and appends its output; cv2 fuses the (2+n) chunks.
    """
    features: int
    n: int = 1
    shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = self.features // 2
        y = ConvBnAct(2 * c, 1, dtype=self.dtype)(x, train)
        chunks = [y[..., :c], y[..., c:]]
        for _ in range(self.n):
            chunks.append(Bottleneck(c, self.shortcut, expansion=1.0,
                                     dtype=self.dtype)(chunks[-1], train))
        return ConvBnAct(self.features, 1, dtype=self.dtype)(
            jnp.concatenate(chunks, axis=-1), train)


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
