"""Feature Pyramid Network + RoIAlign (XLA gather-based).

FPN follows the torchvision v2 layout the reference relies on
(fasterrcnn_resnet50_fpn_v2, train_frcnn_baseline.py:139): 1x1 lateral
convs, nearest top-down upsampling, 3x3 output convs, P6 via max-pool.

RoIAlign is implemented as a fully vectorised bilinear gather over a
FLATTENED pyramid: all levels are flattened to one (sum HW, C) table per
image, each RoI's sampling grid is offset into its assigned level, and the
whole (R, 7, 7, 4-tap) sample becomes one `take` — no per-RoI loops, no
dynamic shapes (the torchvision CUDA kernel's TPU-native equivalent).
"""

from __future__ import annotations

import functools
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class FPN(nn.Module):
    """(C2..C5) -> (P2..P6), all `features` channels.

    norm=True is the v2 layout (torchvision _resnet_fpn_extractor with
    norm_layer=BatchNorm2d: every lateral/post conv is bias-free and
    followed by BN) — required for importing fasterrcnn_resnet50_fpn_v2
    checkpoints; norm=False is the classic bias-only FPN."""
    features: int = 256
    dtype: Any = jnp.float32
    norm: bool = True

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False
                 ) -> List[jax.Array]:
        def block(x, kernel, name):
            p = kernel // 2
            x = nn.Conv(self.features, (kernel, kernel),
                        padding=((p, p), (p, p)), use_bias=not self.norm,
                        dtype=self.dtype, name=name)(x)
            if self.norm:
                x = nn.BatchNorm(use_running_average=not train,
                                 dtype=jnp.float32, name=f"{name}_bn")(x)
            return x

        laterals = [block(f, 1, f"lateral{i}")
                    for i, f in enumerate(feats)]
        outs = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = outs[0]
            n, h, w, c = up.shape
            up = jnp.broadcast_to(up[:, :, None, :, None, :],
                                  (n, h, 2, w, 2, c)).reshape(n, h * 2,
                                                              w * 2, c)
            outs.insert(0, lat + up)
        outs = [block(o, 3, f"post{i}") for i, o in enumerate(outs)]
        # P6: stride-2 max-pool of P5 (torchvision LastLevelMaxPool).
        outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs


# ── RoIAlign over a flattened pyramid ────────────────────────────────────

def assign_levels(boxes: jax.Array, k_min: int = 2, k_max: int = 5,
                  canonical_size: float = 224.0,
                  canonical_level: int = 4) -> jax.Array:
    """FPN level per RoI (Lin et al. eq.1, torchvision LevelMapper):
    k = floor(k0 + log2(sqrt(area)/224)), clamped to [k_min, k_max].

    boxes: (..., 4) xyxy. Returns int32 level indices RELATIVE to k_min.
    """
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    k = jnp.floor(canonical_level +
                  jnp.log2(jnp.sqrt(w * h) / canonical_size + 1e-8))
    return (jnp.clip(k, k_min, k_max) - k_min).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("output_size", "strides",
                                             "sampling_ratio"))
def roi_align(features: Tuple[jax.Array, ...], boxes: jax.Array,
              output_size: int = 7,
              strides: Tuple[int, ...] = (4, 8, 16, 32),
              sampling_ratio: int = 2) -> jax.Array:
    """Multi-level RoIAlign.

    features: per-level (B, H_l, W_l, C) maps (P2..P5 — P6 is RPN-only, as
    in torchvision); boxes: (B, R, 4) xyxy in image pixels.
    Returns (B, R, output_size, output_size, C).

    Implementation: levels are flattened and concatenated to (B, sum HW, C);
    each RoI's (output_size * sampling_ratio)^2 bilinear taps are computed as
    flat indices into that table (with its level's offset) and gathered in
    one take_along_axis. Align=True semantics (half-pixel offset), matching
    torchvision roi_align aligned=False default? torchvision box head uses
    aligned=False; we use the classic -0.5-free variant it ships.
    """
    b, r = boxes.shape[:2]
    c = features[0].shape[-1]
    hws = [(f.shape[1], f.shape[2]) for f in features]
    offsets = np.concatenate([[0], np.cumsum([h * w for h, w in hws])])
    flat = jnp.concatenate([f.reshape(b, -1, c) for f in features], axis=1)

    levels = assign_levels(boxes)                          # (B, R) in [0,3]
    stride = jnp.asarray(strides, jnp.float32)[levels]     # (B, R)
    lvl_h = jnp.asarray([h for h, _ in hws], jnp.int32)[levels]
    lvl_w = jnp.asarray([w for _, w in hws], jnp.int32)[levels]
    lvl_off = jnp.asarray(offsets[:-1], jnp.int32)[levels]

    # RoI in level coordinates (torchvision aligned=False: plain divide).
    x1 = boxes[..., 0] / stride
    y1 = boxes[..., 1] / stride
    x2 = boxes[..., 2] / stride
    y2 = boxes[..., 3] / stride
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size

    s = sampling_ratio
    n_taps = output_size * s
    # sample grid: for output bin i, taps at x1 + (i*s + (j+0.5))/s * bin
    tap = (jnp.arange(n_taps, dtype=jnp.float32) + 0.5) / s    # in bin units
    sx = x1[..., None] + tap[None, None] * bin_w[..., None]    # (B,R,T)
    sy = y1[..., None] + tap[None, None] * bin_h[..., None]

    def bilinear(sy, sx):
        # clamp to feature bounds per torchvision (outside -> edge)
        sx = jnp.clip(sx, 0.0, lvl_w[..., None].astype(jnp.float32) - 1)
        sy = jnp.clip(sy, 0.0, lvl_h[..., None].astype(jnp.float32) - 1)
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = sx - x0
        fy = sy - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, lvl_w[..., None] - 1)
        y1i = jnp.minimum(y0i + 1, lvl_h[..., None] - 1)
        return (x0i, x1i, fx), (y0i, y1i, fy)

    (x0i, x1i, fx), (y0i, y1i, fy) = bilinear(sy, sx)

    def flat_idx(yi, xi):
        # (B, R, Ty) x (B, R, Tx) -> (B, R, Ty, Tx) flat table index
        return (lvl_off[..., None, None] +
                yi[..., :, None] * lvl_w[..., None, None] +
                xi[..., None, :])

    def gather(idx):
        # idx: (B, R, T, T) -> values (B, R, T, T, C)
        flat_i = idx.reshape(b, -1)
        out = jnp.take_along_axis(flat, flat_i[..., None], axis=1)
        return out.reshape(b, r, n_taps, n_taps, c)

    wy0 = (1 - fy)[..., :, None, None]
    wy1 = fy[..., :, None, None]
    wx0 = (1 - fx)[..., None, :, None]
    wx1 = fx[..., None, :, None]
    val = (gather(flat_idx(y0i, x0i)) * wy0 * wx0 +
           gather(flat_idx(y0i, x1i)) * wy0 * wx1 +
           gather(flat_idx(y1i, x0i)) * wy1 * wx0 +
           gather(flat_idx(y1i, x1i)) * wy1 * wx1)
    # average taps within each output bin
    val = val.reshape(b, r, output_size, s, output_size, s, c)
    return val.mean(axis=(3, 5))
