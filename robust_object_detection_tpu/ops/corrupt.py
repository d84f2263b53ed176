"""Batched on-device image corruption ops.

The project keystone: the SAME corruption semantics as the reference's
OpenCV/numpy ops (scripts/augmentations.py:21-56), but batched NHWC on device,
so training-time corruption runs inside the jitted step instead of per-image
Python in a dataloader worker (reference hot loop, SURVEY.md §3.1).

Semantics parity (validated in tests/test_corrupt.py against cv2 goldens):

  * gaussian noise sigma=15 added in float32, clipped to [0,255], truncated
    to uint8 (augmentations.py:30-33 uses np.clip(...).astype(np.uint8)).
    Training uses jax.random (Threefry), NOT numpy MT19937 — distributional
    parity; bit-exact MT19937 replay is only needed for the frozen testsets
    and lives in data/testsets.py.
  * motion blur k=9: k x k kernel, centre row ones, rotated by angle via
    inverse-map bilinear warp, normalised by sum + 1e-8
    (augmentations.py:21-27); applied as a depthwise correlation with
    BORDER_REFLECT_101 (cv2.filter2D default border), rounded half-to-even
    (cv2 saturate_cast).
  * lowres 0.5x: INTER_AREA downsample then INTER_LINEAR upsample back
    (augmentations.py:41-45). At even H,W the downsample is an exact 2x2 box
    mean; both stages quantise to uint8 like the reference.

All three are computed for the batch and selected per image — they are cheap
VPU ops next to the detector, the select keeps shapes static, and XLA fuses
the arithmetic into a handful of HBM passes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import CorruptionConfig
from . import image as image_ops

# Corruption ids (used for per-image selection and reporting).
CLEAN, NOISE, BLUR, LOWRES = 0, 1, 2, 3
VARIANTS = ("Clean", "Noise", "Blur", "LowRes")


# ── Blur kernel construction (host-side, static) ─────────────────────────

def motion_blur_kernel(k: int, angle_deg: float) -> np.ndarray:
    """k x k motion-blur kernel: centre row of ones rotated by angle.

    Replicates the reference construction (augmentations.py:21-27): the
    rotation is cv2.warpAffine(INTER_LINEAR) about centre (k/2-0.5, k/2-0.5),
    i.e. inverse-map bilinear sampling; normalised by (sum + 1e-8).
    Pure numpy so kernels stay identical with or without OpenCV present.
    """
    base = np.zeros((k, k), dtype=np.float32)
    base[k // 2, :] = 1.0
    if angle_deg % 360 != 0:
        cx = cy = k / 2 - 0.5
        a = np.deg2rad(angle_deg)
        cos, sin = np.cos(a), np.sin(a)
        # cv2.getRotationMatrix2D gives the forward map; warpAffine samples
        # src at the inverse map of each dst pixel.
        ys, xs = np.mgrid[0:k, 0:k].astype(np.float32)
        # inverse rotation (rotate dst by -angle about the centre)
        sx = cos * (xs - cx) - sin * (ys - cy) + cx
        sy = sin * (xs - cx) + cos * (ys - cy) + cy
        x0, y0 = np.floor(sx).astype(int), np.floor(sy).astype(int)
        fx, fy = sx - x0, sy - y0
        out = np.zeros_like(base)
        for dy in (0, 1):
            for dx in (0, 1):
                wgt = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                xi, yi = x0 + dx, y0 + dy
                valid = (xi >= 0) & (xi < k) & (yi >= 0) & (yi < k)
                out += np.where(valid, base[np.clip(yi, 0, k - 1),
                                            np.clip(xi, 0, k - 1)] * wgt, 0.0)
        base = out
    return base / (base.sum() + 1e-8)


# ── Batched corruption ops (float32 [0,255] NHWC in, same out) ───────────

@functools.partial(jax.jit, static_argnames=("sigma", "quantize"))
def apply_noise(img: jax.Array, key: jax.Array, sigma: float = 15.0,
                quantize: bool = True) -> jax.Array:
    """Additive gaussian noise (augmentations.py:30-33)."""
    x = img.astype(jnp.float32)
    x = x + sigma * jax.random.normal(key, x.shape, jnp.float32)
    return image_ops.quantize_trunc(x) if quantize else x


@functools.partial(jax.jit, static_argnames=("k", "angle_deg", "quantize",
                                             "fast"))
def apply_motion_blur(img: jax.Array, k: int = 9, angle_deg: float = 0.0,
                      quantize: bool = True, fast: bool = False) -> jax.Array:
    """Depthwise k x k motion-blur correlation, reflect-101 border
    (augmentations.py:36-38; cv2.filter2D default border).

    fast=False runs the conv at Precision.HIGHEST — the TPU default runs f32
    convs through bf16 passes, costing ~0.4/255 error, too much for uint8
    bit-parity with cv2 (frozen testsets). fast=True keeps the default
    precision for training-time augmentation, where only distributional
    parity matters.
    """
    x = img.astype(jnp.float32)
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    c = x.shape[-1]
    kern = jnp.asarray(motion_blur_kernel(k, angle_deg))
    # Depthwise: HWIO kernel (k, k, 1, C), feature_group_count=C.
    kern = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))
    pad = k // 2
    x = image_ops.pad_reflect101(x, pad, pad)
    y = jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=(jax.lax.Precision.DEFAULT if fast
                   else jax.lax.Precision.HIGHEST))
    if quantize:
        y = image_ops.quantize_round(y)
    return y[0] if squeeze else y


@functools.partial(jax.jit, static_argnames=("factor", "quantize"))
def apply_lowres(img: jax.Array, factor: float = 0.5,
                 quantize: bool = True) -> jax.Array:
    """Downsample by `factor` (INTER_AREA) then upsample back (INTER_LINEAR)
    (augmentations.py:41-45). Requires H,W divisible so the area step is the
    exact box mean — the on-device pipeline always runs on even canvases."""
    h, w = img.shape[-3], img.shape[-2]
    if factor != 0.5:
        raise NotImplementedError("on-device lowres supports factor=0.5; "
                                  "offline testsets handle arbitrary factors")
    small = image_ops.area_downsample_2x(img)
    if quantize:
        small = image_ops.quantize_round_half_up(small)
    up = image_ops.resize_bilinear(small, h, w)
    return image_ops.quantize_round_half_up(up) if quantize else up


# ── Per-image random corruption for training pipelines ───────────────────

@functools.partial(jax.jit, static_argnames=("cfg", "quantize", "fast"))
def random_corruption(img: jax.Array, key: jax.Array,
                      cfg: CorruptionConfig = CorruptionConfig(),
                      quantize: bool = True,
                      fast: bool = False) -> tuple[jax.Array, jax.Array]:
    """Corrupt each image of an NHWC batch with probability `cfg.prob`,
    choosing uniformly among noise/blur/lowres (augmentations.py:48-56,60-74).

    Returns (batch, choice) where choice[i] in {CLEAN, NOISE, BLUR, LOWRES}.
    fast=True relaxes conv precision for training (see apply_motion_blur).
    """
    n = img.shape[0]
    k_apply, k_choice, k_noise = jax.random.split(key, 3)
    apply_mask = jax.random.uniform(k_apply, (n,)) < cfg.prob
    choice3 = jax.random.randint(k_choice, (n,), NOISE, LOWRES + 1)
    choice = jnp.where(apply_mask, choice3, CLEAN)

    x = img.astype(jnp.float32)
    noised = apply_noise(x, k_noise, cfg.noise_sigma, quantize=quantize)
    blurred = apply_motion_blur(x, cfg.blur_kernel, cfg.blur_angle_deg,
                                quantize=quantize, fast=fast)
    low = apply_lowres(x, cfg.downscale_factor, quantize=quantize)

    stacked = jnp.stack([x, noised, blurred, low], axis=0)  # (4, N, H, W, C)
    out = jnp.take_along_axis(
        stacked, choice[None, :, None, None, None], axis=0)[0]
    return out, choice


def random_corruption_fast(img: jax.Array, key: jax.Array,
                           cfg: CorruptionConfig = CorruptionConfig()):
    """Training-path corruption, fastest available implementation.

    On TPU with compatible shapes this is the fused single-pass Pallas
    kernel (ops/pallas_corrupt.py); otherwise the XLA compute-all-variants
    path with relaxed conv precision. Same distribution either way.
    """
    h, w = img.shape[1], img.shape[2]
    if (jax.default_backend() == "tpu" and h % 128 == 0 and w % 2 == 0
            and cfg.blur_angle_deg % 360 == 0):
        from . import pallas_corrupt
        return pallas_corrupt.fused_random_corruption(img, key, cfg)
    return random_corruption(img, key, cfg, fast=True)


@functools.partial(jax.jit, static_argnames=("cfg", "quantize", "fast"))
def corrupt_variant(img: jax.Array, variant: jax.Array, key: jax.Array,
                    cfg: CorruptionConfig = CorruptionConfig(),
                    quantize: bool = True, fast: bool = False) -> jax.Array:
    """Apply a fixed per-image corruption id (for testset-style batches)."""
    x = img.astype(jnp.float32)
    noised = apply_noise(x, key, cfg.noise_sigma, quantize=quantize)
    blurred = apply_motion_blur(x, cfg.blur_kernel, cfg.blur_angle_deg,
                                quantize=quantize, fast=fast)
    low = apply_lowres(x, cfg.downscale_factor, quantize=quantize)
    stacked = jnp.stack([x, noised, blurred, low], axis=0)
    variant = jnp.broadcast_to(jnp.asarray(variant), (img.shape[0],))
    return jnp.take_along_axis(
        stacked, variant[None, :, None, None, None], axis=0)[0]
