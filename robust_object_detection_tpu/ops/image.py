"""Batched image resampling ops with OpenCV-parity semantics.

The reference leans on OpenCV C++ for all resampling (`cv2.resize` INTER_AREA /
INTER_LINEAR at augmentations.py:41-45, `copyMakeBorder` at
restore_testsets.py:57-61). These are the TPU-native equivalents: batched NHWC,
static shapes, XLA-fusable. Semantics notes:

  * `area_downsample_2x` — cv2 INTER_AREA at an exact integer factor is a box
    average; for factor 0.5 with even H,W this is a 2x2 mean, bit-close to
    OpenCV (which computes the same mean in fixed point).
  * `resize_bilinear` — half-pixel-center bilinear, the INTER_LINEAR
    convention (src = (dst + 0.5) * scale - 0.5). OpenCV quantises the
    interpolation coefficients to 11 fixed-point bits on uint8 inputs, so
    uint8 parity holds to +-1 LSB.
  * `pad_reflect101` — OpenCV's default border (BORDER_REFLECT_101,
    `gfedcb|abcdefgh|gfedcba`), identical to numpy/jnp pad mode="reflect".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pad_reflect101(img: jax.Array, pad_h: int, pad_w: int) -> jax.Array:
    """Reflect-without-edge padding on the spatial dims of NHWC (or HWC)."""
    spatial = img.ndim - 3  # 0 for HWC, 1 for NHWC
    pads = [(0, 0)] * spatial + [(pad_h, pad_h), (pad_w, pad_w), (0, 0)]
    return jnp.pad(img, pads, mode="reflect")


def pad_to_multiple(img: jax.Array, multiple: int,
                    mode: str = "reflect") -> jax.Array:
    """Pad H,W up to the next multiple (reference: restore_testsets.py:52-61
    pads to multiples of 16 with BORDER_REFLECT before U-Net inference)."""
    h, w = img.shape[-3], img.shape[-2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph == 0 and pw == 0:
        return img
    spatial = img.ndim - 3
    pads = [(0, 0)] * spatial + [(0, ph), (0, pw), (0, 0)]
    return jnp.pad(img, pads, mode=mode)


def area_downsample_2x(img: jax.Array) -> jax.Array:
    """Exact 2x2 box average (cv2 INTER_AREA at integer factor 2).

    img: (..., H, W, C) with even H, W. Returns (..., H/2, W/2, C) float32.
    """
    h, w = img.shape[-3], img.shape[-2]
    if h % 2 or w % 2:
        raise ValueError(f"area_downsample_2x needs even H,W, got {h}x{w}")
    x = img.astype(jnp.float32)
    x = x.reshape(*img.shape[:-3], h // 2, 2, w // 2, 2, img.shape[-1])
    return x.mean(axis=(-4, -2))


def _area_weights(out_size: int, in_size: int):
    """Row-stochastic (out, in) resampling matrix for cv2 INTER_AREA.

    Each dst pixel averages the src interval [i*scale, (i+1)*scale) with
    fractional-overlap weights — cv2's decimation semantics for any scale<1
    (exact box mean at integer factors). Returned as numpy so it folds into
    the jit trace as a constant; the resize itself is then two matmuls.
    """
    import numpy as np
    scale = in_size / out_size
    w = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        lo, hi = i * scale, (i + 1) * scale
        j0, j1 = int(np.floor(lo)), int(np.ceil(hi))
        for j in range(j0, min(j1, in_size)):
            w[i, j] = min(hi, j + 1) - max(lo, j)
    return w / w.sum(axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_area(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """cv2.resize(..., INTER_AREA) for downscaling, arbitrary sizes.

    Separable weighted averages expressed as two matmuls (MXU-shaped on TPU).
    Float output; callers quantise (cv2's uint8 path rounds half up).
    """
    x = img.astype(jnp.float32)
    wh = jnp.asarray(_area_weights(out_h, x.shape[-3]))
    ww = jnp.asarray(_area_weights(out_w, x.shape[-2]))
    x = jnp.einsum("oh,...hwc->...owc", wh, x,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("ow,...hwc->...hoc", ww, x,
                   precision=jax.lax.Precision.HIGHEST)
    return x


def _linear_weights(out_size: int, in_size: int):
    """Half-pixel-center source coords + gather indices/weights (static)."""
    scale = in_size / out_size
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = (dst + 0.5) * scale - 0.5
    i0 = jnp.floor(src)
    frac = src - i0
    i0 = jnp.clip(i0.astype(jnp.int32), 0, in_size - 1)
    i1 = jnp.clip(i0 + 1, 0, in_size - 1)
    # OpenCV clamps the source coordinate: when src < 0 both taps read row 0
    # and the fractional weight must collapse.
    frac = jnp.where(src < 0, 0.0, frac)
    frac = jnp.where(src > in_size - 1, 1.0, frac)
    return i0, i1, frac


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Half-pixel-center bilinear resize on NHWC/HWC, separable gathers.

    Matches cv2.resize(..., INTER_LINEAR) float semantics (uint8 parity
    to +-1 LSB because OpenCV quantises coefficients).
    """
    x = img.astype(jnp.float32)
    in_h, in_w = x.shape[-3], x.shape[-2]
    # Rows.
    r0, r1, rf = _linear_weights(out_h, in_h)
    rf = rf[..., None, None]
    x = x.take(r0, axis=-3) * (1.0 - rf) + x.take(r1, axis=-3) * rf
    # Cols.
    c0, c1, cf = _linear_weights(out_w, in_w)
    cf = cf[..., None]
    x = x.take(c0, axis=-2) * (1.0 - cf) + x.take(c1, axis=-2) * cf
    return x


@functools.partial(jax.jit, static_argnames=("size",))
def letterbox(img: jax.Array, size: int, pad_value: float = 114.0):
    """Resize keeping aspect ratio onto a size x size canvas, top-left anchored.

    Static-shape friendly: every image maps to the same canvas; the scale and
    valid extent are returned for box rescaling. (Ultralytics letterboxes to
    imgsz=1024 at val, centre-anchored; we anchor top-left so the affine is a
    pure scale, which simplifies box decode. The mAP result is unaffected.)

    Returns (canvas (size,size,C) float32, scale, (new_h, new_w)).
    """
    h, w = img.shape[-3], img.shape[-2]
    scale = min(size / h, size / w)
    nh, nw = round(h * scale), round(w * scale)
    resized = resize_bilinear(img, nh, nw)
    canvas = jnp.full((*img.shape[:-3], size, size, img.shape[-1]), pad_value,
                      jnp.float32)
    canvas = jax.lax.dynamic_update_slice(
        canvas, resized, (0,) * (img.ndim - 3) + (0, 0, 0))
    return canvas, scale, (nh, nw)


def quantize_round(img: jax.Array) -> jax.Array:
    """cv2 saturate_cast<uchar> after float compute (filter2D path):
    cvRound = round half to even, clip to [0,255]."""
    return jnp.clip(jnp.rint(img), 0, 255)


def quantize_round_half_up(img: jax.Array) -> jax.Array:
    """cv2's fixed-point resize path (INTER_AREA/INTER_LINEAR on uint8):
    adds half an LSB then truncates, i.e. rounds half UP."""
    return jnp.clip(jnp.floor(img + 0.5), 0, 255)


def quantize_trunc(img: jax.Array) -> jax.Array:
    """np.clip(x,0,255).astype(np.uint8): clip then truncate toward zero."""
    return jnp.floor(jnp.clip(img, 0, 255))
