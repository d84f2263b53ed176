"""SSIM / PSNR metrics, exactly matching the reference's hand-rolled SSIM.

The reference computes SSIM with an 11x11 sigma=1.5 gaussian window applied as
a depthwise conv with ZERO padding of window//2 (train_restoration.py:135-164
uses F.conv2d(padding=5)) — note this differs from the classical
valid-window SSIM; edge pixels see zero-padded statistics. We replicate that
choice bit-for-bit so PSNR/SSIM numbers are comparable to the published
34.03 dB / 0.947 (docs/06_restoration_experiment.md:53-58).

Inputs are NHWC float in [0, 1].
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """Separable gaussian, normalised to sum 1 (train_restoration.py:135-139:
    coords = arange(size) - size//2)."""
    coords = np.arange(size, dtype=np.float32) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    w = np.outer(g, g)
    return (w / w.sum()).astype(np.float32)


def _depthwise_zero_pad_conv(x: jax.Array, kern2d: jax.Array) -> jax.Array:
    """Depthwise conv, SAME-style zero padding (torch conv2d padding=k//2)."""
    c = x.shape[-1]
    k = kern2d.shape[0]
    kern = jnp.tile(kern2d[:, :, None, None], (1, 1, 1, c))
    # HIGHEST: the TPU default would run this through bf16, destroying the
    # variance terms (E[x^2] - E[x]^2 cancels catastrophically).
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("window_size", "sigma"))
def ssim(pred: jax.Array, target: jax.Array, window_size: int = 11,
         sigma: float = 1.5) -> jax.Array:
    """Mean SSIM over the batch (train_restoration.py:142-164 semantics)."""
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    kern = jnp.asarray(gaussian_window(window_size, sigma))

    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    mu1 = _depthwise_zero_pad_conv(p, kern)
    mu2 = _depthwise_zero_pad_conv(t, kern)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_zero_pad_conv(p * p, kern) - mu1_sq
    sigma2_sq = _depthwise_zero_pad_conv(t * t, kern) - mu2_sq
    sigma12 = _depthwise_zero_pad_conv(p * t, kern) - mu12

    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return ssim_map.mean()


@jax.jit
def psnr(pred: jax.Array, target: jax.Array) -> jax.Array:
    """10*log10(1/MSE) on [0,1] images; 100 dB at zero error
    (train_restoration.py:184-189)."""
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return jnp.where(mse == 0, 100.0, 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12)))


@functools.partial(jax.jit, static_argnames=("ssim_weight",))
def restoration_loss(pred: jax.Array, target: jax.Array,
                     ssim_weight: float = 0.3) -> jax.Array:
    """L1 + w*(1-SSIM) (train_restoration.py:167-178)."""
    l1 = jnp.mean(jnp.abs(pred - target))
    return l1 + ssim_weight * (1.0 - ssim(pred, target))
