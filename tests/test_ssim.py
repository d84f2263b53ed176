"""SSIM/PSNR parity with the reference's torch implementation
(train_restoration.py:135-189), re-executed here with torch-cpu as the golden.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from robust_object_detection_tpu.ops import ssim as ssim_ops


def _torch_gaussian_kernel(size=11, sigma=1.5):
    coords = torch.arange(size, dtype=torch.float32) - size // 2
    g = torch.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = torch.outer(g, g)
    return (g / g.sum()).unsqueeze(0).unsqueeze(0)


def _torch_ssim(pred, target, window_size=11):
    # reference: train_restoration.py:142-164
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ch = pred.size(1)
    kernel = _torch_gaussian_kernel(window_size).expand(ch, 1, -1, -1)
    pad = window_size // 2
    mu1 = F.conv2d(pred, kernel, padding=pad, groups=ch)
    mu2 = F.conv2d(target, kernel, padding=pad, groups=ch)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = F.conv2d(pred ** 2, kernel, padding=pad, groups=ch) - mu1_sq
    s2 = F.conv2d(target ** 2, kernel, padding=pad, groups=ch) - mu2_sq
    s12 = F.conv2d(pred * target, kernel, padding=pad, groups=ch) - mu12
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return float(m.mean())


def test_ssim_matches_reference(rng):
    a = rng.uniform(0, 1, (2, 48, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    ref = _torch_ssim(torch.from_numpy(a).permute(0, 3, 1, 2),
                      torch.from_numpy(b).permute(0, 3, 1, 2))
    ours = float(ssim_ops.ssim(jnp.asarray(a), jnp.asarray(b)))
    # f32 conv accumulation-order differences bound the gap; published SSIM
    # numbers carry 3-4 decimals, so 1e-4 is well inside reporting precision.
    assert abs(ours - ref) < 1e-4


def test_ssim_identity():
    a = jnp.ones((1, 32, 32, 3)) * 0.5
    assert float(ssim_ops.ssim(a, a)) > 0.99


def test_psnr(rng):
    a = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + 0.1, 0, 1).astype(np.float32)
    mse = np.mean((a - b) ** 2)
    ref = 10 * np.log10(1.0 / mse)
    assert abs(float(ssim_ops.psnr(jnp.asarray(a), jnp.asarray(b))) - ref) < 1e-3
    assert float(ssim_ops.psnr(jnp.asarray(a), jnp.asarray(a))) == 100.0


def test_restoration_loss(rng):
    a = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    l1 = np.mean(np.abs(a - b))
    s = float(ssim_ops.ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = l1 + 0.3 * (1 - s)
    got = float(ssim_ops.restoration_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - ref) < 1e-5
