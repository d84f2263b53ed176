"""Golden tests: on-device corruption ops vs OpenCV/numpy reference semantics.

The reference corruption functions (augmentations.py:21-56) are re-executed
here *at test time* with cv2/numpy to produce goldens; the framework's JAX
ops must match bit-close (exact for blur/noise given the same noise tensor,
+-1 LSB for the lowres path due to OpenCV's fixed-point bilinear).
"""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robust_object_detection_tpu.core.config import CorruptionConfig
from robust_object_detection_tpu.ops import corrupt, image as image_ops


def _cv_motion_blur_kernel(k, angle_deg):
    # reference: augmentations.py:21-27
    kernel = np.zeros((k, k), dtype=np.float32)
    kernel[k // 2, :] = 1.0
    M = cv2.getRotationMatrix2D((k / 2 - 0.5, k / 2 - 0.5), angle_deg, 1.0)
    kernel = cv2.warpAffine(kernel, M, (k, k))
    return kernel / (kernel.sum() + 1e-8)


def _rand_img(rng, h=64, w=80, c=3):
    return rng.integers(0, 256, (h, w, c)).astype(np.uint8)


# ── blur kernel construction ─────────────────────────────────────────────

@pytest.mark.parametrize("k,angle", [(9, 0.0), (9, 30.0), (5, 45.0),
                                     (13, 90.0), (9, 135.0)])
def test_motion_blur_kernel_matches_cv2(k, angle):
    ours = corrupt.motion_blur_kernel(k, angle)
    ref = _cv_motion_blur_kernel(k, angle)
    np.testing.assert_allclose(ours, ref, atol=2e-6)


# ── blur op ──────────────────────────────────────────────────────────────

@pytest.mark.parametrize("angle", [0.0, 30.0])
def test_motion_blur_matches_cv2(rng, angle):
    img = _rand_img(rng)
    ref = cv2.filter2D(img, -1, _cv_motion_blur_kernel(9, angle))
    ours = np.asarray(corrupt.apply_motion_blur(
        jnp.asarray(img, jnp.float32), k=9, angle_deg=angle)).astype(np.uint8)
    # cvRound is round-half-to-even like rint; with Precision.HIGHEST the
    # conv is bit-exact vs cv2 on CPU — allow 1 LSB of slack for accumulation
    # order only.
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1
    assert (ours == ref).mean() > 0.999


def test_motion_blur_batched(rng):
    imgs = np.stack([_rand_img(rng) for _ in range(4)])
    out = corrupt.apply_motion_blur(jnp.asarray(imgs, jnp.float32))
    assert out.shape == imgs.shape
    ref0 = cv2.filter2D(imgs[0], -1, _cv_motion_blur_kernel(9, 0.0))
    assert np.abs(np.asarray(out[0]).astype(int) - ref0.astype(int)).max() <= 1


# ── noise op ─────────────────────────────────────────────────────────────

def test_noise_quantization_matches_numpy(rng):
    """Given identical noise values, clip+trunc must match the reference's
    np.clip(...).astype(np.uint8) (augmentations.py:30-33)."""
    img = _rand_img(rng)
    noise = rng.normal(0, 15, img.shape).astype(np.float32)
    ref = np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)
    ours = np.asarray(image_ops.quantize_trunc(
        jnp.asarray(img, jnp.float32) + jnp.asarray(noise))).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)


def test_noise_distribution():
    img = jnp.full((2, 64, 64, 3), 128.0)
    out = corrupt.apply_noise(img, jax.random.key(0), sigma=15.0)
    delta = np.asarray(out) - 128.0
    # quantize_trunc floors like the reference's astype(np.uint8), which
    # biases the mean by exactly -0.5; the spread must stay sigma.
    assert abs(delta.mean() + 0.5) < 0.2
    assert abs(delta.std() - 15.0) < 1.0  # clip effects negligible at 128


# ── lowres op ────────────────────────────────────────────────────────────

def test_lowres_matches_cv2_even_dims(rng):
    img = _rand_img(rng, h=64, w=96)
    small = cv2.resize(img, (48, 32), interpolation=cv2.INTER_AREA)
    ref = cv2.resize(small, (96, 64), interpolation=cv2.INTER_LINEAR)
    ours = np.asarray(corrupt.apply_lowres(
        jnp.asarray(img, jnp.float32))).astype(np.uint8)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1          # cv2 11-bit fixed-point bilinear coeffs
    assert (diff == 0).mean() > 0.85


def test_area_downsample_exact(rng):
    img = _rand_img(rng, h=32, w=32).astype(np.float32)
    ours = np.asarray(image_ops.area_downsample_2x(jnp.asarray(img)))
    ref = img.reshape(16, 2, 16, 2, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_resize_bilinear_matches_cv2(rng):
    img = _rand_img(rng, h=40, w=56).astype(np.float32)
    ref = cv2.resize(img, (112, 80), interpolation=cv2.INTER_LINEAR)
    ours = np.asarray(image_ops.resize_bilinear(jnp.asarray(img), 80, 112))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_resize_bilinear_downscale_matches_cv2(rng):
    img = _rand_img(rng, h=64, w=64).astype(np.float32)
    ref = cv2.resize(img, (24, 40), interpolation=cv2.INTER_LINEAR)
    ours = np.asarray(image_ops.resize_bilinear(jnp.asarray(img), 40, 24))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


# ── reflect101 padding ───────────────────────────────────────────────────

def test_pad_reflect101_matches_cv2(rng):
    img = _rand_img(rng, h=16, w=16)
    ref = cv2.copyMakeBorder(img, 4, 4, 4, 4, cv2.BORDER_REFLECT_101)
    ours = np.asarray(image_ops.pad_reflect101(
        jnp.asarray(img, jnp.float32), 4, 4)).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)


# ── random corruption selection ──────────────────────────────────────────

def test_random_corruption_choices():
    imgs = jnp.full((64, 32, 32, 3), 100.0)
    out, choice = corrupt.random_corruption(
        imgs, jax.random.key(1), CorruptionConfig())
    choice = np.asarray(choice)
    assert out.shape == imgs.shape
    # ~half clean, rest spread over 3 corruption types
    assert 0.3 < (choice == corrupt.CLEAN).mean() < 0.7
    assert set(np.unique(choice)) <= {0, 1, 2, 3}
    # clean images pass through untouched
    clean_idx = np.where(choice == corrupt.CLEAN)[0]
    np.testing.assert_array_equal(np.asarray(out[clean_idx]),
                                  np.asarray(imgs[clean_idx]))


def test_corrupt_variant_matches_single_ops(rng):
    imgs = jnp.asarray(np.stack([_rand_img(rng, 32, 32) for _ in range(3)]),
                       jnp.float32)
    key = jax.random.key(2)
    blurred = corrupt.corrupt_variant(imgs, corrupt.BLUR, key)
    direct = corrupt.apply_motion_blur(imgs)
    np.testing.assert_array_equal(np.asarray(blurred), np.asarray(direct))
