"""Fused Pallas corruption kernel vs the XLA reference path.

Runs under the TPU interpreter on CPU (pltpu.InterpretParams), which
executes the real kernel logic EXCEPT the hardware PRNG (it returns zeros
there) — noise statistics are asserted in the on-TPU verify drive instead
(.claude/skills/verify; measured mean -0.55 / std 15.06 on v5e).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_object_detection_tpu.core.config import CorruptionConfig
from robust_object_detection_tpu.ops import corrupt as C
from robust_object_detection_tpu.ops import pallas_corrupt as PC


@pytest.fixture(scope="module")
def img():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randint(0, 255, (4, 128, 64, 3))
                       .astype(np.float32))


def test_branch_parity_vs_xla(img):
    """Clean/blur bit-exact; lowres within 1 LSB in the interior (the fast
    path skips the intermediate uint8 rounding; borders use reflect-101
    instead of cv2's bilinear edge clamp)."""
    checked = set()
    for k in range(30):
        out, choice = PC.fused_random_corruption(img, jax.random.key(k),
                                                 interpret=True)
        out = np.asarray(out)
        for i, ch in enumerate(np.asarray(choice)):
            ch = int(ch)
            if ch in checked or ch == C.NOISE:
                continue
            checked.add(ch)
            x = img[i:i + 1]
            if ch == C.CLEAN:
                np.testing.assert_array_equal(out[i], np.asarray(x)[0])
            elif ch == C.BLUR:
                ref = np.asarray(C.apply_motion_blur(x, 9, 0.0))[0]
                np.testing.assert_array_equal(out[i], ref)
            elif ch == C.LOWRES:
                ref = np.asarray(C.apply_lowres(x, 0.5))[0]
                err = np.abs(out[i] - ref)
                assert err[4:-4, 4:-4].max() <= 1.0
        if checked == {C.CLEAN, C.BLUR, C.LOWRES}:
            break
    assert checked == {C.CLEAN, C.BLUR, C.LOWRES}, checked


def test_choice_distribution(img):
    counts = np.zeros(4)
    for k in range(40):
        _, choice = PC.fused_random_corruption(img, jax.random.key(100 + k),
                                               interpret=True)
        for ch in np.asarray(choice):
            counts[ch] += 1
    # p=0.5 clean, rest uniform over 3
    assert counts[0] / counts.sum() == pytest.approx(0.5, abs=0.12)


def test_shape_guards(img):
    with pytest.raises(ValueError):
        PC.fused_random_corruption(jnp.zeros((1, 100, 64, 3)),
                                   jax.random.key(0), interpret=True)
    with pytest.raises(NotImplementedError):
        PC.fused_random_corruption(
            img, jax.random.key(0),
            CorruptionConfig(blur_angle_deg=30.0), interpret=True)


def test_dispatcher_fallback(img):
    """random_corruption_fast falls back to the XLA path off-TPU."""
    out, choice = C.random_corruption_fast(img, jax.random.key(0))
    assert out.shape == img.shape
    ref, ref_choice = C.random_corruption(img, jax.random.key(0), fast=True)
    np.testing.assert_array_equal(np.asarray(choice), np.asarray(ref_choice))
