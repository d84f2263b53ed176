"""Restoration U-Net: architecture parity, training smoke test on the
8-device CPU mesh, full-res restore path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_object_detection_tpu.core.config import (ExperimentConfig,
                                                     MeshConfig,
                                                     RestorationConfig)
from robust_object_detection_tpu.models import unet as unet_lib

pytestmark = pytest.mark.slow    # compiles jitted train steps on the CPU mesh


@pytest.fixture(scope="module")
def model_and_vars():
    model = unet_lib.create()
    variables = unet_lib.init_variables(model, jax.random.key(0), patch=64)
    return model, variables, unet_lib.jit_apply(model)


def test_param_count_matches_reference(model_and_vars):
    """3.70M params (docs/06_restoration_experiment.md:26; restoration_net.py
    architecture: 4 down [32,64,128,256] + bottleneck + 4 up + 1x1 out)."""
    _, variables, _ = model_and_vars
    n = unet_lib.param_count(variables)
    assert abs(n - 3_700_000) < 50_000, n


def test_forward_shapes_and_range(model_and_vars):
    model, variables, apply = model_and_vars
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    y = apply(variables, x)
    assert y.shape == x.shape
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_residual_structure(model_and_vars):
    """output = clamp(x + residual): with zeroed final conv, output == input."""
    model, variables, apply = model_and_vars
    params = jax.tree.map(jnp.copy, variables["params"])
    # Zero the output 1x1 conv — the only top-level plain Conv ("Conv_0").
    params["Conv_0"]["kernel"] = jnp.zeros_like(params["Conv_0"]["kernel"])
    params["Conv_0"]["bias"] = jnp.zeros_like(params["Conv_0"]["bias"])
    x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))
    y = apply({"params": params,
               "batch_stats": variables["batch_stats"]}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_restore_image_odd_size(model_and_vars):
    """Pad-to-16 + unpad handles arbitrary sizes (restore_testsets.py:52-79)."""
    model, variables, apply = model_and_vars
    img = jax.random.uniform(jax.random.key(3), (37, 53, 3))
    out = unet_lib.restore_image(apply, variables, img)
    assert out.shape == (37, 53, 3)


def test_train_smoke_sharded(tmp_path):
    """A few sharded steps on the 8-device CPU mesh: loss finite and
    decreasing-ish, checkpoints written, history logged."""
    from PIL import Image
    from robust_object_detection_tpu.train import restoration as rtrain

    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        d = tmp_path / "imgs" / split
        d.mkdir(parents=True)
        for i in range(8):
            Image.fromarray(rng.randint(0, 255, (80, 96, 3), dtype=np.uint8)
                            ).save(d / f"im{i}.jpg", quality=95)

    cfg = ExperimentConfig(
        restoration=RestorationConfig(patch_size=64, epochs=2, batch_size=8,
                                      val_every=1),
        mesh=MeshConfig(data=8, model=1))
    out = rtrain.train(cfg, tmp_path / "imgs" / "train",
                       tmp_path / "imgs" / "val",
                       out_dir=tmp_path / "run", max_steps=3)
    assert out["best"]["psnr"] > 0
    assert (tmp_path / "run" / "history.jsonl").exists()
    model, variables = rtrain.load_best(tmp_path / "run")
    y = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert y.shape == (1, 64, 64, 3)


def test_unet_learns_to_restore(tmp_path, monkeypatch):
    """Learning-signal test (VERDICT r3 #4): a few hundred steps on smooth
    synthetic images must give restored PSNR > corrupted PSNR + 2 dB on
    noise-sigma15 pairs — the published-figure measurement shape
    (docs/06_restoration_experiment.md:53-58 reports 34.03 dB restored vs
    the corrupted baseline). The val trajectory (val_psnr / val_psnr_in)
    lands in history.jsonl, so the real-data run is a config change only.
    """
    from PIL import Image
    from robust_object_detection_tpu.core import artifacts
    from robust_object_detection_tpu.data import synthetic
    from robust_object_detection_tpu.ops import ssim as ssim_ops
    from robust_object_detection_tpu.train import restoration as rtrain

    from robust_object_detection_tpu.ops import corrupt as corrupt_ops

    synthetic.make_smooth_images(tmp_path / "imgs" / "train", n_images=16,
                                 hw=(64, 64), seed=0)
    synthetic.make_smooth_images(tmp_path / "imgs" / "val", n_images=8,
                                 hw=(64, 64), seed=1)
    # noise-sigma15 pairs only (the VERDICT-prescribed setup): the tiny
    # (8,16) test net can't also learn deblur/upsample in 300 steps —
    # the production uniform3 mix stays the default everywhere else
    monkeypatch.setattr(
        rtrain, "corrupt_uniform3",
        lambda img, key, cfg: corrupt_ops.apply_noise(
            img, key, cfg.noise_sigma, quantize=False))
    cfg = ExperimentConfig(
        restoration=RestorationConfig(channels=(16, 32), patch_size=32,
                                      epochs=500, batch_size=8, lr=2e-3,
                                      val_every=100),
        mesh=MeshConfig(data=8, model=1))
    out = rtrain.train(cfg, tmp_path / "imgs" / "train",
                       tmp_path / "imgs" / "val", out_dir=tmp_path / "run")
    hist = artifacts.read_jsonl(tmp_path / "run" / "history.jsonl")
    val_recs = [h for h in hist if "val_psnr" in h]
    assert len(val_recs) >= 2 and "val_psnr_in" in val_recs[-1]

    # noise-sigma15 measurement on held-out full images with the best ckpt
    model, variables = rtrain.load_best(tmp_path / "run", (16, 32))
    apply = unet_lib.jit_apply(model)
    rng = np.random.RandomState(7)
    clean = np.stack([
        np.asarray(Image.open(p).convert("RGB")) for p in
        sorted((tmp_path / "imgs" / "val").glob("*.png"))]).astype(np.float32)
    noisy = np.clip(clean + rng.normal(0, 15.0, clean.shape), 0, 255)
    restored = apply(variables, jnp.asarray(noisy / 255.0))
    p_in = float(ssim_ops.psnr(jnp.asarray(noisy / 255.0),
                               jnp.asarray(clean / 255.0)))
    p_out = float(ssim_ops.psnr(restored, jnp.asarray(clean / 255.0)))
    print(f"psnr corrupted={p_in:.2f} restored={p_out:.2f}")
    assert p_out > p_in + 2.0, (p_in, p_out)
