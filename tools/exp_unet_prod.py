"""Production-width U-Net learning trajectory (VERDICT r4 item 6).

The r4 learning-signal test proved trainability on a (16, 32) toy net; the
published 34.03 dB claim (docs/06_restoration_experiment.md:53-58) rests on
the PRODUCTION architecture — channels (32, 64, 128, 256), 256px patches,
the uniform3 corruption mix (train_restoration.py:246-293 recipe). This
script runs that exact config for a few hundred steps on synthetic smooth
images on the real chip and reports the per-corruption PSNR gain of the
best checkpoint, so the real-data run is a data swap only.

Usage:  PYTHONPATH=/root/repo python tools/exp_unet_prod.py [epochs]
Writes: /tmp/unet_prod/  (checkpoints + history.jsonl) and a summary line.
"""

import sys
import tempfile
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from robust_object_detection_tpu.core import artifacts
from robust_object_detection_tpu.core.config import (CorruptionConfig,
                                                     ExperimentConfig,
                                                     MeshConfig,
                                                     RestorationConfig)
from robust_object_detection_tpu.data import synthetic
from robust_object_detection_tpu.models import unet as unet_lib
from robust_object_detection_tpu.ops import corrupt as corrupt_ops
from robust_object_detection_tpu.ops import ssim as ssim_ops
from robust_object_detection_tpu.train import restoration as rtrain


def main() -> None:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    root = Path(tempfile.mkdtemp(prefix="unet_prod_"))
    print("devices:", jax.devices(), "out:", root)
    # 288px sources so the 256px random crop actually translates
    # textured sources: smooth images are blur/lowres-degenerate
    # (corrupted input at 55-67 dB), textured ones land in the
    # realistic 25-35 dB band for all three corruptions
    synthetic.make_textured_images(root / "imgs" / "train", n_images=48,
                                   hw=(288, 288), seed=0)
    synthetic.make_textured_images(root / "imgs" / "val", n_images=8,
                                   hw=(288, 288), seed=1)

    cfg = ExperimentConfig(
        restoration=RestorationConfig(epochs=epochs, val_every=max(
            1, epochs // 6)),
        mesh=MeshConfig(data=1, model=1))
    t0 = time.time()
    rtrain.train(cfg, root / "imgs" / "train", root / "imgs" / "val",
                 out_dir=root / "run")
    wall = time.time() - t0

    hist = artifacts.read_jsonl(root / "run" / "history.jsonl")
    vals = [h for h in hist if "val_psnr" in h]
    print(f"trained {epochs} epochs ({hist[-1]['epoch']} recs) "
          f"in {wall:.0f}s; val trajectory:")
    for h in vals:
        print(f"  epoch {h['epoch']:4d}: val_psnr={h['val_psnr']:.2f} "
              f"(input {h['val_psnr_in']:.2f})")

    # per-corruption measurement with the best checkpoint on held-out
    # full-res images (the published-figure measurement shape)
    model, variables = rtrain.load_best(root / "run")
    apply = unet_lib.jit_apply(model)
    from PIL import Image
    clean = np.stack([
        np.asarray(Image.open(p).convert("RGB")) for p in
        sorted((root / "imgs" / "val").glob("*.png"))]).astype(np.float32)
    ccfg = CorruptionConfig()
    rng = np.random.RandomState(7)
    cases = {
        "noise": np.clip(clean + rng.normal(0, ccfg.noise_sigma,
                                            clean.shape), 0, 255),
        "blur": np.asarray(corrupt_ops.apply_motion_blur(
            jnp.asarray(clean), ccfg.blur_kernel, ccfg.blur_angle_deg)),
        "lowres": np.asarray(corrupt_ops.apply_lowres(
            jnp.asarray(clean), ccfg.downscale_factor)),
    }
    summary = {}
    for name, corrupted in cases.items():
        x = jnp.asarray(corrupted / 255.0)
        y = jnp.asarray(clean / 255.0)
        out = apply(variables, x)
        p_in = float(ssim_ops.psnr(x, y))
        p_out = float(ssim_ops.psnr(out, y))
        s_out = float(ssim_ops.ssim(out, y).mean())
        summary[name] = dict(psnr_in=round(p_in, 2),
                             psnr_out=round(p_out, 2),
                             ssim_out=round(s_out, 4),
                             gain_db=round(p_out - p_in, 2))
        print(f"{name:7s}: in {p_in:6.2f} dB -> out {p_out:6.2f} dB "
              f"(gain {p_out - p_in:+.2f}), ssim {s_out:.4f}")
    import json
    print(json.dumps({"epochs": epochs, "wall_s": round(wall, 1),
                      "params": "(32,64,128,256) 3.70M", **summary}))


if __name__ == "__main__":
    main()
