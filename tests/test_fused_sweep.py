"""Fused on-device sweep: plumbing parity vs the separate-stage ops.

The fused step must chain EXACTLY the ops the disk path runs (minus the
JPEG round trip and the MT19937 noise stream, both documented in
eval/fused_sweep.py). These tests pin each pass of the fused output to a
manually chained corrupt/restore/letterbox/predict on the same inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from robust_object_detection_tpu.core.config import CorruptionConfig
from robust_object_detection_tpu.data import convert, pipeline as pipe
from robust_object_detection_tpu.data import synthetic
from robust_object_detection_tpu.eval import fused_sweep
from robust_object_detection_tpu.models import unet as unet_lib
from robust_object_detection_tpu.models import yolov8 as yolo_lib
from robust_object_detection_tpu.ops import corrupt as corrupt_ops
from robust_object_detection_tpu.ops import image as image_ops
from robust_object_detection_tpu.train import detector as det

IMG = 64


@pytest.fixture(scope="module")
def setup():
    model = yolo_lib.create(6, "n")
    state = det.init_state(model, jax.random.key(0), IMG, optax.sgd(0.01))
    predict = det.make_predict_step(model, IMG, num_candidates=64,
                                    max_det=32)
    umodel = unet_lib.create(channels=(8, 16))
    uvars = unet_lib.init_variables(umodel, jax.random.key(1))
    return model, state, predict, umodel, uvars


def test_fused_step_matches_separate_stages(setup, rng):
    _, state, predict, umodel, uvars = setup
    b, h, w = 2, 32, 48
    clean = jnp.asarray(rng.integers(0, 255, (b, h, w, 3)).astype(np.uint8))
    key = jax.random.key(7)
    cfg = CorruptionConfig()

    step = fused_sweep.make_fused_step(predict, umodel, (h, w), IMG, cfg)
    boxes, scores, classes, valid = jax.device_get(
        step(state, uvars, clean, key))
    assert boxes.shape[:2] == (8, b)

    def manual(img_f32):
        canvas, _, _ = image_ops.letterbox(jnp.asarray(img_f32), IMG)
        return jax.device_get(predict(state, canvas.astype(jnp.uint8)))

    # pass 0: corrupted-Clean == plain predict on the clean pixels
    m = manual(clean.astype(jnp.float32))
    np.testing.assert_allclose(scores[0], m[1], atol=1e-5)
    # pass 4: restored-Clean copies through unchanged == pass 0
    np.testing.assert_allclose(scores[4], scores[0], atol=1e-6)
    np.testing.assert_allclose(boxes[4], boxes[0], atol=1e-4)

    # pass 2: corrupted-Blur == predict(apply_motion_blur(clean))
    blurred = corrupt_ops.apply_motion_blur(clean.astype(jnp.float32),
                                            cfg.blur_kernel,
                                            cfg.blur_angle_deg)
    m = manual(blurred)
    np.testing.assert_allclose(scores[2], m[1], atol=1e-5)

    # pass 6: restored-Blur == predict(unet_u8(blurred))
    apply_u8 = unet_lib.jit_apply_u8(umodel)
    rest = apply_u8(uvars, jnp.pad(
        blurred.astype(jnp.uint8), ((0, 0), (0, 0), (0, 0), (0, 0))))
    m = manual(np.asarray(rest).astype(np.float32))
    np.testing.assert_allclose(scores[6], m[1], atol=1e-5)


def test_fused_step_rejects_odd_dims(setup):
    _, _, predict, umodel, _ = setup
    with pytest.raises(ValueError, match="even"):
        fused_sweep.make_fused_step(predict, umodel, (33, 48), IMG)


def test_run_fused_sweep_summaries(setup, tmp_path):
    _, state, predict, umodel, uvars = setup
    split = synthetic.make_det_split(tmp_path / "raw", n_images=4,
                                     size_range=((32, 33), (48, 49)))
    convert.convert_det_to_coco(split, tmp_path / "coco", "val")
    samples = pipe.index_coco(tmp_path / "coco", "val")
    out = fused_sweep.run_fused_sweep(
        predict, state, umodel, uvars, samples, IMG, batch_size=2)
    assert out["images_evaluated"] == 4 * 8
    for strategy in ("corrupted", "restored"):
        for variant in fused_sweep.TESTSET_VARIANTS:
            s = out[strategy][variant]
            assert 0.0 <= s["mAP50"] <= 1.0
            assert s["images"] == 4
    # restored-Clean is the clean copy-through: identical detections
    assert (out["restored"]["Test_Clean"]["mAP50"]
            == out["corrupted"]["Test_Clean"]["mAP50"])


@pytest.mark.slow
def test_mt19937_parity_vs_disk_path(setup, tmp_path):
    """The fused sweep in mt19937_rng mode reproduces the disk path.

    Lossless PNG sources at native size == canvas size (scale-1 letterbox
    on both paths), so every stage is pixel-exact end to end: the only
    fused-vs-disk deltas the module documents (Threefry noise, JPEG round
    trips) are both removed here, and the 8-pass summaries must be EQUAL,
    not close.
    """
    from robust_object_detection_tpu.data import restore, testsets as ts
    from robust_object_detection_tpu.eval import detector_eval as DE
    from robust_object_detection_tpu.train import restoration as rtrain
    from robust_object_detection_tpu.core.config import (ExperimentConfig,
                                                         MeshConfig,
                                                         RestorationConfig)
    from PIL import Image

    _, state, predict, _, _ = setup
    det_split = synthetic.make_det_split(
        tmp_path / "raw", n_images=4, size_range=((IMG, IMG + 1),) * 2,
        ext="png")
    proc = tmp_path / "proc"
    convert.convert_det_to_coco(det_split, proc / "visdrone_coco6", "val")
    convert.convert_det_to_yolo(det_split, proc / "visdrone_yolo6", "val")
    ts.build_all(proc, tmp_path / "testsets")

    # tiny U-Net checkpoint shared by both legs
    cfg = ExperimentConfig(
        restoration=RestorationConfig(channels=(8, 16), patch_size=32,
                                      epochs=1, batch_size=8, val_every=1),
        mesh=MeshConfig(data=jax.device_count(), model=1))
    unet_dir = tmp_path / "unet"
    rtrain.train(cfg, proc / "visdrone_coco6" / "images" / "val",
                 proc / "visdrone_coco6" / "images" / "val",
                 out_dir=unet_dir, max_steps=2)
    umodel, uvars = rtrain.load_best(unet_dir, (8, 16))

    samples = pipe.index_coco(proc / "visdrone_coco6", "val")

    # leg 0: the frozen Test_Noise images ARE the replayed stream's draws
    # (positions the coco6 stream after the yolo6 layout's — same images)
    rng = fused_sweep.frozen_noise_rng(skip_splits=[samples])
    for s in sorted(samples, key=lambda s: s.image_path.name):
        n = rng.normal(0.0, 15.0, (s.height, s.width, 3)).astype(np.float32)
        clean = np.asarray(Image.open(s.image_path).convert("RGB"))
        expect = np.clip(clean.astype(np.float32) + n[..., ::-1],
                         0, 255).astype(np.uint8)
        disk = np.asarray(Image.open(
            tmp_path / "testsets" / "coco6" / "Test_Noise" / "images" /
            "val" / s.image_path.name).convert("RGB"))
        np.testing.assert_array_equal(expect, disk, err_msg=s.image_path.name)

    # leg 1: disk path — restore the testsets, eval all 8 (variant, strategy)
    restore.restore_testsets(tmp_path / "testsets", unet_dir,
                             channels=(8, 16), batch_size=4)
    disk_out = {}
    for strategy, layout in (("corrupted", "coco6"),
                             ("restored", "coco6_restored")):
        disk_out[strategy] = {}
        for variant in fused_sweep.TESTSET_VARIANTS:
            vs = pipe.index_coco(
                tmp_path / "testsets" / layout / variant, "val")
            disk_out[strategy][variant] = DE.evaluate_on_samples(
                predict, state, vs, IMG, batch_size=2)

    # leg 2: fused sweep with the frozen stream replayed on host
    fused_out = fused_sweep.run_fused_sweep(
        predict, state, umodel, uvars, samples, IMG, batch_size=2,
        mt19937_rng=fused_sweep.frozen_noise_rng(skip_splits=[samples]))

    for strategy in fused_sweep.STRATEGIES:
        for variant in fused_sweep.TESTSET_VARIANTS:
            f, d = fused_out[strategy][variant], disk_out[strategy][variant]
            for k in ("mAP50", "mAP50_95", "per_class_ap50", "images"):
                assert f[k] == d[k], (strategy, variant, k, f[k], d[k])
    assert fused_out["images_evaluated"] == 4 * 8
    # non-vacuous: the random-init model at conf=0.001 emits detections
    h0, w0 = samples[0].height, samples[0].width
    step = fused_sweep.make_fused_step(predict, umodel, (h0, w0), IMG,
                                       host_noise=True)
    clean0 = np.asarray(Image.open(samples[0].image_path).convert("RGB"))
    _, _, _, valid = jax.device_get(step(
        state, uvars, jnp.asarray(clean0[None]),
        jnp.zeros((1, h0, w0, 3), jnp.float32)))
    assert valid.sum() > 0


def test_run_fused_sweep_without_unet(setup, tmp_path):
    _, state, predict, _, _ = setup
    split = synthetic.make_det_split(tmp_path / "raw", n_images=2,
                                     size_range=((32, 33), (32, 33)))
    convert.convert_det_to_coco(split, tmp_path / "coco", "val")
    samples = pipe.index_coco(tmp_path / "coco", "val")
    out = fused_sweep.run_fused_sweep(
        predict, state, None, None, samples, IMG, batch_size=2)
    assert out["images_evaluated"] == 2 * 4
    assert "restored" not in out
