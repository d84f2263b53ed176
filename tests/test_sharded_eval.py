"""Sharded evaluation over the 8-device CPU mesh: batches shard over the
data axis, detections gather back to host, mAP matches the unsharded run
exactly. This is the eval-side counterpart of __graft_entry__'s multi-chip
train dry run (SURVEY.md §2.3: sharded eval is additive, first-class
infrastructure)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from robust_object_detection_tpu.core.config import MeshConfig
from robust_object_detection_tpu.data import convert, pipeline, synthetic
from robust_object_detection_tpu.eval import detector_eval as DE
from robust_object_detection_tpu.models import yolov8 as Y
from robust_object_detection_tpu.parallel import mesh as mesh_lib
from robust_object_detection_tpu.train import detector as T

pytestmark = pytest.mark.slow    # compiles jitted train steps on the CPU mesh

IMG = 64


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sheval")
    det = synthetic.make_det_split(tmp / "det", n_images=8,
                                   size_range=((48, 49), (48, 49)))
    convert.convert_det_to_coco(det, tmp / "coco", "val")
    samples = pipeline.index_coco(tmp / "coco", "val")
    model = Y.create(6, "n")
    variables = Y.init_variables(model, jax.random.key(0), IMG)
    state = T.DetTrainState(variables["params"], variables["batch_stats"],
                            variables["params"], None, jnp.asarray(0))
    return samples, model, state


def test_sharded_eval_matches_unsharded(setup):
    samples, model, state = setup
    mesh = mesh_lib.make_mesh(MeshConfig(data=8, model=1))
    ctx = mesh_lib.MeshContext(mesh)

    predict_sharded = jax.jit(
        T.make_predict_step(model, IMG, max_det=50),
        in_shardings=(ctx.replicated, ctx.data),
        out_shardings=ctx.replicated)
    state_r = jax.tree.map(lambda x: jax.device_put(x, ctx.replicated),
                           state)
    s_sharded = DE.evaluate_on_samples(
        predict_sharded, state_r, samples, IMG, batch_size=8, ctx=ctx,
        max_boxes=32)

    predict_local = jax.jit(T.make_predict_step(model, IMG, max_det=50))
    s_local = DE.evaluate_on_samples(
        predict_local, state, samples, IMG, batch_size=8, max_boxes=32)

    assert s_sharded["images"] == s_local["images"] == 8
    assert s_sharded["mAP50"] == pytest.approx(s_local["mAP50"], abs=1e-9)
    assert s_sharded["mAP50_95"] == pytest.approx(s_local["mAP50_95"],
                                                  abs=1e-9)


def test_sharded_eval_matches_unsharded_rtdetr(setup):
    """RT-DETR predict (EMA params, NMS-free top-k postprocess) shards over
    the data axis with identical mAP — covers the deformable-decoder eval
    path the r2 equality test left YOLO-only (VERDICT r2 weak #6)."""
    from robust_object_detection_tpu.models import rtdetr as R
    from robust_object_detection_tpu.train import rtdetr as TR

    samples, _, _ = setup
    model = R.create(6)
    state = TR.init_state(model, jax.random.key(1), IMG,
                          TR.make_optimizer()[0])
    mesh = mesh_lib.make_mesh(MeshConfig(data=8, model=1))
    ctx = mesh_lib.MeshContext(mesh)

    predict_sharded = jax.jit(
        TR.make_predict_step(model, IMG, max_det=50),
        in_shardings=(ctx.replicated, ctx.data),
        out_shardings=ctx.replicated)
    state_r = jax.tree.map(lambda x: jax.device_put(x, ctx.replicated),
                           state)
    s_sharded = DE.evaluate_on_samples(
        predict_sharded, state_r, samples, IMG, batch_size=8, ctx=ctx,
        max_boxes=32)

    predict_local = jax.jit(TR.make_predict_step(model, IMG, max_det=50))
    s_local = DE.evaluate_on_samples(
        predict_local, state, samples, IMG, batch_size=8, max_boxes=32)

    assert s_sharded["images"] == s_local["images"] == 8
    assert s_sharded["mAP50"] == pytest.approx(s_local["mAP50"], abs=1e-9)
    assert s_sharded["mAP50_95"] == pytest.approx(s_local["mAP50_95"],
                                                  abs=1e-9)


def test_sharded_eval_matches_unsharded_frcnn(setup):
    """FRCNN predict (RPN proposals -> RoI head -> class-wise NMS) under
    the data-sharded layout; compile-cheap config mirroring
    __graft_entry__.dryrun_multichip's CPU-mesh FRCNN."""
    from robust_object_detection_tpu.train import frcnn as TF

    samples, _, _ = setup
    model = TF.F.FasterRCNN(
        TF.F.FrcnnConfig(blocks=(1, 1, 1, 1), pre_nms_topk=64,
                         num_proposals=32, roi_batch=32, rpn_batch=32))
    state = TF.init_state(model, jax.random.key(2), IMG,
                          TF.make_optimizer()[0])
    mesh = mesh_lib.make_mesh(MeshConfig(data=8, model=1))
    ctx = mesh_lib.MeshContext(mesh)

    predict_sharded = jax.jit(
        TF.make_predict_step(model, IMG),
        in_shardings=(ctx.replicated, ctx.data),
        out_shardings=ctx.replicated)
    state_r = jax.tree.map(lambda x: jax.device_put(x, ctx.replicated),
                           state)
    s_sharded = DE.evaluate_on_samples(
        predict_sharded, state_r, samples, IMG, batch_size=8, ctx=ctx,
        max_boxes=32)

    predict_local = jax.jit(TF.make_predict_step(model, IMG))
    s_local = DE.evaluate_on_samples(
        predict_local, state, samples, IMG, batch_size=8, max_boxes=32)

    assert s_sharded["images"] == s_local["images"] == 8
    assert s_sharded["mAP50"] == pytest.approx(s_local["mAP50"], abs=1e-9)
    assert s_sharded["mAP50_95"] == pytest.approx(s_local["mAP50_95"],
                                                  abs=1e-9)


def test_vid_layout_training_smoke(tmp_path):
    """VID pipeline end to end: VID split -> YOLO layout -> detector.train
    with layout=yolo (the reference's train_vid_* scripts)."""
    from robust_object_detection_tpu.core.config import (ExperimentConfig,
                                                         TrainConfig)

    vid = synthetic.make_vid_split(tmp_path / "vid", n_seqs=2,
                                   frames_per_seq=4, hw=(48, 48))
    convert.convert_vid_to_yolo(vid, tmp_path / "vid_yolo6", "train")
    cfg = ExperimentConfig(train=TrainConfig(seed=0),
                           mesh=MeshConfig(data=1, model=1))
    out = tmp_path / "run"
    r = detector_train_quick(cfg, tmp_path / "vid_yolo6", out)
    assert r["steps"] >= 1
    from robust_object_detection_tpu.core import artifacts
    hist = artifacts.read_jsonl(out / "history.jsonl")
    assert hist and "train_loss" in hist[0]


def detector_train_quick(cfg, root, out):
    from robust_object_detection_tpu.train import detector
    return detector.train(cfg, root, out, augment=True, variant="n",
                          epochs=1, img_size=IMG, batch_size=2,
                          max_boxes=16, max_steps=2, mosaic=False,
                          base_augment=True, layout="yolo")
