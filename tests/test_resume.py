"""Train-loop checkpoint resume: a second train() call continues from the
saved epoch instead of restarting (SURVEY.md §5 — the reference rewrites
last.pth but cannot resume)."""

from pathlib import Path

import numpy as np

from robust_object_detection_tpu.core import artifacts
from robust_object_detection_tpu.core.config import (ExperimentConfig,
                                                     MeshConfig, TrainConfig)
from robust_object_detection_tpu.data import convert, synthetic
import pytest

pytestmark = pytest.mark.slow    # compiles jitted train steps on the CPU mesh


def test_detector_train_resume(tmp_path):
    from robust_object_detection_tpu.train import detector

    det = synthetic.make_det_split(tmp_path / "det", n_images=4,
                                   size_range=((48, 49), (48, 49)))
    convert.convert_det_to_coco(det, tmp_path / "coco", "train")
    cfg = ExperimentConfig(train=TrainConfig(seed=0),
                           mesh=MeshConfig(data=1, model=1))
    out = tmp_path / "run"
    kwargs = dict(augment=False, variant="n", epochs=3, img_size=64,
                  batch_size=2, max_boxes=16, mosaic=False,
                  base_augment=False)
    r1 = detector.train(cfg, tmp_path / "coco", out, max_steps=2, **kwargs)
    hist1 = artifacts.read_jsonl(out / "history.jsonl")
    assert [h["epoch"] for h in hist1] == [1]

    # second call resumes at epoch 2 and runs to completion
    r2 = detector.train(cfg, tmp_path / "coco", out, **kwargs)
    hist2 = artifacts.read_jsonl(out / "history.jsonl")
    assert [h["epoch"] for h in hist2] == [1, 2, 3]
    assert r2["steps"] >= r1["steps"]

    model, state = detector.load_checkpoint(out, variant="n", img_size=64)
    assert state.params is not None


def test_frcnn_train_resume(tmp_path):
    from robust_object_detection_tpu.models import frcnn as F
    from robust_object_detection_tpu.train import frcnn as TF

    det = synthetic.make_det_split(tmp_path / "det", n_images=4,
                                   size_range=((64, 65), (64, 65)))
    convert.convert_det_to_coco(det, tmp_path / "coco", "train")
    cfg = ExperimentConfig(train=TrainConfig(seed=0),
                           mesh=MeshConfig(data=1, model=1))
    out = tmp_path / "run"
    kwargs = dict(augment=False, epochs=2, img_size=64, batch_size=2,
                  max_boxes=16,
                  # small proposal/sample counts: the sequential NMS/top-k
                  # loops at default counts run ~100x slower on the CPU
                  # mesh; counts don't change the param tree, so resume/
                  # load_checkpoint semantics are identical
                  model_kwargs=dict(pre_nms_topk=64, num_proposals=32,
                                    roi_batch=32, rpn_batch=32))
    TF.train(cfg, tmp_path / "coco", out, max_steps=1, **kwargs)
    TF.train(cfg, tmp_path / "coco", out, **kwargs)
    hist = artifacts.read_jsonl(out / "history.jsonl")
    assert [h["epoch"] for h in hist] == [1, 2]
    model, state = TF.load_checkpoint(out, img_size=64)
    assert state.params is not None
