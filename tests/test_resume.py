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


def test_detector_midepoch_resume(tmp_path, monkeypatch):
    """A run killed mid-epoch (save_every_steps set) resumes at the exact
    batch: the resumed run finishes the interrupted epoch from where it
    stopped instead of restarting or skipping it (VERDICT r3 #8 — the
    step counter is checkpointed with {epoch, batch_in_epoch} metadata)."""
    from robust_object_detection_tpu.data import pipeline as pipe
    from robust_object_detection_tpu.train import detector

    det = synthetic.make_det_split(tmp_path / "det", n_images=8,
                                   size_range=((48, 49), (48, 49)))
    convert.convert_det_to_coco(det, tmp_path / "coco", "train")
    cfg = ExperimentConfig(train=TrainConfig(seed=0),
                           mesh=MeshConfig(data=1, model=1))
    out = tmp_path / "run"
    kwargs = dict(augment=False, variant="n", epochs=2, img_size=64,
                  batch_size=2, max_boxes=16, mosaic=False,
                  base_augment=False, save_every_steps=1)

    # preempt: kill while fetching the 4th batch of epoch 1 (4 per epoch)
    orig_prefetch = pipe.prefetch
    def bombing_prefetch(it, *a, **kw):
        def gen():
            for i, b in enumerate(orig_prefetch(it, *a, **kw)):
                if i == 3:
                    raise KeyboardInterrupt("preempted")
                yield b
        return gen()
    monkeypatch.setattr(pipe, "prefetch", bombing_prefetch)
    with pytest.raises(KeyboardInterrupt):
        detector.train(cfg, tmp_path / "coco", out, **kwargs)
    monkeypatch.setattr(pipe, "prefetch", orig_prefetch)
    assert artifacts.read_jsonl(out / "history.jsonl") == []  # epoch 1 open

    r2 = detector.train(cfg, tmp_path / "coco", out, **kwargs)
    hist = artifacts.read_jsonl(out / "history.jsonl")
    assert [h["epoch"] for h in hist] == [1, 2]
    # 3 steps before the kill + 1 resumed (batch 4 of epoch 1) + 4 in ep 2
    assert r2["steps"] == 8


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
