"""Validation-during-training: mAP in history, best-by-mAP50 checkpoints.

Reference behaviour being matched: FRCNN best.pth selected by val mAP
(train_frcnn_baseline.py:198-208) and mAP50/mAP50_95 logged per record
(train_frcnn_baseline.py:105-107); Ultralytics keeps best-by-fitness across
per-epoch val passes.
"""

import json
from pathlib import Path

import numpy as np

from robust_object_detection_tpu.core import artifacts
from robust_object_detection_tpu.core.config import (ExperimentConfig,
                                                     MeshConfig, TrainConfig)
from robust_object_detection_tpu.data import convert, synthetic
from robust_object_detection_tpu.train import validation
import pytest

pytestmark = pytest.mark.slow    # compiles jitted train steps on the CPU mesh


def _coco_root(tmp_path, with_val=True):
    det_tr = synthetic.make_det_split(tmp_path / "det_tr", n_images=4,
                                      size_range=((48, 49), (48, 49)))
    convert.convert_det_to_coco(det_tr, tmp_path / "coco", "train")
    if with_val:
        det_va = synthetic.make_det_split(tmp_path / "det_va", n_images=2,
                                          seed=7,
                                          size_range=((48, 49), (48, 49)))
        convert.convert_det_to_coco(det_va, tmp_path / "coco", "val")
    return tmp_path / "coco"


def test_index_val_samples_missing_split(tmp_path):
    root = _coco_root(tmp_path, with_val=False)
    assert validation.index_val_samples(root, "coco") == []


def test_should_validate_cadence():
    f = validation.should_validate
    assert not f(1, 10, 0, True)          # interval 0: final-only
    assert f(10, 10, 0, True)
    assert f(2, 10, 2, True) and not f(3, 10, 2, True)
    assert f(10, 10, 7, True)             # final epoch always validates
    assert not f(10, 10, 1, False)        # no val split: never


def test_trainer_logs_map_and_keeps_best(tmp_path, monkeypatch):
    """With a regressing val metric the best checkpoint must be the earlier
    (higher-mAP) epoch, not the final one."""
    from robust_object_detection_tpu.core.checkpoint import CheckpointManager
    from robust_object_detection_tpu.train import detector

    root = _coco_root(tmp_path)
    # Controlled regression: epoch 1 scores 0.9, epoch 2 scores 0.1.
    seq = iter([0.9, 0.1])
    monkeypatch.setattr(
        validation, "run_validation",
        lambda *a, **k: {"mAP50": next(seq), "mAP50_95": 0.0})

    cfg = ExperimentConfig(train=TrainConfig(seed=0),
                           mesh=MeshConfig(data=1, model=1))
    out = tmp_path / "run"
    detector.train(cfg, root, out, augment=False, variant="n", epochs=2,
                   img_size=64, batch_size=2, max_boxes=16, mosaic=False,
                   base_augment=False, val_interval=1)

    hist = artifacts.read_jsonl(out / "history.jsonl")
    assert [h["mAP50"] for h in hist] == [0.9, 0.1]
    meta = json.loads((out / "ckpt" / "best_meta.json").read_text())
    assert meta == {"step": 1, "metric": 0.9}

    # best (epoch-1) weights differ from last (epoch-2) weights
    model, best_state = detector.load_checkpoint(out, variant="n",
                                                 img_size=64)
    tx, _ = detector.make_optimizer()
    ckpt = CheckpointManager(out)
    last = ckpt.restore_last({
        "params": best_state.params, "batch_stats": best_state.batch_stats,
        "ema_params": best_state.ema_params,
        "opt_state": tx.init(best_state.params), "step": np.asarray(0)})
    ckpt.close()
    leaf_best = np.asarray(
        best_state.params["backbone"]["stem"]["conv"]["kernel"]
        if "backbone" in best_state.params
        else next(iter(_leaves(best_state.params))))
    leaf_last = np.asarray(
        last["state"]["params"]["backbone"]["stem"]["conv"]["kernel"]
        if "backbone" in last["state"]["params"]
        else next(iter(_leaves(last["state"]["params"]))))
    assert not np.allclose(leaf_best, leaf_last)


def _leaves(tree):
    import jax
    return jax.tree.leaves(tree)


def test_real_val_pass_yolo(tmp_path):
    """End-to-end: a real (unmocked) val pass produces finite mAP records
    and a best checkpoint."""
    from robust_object_detection_tpu.train import detector

    root = _coco_root(tmp_path)
    cfg = ExperimentConfig(train=TrainConfig(seed=0),
                           mesh=MeshConfig(data=1, model=1))
    out = tmp_path / "run"
    detector.train(cfg, root, out, augment=False, variant="n", epochs=1,
                   img_size=64, batch_size=2, max_boxes=16, mosaic=False,
                   base_augment=False, val_interval=1)
    hist = artifacts.read_jsonl(out / "history.jsonl")
    assert "mAP50" in hist[-1] and 0.0 <= hist[-1]["mAP50"] <= 1.0
    assert (out / "ckpt" / "best_meta.json").exists()
