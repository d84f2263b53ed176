"""Aspect-bucket FRCNN eval: torchvision-native resolution semantics.

The reference's FRCNN capability includes GeneralizedRCNNTransform —
min-side 800 / max-side <=1333 aspect-preserving resize, evaluated batch-1
at that native scale (train_frcnn_baseline.py:139-143, eval_all.py:103).
evaluate_bucketed reproduces the EXACT per-image scale while keeping XLA
static: images group into bucket_mult-aligned canvases, one compile each.
"""

import jax
import numpy as np
import pytest

from robust_object_detection_tpu.data import pipeline as pipe
from robust_object_detection_tpu.eval import detector_eval as DE
from robust_object_detection_tpu.models import frcnn as F
from robust_object_detection_tpu.train import frcnn as TF


def _tv_reference(h, w, min_side=800.0, max_side=1333.0):
    """Straight transcription of torchvision _resize_image_and_masks:
    scale = min(min_side/min(h,w), max_side/max(h,w))."""
    scale = min(min_side / min(h, w), max_side / max(h, w))
    return round(h * scale), round(w * scale)


@pytest.mark.parametrize("h,w", [
    (765, 1360),    # VisDrone landscape: max-side constrained
    (540, 960),     # min-side constrained
    (1050, 1400),
    (800, 800),     # already at min_side
    (2000, 500),    # extreme portrait
    (100, 3000),    # extreme strip
])
def test_tv_target_matches_torchvision_rule(h, w):
    th, tw, scale = DE.tv_target(h, w)
    assert (th, tw) == _tv_reference(h, w)
    # the short side reaches 800 OR the long side pins at 1333
    assert (abs(min(th, tw) - 800) <= 1) or (abs(max(th, tw) - 1333) <= 1)
    assert max(th, tw) <= 1334


def test_rect_anchors_and_slices():
    """Rectangular canvases: anchor counts follow (H/s)*(W/s) per level and
    level_slices stays consistent with the concatenated layout."""
    size = (128, 192)
    per_level = F._anchors_hw_major(size)
    for lvl, stride in zip(per_level, F.RPN_STRIDES):
        nh, nw = -(-size[0] // stride), -(-size[1] // stride)
        assert lvl.shape == (nh * nw * len(F.ASPECT_RATIOS), 4)
    slices = F.level_slices(size)
    total = sum(hi - lo for lo, hi in slices)
    assert total == sum(l.shape[0] for l in per_level)
    # square path unchanged
    sq = F._anchors_hw_major(128)
    np.testing.assert_array_equal(sq[0],
                                  F._anchors_hw_major((128, 128))[0])


def test_letterbox_scale_override():
    """load_letterboxed with a scale override resizes by exactly that scale
    and pads to the rectangular canvas."""
    import tempfile
    from pathlib import Path

    from PIL import Image
    with tempfile.TemporaryDirectory() as td:
        p = Path(td) / "im.jpg"
        Image.fromarray(np.full((50, 100, 3), 200, np.uint8)).save(p)
        s = pipe.Sample(image_path=p, image_id=1, width=100, height=50,
                        boxes_xyxy=np.zeros((0, 4), np.float32),
                        classes=np.zeros(0, np.int32))
        canvas, scale = pipe.load_letterboxed(s, (96, 160), scale=1.5)
        assert canvas.shape == (96, 160, 3)
        assert scale == 1.5
        # content occupies round(50*1.5) x round(100*1.5) = 75 x 150
        assert canvas[:75, :150].mean() > 150     # image region
        assert (canvas[80:, :] == 114).all()      # pad region
        assert (canvas[:, 155:] == 114).all()


@pytest.mark.slow
def test_evaluate_bucketed_e2e(tmp_path):
    """Tiny FRCNN over a mixed-size synthetic split: every image lands in a
    bucket at its tv_target scale, all images scored, summary sane."""
    from robust_object_detection_tpu.data import convert, synthetic

    split = synthetic.make_det_split(
        tmp_path / "det", n_images=6,
        size_range=((48, 100), (60, 120)))
    convert.convert_det_to_coco(split, tmp_path / "coco", "val")
    samples = pipe.index_coco(tmp_path / "coco", "val")

    cfg = F.FrcnnConfig(pre_nms_topk=64, num_proposals=32, roi_batch=32,
                        rpn_batch=32, blocks=(1, 1, 1, 1))
    model = F.FasterRCNN(cfg)
    tx, _ = TF.make_optimizer()
    state = TF.init_state(model, jax.random.key(0), 64, tx)

    made = {}

    def factory(bucket):
        made[bucket] = made.get(bucket, 0) + 1
        return jax.jit(TF.make_predict_step(model, bucket))

    # small min/max sides keep CPU compiles cheap; semantics identical
    summary = DE.evaluate_bucketed(
        factory, state, samples, batch_size=2, max_boxes=64,
        min_side=64.0, max_side=96.0, bucket_mult=32)
    assert summary["images"] == len(samples)
    assert np.isfinite(summary["mAP50"])
    assert sum(summary["buckets"].values()) == len(samples)
    # one factory call per distinct bucket
    assert all(v == 1 for v in made.values())
    for bucket in made:
        assert bucket[0] % 32 == 0 and bucket[1] % 32 == 0
    # bucket canvases hold the tv_target of at least their own members
    for s in samples:
        th, tw, _ = DE.tv_target(s.height, s.width, 64.0, 96.0)
        assert any(bh >= th and bw >= tw for bh, bw in made)


@pytest.mark.slow
def test_native_res_bucket_training(tmp_path):
    """native_res=True trains at torchvision-native variable resolution:
    one jitted step per aspect bucket, exact min/max-side scales, resume-
    compatible checkpoints (VERDICT r3 #7 / train_frcnn_baseline.py:139-150).
    Tiny min/max sides keep the test canvases small; the production run
    uses the 800/1333 defaults."""
    from robust_object_detection_tpu.core import artifacts
    from robust_object_detection_tpu.core.config import (ExperimentConfig,
                                                         MeshConfig,
                                                         TrainConfig)
    from robust_object_detection_tpu.data import convert, synthetic

    det = synthetic.make_det_split(
        tmp_path / "det", n_images=8,
        size_range=((40, 80), (40, 80)))     # mixed aspects -> >1 bucket
    convert.convert_det_to_coco(det, tmp_path / "coco", "train")
    cfg = ExperimentConfig(train=TrainConfig(seed=0),
                           mesh=MeshConfig(data=1, model=1))
    out = TF.train(
        cfg, tmp_path / "coco", tmp_path / "run", augment=False, epochs=1,
        batch_size=2, max_boxes=16, native_res=True, min_side=48.0,
        max_side=96.0, bucket_mult=32,
        model_kwargs=dict(blocks=(1, 1, 1, 1), pre_nms_topk=64,
                          num_proposals=32, roi_batch=32, rpn_batch=32))
    assert np.isfinite(out["final_loss"])
    assert out["steps"] >= 1
    hist = artifacts.read_jsonl(tmp_path / "run" / "history.jsonl")
    assert [h["epoch"] for h in hist] == [1]
    # checkpoints stay canvas-independent: the square-canvas loader reads
    # the bucket-trained weights
    model, state = TF.load_checkpoint(
        tmp_path / "run", img_size=64,
        cfg=F.FrcnnConfig(blocks=(1, 1, 1, 1), pre_nms_topk=64,
                          num_proposals=32, roi_batch=32, rpn_batch=32))
    assert state.params is not None


def test_native_res_epoch_plan_interleaves_buckets():
    """GroupedBatchSampler semantics: same-shape batches, globally shuffled
    bucket order, per-epoch reshuffle, dropped remainders counted
    (reference loader is shuffle=True over everything,
    train_frcnn_baseline.py:121-127)."""
    buckets = {(256, 256): list(range(0, 20)),
               (256, 320): list(range(100, 130)),
               (320, 256): list(range(200, 203)),   # 3 imgs: 1 batch + 1 drop
               (384, 256): [300]}                   # sub-batch: all dropped
    chunks, dropped = TF.native_res_epoch_plan(buckets, 2, seed=7)
    assert dropped == 2                              # 1 from (320,256) + 1
    assert len(chunks) == 10 + 15 + 1
    for bkt, chunk in chunks:
        assert len(chunk) == 2                       # same-shape full batches
        lo = {(256, 256): 0, (256, 320): 100, (320, 256): 200}[bkt]
        assert all(lo <= s < lo + 100 for s in chunk)
    # interleaved: the two big buckets must not be contiguous runs
    order = [bkt for bkt, _ in chunks]
    runs = sum(1 for i in range(1, len(order)) if order[i] != order[i - 1])
    assert runs >= 6, order
    # deterministic per seed, different across seeds (epoch reshuffle)
    again, _ = TF.native_res_epoch_plan(buckets, 2, seed=7)
    assert again == chunks
    other, _ = TF.native_res_epoch_plan(buckets, 2, seed=8)
    assert other != chunks
    # every sample appears at most once; full buckets fully covered
    seen = [s for _, chunk in chunks for s in chunk]
    assert len(seen) == len(set(seen)) == 52
