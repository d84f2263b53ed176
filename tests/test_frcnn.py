"""Faster R-CNN: anchors, delta codec, matching, proposals, train smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from robust_object_detection_tpu.models import frcnn as F
from robust_object_detection_tpu.train import frcnn as TF

pytestmark = pytest.mark.slow    # compiles jitted train steps on the CPU mesh

IMG = 128
SMALL = F.FrcnnConfig(pre_nms_topk=256, num_proposals=64, roi_batch=64,
                      rpn_batch=64)


@pytest.fixture(scope="module")
def frcnn_small():
    model = F.FasterRCNN(SMALL)
    tx, _ = TF.make_optimizer()
    state = TF.init_state(model, jax.random.key(0), IMG, tx)
    return model, state, tx


def test_param_count(frcnn_small):
    """~43.3M params: torchvision fasterrcnn_resnet50_fpn_v2 is 43.7M at 91
    classes; the 7-class head swap (train_frcnn_baseline.py:139-143) lands
    near 43.3M."""
    _, state, _ = frcnn_small
    n = sum(int(p.size) for p in jax.tree.leaves(state.params))
    assert abs(n - 43_300_000) < 500_000, n


def test_anchor_layout():
    """torchvision AnchorGenerator geometry: corner-aligned grid (first
    anchor centred at 0, second at stride) and integer-ROUNDED base-anchor
    corners (area near size^2 up to the rounding)."""
    anchors = np.concatenate(F._anchors_hw_major(IMG))
    per_level = [(IMG // s) ** 2 * 3 for s in F.RPN_STRIDES]
    assert anchors.shape == (sum(per_level), 4)
    w = anchors[:3, 2] - anchors[:3, 0]
    h = anchors[:3, 3] - anchors[:3, 1]
    np.testing.assert_allclose(w * h, 32 * 32, rtol=0.05)
    np.testing.assert_array_equal(anchors[:3], np.round(anchors[:3]))
    np.testing.assert_allclose((anchors[0, 0] + anchors[0, 2]) / 2, 0.0)
    np.testing.assert_allclose(
        (anchors[3, 0] + anchors[3, 2]) / 2, F.RPN_STRIDES[0])
    # slices line up
    s = F.level_slices(IMG)
    assert s[-1][1] == sum(per_level)


def test_delta_codec_roundtrip():
    rng = np.random.RandomState(0)
    anchors = jnp.asarray(rng.rand(32, 4) * 50 + np.array([0, 0, 60, 60]))
    boxes = jnp.asarray(rng.rand(32, 4) * 50 + np.array([5, 5, 70, 70]))
    for w in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
        deltas = F.encode_deltas(boxes, anchors, w)
        back = F.decode_deltas(deltas, anchors, w)
        np.testing.assert_allclose(np.asarray(back), np.asarray(boxes),
                                   atol=1e-3)


def test_match_anchors_basic():
    anchors = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30],
                           [100, 100, 110, 110]], jnp.float32)
    gt = jnp.asarray([[[0, 0, 10, 10]]], jnp.float32)      # == anchor 0
    cls = jnp.asarray([[1]], jnp.int32)
    matched, labels = F.match_anchors(anchors, gt, cls, 0.7, 0.3)
    assert labels[0, 0] == 1          # IoU 1.0 -> positive
    assert labels[0, 1] == 0          # IoU 0 -> negative
    # no gt at all -> all negative
    _, labels2 = F.match_anchors(anchors, gt,
                                 jnp.asarray([[-1]], jnp.int32), 0.7, 0.3)
    assert (np.asarray(labels2) == 0).all()


def test_sample_targets_caps():
    key = jax.random.key(0)
    labels = jnp.asarray(np.concatenate(
        [np.ones(50), np.zeros(500), -np.ones(50)]).astype(np.int32))[None]
    pos, neg = F.sample_targets(labels, 64, 0.5, key)
    assert int(pos.sum()) <= 32
    assert int(pos.sum()) + int(neg.sum()) <= 64
    assert not bool((pos & (labels != 1)).any())
    assert not bool((neg & (labels != 0)).any())


def test_generate_proposals(frcnn_small):
    model, state, _ = frcnn_small
    x = jnp.zeros((1, IMG, IMG, 3))
    pyramid, obj, deltas = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False, method=model.extract)
    props, valid = F.generate_proposals(obj, deltas, IMG, SMALL)
    assert props.shape == (1, SMALL.num_proposals, 4)
    p = np.asarray(props)
    assert (p >= 0).all() and (p <= IMG).all()


def test_roi_align_constant_map():
    """RoIAlign on a constant feature map must return the constant."""
    from robust_object_detection_tpu.models import fpn as fpn_lib
    feats = tuple(jnp.full((1, s, s, 8), 3.25)
                  for s in (32, 16, 8, 4))
    boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0], [0.0, 0.0, 100.0, 90.0]]])
    out = fpn_lib.roi_align(feats, boxes, strides=(4, 8, 16, 32))
    assert out.shape == (1, 2, 7, 7, 8)
    np.testing.assert_allclose(np.asarray(out), 3.25, rtol=1e-5)


def test_roi_align_level_assignment():
    from robust_object_detection_tpu.models.fpn import assign_levels
    boxes = jnp.asarray([[10, 10, 40, 40],          # small -> P2 (idx 0)
                         [0, 0, 500, 500]],         # large -> P5 (idx 3)
                        jnp.float32)
    lv = np.asarray(assign_levels(boxes))
    assert lv[0] == 0 and lv[1] == 3


def test_train_smoke(frcnn_small):
    model, state, tx = frcnn_small
    step = jax.jit(TF.make_train_step(model, tx, IMG, None, False))
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (2, IMG, IMG, 3), dtype=np.uint8))
    gb = np.zeros((2, 8, 4), np.float32)
    gc = np.full((2, 8), -1, np.int32)
    gb[0, 0] = [10, 10, 60, 60]
    gc[0, 0] = 2
    gb[1, 0] = [30, 40, 100, 110]
    gc[1, 0] = 4
    key = jax.random.key(0)
    losses = []
    for _ in range(12):
        state, m = step(state, img, jnp.asarray(gb), jnp.asarray(gc), key)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses[::3]


def test_predict_shapes(frcnn_small):
    model, state, _ = frcnn_small
    predict = jax.jit(TF.make_predict_step(model, IMG))
    boxes, scores, classes, valid = predict(
        state, jnp.zeros((2, IMG, IMG, 3), jnp.uint8))
    assert boxes.shape == (2, SMALL.box_detections, 4)
    # classes are 0..5 (fg only) where valid
    c = np.asarray(classes)[np.asarray(valid)]
    if c.size:
        assert ((c >= 0) & (c < 6)).all()


def test_backbone_freeze_reference_semantics(rng):
    """trainable_layers=3 (the reference's pretrained default,
    train_frcnn_baseline.py:139-149): conv1/bn1/layer1 params take exactly
    zero updates (stop_gradient + masked decay) while their BN running
    stats still update (torch model.train() semantics)."""
    import flax.traverse_util as tu

    from robust_object_detection_tpu.models import resnet as resnet_lib

    cfg = F.FrcnnConfig(pre_nms_topk=64, num_proposals=32, roi_batch=32,
                        rpn_batch=32, blocks=(1, 1, 1, 1),
                        trainable_layers=3)
    frozen = resnet_lib.frozen_param_labels(cfg.blocks, 3)
    assert frozen == {"Conv_0", "BatchNorm_0", "BottleneckBlock_0"}
    model = F.FasterRCNN(cfg)
    tx, _ = TF.make_optimizer(frozen=frozen)
    state = TF.init_state(model, jax.random.key(0), 64, tx)
    step = jax.jit(TF.make_train_step(model, tx, 64, None, False))
    imgs = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8))
    gb = np.zeros((2, 8, 4), np.float32)
    gc = np.full((2, 8), -1, np.int32)
    gb[:, 0] = [4, 4, 30, 30]
    gc[:, 0] = 1
    s2, m = step(state, imgs, jnp.asarray(gb), jnp.asarray(gc),
                 jax.random.key(1))
    before = tu.flatten_dict(jax.tree.map(np.asarray,
                                          state.params["backbone"]))
    after = tu.flatten_dict(jax.tree.map(np.asarray,
                                         s2.params["backbone"]))
    for k in before:
        if k[0] in frozen:
            np.testing.assert_array_equal(before[k], after[k])
    assert any(not np.array_equal(before[k], after[k])
               for k in before if k[0] not in frozen)
    # frozen-layer BN stats still update
    sb = tu.flatten_dict(jax.tree.map(np.asarray,
                                      state.batch_stats["backbone"]))
    sa = tu.flatten_dict(jax.tree.map(np.asarray,
                                      s2.batch_stats["backbone"]))
    assert any(not np.array_equal(sb[k], sa[k])
               for k in sb if k[0] == "BatchNorm_0")


def test_frozen_param_labels_mapping():
    from robust_object_detection_tpu.models import resnet as resnet_lib

    blocks = (3, 4, 6, 3)
    assert resnet_lib.frozen_param_labels(blocks, 5) == set()
    # torchvision trainable=4: conv1/bn1 frozen, all stages train
    assert resnet_lib.frozen_param_labels(blocks, 4) == {
        "Conv_0", "BatchNorm_0"}
    # reference default (weights given -> 3): + layer1 = blocks 0..2
    assert resnet_lib.frozen_param_labels(blocks, 3) == {
        "Conv_0", "BatchNorm_0", "BottleneckBlock_0", "BottleneckBlock_1",
        "BottleneckBlock_2"}
