"""YOLOv8: architecture, decode, TAL assignment, loss, train/eval smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_object_detection_tpu.models import yolov8 as Y
from robust_object_detection_tpu.train import detection as D
from robust_object_detection_tpu.train import detector as T

pytestmark = pytest.mark.slow    # compiles jitted train steps on the CPU mesh

IMG = 64


@pytest.fixture(scope="module")
def yolo_n():
    model = Y.create(6, "n")
    variables = Y.init_variables(model, jax.random.key(0), IMG)
    apply = jax.jit(lambda v, x: model.apply(v, x, train=False))
    return model, variables, apply


def test_param_counts():
    """Family scaling sanity: nc=6 param counts in the Ultralytics ballpark
    (yolov8n ~3.0M, yolov8m ~25.9M at nc=6)."""
    n = Y.param_count(Y.init_variables(Y.create(6, "n"), jax.random.key(0),
                                       IMG))
    assert abs(n - 3_010_000) < 120_000, n


def test_level_shapes(yolo_n):
    _, variables, apply = yolo_n
    outs = apply(variables, jnp.zeros((2, IMG, IMG, 3)))
    assert len(outs) == 3
    for (box, cls), s in zip(outs, Y.STRIDES):
        assert box.shape == (2, IMG // s, IMG // s, 4 * Y.REG_MAX)
        assert cls.shape == (2, IMG // s, IMG // s, 6)


def test_anchor_points():
    a, s = Y.anchor_points(IMG)
    assert a.shape == (8 * 8 + 4 * 4 + 2 * 2, 2)
    np.testing.assert_allclose(a[0], [0.5, 0.5])
    np.testing.assert_allclose(s[:64], 8.0)


def test_dfl_decode_roundtrip():
    """Sharp DFL logits at bin k decode to distance k."""
    n = 84
    logits = np.full((1, n, 4, Y.REG_MAX), -20.0, np.float32)
    logits[..., 3] = 20.0          # all distances = 3 bins
    outs_boxes = Y.dfl_expectation(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(outs_boxes), 3.0, atol=1e-4)


def test_tal_assigns_center_anchor():
    """A GT box gets its centre anchors as foreground with its class."""
    anchors, strides = Y.anchor_points(IMG)
    anchors_px = jnp.asarray(anchors * strides[:, None])
    n = anchors.shape[0]
    # one gt covering x in [8, 40], y in [8, 40] -> several stride-8 anchors
    gt_boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]])
    gt_classes = jnp.asarray([[2]], jnp.int32)
    # predictions: uniform low scores, boxes = anchor-centred 16x16
    scores = jnp.full((1, n, 6), 0.1)
    pb = jnp.concatenate([anchors_px - 8.0, anchors_px + 8.0], -1)[None]
    out = D.task_aligned_assign(scores, pb, anchors_px, gt_boxes, gt_classes)
    fg = np.asarray(out["fg_mask"][0])
    assert fg.sum() > 0
    # all fg anchors lie inside the gt box
    apx = np.asarray(anchors_px)
    inside = ((apx[:, 0] > 8) & (apx[:, 0] < 40) &
              (apx[:, 1] > 8) & (apx[:, 1] < 40))
    assert (fg <= inside).all()
    ts = np.asarray(out["target_scores"][0])
    assert (ts[fg].argmax(-1) == 2).all()
    # padded gt -> nothing assigned
    out2 = D.task_aligned_assign(scores, pb, anchors_px, gt_boxes,
                                 jnp.asarray([[-1]], jnp.int32))
    assert np.asarray(out2["fg_mask"]).sum() == 0


def test_loss_padded_gt_zero_fg(yolo_n):
    _, variables, apply = yolo_n
    outs = apply(variables, jnp.zeros((1, IMG, IMG, 3)))
    gt_b = jnp.zeros((1, 4, 4))
    gt_c = jnp.full((1, 4), -1, jnp.int32)
    loss, metrics = D.yolo_loss(outs, gt_b, gt_c, IMG)
    assert float(metrics["num_fg"]) == 0
    assert np.isfinite(float(loss))
    assert float(metrics["box"]) == 0.0


def test_overfit_tiny():
    """End-to-end training signal: loss drops sharply when overfitting one
    synthetic batch (the from-scratch analogue of the reference's 'training
    works' evidence)."""
    import optax
    model = Y.create(6, "n")
    tx = optax.sgd(0.01, momentum=0.9)
    state = T.init_state(model, jax.random.key(0), IMG, tx)
    step = jax.jit(T.make_train_step(
        model, tx, IMG, None, augment=False))
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (2, IMG, IMG, 3)).astype(np.uint8)
    gt_b = np.zeros((2, 8, 4), np.float32)
    gt_c = np.full((2, 8), -1, np.int32)
    gt_b[0, 0] = [8, 8, 40, 40]
    gt_c[0, 0] = 1
    gt_b[1, 0] = [16, 20, 60, 50]
    gt_c[1, 0] = 3
    key = jax.random.key(0)
    losses = []
    for _ in range(30):
        state, m = step(state, jnp.asarray(images), jnp.asarray(gt_b),
                        jnp.asarray(gt_c), key)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::5]


def test_predict_step_shapes(yolo_n):
    model, variables, _ = yolo_n
    state = T.DetTrainState(variables["params"], variables["batch_stats"],
                            variables["params"], None, jnp.asarray(0))
    predict = jax.jit(T.make_predict_step(model, IMG, max_det=50))
    boxes, scores, classes, valid = predict(
        state, jnp.zeros((2, IMG, IMG, 3), jnp.uint8))
    assert boxes.shape == (2, 50, 4)
    assert valid.dtype == jnp.bool_


def test_eval_perfect_predictions(tmp_path):
    """Feeding the GT back as predictions must give mAP ~= 1.0 — validates
    letterbox coordinate mapping + scorer end to end."""
    from robust_object_detection_tpu.data import convert, pipeline, synthetic
    from robust_object_detection_tpu.eval import detector_eval as DE

    det = synthetic.make_det_split(tmp_path / "det", n_images=4,
                                   size_range=((80, 81), (100, 101)))
    coco_root = tmp_path / "coco6"
    convert.convert_det_to_coco(det, coco_root, "val")
    samples = pipeline.index_coco(coco_root, "val")

    size, bs, cap = 64, 2, 32
    state = {"i": 0}

    def fake_predict(_, images):
        b = images.shape[0]
        boxes = np.zeros((b, cap, 4), np.float32)
        scores = np.zeros((b, cap), np.float32)
        classes = np.zeros((b, cap), np.int32)
        valid = np.zeros((b, cap), bool)
        for j in range(b):
            k = state["i"] + j
            if k >= len(samples):
                continue
            s = samples[k]
            scale = min(size / s.height, size / s.width)
            m = len(s.boxes_xyxy)
            boxes[j, :m] = s.boxes_xyxy * scale
            scores[j, :m] = 0.9
            classes[j, :m] = s.classes
            valid[j, :m] = True
        state["i"] += b
        return boxes, scores, classes, valid

    summary = DE.evaluate_on_samples(fake_predict, None, samples, size, bs,
                                     max_boxes=cap)
    assert summary["mAP50"] > 0.99, summary
    assert summary["images"] == 4
