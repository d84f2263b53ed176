"""NMS: greedy exactness vs a straightforward sequential reference."""

import numpy as np
import jax.numpy as jnp

from robust_object_detection_tpu.ops import nms as nms_ops


def _seq_nms(boxes, scores, iou_thresh):
    """Plain sequential greedy NMS (the torchvision algorithm)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or scores[i] <= 0:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            # IoU
            x1 = max(boxes[i, 0], boxes[j, 0]); y1 = max(boxes[i, 1], boxes[j, 1])
            x2 = min(boxes[i, 2], boxes[j, 2]); y2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, x2 - x1) * max(0, y2 - y1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a + b - inter, 1e-9) > iou_thresh:
                suppressed[j] = True
    return keep


def test_nms_matches_sequential(rng):
    n = 200
    centers = rng.uniform(50, 450, (n, 2))
    wh = rng.uniform(20, 80, (n, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    classes = np.zeros(n, np.int32)

    ref_keep = _seq_nms(boxes, scores, 0.5)
    ob, os_, oc, valid = nms_ops.nms(jnp.asarray(boxes), jnp.asarray(scores),
                                     jnp.asarray(classes), max_outputs=128,
                                     iou_thresh=0.5)
    got = np.asarray(ob)[np.asarray(valid)]
    want = boxes[ref_keep][:128]
    # same boxes in the same (score-sorted) order
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert np.all(np.diff(np.asarray(os_)[np.asarray(valid)]) <= 1e-6)


def test_nms_class_aware(rng):
    # identical overlapping boxes but different classes: both survive
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    classes = np.array([0, 1], np.int32)
    _, _, _, valid = nms_ops.nms(jnp.asarray(boxes), jnp.asarray(scores),
                                 jnp.asarray(classes), max_outputs=8,
                                 iou_thresh=0.5, class_aware=True)
    assert int(np.asarray(valid).sum()) == 2
    # class-agnostic: one suppressed
    _, _, _, valid = nms_ops.nms(jnp.asarray(boxes), jnp.asarray(scores),
                                 jnp.asarray(classes), max_outputs=8,
                                 iou_thresh=0.5, class_aware=False)
    assert int(np.asarray(valid).sum()) == 1


def test_batched_nms_shapes(rng):
    b, n = 3, 500
    boxes = rng.uniform(0, 500, (b, n, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(5, 50, (b, n, 2))
    scores = rng.uniform(0, 1, (b, n)).astype(np.float32)
    classes = rng.integers(0, 6, (b, n)).astype(np.int32)
    ob, os_, oc, valid = nms_ops.batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        num_candidates=256, max_outputs=100, iou_thresh=0.7)
    assert ob.shape == (b, 100, 4)
    assert os_.shape == (b, 100)
    assert valid.dtype == jnp.bool_


def test_nms_empty():
    boxes = jnp.zeros((16, 4))
    scores = jnp.zeros((16,))
    classes = jnp.zeros((16,), jnp.int32)
    _, _, _, valid = nms_ops.nms(boxes, scores, classes, max_outputs=8)
    assert int(np.asarray(valid).sum()) == 0
