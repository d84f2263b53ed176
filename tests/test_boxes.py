"""Box op unit tests."""

import numpy as np
import jax.numpy as jnp

from robust_object_detection_tpu.ops import boxes as B


def test_format_roundtrip(rng):
    b = rng.uniform(0, 100, (10, 4)).astype(np.float32)
    b[:, 2:] += b[:, :2]  # valid xyxy
    x = jnp.asarray(b)
    np.testing.assert_allclose(B.xywh_to_xyxy(B.xyxy_to_xywh(x)), b, atol=1e-5)
    np.testing.assert_allclose(B.cxcywh_to_xyxy(B.xyxy_to_cxcywh(x)), b, atol=1e-4)


def test_iou_known_values():
    a = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                    jnp.float32)
    iou = np.asarray(B.pairwise_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_coco_crowd_iou():
    det = jnp.asarray([[0, 0, 10, 10]], jnp.float32)         # xywh
    gt = jnp.asarray([[0, 0, 20, 20]], jnp.float32)          # xywh
    plain = np.asarray(B.pairwise_iou_xywh_coco(det, gt))[0, 0]
    crowd = np.asarray(B.pairwise_iou_xywh_coco(
        det, gt, jnp.asarray([True])))[0, 0]
    assert abs(plain - 100 / 400) < 1e-6
    assert abs(crowd - 1.0) < 1e-6     # intersection / det-area


def test_giou_ciou_bounds(rng):
    a = rng.uniform(0, 50, (20, 2)).astype(np.float32)
    aw = rng.uniform(5, 30, (20, 2)).astype(np.float32)
    b = rng.uniform(0, 50, (20, 2)).astype(np.float32)
    bw = rng.uniform(5, 30, (20, 2)).astype(np.float32)
    box_a = jnp.asarray(np.concatenate([a, a + aw], 1))
    box_b = jnp.asarray(np.concatenate([b, b + bw], 1))
    g = np.asarray(B.giou(box_a, box_b))
    c = np.asarray(B.ciou(box_a, box_b))
    assert np.all(g <= 1.0) and np.all(g >= -1.0)
    assert np.all(c <= 1.0) and np.all(c >= -2.0)
    # identical boxes -> 1
    assert np.allclose(np.asarray(B.giou(box_a, box_a)), 1.0, atol=1e-5)
    assert np.allclose(np.asarray(B.ciou(box_a, box_a)), 1.0, atol=1e-4)


def test_clip(rng):
    b = jnp.asarray([[-5, -5, 120, 90]], jnp.float32)
    out = np.asarray(B.clip_to_image(b, 80, 100))
    np.testing.assert_allclose(out, [[0, 0, 100, 80]])
