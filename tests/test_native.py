"""Native C++ COCOeval matcher: parity with the numpy path + speedup."""

import time

import numpy as np
import pytest

from robust_object_detection_tpu import native
from robust_object_detection_tpu.eval import coco_map


def _random_eval_case(seed, n_images=20, n_dt=40, n_gt=25, crowd_frac=0.1):
    rng = np.random.RandomState(seed)
    detections, ground_truth = {}, {}
    for i in range(n_images):
        nd = rng.randint(0, n_dt)
        ng = rng.randint(0, n_gt)
        db = np.concatenate([rng.rand(nd, 2) * 200,
                             rng.rand(nd, 2) * 80 + 4], 1).astype(np.float32)
        gb = np.concatenate([rng.rand(ng, 2) * 200,
                             rng.rand(ng, 2) * 80 + 4], 1).astype(np.float32)
        detections[i] = coco_map.Detections(
            boxes=db, scores=rng.rand(nd).astype(np.float32),
            classes=rng.randint(1, 4, nd))
        ground_truth[i] = coco_map.GroundTruth(
            boxes=gb, classes=rng.randint(1, 4, ng),
            iscrowd=rng.rand(ng) < crowd_frac)
    return detections, ground_truth


def test_native_builds():
    assert native.available(), "g++ build of coco_match.cc failed"


def test_native_matches_python_path():
    """Bit-identical precision/recall tensors between C++ and numpy."""
    for seed in (0, 1, 2):
        dt, gt = _random_eval_case(seed)
        r_native = coco_map.evaluate(dt, gt, categories=[1, 2, 3],
                                     use_native=True)
        r_python = coco_map.evaluate(dt, gt, categories=[1, 2, 3],
                                     use_native=False)
        np.testing.assert_allclose(r_native.precision, r_python.precision,
                                   atol=1e-12)
        np.testing.assert_allclose(r_native.recall, r_python.recall,
                                   atol=1e-12)


def test_native_faster():
    dt, gt = _random_eval_case(0, n_images=60, n_dt=80, n_gt=60)
    t0 = time.time()
    coco_map.evaluate(dt, gt, categories=[1, 2, 3], use_native=True)
    t_native = time.time() - t0
    t0 = time.time()
    coco_map.evaluate(dt, gt, categories=[1, 2, 3], use_native=False)
    t_python = time.time() - t0
    # the C++ matcher should win clearly; keep the bound loose for CI noise
    assert t_native < t_python, (t_native, t_python)
