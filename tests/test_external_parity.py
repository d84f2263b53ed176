"""External (non-same-author) parity checks for the mAP scorer.

The in-repo COCOeval oracle (test_coco_map.py) is a transcription by the
same author as the scorer — a shared misreading would pass every test.
These tests close that hole two ways (round-2 verdict, missing #2):

  * live cross-check against REAL pycocotools when it is importable
    (skipped on this image, runs on the target host via the runbook),
  * committed-fixture check: `tools/make_parity_fixtures.py` runs real
    pycocotools on any host that has it and commits the numbers to
    tests/fixtures/pycoco_parity.json; once that file exists this test
    validates the scorer against it on EVERY host.
"""

import numpy as np
import pytest

from robust_object_detection_tpu.eval import coco_map
from robust_object_detection_tpu.eval import parity_fixtures as pf

STAT_KEYS = ("mAP50", "mAP50_95", "mAP75", "mAP_small", "mAP_medium",
             "mAP_large") + tuple(f"ap50_class_{c}" for c in pf.CATEGORIES)


def _assert_stats_match(ours, theirs, atol=1e-9):
    for k in STAT_KEYS:
        assert ours[k] == pytest.approx(theirs[k], abs=atol), (
            k, ours[k], theirs[k])


def test_canned_case_deterministic():
    """The canned case must be byte-stable across hosts — fixture numbers
    generated elsewhere must apply to the arrays built here."""
    d1, g1 = pf.make_canned_eval_case(0)
    d2, g2 = pf.make_canned_eval_case(0)
    assert sorted(d1) == sorted(d2)
    for i in d1:
        np.testing.assert_array_equal(d1[i].boxes, d2[i].boxes)
        np.testing.assert_array_equal(d1[i].scores, d2[i].scores)
    for i in g1:
        np.testing.assert_array_equal(g1[i].boxes, g2[i].boxes)
        np.testing.assert_array_equal(g1[i].iscrowd, g2[i].iscrowd)
    # edge cases present: empty-GT image, zero-detection image, crowds
    assert len(g1[3].boxes) == 0
    assert len(d1[5].boxes) == 0
    assert any(gt.iscrowd.any() for gt in g1.values())


def test_canned_case_scorer_sane():
    """Our scorer runs on the canned case and produces in-range stats
    (the jittered-GT detections must score well above zero)."""
    det, gt = pf.make_canned_eval_case(0)
    stats = pf.our_stats(det, gt)
    assert 0.1 < stats["mAP50"] <= 1.0, stats
    assert 0.0 < stats["mAP50_95"] <= stats["mAP50"], stats
    assert stats["mAP75"] <= stats["mAP50"], stats


def test_pycocotools_live_crosscheck():
    """Scorer vs the real COCOeval C implementation, when available."""
    pytest.importorskip("pycocotools")
    for seed in (0, 1, 2):
        det, gt = pf.make_canned_eval_case(seed)
        _assert_stats_match(pf.our_stats(det, gt),
                            pf.run_pycocotools(det, gt))


def test_pycocotools_fixture_parity():
    """Scorer vs committed real-COCOeval numbers (generated on a host with
    pycocotools by tools/make_parity_fixtures.py)."""
    fixture = pf.load_fixture()
    if fixture is None:
        pytest.skip("tests/fixtures/pycoco_parity.json not generated yet "
                    "(run tools/make_parity_fixtures.py on a host with "
                    "pycocotools — see docs/07_parity_runbook.md)")
    assert fixture["format"] == 1
    for case in fixture["cases"]:
        det, gt = pf.make_canned_eval_case(case["seed"])
        _assert_stats_match(pf.our_stats(det, gt), case["pycocotools"])


def test_coco_dict_roundtrip():
    """to_coco_dicts emits loadable COCO json: every ann/result row carries
    the fields pycocotools requires, ids consistent."""
    det, gt = pf.make_canned_eval_case(0)
    dataset, results = pf.to_coco_dicts(det, gt)
    img_ids = {im["id"] for im in dataset["images"]}
    assert img_ids == set(gt.keys())
    for ann in dataset["annotations"]:
        assert ann["image_id"] in img_ids
        assert ann["category_id"] in pf.CATEGORIES
        assert len(ann["bbox"]) == 4 and ann["area"] > 0
    assert len({a["id"] for a in dataset["annotations"]}) == len(
        dataset["annotations"])
    n_det = sum(len(d.scores) for d in det.values())
    assert len(results) == n_det


def test_checkpoint_manifest_import():
    """Real-checkpoint layout manifests (key -> shape, dumped from actual
    yolov8m.pt / rtdetr-l.pt / torchvision weights by
    tools/make_parity_fixtures.py) must import with zero skipped tensors.
    Skips until the manifests are generated on a host with the files."""
    import json
    from pathlib import Path

    from robust_object_detection_tpu.models import pretrained as pt

    fdir = Path(__file__).parent / "fixtures"
    manifests = sorted(fdir.glob("manifest_*.json"))
    if not manifests:
        pytest.skip("no checkpoint manifests committed yet (run "
                    "tools/make_parity_fixtures.py --checkpoints on a host "
                    "with the real .pt files)")
    import jax

    importers = {"yolov8m": (pt.import_yolov8, "yolo"),
                 "rtdetr-l": (pt.import_rtdetr, "rtdetr"),
                 "frcnn_v2": (pt.import_frcnn, "frcnn")}
    for mf in manifests:
        payload = json.loads(mf.read_text())
        name = payload["name"]
        importer, family = importers[name]
        sd = {k: np.zeros(shape, np.float32)
              for k, shape in payload["tensors"].items()}
        if family == "yolo":
            from robust_object_detection_tpu.models import yolov8 as Y
            model = Y.create(6, "m")
            variables = Y.init_variables(model, jax.random.key(0), 64)
        elif family == "rtdetr":
            from robust_object_detection_tpu.models import rtdetr as R
            model = R.create(6)
            variables = R.init_variables(model, jax.random.key(0), 64)
        else:
            from robust_object_detection_tpu.models import frcnn as F
            model = F.FasterRCNN(F.FrcnnConfig())
            init = jax.jit(lambda k, x: model.init(k, x, train=False))
            variables = init(jax.random.key(0),
                             np.zeros((1, 64, 64, 3), np.float32))
        _, report = importer(sd, {"params": variables["params"],
                                  "batch_stats": variables["batch_stats"]},
                             strict_head=False)
        # finish() already raised if ANY reference tensor went unmapped;
        # skips are only legitimate for class-count-mismatched head
        # tensors (COCO-80/91 checkpoint onto the nc=6 model)
        assert len(report.imported) >= 100, (name, len(report.imported))
        head_markers = ("cv3", "22.", "score_head", "class_embed",
                        "denoising", "enc_score", "box_predictor",
                        "cls_score")
        for s in report.skipped:
            assert any(h in s for h in head_markers), (name, s)
