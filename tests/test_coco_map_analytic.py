"""Analytic + metamorphic mAP-scorer validation that runs on EVERY host.

The r3 verdict's scorer-oracle hole: the in-repo COCOeval oracle
(test_coco_map.py) and the C++ core are same-author transcriptions, and
the pycocotools legs of test_external_parity.py both skip on hosts without
pycocotools. These tests need no external package:

  * golden cases whose AP values are DERIVED BY HAND in the comments
    (fractions of the 101-point recall grid), exercising the COCOeval
    rules the reference depends on — greedy score-order matching
    (eval_all.py:131-156 consumes COCOeval's precision tensor), crowd
    detection-area IoU + ignore semantics, non-ignored-GT match
    preference, area-range GT/detection ignores, the maxDets cap, and the
    101-point interpolated-precision sampling;
  * metamorphic properties that hold for the COCO protocol on ANY input
    (score-monotone invariance, coordinate-scale invariance, duplicate
    detections never helping, matching a missed GT never hurting).

Every case runs through BOTH matcher backends (numpy and the C++ core)
when the native library builds, so a transcription bug must now survive
hand-derived arithmetic, not just agree with its sibling.
"""

import numpy as np
import pytest

from robust_object_detection_tpu.eval import coco_map
from robust_object_detection_tpu.eval import parity_fixtures as pf


def _backends():
    from robust_object_detection_tpu import native
    return [False, True] if native.available() else [False]


BACKENDS = _backends()


def _det(boxes, scores, classes=None):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    n = len(boxes)
    return coco_map.Detections(
        boxes=boxes, scores=np.asarray(scores, np.float64),
        classes=(np.ones(n, np.int64) if classes is None
                 else np.asarray(classes, np.int64)))


def _gt(boxes, classes=None, iscrowd=None):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    n = len(boxes)
    return coco_map.GroundTruth(
        boxes=boxes,
        classes=(np.ones(n, np.int64) if classes is None
                 else np.asarray(classes, np.int64)),
        iscrowd=None if iscrowd is None else np.asarray(iscrowd, bool))


@pytest.mark.parametrize("use_native", BACKENDS)
class TestAnalyticGoldens:
    """AP values derived by hand from the COCOeval definition."""

    def test_interpolation_and_threshold_partition(self, use_native):
        """1 category, 1 image. GT: g1=[0,0,10,10], g2=[100,0,10,10].
        Dets (score order): d1=g1 exactly (IoU 1), d2=[200,0,10,10] FP,
        d3=[100,0,10,5] with IoU vs g2 = 50/(100+50-50) = 0.5 exactly —
        a TP at thr 0.50 only.

        thr=.50: TP,FP,TP -> tp=[1,1,2] fp=[0,1,1], rc=[.5,.5,1],
        pr=[1,1/2,2/3]; interpolated (running max from the end) =
        [1,2/3,2/3]. Sampling the 101 recall points r=0..1 by
        searchsorted(rc, r, left): r<=0.50 (51 pts) -> pr 1; r>0.50
        (50 pts) -> 2/3.  AP50 = (51 + 50*2/3)/101 = 253/303.

        thr=.55...95 (9 thrs): only d1 matches: tp=[1,1,1] fp=[0,1,2],
        rc=[.5,.5,.5], interp pr=[1,.5,1/3]; r<=.5 -> 1, r>.5 -> beyond
        the last recall -> 0.  AP = 51/101.

        mAP50-95 = (253/303 + 9*(51/101))/10 = 1630/3030 = 163/303."""
        det = {1: _det([[0, 0, 10, 10], [200, 0, 10, 10], [100, 0, 10, 5]],
                       [0.9, 0.8, 0.7])}
        gt = {1: _gt([[0, 0, 10, 10], [100, 0, 10, 10]])}
        r = coco_map.evaluate(det, gt, categories=[1], use_native=use_native)
        assert r.ap50 == pytest.approx(253 / 303, abs=1e-12)
        assert r.ap == pytest.approx(163 / 303, abs=1e-12)

    def test_crowd_area_denominator_and_ignore(self, use_native):
        """GT: g1=[0,0,10,10], g2=[20,0,10,10], crowd g3=[50,0,20,20].
        Dets: d1=g1 (s=.9), d2=[55,5,20,20] (s=.8), d3=g2 (s=.7),
        d4=[200,200,10,10] FP (s=.5).

        d2 vs the crowd uses the DETECTION area as denominator
        (pycocotools iscrowd semantics): inter=(70-55)*(20-5)=225,
        IoU = 225/400 = 0.5625. With the union denominator it would be
        225/575 = 0.391 < 0.5 — so a denominator bug flips the .50/.55
        rows.

        thr .50/.55 (0.5625 >= thr): d2 matches the crowd -> IGNORED
        (dropped, not FP; the crowd never counts as FN either, n_pos=2).
        Seq TP,TP,FP: rc=[.5,1,1], interp pr=[1,1,2/3]; every sampled
        recall point r: searchsorted -> pr 1.  AP = 1.

        thr .60..: 0.5625 < thr, d2 is a plain FP: TP,FP,TP,FP ->
        rc=[.5,.5,1,1], pr=[1,.5,2/3,.5], interp [1,2/3,2/3,.5]:
        r<=.5 -> 1 (51), r>.5 -> 2/3 (50). AP = 253/303.

        mAP50-95 = (2*1 + 8*253/303)/10 = 2630/3030 = 263/303."""
        det = {1: _det(
            [[0, 0, 10, 10], [55, 5, 20, 20], [20, 0, 10, 10],
             [200, 200, 10, 10]], [0.9, 0.8, 0.7, 0.5])}
        gt = {1: _gt([[0, 0, 10, 10], [20, 0, 10, 10], [50, 0, 20, 20]],
                     iscrowd=[False, False, True])}
        r = coco_map.evaluate(det, gt, categories=[1], use_native=use_native)
        assert r.ap50 == pytest.approx(1.0, abs=1e-12)
        assert r.ap == pytest.approx(263 / 303, abs=1e-12)

    def test_non_ignored_gt_preferred_over_higher_iou_crowd(self, use_native):
        """COCOeval's match loop: once the running best match is a
        non-ignored GT, an ignored GT cannot take over EVEN AT HIGHER IoU.

        GT: g1=[0,0,10,8.4] normal (det IoU = 84/100 = 0.84),
        g2=[0,0,10,10] crowd (det IoU = 100/100 = 1.0).
        One det = [0,0,10,10] (s=.9). n_pos = 1.

        thr .50...80 (7 thrs): g1 is a candidate -> MUST match g1 (not
        the IoU-1.0 crowd) -> TP, recall 1 -> AP 1.  A "highest IoU wins
        globally" bug matches the crowd, ignores the det, and zeroes
        these rows.
        thr .85/.90/.95: only the crowd candidates -> det ignored ->
        no TP and no FP with n_pos=1 -> AP 0.
        mAP50-95 = 7/10; mAP50 = 1."""
        det = {1: _det([[0, 0, 10, 10]], [0.9])}
        gt = {1: _gt([[0, 0, 10, 8.4], [0, 0, 10, 10]],
                     iscrowd=[False, True])}
        r = coco_map.evaluate(det, gt, categories=[1], use_native=use_native)
        assert r.ap50 == pytest.approx(1.0, abs=1e-12)
        assert r.ap == pytest.approx(0.7, abs=1e-12)

    # the area fixture shared by the two tests below:
    # GTs  g_s=[0,0,10,10] (area 100, small), g_m=[100,0,50,50] (2500,
    # medium), g_l=[300,0,100,100] (10000, large); dets are exact copies
    # (s=.9/.8/.7) plus d_fp=[400,400,2,2] (s=.95, area 4, small).
    AREA_DET = ([[400, 400, 2, 2], [0, 0, 10, 10], [100, 0, 50, 50],
                 [300, 0, 100, 100]], [0.95, 0.9, 0.8, 0.7])
    AREA_GT = [[0, 0, 10, 10], [100, 0, 50, 50], [300, 0, 100, 100]]

    def test_area_ranges(self, use_native):
        """area=all: FP,TP,TP,TP -> rc=[0,1/3,2/3,1],
        pr=[0,.5,2/3,.75], interp = [.75]*4 -> AP_all = 0.75 at every
        thr (exact-match IoUs are 1.0).

        area=small (0,32^2): g_m/g_l ignored (never FN); their matched
        dets ignored too. d_fp (area 4) IS in range -> a real FP ABOVE
        the TP: rc=[0,1], interp pr=[.5,.5] -> AP_small = 0.5.

        area=medium: n_pos=1 (g_m). d_fp is unmatched AND out of range
        -> ignored (a bug that counts it as FP gives 0.5): seq is the
        single TP -> AP_medium = 1.  Same for large."""
        det = {1: _det(*self.AREA_DET)}
        gt = {1: _gt(self.AREA_GT)}
        r = coco_map.evaluate(det, gt, categories=[1], use_native=use_native)
        assert r.ap == pytest.approx(0.75, abs=1e-12)
        assert r.ap50 == pytest.approx(0.75, abs=1e-12)
        assert r.ap_by_area("small") == pytest.approx(0.5, abs=1e-12)
        assert r.ap_by_area("medium") == pytest.approx(1.0, abs=1e-12)
        assert r.ap_by_area("large") == pytest.approx(1.0, abs=1e-12)

    def test_max_dets_cap(self, use_native):
        """maxDets keeps the TOP-SCORED dets per image: with max_dets=2
        only d_fp(.95) and d_s(.9) survive -> seq FP,TP, n_pos=3:
        rc=[0,1/3], interp pr=[.5,.5]; sampled: r<=1/3 (34 pts of the
        101 grid: 0.00..0.33) -> .5, rest 0. AP = 34*.5/101 = 17/101."""
        det = {1: _det(*self.AREA_DET)}
        gt = {1: _gt(self.AREA_GT)}
        r = coco_map.evaluate(det, gt, categories=[1], max_dets=2,
                              use_native=use_native)
        assert r.ap50 == pytest.approx(17 / 101, abs=1e-12)

    def test_absent_category_excluded_from_mean(self, use_native):
        """Categories with no GT anywhere stay -1 in the precision tensor
        and are EXCLUDED from the mean (pycocotools -1 convention), not
        averaged as zeros: cat 1 scores AP 1, cat 2 has no GT -> mAP 1."""
        det = {1: _det([[0, 0, 10, 10], [30, 0, 10, 10]], [0.9, 0.8],
                       classes=[1, 2])}
        gt = {1: _gt([[0, 0, 10, 10]], classes=[1])}
        r = coco_map.evaluate(det, gt, categories=[1, 2],
                              use_native=use_native)
        assert r.ap50 == pytest.approx(1.0, abs=1e-12)
        assert r.ap == pytest.approx(1.0, abs=1e-12)
        assert r.per_class_ap50[1] == pytest.approx(1.0)
        # absent category reported as 0 by the valid-mean (no -1 leakage)
        assert r.per_class_ap50[2] == 0.0

    def test_missing_detection_image_counts_fn(self, use_native):
        """An image in ground_truth with no detections entry is all-FN:
        img 1 perfect (1 GT, 1 TP), img 2 has 1 GT and no dets ->
        n_pos=2, rc=[.5], interp pr=[1]: r<=.5 -> 1 (51 pts), rest 0.
        AP = 51/101."""
        det = {1: _det([[0, 0, 10, 10]], [0.9])}
        gt = {1: _gt([[0, 0, 10, 10]]), 2: _gt([[5, 5, 10, 10]])}
        r = coco_map.evaluate(det, gt, categories=[1], use_native=use_native)
        assert r.ap50 == pytest.approx(51 / 101, abs=1e-12)


class TestMetamorphic:
    """Protocol properties that hold for ANY detection/GT set."""

    def _stats(self, det, gt):
        return pf.our_stats(det, gt)

    def test_score_monotone_invariance(self):
        """AP depends only on the score ORDER: any strictly increasing
        transform of all scores leaves every statistic unchanged."""
        det, gt = pf.make_canned_eval_case(0)
        base = self._stats(det, gt)
        warped = {i: coco_map.Detections(
            boxes=d.boxes, scores=1.0 / (1.0 + np.exp(-3.0 * d.scores)),
            classes=d.classes) for i, d in det.items()}
        assert self._stats(warped, gt) == base

    def test_coordinate_scale_invariance(self):
        """Scaling every box (det + GT + GT area) by a constant factor
        preserves all IoUs; with area ranges scaled too, every statistic
        is unchanged. Run with the area thresholds effectively disabled
        by comparing only the area-'all' numbers on same-area-band
        scaling: use s small enough to keep boxes in their bands? No —
        compare the full evaluate() restricted to area 'all'."""
        det, gt = pf.make_canned_eval_case(1)
        s = 1.75
        det2 = {i: coco_map.Detections(d.boxes * s, d.scores, d.classes)
                for i, d in det.items()}
        gt2 = {i: coco_map.GroundTruth(g.boxes * s, g.classes, g.iscrowd,
                                       g.areas * s * s)
               for i, g in gt.items()}
        r1 = coco_map.evaluate(det, gt, pf.CATEGORIES,
                               area_labels=("all",))
        r2 = coco_map.evaluate(det2, gt2, pf.CATEGORIES,
                               area_labels=("all",))
        assert r2.ap50 == pytest.approx(r1.ap50, abs=1e-12)
        assert r2.ap == pytest.approx(r1.ap, abs=1e-12)

    def test_duplicate_detections_never_help(self):
        """Appending a duplicate of every detection at epsilon-lower score
        can only add FPs (each GT matches once): mAP never increases."""
        det, gt = pf.make_canned_eval_case(2)
        base = self._stats(det, gt)
        dup = {i: coco_map.Detections(
            np.concatenate([d.boxes, d.boxes]),
            np.concatenate([d.scores, d.scores * 0.5]),
            np.concatenate([d.classes, d.classes]))
            for i, d in det.items()}
        dupe = self._stats(dup, gt)
        assert dupe["mAP50"] <= base["mAP50"] + 1e-12
        assert dupe["mAP50_95"] <= base["mAP50_95"] + 1e-12

    def test_matching_a_missed_gt_never_hurts(self):
        """Adding one exact-match detection for a GT box in an image with
        no detections strictly raises recall on that class; mAP50 must
        not decrease."""
        det, gt = pf.make_canned_eval_case(0)
        target = None
        for i, g in gt.items():
            if len(g.boxes) and i not in det:
                target = (i, g)
                break
        if target is None:        # give an empty-det image one perfect det
            i = next(i for i, d in det.items() if len(d.boxes) == 0
                     and len(gt[i].boxes))
            target = (i, gt[i])
        i, g = target
        base = self._stats(det, gt)
        det2 = dict(det)
        det2[i] = coco_map.Detections(
            boxes=g.boxes[:1].astype(np.float64),
            scores=np.array([0.999]), classes=g.classes[:1])
        boosted = self._stats(det2, gt)
        assert boosted["mAP50"] >= base["mAP50"] - 1e-12

    def test_detection_order_irrelevant(self):
        """Shuffling the per-image detection arrays changes nothing when
        scores are DISTINCT — the scorer must sort internally. (On tied
        scores the COCO protocol itself is input-order-dependent: the
        stable mergesort preserves array order, exactly like pycocotools
        — so ties are broken to distinct values first.)"""
        det, gt = pf.make_canned_eval_case(1)
        rng = np.random.RandomState(7)
        base, shuf = {}, {}
        for i, d in det.items():
            n = len(d.scores)
            # keep the score ORDER, make values strictly distinct
            order = np.argsort(-d.scores, kind="stable")
            distinct = np.empty(n)
            distinct[order] = np.linspace(0.95, 0.05, n) if n else []
            base[i] = coco_map.Detections(d.boxes, distinct, d.classes)
            p = rng.permutation(n)
            shuf[i] = coco_map.Detections(d.boxes[p], distinct[p],
                                          d.classes[p])
        assert self._stats(shuf, gt) == self._stats(base, gt)

    def test_category_permutation_invariance(self):
        """Relabeling categories by a bijection (consistently in dets and
        GT) permutes per-class AP and preserves the means."""
        det, gt = pf.make_canned_eval_case(2)
        perm = {1: 4, 2: 6, 3: 1, 4: 5, 5: 3, 6: 2}
        lut = np.zeros(7, np.int64)
        for a, b in perm.items():
            lut[a] = b
        det2 = {i: coco_map.Detections(d.boxes, d.scores, lut[d.classes])
                for i, d in det.items()}
        gt2 = {i: coco_map.GroundTruth(g.boxes, lut[g.classes], g.iscrowd,
                                       g.areas) for i, g in gt.items()}
        s1, s2 = self._stats(det, gt), self._stats(det2, gt2)
        assert s2["mAP50"] == pytest.approx(s1["mAP50"], abs=1e-12)
        assert s2["mAP50_95"] == pytest.approx(s1["mAP50_95"], abs=1e-12)
        for a, b in perm.items():
            assert s2[f"ap50_class_{b}"] == pytest.approx(
                s1[f"ap50_class_{a}"], abs=1e-12)
