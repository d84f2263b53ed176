"""mAP scorer: hand-computed cases + fuzz against an independent oracle.

pycocotools is not available in this image, so the oracle below is a direct,
unoptimised transcription of the published COCOeval bbox algorithm
(per-detection greedy loops, no vectorisation) written independently of
robust_object_detection_tpu.eval.coco_map's vectorised implementation.
Agreement between the two on randomised inputs is the parity evidence.
"""

import numpy as np
import pytest

from robust_object_detection_tpu.eval import coco_map as M


def D(boxes, scores, classes):
    return M.Detections(np.asarray(boxes, np.float64).reshape(-1, 4),
                        np.asarray(scores, np.float64).reshape(-1),
                        np.asarray(classes, np.int64).reshape(-1))


def G(boxes, classes, iscrowd=None):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    return M.GroundTruth(boxes, np.asarray(classes, np.int64).reshape(-1),
                         None if iscrowd is None else
                         np.asarray(iscrowd, bool).reshape(-1))


# ── hand-computed cases ──────────────────────────────────────────────────

def test_perfect_detection():
    gt = {1: G([[10, 10, 50, 50], [100, 100, 40, 40]], [1, 2])}
    dt = {1: D([[10, 10, 50, 50], [100, 100, 40, 40]], [0.9, 0.8], [1, 2])}
    r = M.evaluate(dt, gt, categories=[1, 2])
    assert r.ap50 == pytest.approx(1.0)
    assert r.ap == pytest.approx(1.0)
    assert r.per_class_ap50 == {1: pytest.approx(1.0), 2: pytest.approx(1.0)}


def test_no_detections():
    gt = {1: G([[10, 10, 50, 50]], [1])}
    dt = {1: D(np.zeros((0, 4)), [], [])}
    r = M.evaluate(dt, gt, categories=[1])
    assert r.ap50 == 0.0
    assert r.recall[0, 0, 0] == 0.0


def test_known_ap_value():
    """2 GT, 3 dets ranked TP,FP,TP -> AP = (51*1 + 50*(2/3))/101."""
    gt = {1: G([[0, 0, 10, 10], [100, 100, 10, 10]], [1, 1])}
    dt = {1: D([[0, 0, 10, 10], [50, 50, 10, 10], [100, 100, 10, 10]],
               [0.9, 0.8, 0.7], [1, 1, 1])}
    r = M.evaluate(dt, gt, categories=[1])
    want = (51 * 1.0 + 50 * (2 / 3)) / 101
    assert r.ap50 == pytest.approx(want, abs=1e-9)
    assert r.recall[0, 0, 0] == pytest.approx(1.0)


def test_crowd_gt_ignores_detections():
    """Detections matching a crowd GT are neither TP nor FP."""
    gt = {1: G([[0, 0, 10, 10], [100, 100, 50, 50]], [1, 1],
               iscrowd=[False, True])}
    # det 2 and 3 both inside the crowd region
    dt = {1: D([[0, 0, 10, 10], [100, 100, 50, 50], [110, 110, 30, 30]],
               [0.9, 0.8, 0.7], [1, 1, 1])}
    r = M.evaluate(dt, gt, categories=[1])
    # only 1 real GT, matched by the top det at IoU 1 -> perfect
    assert r.ap50 == pytest.approx(1.0)


def test_low_iou_is_fp():
    gt = {1: G([[0, 0, 10, 10]], [1])}
    dt = {1: D([[6, 6, 10, 10]], [0.9], [1])}  # IoU = 16/184 < 0.5
    r = M.evaluate(dt, gt, categories=[1])
    assert r.ap50 == 0.0


def test_iou_threshold_sweep():
    """A det at IoU ~0.6 is TP at thr .5/.55/.6 but FP above."""
    # gt 10x10 at origin; det shifted: xywh (0,0,10,8) -> IoU 80/100=0.8
    gt = {1: G([[0, 0, 10, 10]], [1])}
    dt = {1: D([[0, 0, 10, 8]], [0.9], [1])}
    r = M.evaluate(dt, gt, categories=[1])
    # IoU = 0.8 -> TP for thresholds .5-.8 (7 of them), FP above
    per_thr = r.precision[:, :, 0, 0].mean(axis=1)
    assert np.all(per_thr[:7] > 0.99)
    assert np.all(per_thr[7:] == 0.0)


def test_area_range_small():
    # one small (16 area) and one large GT
    gt = {1: G([[0, 0, 4, 4], [100, 100, 200, 200]], [1, 1])}
    dt = {1: D([[0, 0, 4, 4], [100, 100, 200, 200]], [0.9, 0.8], [1, 1])}
    r = M.evaluate(dt, gt, categories=[1])
    assert r.ap_by_area("small") == pytest.approx(1.0)
    assert r.ap_by_area("large") == pytest.approx(1.0)


def test_missing_image_counts_as_fn():
    gt = {1: G([[0, 0, 10, 10]], [1]), 2: G([[0, 0, 10, 10]], [1])}
    dt = {1: D([[0, 0, 10, 10]], [0.9], [1])}   # image 2 absent
    r = M.evaluate(dt, gt, categories=[1])
    assert r.recall[0, 0, 0] == pytest.approx(0.5)


def test_absent_category_excluded_from_mean():
    gt = {1: G([[0, 0, 10, 10]], [1])}
    dt = {1: D([[0, 0, 10, 10]], [0.9], [1])}
    r = M.evaluate(dt, gt, categories=[1, 2])   # cat 2 has no GT anywhere
    assert r.ap50 == pytest.approx(1.0)          # not dragged down by cat 2
    assert r.per_class_ap50[2] == 0.0            # reported as 0 when absent


# ── oracle: direct unvectorised COCOeval transcription ───────────────────

def _oracle_eval(dts, gts, categories, iou_thrs, rec_thrs, max_dets, area_rng):
    """Plain-python COCOeval bbox: returns precision (T,R,K) for area=all."""
    T, R, K = len(iou_thrs), len(rec_thrs), len(categories)
    precision = -np.ones((T, R, K))
    img_ids = sorted(gts.keys())
    for k, cat in enumerate(categories):
        # per-image match
        all_scores, all_tps, all_igs = [], [], []
        npig = 0
        for img in img_ids:
            g = gts[img]
            d = dts.get(img, None)
            gsel = [i for i in range(len(g.classes)) if g.classes[i] == cat]
            gboxes = [g.boxes[i] for i in gsel]
            gcrowd = [bool(g.iscrowd[i]) for i in gsel]
            garea = [float(g.areas[i]) for i in gsel]
            gig = [c or a < area_rng[0] or a > area_rng[1]
                   for c, a in zip(gcrowd, garea)]
            # sort gt: ignored last
            order = sorted(range(len(gsel)), key=lambda i: gig[i])
            gboxes = [gboxes[i] for i in order]
            gcrowd = [gcrowd[i] for i in order]
            gig = [gig[i] for i in order]
            npig += sum(1 for x in gig if not x)

            if d is None:
                continue
            dsel = [i for i in range(len(d.classes)) if d.classes[i] == cat]
            dorder = sorted(dsel, key=lambda i: -d.scores[i])[:max_dets]
            dboxes = [d.boxes[i] for i in dorder]
            dscores = [d.scores[i] for i in dorder]

            def iou(db, gb, crowd):
                ix = max(0, min(db[0] + db[2], gb[0] + gb[2]) - max(db[0], gb[0]))
                iy = max(0, min(db[1] + db[3], gb[1] + gb[3]) - max(db[1], gb[1]))
                inter = ix * iy
                da = db[2] * db[3]
                ga = gb[2] * gb[3]
                u = da if crowd else da + ga - inter
                return inter / max(u, 1e-10)

            dtm = np.full((T, len(dboxes)), -1, int)
            gtmatched = np.zeros((T, len(gboxes)), bool)
            for t, thr in enumerate(iou_thrs):
                for di, db in enumerate(dboxes):
                    best_iou = min(thr, 1 - 1e-10)
                    best = -1
                    for gi, gb in enumerate(gboxes):
                        if gtmatched[t][gi] and not gcrowd[gi]:
                            continue
                        if best > -1 and not gig[best] and gig[gi]:
                            break
                        v = iou(db, gb, gcrowd[gi])
                        if v < best_iou:
                            continue
                        best_iou = v
                        best = gi
                    if best >= 0:
                        dtm[t, di] = best
                        if not gcrowd[best]:
                            gtmatched[t, best] = True
            darea = [db[2] * db[3] for db in dboxes]
            for di in range(len(dboxes)):
                all_scores.append(dscores[di])
                tps, igs = [], []
                for t in range(T):
                    m = dtm[t, di]
                    if m >= 0:
                        tps.append(not gig[m])
                        igs.append(gig[m])
                    else:
                        tps.append(False)
                        igs.append(darea[di] < area_rng[0]
                                   or darea[di] > area_rng[1])
                all_tps.append(tps)
                all_igs.append(igs)

        if npig == 0:
            continue
        if not all_scores:
            precision[:, :, k] = 0.0
            continue
        order = np.argsort(-np.asarray(all_scores), kind="mergesort")
        tpm = np.asarray(all_tps)[order].T        # (T, D)
        igm = np.asarray(all_igs)[order].T
        for t in range(T):
            tp = np.cumsum(tpm[t] & ~igm[t])
            fp = np.cumsum(~tpm[t] & ~igm[t])
            rc = tp / npig
            pr = tp / np.maximum(tp + fp, np.spacing(1))
            pr = np.maximum.accumulate(pr[::-1])[::-1]
            q = np.zeros(R)
            inds = np.searchsorted(rc, rec_thrs, side="left")
            for ri, pi in enumerate(inds):
                if pi < len(pr):
                    q[ri] = pr[pi]
            precision[t, :, k] = q
    return precision


def _rand_case(rng, n_imgs=6, n_cats=3):
    gts, dts = {}, {}
    for img in range(n_imgs):
        ng = rng.integers(0, 12)
        gb = np.column_stack([rng.uniform(0, 400, ng), rng.uniform(0, 400, ng),
                              rng.uniform(4, 120, ng), rng.uniform(4, 120, ng)])
        gc = rng.integers(1, n_cats + 1, ng)
        crowd = rng.uniform(size=ng) < 0.15
        gts[img] = M.GroundTruth(gb, gc, crowd)
        nd = rng.integers(0, 20)
        # half the detections perturb GT boxes, half are random
        db = []
        for _ in range(nd):
            if ng and rng.uniform() < 0.6:
                j = rng.integers(0, ng)
                jitter = rng.normal(0, 6, 4)
                db.append(gb[j] + jitter)
            else:
                db.append([rng.uniform(0, 400), rng.uniform(0, 400),
                           rng.uniform(4, 120), rng.uniform(4, 120)])
        db = np.asarray(db, np.float64).reshape(-1, 4)
        db[:, 2:] = np.maximum(db[:, 2:], 1.0)
        dts[img] = M.Detections(db, rng.uniform(0.05, 1, nd),
                                rng.integers(1, n_cats + 1, nd))
    return dts, gts


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_fuzz_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    dts, gts = _rand_case(rng)
    cats = [1, 2, 3]
    r = M.evaluate(dts, gts, categories=cats)
    oracle = _oracle_eval(dts, gts, cats, M.IOU_THRS, M.REC_THRS, 100,
                          M.AREA_RNG["all"])
    ours = r.precision[:, :, :, 0]
    np.testing.assert_allclose(ours, oracle, atol=1e-9)
