"""Protocol-level mAP cross-checks: torch val pipelines vs the Flax stack.

Forward-tensor parity (test_pretrained.py, 2e-4) cannot catch drift in the
val PROTOCOL — letterbox geometry, decode, NMS semantics, score thresholds,
coordinate scale-back, or the scorer. These tests run the SAME weights
through two independently written pipelines and compare at the mAP level,
exactly where the reference's published numbers live:

  torch side   tests/_torch_val.py — replica model (real checkpoint layout)
               + independent letterbox / decode / sequential NMS / rescale
               (Ultralytics val semantics: eval_all.py:162-192; conf 0.001,
               iou 0.7, max_det 300, multi_label=True; RT-DETR per-query
               max-class top-300)
  flax side    models/pretrained import -> train/*.make_predict_step ->
               eval/detector_eval.evaluate_on_samples over an on-disk
               synthetic COCO testset (the exact production eval path)

Ground truth is derived from the torch pipeline itself: detections with
score >= GT_CONF become the annotations (degenerate sub-2px boxes
excluded).  The torch pipeline then scores ~1 against its own detections;
the Flax pipeline only matches it if every protocol stage agrees.  With
random (livened) weights the junk-score band carries near-ties that f32
noise (~2e-4) reorders, so tolerances are set by measured noise, not by
protocol slack: a letterbox/stride/NMS-semantics bug moves mAP by 10-100x
the tolerance.
"""

import json
import math
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from robust_object_detection_tpu.data import pipeline as pipe  # noqa: E402
from robust_object_detection_tpu.eval import (coco_map,  # noqa: E402
                                              detector_eval)
from robust_object_detection_tpu.models import pretrained  # noqa: E402
from tests import _torch_val as tv  # noqa: E402

pytestmark = pytest.mark.slow

GT_CONF = 0.30


def liven(model, seed=11):
    """Re-draw weights so input signal reaches the heads.

    randomize() (the import-parity helper) draws every tensor at std 0.05,
    which zeroes signal within ~4 layers (BN gammas at 0.05 each multiply
    the activations down); protocol tests need live, content-driven
    outputs. He-scaled convs/linears, gammas near 1.
    """
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "dfl" in name:
                continue
            if p.ndim >= 2:
                fan_in = int(np.prod(p.shape[1:]))
                p.copy_(torch.randn(p.shape, generator=g)
                        * math.sqrt(2.0 / fan_in))
            elif name.endswith(".weight"):
                p.copy_(1.0 + 0.2 * torch.randn(p.shape, generator=g))
            else:
                p.copy_(0.1 * torch.randn(p.shape, generator=g))
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(0.1 * torch.randn(b.shape, generator=g))
            elif name.endswith("running_var"):
                b.copy_(0.8 + 0.4 * torch.rand(b.shape, generator=g))
    return model.eval()


def calibrate_bn(model, run):
    """Set every BatchNorm's running stats to its actual eval-mode input
    distribution during one forward driven by `run()` (a no-arg callable
    so models without a monolithic forward — the FRCNN replica exposes
    parts — can be calibrated too).

    liven() draws running stats at random, so eval-mode BN does not
    normalise and deep residual stacks (ResNet-50) explode to O(1e4)
    activations. A pre-forward hook that recomputes (mean, var) just
    before each BN executes calibrates the whole net in ONE pass — each
    later BN already sees the outputs of calibrated earlier layers.
    """
    hooks = []

    def prehook(mod, inputs):
        with torch.no_grad():
            xin = inputs[0]
            mod.running_mean.copy_(xin.mean((0, 2, 3)))
            mod.running_var.copy_(xin.var((0, 2, 3)) + 1e-3)

    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            hooks.append(m.register_forward_pre_hook(prehook))
    with torch.no_grad():
        run()
    for h in hooks:
        h.remove()
    return model


def sharpen_head(convs_or_linears, gain: float, bias: float):
    """Scale score-head outputs so sigmoid scores spread over (0, 1)
    instead of pooling near 0.5 — stable rankings need real margins."""
    with torch.no_grad():
        for m in convs_or_linears:
            m.weight *= gain
            m.bias.fill_(bias)


def make_images(seed=7, sizes=((200, 150), (120, 180), (160, 160),
                               (90, 210), (170, 130), (128, 128),
                               (210, 160), (140, 190))):
    """Structured synthetic content at varied aspect ratios (exercises the
    letterbox scale/rescale on both up- and down-scaling paths)."""
    rng = np.random.RandomState(seed)
    images = []
    for (h, w) in sizes:
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        for _ in range(6):
            y0, x0 = rng.randint(0, h - 10), rng.randint(0, w - 10)
            hh, ww = rng.randint(8, h - y0), rng.randint(8, w - x0)
            img[y0:y0 + hh, x0:x0 + ww] = rng.randint(0, 255, 3)
        images.append(img)
    return images


def derive_gt(dets, conf=GT_CONF):
    """Torch detections -> GT annotations (degenerate boxes excluded)."""
    gt = {}
    for i, d in enumerate(dets):
        keep = (d["scores"] >= conf) & (d["boxes"][:, 2:] >= 2.0).all(1)
        gt[i] = (d["boxes"][keep], d["classes"][keep])
    return gt


def write_testset(tmp_path, images, gt):
    """Write a COCO-layout testset (PNG: the two pipelines must see
    byte-identical pixels, so no JPEG)."""
    import cv2
    root = Path(tmp_path) / "ts"
    (root / "images" / "val").mkdir(parents=True)
    (root / "annotations").mkdir()
    ims, anns = [], []
    aid = 1
    for i, img in enumerate(images):
        fn = f"{i:06d}.png"
        cv2.imwrite(str(root / "images" / "val" / fn), img[:, :, ::-1])
        h, w = img.shape[:2]
        ims.append({"id": i, "file_name": fn, "width": w, "height": h})
        for b, c in zip(*gt[i]):
            anns.append({"id": aid, "image_id": i, "category_id": int(c),
                         "bbox": [float(v) for v in b],
                         "area": float(b[2] * b[3]), "iscrowd": 0})
            aid += 1
    cats = [{"id": k, "name": str(k)} for k in range(1, 7)]
    (root / "annotations" / "instances_val.json").write_text(json.dumps(
        {"images": ims, "annotations": anns, "categories": cats}))
    return root


def score_torch(dets, gt):
    det_d = {i: coco_map.Detections(boxes=d["boxes"], scores=d["scores"],
                                    classes=d["classes"])
             for i, d in enumerate(dets)}
    gt_d = {i: coco_map.GroundTruth(boxes=gt[i][0],
                                    classes=gt[i][1].astype(np.int64))
            for i in gt}
    return coco_map.summarize(
        coco_map.evaluate(det_d, gt_d, categories=list(range(1, 7))))


def detection_agreement(torch_dets, flax_dets_by_id, conf=GT_CONF,
                        iou_thresh=0.8, score_tol=0.05):
    """Fraction of confident torch detections reproduced by the flax
    pipeline (same class, IoU > 0.8, score within 0.05): a protocol
    agreement metric insensitive to the junk-FP tail."""
    hit = tot = 0
    for i, d in enumerate(torch_dets):
        keep = (d["scores"] >= conf) & (d["boxes"][:, 2:] >= 2.0).all(1)
        tb = d["boxes"][keep]
        tb = np.concatenate([tb[:, :2], tb[:, :2] + tb[:, 2:]], 1)
        ts, tc = d["scores"][keep], d["classes"][keep]
        fd = flax_dets_by_id[i]
        fb = np.concatenate([fd.boxes[:, :2],
                             fd.boxes[:, :2] + fd.boxes[:, 2:]], 1)
        for b, s, c in zip(tb, ts, tc):
            tot += 1
            same = fd.classes == c
            if not same.any():
                continue
            ious = tv.iou_xyxy(b[None], fb[same])[0]
            j = ious.argmax()
            if (ious[j] > iou_thresh
                    and abs(fd.scores[same][j] - s) < score_tol):
                hit += 1
    return hit / max(tot, 1), tot


def run_flax_eval(predict_fn, state, root, img_size, collect=False):
    samples = pipe.index_coco(root, "val")
    if not collect:
        return detector_eval.evaluate_on_samples(
            predict_fn, state, samples, img_size, 4)
    if isinstance(predict_fn, detector_eval.BucketedPredict):
        bp = predict_fn
        groups, scales = {}, {}
        for s in samples:
            th, tw, sc = detector_eval.tv_target(
                s.height, s.width, bp.min_side, bp.max_side)
            bucket = (-(-th // bp.bucket_mult) * bp.bucket_mult,
                      -(-tw // bp.bucket_mult) * bp.bucket_mult)
            groups.setdefault(bucket, []).append(s)
            scales[s.image_id] = sc
        dets = {}
        for bucket, group in groups.items():
            d, _, _ = detector_eval._collect_detections(
                bp.factory(bucket), state, group, bucket, 4, None, 600,
                scale_fn=lambda s: scales[s.image_id],
                pad_value=bp.pad_value)
            dets.update(d)
        return dets
    dets, _, _ = detector_eval._collect_detections(
        predict_fn, state, samples, img_size, 4, None, 600)
    return dets


class TestYoloProtocol:
    IMGSZ = 160

    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        from tests._torch_yolo import DetectionModel
        from robust_object_detection_tpu.models import yolov8 as Y
        from robust_object_detection_tpu.train import detector

        tm = liven(DetectionModel(nc=6, variant="n"))
        sharpen_head([seq[2] for seq in tm.model[22].cv3],
                     gain=20.0, bias=-4.0)
        images = make_images()
        torch_dets = tv.yolo_val(tm, images, self.IMGSZ)
        gt = derive_gt(torch_dets)
        assert sum(len(g[0]) for g in gt.values()) >= 50, (
            "testset too sparse to be discriminative")
        root = write_testset(tmp_path_factory.mktemp("yolo_ts"), images, gt)

        fm = Y.create(6, "n")
        fv = Y.init_variables(fm, jax.random.key(0), 64)
        fv2, report = pretrained.import_yolov8(
            {k: v.detach().numpy() for k, v in tm.state_dict().items()},
            fv, variant="n")
        assert not report.skipped
        state = detector.DetTrainState(
            params=fv2["params"], batch_stats=fv2["batch_stats"],
            ema_params=fv2["params"], opt_state=(), step=jnp.asarray(0))
        predict = jax.jit(detector.make_predict_step(fm, self.IMGSZ))
        return torch_dets, gt, root, predict, state, tm, fm, images

    def test_map_parity(self, setup):
        torch_dets, gt, root, predict, state = setup[:5]
        res_t = score_torch(torch_dets, gt)
        res_f = run_flax_eval(predict, state, root, self.IMGSZ)
        # torch scores ~1 against its own detections; flax must match the
        # protocol. Tolerances cover f32 near-tie reorders only (measured
        # raw-decode noise: boxes <0.1px, scores <5e-3 — asserted directly
        # by test_raw_decode_agreement below).
        assert res_t["mAP50"] > 0.9, res_t
        assert abs(res_t["mAP50"] - res_f["mAP50"]) < 0.03, (res_t, res_f)
        assert abs(res_t["mAP50_95"] - res_f["mAP50_95"]) < 0.05, (
            res_t, res_f)

    def test_detection_agreement(self, setup):
        torch_dets, gt, root, predict, state = setup[:5]
        flax_dets = run_flax_eval(predict, state, root, self.IMGSZ,
                                  collect=True)
        frac, tot = detection_agreement(torch_dets, flax_dets)
        assert tot >= 50
        assert frac > 0.9, (frac, tot)

    def test_raw_decode_agreement(self, setup):
        """VERDICT r4 item 7: pre-NMS decode must agree at the f32 noise
        floor — boxes <0.1 px, scores <5e-3 — 30x below what the 0.03
        mAP tolerance can see, so a subtle score-threshold or rescale
        -rounding drift cannot hide under the mAP-level check."""
        from robust_object_detection_tpu.models import yolov8 as Y
        _, _, _, _, state, tm, fm, images = setup
        apply = jax.jit(lambda v, x: fm.apply(v, x, train=False))
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        for img in images[:4]:
            canvas, _ = tv.letterbox_np(img, self.IMGSZ)
            x_t = torch.from_numpy(canvas.astype(np.float32)
                                   .transpose(2, 0, 1)[None]) / 255.0
            with torch.no_grad():
                tb, tsc = tv.decode_yolo(tm(x_t), self.IMGSZ)
            outs = apply(variables,
                         jnp.asarray(canvas[None], jnp.float32) / 255.0)
            fb, fs = Y.decode(outs, self.IMGSZ)
            np.testing.assert_allclose(np.asarray(fb[0]), tb[0].numpy(),
                                       atol=0.1)                 # px
            np.testing.assert_allclose(np.asarray(fs[0]), tsc[0].numpy(),
                                       atol=5e-3)


class TestRtdetrProtocol:
    IMGSZ = 128

    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        from tests._torch_rtdetr import RTDETRModel
        from robust_object_detection_tpu.models import rtdetr as R
        from robust_object_detection_tpu.train import rtdetr as TR

        tm = liven(RTDETRModel(nc=6))
        dec = tm.model[28]
        # score heads: mild gain — livened embeddings already carry O(1)
        # logits, and saturated sigmoids produce exact-tie scores that make
        # the top-k query selection framework-dependent
        sharpen_head(list(dec.dec_score_head), gain=1.5, bias=-1.5)
        sharpen_head([dec.enc_score_head], gain=0.5, bias=-1.0)
        # bbox heads: damp the final MLP layer — at He scale the sigmoid
        # saturates and half the boxes collapse to zero width/height
        with torch.no_grad():
            for mlp in list(dec.dec_bbox_head) + [dec.enc_bbox_head]:
                last = list(mlp.parameters())[-2:]
                last[0].mul_(0.08)
                last[1].zero_()
        # square images: RT-DETR emits all 300 queries with no NMS/conf
        # floor, so pad-region boxes would clip to degenerate slivers and
        # flood the GT derivation (letterbox rescale is already exercised
        # by the varied sizes; the YOLO leg covers non-square aspects)
        images = make_images(seed=13, sizes=(
            (160, 160), (112, 112), (192, 192), (128, 128),
            (96, 96), (176, 176), (144, 144), (120, 120)))
        torch_dets = tv.rtdetr_val(tm, images, self.IMGSZ)
        gt = derive_gt(torch_dets)
        assert sum(len(g[0]) for g in gt.values()) >= 30
        root = write_testset(tmp_path_factory.mktemp("rtdetr_ts"), images,
                             gt)

        fm = R.create(6)
        fv = R.init_variables(fm, jax.random.key(0), 64)
        fv2, report = pretrained.import_rtdetr(
            {k: v.detach().numpy() for k, v in tm.state_dict().items()}, fv)
        assert not report.skipped
        state = TR.RtdetrTrainState(
            params=fv2["params"], batch_stats=fv2["batch_stats"],
            ema_params=fv2["params"], opt_state=(), step=jnp.asarray(0))
        predict = jax.jit(TR.make_predict_step(fm, self.IMGSZ))
        return torch_dets, gt, root, predict, state, tm, fm, images

    def test_map_parity(self, setup):
        torch_dets, gt, root, predict, state = setup[:5]
        res_t = score_torch(torch_dets, gt)
        res_f = run_flax_eval(predict, state, root, self.IMGSZ)
        assert res_t["mAP50"] > 0.85, res_t
        assert abs(res_t["mAP50"] - res_f["mAP50"]) < 0.05, (res_t, res_f)

    def test_detection_agreement(self, setup):
        torch_dets, gt, root, predict, state = setup[:5]
        flax_dets = run_flax_eval(predict, state, root, self.IMGSZ,
                                  collect=True)
        frac, tot = detection_agreement(torch_dets, flax_dets)
        assert tot >= 30
        assert frac > 0.85, (frac, tot)

    def test_raw_decode_agreement(self, setup):
        """Pre-top-k decoder outputs agree at the f32 noise floor: final
        -layer boxes <0.1 px (in canvas units), sigmoid scores <5e-3 —
        the sub-mAP drift guard (VERDICT r4 item 7)."""
        _, _, _, _, state, tm, fm, images = setup
        apply = jax.jit(lambda v, x: fm.apply(v, x, train=False))
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        for img in images[:3]:
            canvas, _ = tv.letterbox_np(img, self.IMGSZ)
            x_t = torch.from_numpy(canvas.astype(np.float32)
                                   .transpose(2, 0, 1)[None]) / 255.0
            with torch.no_grad():
                _, _, dec_logits, dec_boxes = tm(x_t)
            outs = apply(variables,
                         jnp.asarray(canvas[None], jnp.float32) / 255.0)
            fb = np.asarray(outs["boxes"][-1][0]) * self.IMGSZ   # px
            tb = dec_boxes[-1][0].numpy() * self.IMGSZ
            fs = np.asarray(jax.nn.sigmoid(outs["logits"][-1][0]))
            ts = dec_logits[-1][0].sigmoid().numpy()
            # per-QUERY agreement: the encoder's top-Q proposal selection
            # has near-tie scores whose f32 reorder swaps a few query
            # slots wholesale (measured ~1% of rows); a systematic decode
            # /rescale drift moves EVERY row, so require 97% of queries at
            # the noise floor instead of all of them.
            row_ok = ((np.abs(fb - tb).max(-1) < 0.1)
                      & (np.abs(fs - ts).max(-1) < 5e-3))
            assert row_ok.mean() > 0.97, (
                row_ok.mean(), np.abs(fb - tb).max())


class TestFrcnnProtocol:
    """FRCNN at torchvision-native bucketed resolution (min128/max256
    scaled-down analog of the reference's min800/max1333; eval_all.py:103).

    Image sizes are chosen so every per-image target is already 32-aligned
    (no padding): the oracle pads to 32-divisible and the bucketed eval to
    bucket_mult-aligned canvases, so pad-free targets make the two
    canvases identical and isolate protocol semantics from pad-geometry
    choices. 6 images -> 3 buckets (3 compiles).
    """
    MIN_SIDE, MAX_SIDE = 128.0, 256.0

    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        from tests._torch_frcnn import FasterRCNN
        from robust_object_detection_tpu.models import frcnn as F
        from robust_object_detection_tpu.train import frcnn as TF
        from robust_object_detection_tpu.eval.detector_eval import (
            BucketedPredict)

        tm = liven(FasterRCNN(num_classes=7))
        images = make_images(seed=23, sizes=(
            (256, 320), (128, 160), (320, 256), (640, 512),
            (256, 256), (384, 384)))
        # eval-mode BN with liven()'s random running stats explodes through
        # the 50-layer residual stack (O(1e4) activations saturate every
        # head). Calibrate the stats during a REAL val run — the box-head
        # BNs must see true pooled-feature statistics, not randn proxies
        # (randn-calibrated box heads emit huge deltas that collapse a
        # third of the boxes to sub-2px slivers).
        calibrate_bn(tm, lambda: tv.frcnn_val(tm, images[:2],
                                              self.MIN_SIDE, self.MAX_SIDE))
        with torch.no_grad():
            # boxes must stay near anchors/proposals: at He scale the
            # decode's exp(clip 4.135) blows every box up to the image
            tm.rpn.head.bbox_pred.weight *= 0.05
            tm.rpn.head.bbox_pred.bias.zero_()
            tm.roi_heads.box_predictor.bbox_pred.weight *= 0.05
            tm.roi_heads.box_predictor.bbox_pred.bias.zero_()
        # gain 0.3 spreads softmax scores over ~[0.25, 1.0]: a junk band
        # below GT_CONF exists (the 0.05 score-threshold stage and the
        # GT_CONF boundary are both exercised) without saturating ranks
        sharpen_head([tm.roi_heads.box_predictor.cls_score],
                     gain=0.3, bias=0.0)
        torch_dets = tv.frcnn_val(tm, images, self.MIN_SIDE, self.MAX_SIDE)
        gt = derive_gt(torch_dets)
        assert sum(len(g[0]) for g in gt.values()) >= 20
        root = write_testset(tmp_path_factory.mktemp("frcnn_ts"), images,
                             gt)

        fm = F.FasterRCNN(F.FrcnnConfig())
        init = jax.jit(lambda k, x: fm.init(k, x, train=False))
        fv = init(jax.random.key(0), np.zeros((1, 64, 64, 3), np.float32))
        fv2, report = pretrained.import_frcnn(
            {k: v.numpy() for k, v in tm.state_dict_torchvision().items()},
            fv)
        assert not report.skipped
        state = TF.FrcnnTrainState(
            params=fv2["params"], batch_stats=fv2["batch_stats"],
            opt_state=(), step=jnp.asarray(0))
        predict = BucketedPredict(
            lambda bucket: jax.jit(TF.make_predict_step(fm, bucket)),
            min_side=self.MIN_SIDE, max_side=self.MAX_SIDE, bucket_mult=32)
        return torch_dets, gt, root, predict, state

    def test_map_parity(self, setup):
        torch_dets, gt, root, predict, state = setup
        res_t = score_torch(torch_dets, gt)
        res_f = run_flax_eval(predict, state, root, None)
        assert res_t["mAP50"] > 0.85, res_t
        assert abs(res_t["mAP50"] - res_f["mAP50"]) < 0.06, (res_t, res_f)

    def test_detection_agreement(self, setup):
        torch_dets, gt, root, predict, state = setup
        flax_dets = run_flax_eval(predict, state, root, None, collect=True)
        frac, tot = detection_agreement(torch_dets, flax_dets)
        assert tot >= 20
        assert frac > 0.8, (frac, tot)
