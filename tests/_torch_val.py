"""Independent torch/numpy validation pipelines for protocol-level parity.

The reference evaluates its detectors through full val protocols —
Ultralytics ``model.val`` for YOLO/RT-DETR (eval_all.py:162-192: letterbox
to imgsz, forward, NMS at conf 0.001 / iou 0.7 / max_det 300, rescale to
original pixels) and a torchvision batch-1 loop for FRCNN
(eval_all.py:98-143).  tests/test_protocol_parity.py runs these replicas
and the Flax models (with the SAME weights, moved by models/pretrained)
through both protocol stacks on one synthetic testset and asserts the
resulting mAPs agree — the level where letterbox / decode / NMS / rescale /
scorer drift would show.

Everything here is written independently of the package's JAX ops: cv2
resize for the letterbox (the tool Ultralytics itself letterboxes with),
plain-torch decode, and an O(n^2) sequential greedy NMS oracle.  Geometry
contract: top-left-anchored letterbox with scale = S/max(h, w) — the
repo's documented mAP-invariant variant of Ultralytics' centre-anchored
padding (ops/image.letterbox docstring); everything downstream of the
canvas is reference-faithful.
"""

import numpy as np
import torch

REG_MAX = 16
YOLO_STRIDES = (8, 16, 32)


# ---------------------------------------------------------------------------
# shared protocol pieces


def letterbox_np(img: np.ndarray, size, pad_value: int = 114):
    """uint8 HWC RGB -> (canvas uint8, scale). Independent of data/pipeline."""
    import cv2
    if isinstance(size, int):
        size = (size, size)
    ch, cw = size
    h, w = img.shape[:2]
    scale = min(ch / h, cw / w)
    nh, nw = min(round(h * scale), ch), min(round(w * scale), cw)
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.full((ch, cw, 3), pad_value, np.uint8)
    canvas[:nh, :nw] = resized
    return canvas, float(scale)


def iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) vs (M,4) -> (N,M) IoU, standard xyxy (no +1)."""
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter,
                              1e-12)


def greedy_nms(boxes: np.ndarray, scores: np.ndarray, classes: np.ndarray,
               conf: float = 0.001, iou: float = 0.7, max_det: int = 300):
    """Sequential class-aware greedy NMS (the Ultralytics semantics:
    conf filter -> per-class suppression -> global top-max_det by score).
    Returns (boxes, scores, classes) sorted by score descending."""
    keep_conf = scores > conf
    boxes, scores, classes = boxes[keep_conf], scores[keep_conf], \
        classes[keep_conf]
    order = np.argsort(-scores, kind="stable")
    boxes, scores, classes = boxes[order], scores[order], classes[order]
    kept = []
    for i in range(len(scores)):
        ok = True
        for j in kept:
            if classes[j] == classes[i]:
                if iou_xyxy(boxes[i:i + 1], boxes[j:j + 1])[0, 0] > iou:
                    ok = False
                    break
        if ok:
            kept.append(i)
            if len(kept) >= max_det:
                break
    kept = np.asarray(kept, np.int64)
    return boxes[kept], scores[kept], classes[kept]


def greedy_nms_multilabel(boxes: np.ndarray, scores: np.ndarray,
                          conf: float = 0.001, iou: float = 0.7,
                          max_det: int = 300):
    """Ultralytics val-protocol NMS (non_max_suppression with
    multi_label=True): every (box, class) pair whose score clears `conf`
    is a candidate. boxes (N,4), scores (N,C)."""
    bi, ci = np.nonzero(scores > conf)
    return greedy_nms(boxes[bi], scores[bi, ci], ci,
                      conf=0.0, iou=iou, max_det=max_det)


def scale_back(boxes: np.ndarray, scale: float, w: int, h: int):
    """Canvas xyxy -> original-pixel xywh, clipped (Ultralytics
    ops.scale_boxes + xyxy2xywh result rows, eval protocol)."""
    b = boxes / scale
    b[:, 0::2] = b[:, 0::2].clip(0, w)
    b[:, 1::2] = b[:, 1::2].clip(0, h)
    return np.concatenate([b[:, :2], b[:, 2:] - b[:, :2]], 1)


# ---------------------------------------------------------------------------
# YOLOv8 val protocol


def decode_yolo(raw, imgsz: int):
    """Raw per-level (box_raw, cls_raw) NCHW -> (boxes xyxy px, scores).

    Independent plain-torch transcription of the Ultralytics Detect
    inference decode: DFL softmax-expectation over 16 bins, ltrb offsets
    from cell centres (+0.5), times stride; class scores sigmoid.
    """
    all_boxes, all_scores = [], []
    for (box_raw, cls_raw), stride in zip(raw, YOLO_STRIDES):
        b, _, hh, ww = box_raw.shape
        d = box_raw.reshape(b, 4, REG_MAX, hh * ww).softmax(2)
        proj = torch.arange(REG_MAX, dtype=torch.float32)
        d = (d * proj[None, None, :, None]).sum(2)          # (B,4,HW) ltrb
        ys, xs = torch.meshgrid(torch.arange(hh), torch.arange(ww),
                                indexing="ij")
        cx = (xs.reshape(-1).float() + 0.5)
        cy = (ys.reshape(-1).float() + 0.5)
        x1 = (cx - d[:, 0]) * stride
        y1 = (cy - d[:, 1]) * stride
        x2 = (cx + d[:, 2]) * stride
        y2 = (cy + d[:, 3]) * stride
        all_boxes.append(torch.stack([x1, y1, x2, y2], -1))  # (B,HW,4)
        all_scores.append(
            cls_raw.reshape(b, cls_raw.shape[1], hh * ww)
            .permute(0, 2, 1).sigmoid())
    return torch.cat(all_boxes, 1), torch.cat(all_scores, 1)


def yolo_val(model, images, imgsz: int, conf: float = 0.001,
             iou: float = 0.7, max_det: int = 300):
    """Full torch val pass: list of HWC uint8 RGB -> per-image detections
    dicts {boxes (N,4) original-px xywh, scores, classes (1-based)}."""
    out = []
    for img in images:
        canvas, scale = letterbox_np(img, imgsz)
        x = torch.from_numpy(
            canvas.astype(np.float32).transpose(2, 0, 1)[None]) / 255.0
        with torch.no_grad():
            raw = model(x)
        boxes, scores = decode_yolo(raw, imgsz)
        kb, ks, kc = greedy_nms_multilabel(boxes[0].numpy(),
                                           scores[0].numpy(),
                                           conf, iou, max_det)
        h, w = img.shape[:2]
        out.append({"boxes": scale_back(kb, scale, w, h),
                    "scores": ks, "classes": kc.astype(np.int64) + 1})
    return out


# ---------------------------------------------------------------------------
# RT-DETR val protocol (NMS-free top-300 of Q x nc sigmoid scores)


def rtdetr_val(model, images, imgsz: int, max_det: int = 300):
    """Torch replica val (Ultralytics RTDETRValidator semantics): letterbox,
    forward, per-query max-class sigmoid score, sort descending, cap at
    max_det; boxes cxcywh [0,1] -> original px xywh."""
    out = []
    for img in images:
        canvas, scale = letterbox_np(img, imgsz)
        x = torch.from_numpy(
            canvas.astype(np.float32).transpose(2, 0, 1)[None]) / 255.0
        with torch.no_grad():
            _, _, dec_logits, dec_boxes = model(x)
        logits = dec_logits[-1][0]                      # (Q, nc)
        boxes = dec_boxes[-1][0]                        # (Q, 4) cxcywh
        score, cls = logits.sigmoid().max(-1)
        order = torch.argsort(score, descending=True)[:max_det]
        bsel = boxes[order].numpy()
        cx, cy, bw, bh = bsel.T
        xyxy = np.stack([cx - bw / 2, cy - bh / 2,
                         cx + bw / 2, cy + bh / 2], 1) * imgsz
        h, w = img.shape[:2]
        out.append({"boxes": scale_back(xyxy, scale, w, h),
                    "scores": score[order].numpy(),
                    "classes": cls[order].numpy().astype(np.int64) + 1})
    return out


# ---------------------------------------------------------------------------
# Faster R-CNN val protocol (torchvision GeneralizedRCNN inference,
# eval_all.py:98-143: batch-1, native min800/max1333 resolution)

FRCNN_STRIDES = (4, 8, 16, 32, 64)
FRCNN_SIZES = (32, 64, 128, 256, 512)
FRCNN_RATIOS = (0.5, 1.0, 2.0)
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)
LOG_CLIP = float(np.log(1000.0 / 16.0))


def _tv_anchors(th: int, tw: int):
    """torchvision AnchorGenerator: rounded base corners, corner-aligned
    grid (shift = i*stride), (H, W, A) order per level."""
    out = []
    for size, stride in zip(FRCNN_SIZES, FRCNN_STRIDES):
        nh, nw = -(-th // stride), -(-tw // stride)
        base = []
        for r in FRCNN_RATIOS:
            w = size * np.sqrt(1.0 / r)
            h = size * np.sqrt(r)
            base.append(np.round([-w / 2, -h / 2, w / 2, h / 2]))
        base = np.asarray(base, np.float32)
        cy, cx = np.mgrid[0:nh, 0:nw].astype(np.float32) * stride
        shifts = np.stack([cx, cy, cx, cy], -1)
        out.append((shifts[:, :, None] + base[None, None]).reshape(-1, 4))
    return out


def _decode_deltas_np(deltas, anchors, weights=(1., 1., 1., 1.)):
    wx, wy, ww, wh = weights
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + aw / 2
    ay = anchors[:, 1] + ah / 2
    dx, dy = deltas[..., 0] / wx, deltas[..., 1] / wy
    dw = np.minimum(deltas[..., 2] / ww, LOG_CLIP)
    dh = np.minimum(deltas[..., 3] / wh, LOG_CLIP)
    cx, cy = ax + dx * aw, ay + dy * ah
    w, h = aw * np.exp(dw), ah * np.exp(dh)
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def _clip_np(boxes, h, w):
    boxes[..., 0::2] = boxes[..., 0::2].clip(0, w)
    boxes[..., 1::2] = boxes[..., 1::2].clip(0, h)
    return boxes


def _roi_align_np(feats, boxes, out=7, s=2):
    """Independent multi-scale RoIAlign (torchvision semantics:
    aligned=False plain divide, sampling_ratio=2, edge-clamped bilinear,
    FPN level by floor(4 + log2(sqrt(area)/224))). feats: list of
    (C, H, W) numpy per level P2..P5; boxes (R, 4) image pixels."""
    area = np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * \
        np.clip(boxes[:, 3] - boxes[:, 1], 0, None)
    lvl = np.floor(4 + np.log2(np.sqrt(area) / 224.0 + 1e-6))
    lvl = np.clip(lvl, 2, 5).astype(int) - 2
    c = feats[0].shape[0]
    rois = np.zeros((len(boxes), c, out, out), np.float32)
    for i, (b, l) in enumerate(zip(boxes, lvl)):
        f = feats[l]
        _, fh, fw = f.shape
        stride = FRCNN_STRIDES[l]
        x1, y1, x2, y2 = b / stride
        bw = max(x2 - x1, 1.0) / out
        bh = max(y2 - y1, 1.0) / out
        t = (np.arange(out * s) + 0.5) / s
        sx = np.clip(x1 + t * bw, 0, fw - 1)
        sy = np.clip(y1 + t * bh, 0, fh - 1)
        x0 = np.floor(sx).astype(int)
        y0 = np.floor(sy).astype(int)
        x1i = np.minimum(x0 + 1, fw - 1)
        y1i = np.minimum(y0 + 1, fh - 1)
        fx, fy = sx - x0, sy - y0
        # bilinear taps (T_y, T_x) then 2x2 average per bin
        v = (f[:, y0][:, :, x0] * ((1 - fy)[:, None] * (1 - fx)[None]) +
             f[:, y0][:, :, x1i] * ((1 - fy)[:, None] * fx[None]) +
             f[:, y1i][:, :, x0] * (fy[:, None] * (1 - fx)[None]) +
             f[:, y1i][:, :, x1i] * (fy[:, None] * fx[None]))
        rois[i] = v.reshape(c, out, s, out, s).mean((2, 4))
    return rois


def frcnn_val(model, images, min_side: float, max_side: float,
              pre_nms: int = 1000, post_nms: int = 512,
              score_thresh: float = 0.05, nms_thresh: float = 0.5,
              max_det: int = 100, num_classes: int = 7):
    """Full torch FRCNN val pass at torchvision-native resolution.

    Replicates GeneralizedRCNNTransform (per-image min/max-side scale,
    imagenet normalise, zero-pad), RegionProposalNetwork.filter_proposals
    (per-level pre-NMS top-k, per-LEVEL NMS 0.7, global top post_nms),
    MultiScaleRoIAlign and RoIHeads.postprocess_detections (softmax, drop
    bg, score>0.05, min-size 0.01, class-offset NMS 0.5, top max_det).
    """
    import cv2
    out = []
    for img in images:
        h, w = img.shape[:2]
        scale = min(min_side / min(h, w), max_side / max(h, w))
        th, tw = round(h * scale), round(w * scale)
        # resize on the uint8 image (cv2 bilinear == torch bilinear
        # align_corners=False up to uint8 rounding). torchvision resizes
        # the normalised float tensor instead; the two commute through the
        # affine normalise, but the uint8 round-trip matters for the
        # random-weight parity tests (a 0.5/255 pixel perturbation
        # decoheres scores through 50 livened ReLU layers), so the oracle
        # consumes byte-identical pixels and owns only the geometry,
        # normalisation, and detection protocol.
        resized = cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR)
        ph, pw = -(-th // 32) * 32, -(-tw // 32) * 32
        canvas = np.full((ph, pw, 3),
                         np.round(IMAGENET_MEAN * 255).astype(np.uint8),
                         np.uint8)
        canvas[:th, :tw] = resized
        x = torch.from_numpy(
            canvas.astype(np.float32).transpose(2, 0, 1)[None]) / 255.0
        xp = (x - torch.from_numpy(IMAGENET_MEAN)[None, :, None, None]) \
            / torch.from_numpy(IMAGENET_STD)[None, :, None, None]
        with torch.no_grad():
            pyramid = model.backbone(xp)
            objs, deltas = model.rpn.head(pyramid)
        anchors = _tv_anchors(ph, pw)
        cand_b, cand_s, cand_l = [], [], []
        for li, (o, d, a) in enumerate(zip(objs, deltas, anchors)):
            o = o.permute(0, 2, 3, 1).reshape(-1).numpy()
            d = d[0].reshape(len(FRCNN_RATIOS), 4, *d.shape[2:]) \
                .permute(2, 3, 0, 1).reshape(-1, 4).numpy()
            k = min(pre_nms, len(o))
            top = np.argsort(-o, kind="stable")[:k]
            b = _clip_np(_decode_deltas_np(d[top], a[top]), th, tw)
            ok = ((b[:, 2] - b[:, 0] > 1e-3) & (b[:, 3] - b[:, 1] > 1e-3))
            cand_b.append(b[ok])
            cand_s.append(1 / (1 + np.exp(-o[top][ok].clip(-60, 60))))
            cand_l.append(np.full(ok.sum(), li))
        pb, ps, _ = greedy_nms(np.concatenate(cand_b),
                               np.concatenate(cand_s),
                               np.concatenate(cand_l),
                               conf=0.0, iou=0.7, max_det=post_nms)
        feats = [pyramid[i][0].numpy() for i in range(4)]
        rois = torch.from_numpy(_roi_align_np(feats, pb))
        with torch.no_grad():
            hfeat = model.roi_heads.box_head(rois)
            scores = model.roi_heads.box_predictor.cls_score(hfeat)
            bdeltas = model.roi_heads.box_predictor.bbox_pred(hfeat)
        probs = torch.softmax(scores, -1).numpy()          # (P, K)
        bdeltas = bdeltas.reshape(len(pb), num_classes, 4).numpy()
        all_b, all_s, all_c = [], [], []
        for kcls in range(1, num_classes):
            bk = _clip_np(_decode_deltas_np(
                bdeltas[:, kcls], pb, weights=(10., 10., 5., 5.)), th, tw)
            sk = probs[:, kcls]
            ok = (sk > score_thresh) & (bk[:, 2] - bk[:, 0] > 1e-2) \
                & (bk[:, 3] - bk[:, 1] > 1e-2)
            all_b.append(bk[ok])
            all_s.append(sk[ok])
            all_c.append(np.full(ok.sum(), kcls - 1))      # 0-based fg
        kb, ks, kc = greedy_nms(np.concatenate(all_b),
                                np.concatenate(all_s),
                                np.concatenate(all_c),
                                conf=0.0, iou=nms_thresh, max_det=max_det)
        out.append({"boxes": scale_back(kb, scale, w, h),
                    "scores": ks, "classes": kc.astype(np.int64) + 1})
    return out
