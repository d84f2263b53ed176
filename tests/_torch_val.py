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
