"""Torch oracles for the three reference training-loss stacks.

The reference trains with (a) Ultralytics v8DetectionLoss — TAL assigner +
CIoU + DFL (train_yolo_augmented.py:27-42 delegates to it), (b) Ultralytics
RT-DETR DETRLoss — Hungarian set matching + VFL/L1/GIoU + CDN
(train_rtdetr_augmented.py:27-42), and (c) torchvision Faster R-CNN RPN/RoI
losses (train_frcnn_baseline.py:171-176 consumes the loss dict). None of
those libraries are installed here, so these are independently written
pure-torch/scipy implementations of the PUBLISHED semantics (ultralytics
8.3 ultralytics/utils/loss.py + utils/tal.py + models/utils/{loss,ops}.py;
torchvision 0.20 models/detection/{rpn.py,roi_heads.py}), used by
tests/test_loss_parity.py to cross-check the JAX trainers' loss stacks:
identical inputs must produce the same per-component loss values.

Everything here intentionally mirrors the torch reference structure
(masked gathers, per-image loops) rather than the JAX implementations'
vectorised forms — a shared bug between the two is what the tests exist
to rule out.
"""

import math

import numpy as np
import torch
import torch.nn.functional as Fn

# ── shared box math (ultralytics utils/metrics.bbox_iou semantics) ──────


def bbox_iou_t(box1, box2, xywh=False, GIoU=False, CIoU=False, eps=1e-7):
    """Elementwise (broadcastable) IoU/GIoU/CIoU, ultralytics bbox_iou."""
    if xywh:
        (x1, y1, w1, h1), (x2, y2, w2, h2) = box1.chunk(4, -1), box2.chunk(4, -1)
        b1x1, b1x2 = x1 - w1 / 2, x1 + w1 / 2
        b1y1, b1y2 = y1 - h1 / 2, y1 + h1 / 2
        b2x1, b2x2 = x2 - w2 / 2, x2 + w2 / 2
        b2y1, b2y2 = y2 - h2 / 2, y2 + h2 / 2
    else:
        b1x1, b1y1, b1x2, b1y2 = box1.chunk(4, -1)
        b2x1, b2y1, b2x2, b2y2 = box2.chunk(4, -1)
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps
    inter = (b1x2.minimum(b2x2) - b1x1.maximum(b2x1)).clamp_(0) * \
            (b1y2.minimum(b2y2) - b1y1.maximum(b2y1)).clamp_(0)
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if CIoU or GIoU:
        cw = b1x2.maximum(b2x2) - b1x1.minimum(b2x1)
        ch = b1y2.maximum(b2y2) - b1y1.minimum(b2y1)
        if CIoU:
            c2 = cw.pow(2) + ch.pow(2) + eps
            rho2 = ((b2x1 + b2x2 - b1x1 - b1x2).pow(2)
                    + (b2y1 + b2y2 - b1y1 - b1y2).pow(2)) / 4
            v = (4 / math.pi ** 2) * \
                ((w2 / h2).atan() - (w1 / h1).atan()).pow(2)
            with torch.no_grad():
                alpha = v / (v - iou + (1 + eps))
            return iou - (rho2 / c2 + v * alpha)
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area
    return iou


# ── (a) Ultralytics v8DetectionLoss: TAL + CIoU + DFL ─────────────────────


def tal_assign_t(pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes,
                 mask_gt, topk=10, alpha=0.5, beta=6.0, eps=1e-9):
    """TaskAlignedAssigner.forward (ultralytics utils/tal.py), faithful.

    pd_scores (B,N,nc) sigmoid probs; pd_bboxes (B,N,4) xyxy; anc_points
    (N,2); gt_labels (B,M) int64; gt_bboxes (B,M,4) xyxy; mask_gt (B,M)
    bool. Returns (target_bboxes (B,N,4), target_scores (B,N,nc),
    fg_mask (B,N) bool).
    """
    bs, n_anchors = pd_scores.shape[:2]
    n_max = gt_bboxes.shape[1]
    # candidates: anchor centre strictly inside gt
    lt = anc_points[None, None] - gt_bboxes[:, :, None, :2]     # (B,M,N,2)
    rb = gt_bboxes[:, :, None, 2:] - anc_points[None, None]
    mask_in_gts = torch.cat([lt, rb], -1).amin(-1).gt_(eps)     # (B,M,N)

    # alignment metric: CIoU-clamped overlaps x class score
    overlaps = bbox_iou_t(gt_bboxes.unsqueeze(2), pd_bboxes.unsqueeze(1),
                          xywh=False, CIoU=True).squeeze(-1).clamp_(0)
    overlaps = overlaps * mask_gt[:, :, None]
    ind0 = torch.arange(bs).view(-1, 1).expand(-1, n_max)
    bbox_scores = pd_scores[ind0, :, gt_labels.clamp(min=0)]    # (B,M,N)
    align_metric = bbox_scores.pow(alpha) * overlaps.pow(beta)
    align_metric = align_metric * mask_in_gts * mask_gt[:, :, None]

    # select_topk_candidates: scatter-count construction (dedups idx-0)
    topk_metrics, topk_idxs = torch.topk(align_metric, topk, dim=-1)
    topk_mask = mask_gt[:, :, None].expand(-1, -1, topk).bool()
    topk_idxs = topk_idxs.masked_fill(~topk_mask, 0)
    count = torch.zeros(align_metric.shape, dtype=torch.int8)
    ones = torch.ones_like(topk_idxs[:, :, :1], dtype=torch.int8)
    for k in range(topk):
        count.scatter_add_(-1, topk_idxs[:, :, k:k + 1], ones)
    count.masked_fill_(count > 1, 0)
    mask_topk = count.to(align_metric.dtype)
    mask_pos = mask_topk * mask_in_gts * mask_gt[:, :, None]

    # select_highest_overlaps: conflicted anchors -> argmax of FULL overlaps
    fg_mask = mask_pos.sum(-2)
    if fg_mask.max() > 1:
        mask_multi = (fg_mask.unsqueeze(1) > 1).expand(-1, n_max, -1)
        max_idx = overlaps.argmax(1)                            # (B,N)
        is_max = Fn.one_hot(max_idx, n_max).permute(0, 2, 1)
        mask_pos = torch.where(mask_multi, is_max.to(mask_pos.dtype),
                               mask_pos)
        fg_mask = mask_pos.sum(-2)
    target_gt_idx = mask_pos.argmax(-2)                          # (B,N)

    # get_targets
    batch_ind = torch.arange(bs).view(-1, 1)
    flat_idx = target_gt_idx + batch_ind * n_max
    target_labels = gt_labels.clamp(min=0).flatten()[flat_idx]
    target_bboxes = gt_bboxes.reshape(-1, 4)[flat_idx]
    nc = pd_scores.shape[-1]
    target_scores = Fn.one_hot(target_labels, nc).float()
    target_scores = torch.where((fg_mask > 0)[..., None].expand_as(
        target_scores).bool(), target_scores, 0.0)

    # normalise by per-gt max metric / max overlap
    align_metric = align_metric * mask_pos
    pos_align = align_metric.amax(dim=-1, keepdim=True)          # (B,M,1)
    pos_overlaps = (overlaps * mask_pos).amax(dim=-1, keepdim=True)
    norm = (align_metric * pos_overlaps / (pos_align + eps)
            ).amax(-2).unsqueeze(-1)                             # (B,N,1)
    return target_bboxes, target_scores * norm, fg_mask.bool()


def _df_loss_t(pred_dist, target):
    """utils/loss.BboxLoss._df_loss: CE to the two bracketing integer bins,
    mean over the 4 box sides. pred_dist (K,4,R) logits, target (K,4)."""
    tl = target.long()
    tr = tl + 1
    wl = tr - target
    wr = 1 - wl
    r = pred_dist.shape[-1]
    lp = pred_dist.reshape(-1, r)
    ce_l = Fn.cross_entropy(lp, tl.reshape(-1), reduction="none"
                            ).reshape(tl.shape)
    ce_r = Fn.cross_entropy(lp, tr.clamp(max=r - 1).reshape(-1),
                            reduction="none").reshape(tl.shape)
    return (ce_l * wl + ce_r * wr).mean(-1, keepdim=True)        # (K,1)


def v8_detection_loss_t(box_logits, cls_logits, anc_points, strides,
                        gt_bboxes, gt_classes, topk=10):
    """v8DetectionLoss.__call__ per-component losses (unweighted).

    box_logits (B,N,4,R) DFL logits; cls_logits (B,N,nc); anc_points (N,2)
    grid units (+0.5); strides (N,); gt_bboxes (B,M,4) xyxy PIXELS;
    gt_classes (B,M) int64 with -1 pads.
    Returns dict(box, cls, dfl) — multiply by (7.5, 0.5, 1.5) and
    loss.sum()*batch_size for the ultralytics total.
    """
    b, n, _, reg_max = box_logits.shape
    strides = strides[:, None]                                   # (N,1)
    pred_scores = cls_logits.sigmoid()
    # bbox_decode: DFL expectation -> ltrb in grid units -> xyxy grid units
    d = box_logits.softmax(-1) @ torch.arange(reg_max).float()   # (B,N,4)
    pred_bboxes = torch.cat([anc_points - d[..., :2],
                             anc_points + d[..., 2:]], -1)       # grid units
    mask_gt = (gt_classes >= 0)
    gt_px = torch.where(mask_gt[..., None], gt_bboxes, torch.zeros(()))

    target_bboxes, target_scores, fg_mask = tal_assign_t(
        pred_scores.detach(), (pred_bboxes.detach() * strides),
        anc_points * strides, gt_classes.long(), gt_px, mask_gt, topk=topk)

    tss = max(target_scores.sum().item(), 1.0)
    loss_cls = Fn.binary_cross_entropy_with_logits(
        cls_logits, target_scores, reduction="none").sum() / tss

    target_bboxes = target_bboxes / strides                      # grid units
    loss_box = torch.zeros(())
    loss_dfl = torch.zeros(())
    if fg_mask.any():
        weight = target_scores.sum(-1)[fg_mask].unsqueeze(-1)
        iou = bbox_iou_t(pred_bboxes[fg_mask], target_bboxes[fg_mask],
                         xywh=False, CIoU=True)
        loss_box = ((1.0 - iou) * weight).sum() / tss
        # bbox2dist, clamped to reg_max - 1 - 0.01
        t_ltrb = torch.cat([anc_points[None] - target_bboxes[..., :2],
                            target_bboxes[..., 2:] - anc_points[None]],
                           -1).clamp_(0, reg_max - 1 - 0.01)
        loss_dfl = (_df_loss_t(box_logits[fg_mask], t_ltrb[fg_mask])
                    * weight).sum() / tss
    return {"box": loss_box, "cls": loss_cls, "dfl": loss_dfl}


# ── (b) Ultralytics RT-DETR DETRLoss: Hungarian + VFL/L1/GIoU ────────────

COST_GAIN = {"class": 2.0, "bbox": 5.0, "giou": 2.0}   # matcher
LOSS_GAIN = {"class": 1.0, "bbox": 5.0, "giou": 2.0}   # loss


def _cxcywh_to_xyxy_t(b):
    return torch.cat([b[..., :2] - b[..., 2:] / 2,
                      b[..., :2] + b[..., 2:] / 2], -1)


def hungarian_match_t(logits, boxes, gt_boxes, gt_classes,
                      alpha=0.25, gamma=2.0):
    """HungarianMatcher.forward (models/utils/ops.py) per image via scipy.

    logits (B,Q,nc); boxes (B,Q,4) norm cxcywh; gt_* padded with -1 class.
    Returns list of (query_idx, gt_idx) LongTensor pairs per image.
    """
    from scipy.optimize import linear_sum_assignment
    out = []
    for bi in range(logits.shape[0]):
        valid = gt_classes[bi] >= 0
        gtb = gt_boxes[bi][valid]
        gtc = gt_classes[bi][valid].long()
        if gtb.numel() == 0:
            out.append((torch.zeros(0, dtype=torch.long),
                        torch.zeros(0, dtype=torch.long)))
            continue
        p = logits[bi].sigmoid()                                 # (Q,nc)
        neg = (1 - alpha) * p ** gamma * (-(1 - p + 1e-8).log())
        pos = alpha * (1 - p) ** gamma * (-(p + 1e-8).log())
        cost_class = (pos - neg)[:, gtc]                         # (Q,G)
        cost_bbox = (boxes[bi].unsqueeze(1) - gtb.unsqueeze(0)
                     ).abs().sum(-1)
        cost_giou = 1.0 - bbox_iou_t(boxes[bi].unsqueeze(1),
                                     gtb.unsqueeze(0), xywh=True,
                                     GIoU=True).squeeze(-1)
        c = (COST_GAIN["class"] * cost_class
             + COST_GAIN["bbox"] * cost_bbox
             + COST_GAIN["giou"] * cost_giou)
        qi, gi = linear_sum_assignment(c.detach().numpy())
        out.append((torch.from_numpy(qi), torch.from_numpy(gi)))
    return out


def _vfl_t(pred_logits, gt_score, label, alpha=0.75, gamma=2.0):
    """VarifocalLoss.forward: .mean(1).sum() over (B,Q,C)."""
    weight = (alpha * pred_logits.sigmoid().pow(gamma) * (1 - label)
              + gt_score * label)
    return (Fn.binary_cross_entropy_with_logits(
        pred_logits, gt_score, reduction="none") * weight).mean(1).sum()


def detr_layer_loss_t(logits, boxes, gt_boxes, gt_classes,
                      match_indices=None):
    """DETRLoss._get_loss for ONE decoder layer (models/utils/loss.py).

    logits (B,Q,nc); boxes (B,Q,4) norm cxcywh; gt padded class -1.
    match_indices: known (query_idx, gt_idx) pairs per image (the CDN
    path, get_dn_match_indices); None -> Hungarian.
    Returns dict(cls, bbox, giou) with loss gains applied.
    """
    bs, nq, nc = logits.shape
    if match_indices is None:
        match_indices = hungarian_match_t(logits.detach(), boxes.detach(),
                                          gt_boxes, gt_classes)
    num_gts = max(sum(int((gt_classes[b] >= 0).sum())
                      for b in range(bs)), 1)

    # assemble targets: class nc = background
    targets = torch.full((bs, nq), nc, dtype=torch.long)
    gt_scores = torch.zeros(bs, nq)
    pb, gb = [], []
    for b, (qi, gi) in enumerate(match_indices):
        vc = gt_classes[b].long().clamp(min=0)
        targets[b, qi] = vc[gi]
        pred_m = boxes[b, qi]
        gt_m = gt_boxes[b, gi]
        if len(qi):
            gt_scores[b, qi] = bbox_iou_t(pred_m.detach(), gt_m,
                                          xywh=True).squeeze(-1)
        pb.append(pred_m)
        gb.append(gt_m)
    pred_b = torch.cat(pb, 0)
    gt_b = torch.cat(gb, 0)

    one_hot = Fn.one_hot(targets, nc + 1)[..., :-1].float()      # (B,Q,nc)
    gt_sc = gt_scores.unsqueeze(-1) * one_hot
    loss_cls = (_vfl_t(logits, gt_sc, one_hot) / max(num_gts, 1)
                * LOSS_GAIN["class"])
    if len(pred_b) == 0:
        return {"cls": loss_cls, "bbox": torch.zeros(()),
                "giou": torch.zeros(())}
    loss_bbox = (LOSS_GAIN["bbox"]
                 * Fn.l1_loss(pred_b, gt_b, reduction="sum") / num_gts)
    loss_giou = (1.0 - bbox_iou_t(pred_b, gt_b, xywh=True,
                                  GIoU=True).squeeze(-1)).sum() / num_gts
    return {"cls": loss_cls, "bbox": loss_bbox,
            "giou": loss_giou * LOSS_GAIN["giou"]}


# ── (c) torchvision Faster R-CNN RPN / RoI losses ─────────────────────────


def tv_match_t(iou, high, low, allow_low_quality):
    """torchvision Matcher.__call__ on one image's (M_gt, A) IoU matrix.

    Returns matches (A,) int64: gt index, -1 below-low, -2 between (per
    torchvision BELOW_LOW_THRESHOLD/BETWEEN_THRESHOLDS).
    """
    matched_vals, matches = iou.max(0)
    all_matches = matches.clone()
    matches[matched_vals < low] = -1
    matches[(matched_vals >= low) & (matched_vals < high)] = -2
    if allow_low_quality:
        # set_low_quality_matches_: every anchor achieving some gt's max
        # IoU gets its PRE-THRESHOLD match restored (the anchor's own
        # argmax gt — not necessarily the gt whose best it is)
        highest_per_gt = iou.max(1).values
        gt_pred = torch.where(iou == highest_per_gt[:, None])
        matches[gt_pred[1]] = all_matches[gt_pred[1]]
    return matches


def encode_deltas_t(ref, gt, weights):
    rw = ref[:, 2] - ref[:, 0]
    rh = ref[:, 3] - ref[:, 1]
    rx = ref[:, 0] + rw / 2
    ry = ref[:, 1] + rh / 2
    gw = gt[:, 2] - gt[:, 0]
    gh = gt[:, 3] - gt[:, 1]
    gx = gt[:, 0] + gw / 2
    gy = gt[:, 1] + gh / 2
    wx, wy, ww, wh = weights
    return torch.stack([wx * (gx - rx) / rw, wy * (gy - ry) / rh,
                        ww * (gw / rw).log(), wh * (gh / rh).log()], 1)


def rpn_loss_t(objectness, pred_deltas, anchors, gt_boxes, gt_classes):
    """torchvision rpn.RegionProposalNetwork.compute_loss with sampling
    disabled (batch_size_per_image = inf: every non-ignored anchor kept) —
    the JAX side is compared under the same everything-sampled config.

    objectness (B,A); pred_deltas (B,A,4); anchors (A,4); gt padded -1.
    Returns dict(rpn_obj, rpn_box).
    """
    from robust_object_detection_tpu.ops import boxes  # noqa: F401  (doc)
    labels_all, targets_all = [], []
    for b in range(gt_boxes.shape[0]):
        valid = gt_classes[b] >= 0
        gtb = gt_boxes[b][valid]
        if len(gtb) == 0:
            labels = torch.zeros(anchors.shape[0])
            tgt = torch.zeros_like(anchors)
        else:
            iou = pairwise_iou_t(gtb, anchors)                  # (M,A)
            matches = tv_match_t(iou, 0.7, 0.3, allow_low_quality=True)
            labels = (matches >= 0).float()
            labels[matches == -2] = -1.0                        # ignore
            tgt = encode_deltas_t(anchors, gtb[matches.clamp(min=0)],
                                  (1.0, 1.0, 1.0, 1.0))
        labels_all.append(labels)
        targets_all.append(tgt)
    labels = torch.stack(labels_all)                             # (B,A)
    targets = torch.stack(targets_all)
    sampled = labels >= 0
    pos = labels > 0
    n = sampled.sum()
    box_l = Fn.smooth_l1_loss(pred_deltas[pos], targets[pos],
                              beta=1 / 9, reduction="sum") / n
    obj_l = Fn.binary_cross_entropy_with_logits(objectness[sampled],
                                                labels[sampled])
    return {"rpn_obj": obj_l, "rpn_box": box_l}


def pairwise_iou_t(a, b):
    """(M,4) x (N,4) xyxy -> (M,N) plain IoU (torchvision box_iou)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def roi_loss_t(proposals, gt_boxes, gt_classes, score_fn, delta_fn):
    """torchvision RoIHeads: select_training_samples (sampling disabled:
    every candidate kept) + fastrcnn_loss.

    proposals (B,P,4); gt padded class -1 (0-based fg classes — +1 applied
    here to get the 1..K convention, bg=0). score_fn/delta_fn map the
    (B, P+M, 4) candidate rois to (B, C, K+1) logits / (B, C, K+1, 4)
    per-class deltas (stand-ins for the box head so the oracle tests pure
    loss semantics). Returns dict(head_cls, head_box).
    """
    b = proposals.shape[0]
    labels_all, targets_all, rois_all = [], [], []
    for bi in range(b):
        valid = gt_classes[bi] >= 0
        gtb = gt_boxes[bi][valid]                    # list-style: only the
        gtc = gt_classes[bi][valid].long() + 1       # real gts get appended
        cand = torch.cat([proposals[bi], gtb], 0)    # (P + G_i, 4)
        if len(gtb) == 0:
            labels = torch.zeros(cand.shape[0], dtype=torch.long)
            tgt = torch.zeros(cand.shape[0], 4)
        else:
            iou = pairwise_iou_t(gtb, cand)
            matches = tv_match_t(iou, 0.5, 0.5, allow_low_quality=False)
            labels = gtc[matches.clamp(min=0)]
            labels[matches < 0] = 0                              # background
            tgt = encode_deltas_t(cand, gtb[matches.clamp(min=0)],
                                  (10.0, 10.0, 5.0, 5.0))
        labels_all.append(labels)
        targets_all.append(tgt)
        rois_all.append(cand)
    flat_lab = torch.cat(labels_all)                 # (sum_i P+G_i,)
    targets = torch.cat(targets_all)
    rois = torch.cat(rois_all)
    scores = score_fn(rois)
    deltas = delta_fn(rois)

    cls_l = Fn.cross_entropy(scores, flat_lab)
    pos = torch.where(flat_lab > 0)[0]
    sel = deltas[pos, flat_lab[pos]]
    box_l = Fn.smooth_l1_loss(sel, targets[pos],
                              beta=1 / 9, reduction="sum") / flat_lab.numel()
    return {"head_cls": cls_l, "head_box": box_l}
