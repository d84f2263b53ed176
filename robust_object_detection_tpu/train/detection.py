"""Detection training core: task-aligned assignment + YOLOv8 losses.

The reference delegates all of this to Ultralytics (SURVEY.md §2.2: "TAL
assigner, box/cls/dfl losses" inside `model.train()`). This is the TPU-native
implementation: fully vectorised over (batch, anchors, gts) with static
shapes — padded GTs (class −1) are masked, never branched on.

Loss recipe (YOLOv8 defaults, mirrored from the reference run configs
`experiments/yolo/baseline_clean/args.yaml`: box=7.5, cls=0.5, dfl=1.5):
  * classification: BCE(pred logits, soft target scores), normalised by the
    total target score,
  * box: (1 − CIoU) weighted by the assigned target score,
  * DFL: cross-entropy of the two integer bins bracketing each target
    distance, same weighting.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models import yolov8 as yolo_lib
from ..ops import boxes as box_ops

INF = 1e9


def _candidates_in_gt(anchors: jax.Array, gt_boxes: jax.Array,
                      eps: float = 1e-9) -> jax.Array:
    """(N,2) anchor centres x (B,M,4) gt -> (B,M,N) bool: centre inside gt."""
    x, y = anchors[:, 0], anchors[:, 1]
    x1, y1, x2, y2 = (gt_boxes[..., 0:1], gt_boxes[..., 1:2],
                      gt_boxes[..., 2:3], gt_boxes[..., 3:4])
    return ((x[None, None] - x1 > eps) & (y[None, None] - y1 > eps) &
            (x2 - x[None, None] > eps) & (y2 - y[None, None] > eps))


def task_aligned_assign(scores: jax.Array, pred_boxes: jax.Array,
                        anchors: jax.Array, gt_boxes: jax.Array,
                        gt_classes: jax.Array, topk: int = 10,
                        alpha: float = 0.5, beta: float = 6.0,
                        exact_topk: bool = False,
                        precise: bool = False) -> Dict[str, jax.Array]:
    """Task-aligned label assignment (TAL), Ultralytics-8.3 semantics.

    scores: (B, N, nc) sigmoid probabilities; pred_boxes: (B, N, 4) xyxy px;
    anchors: (N, 2) pixel centres; gt_boxes: (B, M, 4) xyxy px;
    gt_classes: (B, M) int32 with -1 padding.

    The overlap metric is CIoU clamped to 0 (utils/tal.py
    iou_calculation — NOT plain IoU; CIoU's centre/aspect penalties change
    candidate rankings, verified against the torch oracle in
    tests/test_loss_parity.py). precise=True runs the metric in f32 with
    exact top_k (the oracle-parity configuration); the default keeps the
    production bf16 + approx_max_k ranking (~0.4%-scale metric rounding,
    bounded by the same parity test's loose assertion).

    Returns dict with fg_mask (B,N) bool, target_boxes (B,N,4),
    target_scores (B,N,nc), target_gt (B,N) int32.
    """
    b, n, nc = scores.shape
    m = gt_boxes.shape[1]
    gt_valid = gt_classes >= 0                                   # (B, M)
    gt_cls = jnp.maximum(gt_classes, 0)

    # alignment metric t = s^alpha * ciou^beta per (gt, anchor).
    # The (B, M, N) tensors dominate the step's HBM traffic at
    # (16, 600, 21504); bf16 halves it — TAL is a ranking heuristic, the
    # half-precision ordering is more than enough.
    mdt = jnp.float32 if precise else jnp.bfloat16
    iou = jax.vmap(box_ops.pairwise_ciou)(
        gt_boxes.astype(mdt), pred_boxes.astype(mdt))
    iou = jnp.maximum(iou, 0.0) * gt_valid[..., None]            # (B, M, N)
    cls_score = jnp.take_along_axis(
        jnp.swapaxes(scores, 1, 2),                              # (B, nc, N)
        gt_cls[..., None], axis=1).astype(mdt)                   # (B, M, N)
    s_pow = (jnp.sqrt(jnp.maximum(cls_score, 0)) if alpha == 0.5
             else cls_score ** alpha)
    metric = s_pow * (iou ** beta)

    in_gt = _candidates_in_gt(anchors, gt_boxes)                 # (B, M, N)
    mask = in_gt & gt_valid[..., None]
    metric = jnp.where(mask, metric, 0.0)

    # top-k anchors per gt by metric (static k). Exact top_k sorts all N
    # anchors per gt — 213 ms at (16, 600, 21504) on v5e — while the bucketed
    # approx_max_k is 6.5x faster at recall 0.95+; TAL is a heuristic
    # assigner, so approximate candidate selection is the right trade.
    # Membership is a THRESHOLD against the k-th value, not a scatter:
    # index scatters over (B, M, N) are a TPU anti-pattern, the compare is
    # one fused elementwise pass. (Ties at the threshold may admit a few
    # extra candidates — harmless for a ranking heuristic.)
    k = min(topk, n)
    if exact_topk or precise:
        top_vals, _ = jax.lax.top_k(metric, k)                   # (B, M, k)
    else:
        top_vals, _ = jax.lax.approx_max_k(metric, k)
    kth = top_vals[..., -1:]
    pos = mask & (metric >= kth) & (metric > 0)                  # (B, M, N)

    # The rest of the assigner is organised as THREE fused passes over
    # the (B, M, N) tensors (device-traced: every extra pass here reads
    # 0.4-0.8 GB at (16, 600, 21504), so passes — not FLOPs — are the
    # cost model):
    #   1. conflict resolution: per-anchor argmax of the masked IoU;
    #   2. per-gt reductions: max metric / max IoU among positives;
    #   3. per-anchor reductions: target box/class/score/fg in ONE
    #      masked-sum pass (no gathers — TPU gathers serialise, the
    #      take_along_axis formulation cost 5.5 ms/step).

    # pass 1 — resolve multi-gt anchors, Ultralytics
    # select_highest_overlaps semantics: a CONFLICTED anchor is handed to
    # the gt with the highest overlap over the FULL row (not just among
    # its candidate gts — the torch code argmaxes the unmasked overlaps,
    # so the winner may be a gt that never selected this anchor).
    # Single-candidate anchors keep their gt untouched.
    conflicted = pos.sum(axis=1, keepdims=True) > 1              # (B, 1, N)
    best_gt = jnp.argmax(iou, axis=1)                            # (B, N)
    pos = jnp.where(conflicted,
                    jax.nn.one_hot(best_gt, m, axis=1, dtype=bool), pos)

    # pass 2 — per-gt normalisers among the final positives
    pos_metric = jnp.where(pos, metric, 0.0)
    max_metric = pos_metric.max(axis=2, keepdims=True)           # (B, M, 1)
    max_iou = jnp.where(pos, iou, 0.0).max(axis=2, keepdims=True)
    ratio = max_iou / (max_metric + 1e-9)                        # (B, M, 1)

    # pass 3 — per-anchor selections: after conflict resolution each
    # anchor has at most ONE positive gt, so masked sums over M select
    # exactly (f32, no quantisation). All six outputs fuse into one
    # sweep of the mask.
    def _pick(v):                                     # v: (B, M, [N])
        v = v if v.ndim == 3 else v[..., None]
        return jnp.sum(jnp.where(pos, v, 0.0), axis=1)
    tb = jnp.stack([_pick(gt_boxes[..., c]) for c in range(4)], -1)
    tc = _pick(gt_cls.astype(jnp.float32)).astype(jnp.int32)     # (B, N)
    anchor_score = _pick(pos_metric * ratio).astype(jnp.float32)
    fg_mask = _pick(jnp.ones((b, m, 1))) > 0                     # (B, N)
    target_gt = _pick(jnp.arange(m, dtype=jnp.float32)[None, :, None]
                      ).astype(jnp.int32)
    target_scores = (jax.nn.one_hot(tc, nc) *
                     (anchor_score * fg_mask)[..., None])
    return {"fg_mask": fg_mask,
            "target_boxes": jnp.where(fg_mask[..., None], tb, 0.0),
            "target_scores": target_scores,
            "target_gt": target_gt}


def dfl_loss(box_logits: jax.Array, target_ltrb: jax.Array,
             weight: jax.Array) -> jax.Array:
    """Distribution focal loss.

    box_logits: (B, N, 4, REG_MAX); target_ltrb: (B, N, 4) in stride units,
    clipped to [0, REG_MAX-1-eps]; weight: (B, N) per-anchor weights.
    """
    reg_max = box_logits.shape[-1]
    t = jnp.clip(target_ltrb, 0.0, reg_max - 1 - 0.01)
    tl = jnp.floor(t)
    wl = tl + 1.0 - t
    wr = t - tl
    logp = jax.nn.log_softmax(box_logits, axis=-1)
    # fused bracket weights instead of two take_along_axis gathers (generic
    # gathers over (B, N, 4, R) are slow on TPU; this is one elementwise
    # pass + reduce)
    bins = jax.lax.broadcasted_iota(jnp.float32, logp.shape, logp.ndim - 1)
    w = (wl[..., None] * (bins == tl[..., None]) +
         wr[..., None] * (bins == tl[..., None] + 1.0))
    per_anchor = -(logp * w).sum(-1).mean(axis=-1)               # (B, N)
    return (per_anchor * weight).sum()


@functools.partial(jax.jit, static_argnames=("img_size", "topk", "precise"))
def yolo_loss(outs, gt_boxes: jax.Array, gt_classes: jax.Array,
              img_size: int, box_w: float = 7.5, cls_w: float = 0.5,
              dfl_w: float = 1.5, topk: int = 10,
              precise: bool = False) -> Tuple[jax.Array, Dict]:
    """Full YOLOv8 loss from raw head outputs.

    outs: list of per-level (box_logits, cls_logits); gt_boxes: (B, M, 4)
    xyxy pixels; gt_classes: (B, M) with -1 padding.

    Per-component semantics are cross-checked against an independent torch
    implementation of Ultralytics v8DetectionLoss
    (tests/test_loss_parity.py; precise=True = the f32/exact-topk oracle
    configuration). Weights box/cls/dfl = 7.5/0.5/1.5 are the reference
    run's hyp (experiments/yolo/baseline_clean/args.yaml); Ultralytics
    additionally scales the summed loss by batch_size before backward
    (v8DetectionLoss returns loss.sum()*bs) — a constant gradient scale
    the trainer folds into its lr choice rather than the loss value.
    """
    box_logits, cls_logits = yolo_lib.flatten_outputs(outs)
    anchors_np, strides_np = yolo_lib.anchor_points(img_size)
    anchors = jnp.asarray(anchors_np)
    strides = jnp.asarray(strides_np)[:, None]
    anchors_px = anchors * strides

    d = yolo_lib.dfl_expectation(box_logits)
    pred_boxes = jnp.concatenate(
        [(anchors - d[..., :2]) * strides, (anchors + d[..., 2:]) * strides],
        -1)
    scores = jax.nn.sigmoid(cls_logits)

    assign = task_aligned_assign(
        jax.lax.stop_gradient(scores), jax.lax.stop_gradient(pred_boxes),
        anchors_px, gt_boxes, gt_classes, topk=topk, precise=precise)
    ts = assign["target_scores"]
    fg = assign["fg_mask"]
    tsum = jnp.maximum(ts.sum(), 1.0)

    # cls: BCE over all anchors
    cls_loss = optax_bce(cls_logits, ts).sum() / tsum

    # box: CIoU on foreground, weighted by target score
    w = ts.sum(-1) * fg                                          # (B, N)
    ciou = box_ops.ciou(pred_boxes, assign["target_boxes"])   # elementwise
    box_loss = ((1.0 - ciou) * w).sum() / tsum

    # dfl: targets as ltrb distances in stride units
    tb = assign["target_boxes"]
    t_ltrb = jnp.concatenate(
        [anchors - tb[..., :2] / strides, tb[..., 2:] / strides - anchors],
        -1)
    dfl = dfl_loss(box_logits, t_ltrb, w) / tsum

    total = box_w * box_loss + cls_w * cls_loss + dfl_w * dfl
    return total, {"box": box_loss, "cls": cls_loss, "dfl": dfl,
                   "num_fg": fg.sum()}


def optax_bce(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Elementwise binary cross-entropy with logits (numerically stable)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
