"""Batched class-aware NMS with static shapes.

The reference gets NMS from torchvision (inside Faster R-CNN's RoI heads) and
Ultralytics' `non_max_suppression` — both CUDA kernels over variable-length
tensors. On TPU, everything is fixed capacity: callers pre-select the top
`num_candidates` scoring boxes, NMS greedily suppresses within that set, and
the result is always `max_outputs` slots with a validity mask.

Greedy exactness: this computes the same keep-set as the sequential
torchvision/Ultralytics algorithm (scores sorted desc; a box is kept iff it
is not suppressed by any *kept* earlier box), implemented as a
`max_outputs`-step scan: pick the max-score live box, emit it, kill every
live box it overlaps. Each step is a handful of (B, K) vector ops.

The r2 implementation built the (K, K) IoU matrix and swept it with a
K-step fori loop; at eval shapes (K=4096, B=8) the matrix tensors are
134 MB each, vmap pushed the batch dim into the 128-lane minor position
(16x tile waste), and the sweep ran K sequential steps — 216 ms of a
889 ms fused-sweep batch on v5e. The scan form runs max_outputs (300)
steps over (B, K) rows instead: no quadratic tensor, batch-major tiles,
13x fewer iterations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Class-aware NMS offset: boxes of different classes never overlap once each
# class is translated to its own region (the torchvision batched_nms trick).
_CLASS_OFFSET = 8192.0


def _nms_core(boxes: jax.Array, scores: jax.Array, classes: jax.Array,
              max_outputs: int, iou_thresh: float, class_aware: bool):
    """Greedy NMS over (B, K) candidates -> (B, max_outputs) picks.

    Padding slots carry score <= 0 and are never picked as valid.
    """
    b_, k = scores.shape
    nb = boxes + (classes[..., None].astype(jnp.float32) * _CLASS_OFFSET
                  if class_aware else 0.0)
    x1, y1, x2, y2 = (nb[..., i] for i in range(4))            # (B, K)
    area = (x2 - x1) * (y2 - y1)
    s_live = jnp.where(scores > 0, scores, -1.0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (b_, k), 1)

    def body(s_live, _):
        si = jnp.max(s_live, axis=1)                           # (B,)
        i = jnp.argmax(s_live, axis=1)                         # (B,)
        oh = iota == i[:, None]                                # (B, K)
        sel = lambda v: jnp.sum(jnp.where(oh, v, 0.0), axis=1,
                                keepdims=True)                 # (B, 1)
        bx1, by1, bx2, by2, ba = sel(x1), sel(y1), sel(x2), sel(y2), sel(area)
        iw = jnp.maximum(jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1), 0.0)
        ih = jnp.maximum(jnp.minimum(by2, y2) - jnp.maximum(by1, y1), 0.0)
        inter = iw * ih
        iou = inter / jnp.maximum(ba + area - inter, 1e-9)
        s_next = jnp.where((iou > iou_thresh) | oh, -1.0, s_live)
        return s_next, (i, si)

    _, (idx, sval) = jax.lax.scan(body, s_live, None, length=max_outputs)
    idx = idx.T                                                # (B, P)
    sval = sval.T
    valid = sval > 0

    # materialise picked rows with one-hot f32 matmuls: generic row gathers
    # serialise on TPU, and a bf16 one-hot would quantise pixel coords
    oh = (idx[..., None] == iota[:, None, :]).astype(jnp.float32)  # (B, P, K)
    ob = jnp.einsum("bpk,bki->bpi", oh, boxes)
    oc = jnp.einsum("bpk,bk->bp", oh, classes.astype(jnp.float32)
                    ).astype(jnp.int32)
    ob = jnp.where(valid[..., None], ob, 0.0)
    os_ = jnp.where(valid, sval, 0.0)
    oc = jnp.where(valid, oc, -1)
    return ob, os_, oc, valid


@functools.partial(jax.jit, static_argnames=("max_outputs", "iou_thresh",
                                             "class_aware"))
def nms(boxes: jax.Array, scores: jax.Array, classes: jax.Array,
        max_outputs: int = 300, iou_thresh: float = 0.7,
        class_aware: bool = True):
    """Single-image NMS over fixed-capacity candidates.

    boxes: (K, 4) xyxy; scores: (K,) with padding slots at score<=0;
    classes: (K,) int32. Returns (boxes, scores, classes, valid) with leading
    dim max_outputs, sorted by descending score.
    """
    ob, os_, oc, ov = _nms_core(boxes[None], scores[None], classes[None],
                                max_outputs, iou_thresh, class_aware)
    return ob[0], os_[0], oc[0], ov[0]


@functools.partial(jax.jit, static_argnames=("num_candidates", "max_outputs",
                                             "iou_thresh", "score_thresh",
                                             "class_aware"))
def batched_nms(boxes: jax.Array, scores: jax.Array, classes: jax.Array,
                num_candidates: int = 1024, max_outputs: int = 300,
                iou_thresh: float = 0.7, score_thresh: float = 0.001,
                class_aware: bool = True):
    """Batched detector post-processing: threshold -> top-k -> greedy NMS.

    boxes: (B, N, 4); scores: (B, N); classes: (B, N).
    Returns (boxes, scores, classes, valid) with shapes (B, max_outputs, ...).
    """
    s = jnp.where(scores > score_thresh, scores, 0.0)
    k = min(num_candidates, s.shape[1])
    top_s, top_i = jax.lax.top_k(s, k)
    top_b = jnp.take_along_axis(boxes, top_i[..., None], axis=1)
    top_c = jnp.take_along_axis(classes, top_i, axis=1)
    return _nms_core(top_b, top_s, top_c, max_outputs, iou_thresh,
                     class_aware)


def multilabel_nms(boxes: jax.Array, scores: jax.Array,
                   num_candidates: int = 30000, max_outputs: int = 300,
                   iou_thresh: float = 0.7, score_thresh: float = 0.001):
    """Multi-label NMS: every (box, class) pair above threshold competes.

    The Ultralytics VAL protocol (DetectionValidator.postprocess ->
    non_max_suppression(multi_label=True), the path eval_all.py:162-192
    runs) emits one candidate per class whose score clears the threshold,
    not just the per-box argmax class. boxes: (B, N, 4); scores: (B, N, C).
    The top-k runs over the flattened (N*C) score plane; boxes are gathered
    once for the k survivors, never materialised N*C wide.

    num_candidates defaults to Ultralytics' max_nms=30000: at the
    production 1024px/6-class shape YOLO emits 21504x6 = 129k candidate
    pairs, and VisDrone scenes are dense enough (hundreds of objects x
    ~10 duplicate anchors each) that a 4096 cap could drop low-score
    candidates contributing to the high-recall mAP tail.
    """
    b, n, c = scores.shape
    # flatten class-major, (B, N, C) -> (B, C, N), so the large dim stays
    # minor and the reshape is layout-free. Measured equal to the
    # single-label path at 16x1024px (56 ms/batch predict+NMS, v5e-1).
    st = jnp.swapaxes(scores, 1, 2)
    s = jnp.where(st > score_thresh, st, 0.0).reshape(b, c * n)
    k = min(num_candidates, n * c)
    top_s, top_i = jax.lax.top_k(s, k)
    box_i = top_i % n
    top_c = (top_i // n).astype(jnp.int32)
    top_b = jnp.take_along_axis(boxes, box_i[..., None], axis=1)
    return _nms_core(top_b, top_s, top_c, max_outputs, iou_thresh,
                     class_aware=True)
