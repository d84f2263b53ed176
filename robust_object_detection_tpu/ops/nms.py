"""Batched class-aware NMS with static shapes.

The reference gets NMS from torchvision (inside Faster R-CNN's RoI heads) and
Ultralytics' `non_max_suppression` — both CUDA kernels over variable-length
tensors. On TPU, everything is fixed capacity: callers pre-select the top
`num_candidates` scoring boxes, NMS greedily suppresses within that set, and
the result is always `max_outputs` slots with a validity mask.

Greedy exactness: this computes the same keep-set as the sequential
torchvision/Ultralytics algorithm (scores sorted desc; a box is kept iff it is
not suppressed by any *kept* earlier box). The O(K^2) IoU matrix is one small
matmul-shaped op; the greedy pass is a `fori_loop` of K cheap vector steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import boxes as box_ops

# Class-aware NMS offset: boxes of different classes never overlap once each
# class is translated to its own region (the torchvision batched_nms trick).
_CLASS_OFFSET = 8192.0


def _greedy_keep(iou: jax.Array, valid: jax.Array, thresh: float) -> jax.Array:
    """Greedy suppression over score-sorted boxes.

    iou: (K, K) IoU matrix of boxes sorted by descending score.
    valid: (K,) bool for real (non-padded) boxes.
    Returns keep: (K,) bool.
    """
    k = iou.shape[0]
    suppress = (iou > thresh) & (
        jax.lax.broadcasted_iota(jnp.int32, iou.shape, 1)
        > jax.lax.broadcasted_iota(jnp.int32, iou.shape, 0))

    def body(i, keep):
        # If box i is kept, it suppresses all later overlapping boxes.
        return keep & ~(suppress[i] & keep[i])

    keep = jax.lax.fori_loop(0, k, body, valid)
    return keep


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
    k = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    s = scores[order]
    c = classes[order]
    valid = s > 0

    nb = b + (c[:, None].astype(jnp.float32) * _CLASS_OFFSET if class_aware
              else 0.0)
    iou = box_ops.pairwise_iou(nb, nb)
    keep = _greedy_keep(iou, valid, iou_thresh)

    # Compact kept boxes to the front, preserving score order:
    # scatter out_idx[slot[i]] = i for kept boxes within capacity; dropped and
    # padded boxes land in an overflow slot that is sliced away.
    rank = jnp.cumsum(keep) - 1                      # position among kept
    slot = jnp.where(keep & (rank < max_outputs), rank, max_outputs)
    out_idx = jnp.full((max_outputs + 1,), k, jnp.int32).at[slot].set(
        jnp.arange(k, dtype=jnp.int32))[:max_outputs]

    gather = jnp.clip(out_idx, 0, k - 1)
    out_valid = out_idx < k
    zeros4 = jnp.zeros((max_outputs, 4), b.dtype)
    ob = jnp.where(out_valid[:, None], b[gather], zeros4)
    os_ = jnp.where(out_valid, s[gather], 0.0)
    oc = jnp.where(out_valid, c[gather], -1)
    return ob, os_, oc, out_valid


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
    return jax.vmap(
        lambda b_, s_, c_: nms(b_, s_, c_, max_outputs, iou_thresh,
                               class_aware))(top_b, top_s, top_c)
