"""Box utilities: format conversion, clipping, IoU — batched and jit-safe.

The reference delegates box math to torchvision/Ultralytics internals and
converts formats in its converters (xywh->xyxy at coco_detection_dataset.py:37,
YOLO normalised cxcywh at convert_visdrone_to_yolo.py:107-119). Here they are
first-class vectorised ops shared by models, NMS, assigners and the scorer.

Conventions: boxes are float32 arrays (..., 4); xyxy unless suffixed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xywh_to_xyxy(b: jax.Array) -> jax.Array:
    x, y, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def xyxy_to_xywh(b: jax.Array) -> jax.Array:
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def cxcywh_to_xyxy(b: jax.Array) -> jax.Array:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                           axis=-1)


def xyxy_to_cxcywh(b: jax.Array) -> jax.Array:
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1],
                           axis=-1)


def clip_to_image(b: jax.Array, h: float, w: float) -> jax.Array:
    """Clamp xyxy boxes into [0,w]x[0,h] (reference clamp:
    convert_visdrone_to_coco.py:64-77)."""
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([
        jnp.clip(x1, 0, w), jnp.clip(y1, 0, h),
        jnp.clip(x2, 0, w), jnp.clip(y2, 0, h)], axis=-1)


def area(b: jax.Array) -> jax.Array:
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.maximum(x2 - x1, 0)[..., 0] * jnp.maximum(y2 - y1, 0)[..., 0]


def pairwise_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """IoU matrix between (..., M, 4) and (..., N, 4) xyxy -> (..., M, N).

    Computed component-wise: a fused (M, N, 2) intermediate would get its
    trailing dim of 2 padded to 128 lanes by TPU tiling — a 64x memory
    expansion (observed: 15 GB for a (3960, 3960, 2) temp). Keeping every
    intermediate at (M, N) makes the op HBM-exact.
    """
    ax1, ay1, ax2, ay2 = (a[..., :, None, i] for i in range(4))
    bx1, by1, bx2, by2 = (b[..., None, :, i] for i in range(4))
    iw = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    ih = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = iw * ih
    union = area(a)[..., :, None] + area(b)[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def pairwise_iou_xywh_coco(a: jax.Array, b: jax.Array,
                           b_iscrowd: jax.Array | None = None) -> jax.Array:
    """COCO-convention IoU on xywh boxes (pycocotools maskUtils.iou): for
    crowd GT the denominator is the detection area only."""
    ax = xywh_to_xyxy(a)
    bx = xywh_to_xyxy(b)
    ax1, ay1, ax2, ay2 = (ax[..., :, None, i] for i in range(4))
    bx1, by1, bx2, by2 = (bx[..., None, :, i] for i in range(4))
    iw = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    ih = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = iw * ih
    area_a = (a[..., 2] * a[..., 3])[..., :, None]
    area_b = (b[..., 2] * b[..., 3])[..., None, :]
    union = area_a + area_b - inter
    if b_iscrowd is not None:
        union = jnp.where(b_iscrowd[..., None, :], area_a + 0 * area_b, union)
    return inter / jnp.maximum(union, 1e-9)


def pairwise_giou(a: jax.Array, b: jax.Array) -> jax.Array:
    """GIoU matrix between (..., M, 4) and (..., N, 4) xyxy -> (..., M, N).

    Component-wise like pairwise_iou: broadcasting the elementwise giou()
    to (M, N) shapes routes every min/max through (M, N, 2) intermediates,
    which TPU tiling pads 2 -> 128 lanes (64x HBM). All intermediates
    here stay (M, N)."""
    ax1, ay1, ax2, ay2 = (a[..., :, None, i] for i in range(4))
    bx1, by1, bx2, by2 = (b[..., None, :, i] for i in range(4))
    iw = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    ih = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = iw * ih
    union = area(a)[..., :, None] + area(b)[..., None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)
    ew = jnp.maximum(bx2, ax2) - jnp.minimum(bx1, ax1)
    eh = jnp.maximum(by2, ay2) - jnp.minimum(by1, ay1)
    earea = jnp.maximum(ew, 0.0) * jnp.maximum(eh, 0.0)
    return iou - (earea - union) / jnp.maximum(earea, 1e-9)


def pairwise_ciou(a: jax.Array, b: jax.Array, eps: float = 1e-7) -> jax.Array:
    """CIoU matrix between (..., M, 4) and (..., N, 4) xyxy -> (..., M, N).

    Ultralytics ``bbox_iou(CIoU=True)`` semantics (the TAL assigner's
    overlap metric since v8): iou − centre-distance/enclosing-diagonal −
    α·v aspect term, with α = v/(v − iou + 1 + eps) under stop_gradient.
    Component-wise like pairwise_iou — every intermediate stays (M, N) so
    TPU tiling never pads a trailing short dim to 128 lanes. The aspect
    angles are per-box (M,)/(N,) and broadcast, so v costs one subtraction
    pass, not a pairwise atan.
    """
    ax1, ay1, ax2, ay2 = (a[..., :, None, i] for i in range(4))
    bx1, by1, bx2, by2 = (b[..., None, :, i] for i in range(4))
    iw = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    ih = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = iw * ih
    union = area(a)[..., :, None] + area(b)[..., None, :] - inter + eps
    iou = inter / union

    cw = jnp.maximum(bx2, ax2) - jnp.minimum(bx1, ax1)
    ch = jnp.maximum(by2, ay2) - jnp.minimum(by1, ay1)
    c2 = cw * cw + ch * ch + eps
    # centre distance via the (x1+x2) sums — one pairwise subtract per axis
    rho2 = (((bx1 + bx2) - (ax1 + ax2)) ** 2
            + ((by1 + by2) - (ay1 + ay2)) ** 2) / 4.0

    ang_a = jnp.arctan((a[..., 2] - a[..., 0])
                       / (a[..., 3] - a[..., 1] + eps))        # (..., M)
    ang_b = jnp.arctan((b[..., 2] - b[..., 0])
                       / (b[..., 3] - b[..., 1] + eps))        # (..., N)
    v = (4 / jnp.pi ** 2) * (ang_b[..., None, :] - ang_a[..., :, None]) ** 2
    alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
    return iou - (rho2 / c2 + v * alpha)


def iou_elementwise(a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise IoU between aligned (..., 4) xyxy boxes."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(a) + area(b) - inter
    return inter / jnp.maximum(union, 1e-9)


def giou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise generalised IoU between aligned (..., 4) xyxy boxes."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(a) + area(b) - inter
    iou = inter / jnp.maximum(union, 1e-9)
    # smallest enclosing box
    elt = jnp.minimum(a[..., :2], b[..., :2])
    erb = jnp.maximum(a[..., 2:], b[..., 2:])
    ewh = jnp.maximum(erb - elt, 0.0)
    earea = ewh[..., 0] * ewh[..., 1]
    return iou - (earea - union) / jnp.maximum(earea, 1e-9)


def ciou(a: jax.Array, b: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Elementwise complete IoU (used by YOLOv8's box loss)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(a) + area(b) - inter
    iou = inter / (union + eps)

    # enclosing box diagonal
    elt = jnp.minimum(a[..., :2], b[..., :2])
    erb = jnp.maximum(a[..., 2:], b[..., 2:])
    cw = erb[..., 0] - elt[..., 0]
    ch = erb[..., 1] - elt[..., 1]
    c2 = cw * cw + ch * ch + eps

    # centre distance
    acx = (a[..., 0] + a[..., 2]) / 2
    acy = (a[..., 1] + a[..., 3]) / 2
    bcx = (b[..., 0] + b[..., 2]) / 2
    bcy = (b[..., 1] + b[..., 3]) / 2
    rho2 = (acx - bcx) ** 2 + (acy - bcy) ** 2

    # aspect-ratio term
    aw = a[..., 2] - a[..., 0]
    ah = a[..., 3] - a[..., 1]
    bw = b[..., 2] - b[..., 0]
    bh = b[..., 3] - b[..., 1]
    v = (4 / jnp.pi ** 2) * (jnp.arctan(bw / (bh + eps))
                             - jnp.arctan(aw / (ah + eps))) ** 2
    alpha = v / jnp.maximum(v - iou + (1 + eps), eps)
    alpha = jax.lax.stop_gradient(alpha)
    return iou - rho2 / c2 - alpha * v
