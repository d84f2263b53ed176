"""Faster R-CNN ResNet-50-FPN-v2 (Flax, NHWC, static shapes).

Reference capability: torchvision's `fasterrcnn_resnet50_fpn_v2` with a
7-class head (bg + 6 VisDrone classes), trained/evaluated by
train_frcnn_baseline.py:139-143 and eval_all.py:79-156. This is the
from-scratch TPU-native equivalent:

  * ResNet-50 + FPN (models/resnet.py, models/fpn.py), P2..P6,
  * RPN with the v2 two-conv head; 3 anchors/location (sizes 32..512 one per
    level, ratios 0.5/1/2),
  * static-shape proposal generation: per-level top-k -> joint NMS into a
    fixed proposal budget with validity mask,
  * RoIAlign (flattened-pyramid gather, models/fpn.py) + v2 box head
    (4 conv + FC 1024) with class-specific box regression,
  * training targets (anchor matching, proposal sampling) as pure functions
    — everything padded, masked, never data-dependently shaped.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from . import fpn as fpn_lib
from . import resnet as resnet_lib
from ..ops import boxes as box_ops
from ..ops import nms as nms_ops

ANCHOR_SIZES = (32, 64, 128, 256, 512)       # one per level P2..P6
ASPECT_RATIOS = (0.5, 1.0, 2.0)
RPN_STRIDES = (4, 8, 16, 32, 64)
NUM_CLASSES = 7                              # bg + 6
# GeneralizedRCNNTransform image_mean/std — torchvision normalises inside
# the detector, so imported checkpoints expect it (the raw [0,1] pixels the
# trainers feed are normalised in extract() when cfg.normalize)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# uint8 letterbox pad matching torchvision's zero-pad of the NORMALISED
# tensor (batch_images pads with 0 == pixel value mean*255)
PAD_RGB = tuple(int(round(m * 255)) for m in IMAGENET_MEAN)


@dataclasses.dataclass(frozen=True)
class FrcnnConfig:
    num_classes: int = NUM_CLASSES
    # proposal budget (static): per-level pre-NMS topk and joint post-NMS
    pre_nms_topk: int = 1000
    num_proposals: int = 512
    rpn_nms_thresh: float = 0.7
    # box head
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    box_detections: int = 100
    # training
    rpn_pos_iou: float = 0.7
    rpn_neg_iou: float = 0.3
    rpn_batch: int = 256
    rpn_pos_frac: float = 0.5
    roi_pos_iou: float = 0.5
    roi_batch: int = 512
    roi_pos_frac: float = 0.25
    # v2 FPN layout (bias-free conv + BN in lateral/post blocks, the
    # torchvision fasterrcnn_resnet50_fpn_v2 layout). False = the classic
    # bias-conv FPN — kept for checkpoints saved before the v2 default
    # flip (round 2); train/frcnn.load_checkpoint auto-detects.
    fpn_norm: bool = True
    # backbone stage depths — (3, 4, 6, 3) is ResNet-50 (the reference's
    # fasterrcnn_resnet50_fpn_v2); smaller tuples give compile-cheap
    # variants for tests and the multichip dryrun (same layer types,
    # sharding layout, and train-step graph shape)
    blocks: tuple = (3, 4, 6, 3)
    # torchvision trainable_backbone_layers (5 = train everything;
    # 3 = torchvision's choice whenever weights are given — the
    # reference's weights="DEFAULT" build freezes conv1/bn1/layer1)
    trainable_layers: int = 5
    # GeneralizedRCNNTransform imagenet normalisation inside the forward
    # (torchvision semantics; imported checkpoints require it). False is
    # for tensor-level parity tests against transform-free replicas.
    normalize: bool = True


# ── Anchors ──────────────────────────────────────────────────────────────
# Canvas size arguments accept an int (square, the training default) or an
# (H, W) tuple — the aspect-bucket eval path runs rectangular canvases
# matching torchvision's GeneralizedRCNNTransform min800/max1333 targets.

def _hw(size) -> Tuple[int, int]:
    return (size, size) if isinstance(size, int) else (size[0], size[1])


def anchor_boxes(img_size) -> np.ndarray:
    """All anchors over P2..P6 for one canvas: (A, 4) xyxy float32."""
    return np.concatenate(_anchors_hw_major(img_size))


def _anchors_hw_major(img_size) -> List[np.ndarray]:
    """Per level, anchors laid out (H*W*A, 4) with A fastest — matching a
    (H, W, A*4) head reshape.

    Exact torchvision AnchorGenerator geometry: base-anchor corners
    ROUNDED to integers and grids CORNER-aligned (shift = i*stride, not
    cell centres). Imported torchvision checkpoints predict RPN deltas
    relative to these anchors — a half-stride centre shift would misplace
    every decoded proposal by 2-32 px (train_frcnn_baseline.py:139 builds
    the stock AnchorGenerator).
    """
    ih, iw = _hw(img_size)
    per_level = []
    for size, stride in zip(ANCHOR_SIZES, RPN_STRIDES):
        # feature grid is ceil(H/stride) (SAME-padded strided convs;
        # torchvision builds anchors from the actual feature sizes too)
        nh, nw = -(-ih // stride), -(-iw // stride)
        cy, cx = np.mgrid[0:nh, 0:nw].astype(np.float32) * stride
        base = np.round(np.stack(
            [np.asarray([-size * np.sqrt(1.0 / r) / 2,
                         -size * np.sqrt(r) / 2,
                         size * np.sqrt(1.0 / r) / 2,
                         size * np.sqrt(r) / 2], np.float32)
             for r in ASPECT_RATIOS]))                  # (A, 4) rounded
        shifts = np.stack([cx, cy, cx, cy], axis=-1)    # (nh, nw, 4)
        lvl = shifts[:, :, None, :] + base[None, None]  # (nh, nw, A, 4)
        per_level.append(lvl.reshape(-1, 4).astype(np.float32))
    return per_level


def level_slices(img_size) -> List[Tuple[int, int]]:
    ih, iw = _hw(img_size)
    out, off = [], 0
    for stride in RPN_STRIDES:
        n = (-(-ih // stride)) * (-(-iw // stride)) * len(ASPECT_RATIOS)
        out.append((off, off + n))
        off += n
    return out


# ── Box delta codec ──────────────────────────────────────────────────────

def encode_deltas(boxes: jax.Array, anchors: jax.Array,
                  weights=(1.0, 1.0, 1.0, 1.0)) -> jax.Array:
    """xyxy boxes vs anchors -> (dx, dy, dw, dh)."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + aw / 2
    ay = anchors[..., 1] + ah / 2
    bw = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-3)
    bh = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-3)
    bx = boxes[..., 0] + bw / 2
    by = boxes[..., 1] + bh / 2
    wx, wy, ww, wh = weights
    return jnp.stack([wx * (bx - ax) / aw, wy * (by - ay) / ah,
                      ww * jnp.log(bw / aw), wh * jnp.log(bh / ah)], -1)


def decode_deltas(deltas: jax.Array, anchors: jax.Array,
                  weights=(1.0, 1.0, 1.0, 1.0),
                  clip: float = 4.135) -> jax.Array:
    """(dx,dy,dw,dh) -> xyxy (log-space clipped like torchvision)."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + aw / 2
    ay = anchors[..., 1] + ah / 2
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, clip)
    dh = jnp.minimum(deltas[..., 3] / wh, clip)
    cx = ax + dx * aw
    cy = ay + dy * ah
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


# ── Modules ──────────────────────────────────────────────────────────────

class RPNHead(nn.Module):
    """v2 RPN head: two 3x3 convs, then objectness + deltas (per location)."""
    features: int = 256
    num_anchors: int = len(ASPECT_RATIOS)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]) -> Tuple[jax.Array,
                                                            jax.Array]:
        convs = [nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=self.dtype, name=f"conv{i}")
                 for i in range(2)]
        obj_out = nn.Conv(self.num_anchors, (1, 1), name="obj")
        box_out = nn.Conv(self.num_anchors * 4, (1, 1), name="box")
        objs, boxes = [], []
        for f in feats:
            h = f
            for conv in convs:
                h = nn.relu(conv(h))
            b = f.shape[0]
            objs.append(obj_out(h).astype(jnp.float32).reshape(b, -1))
            boxes.append(box_out(h).astype(jnp.float32).reshape(b, -1, 4))
        return jnp.concatenate(objs, 1), jnp.concatenate(boxes, 1)


class BoxHead(nn.Module):
    """v2 box head: 4 convs + FC 1024 -> class scores + per-class deltas."""
    num_classes: int = NUM_CLASSES
    features: int = 256
    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        """rois: (B, R, 7, 7, C) -> scores (B, R, K), deltas (B, R, K, 4)."""
        b, r = rois.shape[:2]
        x = rois.reshape(b * r, *rois.shape[2:])
        for i in range(4):
            x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=jnp.float32)(x)
            x = nn.relu(x)
        x = x.reshape(b * r, -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype)(x))
        scores = nn.Dense(self.num_classes)(x).astype(jnp.float32)
        deltas = nn.Dense(self.num_classes * 4)(x).astype(jnp.float32)
        return (scores.reshape(b, r, self.num_classes),
                deltas.reshape(b, r, self.num_classes, 4))


class FasterRCNN(nn.Module):
    """Backbone + FPN + RPN + RoI heads. `__call__` returns raw pieces; use
    the pure functions below for proposals/targets/inference."""
    cfg: FrcnnConfig = FrcnnConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = resnet_lib.ResNet(self.cfg.blocks, self.dtype,
                                          self.cfg.trainable_layers)
        self.fpn = fpn_lib.FPN(256, self.dtype, norm=self.cfg.fpn_norm)
        self.rpn_head = RPNHead(dtype=self.dtype)
        self.box_head = BoxHead(self.cfg.num_classes, dtype=self.dtype)

    def extract(self, images, train: bool = False):
        if self.cfg.normalize:
            images = ((images - jnp.asarray(IMAGENET_MEAN, images.dtype))
                      / jnp.asarray(IMAGENET_STD, images.dtype))
        feats = self.backbone(images, train)
        pyramid = self.fpn(feats, train)
        obj, deltas = self.rpn_head(pyramid)
        return pyramid, obj, deltas

    def roi_forward(self, pyramid, proposals, train: bool = False):
        rois = fpn_lib.roi_align(tuple(pyramid[:4]), proposals)
        return self.box_head(rois, train)

    def roi_forward_pooled(self, _images, rois, train: bool = False):
        """Box head on pre-pooled (B, R, 7, 7, C) RoI features (import
        parity tests drive the head in isolation)."""
        return self.box_head(rois, train)

    def __call__(self, images, proposals=None, train: bool = False):
        """Full forward for init/tracing: extract + RoI on given or dummy
        proposals."""
        pyramid, obj, deltas = self.extract(images, train)
        if proposals is None:
            b = images.shape[0]
            proposals = jnp.tile(
                jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (b, 8, 1))
        scores, box_deltas = self.roi_forward(pyramid, proposals, train)
        return {"obj": obj, "rpn_deltas": deltas, "scores": scores,
                "box_deltas": box_deltas}


# ── Proposal generation (static shapes) ──────────────────────────────────

@functools.partial(jax.jit, static_argnames=("img_size", "cfg"))
def generate_proposals(obj: jax.Array, rpn_deltas: jax.Array, img_size,
                       cfg: FrcnnConfig = FrcnnConfig()
                       ) -> Tuple[jax.Array, jax.Array]:
    """(B, A) objectness + (B, A, 4) deltas -> (B, P, 4) proposals + valid.

    Per-level top-k pre-NMS, joint class-agnostic NMS to cfg.num_proposals.
    img_size: int (square) or (H, W) canvas.
    """
    ih, iw = _hw(img_size)
    anchors = jnp.asarray(np.concatenate(_anchors_hw_major(img_size)))
    boxes = decode_deltas(rpn_deltas, anchors)
    boxes = box_ops.clip_to_image(boxes, ih, iw)

    sel_scores, sel_boxes, sel_levels = [], [], []
    for lvl, (lo, hi) in enumerate(level_slices(img_size)):
        k = min(cfg.pre_nms_topk, hi - lo)
        s, idx = jax.lax.top_k(obj[:, lo:hi], k)
        sel_scores.append(s)
        sel_boxes.append(jnp.take_along_axis(boxes[:, lo:hi],
                                             idx[..., None], axis=1))
        sel_levels.append(jnp.full(s.shape, lvl, jnp.int32))
    scores = jax.nn.sigmoid(jnp.concatenate(sel_scores, 1))
    cand = jnp.concatenate(sel_boxes, 1)
    # drop tiny boxes (torchvision min_size=1e-3) via score mask
    wh_ok = ((cand[..., 2] - cand[..., 0] > 1e-3) &
             (cand[..., 3] - cand[..., 1] > 1e-3))
    scores = jnp.where(wh_ok, scores, 0.0)
    # torchvision filter_proposals suppresses WITHIN each level only
    # (batched_nms keyed on level index), then keeps the global score-top
    # post_nms_top_n — level id as the "class" reproduces that exactly
    levels = jnp.concatenate(sel_levels, 1)
    pb, ps, _, pv = nms_ops.batched_nms(
        cand, scores, levels, num_candidates=min(4096, cand.shape[1]),
        max_outputs=cfg.num_proposals, iou_thresh=cfg.rpn_nms_thresh,
        score_thresh=0.0, class_aware=True)
    return pb, pv


# ── Training targets ─────────────────────────────────────────────────────

def match_anchors(anchors: jax.Array, gt_boxes: jax.Array,
                  gt_classes: jax.Array, pos_iou: float, neg_iou: float,
                  allow_low_quality: bool = True):
    """torchvision Matcher semantics, vectorised.

    anchors: (A, 4); gt: (B, M, 4)/(B, M). Returns (matched_gt (B, A) int32,
    labels (B, A) int32: 1 pos / 0 neg / -1 ignore).
    """
    valid = gt_classes >= 0                                   # (B, M)
    iou = jax.vmap(lambda g: box_ops.pairwise_iou(anchors, g))(gt_boxes)
    iou = jnp.where(valid[:, None, :], iou, -1.0)             # (B, A, M)
    best_iou = iou.max(-1)                                     # (B, A)
    matched = iou.argmax(-1)                                   # (B, A)
    labels = jnp.where(best_iou >= pos_iou, 1,
                       jnp.where(best_iou < neg_iou, 0, -1))
    if allow_low_quality:
        # every gt's best anchor(s) become positive. torchvision's
        # set_low_quality_matches_ RESTORES the pre-threshold match — the
        # anchor's own argmax gt, which may differ from the gt whose best
        # anchor it is (rpn.py Matcher; oracle-checked in
        # tests/test_loss_parity.py) — so `matched` (already the
        # per-anchor argmax) is left untouched, only the label flips.
        gt_best = jnp.where(valid, iou.max(1), -2.0)           # (B, M)
        is_best = (iou >= gt_best[:, None, :] - 1e-5) & valid[:, None, :]
        labels = jnp.where(is_best.any(-1), 1, labels)
    # images with no gt: all negative
    has_gt = valid.any(-1, keepdims=True)
    labels = jnp.where(has_gt, labels, 0)
    return matched, labels


def sample_targets(labels: jax.Array, batch: int, pos_frac: float,
                   key: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Balanced sampling: (pos_mask, neg_mask), each (B, N) bool with at
    most batch*pos_frac positives and batch-npos negatives."""
    k_pos, k_neg = jax.random.split(key)
    n_pos_cap = int(batch * pos_frac)
    pos = labels == 1
    neg = labels == 0
    pos_keep = _topk_random(pos, n_pos_cap, k_pos)
    n_pos = pos_keep.sum(-1, keepdims=True)
    # fill the rest with negatives, keeping the total at `batch`
    neg_keep = _topk_random_dynamic(neg, batch - n_pos, k_neg)
    return pos_keep, neg_keep


def _topk_random(mask: jax.Array, k: int, key: jax.Array) -> jax.Array:
    """Keep at most k random Trues per row (static k)."""
    r = jax.random.uniform(key, mask.shape, minval=0.01, maxval=1.0)
    pr = jnp.where(mask, r, 0.0)
    kth = jax.lax.top_k(pr, min(k, mask.shape[-1]))[0][..., -1:]
    return mask & (pr >= jnp.maximum(kth, 1e-9))


def _topk_random_dynamic(mask: jax.Array, k: jax.Array,
                         key: jax.Array) -> jax.Array:
    """Keep at most k (per-row traced value) random Trues per row."""
    r = jax.random.uniform(key, mask.shape, minval=0.01, maxval=1.0)
    pr = jnp.where(mask, r, 0.0)
    rank = jnp.argsort(jnp.argsort(-pr, axis=-1), axis=-1)
    return mask & (rank < k)
