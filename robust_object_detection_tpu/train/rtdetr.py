"""RT-DETR training: Hungarian set matching + VFL/L1/GIoU losses.

The reference gets this from Ultralytics' RTDETRDetectionLoss (SURVEY.md
§2.2 "set-matching loss"); here it is vectorised JAX: the assignment is
`optax.assignment.hungarian_algorithm` vmapped over the batch (rectangular
cost over the GT capacity; padded GTs carry a prohibitive cost and matches
to them are masked out), and the loss is varifocal classification with
IoU-weighted targets + L1 + GIoU on matched pairs, applied to every decoder
layer and the encoder proposals (deep supervision).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import CorruptionConfig
from ..models import rtdetr as R
from ..ops import assignment
from ..ops import boxes as box_ops
from ..ops import corrupt as corrupt_ops
from . import validation

BIG = 1e6
# Ultralytics RT-DETR gains: the MATCHER weighs the focal class cost at 2
# (models/utils/loss.py DETRLoss.__init__ cost_gain={"class": 2, ...})
# while the LOSS weighs VFL at 1 (loss_gain) — two different constants,
# cross-checked against the torch oracle in tests/test_loss_parity.py.
W_CLASS, W_L1, W_GIOU = 1.0, 5.0, 2.0
COST_CLASS, COST_L1, COST_GIOU = 2.0, 5.0, 2.0


def _solve_assignment(cost: jax.Array, exact: bool = False):
    """Batched one-to-one assignment, on device.

    exact=True runs optax's Hungarian (optimal) — a sequential while-loop
    that costs ~170 ms per call on v5e; with 7 matchings per train step
    that dominates the step. The default is a vectorised GREEDY matcher:
    repeatedly take the globally cheapest (query, gt) pair and mask its row
    and column. It is batched (one argmin over the whole cost per
    iteration, batch-parallel), bounded by min(Q, M) iterations with early
    exit once only prohibitive (>= BIG/2) entries remain, and empirically
    within a fraction of a percent of optimal cost on detection matchings
    (tests/test_rtdetr.py::test_greedy_close_to_hungarian). Host callbacks
    are NOT an option here — the axon PJRT tunnel rejects pure_callback.

    Returns (rows, cols) each (B, K): pairs in assignment order; unassigned
    trailing slots point at prohibitive pairs and are filtered by cost by
    the caller.
    """
    if exact:
        return jax.vmap(optax.assignment.hungarian_algorithm)(cost)

    b, q, m = cost.shape
    k = min(q, m)

    def per_image(c):
        def cond(state):
            i, c_, rows, cols = state
            return (i < k) & (c_.min() < BIG / 2)

        def body(state):
            i, c_, rows, cols = state
            idx = jnp.argmin(c_.reshape(-1))
            qi = (idx // m).astype(jnp.int32)
            mi = (idx % m).astype(jnp.int32)
            rows = rows.at[i].set(qi)
            cols = cols.at[i].set(mi)
            c_ = c_.at[qi, :].set(BIG).at[:, mi].set(BIG)
            return i + 1, c_, rows, cols

        # unfilled slots keep col == m (out of range) and are dropped by
        # the caller's in-range check — they can never alias a real gt
        rows0 = jnp.zeros((k,), jnp.int32)
        cols0 = jnp.full((k,), m, jnp.int32)
        _, cfinal, rows, cols = jax.lax.while_loop(
            cond, body, (0, c, rows0, cols0))
        return rows, cols

    return jax.vmap(per_image)(cost)


# Bertsekas forward auction (the default matcher): the solver lives in
# ops/assignment.py (XLA reference + a fused single-dispatch Pallas
# kernel; both paths include the greedy completion for capped images).
# Algorithm notes, eps-CS optimality bound, and the no-eps-scaling
# rationale are in that module's docstrings.
_auction_assignment = assignment.auction_assignment_ref

AUCTION_MAX_ROUNDS = 16
# Round cap: differentiated (trained-regime) costs converge in 3-15
# rounds (measured, detection-shaped costs at (300 queries, <=120 GTs)).
# The regimes that run longer are near-TIED costs — random-init outputs
# or crowded duplicates — where measured convergence needs 100s-1000s of
# rounds at ANY eps (eps-scaling included: 105-316 rounds on synthetic
# tie batches), and where every maximal matching is within ~1% of the
# Hungarian optimum anyway (ties = interchangeable queries), so capped
# images fall back to the from-scratch greedy solve
# (test_greedy_close_to_hungarian) with the cap surfaced as the
# matcher_capped metric. 16 = converged worst case + margin; each round
# is a ~33 us (B, M, Q) sweep on v5e, so the cap bounds the wasted
# pre-fallback work at ~0.5 ms/matching (a device trace of the
# random-init profile batch showed 48-round whiles at 1.6 ms x 7
# matchings ending in the same fallback).


def to_norm_cxcywh(boxes_xyxy: jax.Array, img_size: float) -> jax.Array:
    b = boxes_xyxy / img_size
    return jnp.stack([(b[..., 0] + b[..., 2]) / 2,
                      (b[..., 1] + b[..., 3]) / 2,
                      b[..., 2] - b[..., 0],
                      b[..., 3] - b[..., 1]], -1)


def _cxcywh_to_xyxy(b: jax.Array) -> jax.Array:
    return jnp.stack([b[..., 0] - b[..., 2] / 2, b[..., 1] - b[..., 3] / 2,
                      b[..., 0] + b[..., 2] / 2, b[..., 1] + b[..., 3] / 2],
                     -1)


ASSIGNMENT = "auction"    # "auction" (eps-optimal, default) | "greedy" |
#                           "hungarian" (optax exact, slow on TPU)


def hungarian_match(logits: jax.Array, boxes: jax.Array,
                    gt_boxes: jax.Array, gt_classes: jax.Array,
                    max_match: int = 300, method: Optional[str] = None
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-image optimal assignment.

    logits: (B, Q, nc); boxes: (B, Q, 4) norm cxcywh; gt_boxes: (B, M, 4)
    norm cxcywh; gt_classes: (B, M) with -1 pads. GTs beyond `max_match`
    slots are ignored (front-packed by the pipeline). method defaults to
    the module-level ASSIGNMENT ("auction").

    Returns (gt_for_query (B, Q) int32 [-1 = unmatched], iou_q (B, Q),
    aux dict: {"cost": (B, Q, M) match cost, "capped": (B,) bool — True
    where the auction hit its round cap and fell back to greedy
    completion; always False for the greedy/hungarian methods}).
    """
    b, q, nc = logits.shape
    m = min(max_match, gt_boxes.shape[1])
    gtb = gt_boxes[:, :m]
    gtc = gt_classes[:, :m]
    valid = gtc >= 0

    prob = jax.nn.sigmoid(logits)                              # (B, Q, nc)
    # focal-style class cost (Deformable-DETR convention)
    alpha, gamma = 0.25, 2.0
    neg = (1 - alpha) * prob ** gamma * (-jnp.log1p(-prob + 1e-8))
    pos = alpha * (1 - prob) ** gamma * (-jnp.log(prob + 1e-8))
    # select each GT's class column as a one-hot matmul — a (B, Q, M)
    # scalar take_along_axis is a slow TPU gather
    gt_onehot = jax.nn.one_hot(jnp.maximum(gtc, 0), nc,
                               dtype=logits.dtype)             # (B, M, nc)
    cls_sel = jnp.einsum("bqc,bmc->bqm", pos - neg, gt_onehot)

    # component-wise pairwise L1: a broadcast (B, Q, M, 4) intermediate
    # pads its trailing 4 to 128 lanes on TPU (32x HBM traffic)
    l1 = sum(jnp.abs(boxes[:, :, None, i] - gtb[:, None, :, i])
             for i in range(4))
    qx = _cxcywh_to_xyxy(boxes)
    gx = _cxcywh_to_xyxy(gtb)
    giou = box_ops.pairwise_giou(qx, gx)                       # (B, Q, M)
    cost = COST_CLASS * cls_sel + COST_L1 * l1 + COST_GIOU * (1.0 - giou)
    cost = jnp.where(valid[:, None, :], cost, BIG)

    method = ASSIGNMENT if method is None else method
    capped = jnp.zeros((b,), bool)

    def solve_to_gt_for_query(exact):
        rows, cols = _solve_assignment(cost, exact=exact)
        # Assignments to PADDED gts (or unfilled greedy slots, col == m)
        # write to an overflow slot (index q) so they can never clobber a
        # real query's assignment.
        in_range = cols < m
        cols_c = jnp.minimum(cols, m - 1)
        matched_valid = (jnp.take_along_axis(valid, cols_c, 1)
                         & in_range)                            # (B, K)
        slot = jnp.where(matched_valid, rows, q)
        return jnp.full((b, q + 1), -1, jnp.int32).at[
            jnp.arange(b)[:, None], slot].set(
            jnp.where(matched_valid, cols_c, -1).astype(jnp.int32))[:, :q]

    if method == "auction":
        # auction + greedy completion for capped images, in
        # ops/assignment.py (single fused Pallas dispatch on TPU)
        gt_for_query, capped = assignment.auction_assignment(
            cost, valid, max_rounds=AUCTION_MAX_ROUNDS)
    else:
        gt_for_query = solve_to_gt_for_query(method == "hungarian")
    # IoU only for the matched pair: gather each query's GT box, then
    # elementwise IoU — the full (B, Q, M) pairwise matrix was computed
    # just to read one column per query
    tgt_x = jnp.take_along_axis(gx, jnp.maximum(gt_for_query, 0)[..., None],
                                1)                             # (B, Q, 4)
    iou_q = box_ops.iou_elementwise(qx, tgt_x)
    iou_q = jnp.where(gt_for_query >= 0, iou_q, 0.0)
    return gt_for_query, iou_q, {"cost": cost, "capped": capped}


def varifocal_loss(logits: jax.Array, target_cls: jax.Array,
                   target_iou: jax.Array, alpha: float = 0.75,
                   gamma: float = 2.0) -> jax.Array:
    """VFL, Ultralytics VarifocalLoss semantics: weight =
    alpha*p^gamma*(1-label) + gt_score*label — the LABEL (not the score)
    gates the two branches, so a matched query with IoU 0 weighs 0 rather
    than falling back to the negative branch. Returns the raw SUM; the
    caller applies the .mean(query-axis).sum()/num_gts normalisation."""
    nc = logits.shape[-1]
    label = (jax.nn.one_hot(jnp.maximum(target_cls, 0), nc)
             * (target_cls >= 0)[..., None])
    t = label * target_iou[..., None]
    p = jax.nn.sigmoid(logits)
    weight = alpha * p ** gamma * (1.0 - label) + t * label
    bce = optax.sigmoid_binary_cross_entropy(logits, t)
    return (bce * weight).sum()


def _layer_loss(logits, boxes, gt_boxes_n, gt_classes):
    gt_for_q, iou_q, aux = hungarian_match(
        jax.lax.stop_gradient(logits), jax.lax.stop_gradient(boxes),
        gt_boxes_n, gt_classes)
    matched = gt_for_q >= 0
    n_pos = jnp.maximum(matched.sum(), 1.0)
    tgt_cls = jnp.where(
        matched,
        jnp.take_along_axis(jnp.maximum(gt_classes, 0),
                            jnp.maximum(gt_for_q, 0), 1), -1)
    # Ultralytics normalises VFL by .mean(1).sum()/num_gts — i.e. BOTH the
    # query count AND the gt count divide the sum (VarifocalLoss.forward +
    # DETRLoss._get_loss_class). n_pos == num valid gts here: Q >= M so
    # every valid gt is matched.
    nq = logits.shape[1]
    cls_l = varifocal_loss(logits, tgt_cls,
                           jax.lax.stop_gradient(iou_q)) / nq / n_pos

    tgt_box = jnp.take_along_axis(gt_boxes_n,
                                  jnp.maximum(gt_for_q, 0)[..., None], 1)
    l1 = (jnp.abs(boxes - tgt_box).sum(-1) * matched).sum() / n_pos
    giou = box_ops.giou(_cxcywh_to_xyxy(boxes), _cxcywh_to_xyxy(tgt_box))
    giou_l = ((1.0 - giou) * matched).sum() / n_pos
    return W_CLASS * cls_l + W_L1 * l1 + W_GIOU * giou_l, {
        "cls": cls_l, "l1": l1, "giou": giou_l, "n_pos": n_pos,
        "capped": aux["capped"].sum()}


# ── Contrastive denoising (CDN) ──────────────────────────────────────────

def build_dn_queries(gt_boxes_n: jax.Array, gt_classes: jax.Array,
                     key: jax.Array, num_groups: int = 2,
                     max_gt: int = 32, box_noise: float = 0.4,
                     label_noise: float = 0.5, num_classes: int = 6):
    """Noised GT queries for denoising training (DN-DETR/DINO-style CDN).

    Slot layout: per group g, `max_gt` positive slots (small box noise,
    target = source gt) then `max_gt` negative slots (large noise, target
    = background). Empty gt slots get group_id -1 (attention-isolated,
    loss-excluded).

    Returns (dn dict for the model, dn_gt (B, D) int32 source-gt index
    [-1 = negative/empty], dn_active (B, D) bool).
    """
    b = gt_boxes_n.shape[0]
    m = min(max_gt, gt_boxes_n.shape[1])
    gtb = gt_boxes_n[:, :m]
    gtc = gt_classes[:, :m]
    valid = gtc >= 0                                           # (B, m)

    slots_cls, slots_box, slots_gid, slots_gt, slots_pos = [], [], [], [], []
    for g in range(num_groups):
        for positive in (True, False):
            k_shift, k_scale, k_flip, k_cls, key = jax.random.split(
                jax.random.fold_in(key, g * 2 + int(positive)), 5)
            wh = gtb[..., 2:]
            # positive: centre within +-0.25*wh*noise, wh scale ~1;
            # negative: pushed out to (0.5..1)*wh*noise — wrong-but-near
            lo, hi = (0.0, 0.5) if positive else (0.5, 1.0)
            mag = jax.random.uniform(k_shift, gtb[..., :2].shape,
                                     minval=lo, maxval=hi)
            sign = jnp.where(
                jax.random.bernoulli(k_scale, 0.5, mag.shape), 1.0, -1.0)
            centre = gtb[..., :2] + sign * mag * wh * box_noise
            scale = jax.random.uniform(
                k_scale, wh.shape, minval=1 - box_noise * (hi),
                maxval=1 + box_noise * (hi))
            boxes = jnp.clip(jnp.concatenate([centre, wh * scale], -1),
                             1e-4, 1 - 1e-4)
            flip = jax.random.bernoulli(k_flip, label_noise, gtc.shape)
            rand_cls = jax.random.randint(k_cls, gtc.shape, 0, num_classes)
            cls = jnp.where(flip, rand_cls, jnp.maximum(gtc, 0))
            slots_cls.append(jnp.where(valid, cls, num_classes))
            slots_box.append(boxes)
            slots_gid.append(jnp.where(valid, g, -1))
            gt_idx = jnp.arange(m, dtype=jnp.int32)[None].repeat(b, 0)
            slots_gt.append(jnp.where(valid & positive, gt_idx, -1))
            slots_pos.append(valid & positive)

    dn = {"classes": jnp.concatenate(slots_cls, 1).astype(jnp.int32),
          "boxes": jnp.concatenate(slots_box, 1),
          "group_ids": jnp.concatenate(slots_gid, 1).astype(jnp.int32)}
    dn_gt = jnp.concatenate(slots_gt, 1).astype(jnp.int32)
    dn_active = jnp.concatenate([valid] * (2 * num_groups), 1)
    return dn, dn_gt, dn_active


def dn_loss(dn_logits: jax.Array, dn_boxes: jax.Array, dn_gt: jax.Array,
            dn_active: jax.Array, gt_boxes_n: jax.Array,
            gt_classes: jax.Array) -> jax.Array:
    """Per-layer denoising loss with the KNOWN assignment (no matching):
    positives regress their source gt + VFL with its class; negatives and
    only-active slots get pure background VFL."""
    pos = dn_gt >= 0
    n_pos = jnp.maximum(pos.sum(), 1.0)
    safe = jnp.maximum(dn_gt, 0)
    tgt_box = jnp.take_along_axis(gt_boxes_n, safe[..., None], 1)
    tgt_cls_raw = jnp.take_along_axis(jnp.maximum(gt_classes, 0), safe, 1)
    tgt_cls = jnp.where(pos, tgt_cls_raw, -1)

    qx = _cxcywh_to_xyxy(dn_boxes)
    gx = _cxcywh_to_xyxy(tgt_box)
    iou = box_ops.iou_elementwise(qx, gx) * pos
    # same VFL normalisation as the matched layers: /D (dn query count,
    # the .mean(1)) and /n_pos (= num_gts x dn groups for CDN)
    cls_l = (varifocal_loss(
        jnp.where(dn_active[..., None], dn_logits, -1e4),
        tgt_cls, jax.lax.stop_gradient(iou)) / dn_logits.shape[1] / n_pos)
    l1 = (jnp.abs(dn_boxes - tgt_box).sum(-1) * pos).sum() / n_pos
    giou_l = ((1.0 - box_ops.giou(qx, gx)) * pos).sum() / n_pos
    return W_CLASS * cls_l + W_L1 * l1 + W_GIOU * giou_l


@functools.partial(jax.jit, static_argnames=("img_size",))
def rtdetr_loss(outputs: Dict, gt_boxes_xyxy: jax.Array,
                gt_classes: jax.Array, img_size: int
                ) -> Tuple[jax.Array, Dict]:
    """Deep-supervised set loss: every decoder layer + encoder proposals."""
    gt_n = to_norm_cxcywh(gt_boxes_xyxy, img_size)
    total = 0.0
    metrics = {}
    capped = 0.0
    n_layers = outputs["logits"].shape[0]
    for li in range(n_layers):
        l, m = _layer_loss(outputs["logits"][li], outputs["boxes"][li],
                           gt_n, gt_classes)
        total = total + l
        capped = capped + m["capped"]
        if li == n_layers - 1:
            metrics = {f"dec_{k}": v for k, v in m.items()
                       if k != "capped"}
    enc_l, enc_m = _layer_loss(outputs["enc_logits"], outputs["enc_boxes"],
                               gt_n, gt_classes)
    total = total + enc_l
    metrics["enc_cls"] = enc_m["cls"]
    # image-matchings where the auction hit its round cap and greedy
    # -completed (0 in normal training; nonzero = dense-GT regime)
    metrics["matcher_capped"] = capped + enc_m["capped"]
    return total, metrics


# ── Train/predict steps ──────────────────────────────────────────────────

@dataclasses.dataclass
class RtdetrTrainState:
    params: dict
    batch_stats: dict
    ema_params: dict
    opt_state: optax.OptState
    step: jax.Array

    def tree_flatten(self):
        return ((self.params, self.batch_stats, self.ema_params,
                 self.opt_state, self.step), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    RtdetrTrainState, RtdetrTrainState.tree_flatten,
    RtdetrTrainState.tree_unflatten)


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-4,
                   warmup_steps: int = 500, total_steps: int = 100000,
                   clip: float = 0.1, lrf: float = 1.0):
    """AdamW + warmup then linear decay lr -> lr*lrf over the run.

    The reference's Ultralytics RT-DETR run decays lr0 -> lr0*lrf
    (experiments/rtdetr/augmented/args.yaml: lr0=1e-4 with lrf decay over
    100 epochs); lrf=1.0 keeps the flat-after-warmup behaviour for short
    smoke runs."""
    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps),
         optax.linear_schedule(lr, lr * lrf,
                               max(1, total_steps - warmup_steps))],
        [warmup_steps])
    tx = optax.chain(optax.clip_by_global_norm(clip),
                     optax.adamw(sched, weight_decay=weight_decay))
    return tx, sched


def init_state(model: R.RTDETR, key, img_size: int, tx) -> RtdetrTrainState:
    variables = R.init_variables(model, key, img_size)
    return RtdetrTrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        ema_params=jax.tree.map(jnp.copy, variables["params"]),
        opt_state=tx.init(variables["params"]), step=jnp.asarray(0))


def make_train_step(model: R.RTDETR, tx, img_size: int,
                    corruption: Optional[CorruptionConfig], augment: bool,
                    ema_decay: float = 0.9999, denoise: bool = True,
                    dn_groups: int = 2, dn_max_gt: int = 32,
                    base_augment: bool = False):
    """base_augment: the on-device half of the Ultralytics base recipe
    (HSV jitter + horizontal flip) that BOTH reference RT-DETR modes share
    (args.yaml hsv_*, fliplr=0.5); mosaic runs host-side in the driver."""
    from . import augment as aug

    def step(state: RtdetrTrainState, images_u8, gt_boxes, gt_classes, key):
        k = jax.random.fold_in(key, state.step)
        k_corr, k_dn = jax.random.split(k)
        # bf16 augmentation chain (see train/detector.py: halves the
        # full-image HBM traffic; corruption kernel stays f32)
        x = images_u8.astype(jnp.bfloat16)
        if base_augment:
            k_hsv, k_flip, k_corr = jax.random.split(k_corr, 3)
            x = aug.random_hsv(x, k_hsv)
            x, gt_boxes = aug.random_flip_lr(x, gt_boxes, gt_classes,
                                             k_flip)
        x = x.astype(jnp.float32)
        if augment:
            x, _ = corrupt_ops.random_corruption_fast(x, k_corr, corruption)
        x = x / 255.0

        dn = dn_gt = dn_active = None
        gt_n = to_norm_cxcywh(gt_boxes, img_size)
        if denoise:
            dn, dn_gt, dn_active = build_dn_queries(
                gt_n, gt_classes, k_dn, num_groups=dn_groups,
                max_gt=dn_max_gt, num_classes=model.cfg.num_classes)

        def loss_fn(params):
            outs, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, dn=dn, mutable=["batch_stats"])
            loss, metrics = rtdetr_loss(outs, gt_boxes, gt_classes, img_size)
            if denoise:
                dn_total = 0.0
                for li in range(outs["dn_logits"].shape[0]):
                    dn_total = dn_total + dn_loss(
                        outs["dn_logits"][li], outs["dn_boxes"][li],
                        dn_gt, dn_active, gt_n, gt_classes)
                loss = loss + dn_total
                metrics = dict(metrics, dn=dn_total)
            return loss, (mut["batch_stats"], metrics)

        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        d = ema_decay * (1.0 - jnp.exp(-(state.step + 1) / 2000.0))
        new_ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                               state.ema_params, new_params)
        metrics = dict(metrics, loss=loss, grad_norm=optax.global_norm(grads))
        return RtdetrTrainState(new_params, new_stats, new_ema, new_opt,
                                state.step + 1), metrics

    return step


def make_predict_step(model: R.RTDETR, img_size: int, max_det: int = 300,
                      use_ema: bool = True):
    def step(state, images_u8):
        params = state.ema_params if use_ema else state.params
        x = images_u8.astype(jnp.float32) / 255.0
        outs = model.apply({"params": params,
                            "batch_stats": state.batch_stats},
                           x, train=False)
        return R.postprocess(outs, img_size, max_det)
    return step


def train(cfg, data_root, out_dir, augment: bool = False,
          epochs: int = 100, img_size: int = 1024, batch_size: int = 4,
          max_steps: Optional[int] = None, max_boxes: int = 600,
          layout: str = "coco", val_interval: int = 1,
          lrf: float = 0.01, pretrained: Optional[str] = None,
          dtype: Optional[str] = None, base_augment: bool = True,
          mosaic: bool = True, close_mosaic: int = 10,
          allow_pickle: bool = False,
          model_kwargs: Optional[dict] = None) -> dict:
    """Full RT-DETR training driver (reference: 100 epochs, batch 2 at
    imgsz=1024, train_rtdetr_augmented.py:27-42).

    lrf: final-LR fraction — warmup then linear decay lr0 -> lr0*lrf over
    the run, matching the reference's Ultralytics schedule (args.yaml
    lrf=0.01, cos_lr=false). val_interval: every-N-epochs val mAP pass with
    best-by-mAP50 checkpointing (Ultralytics validates each epoch).
    dtype: computation dtype — "bfloat16" (default; the reference trains
    under Ultralytics amp=True) or "float32". Params/stats stay f32.
    base_augment/mosaic/close_mosaic: the Ultralytics base recipe both
    reference modes share — host mosaic until the last close_mosaic
    epochs + on-device HSV/flip (args.yaml mosaic=1.0, close_mosaic=10,
    hsv_*, fliplr=0.5).

    allow_pickle: opt-in to unpickling module-bearing torch checkpoints
    (rtdetr-l.pt stores nn.Modules — arbitrary code execution on
    untrusted files). Plain state-dict exports load without it.

    Matching: the module-level ASSIGNMENT knob selects the set-matching
    solver — "auction" (default: Bertsekas eps-auction, eps-optimal,
    greedy-completed + `matcher_capped` history metric when its round
    cap bites), "greedy" (globally-cheapest-pair), or "hungarian"
    (optax exact — the reference's Ultralytics solver semantics, ~170 ms
    per call on v5e, so 7 matchings dominate the step).

    Tensor parallelism: cfg.mesh.model > 1 shards the decoder Megatron
    -style over the mesh's model axis (parallel/mesh.rtdetr_decoder_tp —
    linear1 column- / linear2 row-sharded, attention head-sharded) for the
    whole train state including optimizer moments and EMA; the TP
    all-reduces compose with the data-axis grad psum on the 2D mesh.
    Requires heads and ffn width divisible by the model-axis size.
    TP=2 vs TP=1 loss-trajectory equality is regression-tested on the CPU
    mesh (tests/test_rtdetr_tp.py).

    model_kwargs: extra RtDetrConfig fields (queries, dec_layers, ...) —
    compile-cheap variants for tests and the multichip dryrun."""
    import contextlib

    from ..models.layers import bn_dtype_scope
    if dtype is None:      # bf16 on real TPUs; CPU emulates bf16 slowly
        dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    model_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    scope = (bn_dtype_scope(jnp.bfloat16) if dtype == "bfloat16"
             else contextlib.nullcontext())
    with scope:
        return _train_impl(cfg, data_root, out_dir, augment, epochs,
                           img_size, batch_size, max_steps, max_boxes,
                           layout, val_interval, lrf, pretrained,
                           model_dtype, base_augment, mosaic,
                           close_mosaic, allow_pickle, model_kwargs)


def _train_impl(cfg, data_root, out_dir, augment, epochs, img_size,
                batch_size, max_steps, max_boxes, layout, val_interval,
                lrf, pretrained, model_dtype, base_augment=True,
                mosaic=True, close_mosaic=10, allow_pickle=False,
                model_kwargs=None) -> dict:
    import time
    from pathlib import Path

    from ..core import artifacts
    from ..core.checkpoint import CheckpointManager
    from ..data import pipeline as pipe
    from ..parallel import mesh as mesh_lib

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    mesh = mesh_lib.make_mesh(cfg.mesh)
    ctx = mesh_lib.MeshContext(mesh)
    n_model = mesh.shape[mesh_lib.MODEL_AXIS]

    samples = (pipe.index_coco(data_root, "train") if layout == "coco"
               else pipe.index_yolo(data_root, "train"))
    steps_per_epoch = max(1, len(samples) // batch_size)
    rcfg = R.RtDetrConfig(num_classes=6, **(model_kwargs or {}))
    if n_model > 1 and (rcfg.heads % n_model or rcfg.ffn % n_model):
        raise ValueError(
            f"tensor parallelism needs heads ({rcfg.heads}) and ffn "
            f"({rcfg.ffn}) divisible by mesh.model ({n_model})")
    model = R.RTDETR(rcfg, dtype=model_dtype)
    tx, sched = make_optimizer(total_steps=epochs * steps_per_epoch,
                               lrf=lrf)
    state = init_state(model, jax.random.key(cfg.train.seed), img_size, tx)
    if pretrained:
        # reference starts from rtdetr-l.pt (train_rtdetr_augmented.py:25)
        from ..models import pretrained as pt
        tsd = pt.load_checkpoint_state(pretrained, allow_pickle=allow_pickle)
        newv, report = pt.import_rtdetr(
            tsd, {"params": state.params,
                  "batch_stats": state.batch_stats}, strict_head=False)
        print(f"pretrained import ({pretrained}): {report}")
        state = RtdetrTrainState(
            newv["params"], newv["batch_stats"],
            jax.tree.map(jnp.copy, newv["params"]),
            tx.init(newv["params"]), jnp.asarray(0))

    # state sharding: pure replication (the DP default), or Megatron TP of
    # the decoder over the model axis when the mesh has one (mesh.model>1)
    def state_shardings(s):
        if n_model > 1:
            return mesh_lib.rtdetr_decoder_tp(ctx, s)
        return jax.tree.map(lambda _: ctx.replicated, s)

    st_shard = state_shardings(state)
    if n_model > 1:
        spec = st_shard.params["layer0"]["linear1"]["kernel"].spec
        print(f"[rtdetr.train] decoder TP over {n_model}-way model axis "
              f"(linear1 spec {spec})", flush=True)
    place = lambda s: jax.tree.map(jax.device_put, s, st_shard)
    state = place(state)
    step_fn = jax.jit(
        make_train_step(model, tx, img_size, cfg.corruption, augment,
                        base_augment=base_augment),
        in_shardings=(st_shard, ctx.data, ctx.data, ctx.data, None),
        out_shardings=(st_shard, ctx.replicated),
        donate_argnums=(0,))

    val_samples = validation.index_val_samples(data_root, layout)
    predict_fn = None
    if val_samples:
        predict_fn = jax.jit(
            make_predict_step(model, img_size),
            in_shardings=(st_shard, ctx.data),
            out_shardings=ctx.replicated)

    ckpt = CheckpointManager(out_dir)
    hist = artifacts.HistoryLogger(out_dir)
    key = jax.random.key(cfg.train.seed)
    steps = 0
    mean_loss = 0.0
    start_epoch = 1
    restored = ckpt.restore_last({
        "params": state.params, "batch_stats": state.batch_stats,
        "ema_params": state.ema_params, "opt_state": state.opt_state,
        "step": state.step})
    if restored is not None:
        r = restored["state"]
        state = place(RtdetrTrainState(r["params"], r["batch_stats"],
                                       r["ema_params"], r["opt_state"],
                                       r["step"]))
        start_epoch = restored["step"] + 1
        steps = int(jax.device_get(state.step))
    for epoch in range(start_epoch, epochs + 1):
        t0 = time.time()
        losses = []
        # mosaic until the last close_mosaic epochs (args.yaml mosaic=1.0,
        # close_mosaic=10 — the recipe is shared with the YOLO trainer)
        if mosaic and epoch <= max(0, epochs - close_mosaic):
            from . import augment as aug
            batch_iter = aug.mosaic_batches(
                samples, batch_size, img_size, max_boxes=max_boxes,
                seed=cfg.train.seed + epoch)
        else:
            batch_iter = pipe.make_batches(
                samples, batch_size, img_size, max_boxes=max_boxes,
                shuffle=True, seed=cfg.train.seed + epoch,
                drop_remainder=True)
        capped = []
        for batch in pipe.prefetch(batch_iter):
            args = pipe.device_put_sharded(batch, ctx.data)
            state, m = step_fn(state, args[0], args[1], args[2], key)
            losses.append(m["loss"])
            capped.append(m.get("matcher_capped", 0.0))
            steps += 1
            if max_steps and steps >= max_steps:
                break
        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
        record = dict(epoch=epoch, train_loss=mean_loss,
                      lr=float(sched(steps)),
                      # image-matchings/epoch where the auction hit its
                      # round cap (greedy-completed; see hungarian_match)
                      matcher_capped=float(jnp.sum(jnp.stack(capped)))
                      if capped else 0.0,
                      epoch_sec=round(time.time() - t0, 2))
        if validation.should_validate(epoch, epochs, val_interval,
                                      bool(val_samples)):
            vm = validation.run_validation(predict_fn, state, val_samples,
                                           img_size, batch_size, ctx,
                                           max_boxes=max_boxes)
            record.update(vm)
            ckpt.save_best(epoch, {"params": state.params,
                                   "batch_stats": state.batch_stats,
                                   "ema_params": state.ema_params},
                           vm["mAP50"])
        hist.log(**record)
        ckpt.save_last(epoch, {"params": state.params,
                               "batch_stats": state.batch_stats,
                               "ema_params": state.ema_params,
                               "opt_state": state.opt_state,
                               "step": state.step})
        if max_steps and steps >= max_steps:
            break
    if ckpt.best_metric() is None:
        ckpt.save_best(epochs, {"params": state.params,
                                "batch_stats": state.batch_stats,
                                "ema_params": state.ema_params}, 0.0)
    ckpt.close()
    return {"out_dir": str(out_dir), "steps": steps, "final_loss": mean_loss}


def load_checkpoint(out_dir, img_size: int = 64):
    """Load a trained RT-DETR checkpoint -> (model, state)."""
    from ..core.checkpoint import CheckpointManager, abstract_init
    model = R.create(6)
    # eval_shape skeleton: no init compile / device round trips
    variables = abstract_init(model, img_size)
    target = {"params": variables["params"],
              "batch_stats": variables["batch_stats"],
              "ema_params": variables["params"]}
    ckpt = CheckpointManager(out_dir)
    restored = ckpt.restore_best(target)
    if restored is None:
        tx, _ = make_optimizer()
        full = dict(target,
                    opt_state=jax.eval_shape(tx.init, variables["params"]),
                    step=jnp.asarray(0))
        latest = ckpt.restore_last(full)
        if latest is None:
            ckpt.close()
            raise FileNotFoundError(f"no checkpoint under {out_dir}")
        restored = latest["state"]
    ckpt.close()
    restored = jax.device_put(restored)     # one batched async transfer
    return model, RtdetrTrainState(restored["params"],
                                   restored["batch_stats"],
                                   restored["ema_params"], None,
                                   jnp.asarray(0))
