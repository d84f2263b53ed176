"""Training-loss parity: the JAX loss stacks vs independent torch oracles.

The published tables come from TRAINING runs, so the trainers' loss
semantics — the YOLO TAL assigner + CIoU + DFL stack
(train_yolo_augmented.py:27-42 delegates to Ultralytics v8DetectionLoss),
the RT-DETR Hungarian + VFL/L1/GIoU + CDN stack
(train_rtdetr_augmented.py:27-42), and the torchvision FRCNN RPN/RoI
losses (train_frcnn_baseline.py:171-176) — must match the reference
libraries' published algorithms, not merely overfit. These tests feed
IDENTICAL raw head outputs + GT to the JAX losses and to independently
written torch implementations (tests/_torch_losses.py) and assert the
per-component loss values agree. A drifted assigner target, matcher cost,
loss weight, or normaliser fails here instead of surfacing in a real-data
run.

Tolerances: the precise/oracle configurations (f32 TAL metric + exact
top-k; exact Hungarian) must agree to f32 summation noise (rtol 1e-4).
The production YOLO path (bf16 metric + approx_max_k) is additionally
bounded loosely (rtol 5e-2) — it quantises the assigner's RANKING inputs,
not the loss math.
"""

import numpy as np
import pytest
import torch

torch.manual_seed(0)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from robust_object_detection_tpu.models import frcnn as FM  # noqa: E402
from robust_object_detection_tpu.models import yolov8 as Y  # noqa: E402
from robust_object_detection_tpu.train import detection as D  # noqa: E402
from robust_object_detection_tpu.train import frcnn as FT  # noqa: E402
from robust_object_detection_tpu.train import rtdetr as RD  # noqa: E402

from tests import _torch_losses as O  # noqa: E402

IMG = 64


def _random_gts(rng, b, m, img=IMG, n_valid=None):
    """Random well-formed xyxy GT boxes + classes with -1 padding."""
    x1 = rng.uniform(0, img * 0.6, (b, m))
    y1 = rng.uniform(0, img * 0.6, (b, m))
    w = rng.uniform(img * 0.15, img * 0.4, (b, m))
    h = rng.uniform(img * 0.15, img * 0.4, (b, m))
    boxes = np.stack([x1, y1, np.minimum(x1 + w, img),
                      np.minimum(y1 + h, img)], -1).astype(np.float32)
    classes = rng.randint(0, 6, (b, m)).astype(np.int32)
    n_valid = n_valid or [m, max(1, m - 2)]
    for i, nv in enumerate(n_valid[:b]):
        classes[i, nv:] = -1
    return boxes, classes


# ── (a) YOLOv8: TAL + CIoU + DFL vs Ultralytics v8DetectionLoss ──────────


class TestYoloLossParity:
    B, M = 2, 6

    def _inputs(self, seed=0):
        rng = np.random.RandomState(seed)
        anchors_np, strides_np = Y.anchor_points(IMG)
        n = anchors_np.shape[0]
        # moderate logits: sigmoid scores in a realistic (0.05..0.7) band
        cls_logits = rng.randn(self.B, n, 6).astype(np.float32) - 1.0
        # DFL logits biased so expected distances spread over ~0..6 grid
        # units -> pred boxes overlap the (0.15..0.4)*img GTs frequently
        # (zero-overlap candidates are the one knife-edge where the
        # ultralytics scatter-topk and the threshold-topk differ; they
        # contribute zero loss either way, see task_aligned_assign)
        box_logits = (rng.randn(self.B, n, 4, Y.REG_MAX) * 1.5
                      ).astype(np.float32)
        gt_boxes, gt_classes = _random_gts(rng, self.B, self.M)
        return (box_logits, cls_logits, anchors_np, strides_np,
                gt_boxes, gt_classes)

    def _torch_components(self, box_logits, cls_logits, anchors, strides,
                          gt_boxes, gt_classes):
        out = O.v8_detection_loss_t(
            torch.from_numpy(box_logits), torch.from_numpy(cls_logits),
            torch.from_numpy(anchors), torch.from_numpy(strides),
            torch.from_numpy(gt_boxes), torch.from_numpy(gt_classes))
        return {k: float(v) for k, v in out.items()}

    def _jax_components(self, box_logits, cls_logits, gt_boxes, gt_classes,
                        precise):
        # re-pack flattened logits into the per-level head layout
        outs = []
        ofs = 0
        for s in Y.STRIDES:
            hw = IMG // s
            outs.append((
                jnp.asarray(box_logits[:, ofs:ofs + hw * hw].reshape(
                    self.B, hw, hw, 4 * Y.REG_MAX)),
                jnp.asarray(cls_logits[:, ofs:ofs + hw * hw].reshape(
                    self.B, hw, hw, 6))))
            ofs += hw * hw
        _, metrics = D.yolo_loss(outs, jnp.asarray(gt_boxes),
                                 jnp.asarray(gt_classes), IMG,
                                 precise=precise)
        return {k: float(metrics[k]) for k in ("box", "cls", "dfl")}

    def test_components_match_oracle_precise(self):
        for seed in (0, 1, 2):
            args = self._inputs(seed)
            want = self._torch_components(*args)
            got = self._jax_components(args[0], args[1], args[4], args[5],
                                       precise=True)
            assert want["box"] > 0 and want["cls"] > 0 and want["dfl"] > 0
            for k in ("box", "cls", "dfl"):
                np.testing.assert_allclose(
                    got[k], want[k], rtol=1e-4,
                    err_msg=f"seed {seed} component {k}")

    def test_components_match_oracle_production_path(self):
        """bf16 metric + approx_max_k only perturbs assigner rankings;
        the losses must stay within a few percent of the oracle."""
        args = self._inputs(0)
        want = self._torch_components(*args)
        got = self._jax_components(args[0], args[1], args[4], args[5],
                                   precise=False)
        for k in ("box", "cls", "dfl"):
            np.testing.assert_allclose(got[k], want[k], rtol=5e-2,
                                       err_msg=f"component {k}")

    def test_weighted_total(self):
        """The 7.5/0.5/1.5 box/cls/dfl gains (reference args.yaml)."""
        args = self._inputs(0)
        want = self._torch_components(*args)
        outs_total = 7.5 * want["box"] + 0.5 * want["cls"] + 1.5 * want["dfl"]
        got = self._jax_components(args[0], args[1], args[4], args[5],
                                   precise=True)
        total = 7.5 * got["box"] + 0.5 * got["cls"] + 1.5 * got["dfl"]
        np.testing.assert_allclose(total, outs_total, rtol=1e-4)


# ── (b) RT-DETR: Hungarian + VFL/L1/GIoU (+ CDN known-assignment) ────────


class TestRtdetrLossParity:
    B, Q, M, NC = 2, 24, 5, 6

    def _inputs(self, seed=0):
        rng = np.random.RandomState(seed)
        logits = rng.randn(self.B, self.Q, self.NC).astype(np.float32)
        # norm cxcywh in (0, 1) with sane widths
        c = rng.uniform(0.2, 0.8, (self.B, self.Q, 2))
        wh = rng.uniform(0.05, 0.3, (self.B, self.Q, 2))
        boxes = np.concatenate([c, wh], -1).astype(np.float32)
        gt_xyxy, gt_classes = _random_gts(rng, self.B, self.M, img=1.0)
        return logits, boxes, gt_xyxy, gt_classes

    def _gt_norm(self, gt_xyxy):
        return np.concatenate([(gt_xyxy[..., :2] + gt_xyxy[..., 2:]) / 2,
                               gt_xyxy[..., 2:] - gt_xyxy[..., :2]],
                              -1).astype(np.float32)

    def test_layer_loss_matches_oracle(self, monkeypatch):
        monkeypatch.setattr(RD, "ASSIGNMENT", "hungarian")
        for seed in (0, 1, 2):
            logits, boxes, gt_xyxy, gt_classes = self._inputs(seed)
            gt_n = self._gt_norm(gt_xyxy)
            total, m = jax.jit(RD._layer_loss)(
                jnp.asarray(logits), jnp.asarray(boxes),
                jnp.asarray(gt_n), jnp.asarray(gt_classes))
            want = O.detr_layer_loss_t(
                torch.from_numpy(logits), torch.from_numpy(boxes),
                torch.from_numpy(gt_n), torch.from_numpy(gt_classes))
            np.testing.assert_allclose(float(m["cls"]), float(want["cls"]),
                                       rtol=1e-4, err_msg=f"cls seed {seed}")
            np.testing.assert_allclose(
                RD.W_L1 * float(m["l1"]), float(want["bbox"]), rtol=1e-4,
                err_msg=f"l1 seed {seed}")
            np.testing.assert_allclose(
                RD.W_GIOU * float(m["giou"]), float(want["giou"]),
                rtol=1e-4, err_msg=f"giou seed {seed}")
            np.testing.assert_allclose(
                float(total),
                float(want["cls"] + want["bbox"] + want["giou"]), rtol=1e-4)

    def test_auction_matcher_matches_hungarian_loss(self, monkeypatch):
        """The production auction matcher must land on the same (or
        equal-cost) assignment as the exact solver on detection-shaped
        costs — checked at the LOSS level where it matters."""
        logits, boxes, gt_xyxy, gt_classes = self._inputs(3)
        gt_n = self._gt_norm(gt_xyxy)
        args = (jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(gt_n),
                jnp.asarray(gt_classes))
        monkeypatch.setattr(RD, "ASSIGNMENT", "hungarian")
        t_h, _ = jax.jit(RD._layer_loss)(*args)
        monkeypatch.setattr(RD, "ASSIGNMENT", "auction")
        t_a, _ = jax.jit(RD._layer_loss)(*args)
        np.testing.assert_allclose(float(t_a), float(t_h), rtol=2e-2)

    def test_dn_loss_matches_known_assignment_oracle(self):
        """CDN losses use the KNOWN gt<->query mapping (no matching);
        oracle = DETRLoss._get_loss with explicit match_indices."""
        rng = np.random.RandomState(0)
        b, d = 2, 8                                  # 8 dn slots
        dn_logits = rng.randn(b, d, self.NC).astype(np.float32)
        c = rng.uniform(0.2, 0.8, (b, d, 2))
        wh = rng.uniform(0.05, 0.3, (b, d, 2))
        dn_boxes = np.concatenate([c, wh], -1).astype(np.float32)
        gt_xyxy, gt_classes = _random_gts(rng, b, 4, img=1.0,
                                          n_valid=[4, 3])
        gt_n = self._gt_norm(gt_xyxy)
        # positives: slot i <- gt i (first half); second half negatives
        dn_gt = np.full((b, d), -1, np.int32)
        dn_active = np.zeros((b, d), bool)
        for i, nv in enumerate([4, 3]):
            dn_gt[i, :nv] = np.arange(nv)
            dn_active[i, :nv] = True
            dn_active[i, d // 2:d // 2 + nv] = True  # negative slots
        got = jax.jit(RD.dn_loss)(
            jnp.asarray(dn_logits), jnp.asarray(dn_boxes),
            jnp.asarray(dn_gt), jnp.asarray(dn_active),
            jnp.asarray(gt_n), jnp.asarray(gt_classes))

        # oracle with known indices; inactive slots' logits forced to the
        # same -1e4 the JAX path uses (attention-isolated empty slots)
        masked = np.where(dn_active[..., None], dn_logits, -1e4)
        match = [(torch.arange(4), torch.arange(4)),
                 (torch.arange(3), torch.arange(3))]
        want = O.detr_layer_loss_t(
            torch.from_numpy(masked), torch.from_numpy(dn_boxes),
            torch.from_numpy(gt_n), torch.from_numpy(gt_classes),
            match_indices=match)
        want_total = float(want["cls"] + want["bbox"] + want["giou"])
        np.testing.assert_allclose(float(got), want_total, rtol=1e-4)


# ── (c) Faster R-CNN: torchvision RPN / RoI losses ────────────────────────


class TestFrcnnLossParity:
    """Sampling is randomised in both stacks, so parity is asserted under
    configs whose caps exceed the candidate counts (everything sampled =
    the sampler is the identity); the balanced-sampler distribution itself
    is covered by tests/test_frcnn.py."""

    def _anchors(self, n_side=8, img=IMG):
        s = img / n_side
        cx, cy = np.meshgrid(np.arange(n_side) * s + s / 2,
                             np.arange(n_side) * s + s / 2)
        sizes = np.array([10.0, 24.0])
        out = []
        for sz in sizes:
            out.append(np.stack([cx.ravel() - sz, cy.ravel() - sz,
                                 cx.ravel() + sz, cy.ravel() + sz], 1))
        return np.concatenate(out).astype(np.float32)            # (128, 4)

    def test_rpn_loss_matches_torchvision(self):
        rng = np.random.RandomState(0)
        anchors = self._anchors()
        a = anchors.shape[0]
        b = 2
        obj = rng.randn(b, a).astype(np.float32)
        deltas = (rng.randn(b, a, 4) * 0.2).astype(np.float32)
        gt_boxes, gt_classes = _random_gts(rng, b, 4, n_valid=[4, 2])

        cfg = FM.FrcnnConfig(rpn_batch=4 * a, rpn_pos_frac=0.5)
        got = jax.jit(lambda *xs: FT.rpn_loss(*xs, cfg=cfg,
                                              key=jax.random.key(0)))(
            jnp.asarray(obj), jnp.asarray(deltas), jnp.asarray(anchors),
            jnp.asarray(gt_boxes), jnp.asarray(gt_classes))
        want = O.rpn_loss_t(torch.from_numpy(obj), torch.from_numpy(deltas),
                            torch.from_numpy(anchors),
                            torch.from_numpy(gt_boxes),
                            torch.from_numpy(gt_classes))
        np.testing.assert_allclose(float(got["rpn_obj"]),
                                   float(want["rpn_obj"]), rtol=1e-4)
        np.testing.assert_allclose(float(got["rpn_box"]),
                                   float(want["rpn_box"]), rtol=1e-4)

    def test_roi_loss_matches_torchvision(self):
        rng = np.random.RandomState(1)
        b, p, m, k = 2, 24, 4, 6
        x1 = rng.uniform(0, IMG * 0.6, (b, p))
        y1 = rng.uniform(0, IMG * 0.6, (b, p))
        w = rng.uniform(6, 24, (b, p))
        h = rng.uniform(6, 24, (b, p))
        proposals = np.stack([x1, y1, np.minimum(x1 + w, IMG),
                              np.minimum(y1 + h, IMG)], -1
                             ).astype(np.float32)
        gt_boxes, gt_classes = _random_gts(rng, b, m, n_valid=[4, 3])
        c = p + m                                    # candidates incl. gts

        # deterministic stand-in head: logits/deltas as fixed functions of
        # the roi geometry, so both sides score the SAME candidate set
        wsc = rng.randn(4, k + 1).astype(np.float32)
        wdl = rng.randn(4, (k + 1) * 4).astype(np.float32) * 0.1

        def score_np(rois):
            return rois @ wsc * 0.05

        def delta_np(rois):
            return (rois @ wdl * 0.02).reshape(*rois.shape[:-1], k + 1, 4)

        cfg = FM.FrcnnConfig(roi_batch=c, roi_pos_frac=1.0)

        def jax_side(props, gtb, gtc):
            rois, roi_valid, cls_t, delta_t, pos = FT.roi_targets(
                props, jnp.ones(props.shape[:2], bool), gtb, gtc, cfg,
                jax.random.key(0))
            scores = jnp.asarray(score_np(np.asarray(rois)))
            deltas = jnp.asarray(delta_np(np.asarray(rois)))
            return FT.head_loss(scores, deltas, cls_t, delta_t,
                                roi_valid, pos)

        got = jax_side(jnp.asarray(proposals), jnp.asarray(gt_boxes),
                       jnp.asarray(gt_classes))
        want = O.roi_loss_t(
            torch.from_numpy(proposals), torch.from_numpy(gt_boxes),
            torch.from_numpy(gt_classes),
            score_fn=lambda r: torch.from_numpy(score_np(r.numpy())),
            delta_fn=lambda r: torch.from_numpy(delta_np(r.numpy())))
        np.testing.assert_allclose(float(got["head_cls"]),
                                   float(want["head_cls"]), rtol=1e-4)
        np.testing.assert_allclose(float(got["head_box"]),
                                   float(want["head_box"]), rtol=1e-4)
