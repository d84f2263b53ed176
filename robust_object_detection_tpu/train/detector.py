"""YOLO detector training driver (baseline / corruption-augmented).

Reference counterparts: train_yolo_augmented.py (Ultralytics one-call trainer
with the corruption monkey-patch) and the no-patch baseline runs. Here both
modes are the SAME jitted sharded step with a static `augment` flag: the
corruption runs on device inside the step (ops/corrupt.py random_corruption,
p=0.5 — augmentations.py:60-74 semantics), so "baseline vs augmented" is a
config bit, not a monkey-patch.

Optimisation follows the reference run configs
(experiments/yolo/baseline_clean/args.yaml: SGD lr0=0.01, lrf=0.01,
momentum=0.937, weight_decay=0.0005, warmup_epochs=3) with linear decay and
bias/BN exempt from weight decay. EMA parameters (decay 0.9999) are kept for
evaluation, as Ultralytics does.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import artifacts
from ..core.checkpoint import CheckpointManager
from ..core.config import CorruptionConfig, ExperimentConfig
from ..data import pipeline as pipe
from ..models import yolov8 as yolo_lib
from ..ops import corrupt as corrupt_ops
from ..ops import nms as nms_ops
from ..parallel import mesh as mesh_lib
from . import detection as det_loss
from . import validation


@dataclasses.dataclass
class DetTrainState:
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
    DetTrainState, DetTrainState.tree_flatten, DetTrainState.tree_unflatten)


def make_optimizer(lr0: float = 0.01, lrf: float = 0.01,
                   momentum: float = 0.937, weight_decay: float = 5e-4,
                   warmup_steps: int = 100, total_steps: int = 10000):
    """SGD + nesterov, linear decay lr0 -> lr0*lrf, linear warmup,
    weight decay masked off bias/BN (the Ultralytics param-group split)."""
    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, lr0, warmup_steps),
         optax.linear_schedule(lr0, lr0 * lrf,
                               max(1, total_steps - warmup_steps))],
        [warmup_steps])

    def decay_mask(params):
        def is_weight(path, x):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            return name == "kernel" and x.ndim > 1
        return jax.tree_util.tree_map_with_path(is_weight, params)

    tx = optax.chain(
        optax.add_decayed_weights(weight_decay, mask=decay_mask),
        optax.sgd(sched, momentum=momentum, nesterov=True))
    return tx, sched


def make_train_step(model, tx, img_size: int, corruption: CorruptionConfig,
                    augment: bool, ema_decay: float = 0.9999,
                    base_augment: bool = False):
    """Sharded train step: uint8 batch (+padded GT) -> loss -> update.

    augment: 50%-probability corruption (the reference's Augmented mode).
    base_augment: the Ultralytics base recipe both modes share — on-device
    HSV jitter + horizontal flip (mosaic happens host-side,
    augment.mosaic_batches).
    """
    from . import augment as aug

    def step(state: DetTrainState, images_u8, gt_boxes, gt_classes, key):
        k = jax.random.fold_in(key, state.step)
        # the augmentation chain runs in bfloat16 (halves the HBM traffic
        # of the full-resolution HSV/flip passes — ~3 ms/step at
        # bs16/1024px; augmentation jitter tolerates the ~0.4% rounding,
        # and the frozen-testset path keeps its exact u8/f32 semantics);
        # the fused corruption kernel stays f32 [0,255]
        x = images_u8.astype(jnp.bfloat16)
        if base_augment:
            k_hsv, k_flip, k = jax.random.split(k, 3)
            x = aug.random_hsv(x, k_hsv)
            x, gt_boxes = aug.random_flip_lr(x, gt_boxes, gt_classes,
                                             k_flip)
        x = x.astype(jnp.float32)
        if augment:
            x, _ = corrupt_ops.random_corruption_fast(x, k, corruption)
        x = x / 255.0

        def loss_fn(params):
            outs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"])
            loss, metrics = det_loss.yolo_loss(outs, gt_boxes, gt_classes,
                                               img_size)
            return loss, (mutated["batch_stats"], metrics)

        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # EMA with warmup ramp (Ultralytics: d = decay*(1-exp(-step/2000)))
        d = ema_decay * (1.0 - jnp.exp(-(state.step + 1) / 2000.0))
        new_ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                               state.ema_params, new_params)
        metrics = dict(metrics, loss=loss, grad_norm=optax.global_norm(grads))
        return DetTrainState(new_params, new_stats, new_ema, new_opt,
                             state.step + 1), metrics

    return step


def make_predict_step(model, img_size: int, conf: float = 0.001,
                      iou: float = 0.7, max_det: int = 300,
                      num_candidates: int = 30000, use_ema: bool = True,
                      multi_label: bool = True):
    """Jittable inference: uint8 batch -> NMS'd detections (fixed capacity).

    multi_label=True matches the Ultralytics VAL protocol the reference
    evaluates under (eval_all.py:162-192 -> DetectionValidator.postprocess
    -> non_max_suppression(multi_label=True)): every class above `conf`
    yields a candidate per box. multi_label=False is the Ultralytics
    PREDICT path (per-box argmax class), used by report/demo.
    """

    def step(state: DetTrainState, images_u8):
        params = state.ema_params if use_ema else state.params
        x = images_u8.astype(jnp.float32) / 255.0
        outs = model.apply({"params": params,
                            "batch_stats": state.batch_stats},
                           x, train=False)
        boxes, scores = yolo_lib.decode(outs, img_size)
        if multi_label:
            return nms_ops.multilabel_nms(
                boxes, scores,
                num_candidates=min(num_candidates,
                                   scores.shape[1] * scores.shape[2]),
                max_outputs=max_det, iou_thresh=iou, score_thresh=conf)
        best_cls = jnp.argmax(scores, -1)
        best_score = jnp.max(scores, -1)
        return nms_ops.batched_nms(
            boxes, best_score, best_cls,
            num_candidates=min(num_candidates, boxes.shape[1]),
            max_outputs=max_det, iou_thresh=iou, score_thresh=conf)

    return step


def init_state(model, key, img_size: int, tx) -> DetTrainState:
    variables = yolo_lib.init_variables(model, key, img_size)
    return DetTrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        ema_params=jax.tree.map(jnp.copy, variables["params"]),
        opt_state=tx.init(variables["params"]), step=jnp.asarray(0))


def train(cfg: ExperimentConfig, data_root: str | Path,
          out_dir: str | Path, augment: bool = False,
          variant: str = "m", epochs: Optional[int] = None,
          img_size: Optional[int] = None, batch_size: Optional[int] = None,
          max_steps: Optional[int] = None, max_boxes: int = 600,
          layout: str = "coco", base_augment: bool = True,
          mosaic: bool = True, close_mosaic: int = 10,
          val_interval: int = 1,
          pretrained: Optional[str] = None,
          dtype: Optional[str] = None,
          allow_pickle: bool = False,
          save_every_steps: Optional[int] = None) -> dict:
    """Train a YOLO detector — see _train_impl for the full docstring.

    dtype: computation dtype, "bfloat16" (default; the reference trains
    under Ultralytics amp=True) or "float32"; params/stats stay f32.

    allow_pickle: opt-in to unpickling full-module torch checkpoints
    (Ultralytics ``.pt`` files store nn.Modules — arbitrary code
    execution on untrusted files; the reference loads its own artifacts
    with weights_only=True). Default False: plain state-dict/safetensors
    exports load without it."""
    import contextlib

    from ..models.layers import bn_dtype_scope
    if dtype is None:      # bf16 on real TPUs; CPU emulates bf16 slowly
        dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    scope = (bn_dtype_scope(jnp.bfloat16) if dtype == "bfloat16"
             else contextlib.nullcontext())
    with scope:
        return _train_impl(
            cfg, data_root, out_dir, augment, variant, epochs, img_size,
            batch_size, max_steps, max_boxes, layout, base_augment,
            mosaic, close_mosaic, val_interval, pretrained,
            jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
            allow_pickle, save_every_steps)


def _train_impl(cfg: ExperimentConfig, data_root, out_dir, augment,
                variant, epochs, img_size, batch_size, max_steps,
                max_boxes, layout, base_augment, mosaic, close_mosaic,
                val_interval, pretrained, model_dtype,
                allow_pickle=False, save_every_steps=None) -> dict:
    """Train a YOLO detector on a COCO- or YOLO-layout dataset root.

    layout="yolo" covers the VID experiments: VisDrone-VID sequences are
    flattened to YOLO-layout frames by data/convert.convert_vid_to_yolo
    (reference: train_vid_{yolo,rtdetr}_{baseline,augmented}.py train on
    visdrone_vid_yolo6/data.yaml).

    val_interval: run a val-split mAP pass every N epochs (and always on the
    final epoch), logging mAP50/mAP50_95 to history and keeping the
    best-mAP50 checkpoint — the Ultralytics per-epoch val/fitness behaviour
    (0 = final-epoch-only, the reference-FRCNN pattern). Skipped when the
    root has no val split.

    pretrained: path to a torch YOLOv8 checkpoint (Ultralytics ``.pt`` or
    an exported state dict) imported via models/pretrained.import_yolov8
    before training — the reference always starts from ``yolov8m.pt``
    (train_yolo_augmented.py:25). Class-count-mismatched head layers keep
    their fresh init.
    """
    from ..parallel import distributed as dist
    tcfg = cfg.train
    epochs = epochs or tcfg.epochs
    img_size = img_size or cfg.data.image_size
    batch_size = batch_size or tcfg.batch_size
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if dist.is_primary():
        artifacts.write_json(out_dir / "config.json", dict(
            dataclasses.asdict(cfg), augment=augment, variant=variant,
            img_size=img_size, batch_size=batch_size, epochs=epochs))

    mesh = mesh_lib.make_mesh(cfg.mesh)
    ctx = mesh_lib.MeshContext(mesh)

    train_samples = (pipe.index_coco(data_root, "train")
                     if layout == "coco"
                     else pipe.index_yolo(data_root, "train"))
    steps_per_epoch = max(1, len(train_samples) // batch_size)
    # multi-host: this process decodes only its row shard and its slice of
    # the global batch; device_put_sharded assembles the global arrays and
    # the data-axis grad psum rides ICI within hosts / DCN across them.
    # batch_size stays the GLOBAL batch (steps_per_epoch is unchanged:
    # local_len/local_bs == global_len/global_bs). Single process: no-ops.
    local_bs = dist.local_batch_size(batch_size)
    train_samples = dist.shard_samples(train_samples)
    total_steps = epochs * steps_per_epoch

    model = yolo_lib.create(6, variant, dtype=model_dtype)
    tx, sched = make_optimizer(lr0=0.01, warmup_steps=min(
        3 * steps_per_epoch, max(1, total_steps // 10)),
        total_steps=total_steps)
    state = init_state(model, jax.random.key(tcfg.seed), img_size, tx)
    if pretrained:
        from ..models import pretrained as pt
        tsd = pt.load_checkpoint_state(pretrained, allow_pickle=allow_pickle)
        newv, report = pt.import_yolov8(
            tsd, {"params": state.params,
                  "batch_stats": state.batch_stats},
            variant=variant, strict_head=False)
        print(f"pretrained import ({pretrained}): {report}")
        state = DetTrainState(
            newv["params"], newv["batch_stats"],
            jax.tree.map(jnp.copy, newv["params"]),
            tx.init(newv["params"]), jnp.asarray(0))
    state = mesh_lib.replicate_tree(ctx, state)

    train_step = jax.jit(
        make_train_step(model, tx, img_size, cfg.corruption, augment,
                        base_augment=base_augment),
        in_shardings=(ctx.replicated, ctx.data, ctx.data, ctx.data, None),
        out_shardings=(ctx.replicated, ctx.replicated),
        donate_argnums=(0,))

    val_samples = validation.index_val_samples(data_root, layout)
    predict_fn = None
    if val_samples:
        predict_fn = jax.jit(
            make_predict_step(model, img_size),
            in_shardings=(ctx.replicated, ctx.data),
            out_shardings=ctx.replicated)

    ckpt = CheckpointManager(out_dir)
    hist = artifacts.HistoryLogger(out_dir)
    key = jax.random.key(tcfg.seed)
    steps = 0
    mean_loss = 0.0     # survives a resume of an already-complete run
    start_epoch = 1
    # restore-and-continue (the reference rewrites last.pth but cannot
    # resume — SURVEY.md §5 checkpoint/resume). Checkpoints are keyed by
    # GLOBAL step with {epoch, batch_in_epoch, epoch_done} metadata: a run
    # killed mid-epoch (with save_every_steps set) resumes at the exact
    # batch — the shuffle order is seed+epoch deterministic and the train
    # step's PRNG folds in state.step, so the resumed stream is the one
    # the uninterrupted run would have seen. (The resumed epoch's logged
    # train_loss averages only the post-resume batches.)
    skip_batches = 0
    restored = ckpt.restore_last(
        {"params": state.params, "batch_stats": state.batch_stats,
         "ema_params": state.ema_params, "opt_state": state.opt_state,
         "step": state.step},
        abstract_extra={"epoch": 0, "batch_in_epoch": 0, "epoch_done": True})
    if restored is not None:
        r = restored["state"]
        state = DetTrainState(r["params"], r["batch_stats"],
                              r["ema_params"], r["opt_state"], r["step"])
        state = mesh_lib.replicate_tree(ctx, state)
        ex = restored["extra"]
        if bool(np.asarray(ex["epoch_done"])):
            start_epoch = int(ex["epoch"]) + 1
        else:
            start_epoch = int(ex["epoch"])
            skip_batches = int(ex["batch_in_epoch"])
        steps = int(jax.device_get(state.step))
    for epoch in range(start_epoch, epochs + 1):
        t0 = time.time()
        losses = []
        # mosaic until the last `close_mosaic` epochs (args.yaml:
        # mosaic=1.0, close_mosaic=10)
        use_mosaic = mosaic and epoch <= max(0, epochs - close_mosaic)
        if use_mosaic:
            from . import augment as aug
            batch_iter = aug.mosaic_batches(
                train_samples, local_bs, img_size, max_boxes=max_boxes,
                seed=tcfg.seed + epoch)
        else:
            batch_iter = pipe.make_batches(
                train_samples, local_bs, img_size, max_boxes=max_boxes,
                shuffle=True, seed=tcfg.seed + epoch, drop_remainder=True)
        k = 0
        if skip_batches:
            import itertools
            batch_iter = itertools.islice(batch_iter, skip_batches, None)
            k = skip_batches
            skip_batches = 0
        batches = pipe.prefetch(batch_iter)
        for batch in batches:
            args = pipe.device_put_sharded(batch, ctx.data)
            state, metrics = train_step(state, args[0], args[1], args[2], key)
            losses.append(metrics["loss"])
            steps += 1
            k += 1
            if save_every_steps and steps % save_every_steps == 0:
                ckpt.save_last(
                    steps, {"params": state.params,
                            "batch_stats": state.batch_stats,
                            "ema_params": state.ema_params,
                            "opt_state": state.opt_state,
                            "step": state.step},
                    extra={"epoch": epoch, "batch_in_epoch": k,
                           "epoch_done": False})
            if max_steps and steps >= max_steps:
                break
        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
        record = dict(epoch=epoch, train_loss=mean_loss,
                      lr=float(sched(steps)),
                      epoch_sec=round(time.time() - t0, 2))
        if validation.should_validate(epoch, epochs, val_interval,
                                      bool(val_samples)):
            vm = validation.run_validation(predict_fn, state, val_samples,
                                           img_size, batch_size, ctx,
                                           max_boxes=max_boxes)
            record.update(vm)
            ckpt.save_best(epoch, _ckpt_payload(state), vm["mAP50"])
        if dist.is_primary():
            hist.log(**record)
        # checkpoint saves stay COLLECTIVE: in a multi-host run every
        # process must call into orbax (it coordinates shard writes)
        ckpt.save_last(steps, {"params": state.params,
                               "batch_stats": state.batch_stats,
                               "ema_params": state.ema_params,
                               "opt_state": state.opt_state,
                               "step": state.step},
                       extra={"epoch": epoch, "batch_in_epoch": k,
                              "epoch_done": True})
        if max_steps and steps >= max_steps:
            break
    if ckpt.best_metric() is None:
        # no val split (or the run broke out before any val pass):
        # final = best, the round-1 behaviour
        ckpt.save_best(epochs, _ckpt_payload(state), 0.0)
    ckpt.close()
    return {"out_dir": str(out_dir), "steps": steps,
            "final_loss": mean_loss}


def _ckpt_payload(state: DetTrainState) -> dict:
    return {"params": state.params, "batch_stats": state.batch_stats,
            "ema_params": state.ema_params}


def load_checkpoint(out_dir: str | Path, variant: str = "m",
                    img_size: int = 64):
    """Load a trained detector checkpoint -> (model, DetTrainState-like)."""
    from ..core.checkpoint import abstract_init
    model = yolo_lib.create(6, variant)
    # eval_shape skeleton: no init compile / device round trips (the r3
    # sweep decomposition found the device init costing seconds per model
    # load through the axon tunnel)
    variables = abstract_init(model, img_size)
    ckpt = CheckpointManager(out_dir)
    target = {"params": variables["params"],
              "batch_stats": variables["batch_stats"],
              "ema_params": variables["params"]}
    restored = ckpt.restore_best(target)
    if restored is None:
        # `last` carries the full resume payload (opt state + step)
        tx, _ = make_optimizer()
        full = dict(target,
                    opt_state=jax.eval_shape(tx.init, variables["params"]),
                    step=jnp.asarray(0))
        latest = ckpt.restore_last(full, abstract_extra={
            "epoch": 0, "batch_in_epoch": 0, "epoch_done": True})
        if latest is None:
            ckpt.close()
            raise FileNotFoundError(f"no checkpoint under {out_dir}")
        restored = latest["state"]
    ckpt.close()
    restored = jax.device_put(restored)     # one batched async transfer
    state = DetTrainState(restored["params"], restored["batch_stats"],
                          restored["ema_params"], None, jnp.asarray(0))
    return model, state
