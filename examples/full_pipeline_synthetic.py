"""Miniature end-to-end run of the ENTIRE reference workflow on synthetic
data: convert -> frozen testsets -> train U-Net + 3 detector families
(baseline & augmented) -> restore testsets -> 3-strategy eval sweep ->
tables + figures + demo strips.

This is the reference's 36-DET-run experiment at toy scale (few images,
128 px, a handful of steps) — it validates that every stage chains through
the real public API on the current backend. Run time: ~10 min on v5e-1,
~15 min on the CPU mesh.

Usage: python examples/full_pipeline_synthetic.py [out_dir]
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import jax
import numpy as np


def main(out_root=None):
    t_start = time.time()
    out_root = Path(out_root or tempfile.mkdtemp(prefix="rod_e2e_"))
    print(f"[e2e] devices={jax.devices()} out={out_root}")

    from robust_object_detection_tpu.core.config import (CorruptionConfig,
                                                         ExperimentConfig,
                                                         MeshConfig,
                                                         RestorationConfig,
                                                         TrainConfig)
    from robust_object_detection_tpu.data import (convert, pipeline,
                                                  restore, synthetic)
    from robust_object_detection_tpu.data import testsets as ts
    from robust_object_detection_tpu.eval import detector_eval as DE
    from robust_object_detection_tpu.report import demo, plots

    IMG = 128
    cfg = ExperimentConfig(
        train=TrainConfig(seed=42),
        restoration=RestorationConfig(channels=(8, 16), patch_size=64,
                                      epochs=2, batch_size=8, val_every=1),
        mesh=MeshConfig(data=1, model=1))

    # L1: dataset prep -------------------------------------------------
    det = synthetic.make_det_split(out_root / "raw" / "train", n_images=12,
                                   seed=1, size_range=((96, 97), (112, 113)))
    val = synthetic.make_det_split(out_root / "raw" / "val", n_images=8,
                                   seed=2, size_range=((96, 97), (112, 113)))
    coco = out_root / "proc" / "visdrone_coco6"
    yolo = out_root / "proc" / "visdrone_yolo6"
    convert.convert_det_to_coco(det, coco, "train")
    convert.convert_det_to_coco(val, coco, "val")
    convert.convert_det_to_yolo(val, yolo, "val")
    ts.build_all(out_root / "proc", out_root / "testsets", cfg.corruption)
    print("[e2e] L1 done: testsets",
          list(ts.testset_manifest(out_root / "testsets"))[:2], "...")

    # L4/L5: restoration -----------------------------------------------
    from robust_object_detection_tpu.train import restoration as rtrain
    r = rtrain.train(cfg, coco / "images" / "train", coco / "images" / "val",
                     out_dir=out_root / "experiments" / "restoration",
                     max_steps=4)
    print(f"[e2e] restoration trained: PSNR={r['best']['psnr']:.1f}")

    restore.restore_testsets(out_root / "testsets",
                             out_root / "experiments" / "restoration",
                             channels=(8, 16), batch_size=4)
    print("[e2e] testsets restored")

    # L5: detectors (3 families x baseline/augmented) -------------------
    models = {}
    from robust_object_detection_tpu.train import detector as yolo_t
    for mode, augment in (("baseline", False), ("augmented", True)):
        out = out_root / "experiments" / "yolo" / mode
        yolo_t.train(cfg, coco, out, augment=augment, variant="n",
                     epochs=1, img_size=IMG, batch_size=4, max_boxes=64,
                     max_steps=3, mosaic=False)
        model, state = yolo_t.load_checkpoint(out, variant="n",
                                              img_size=IMG)
        models[f"yolov8n_{mode}"] = (
            jax.jit(yolo_t.make_predict_step(model, IMG, max_det=100)),
            state)
    print("[e2e] yolo trained (base+aug)")

    from robust_object_detection_tpu.models import frcnn as F
    from robust_object_detection_tpu.train import frcnn as frcnn_t
    small = F.FrcnnConfig(pre_nms_topk=256, num_proposals=64, roi_batch=64,
                          rpn_batch=64)
    fout = out_root / "experiments" / "frcnn" / "baseline"
    import dataclasses
    import jax.numpy as jnp
    fmodel = F.FasterRCNN(small)
    ftx, _ = frcnn_t.make_optimizer()
    fstate = frcnn_t.init_state(fmodel, jax.random.key(0), IMG, ftx)
    fstep = jax.jit(frcnn_t.make_train_step(fmodel, ftx, IMG,
                                            cfg.corruption, True))
    samples = pipeline.index_coco(coco, "train")
    for batch in pipeline.make_batches(samples, 2, IMG, max_boxes=64,
                                       drop_remainder=True):
        fstate, fm = fstep(fstate, jnp.asarray(batch.images),
                           jnp.asarray(batch.boxes),
                           jnp.asarray(batch.classes), jax.random.key(0))
        break
    models["frcnn_baseline"] = (
        jax.jit(frcnn_t.make_predict_step(fmodel, IMG)), fstate)
    print(f"[e2e] frcnn step: loss={float(jax.device_get(fm['loss'])):.2f}")

    from robust_object_detection_tpu.models import rtdetr as R
    from robust_object_detection_tpu.train import rtdetr as rt
    rmodel = R.RTDETR(R.RtDetrConfig(queries=40, dec_layers=2))
    rtx, _ = rt.make_optimizer()
    rstate = rt.init_state(rmodel, jax.random.key(0), IMG, rtx)
    rstep = jax.jit(rt.make_train_step(rmodel, rtx, IMG, cfg.corruption,
                                       True, dn_max_gt=8))
    for batch in pipeline.make_batches(samples, 2, IMG, max_boxes=64,
                                       drop_remainder=True):
        rstate, rm = rstep(rstate, jnp.asarray(batch.images),
                           jnp.asarray(batch.boxes),
                           jnp.asarray(batch.classes), jax.random.key(0))
        break
    models["rtdetr_baseline"] = (
        jax.jit(rt.make_predict_step(rmodel, IMG, max_det=100)), rstate)
    print(f"[e2e] rtdetr step: loss={float(jax.device_get(rm['loss'])):.2f}"
          f" (dn={float(jax.device_get(rm['dn'])):.2f})")

    # L6: the sweep over frozen + restored testsets ---------------------
    results = DE.sweep(models, out_root / "testsets", IMG, 4,
                       out_root / "experiments")
    restored = DE.sweep(
        {k: v for k, v in models.items() if k.endswith("_baseline")},
        out_root / "testsets", IMG, 4, out_root / "experiments",
        layout="coco6_restored", results_name="eval_restored_results")
    print(DE.comparison_table(results))

    # L7: figures + demo -------------------------------------------------
    def to_plot(res):
        return {m: {v: s for v, s in pv.items()} for m, pv in res.items()}

    figs = plots.det_figure_suite(to_plot(results),
                                  out_root / "experiments" / "figures")
    figs += plots.three_strategy_suite(
        to_plot(results), to_plot(restored),
        out_root / "experiments" / "figures")
    val_samples = pipeline.index_coco(coco, "val")
    strips = demo.run_demo(
        val_samples, models["yolov8n_baseline"][0],
        models["yolov8n_augmented"][0], models["yolov8n_baseline"][1],
        models["yolov8n_augmented"][1],
        out_root / "experiments" / "demo", IMG, "yolov8n", n_images=2)
    print(f"[e2e] {len(figs)} figures, {len(strips)} demo strips")

    summary = {
        "out": str(out_root),
        "eval_results": str(out_root / "experiments" / "eval_results.json"),
        "runs": sum(len(v) for v in results.values()) +
                sum(len(v) for v in restored.values()),
        "wall_s": round(time.time() - t_start, 1),
    }
    print("[e2e] DONE", json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
