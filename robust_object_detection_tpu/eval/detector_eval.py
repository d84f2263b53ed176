"""Sharded detector evaluation: testset sweep -> COCO mAP -> JSON/CSV tables.

Reference counterpart: eval_all.py (6 ckpts x 4 testsets, batch-1 per-image
loops + pycocotools). Here each (model, testset) run is a static-shape
batched jitted predict over the data mesh axis; detections come back as
fixed-capacity (max_det) arrays with validity masks, get rescaled to original
image coordinates on host, and feed the vectorised COCOeval-parity scorer
(eval/coco_map.py). Artifact contract matches eval_all.py:322-376
(eval_results.json / .csv with mAP50, mAP50_95, per-class AP@50).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

import jax
import numpy as np

from ..core import artifacts
from ..data import pipeline as pipe
from ..data.visdrone import CLASS_NAMES
from ..parallel import mesh as mesh_lib
from . import coco_map

TESTSET_VARIANTS = ("Test_Clean", "Test_Noise", "Test_Blur", "Test_LowRes")


def evaluate_on_samples(predict_fn: Callable, state, samples,
                        img_size: int, batch_size: int,
                        ctx: Optional[mesh_lib.MeshContext] = None,
                        max_boxes: int = 600) -> Dict:
    """Run a jitted predict fn over samples; returns scorer-ready detections.

    predict_fn(state, images_u8) -> (boxes (B,K,4) canvas-xyxy, scores (B,K),
    classes (B,K), valid (B,K)).
    """
    detections: Dict[int, coco_map.Detections] = {}
    ground_truth: Dict[int, coco_map.GroundTruth] = {}
    n_images = 0
    t0 = time.time()
    # Dispatch the whole testset first, fetch once: a per-batch device_get
    # costs ~50 ms of host sync through the axon tunnel; pipelined dispatch
    # overlaps host decode of batch k+1 with device predict of batch k.
    pending = []
    for batch in pipe.prefetch(pipe.make_batches(
            samples, batch_size, img_size, max_boxes=max_boxes)):
        images = (jax.device_put(batch.images, ctx.data) if ctx
                  else batch.images)
        # keep only the light metadata — holding every decoded canvas for
        # a full testset would pin ~2 GB of host RAM
        meta = (batch.image_ids, batch.scales, batch.num_valid)
        pending.append((meta, predict_fn(state, images)))
    for (image_ids, scales, num_valid), outputs in pending:
        boxes, scores, classes, valid = jax.device_get(outputs)
        for i in range(num_valid):
            img_id = int(image_ids[i])
            s = scales[i]
            v = valid[i]
            b = boxes[i][v] / s                       # canvas -> original px
            sample = samples[n_images + i]
            b[:, 0::2] = b[:, 0::2].clip(0, sample.width)
            b[:, 1::2] = b[:, 1::2].clip(0, sample.height)
            xywh = np.concatenate([b[:, :2], b[:, 2:] - b[:, :2]], 1)
            detections[img_id] = coco_map.Detections(
                boxes=xywh, scores=scores[i][v],
                classes=classes[i][v].astype(np.int64) + 1)
            gb = sample.boxes_xyxy
            gt_xywh = (np.concatenate([gb[:, :2], gb[:, 2:] - gb[:, :2]], 1)
                       if len(gb) else np.zeros((0, 4), np.float32))
            ground_truth[img_id] = coco_map.GroundTruth(
                boxes=gt_xywh, classes=sample.classes.astype(np.int64) + 1)
        n_images += num_valid
    elapsed = time.time() - t0
    result = coco_map.evaluate(detections, ground_truth,
                               categories=list(range(1, 7)))
    summary = coco_map.summarize(result)
    summary["per_class_ap50"] = {
        CLASS_NAMES[c - 1]: v for c, v in result.per_class_ap50.items()}
    summary["images"] = n_images
    summary["images_per_sec"] = round(n_images / max(elapsed, 1e-9), 2)
    return summary


def evaluate_testsets(predict_fn: Callable, state, testset_root: str | Path,
                      img_size: int, batch_size: int,
                      ctx: Optional[mesh_lib.MeshContext] = None,
                      variants: Sequence[str] = TESTSET_VARIANTS,
                      layout: str = "coco6") -> Dict[str, Dict]:
    """One model over the 4 frozen testsets -> {variant: summary}."""
    root = Path(testset_root) / layout
    out = {}
    for variant in variants:
        vdir = root / variant
        samples = (pipe.index_coco(vdir, "val")
                   if layout.startswith("coco6")
                   else pipe.index_yolo(vdir, "val"))
        out[variant] = evaluate_on_samples(
            predict_fn, state, samples, img_size, batch_size, ctx)
    return out


def sweep(models: Dict[str, tuple], testset_root: str | Path,
          img_size: int, batch_size: int, out_dir: str | Path,
          ctx: Optional[mesh_lib.MeshContext] = None,
          layout: str = "coco6",
          results_name: str = "eval_results") -> Dict:
    """The full (model x testset) sweep + artifact output.

    models: name -> (predict_fn, state). Writes <out_dir>/<results_name>.json
    and .csv in the reference's shape (eval_all.py:322-376) and prints the
    summary/degradation tables (eval_all.py:262-319).
    """
    out_dir = Path(out_dir)
    results: Dict[str, Dict[str, Dict]] = {}
    for name, (predict_fn, state) in models.items():
        results[name] = evaluate_testsets(
            predict_fn, state, testset_root, img_size, batch_size, ctx,
            layout=layout)

    rows = []
    for name, per_variant in results.items():
        for variant, summary in per_variant.items():
            row = {"model": name, "testset": variant,
                   "mAP50": round(summary["mAP50"], 4),
                   "mAP50_95": round(summary["mAP50_95"], 4),
                   "images_per_sec": summary["images_per_sec"]}
            rows.append(row)
    artifacts.write_json(out_dir / f"{results_name}.json", results)
    artifacts.write_csv(out_dir / f"{results_name}.csv", rows)

    print(artifacts.format_table(
        ["model", "testset", "mAP50", "mAP50_95", "img/s"],
        [[r["model"], r["testset"], r["mAP50"], r["mAP50_95"],
          r["images_per_sec"]] for r in rows]))
    print()
    print(per_class_table(results))
    print()
    print(degradation_table(results))
    comparison = comparison_table(results)
    if comparison:
        # Aug - Base deltas, printed on every sweep like the reference
        # (eval_all.py:253-256,303-319); empty when no _baseline/_augmented
        # model-name pairs are present.
        print()
        print("Aug - Base mAP50 difference:")
        print(comparison)
    return results


def per_class_table(results: Dict[str, Dict[str, Dict]],
                    variant: str = "Test_Clean") -> str:
    """Per-class AP@50 on one testset (eval_all.py:146-156 extracts the
    per-class precision slice; the reference prints it per run)."""
    rows = []
    for name, per_variant in results.items():
        summary = per_variant.get(variant, {})
        per_class = summary.get("per_class_ap50", {})
        rows.append([name] + [round(per_class.get(c, 0.0), 4)
                              for c in CLASS_NAMES])
    return (f"per-class AP@50 ({variant}):\n"
            + artifacts.format_table(["model"] + list(CLASS_NAMES), rows))


def degradation_table(results: Dict[str, Dict[str, Dict]]) -> str:
    """Per-model % mAP50 drop vs Clean (eval_all.py:283-301)."""
    rows = []
    for name, per_variant in results.items():
        clean = per_variant.get("Test_Clean", {}).get("mAP50", 0.0)
        row = [name]
        for variant in ("Test_Noise", "Test_Blur", "Test_LowRes"):
            v = per_variant.get(variant, {}).get("mAP50", 0.0)
            drop = 100.0 * (clean - v) / clean if clean > 0 else 0.0
            row.append(round(drop, 1))
        rows.append(row)
    return artifacts.format_table(
        ["model", "Noise drop%", "Blur drop%", "LowRes drop%"], rows,
        floatfmt="{:.1f}")


def comparison_table(results: Dict[str, Dict[str, Dict]],
                     base_suffix: str = "_baseline",
                     aug_suffix: str = "_augmented") -> str:
    """Aug - Base mAP50 difference per testset (eval_all.py:303-319)."""
    rows = []
    bases = [m for m in results if m.endswith(base_suffix)]
    for base in bases:
        stem = base[: -len(base_suffix)]
        aug = stem + aug_suffix
        if aug not in results:
            continue
        row = [stem]
        for variant in TESTSET_VARIANTS:
            d = (results[aug][variant]["mAP50"]
                 - results[base][variant]["mAP50"])
            row.append(round(d, 4))
        rows.append(row)
    if not rows:
        return ""
    return artifacts.format_table(
        ["model", "Clean", "Noise", "Blur", "LowRes"], rows)
