"""Typed CLI — one subcommand per reference entry point.

The reference exposes its pipeline as `python -m scripts.<name>` modules
configured by editing module-level constants (SURVEY.md §5 config). Here:
``python -m robust_object_detection_tpu.cli <command> [flags]`` with every
knob a flag over the typed config tree (core/config.py).

Commands mirror README.md:220-301's CLI surface:
  convert-det-coco / convert-det-yolo / convert-vid-yolo
  build-testsets          (build_corrupted_testsets.py)
  train-restoration       (train_restoration.py)
  restore-testsets        (restore_testsets.py)
  train-detector          (train_{frcnn,yolo,rtdetr}_{baseline,augmented}.py)
  eval / eval-restored / eval-vid   (eval_all.py / eval_restored.py / eval_vid.py)
  plot / plot-three / plot-vid      (plot_*.py)
  demo                    (demo_inference.py)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _cfg(args) -> "ExperimentConfig":
    from .core import config as config_lib
    if getattr(args, "config", None):
        return config_lib.load(args.config)
    return config_lib.ExperimentConfig()


def cmd_convert_det_coco(args):
    from .data import convert
    stats = convert.convert_det_to_coco(args.src, args.out, args.split)
    print(f"[convert-det-coco] {stats}")


def cmd_convert_det_yolo(args):
    from .data import convert
    stats = convert.convert_det_to_yolo(args.src, args.out, args.split)
    print(f"[convert-det-yolo] {stats}")


def cmd_convert_vid_yolo(args):
    from .data import convert
    stats = convert.convert_vid_to_yolo(args.src, args.out, args.split)
    print(f"[convert-vid-yolo] {stats}")


def cmd_build_testsets(args):
    from .data import testsets
    cfg = _cfg(args)
    testsets.build_all(args.processed_root, args.out, cfg.corruption,
                       seed=args.seed)
    print(json.dumps(testsets.testset_manifest(args.out), indent=2))


def cmd_train_restoration(args):
    from .train import restoration
    cfg = _cfg(args)
    out = restoration.train(cfg, args.train_dir, args.val_dir,
                            out_dir=args.out, max_steps=args.max_steps)
    print(json.dumps(out))


def cmd_restore_testsets(args):
    from .data import restore
    counts = restore.restore_testsets(args.testset_root, args.unet_dir,
                                      batch_size=args.batch_size)
    print(json.dumps(counts, indent=2))


def cmd_train_detector(args):
    cfg = _cfg(args)
    if args.model == "yolo":
        from .train import detector
        out = detector.train(cfg, args.data_root, args.out,
                             augment=args.augment, variant=args.variant,
                             epochs=args.epochs, img_size=args.img_size,
                             batch_size=args.batch_size,
                             max_steps=args.max_steps,
                             layout=args.data_layout,
                             pretrained=args.pretrained,
                             dtype=args.dtype,
                             allow_pickle=args.allow_pickle)
    elif args.model == "frcnn":
        from .train import frcnn
        out = frcnn.train(cfg, args.data_root, args.out,
                          augment=args.augment, epochs=args.epochs or 24,
                          img_size=args.img_size,
                          batch_size=args.batch_size or 2,
                          max_steps=args.max_steps,
                          pretrained=args.pretrained,
                          dtype=args.dtype,
                          allow_pickle=args.allow_pickle,
                          trainable_layers=args.trainable_layers)
    elif args.model == "rtdetr":
        from .train import rtdetr
        out = rtdetr.train(cfg, args.data_root, args.out,
                           augment=args.augment, epochs=args.epochs or 100,
                           img_size=args.img_size,
                           batch_size=args.batch_size or 4,
                           max_steps=args.max_steps,
                           layout=args.data_layout,
                           pretrained=args.pretrained,
                           dtype=args.dtype,
                           allow_pickle=args.allow_pickle)
    else:
        raise SystemExit(f"unknown model {args.model!r}")
    print(json.dumps(out))


def _load_models(entries, img_size, frcnn_native_res=False):
    """entries: list of 'name=kind:ckpt_dir' -> {name: (predict, state)}."""
    import jax
    models = {}
    for e in entries:
        name, spec = e.split("=", 1)
        kind, ckpt = spec.split(":", 1)
        if kind == "yolo":
            from .train import detector
            model, state = detector.load_checkpoint(ckpt, img_size=img_size)
            predict = jax.jit(detector.make_predict_step(model, img_size))
        elif kind == "frcnn":
            from .eval import detector_eval
            from .train import frcnn
            model, state = frcnn.load_checkpoint(ckpt, img_size=img_size)
            if frcnn_native_res:
                # torchvision GeneralizedRCNNTransform parity: min800 /
                # max1333 per-image scale via static aspect buckets
                # (eval_all.py:103 evaluates at native scale, batch 1)
                predict = detector_eval.BucketedPredict(
                    lambda b, _m=model: jax.jit(
                        frcnn.make_predict_step(_m, b)))
            else:
                predict = jax.jit(frcnn.make_predict_step(model, img_size))
        elif kind == "rtdetr":
            from .train import rtdetr
            model, state = rtdetr.load_checkpoint(ckpt, img_size=img_size)
            predict = jax.jit(rtdetr.make_predict_step(model, img_size))
        else:
            raise SystemExit(f"unknown model kind {kind!r}")
        models[name] = (predict, state)
    return models


def cmd_eval(args):
    from .eval import detector_eval
    models = _load_models(args.model, args.img_size,
                          getattr(args, "frcnn_native_res", False))
    detector_eval.sweep(models, args.testset_root, args.img_size,
                        args.batch_size, args.out, layout=args.layout,
                        results_name=args.results_name)


def cmd_eval_fused(args):
    """Fused on-device sweep: corrupt -> restore -> detect chained per
    batch on device (eval/fused_sweep.py). Takes the CLEAN val split —
    corrupted variants are generated on device — and emits the same 8-pass
    (4 variants x {corrupted, restored}) summaries as the disk sweep.
    The disk path (build-testsets / restore-testsets / eval) remains the
    frozen-testset parity path; this is the production throughput path."""
    from pathlib import Path
    from .core import artifacts
    from .data import pipeline as pipe
    from .eval import fused_sweep
    from .eval.detector_eval import BucketedPredict
    models = _load_models(args.model, args.img_size)
    unet_model = unet_vars = None
    if args.unet_dir:
        from .train.restoration import load_best
        unet_model, unet_vars = load_best(args.unet_dir)
    samples = pipe.index_coco(args.data_root, args.split)
    results = {}
    rows = []
    parity = getattr(args, "mt19937_parity", "off")
    for name, (predict, state) in models.items():
        if isinstance(predict, BucketedPredict):
            raise SystemExit("--frcnn-native-res is not supported in the "
                             "fused sweep (single-canvas letterbox path)")
        rng = None
        if parity != "off":
            # coco6 draws come AFTER the yolo6 layout's (same val images);
            # see fused_sweep.frozen_noise_rng
            rng = fused_sweep.frozen_noise_rng(
                skip_splits=([samples] if parity == "coco6" else []))
        out = fused_sweep.run_fused_sweep(
            predict, state, unet_model, unet_vars, samples, args.img_size,
            args.batch_size, mt19937_rng=rng)
        results[name] = out
        for strategy in fused_sweep.STRATEGIES:
            if strategy not in out:
                continue
            for variant, s in out[strategy].items():
                rows.append([name, strategy, variant,
                             round(s["mAP50"], 4), round(s["mAP50_95"], 4),
                             out["images_per_sec"]])
    artifacts.write_json(Path(args.out) / "fused_eval_results.json", results)
    print(artifacts.format_table(
        ["model", "strategy", "testset", "mAP50", "mAP50_95",
         "sweep img/s"], rows))


def cmd_validate(args):
    """Structural dataset checks (reference: paths.check_dataset,
    paths.py:11-23, + the converters' kept/removed audits)."""
    from pathlib import Path
    root = Path(args.root)
    problems = []
    if args.kind == "visdrone-det":
        for sub in ("images", "annotations"):
            if not (root / sub).is_dir():
                problems.append(f"missing {root / sub}")
        n_img = len(list((root / "images").glob("*.jpg")))
        n_ann = len(list((root / "annotations").glob("*.txt")))
        print(f"[validate] images={n_img} annotations={n_ann}")
        if n_img == 0:
            problems.append("no images")
    elif args.kind == "coco":
        ann = root / "annotations" / f"instances_{args.split}.json"
        if not ann.exists():
            problems.append(f"missing {ann}")
        else:
            from .data.convert import load_coco
            idx = load_coco(ann)
            n_missing = sum(
                1 for im in idx["images"].values()
                if not (root / "images" / args.split /
                        im["file_name"]).exists())
            n_boxes = sum(len(v) for v in idx["anns_by_image"].values())
            print(f"[validate] images={len(idx['images'])} "
                  f"annotations={n_boxes} missing_files={n_missing}")
            if n_missing:
                problems.append(f"{n_missing} image files missing")
    else:   # yolo
        n_img = len(list((root / "images" / args.split).glob("*.jpg")))
        n_lbl = len(list((root / "labels" / args.split).glob("*.txt")))
        print(f"[validate] images={n_img} labels={n_lbl}")
        if not (root / "data.yaml").exists():
            problems.append("missing data.yaml")
    if problems:
        raise SystemExit("[validate] FAILED: " + "; ".join(problems))
    print("[validate] OK")


def cmd_eval_restored(args):
    """eval_restored.py: baseline checkpoints swept over the U-Net-restored
    testsets (``<layout>_restored`` roots, eval_restored_results.json —
    eval_restored.py:42-43,212)."""
    args.layout = (args.layout if args.layout.endswith("_restored")
                   else args.layout + "_restored")
    args.results_name = "eval_restored_results"
    cmd_eval(args)


def cmd_eval_vid(args):
    """eval_vid.py: VID checkpoints evaluated on the DET testsets
    (docs/07_vid_experiment.md:127-134 — deliberate design)."""
    args.results_name = "vid_eval_results"
    cmd_eval(args)


def cmd_demo(args):
    import jax
    from .data import pipeline
    from .report import demo
    models = _load_models([f"base={args.base}", f"aug={args.aug}"],
                          args.img_size)
    samples = pipeline.index_coco(args.data_root, "val")
    (pb, sb), (pa, sa) = models["base"], models["aug"]
    paths = demo.run_demo(samples, pb, pa, sb, sa, args.out, args.img_size,
                          args.name, n_images=args.n)
    print("\n".join(str(p) for p in paths))


def cmd_plot(args):
    from .core import artifacts
    from .report import plots
    results = artifacts.read_json(args.results)
    paths = plots.det_figure_suite(results, args.out, prefix=args.prefix)
    print("\n".join(str(p) for p in paths))


def cmd_plot_three(args):
    from .core import artifacts
    from .report import plots
    results = artifacts.read_json(args.results)
    restored = artifacts.read_json(args.restored)
    paths = plots.three_strategy_suite(results, restored, args.out)
    print("\n".join(str(p) for p in paths))


def main(argv=None):
    p = argparse.ArgumentParser(prog="robust_object_detection_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add(name, fn, *specs):
        sp = sub.add_parser(name)
        for flags, kw in specs:
            sp.add_argument(*flags, **kw)
        sp.add_argument("--config", default=None,
                        help="ExperimentConfig JSON")
        sp.set_defaults(fn=fn)
        return sp

    for cname, fn in (("convert-det-coco", cmd_convert_det_coco),
                      ("convert-det-yolo", cmd_convert_det_yolo),
                      ("convert-vid-yolo", cmd_convert_vid_yolo)):
        add(cname, fn,
            (("--src",), {"required": True}),
            (("--out",), {"required": True}),
            (("--split",), {"default": "val"}))

    add("build-testsets", cmd_build_testsets,
        (("--processed-root",), {"required": True}),
        (("--out",), {"required": True}),
        (("--seed",), {"type": int, "default": 42}))

    add("train-restoration", cmd_train_restoration,
        (("--train-dir",), {"required": True}),
        (("--val-dir",), {"required": True}),
        (("--out",), {"required": True}),
        (("--max-steps",), {"type": int, "default": None}))

    add("restore-testsets", cmd_restore_testsets,
        (("--testset-root",), {"required": True}),
        (("--unet-dir",), {"required": True}),
        (("--batch-size",), {"type": int, "default": 8}))

    add("train-detector", cmd_train_detector,
        (("--model",), {"required": True,
                        "choices": ["yolo", "frcnn", "rtdetr"]}),
        (("--data-root",), {"required": True}),
        (("--out",), {"required": True}),
        (("--augment",), {"action": "store_true"}),
        (("--variant",), {"default": "m"}),
        (("--epochs",), {"type": int, "default": None}),
        (("--img-size",), {"type": int, "default": 1024}),
        (("--batch-size",), {"type": int, "default": None}),
        (("--max-steps",), {"type": int, "default": None}),
        (("--data-layout",), {"default": "coco",
                              "choices": ["coco", "yolo"],
                              "help": "yolo = VID-flattened layout"}),
        (("--pretrained",), {"default": None,
                             "help": "torch checkpoint to import "
                                     "(yolov8m.pt-style, reference "
                                     "train_yolo_augmented.py:25)"}),
        (("--allow-pickle",), {"action": "store_true",
                               "help": "permit unpickling module-bearing "
                                       ".pt checkpoints (runs arbitrary "
                                       "code — only for trusted files; "
                                       "state-dict exports don't need "
                                       "it)"}),
        (("--dtype",), {"default": None,
                        "choices": ["bfloat16", "float32"],
                        "help": "compute dtype (default: bfloat16 on "
                                "TPU, float32 elsewhere)"}),
        (("--trainable-layers",), {"type": int, "default": None,
                                   "help": "FRCNN only: torchvision "
                                           "trainable_backbone_layers "
                                           "0..5 (default 3 when "
                                           "--pretrained, else 5)"}))

    add("eval", cmd_eval,
        (("--model",), {"action": "append", "required": True,
                        "help": "name=kind:ckpt_dir (repeatable)"}),
        (("--frcnn-native-res",), {"action": "store_true",
                                   "help": "evaluate FRCNN at torchvision "
                                           "min800/max1333 native scale "
                                           "via static aspect buckets"}),
        (("--testset-root",), {"required": True}),
        (("--img-size",), {"type": int, "default": 1024}),
        (("--batch-size",), {"type": int, "default": 8}),
        (("--layout",), {"default": "coco6"}),
        (("--results-name",), {"default": "eval_results"}),
        (("--out",), {"default": "experiments"}))

    add("eval-fused", cmd_eval_fused,
        (("--model",), {"action": "append", "required": True,
                        "help": "name=kind:ckpt_dir (repeatable)"}),
        (("--data-root",), {"required": True,
                            "help": "COCO-layout CLEAN val split (e.g. "
                                    "processed/visdrone_coco6) — variants "
                                    "are generated on device"}),
        (("--split",), {"default": "val"}),
        (("--unet-dir",), {"default": None,
                           "help": "restoration run dir; omit to skip "
                                   "the restored stream (4 passes)"}),
        (("--img-size",), {"type": int, "default": 1024}),
        (("--batch-size",), {"type": int, "default": 8}),
        (("--mt19937-parity",), {"default": "off",
                                 "choices": ["off", "yolo6", "coco6"],
                                 "help": "replay the frozen MT19937 noise "
                                         "stream (host-drawn planes) for "
                                         "this layout instead of device "
                                         "Threefry — bit-parity with the "
                                         "disk testsets on lossless "
                                         "sources"}),
        (("--out",), {"default": "experiments"}))

    add("validate", cmd_validate,
        (("--root",), {"required": True}),
        (("--kind",), {"default": "coco",
                       "choices": ["visdrone-det", "coco", "yolo"]}),
        (("--split",), {"default": "val"}))

    add("eval-restored", cmd_eval_restored,
        (("--model",), {"action": "append", "required": True,
                        "help": "name=kind:ckpt_dir (repeatable)"}),
        (("--frcnn-native-res",), {"action": "store_true",
                                   "help": "evaluate FRCNN at torchvision "
                                           "min800/max1333 native scale "
                                           "via static aspect buckets"}),
        (("--testset-root",), {"required": True}),
        (("--img-size",), {"type": int, "default": 1024}),
        (("--batch-size",), {"type": int, "default": 8}),
        (("--layout",), {"default": "coco6",
                         "help": "'_restored' suffix added if absent"}),
        (("--out",), {"default": "experiments"}))

    add("eval-vid", cmd_eval_vid,
        (("--model",), {"action": "append", "required": True}),
        (("--frcnn-native-res",), {"action": "store_true",
                                   "help": "evaluate FRCNN at torchvision "
                                           "min800/max1333 native scale "
                                           "via static aspect buckets"}),
        (("--testset-root",), {"required": True}),
        (("--img-size",), {"type": int, "default": 1024}),
        (("--batch-size",), {"type": int, "default": 8}),
        (("--layout",), {"default": "coco6"}),
        (("--out",), {"default": "experiments"}))

    add("demo", cmd_demo,
        (("--base",), {"required": True, "help": "kind:ckpt_dir"}),
        (("--aug",), {"required": True, "help": "kind:ckpt_dir"}),
        (("--data-root",), {"required": True}),
        (("--img-size",), {"type": int, "default": 1024}),
        (("--name",), {"default": "model"}),
        (("--n",), {"type": int, "default": 5}),
        (("--out",), {"default": "experiments/demo"}))

    add("plot", cmd_plot,
        (("--results",), {"required": True}),
        (("--out",), {"default": "experiments/figures"}),
        (("--prefix",), {"default": ""}))

    add("plot-three", cmd_plot_three,
        (("--results",), {"required": True}),
        (("--restored",), {"required": True}),
        (("--out",), {"default": "experiments/figures"}))

    # plot-vid = the DET figure suite over vid_eval_results.json with the
    # vid_ filename prefix (plot_vid_results.py)
    sp = sub.add_parser("plot-vid")
    sp.add_argument("--results", required=True)
    sp.add_argument("--out", default="experiments/figures")
    sp.add_argument("--prefix", default="vid_")
    sp.add_argument("--config", default=None)
    sp.set_defaults(fn=cmd_plot)

    args = p.parse_args(argv)
    # multi-host entry: env-driven jax.distributed.initialize (no-op on a
    # single host) — must precede the first backend touch in any command
    from .parallel import distributed
    distributed.maybe_initialize()
    args.fn(args)


if __name__ == "__main__":
    main()
