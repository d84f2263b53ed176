"""End-to-end pipeline on synthetic data: convert -> testsets -> restore ->
eval sweep -> figures -> demo. This is the reference's full L1->L7 dataflow
(SURVEY.md §1) exercised in miniature on the CPU mesh."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from robust_object_detection_tpu.core.config import (CorruptionConfig,
                                                     ExperimentConfig,
                                                     MeshConfig,
                                                     RestorationConfig)
from robust_object_detection_tpu.data import (convert, pipeline, restore,
                                              synthetic)
from robust_object_detection_tpu.data import testsets as ts
from robust_object_detection_tpu.eval import detector_eval as DE

pytestmark = pytest.mark.slow    # compiles jitted train steps on the CPU mesh


@pytest.fixture(scope="module")
def pipeline_root(tmp_path_factory):
    """Synthetic dataset -> processed -> frozen testsets, shared by tests."""
    root = tmp_path_factory.mktemp("e2e")
    det = synthetic.make_det_split(root / "raw", n_images=6,
                                   size_range=((64, 65), (80, 81)))
    convert.convert_det_to_coco(det, root / "proc" / "visdrone_coco6", "val")
    convert.convert_det_to_coco(det, root / "proc" / "visdrone_coco6",
                                "train")
    convert.convert_det_to_yolo(det, root / "proc" / "visdrone_yolo6", "val")
    ts.build_all(root / "proc", root / "testsets")
    return root


def _fake_predict_factory(samples, size, cap=32, score=0.9):
    """Echo the GT as detections (canvas coords)."""
    state = {"i": 0}

    def predict(_, images):
        b = images.shape[0]
        boxes = np.zeros((b, cap, 4), np.float32)
        scores = np.zeros((b, cap), np.float32)
        classes = np.zeros((b, cap), np.int32)
        valid = np.zeros((b, cap), bool)
        for j in range(b):
            k = state["i"] + j
            if k >= len(samples):
                continue
            s = samples[k]
            sc = min(size / s.height, size / s.width)
            m = min(len(s.boxes_xyxy), cap)
            boxes[j, :m] = s.boxes_xyxy[:m] * sc
            scores[j, :m] = score
            classes[j, :m] = s.classes[:m]
            valid[j, :m] = True
        state["i"] += b
        return boxes, scores, classes, valid

    return predict


def test_restore_and_sweep(pipeline_root, tmp_path):
    """Train a tiny U-Net, restore the testsets, sweep both roots."""
    from robust_object_detection_tpu.train import restoration as rtrain

    cfg = ExperimentConfig(
        restoration=RestorationConfig(channels=(8, 16), patch_size=32,
                                      epochs=1, batch_size=8, val_every=1),
        mesh=MeshConfig(data=8, model=1))
    unet_dir = tmp_path / "unet"
    out = rtrain.train(
        cfg, pipeline_root / "proc" / "visdrone_coco6" / "images" / "val",
        pipeline_root / "proc" / "visdrone_coco6" / "images" / "val",
        out_dir=unet_dir, max_steps=2)
    assert out["best"]["psnr"] > 0

    counts = restore.restore_testsets(pipeline_root / "testsets", unet_dir,
                                      channels=(8, 16), batch_size=4)
    assert counts["coco6/Test_Blur"] == 6
    assert counts["coco6/Test_Clean"] == 6
    rdir = pipeline_root / "testsets" / "coco6_restored"
    assert len(list((rdir / "Test_Blur" / "images" / "val").glob(
        "*.jpg"))) == 6
    # annotations copied through
    assert (rdir / "Test_Blur" / "annotations" /
            "instances_val.json").exists()

    # restored Blur differs from corrupted Blur (the U-Net did something)
    from PIL import Image
    name = "img0000.jpg"
    corr = np.asarray(Image.open(
        pipeline_root / "testsets" / "coco6" / "Test_Blur" / "images" /
        "val" / name)).astype(int)
    rest = np.asarray(Image.open(
        rdir / "Test_Blur" / "images" / "val" / name)).astype(int)
    assert np.abs(corr - rest).mean() > 0.01

    # sweep over both roots with a GT-echo predictor -> mAP ~1 everywhere
    size, bs = 64, 2
    results = {}
    for layout, rname in (("coco6", "eval_results"),
                          ("coco6_restored", "eval_restored_results")):
        samples0 = pipeline.index_coco(
            pipeline_root / "testsets" / layout / "Test_Clean", "val")
        models = {"yolov8m_baseline":
                  (_fake_predict_factory(samples0, size), None)}

        # fresh per-variant counters: wrap sweep manually
        def per_variant_models():
            return {name: (_fake_predict_factory(
                pipeline.index_coco(
                    pipeline_root / "testsets" / layout / "Test_Clean",
                    "val"), size), None) for name in ("yolov8m_baseline",)}

        out_results = {}
        for variant in DE.TESTSET_VARIANTS:
            vdir = pipeline_root / "testsets" / layout / variant
            samples = pipeline.index_coco(vdir, "val")
            predict = _fake_predict_factory(samples, size)
            out_results.setdefault("yolov8m_baseline", {})[variant] = \
                DE.evaluate_on_samples(predict, None, samples, size, bs,
                                       max_boxes=32)
        results[rname] = out_results
        for variant, summary in out_results["yolov8m_baseline"].items():
            assert summary["mAP50"] > 0.99, (layout, variant, summary)

    # degradation/comparison tables render
    print(DE.degradation_table(results["eval_results"]))


def test_sweep_prints_all_tables(pipeline_root, tmp_path, capsys):
    """sweep() prints the summary, per-class AP@50, degradation AND the
    Aug-Base comparison tables — the reference prints all of them on every
    run (eval_all.py:253-256,262-319)."""
    def zero_predict(_, images):
        b = images.shape[0]
        return (np.zeros((b, 8, 4), np.float32),
                np.zeros((b, 8), np.float32),
                np.zeros((b, 8), np.int32), np.zeros((b, 8), bool))

    models = {"yolov8m_baseline": (zero_predict, None),
              "yolov8m_augmented": (zero_predict, None)}
    DE.sweep(models, pipeline_root / "testsets", 64, 2, tmp_path / "out")
    out = capsys.readouterr().out
    assert "per-class AP@50" in out
    assert "drop%" in out                      # degradation table
    assert "Aug - Base mAP50 difference:" in out
    for cname in ("pedestrian", "car", "motor"):
        assert cname in out


def test_sweep_resumes_after_preemption(pipeline_root, tmp_path):
    """A killed sweep resumes from its partial file: completed (model,
    testset) cells are not re-evaluated, final artifacts land, and the
    partial file is removed (SURVEY.md §5 failure-detection row — the
    reference restarts eval_all.py from zero)."""
    calls = {"n": 0}

    def make_predict(bomb_at=None):
        def predict(_, images):
            calls["n"] += 1
            if bomb_at is not None and calls["n"] >= bomb_at:
                raise KeyboardInterrupt("preempted")
            b = images.shape[0]
            return (np.zeros((b, 8, 4), np.float32),
                    np.zeros((b, 8), np.float32),
                    np.zeros((b, 8), np.int32), np.zeros((b, 8), bool))
        return predict

    out = tmp_path / "out"
    # 6 images at bs=2 -> 3 predict calls per variant; call 8 is mid-Blur
    with pytest.raises(KeyboardInterrupt):
        DE.sweep({"m_baseline": (make_predict(bomb_at=8), None)},
                 pipeline_root / "testsets", 64, 2, out)
    partial = out / "eval_results.partial.json"
    assert partial.exists()
    done = json.loads(partial.read_text())
    assert set(done) == {"m_baseline/Test_Clean", "m_baseline/Test_Noise"}

    calls["n"] = 0
    DE.sweep({"m_baseline": (make_predict(), None)},
             pipeline_root / "testsets", 64, 2, out)
    assert calls["n"] == 6          # only Blur + LowRes re-ran (3 batches each)
    assert not partial.exists()
    results = json.loads((out / "eval_results.json").read_text())
    assert set(results["m_baseline"]) == set(DE.TESTSET_VARIANTS)


def test_figures_and_demo(pipeline_root, tmp_path):
    from robust_object_detection_tpu.report import demo, plots

    per_class = {c: 0.5 for c in
                 ("pedestrian", "car", "van", "truck", "bus", "motor")}
    mk = lambda m50: {"mAP50": m50, "mAP50_95": m50 * 0.6,
                      "per_class_ap50": dict(per_class)}
    results = {
        "yolov8m_baseline": {"Test_Clean": mk(0.66), "Test_Noise": mk(0.57),
                             "Test_Blur": mk(0.43), "Test_LowRes": mk(0.62)},
        "yolov8m_augmented": {"Test_Clean": mk(0.65), "Test_Noise": mk(0.63),
                              "Test_Blur": mk(0.60),
                              "Test_LowRes": mk(0.63)},
    }
    restored = {"yolov8m_baseline": {
        "Test_Clean": mk(0.66), "Test_Noise": mk(0.20),
        "Test_Blur": mk(0.64), "Test_LowRes": mk(0.64)}}
    figs = plots.det_figure_suite(results, tmp_path / "figs")
    figs += plots.three_strategy_suite(results, restored, tmp_path / "figs")
    assert all(p.exists() and p.stat().st_size > 1000 for p in figs)
    assert len(figs) >= 8
    # the full reference 3-strategy set (plot_three_strategies.py):
    # per-model bars, improvement-over-baseline, radar, best-strategy map
    names = {p.name for p in figs}
    assert {"strategy_improvement.png", "three_strategy_radar.png",
            "best_strategy_heatmap.png"} <= names

    # demo strips with GT-echo predictors
    samples = pipeline.index_coco(
        pipeline_root / "proc" / "visdrone_coco6", "val")
    size = 64
    paths = demo.run_demo(
        samples, _echo_single(samples, size), _echo_single(samples, size),
        None, None, tmp_path / "demo", size, "yolov8m", n_images=2)
    assert len(paths) == 2
    from PIL import Image
    strip = np.asarray(Image.open(paths[0]))
    assert strip.shape[0] == 480 + 28          # panel + title bar


def _echo_single(samples, size, cap=32):
    """GT-echo predictor for single-image demo calls (stateless: matches by
    blurred-canvas identity is overkill — demo calls follow pick order)."""
    calls = {"picked": demo_pick_order(samples)}

    def predict(_, images):
        idx = calls["picked"].pop(0) if calls["picked"] else 0
        s = samples[idx]
        sc = min(size / s.height, size / s.width)
        m = min(len(s.boxes_xyxy), cap)
        boxes = np.zeros((1, cap, 4), np.float32)
        scores = np.zeros((1, cap), np.float32)
        classes = np.zeros((1, cap), np.int32)
        valid = np.zeros((1, cap), bool)
        boxes[0, :m] = s.boxes_xyxy[:m] * sc
        scores[0, :m] = 0.9
        classes[0, :m] = s.classes[:m]
        valid[0, :m] = True
        return boxes, scores, classes, valid

    return predict


def demo_pick_order(samples, n=2):
    from robust_object_detection_tpu.report.demo import pick_dense_images
    # each predictor closure is called once per picked image, in pick order
    return list(pick_dense_images(samples, n))


def test_cli_convert_and_testsets(pipeline_root, tmp_path, capsys):
    from robust_object_detection_tpu import cli
    cli.main(["convert-det-coco", "--src",
              str(pipeline_root / "raw"), "--out", str(tmp_path / "c"),
              "--split", "val"])
    assert (tmp_path / "c" / "annotations" / "instances_val.json").exists()
    cli.main(["build-testsets", "--processed-root",
              str(pipeline_root / "proc"), "--out", str(tmp_path / "t")])
    out = capsys.readouterr().out
    assert "Test_Noise" in out
    assert (tmp_path / "t" / "yolo6" / "Test_Blur" / "data.yaml").exists()
    cli.main(["plot", "--results", str(_write_results(tmp_path)),
              "--out", str(tmp_path / "figs")])
    assert len(list((tmp_path / "figs").glob("*.png"))) >= 5
    cli.main(["plot-vid", "--results", str(_write_results(tmp_path)),
              "--out", str(tmp_path / "vfigs")])
    assert len(list((tmp_path / "vfigs").glob("vid_*.png"))) >= 5


def _write_results(tmp_path):
    mk = lambda m: {"mAP50": m, "mAP50_95": m * 0.6,
                    "per_class_ap50": {"car": m}}
    results = {"yolov8m_baseline": {v: mk(0.5) for v in DE.TESTSET_VARIANTS},
               "yolov8m_augmented": {v: mk(0.6)
                                     for v in DE.TESTSET_VARIANTS}}
    p = tmp_path / "eval_results.json"
    p.write_text(json.dumps(results))
    return p
