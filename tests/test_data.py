"""Data layer tests: parsing, conversion, testsets, pipeline.

Converter goldens run against a synthetic mini-VisDrone (SURVEY.md §4 test
strategy: "converter golden-file tests on a synthetic mini-VisDrone").
"""

import json

import numpy as np
import pytest

from robust_object_detection_tpu.data import convert, pipeline, synthetic
from robust_object_detection_tpu.data import testsets as ts
from robust_object_detection_tpu.data import visdrone


@pytest.fixture(scope="module")
def det_split(tmp_path_factory):
    return synthetic.make_det_split(tmp_path_factory.mktemp("det") / "train")


@pytest.fixture(scope="module")
def vid_split(tmp_path_factory):
    return synthetic.make_vid_split(tmp_path_factory.mktemp("vid") / "train")


def test_parse_det_filters_and_clamps():
    txt = ("10,10,20,20,1,1,0,0\n"     # kept: pedestrian -> idx 0
           "0,0,10,10,0,1,0,0\n"       # dropped: score 0 (ignored region)
           "5,5,10,10,1,7,0,0\n"       # dropped: unused class (awning)
           "5,5,10,10,1,4,0,0\n")      # kept: car -> idx 1
    boxes, classes, n_raw, n_rm = visdrone.parse_det_annotation(txt)
    assert n_raw == 4 and n_rm == 2
    assert classes.tolist() == [0, 1]
    np.testing.assert_allclose(boxes[0], [10, 10, 20, 20])


def test_clamp_boxes():
    b = np.array([[90.0, 90.0, 20.0, 20.0]], np.float32)
    out = visdrone.clamp_boxes(b, 100, 100)
    # clamped to image: x stays 90, w shrinks to 10
    np.testing.assert_allclose(out[0], [90, 90, 10, 10])


def test_det_records_roundtrip(det_split):
    recs = list(visdrone.iter_det_records(det_split))
    assert len(recs) == 6
    assert len(recs[-1].boxes) == 0          # last image empty
    for r in recs:
        if len(r.boxes):
            assert (r.boxes[:, 0] + r.boxes[:, 2] <= r.width + 1e-3).all()
            assert (r.boxes[:, 1] + r.boxes[:, 3] <= r.height + 1e-3).all()
            assert (r.classes >= 0).all() and (r.classes < 6).all()


def test_coco_conversion(det_split, tmp_path):
    out = tmp_path / "coco6"
    stats = convert.convert_det_to_coco(det_split, out, "val")
    coco = json.loads((out / "annotations" / "instances_val.json").read_text())
    assert len(coco["images"]) == 6
    assert len(coco["categories"]) == 6
    assert coco["categories"][0] == {"id": 1, "name": "pedestrian",
                                     "supercategory": "none"}
    assert all((out / "images" / "val" / im["file_name"]).exists()
               for im in coco["images"])
    assert stats.boxes_kept == len(coco["annotations"])
    # every annotation's category in 1..6, boxes inside image
    ims = {im["id"]: im for im in coco["images"]}
    for a in coco["annotations"]:
        assert 1 <= a["category_id"] <= 6
        im = ims[a["image_id"]]
        x, y, w, h = a["bbox"]
        assert w > 0 and h > 0
        assert x + w <= im["width"] + 1e-3


def test_yolo_conversion(det_split, tmp_path):
    out = tmp_path / "yolo6"
    convert.convert_det_to_yolo(det_split, out, "val")
    assert (out / "data.yaml").exists()
    lbls = sorted((out / "labels" / "val").glob("*.txt"))
    assert len(lbls) == 6                    # empty label files kept
    for lbl in lbls:
        for line in lbl.read_text().splitlines():
            parts = line.split()
            assert len(parts) == 5
            assert 0 <= int(parts[0]) < 6
            vals = [float(v) for v in parts[1:]]
            assert all(0 <= v <= 1 for v in vals)


def test_vid_conversion(vid_split, tmp_path):
    out = tmp_path / "vid_yolo6"
    stats = convert.convert_vid_to_yolo(vid_split, out, "train")
    imgs = sorted((out / "images" / "train").glob("*.jpg"))
    assert len(imgs) == 6                    # 2 seqs x 3 frames, flattened
    assert imgs[0].name == "uav0000_0000001.jpg"
    assert stats.images == 6


def test_testset_builder(det_split, tmp_path):
    coco_root = tmp_path / "proc" / "visdrone_coco6"
    yolo_root = tmp_path / "proc" / "visdrone_yolo6"
    convert.convert_det_to_coco(det_split, coco_root, "val")
    convert.convert_det_to_yolo(det_split, yolo_root, "val")
    troot = tmp_path / "testsets"
    ts.build_yolo_testsets(yolo_root, troot)
    ts.build_coco_testsets(coco_root, troot)
    for fmt in ("yolo6", "coco6"):
        for variant in ts.VARIANTS:
            vdir = troot / fmt / variant
            assert len(list((vdir / "images" / "val").glob("*.jpg"))) == 6
    # noise testset differs from clean; labels identical
    from PIL import Image
    name = "img0000.jpg"
    clean = np.asarray(Image.open(
        troot / "yolo6" / "Test_Clean" / "images" / "val" / name))
    noise = np.asarray(Image.open(
        troot / "yolo6" / "Test_Noise" / "images" / "val" / name))
    assert np.abs(clean.astype(int) - noise.astype(int)).mean() > 1.0
    # determinism: manifest is stable across rebuilds
    m1 = ts.testset_manifest(troot)
    ts.build_yolo_testsets(yolo_root, troot)
    m2 = ts.testset_manifest(troot)
    assert m1["yolo6/Test_Noise"] == m2["yolo6/Test_Noise"]
    # data.yaml points val at images/val (build_corrupted_testsets.py:66-82)
    y = (troot / "yolo6" / "Test_Blur" / "data.yaml").read_text()
    assert "val: images/val" in y


def test_noise_matches_reference_mt19937(det_split, tmp_path):
    """Frozen-testset noise must replay numpy MT19937 seed=42 per image in
    sorted order (build_corrupted_testsets.py:13,26-27,41-45)."""
    yolo_root = tmp_path / "yolo6"
    convert.convert_det_to_yolo(det_split, yolo_root, "val")
    troot = tmp_path / "testsets"
    ts.build_yolo_testsets(yolo_root, troot)
    from PIL import Image
    src = sorted((yolo_root / "images" / "val").glob("*.jpg"))
    rng = np.random.RandomState(42)
    first = np.asarray(Image.open(src[0]).convert("RGB"))
    expect = np.clip(first.astype(np.float32) +
                     rng.normal(0, 15.0, first.shape).astype(np.float32),
                     0, 255).astype(np.uint8)
    # The written jpg is lossy; compare against a fresh in-memory corruption
    got = ts.make_corruptors(
        ts.CorruptionConfig(), np.random.RandomState(42))["Test_Noise"](first)
    np.testing.assert_array_equal(got, expect)


def test_pipeline_fixed_shapes(det_split, tmp_path):
    coco_root = tmp_path / "coco6"
    convert.convert_det_to_coco(det_split, coco_root, "val")
    samples = pipeline.index_coco(coco_root, "val")
    assert len(samples) == 6
    batches = list(pipeline.prefetch(pipeline.make_batches(
        samples, batch_size=4, image_size=64, max_boxes=16)))
    assert len(batches) == 2
    for b in batches:
        assert b.images.shape == (4, 64, 64, 3)
        assert b.boxes.shape == (4, 16, 4)
        assert b.classes.shape == (4, 16)
    assert batches[1].num_valid == 2
    assert (batches[1].image_ids[2:] == -1).all()
    # boxes are in canvas coords: all within [0, 64]
    for b in batches:
        valid = b.classes >= 0
        assert (b.boxes[valid] >= -1e-3).all()
        assert (b.boxes[valid] <= 64 + 1e-3).all()


def test_index_yolo_matches_coco(det_split, tmp_path):
    coco_root = tmp_path / "coco6"
    yolo_root = tmp_path / "yolo6"
    convert.convert_det_to_coco(det_split, coco_root, "val")
    convert.convert_det_to_yolo(det_split, yolo_root, "val")
    sc = pipeline.index_coco(coco_root, "val")
    sy = pipeline.index_yolo(yolo_root, "val")
    assert len(sc) == len(sy)
    for a, b in zip(sc, sy):
        assert len(a.boxes_xyxy) == len(b.boxes_xyxy)
        if len(a.boxes_xyxy):
            # YOLO labels are 6-decimal normalised -> small quantisation
            np.testing.assert_allclose(a.boxes_xyxy, b.boxes_xyxy, atol=0.05)
            np.testing.assert_array_equal(a.classes, b.classes)
