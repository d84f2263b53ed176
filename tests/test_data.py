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
    order, with the draw landing on the reference's BGR pixel layout
    (build_corrupted_testsets.py:13,26-27,41-45,109)."""
    yolo_root = tmp_path / "yolo6"
    convert.convert_det_to_yolo(det_split, yolo_root, "val")
    troot = tmp_path / "testsets"
    ts.build_yolo_testsets(yolo_root, troot)
    from PIL import Image
    src = sorted((yolo_root / "images" / "val").glob("*.jpg"))
    rng = np.random.RandomState(42)
    first = np.asarray(Image.open(src[0]).convert("RGB"))
    # oracle exactly as the reference: BGR array + noise, clip, uint8
    bgr = first[..., ::-1].astype(np.float32)
    expect_bgr = np.clip(
        bgr + rng.normal(0, 15.0, bgr.shape).astype(np.float32),
        0, 255).astype(np.uint8)
    expect = expect_bgr[..., ::-1]
    # The written jpg is lossy; compare against a fresh in-memory corruption
    got = ts.make_corruptors(
        ts.CorruptionConfig(), np.random.RandomState(42))["Test_Noise"](first)
    np.testing.assert_array_equal(got, expect)


def test_testset_stream_parity_vs_reference_oracle(tmp_path):
    """Full-protocol parity against a transcription of the reference
    builder: ONE np.random.seed(42) stream runs continuously over yolo
    Test_Noise then coco Test_Noise images (build_corrupted_testsets.py:
    169-173 — seeds once in main(); only apply_noise consumes draws), each
    draw applied to the cv2 BGR layout. PNG sources make the file
    round-trip lossless, so written pixels must match the oracle exactly
    for Clean/Noise and within ±1 LSB (cv2-vs-XLA) for Blur."""
    import cv2
    from PIL import Image
    rng0 = np.random.RandomState(7)
    # synthetic mini-set: 3 yolo + 2 coco PNGs of differing sizes
    roots = {"visdrone_yolo6": 3, "visdrone_coco6": 2}
    proc = tmp_path / "proc"
    srcs = {}
    for sub, n in roots.items():
        d = proc / sub / "images" / "val"
        d.mkdir(parents=True)
        for i in range(n):
            img = rng0.randint(0, 256, (40 + 8 * i, 48, 3), np.uint8)
            Image.fromarray(img).save(d / f"im{i}.png")
        srcs[sub] = sorted(d.glob("*.png"))
        (proc / sub / ("labels" if "yolo" in sub else "annotations")
         ).mkdir(exist_ok=True)
    (proc / "visdrone_yolo6" / "labels" / "val").mkdir(parents=True)
    (proc / "visdrone_coco6" / "annotations").mkdir(exist_ok=True)

    troot = tmp_path / "testsets"
    ts.build_all(proc, troot)

    # ---- transcribed reference oracle (cv2 BGR protocol) ----
    def oracle_noise(img_bgr, rng):
        noise = rng.normal(0, 15, img_bgr.shape).astype(np.float32)
        return np.clip(img_bgr.astype(np.float32) + noise,
                       0, 255).astype(np.uint8)

    def oracle_blur(img_bgr):
        k = np.zeros((9, 9), np.float32)
        k[4, :] = 1.0
        M = cv2.getRotationMatrix2D((4.0, 4.0), 0.0, 1.0)
        k = cv2.warpAffine(k, M, (9, 9))
        k = k / (k.sum() + 1e-8)
        return cv2.filter2D(img_bgr, -1, k)

    rng = np.random.RandomState(42)        # seeded ONCE, like main()
    for fmt, sub in (("yolo6", "visdrone_yolo6"),
                     ("coco6", "visdrone_coco6")):
        expect_noise = {}
        for p in srcs[sub]:                # continuous stream yolo->coco
            bgr = np.asarray(Image.open(p))[..., ::-1]
            expect_noise[p.name] = oracle_noise(bgr, rng)
        for p in srcs[sub]:
            got_clean = np.asarray(Image.open(
                troot / fmt / "Test_Clean" / "images" / "val" / p.name))
            np.testing.assert_array_equal(
                got_clean, np.asarray(Image.open(p)))
            got_noise = np.asarray(Image.open(
                troot / fmt / "Test_Noise" / "images" / "val" / p.name))
            np.testing.assert_array_equal(
                got_noise[..., ::-1], expect_noise[p.name],
                err_msg=f"{fmt}/{p.name}")
            got_blur = np.asarray(Image.open(
                troot / fmt / "Test_Blur" / "images" / "val" / p.name))
            ref_blur = oracle_blur(
                np.asarray(Image.open(p))[..., ::-1])[..., ::-1]
            assert np.abs(got_blur.astype(int) -
                          ref_blur.astype(int)).max() <= 1


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
