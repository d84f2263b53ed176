"""Training augmentations: HSV roundtrip, flip with boxes, mosaic."""

import jax
import jax.numpy as jnp
import numpy as np

from robust_object_detection_tpu.train import augment as A


def test_hsv_roundtrip():
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    back = A.hsv_to_rgb(A.rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


def test_random_hsv_changes_but_bounded():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (2, 16, 16, 3))
                      .astype(np.float32))
    out = A.random_hsv(img, jax.random.key(0))
    assert float(jnp.abs(out - img).mean()) > 0.5
    assert float(out.min()) >= 0 and float(out.max()) <= 255.001


def test_flip_boxes_consistent():
    img = jnp.zeros((4, 32, 32, 3))
    img = img.at[:, :, :4].set(1.0)                  # marker on the left
    boxes = jnp.tile(jnp.asarray([[2.0, 5.0, 10.0, 15.0]]), (4, 1))[:, None]
    classes = jnp.zeros((4, 1), jnp.int32)
    out_img, out_boxes = A.random_flip_lr(img, boxes, classes,
                                          jax.random.key(3))
    for i in range(4):
        flipped = bool(out_img[i, 0, -1, 0] == 1.0)   # marker moved right
        if flipped:
            np.testing.assert_allclose(np.asarray(out_boxes[i, 0]),
                                       [22, 5, 30, 15])
        else:
            np.testing.assert_allclose(np.asarray(out_boxes[i, 0]),
                                       [2, 5, 10, 15])
    # padded boxes never change
    classes_pad = jnp.full((4, 1), -1, jnp.int32)
    _, ob = A.random_flip_lr(img, boxes, classes_pad, jax.random.key(3))
    np.testing.assert_allclose(np.asarray(ob), np.asarray(boxes))


def test_mosaic4_composition():
    rng = np.random.RandomState(0)
    s, cap = 64, 16
    loaded = []
    for q in range(4):
        canvas = np.full((s, s, 3), q * 60, np.uint8)
        boxes = np.zeros((cap, 4), np.float32)
        classes = np.full((cap,), -1, np.int32)
        boxes[0] = [8, 8, 40, 40]
        classes[0] = q
        loaded.append((canvas, boxes, classes))
    crop, boxes, classes = A.mosaic4(loaded, s, rng, cap)
    assert crop.shape == (s, s, 3)
    valid = classes >= 0
    assert valid.sum() >= 1
    b = boxes[valid]
    assert (b[:, 0] <= b[:, 2]).all() and (b[:, 2] <= s).all()
    assert (b[:, 2] - b[:, 0] > 2).all()


def test_mosaic_batches_shapes():
    from robust_object_detection_tpu.data import pipeline, synthetic, convert
    import tempfile
    from pathlib import Path
    tmp = Path(tempfile.mkdtemp())
    det = synthetic.make_det_split(tmp / "det", n_images=6,
                                   size_range=((48, 49), (48, 49)))
    convert.convert_det_to_coco(det, tmp / "coco", "val")
    samples = pipeline.index_coco(tmp / "coco", "val")
    batches = list(A.mosaic_batches(samples, batch_size=2, image_size=64,
                                    max_boxes=32, seed=0))
    assert len(batches) == 3
    for b in batches:
        assert b.images.shape == (2, 64, 64, 3)
        assert b.boxes.shape == (2, 32, 4)
        v = b.classes >= 0
        assert (b.boxes[v] >= 0).all() and (b.boxes[v] <= 64).all()


def test_affine_identity_when_zero():
    """degrees=translate=scale=shear=0 -> identity warp: image and boxes
    unchanged (up to resampling exactness for an integer-identity
    matrix)."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8)
    boxes = np.zeros((8, 4), np.float32)
    classes = np.full((8,), -1, np.int32)
    boxes[0] = [10, 12, 40, 50]
    classes[0] = 2
    out, nb, nc = A.random_affine_host(img, boxes, classes, rng,
                                       degrees=0.0, translate=0.0,
                                       scale=0.0, shear=0.0)
    np.testing.assert_array_equal(out, img)
    np.testing.assert_allclose(nb[0], boxes[0], atol=1e-4)
    assert nc[0] == 2


def test_affine_distribution():
    """Reference knobs (translate=0.1, scale=0.5): box centres shift and
    scales spread per the sampled matrix; boxes stay inside the canvas and
    degenerate candidates are dropped (Ultralytics box_candidates)."""
    rng = np.random.RandomState(1)
    size = 96
    img = np.full((size, size, 3), 200, np.uint8)
    boxes = np.zeros((4, 4), np.float32)
    classes = np.full((4,), -1, np.int32)
    boxes[0] = [30, 30, 60, 60]
    classes[0] = 1
    widths, centres = [], []
    for _ in range(200):
        _, nb, nc = A.random_affine_host(img, boxes, classes, rng,
                                         degrees=0.0, translate=0.1,
                                         scale=0.5, shear=0.0)
        if nc[0] >= 0:
            assert (nb[0] >= 0).all() and (nb[0] <= size).all()
            widths.append(nb[0][2] - nb[0][0])
            centres.append((nb[0][0] + nb[0][2]) / 2)
    w = np.asarray(widths)
    c = np.asarray(centres)
    assert len(w) > 150                       # survival rate is high
    # scale in [0.5, 1.5] -> widths spread across [15, 45]
    assert w.min() < 22 and w.max() > 38
    # translate 0.1 -> centre jitter approx +-9.6px around 48 + scale shift
    assert c.std() > 3.0


def test_random_erasing_stats():
    rng = np.random.default_rng(3)
    img = jnp.zeros((64, 64, 3), jnp.float32)
    erased = []
    for i in range(40):
        out = A.random_erasing(img, jax.random.key(i), p=1.0)
        frac = float((np.asarray(out)[..., 0] == 114.0).mean())
        erased.append(frac)
    e = np.asarray(erased)
    # every draw erases between ~2% and ~33% of the area
    assert (e > 0.005).all() and (e < 0.40).all()
    # p=0 never erases
    out = A.random_erasing(img, jax.random.key(0), p=0.0)
    assert float(np.abs(np.asarray(out)).max()) == 0.0
