"""Detector training augmentations: host mosaic + on-device HSV/flip.

The reference's YOLO/RT-DETR runs train with Ultralytics' default pipeline
(experiments/yolo/baseline_clean/args.yaml: mosaic=1.0, fliplr=0.5,
hsv_h=0.015 hsv_s=0.7 hsv_v=0.4, close_mosaic=10) plus the injected
corruption stage. Here:

  * mosaic is HOST-side batch composition (it reshuffles whole images —
    pure data movement, no FLOPs, so it belongs with JPEG decode),
  * HSV jitter and horizontal flip run ON DEVICE inside the jitted train
    step (elementwise; boxes flip with the image),
  * corruption stays the separate on-device stage (ops/corrupt.py).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ── Device-side: HSV jitter + horizontal flip ────────────────────────────

def rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    """(..., 3) float [0,1] RGB -> HSV (h in [0,1))."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, -1)
    mn = jnp.min(rgb, -1)
    d = mx - mn
    safe = jnp.where(d == 0, 1.0, d)
    h = jnp.where(
        mx == r, (g - b) / safe % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0))
    h = jnp.where(d == 0, 0.0, h) / 6.0
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return jnp.stack([h, s, mx], -1)


def hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], -1)


@functools.partial(jax.jit, static_argnames=("hgain", "sgain", "vgain"))
def random_hsv(img: jax.Array, key: jax.Array, hgain: float = 0.015,
               sgain: float = 0.7, vgain: float = 0.4) -> jax.Array:
    """Per-image HSV jitter (Ultralytics augment_hsv gains).

    img: (B, H, W, 3) float [0,255]. Gains are uniform in [1-g, 1+g]
    (hue additive, wrap)."""
    b = img.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    # gains cast to the image dtype so a bf16 augmentation chain stays
    # bf16 (an f32 gain would promote every full-image op back to f32 —
    # 2x the HBM traffic at (16, 1024, 1024, 3))
    dh = jax.random.uniform(k1, (b, 1, 1), minval=-hgain,
                            maxval=hgain).astype(img.dtype)
    ds = jax.random.uniform(k2, (b, 1, 1), minval=1 - sgain,
                            maxval=1 + sgain).astype(img.dtype)
    dv = jax.random.uniform(k3, (b, 1, 1), minval=1 - vgain,
                            maxval=1 + vgain).astype(img.dtype)
    hsv = rgb_to_hsv(img / 255.0)
    h = (hsv[..., 0] + dh) % 1.0
    s = jnp.clip(hsv[..., 1] * ds, 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] * dv, 0.0, 1.0)
    return hsv_to_rgb(jnp.stack([h, s, v], -1)) * 255.0


@jax.jit
def random_flip_lr(img: jax.Array, boxes: jax.Array, classes: jax.Array,
                   key: jax.Array):
    """p=0.5 horizontal flip of image + xyxy boxes (canvas coords).

    img: (B, H, W, C); boxes: (B, M, 4); classes: (B, M) (-1 pads)."""
    b, _, w, _ = img.shape
    flip = jax.random.bernoulli(key, 0.5, (b, 1, 1, 1))
    img = jnp.where(flip, img[:, :, ::-1, :], img)
    fb = jnp.stack([w - boxes[..., 2], boxes[..., 1],
                    w - boxes[..., 0], boxes[..., 3]], -1)
    valid = (classes >= 0)[..., None]
    boxes = jnp.where(flip[:, :, 0, :] & valid, fb, boxes)
    return img, boxes


def mosaic_batches(samples, batch_size: int, image_size: int,
                   max_boxes: int = 600, seed: int = 0,
                   num_threads: int = 8, affine: bool = True,
                   degrees: float = 0.0, translate: float = 0.1,
                   scale: float = 0.5, shear: float = 0.0):
    """Batch iterator where every example is a 4-image mosaic.

    One epoch = len(samples) mosaics; the 4 sources of each mosaic are the
    epoch-shuffled stream plus 3 uniformly random picks (Ultralytics'
    sampling), followed by a random affine (random_perspective follows
    Mosaic inside the Ultralytics dataloader; knob defaults are the
    reference run's args.yaml:89-93). Yields data.pipeline.Batch with
    identical shapes to make_batches so train loops can switch per epoch
    (close_mosaic).
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..data import pipeline as pipe

    rng = np.random.RandomState(seed)
    order = rng.permutation(len(samples))

    def load_one(idx: int):
        s = samples[idx]
        canvas, scale = pipe.load_letterboxed(s, image_size)
        m = min(len(s.boxes_xyxy), max_boxes)
        boxes = np.zeros((max_boxes, 4), np.float32)
        classes = np.full((max_boxes,), -1, np.int32)
        if m:
            boxes[:m] = s.boxes_xyxy[:m] * scale
            classes[:m] = s.classes[:m]
        return canvas, boxes, classes

    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        for start in range(0, len(order) - batch_size + 1, batch_size):
            idxs = []
            for j in range(batch_size):
                primary = order[start + j]
                extra = rng.randint(0, len(samples), 3)
                idxs.extend([primary, *extra.tolist()])
            loaded = list(pool.map(load_one, idxs))
            images = np.zeros((batch_size, image_size, image_size, 3),
                              np.uint8)
            boxes = np.zeros((batch_size, max_boxes, 4), np.float32)
            classes = np.full((batch_size, max_boxes), -1, np.int32)
            for j in range(batch_size):
                images[j], boxes[j], classes[j] = mosaic4(
                    loaded[4 * j:4 * j + 4], image_size, rng, max_boxes)
                if affine:
                    images[j], boxes[j], classes[j] = random_affine_host(
                        images[j], boxes[j], classes[j], rng,
                        degrees, translate, scale, shear,
                        max_boxes=max_boxes)
            yield pipe.Batch(images=images, boxes=boxes, classes=classes,
                             image_ids=np.full((batch_size,), -1, np.int64),
                             scales=np.ones((batch_size,), np.float32),
                             num_valid=batch_size)


# ── Host-side: mosaic composition ────────────────────────────────────────

def mosaic4(loaded: Sequence[tuple], size: int, rng: np.random.RandomState,
            max_boxes: int, pad_value: int = 114):
    """Compose 4 letterboxed (canvas, boxes, classes) tuples into one
    size x size mosaic: quadrants of a 2s canvas around a jittered centre,
    cropped back to s (the capability core of Ultralytics' Mosaic).

    Each input: (canvas (s,s,3) uint8, boxes (M,4) canvas-xyxy,
    classes (M,) with -1 pads). Returns the same structure.
    """
    s = size
    big = np.full((2 * s, 2 * s, 3), pad_value, np.uint8)
    all_boxes, all_classes = [], []
    offs = [(0, 0), (0, s), (s, 0), (s, s)]
    for (canvas, boxes, classes), (oy, ox) in zip(loaded, offs):
        big[oy:oy + s, ox:ox + s] = canvas
        valid = classes >= 0
        bb = boxes[valid].copy()
        if len(bb):
            bb[:, 0::2] += ox
            bb[:, 1::2] += oy
            all_boxes.append(bb)
            all_classes.append(classes[valid])
    # random s x s crop centred near the 4-way junction
    cy = rng.randint(s // 2, 3 * s // 2 + 1)
    cx = rng.randint(s // 2, 3 * s // 2 + 1)
    y0, x0 = cy - s // 2, cx - s // 2
    crop = big[y0:y0 + s, x0:x0 + s]

    out_boxes = np.zeros((max_boxes, 4), np.float32)
    out_classes = np.full((max_boxes,), -1, np.int32)
    if all_boxes:
        bb = np.concatenate(all_boxes)
        cc = np.concatenate(all_classes)
        bb[:, 0::2] -= x0
        bb[:, 1::2] -= y0
        bb[:, 0::2] = bb[:, 0::2].clip(0, s)
        bb[:, 1::2] = bb[:, 1::2].clip(0, s)
        keep = ((bb[:, 2] - bb[:, 0] > 2) & (bb[:, 3] - bb[:, 1] > 2))
        bb, cc = bb[keep], cc[keep]
        m = min(len(bb), max_boxes)
        out_boxes[:m] = bb[:m]
        out_classes[:m] = cc[:m]
    return crop, out_boxes, out_classes


# ── Host-side: random affine (Ultralytics RandomPerspective, persp=0) ────

def affine_matrix(rng: np.random.RandomState, size: int,
                  degrees: float = 0.0, translate: float = 0.1,
                  scale: float = 0.5, shear: float = 0.0):
    """(3x3 output<-input matrix, sampled scale s): center -> rotate+scale
    -> shear -> translate, Ultralytics random_perspective composition with
    perspective=0 (reference run args: degrees=0 translate=0.1 scale=0.5
    shear=0, experiments/yolo/baseline_clean/args.yaml:89-93). s is
    returned because box_candidates compares post-warp area against the
    SCALED original area (box1 = bboxes * s in random_perspective)."""
    c = np.eye(3)
    c[0, 2] = -size / 2
    c[1, 2] = -size / 2
    r = np.eye(3)
    a = np.deg2rad(rng.uniform(-degrees, degrees))
    s = rng.uniform(1 - scale, 1 + scale)
    r[:2, :2] = s * np.asarray([[np.cos(a), -np.sin(a)],
                                [np.sin(a), np.cos(a)]])
    sh = np.eye(3)
    sh[0, 1] = np.tan(np.deg2rad(rng.uniform(-shear, shear)))
    sh[1, 0] = np.tan(np.deg2rad(rng.uniform(-shear, shear)))
    t = np.eye(3)
    t[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * size
    t[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * size
    return t @ sh @ r @ c, s


def random_affine_host(img: np.ndarray, boxes: np.ndarray,
                       classes: np.ndarray, rng: np.random.RandomState,
                       degrees: float = 0.0, translate: float = 0.1,
                       scale: float = 0.5, shear: float = 0.0,
                       max_boxes: int | None = None,
                       pad_value: int = 114):
    """Warp one (img, boxes, classes) sample by a random affine.

    Host-side like the reference (cv2.warpAffine inside the Ultralytics
    dataloader) — it follows mosaic in the same host stage; the device
    step stays shape-static. Boxes map through the same matrix via their
    4 corners + the Ultralytics box_candidates filter (w,h > 2px, aspect
    < 100, area ratio > 0.1). Returns (img, boxes, classes) with -1 pads.
    """
    from PIL import Image
    size = img.shape[0]
    m, s = affine_matrix(rng, size, degrees, translate, scale, shear)
    inv = np.linalg.inv(m)
    out = Image.fromarray(img).transform(
        (size, size), Image.AFFINE,
        data=tuple(inv[:2].ravel()), resample=Image.BILINEAR,
        fillcolor=(pad_value,) * 3)
    out = np.asarray(out)

    max_boxes = len(boxes) if max_boxes is None else max_boxes
    new_boxes = np.zeros((max_boxes, 4), np.float32)
    new_classes = np.full((max_boxes,), -1, np.int32)
    valid = classes >= 0
    bb = boxes[valid]
    cc = classes[valid]
    if len(bb):
        corners = np.stack([bb[:, [0, 1]], bb[:, [2, 1]],
                            bb[:, [0, 3]], bb[:, [2, 3]]], 1)   # (N,4,2)
        ones = np.ones((*corners.shape[:2], 1), np.float32)
        warped = np.concatenate([corners, ones], -1) @ m.T[:, :2]
        nb = np.concatenate([warped.min(1), warped.max(1)],
                            -1).astype(np.float32)
        w0 = bb[:, 2] - bb[:, 0]
        h0 = bb[:, 3] - bb[:, 1]
        nb[:, 0::2] = nb[:, 0::2].clip(0, size)
        nb[:, 1::2] = nb[:, 1::2].clip(0, size)
        w1 = nb[:, 2] - nb[:, 0]
        h1 = nb[:, 3] - nb[:, 1]
        ar = np.maximum(w1 / (h1 + 1e-16), h1 / (w1 + 1e-16))
        # area ratio vs the SCALE-ADJUSTED original area: Ultralytics
        # random_perspective calls box_candidates(box1=bboxes*s, box2=new),
        # so the 0.1 threshold applies to w1*h1 / (s^2 * w0*h0)
        keep = ((w1 > 2) & (h1 > 2) & (ar < 100) &
                (w1 * h1 / (w0 * h0 * s * s + 1e-16) > 0.1))
        nb, cc = nb[keep], cc[keep]
        k = min(len(nb), max_boxes)
        new_boxes[:k] = nb[:k]
        new_classes[:k] = cc[:k]
    return out, new_boxes, new_classes


# ── Device-side: random erasing ──────────────────────────────────────────

def random_erasing(img: jax.Array, key: jax.Array, p: float = 0.4,
                   area_range=(0.02, 0.33), ratio_range=(0.3, 3.3),
                   fill: float = 114.0) -> jax.Array:
    """torchvision-style RandomErasing on one (H, W, 3) float image.

    Capability parity note: Ultralytics carries erasing=0.4 in args.yaml
    (baseline_clean/args.yaml:103) but applies it to CLASSIFY training
    only — detection runs never erase — so the detect trainers here do not
    enable it either; the op exists for recipe experimentation. Static
    shapes: the erase rectangle is a coordinate mask, not a dynamic slice.
    """
    h, w = img.shape[0], img.shape[1]
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    area = jax.random.uniform(k1, (), minval=area_range[0],
                              maxval=area_range[1]) * h * w
    log_r = jax.random.uniform(k2, (), minval=np.log(ratio_range[0]),
                               maxval=np.log(ratio_range[1]))
    ratio = jnp.exp(log_r)
    eh = jnp.clip(jnp.sqrt(area * ratio), 1, h)
    ew = jnp.clip(jnp.sqrt(area / ratio), 1, w)
    y0 = jax.random.uniform(k3, ()) * (h - eh)
    x0 = jax.random.uniform(k4, ()) * (w - ew)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    inside = ((ys >= y0) & (ys < y0 + eh) &
              (xs >= x0) & (xs < x0 + ew))
    apply = jax.random.uniform(k5, ()) < p
    return jnp.where((inside & apply)[..., None], fill, img)
