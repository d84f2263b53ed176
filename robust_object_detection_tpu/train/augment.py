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
    dh = jax.random.uniform(k1, (b, 1, 1), minval=-hgain, maxval=hgain)
    ds = jax.random.uniform(k2, (b, 1, 1), minval=1 - sgain,
                            maxval=1 + sgain)
    dv = jax.random.uniform(k3, (b, 1, 1), minval=1 - vgain,
                            maxval=1 + vgain)
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
                   num_threads: int = 8):
    """Batch iterator where every example is a 4-image mosaic.

    One epoch = len(samples) mosaics; the 4 sources of each mosaic are the
    epoch-shuffled stream plus 3 uniformly random picks (Ultralytics'
    sampling). Yields data.pipeline.Batch with identical shapes to
    make_batches so train loops can switch per epoch (close_mosaic).
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
