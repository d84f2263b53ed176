"""Fused on-device robustness sweep: corrupt -> restore -> detect in one jit.

The disk-faithful sweep reproduces the reference's script pipeline — frozen
JPEG testsets on disk between every stage (build_corrupted_testsets.py ->
restore_testsets.py -> eval_all.py / eval_restored.py) — and is the parity
path for the published tables. But it makes every image cross the
host<->device boundary five times (corrupted fetch, restore upload+fetch,
two eval uploads) plus four JPEG codec passes; on a TPU host the sweep is
transfer/IO-bound, not compute-bound (bench.py decomposition: ~38 s of a
50 s sweep is transfer on the axon tunnel).

This module is the TPU-native production path for the same 8-pass
evaluation (4 variants x {corrupted, restored}): clean images upload ONCE,
then per batch a single jitted function

  clean_u8 --+--> noise  --+--> letterbox -> detect     (corrupted stream)
             +--> blur   --+--> U-Net -> letterbox -> detect  (restored)
             +--> lowres --+
             '--> clean  ----> both streams unchanged

chains entirely on device; only fixed-capacity detection tensors (a few
hundred KB per batch) return to host. Corruption/restoration semantics are
the frozen-testset ops (ops/corrupt.py quantised variants, models/unet
u8 re-quantisation), with two deliberate, documented deltas:

  * noise draws from the device PRNG (Threefry), not the frozen MT19937
    stream — distribution-identical; bit-parity with the frozen stream is
    available via ``mt19937_rng`` (host-drawn noise planes shipped with
    the clean batch — the noise stage is the ONLY MT19937 consumer, so
    blur/lowres/U-Net/detect stay fused);
  * no JPEG round trip between stages — the detector and U-Net see exact
    uint8 pixel values rather than JPEG-requantised ones. On
    lossless-source testsets (PNG) the mt19937_rng mode reproduces the
    disk path bit-for-bit (tests/test_fused_sweep.py parity test); JPEG
    requantisation is the sole remaining delta on .jpg testsets.

Reference counterpart: the eval_all.py + eval_restored.py sweep over
build_corrupted_testsets.py + restore_testsets.py outputs (SURVEY.md §3.4,
§3.5); the fusion itself is the SURVEY §7.3-6 "fused on-device input
pipeline" design goal — the reference has no equivalent (every stage is a
separate script communicating via JPEG files).
"""

from __future__ import annotations

import functools
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import CorruptionConfig
from ..ops import corrupt as corrupt_ops
from ..ops import image as image_ops
from . import coco_map
from .detector_eval import TESTSET_VARIANTS, _score

STRATEGIES = ("corrupted", "restored")


@functools.lru_cache(maxsize=None)
def make_fused_step(predict_fn: Callable, unet_model, native_hw: Tuple[int, int],
                    img_size: int, cfg: CorruptionConfig = CorruptionConfig(),
                    host_noise: bool = False) -> Callable:
    """Build the per-batch fused sweep step for one native image size.

    predict_fn(det_state, images) -> (boxes, scores, classes, valid) on an
    img_size x img_size canvas (train.detector.make_predict_step contract;
    float canvas values in [0,255] are accepted — the step normalises).
    unet_model: models/unet.RestorationUNet (or None to skip the restored
    stream and emit 4 passes instead of 8).

    Returns step(det_state, unet_vars, clean_u8 (B,H,W,3), key) ->
    (boxes (P,B,K,4) canvas coords, scores (P,B,K), classes (P,B,K),
    valid (P,B,K)) with P = 8 (or 4 without a U-Net); pass order is
    corrupted[Clean,Noise,Blur,LowRes] then restored[same order].

    host_noise=True swaps the step's `key` argument for a host-drawn f32
    noise-plane batch (B, H, W, 3) added to the clean pixels — the
    MT19937-parity mode (run_fused_sweep mt19937_rng). Same clip/truncate
    quantisation as the frozen-testset builder.

    H and W must be even (the on-device 0.5x lowres is an exact 2x2 box
    mean); odd native sizes should be reflect-padded by the caller before
    indexing (data/pipeline letterboxing always evals even canvases).

    Memoised: each distinct (predict_fn, unet_model, native_hw, img_size,
    cfg) builds (and jit-compiles) exactly once per process, so a warmup
    call's compile carries over to every later sweep.
    """
    h, w = native_hw
    if h % 2 or w % 2:
        raise ValueError(f"fused sweep needs even native dims, got {h}x{w}")
    ph, pw = (-h) % 16, (-w) % 16        # U-Net pad (restore_testsets.py:52-61)

    def step(det_state, unet_vars, clean_u8, key):
        x = clean_u8.astype(jnp.float32)                       # (B, H, W, 3)
        # quantised f32 in [0,255]: identical values to the u8 pixels the
        # frozen testsets hold BEFORE their JPEG encode
        if host_noise:  # `key` is the (B, H, W, 3) f32 noise-plane batch
            noised = image_ops.quantize_trunc(x + key)
        else:
            noised = corrupt_ops.apply_noise(x, key, cfg.noise_sigma)
        blurred = corrupt_ops.apply_motion_blur(
            x, cfg.blur_kernel, cfg.blur_angle_deg)
        low = corrupt_ops.apply_lowres(x, cfg.downscale_factor)
        variants = jnp.stack([x, noised, blurred, low])     # (4, B, H, W, 3)

        if unet_model is not None:
            # restored stream: U-Net over the three corrupted variants at
            # native resolution (pad to 16, forward, unpad); Clean copies
            # through unchanged (restore_testsets.py:145-159)
            def restore(img):
                y = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)),
                            mode="reflect") if (ph or pw) else img
                y = unet_model.apply(unet_vars, y / 255.0, train=False)
                y = jnp.floor(jnp.clip(y * 255.0 + 0.5, 0.0, 255.0))
                return y[:, :h, :w]
            restored = jax.lax.map(restore, variants[1:])   # (3, B, H, W, 3)
            passes = jnp.concatenate([variants, variants[:1], restored])
        else:
            passes = variants                               # (P, B, H, W, 3)

        def detect(img):
            canvas, _, _ = image_ops.letterbox(img, img_size)
            return predict_fn(det_state, canvas)
        # sequential over passes: one predict compile, peak memory = one
        # detector forward (a (P*B) mega-batch would hold P detector
        # activation sets alive at 1024px)
        return jax.lax.map(detect, passes.astype(jnp.uint8))

    return jax.jit(step)


def frozen_noise_rng(skip_splits: Sequence[Sequence] = (),
                     sigma: float = 15.0,
                     seed: int = 42) -> "np.random.RandomState":
    """RandomState positioned at the frozen noise stream for one layout.

    The disk builder threads ONE RandomState(42) across layouts, yolo6
    first then coco6 (data/testsets.build_all; the reference seeds once in
    main() — build_corrupted_testsets.py:169-173). To replay the coco6
    layout's draws, pass the yolo6 split's samples (the same val images)
    as skip_splits so their draws are consumed first; for yolo6, pass
    nothing.
    """
    rng = np.random.RandomState(seed)
    for split in skip_splits:
        for s in sorted(split, key=lambda s: Path(s.image_path).name):
            rng.normal(0.0, sigma, (s.height, s.width, 3))
    return rng


def _mt19937_states(samples: Sequence, sigma: float,
                    rng: "np.random.RandomState") -> Dict[int, tuple]:
    """Per-sample MT19937 state snapshots for frozen-stream noise replay.

    The disk builder threads ONE RandomState across images in sorted file
    order, Noise being the only consumer (data/testsets.py:95-125,
    build_corrupted_testsets.py:41-45). Snapshot the state before each
    image's draw (keyed by image_id), advancing by drawing — MT19937
    normals can't be skipped deterministically (polar-method rejection),
    so the stream is drawn twice overall: once here to position, once at
    batch assembly to materialise. `rng` must be positioned at the stream
    start for this split (RandomState(42) fresh for the yolo6 layout; the
    coco6 layout continues after all yolo6 draws — build_all semantics).
    """
    states: Dict[int, tuple] = {}
    for s in sorted(samples, key=lambda s: Path(s.image_path).name):
        states[int(s.image_id)] = rng.get_state()
        rng.normal(0.0, sigma, (s.height, s.width, 3))
    return states


def _draw_noise(state: tuple, sigma: float, h: int, w: int) -> np.ndarray:
    """One frozen-stream noise plane, channel-reversed BGR->RGB (the
    reference draws onto cv2 BGR arrays; data/testsets.py:110-119)."""
    r = np.random.RandomState()
    r.set_state(state)
    return np.ascontiguousarray(
        r.normal(0.0, sigma, (h, w, 3)).astype(np.float32)[..., ::-1])


def run_fused_sweep(predict_fn: Callable, det_state, unet_model, unet_vars,
                    samples: Sequence, img_size: int, batch_size: int,
                    cfg: CorruptionConfig = CorruptionConfig(),
                    seed: int = 0, num_threads: int = 8,
                    mt19937_rng=None) -> Dict:
    """The full fused 8-pass sweep over an indexed clean val split.

    samples: data/pipeline.Sample list (the CLEAN images — corrupted
    variants are generated on device). Images are grouped by native size
    (one jit compile per distinct (H, W)); partial batches are padded to
    full batch shape. Decode of batch k+1 overlaps device compute of
    batch k (double-buffered dispatch, one fetch per batch of small
    detection tensors).

    mt19937_rng: optional np.random.RandomState positioned at the frozen
    noise stream's start for this split. When given, noise planes are
    host-drawn from the frozen MT19937 stream (exactly the disk builder's
    draws) and shipped with the clean batch, instead of device Threefry —
    on lossless-source testsets the sweep then reproduces the disk path
    bit-for-bit. Costs one extra f32 image upload per batch plus two host
    draws per image (see _mt19937_states).

    Returns {"corrupted": {variant: summary}, "restored": {...},
             "images_per_sec": float, "images_evaluated": int} with the
    same per-variant summary dict shape as detector_eval (mAP50/mAP50_95/
    per_class_ap50/images), so sweep tables and plots consume it directly.
    """
    from concurrent.futures import ThreadPoolExecutor
    from ..data.pipeline import load_image_rgb

    noise_states = (None if mt19937_rng is None else
                    _mt19937_states(samples, cfg.noise_sigma, mt19937_rng))

    groups: Dict[Tuple[int, int], List] = {}
    for s in samples:
        groups.setdefault((s.height, s.width), []).append(s)

    n_passes = 8 if unet_model is not None else 4
    strat_names = STRATEGIES if unet_model is not None else STRATEGIES[:1]
    dets: Dict[str, Dict[str, Dict[int, coco_map.Detections]]] = {
        st: {v: {} for v in TESTSET_VARIANTS} for st in strat_names}
    gts: Dict[int, coco_map.GroundTruth] = {}
    key = jax.random.key(seed)
    n_images = 0
    t0 = time.time()

    with ThreadPoolExecutor(num_threads) as pool:
        pending = []
        for (h, w), group in sorted(groups.items()):
            step = make_fused_step(predict_fn, unet_model, (h, w), img_size,
                                   cfg, host_noise=noise_states is not None)
            scale = min(img_size / h, img_size / w)
            for start in range(0, len(group), batch_size):
                chunk = group[start:start + batch_size]
                imgs = list(pool.map(load_image_rgb, chunk))
                batch = np.zeros((batch_size, h, w, 3), np.uint8)
                for i, im in enumerate(imgs):
                    batch[i] = im
                if noise_states is None:
                    key, sub = jax.random.split(key)
                else:
                    planes = list(pool.map(
                        lambda s: _draw_noise(
                            noise_states[int(s.image_id)],
                            cfg.noise_sigma, h, w), chunk))
                    nb = np.zeros((batch_size, h, w, 3), np.float32)
                    for i, p in enumerate(planes):
                        nb[i] = p
                    sub = jnp.asarray(nb)
                outs = step(det_state, unet_vars, jnp.asarray(batch), sub)
                pending.append((chunk, scale, outs))
        # one fetch per batch, all dispatched: detection tensors are small
        # (P x B x K rows), so the transfer is negligible next to the
        # image uploads the disk path would have made
        for chunk, scale, outs in pending:
            boxes, scores, classes, valid = jax.device_get(outs)
            for i, sample in enumerate(chunk):
                img_id = int(sample.image_id)
                gb = sample.boxes_xyxy
                gt_xywh = (np.concatenate(
                    [gb[:, :2], gb[:, 2:] - gb[:, :2]], 1)
                    if len(gb) else np.zeros((0, 4), np.float32))
                gts[img_id] = coco_map.GroundTruth(
                    boxes=gt_xywh, classes=sample.classes.astype(np.int64) + 1)
                for p in range(n_passes):
                    st = strat_names[p // 4]
                    variant = TESTSET_VARIANTS[p % 4]
                    v = valid[p, i]
                    b = boxes[p, i][v] / scale
                    b[:, 0::2] = b[:, 0::2].clip(0, sample.width)
                    b[:, 1::2] = b[:, 1::2].clip(0, sample.height)
                    xywh = np.concatenate([b[:, :2], b[:, 2:] - b[:, :2]], 1)
                    dets[st][variant][img_id] = coco_map.Detections(
                        boxes=xywh, scores=scores[p, i][v],
                        classes=classes[p, i][v].astype(np.int64) + 1)
            n_images += len(chunk)

    predict_elapsed = time.time() - t0     # shared across all passes
    scored = {st: {v: _score(dets[st][v], gts, n_images, predict_elapsed)
                   for v in TESTSET_VARIANTS} for st in strat_names}
    # the throughput window includes scoring (the disk-path sweep bench
    # counts build+restore+eval+score wall-clock; keep it comparable)
    elapsed = time.time() - t0
    out: Dict = {"images_evaluated": n_images * n_passes,
                 "wall_seconds": round(elapsed, 2),
                 "images_per_sec": round(n_images * n_passes
                                         / max(elapsed, 1e-9), 2)}
    out.update(scored)
    return out
