"""Frozen corrupted testset builder.

TPU-native counterpart of the reference's build_corrupted_testsets.py: builds
the four frozen val testsets Test_Clean / Test_Noise / Test_Blur / Test_LowRes
in both YOLO and COCO layouts under ``<root>/{yolo6,coco6}``
(build_corrupted_testsets.py:8-10,92-105,129-166).

Parity notes (stream-faithful to the reference protocol):
  * ONE numpy MT19937 ``RandomState(42)`` is created per build and threaded
    through the whole run — the reference's single ``np.random.seed(SEED)``
    in ``main()`` (build_corrupted_testsets.py:169-173). Only the Noise
    variant consumes draws, so the continuous stream runs: yolo Test_Noise
    images, then coco Test_Noise images — exactly the reference order
    (Clean/Blur/LowRes make no draws). ``build_all`` owns the RandomState;
    the standalone builders create their own when not handed one.
  * Each draw is ``normal(0, sigma, img.shape)`` landing on the reference's
    cv2 BGR pixel layout (build_corrupted_testsets.py:41-45,109): noise
    channel 0 perturbs Blue. We hold images in RGB, so the drawn block is
    channel-reversed before the add — float add, clip, uint8 truncation
    then match the reference bit-for-bit pre-encode (asserted against a
    transcribed oracle in tests/test_data.py).
  * Blur and LowRes run through the framework's own device ops
    (ops/corrupt.py, ops/image.py), validated bit-close (±1 LSB) to OpenCV
    in tests/test_corrupt.py. LowRes target size is ``int(w*f), int(h*f)``
    (truncation) like build_corrupted_testsets.py:54-58.
  * Labels / annotations are copied unchanged; per-variant data.yaml points
    val at ``images/val`` (build_corrupted_testsets.py:66-82).

Documented residuals vs reference-built testsets:
  * Iteration order: the reference iterates ``Path.glob("*.*")`` in
    filesystem order (nondeterministic across hosts); we canonicalise to
    sorted filename order. Parity holds when the reference's glob happens
    to be sorted — on any other host ordering, per-image noise blocks are
    permuted within the stream.
  * JPEG bytes: ``.jpg`` sources are re-encoded by Pillow (quality 95)
    where the reference uses cv2's libjpeg settings — pixel-identical
    pre-encode, a few LSB of encoder residual on disk. Lossless sources
    (``.png``/``.bmp``) round-trip exactly.
"""

from __future__ import annotations

import functools
import json
import shutil
from pathlib import Path
from typing import Callable, Dict

import numpy as np

from ..core.config import CorruptionConfig
from ..ops import corrupt as corrupt_ops
from ..ops import image as image_ops

VARIANTS = ("Test_Clean", "Test_Noise", "Test_Blur", "Test_LowRes")
SEED = 42


@functools.lru_cache(maxsize=64)
def _blur_fn(h: int, w: int, c: int, k: int, angle: float):
    import jax
    import jax.numpy as jnp

    # uint8 in / uint8 out: the u8<->f32 conversions run on device so the
    # host<->device transfer is 4x smaller each way (the tunnel-bound sweep
    # bench measured H2D as a dominant stage). apply_motion_blur already
    # quantizes (round-half-even, cv2 saturate_cast parity), so the final
    # floor+clip converts exact integer-valued floats — equal to the
    # previous host-side np astype(np.uint8) up to XLA-fusion 1-ulp
    # effects inside the conv (the pre-existing +-1 LSB cv2 parity bar).
    @jax.jit
    def f(img_u8):
        y = corrupt_ops.apply_motion_blur(img_u8.astype(jnp.float32),
                                          k=k, angle_deg=angle)
        return jnp.floor(jnp.clip(y, 0, 255)).astype(jnp.uint8)
    return f


@functools.lru_cache(maxsize=64)
def _lowres_fn(h: int, w: int, c: int, factor: float):
    import jax
    import jax.numpy as jnp
    sh, sw = int(h * factor), int(w * factor)

    @jax.jit
    def f(img_u8):
        small = image_ops.resize_area(img_u8.astype(jnp.float32), sh, sw)
        small = image_ops.quantize_round_half_up(small)
        up = image_ops.resize_bilinear(small, h, w)
        up = image_ops.quantize_round_half_up(up)
        return jnp.floor(jnp.clip(up, 0, 255)).astype(jnp.uint8)
    return f


def make_corruptors(cfg: CorruptionConfig, rng: np.random.RandomState,
                    timer=None,
                    ) -> Dict[str, Callable[[np.ndarray], np.ndarray]]:
    """Variant name -> uint8 HWC -> uint8 HWC corruption fn.

    timer: optional core.profiling.StageTimer. Blur/lowres run on the
    device, so each call is an H2D + tiny compute + D2H round trip; the
    dispatch/fetch split lets the sweep bench attribute the transfer cost
    (dominant through the axon tunnel, negligible over local PCIe)."""
    from ..core.profiling import StageTimer
    timer = timer if timer is not None else StageTimer()

    def clean(img: np.ndarray) -> np.ndarray:
        return img

    def noise(img: np.ndarray) -> np.ndarray:
        # host MT19937 draw, float32 add, clip, truncate — matches
        # np.clip(img+noise,0,255).astype(np.uint8) (build_corrupted_testsets.py:41-45).
        # The reference adds the draw to a cv2 BGR array; img here is RGB,
        # so reverse the draw's channel axis to land each noise channel on
        # the same physical colour plane.
        with timer.stage("build/host_noise"):
            n = rng.normal(0.0, cfg.noise_sigma, img.shape).astype(np.float32)
            x = img.astype(np.float32) + n[..., ::-1]
            return np.clip(x, 0, 255).astype(np.uint8)

    def blur(img: np.ndarray) -> np.ndarray:
        h, w, c = img.shape
        f = _blur_fn(h, w, c, cfg.blur_kernel, cfg.blur_angle_deg)
        with timer.stage("build/dispatch"):
            r = f(img)
        with timer.stage("build/fetch"):
            return np.asarray(r)

    def lowres(img: np.ndarray) -> np.ndarray:
        h, w, c = img.shape
        f = _lowres_fn(h, w, c, cfg.downscale_factor)
        with timer.stage("build/dispatch"):
            r = f(img)
        with timer.stage("build/fetch"):
            return np.asarray(r)

    return {"Test_Clean": clean, "Test_Noise": noise, "Test_Blur": blur,
            "Test_LowRes": lowres}


_IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def _list_images(img_dir: Path) -> list[Path]:
    """Sorted image listing (reference: glob("*.*") in fs order —
    build_corrupted_testsets.py:109,152; sorted() canonicalises)."""
    return sorted(p for p in img_dir.glob("*.*")
                  if p.suffix.lower() in _IMAGE_EXTS)


def _read_image(path: Path) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def _write_image(path: Path, img: np.ndarray, quality: int = 95) -> None:
    from PIL import Image
    if path.suffix.lower() in (".jpg", ".jpeg"):
        Image.fromarray(img).save(path, quality=quality)
    else:                                   # lossless formats: exact bytes
        Image.fromarray(img).save(path)


def _corrupt_dir(src_imgs: list[Path], fn, img_out: Path,
                 num_threads: int = 8, lookahead: int = 8) -> None:
    """read -> corrupt -> write for one variant directory, pipelined.

    Corruption stays SEQUENTIAL in file order — the shared MT19937 noise
    stream's draw order is part of the frozen-testset contract
    (build_corrupted_testsets.py seeds once; data/testsets.py:29-38) — but
    JPEG decode is prefetched `lookahead` deep and JPEG encode runs async
    on the pool, so host codec work overlaps the device corrupt ops.
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(num_threads) as pool:
        reads: deque = deque()
        writes: deque = deque()
        idx = 0
        for p in src_imgs:
            while idx < len(src_imgs) and len(reads) < lookahead:
                reads.append(pool.submit(_read_image, src_imgs[idx]))
                idx += 1
            img = reads.popleft().result()
            writes.append(pool.submit(_write_image, img_out / p.name,
                                      fn(img)))
            while len(writes) > 4 * num_threads:    # bound buffered arrays
                writes.popleft().result()
        for w in writes:
            w.result()


def _variant_data_yaml(variant_dir: Path) -> None:
    from .visdrone import CLASS_NAMES
    names = "\n".join(f"  {i}: {n}" for i, n in enumerate(CLASS_NAMES))
    variant_dir.joinpath("data.yaml").write_text(
        f"path: {variant_dir.resolve()}\n"
        f"train: images/val\n"
        f"val: images/val\n"
        f"nc: {len(CLASS_NAMES)}\n"
        f"names:\n{names}\n")


def build_yolo_testsets(yolo_root: str | Path, out_root: str | Path,
                        cfg: CorruptionConfig = CorruptionConfig(),
                        seed: int = SEED,
                        rng: np.random.RandomState | None = None) -> None:
    """YOLO-layout frozen testsets (build_corrupted_testsets.py:85-126).

    ``rng`` is the shared MT19937 stream threaded from build_all; created
    fresh from ``seed`` when the builder runs standalone."""
    yolo_root, out_root = Path(yolo_root), Path(out_root)
    src_imgs = _list_images(yolo_root / "images" / "val")
    src_lbl = yolo_root / "labels" / "val"
    rng = np.random.RandomState(seed) if rng is None else rng
    fns = make_corruptors(cfg, rng)
    for variant in VARIANTS:
        vdir = out_root / "yolo6" / variant
        img_out = vdir / "images" / "val"
        lbl_out = vdir / "labels" / "val"
        img_out.mkdir(parents=True, exist_ok=True)
        lbl_out.mkdir(parents=True, exist_ok=True)
        _corrupt_dir(src_imgs, fns[variant], img_out)
        for p in src_imgs:
            lbl = src_lbl / (p.stem + ".txt")
            if lbl.exists():
                shutil.copy2(lbl, lbl_out / lbl.name)
        _variant_data_yaml(vdir)


def build_coco_testsets(coco_root: str | Path, out_root: str | Path,
                        cfg: CorruptionConfig = CorruptionConfig(),
                        seed: int = SEED,
                        rng: np.random.RandomState | None = None,
                        timer=None) -> None:
    """COCO-layout frozen testsets (build_corrupted_testsets.py:129-166)."""
    coco_root, out_root = Path(coco_root), Path(out_root)
    src_imgs = _list_images(coco_root / "images" / "val")
    ann = coco_root / "annotations" / "instances_val.json"
    rng = np.random.RandomState(seed) if rng is None else rng
    fns = make_corruptors(cfg, rng, timer=timer)
    for variant in VARIANTS:
        vdir = out_root / "coco6" / variant
        img_out = vdir / "images" / "val"
        ann_out = vdir / "annotations"
        img_out.mkdir(parents=True, exist_ok=True)
        ann_out.mkdir(parents=True, exist_ok=True)
        _corrupt_dir(src_imgs, fns[variant], img_out)
        if ann.exists():
            shutil.copy2(ann, ann_out / "instances_val.json")


def build_all(processed_root: str | Path, testset_root: str | Path,
              cfg: CorruptionConfig = CorruptionConfig(),
              seed: int = SEED) -> None:
    processed_root = Path(processed_root)
    # ONE RandomState threaded yolo -> coco: the reference seeds once in
    # main() and lets the noise stream run continuously across both
    # layouts (build_corrupted_testsets.py:169-173)
    rng = np.random.RandomState(seed)
    build_yolo_testsets(processed_root / "visdrone_yolo6", testset_root, cfg,
                        seed, rng=rng)
    build_coco_testsets(processed_root / "visdrone_coco6", testset_root, cfg,
                        seed, rng=rng)


def testset_manifest(testset_root: str | Path) -> dict:
    """Audit summary: per variant, image count + content hash prefix."""
    import hashlib
    out = {}
    root = Path(testset_root)
    for fmt in ("yolo6", "coco6"):
        for variant in VARIANTS:
            img_dir = root / fmt / variant / "images" / "val"
            if not img_dir.exists():
                continue
            files = _list_images(img_dir)
            h = hashlib.sha256()
            for f in files:
                h.update(f.read_bytes())
            out[f"{fmt}/{variant}"] = {
                "images": len(files), "sha256_16": h.hexdigest()[:16]}
    return out
