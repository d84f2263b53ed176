"""Testset restoration: run the U-Net over the frozen corrupted testsets.

Reference counterpart: restore_testsets.py — loads the best U-Net, restores
every image of the Noise/Blur/LowRes variants at full resolution (pad to a
multiple of 16 with reflection, forward, un-pad, restore_testsets.py:52-79),
copies Clean unchanged (:145-159), writes ``<root>/{coco6,yolo6}_restored``
(:30-35) and rewrites data.yaml paths (:122-132).

TPU-native: images are grouped by padded shape and batched through ONE
jitted forward per shape group (the reference runs per-image batch-1);
JPEG decode/encode overlaps device compute via a thread pool.
"""

from __future__ import annotations

import shutil
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

from ..models import unet as unet_lib
from .testsets import VARIANTS

RESTORE_VARIANTS = ("Test_Noise", "Test_Blur", "Test_LowRes")


def _read(path: Path) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def _size_hw(path: Path) -> Tuple[int, int]:
    """(h, w) from the JPEG header only — no pixel decode.

    PIL's ``open`` is lazy: ``.size`` parses the header. The r3 sweep
    decomposition showed the old full-decode size pass costing ~270 ms per
    variant (every image decoded TWICE: once for its size, once for the
    batch)."""
    from PIL import Image
    with Image.open(path) as im:
        w, h = im.size
    return h, w


def _write(path: Path, img: np.ndarray, quality: int = 95) -> None:
    from PIL import Image
    Image.fromarray(img).save(path, quality=quality)


def restore_images(apply_fn, variables, paths: List[Path],
                   out_dir: Path, batch_size: int = 8,
                   num_threads: int = 8, timer=None) -> int:
    """Restore a list of images, batching same-padded-shape groups.

    `apply_fn` is the uint8-in/uint8-out jitted forward
    (models/unet.jit_apply_u8): normalisation and re-quantisation run on
    device so host<->device traffic is 4x smaller each way, and batch k+1
    is decoded + dispatched BEFORE batch k's output is fetched, so JPEG
    decode/encode overlaps device compute (double buffering; the
    reference runs per-image batch-1 fully serial,
    restore_testsets.py:52-79).
    """
    import jax
    import jax.numpy as jnp
    from concurrent.futures import ThreadPoolExecutor

    from ..core.profiling import StageTimer
    timer = timer if timer is not None else StageTimer()

    out_dir.mkdir(parents=True, exist_ok=True)
    groups: Dict[Tuple[int, int], List[Path]] = defaultdict(list)
    shapes: Dict[Path, Tuple[int, int]] = {}
    with ThreadPoolExecutor(num_threads) as pool:
        with timer.stage("restore/index_sizes"):
            sizes = list(pool.map(_size_hw, paths))
    for p, (h, w) in zip(paths, sizes):
        ph, pw = h + (-h) % 16, w + (-w) % 16
        groups[(ph, pw)].append(p)
        shapes[p] = (h, w)

    n = 0
    with ThreadPoolExecutor(num_threads) as pool:

        def drain(inflight) -> None:
            nonlocal n
            chunk, out_dev = inflight
            with timer.stage("restore/fetch"):
                # fetch only the real rows (trailing chunks are padded to a
                # full batch for shape stability)
                out = np.asarray(out_dev[:len(chunk)])  # u8 (n, ph, pw, 3)
            with timer.stage("restore/encode"):
                writes = []
                for i, p in enumerate(chunk):
                    h, w = shapes[p]
                    writes.append(pool.submit(_write, out_dir / p.name,
                                              out[i, :h, :w]))
                for wjob in writes:
                    wjob.result()
            n += len(chunk)

        inflight = None
        for (ph, pw), group in sorted(groups.items()):
            for start in range(0, len(group), batch_size):
                chunk = group[start:start + batch_size]
                with timer.stage("restore/decode_pad"):
                    imgs = list(pool.map(_read, chunk))
                    # always a FULL batch: a trailing partial chunk would
                    # otherwise compile a second executable per shape group
                    # (~20 s each on TPU); padded rows are sliced off after
                    # the fetch
                    batch = np.zeros((batch_size, ph, pw, 3), np.uint8)
                    for i, im in enumerate(imgs):
                        h, w = im.shape[:2]
                        # reflect-pad to the group's padded shape (uint8
                        # pad == f32 pad of the same pixels; /255 runs on
                        # device inside apply_fn)
                        batch[i] = np.pad(
                            im, ((0, ph - h), (0, pw - w), (0, 0)),
                            mode="reflect")
                with timer.stage("restore/dispatch"):
                    out_dev = apply_fn(variables, jnp.asarray(batch))
                if inflight is not None:
                    drain(inflight)
                inflight = (chunk, out_dev)
        if inflight is not None:
            drain(inflight)
    return n


def restore_testsets(testset_root: str | Path, unet_dir: str | Path,
                     channels=(32, 64, 128, 256), batch_size: int = 8,
                     timer=None) -> dict:
    """Build ``{coco6,yolo6}_restored`` next to the frozen testsets."""
    from ..train.restoration import load_best
    testset_root = Path(testset_root)
    model, variables = load_best(unet_dir, channels)
    apply_fn = unet_lib.jit_apply_u8(model)

    counts = {}
    for fmt in ("coco6", "yolo6"):
        src_root = testset_root / fmt
        dst_root = testset_root / f"{fmt}_restored"
        if not src_root.exists():
            continue
        for variant in VARIANTS:
            src = src_root / variant
            dst = dst_root / variant
            if not src.exists():
                continue
            # copy everything except images (labels/annotations/data.yaml)
            for item in src.rglob("*"):
                rel = item.relative_to(src)
                if "images" in rel.parts:
                    continue
                if item.is_dir():
                    (dst / rel).mkdir(parents=True, exist_ok=True)
                else:
                    (dst / rel).parent.mkdir(parents=True, exist_ok=True)
                    shutil.copy2(item, dst / rel)
            # data.yaml paths must point at the restored root
            y = dst / "data.yaml"
            if y.exists():
                y.write_text(y.read_text().replace(
                    str(src.resolve()), str(dst.resolve())))
            img_src = src / "images" / "val"
            img_dst = dst / "images" / "val"
            paths = sorted(p for p in img_src.glob("*.*")
                           if p.suffix.lower() in
                           (".jpg", ".jpeg", ".png", ".bmp"))
            if variant in RESTORE_VARIANTS:
                counts[f"{fmt}/{variant}"] = restore_images(
                    apply_fn, variables, paths, img_dst, batch_size,
                    timer=timer)
            else:     # Clean copied unchanged (restore_testsets.py:145-159)
                img_dst.mkdir(parents=True, exist_ok=True)
                for p in paths:
                    shutil.copy2(p, img_dst / p.name)
                counts[f"{fmt}/{variant}"] = len(paths)
    return counts
