"""Synthetic mini-VisDrone generator for tests.

The reference has no test suite (SURVEY.md §4); our converter/pipeline tests
run against a generated miniature dataset with the exact VisDrone on-disk
conventions (DET: images/ + annotations/ txt with
``x,y,w,h,score,class,trunc,occl`` rows; VID: sequences/<seq>/<frame>.jpg +
annotations/<seq>.txt).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .visdrone import USED_CLASSES


def make_det_split(root: str | Path, n_images: int = 6, seed: int = 0,
                   size_range=((64, 128), (64, 128))) -> Path:
    """Create a VisDrone-DET-style split with random images + annotations.

    Includes the edge cases the reference handles: ignored rows (score 0),
    unused classes, out-of-bounds boxes needing clamping, and one empty image.
    """
    from PIL import Image
    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "annotations").mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n_images):
        h = int(rng.randint(*size_range[0]))
        w = int(rng.randint(*size_range[1]))
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        name = f"img{i:04d}"
        Image.fromarray(img).save(root / "images" / f"{name}.jpg", quality=95)
        lines = []
        if i != n_images - 1:  # last image left empty
            for _ in range(int(rng.randint(1, 6))):
                x = int(rng.randint(0, w - 8))
                y = int(rng.randint(0, h - 8))
                bw = int(rng.randint(4, max(5, w - x)))
                bh = int(rng.randint(4, max(5, h - y)))
                cat = int(rng.choice(USED_CLASSES))
                lines.append(f"{x},{y},{bw},{bh},1,{cat},0,0")
            # an ignored region (score 0) and an unused class (7)
            lines.append(f"0,0,10,10,0,1,0,0")
            lines.append(f"5,5,10,10,1,7,0,0")
            # an out-of-bounds box that must be clamped
            lines.append(f"{w - 4},{h - 4},20,20,1,4,0,0")
        (root / "annotations" / f"{name}.txt").write_text(
            "\n".join(lines) + "\n")
    return root


def make_vid_split(root: str | Path, n_seqs: int = 2, frames_per_seq: int = 3,
                   seed: int = 0, hw=(64, 96)) -> Path:
    """Create a VisDrone-VID-style split (sequences of frames + per-seq txt)."""
    from PIL import Image
    root = Path(root)
    (root / "annotations").mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    h, w = hw
    for s in range(n_seqs):
        seq = f"uav{s:04d}"
        seq_dir = root / "sequences" / seq
        seq_dir.mkdir(parents=True, exist_ok=True)
        lines = []
        for f in range(1, frames_per_seq + 1):
            img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            Image.fromarray(img).save(seq_dir / f"{f:07d}.jpg", quality=95)
            for tid in range(int(rng.randint(0, 3))):
                x = int(rng.randint(0, w - 10))
                y = int(rng.randint(0, h - 10))
                cat = int(rng.choice(USED_CLASSES))
                lines.append(f"{f},{tid},{x},{y},8,8,1,{cat},0,0")
        (root / "annotations" / f"{seq}.txt").write_text(
            "\n".join(lines) + "\n")
    return root
