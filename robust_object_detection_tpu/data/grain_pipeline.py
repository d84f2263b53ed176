"""Grain-backed input pipeline (alternative to the thread-pool loader).

The north-star design (BASELINE.json) calls for "sharded tf.data/Grain"
input; this wires the same fixed-shape Batch contract through
`grain.python.DataLoader`: a RandomAccessDataSource over the indexed
samples, per-record decode+letterbox+pad, Grain worker processes for
parallel JPEG decode, and optional epoch shuffling — drop-in for
`pipeline.make_batches` via `backend="grain"`.

Multi-host sharding: pass `shard_options=grain.ShardOptions(shard_index,
shard_count)` so each host reads only its slice (DCN-free input).
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np

from . import pipeline as pipe


class _SampleSource:
    """grain RandomAccessDataSource over indexed Samples."""

    def __init__(self, samples: Sequence[pipe.Sample], image_size: int,
                 max_boxes: int):
        self._samples = list(samples)
        self._size = image_size
        self._max_boxes = max_boxes

    def __len__(self) -> int:
        return len(self._samples)

    def __getitem__(self, idx: int):
        s = self._samples[idx]
        canvas, scale = pipe.load_letterboxed(s, self._size)
        m = min(len(s.boxes_xyxy), self._max_boxes)
        boxes = np.zeros((self._max_boxes, 4), np.float32)
        classes = np.full((self._max_boxes,), -1, np.int32)
        if m:
            boxes[:m] = s.boxes_xyxy[:m] * scale
            classes[:m] = s.classes[:m]
        return {"image": canvas, "boxes": boxes, "classes": classes,
                "image_id": np.int64(s.image_id),
                "scale": np.float32(scale)}


def make_batches_grain(samples: Sequence[pipe.Sample], batch_size: int,
                       image_size: int, max_boxes: int = 600,
                       shuffle: bool = False, seed: int = 0,
                       num_workers: int = 0,
                       shard_options=None) -> Iterator[pipe.Batch]:
    """Yield fixed-shape Batches through grain.python.DataLoader.

    num_workers=0 runs in-process (tests); >0 forks Grain worker processes
    for parallel decode. Incomplete trailing batches are padded to
    batch_size with num_valid marking the real rows (same contract as
    pipeline.make_batches).
    """
    import grain.python as gp

    if shard_options is None:
        # multi-host default: each process reads only its record shard
        # (parallel/distributed.grain_shard_options); single host: all
        import jax
        if jax.process_count() > 1:
            from ..parallel import distributed as dist
            shard_options = dist.grain_shard_options()
        else:
            shard_options = gp.NoSharding()
    source = _SampleSource(samples, image_size, max_boxes)
    sampler = gp.IndexSampler(
        num_records=len(source),
        shuffle=shuffle,
        seed=seed,
        num_epochs=1,
        shard_options=shard_options)
    loader = gp.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[gp.Batch(batch_size=batch_size, drop_remainder=False)],
        worker_count=num_workers)

    for rec in loader:
        n = rec["image"].shape[0]
        if n < batch_size:
            pad = batch_size - n
            rec = {k: np.concatenate(
                [v, np.repeat(v[-1:], pad, axis=0)]) for k, v in rec.items()}
            ids = rec["image_id"].copy()
            ids[n:] = -1
            rec["image_id"] = ids
        yield pipe.Batch(images=rec["image"], boxes=rec["boxes"],
                         classes=rec["classes"], image_ids=rec["image_id"],
                         scales=rec["scale"], num_valid=n)
