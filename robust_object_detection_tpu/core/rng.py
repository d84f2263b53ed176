"""RNG discipline.

The reference seeds four separate global RNGs and hopes they stay in sync
(random/numpy/torch/cuda at train_frcnn_baseline.py:40-47). Here randomness is
explicit and functional: one root `jax.random.key` per experiment, split along
named streams; nothing global. Frozen-testset generation is the single
deliberate exception — it replays numpy's MT19937 stream so the on-disk
testsets are bit-identical to the reference's (build_corrupted_testsets.py:
13,26-27 seeds numpy with 42); see data/testsets.py.
"""

from __future__ import annotations

from typing import Dict, Iterator

import jax


class RngStream:
    """A named, stateless-at-heart stream of PRNG keys.

    ``stream.next()`` returns a fresh key by folding an incrementing counter
    into the stream's base key; the counter is the only state, making resume
    trivial (checkpoint the counter, not the key).
    """

    def __init__(self, base_key: jax.Array, counter: int = 0):
        self._base = base_key
        self._counter = counter

    @property
    def counter(self) -> int:
        return self._counter

    def next(self) -> jax.Array:
        k = jax.random.fold_in(self._base, self._counter)
        self._counter += 1
        return k

    def peek(self, offset: int = 0) -> jax.Array:
        return jax.random.fold_in(self._base, self._counter + offset)


class Rng:
    """Root RNG for an experiment: derive named streams deterministically."""

    def __init__(self, seed: int):
        self.seed = seed
        self._root = jax.random.key(seed)
        self._streams: Dict[str, RngStream] = {}

    def stream(self, name: str) -> RngStream:
        if name not in self._streams:
            # Stable per-name key: fold in a hash of the name.
            h = _stable_hash(name)
            self._streams[name] = RngStream(jax.random.fold_in(self._root, h))
        return self._streams[name]

    def key(self, name: str) -> jax.Array:
        """One-shot key for `name` (no stream state)."""
        return jax.random.fold_in(self._root, _stable_hash(name))

    def state(self) -> Dict[str, int]:
        """Counters of all streams, for checkpointing."""
        return {k: s.counter for k, s in self._streams.items()}

    def restore(self, state: Dict[str, int]) -> None:
        for name, counter in state.items():
            self.stream(name)._counter = counter


def _stable_hash(name: str) -> int:
    """Deterministic 31-bit hash (python's hash() is salted per process)."""
    h = 2166136261
    for b in name.encode():
        h = ((h ^ b) * 16777619) & 0x7FFFFFFF
    return h


def key_iter(key: jax.Array) -> Iterator[jax.Array]:
    i = 0
    while True:
        yield jax.random.fold_in(key, i)
        i += 1
