"""Multi-host (DCN) scaffolding: jax.distributed init + per-process data.

The single-host design (parallel/mesh.py) already scales to a full v5e-8
host over ICI; this module adds the pieces a multi-host pod run needs
(SURVEY.md §2.3's "jax.distributed + mesh over v5e-8 … DCN beyond one
host" follow-on — the reference is single-process CUDA and has no
counterpart):

  * ``maybe_initialize()`` — env-driven ``jax.distributed.initialize``.
    After it, ``jax.devices()`` is the GLOBAL device list, so
    ``parallel.mesh.make_mesh`` meshes the whole pod unchanged; data-
    parallel gradients psum over ICI within hosts and DCN across them.
  * per-process input pipeline: ``shard_samples`` gives each process its
    row shard, ``local_batch_size`` its slice of the global batch, and
    ``pipeline.device_put_sharded`` assembles the global array from the
    process-local shard (``jax.make_array_from_process_local_data``).
  * ``is_primary()`` — process-0 discipline for JSON/CSV/plot artifacts
    (orbax checkpoint saves stay collective: every process participates).

Environment contract (set by the pod launcher; all optional on a single
host — ``maybe_initialize`` is a no-op when unset):

  ROD_COORDINATOR   host:port of process 0 (also accepts the standard
                    JAX_COORDINATOR_ADDRESS)
  ROD_NUM_PROCESSES total process count   (or JAX_NUM_PROCESSES)
  ROD_PROCESS_ID    this process's index  (or JAX_PROCESS_ID)

On Cloud TPU pods with the TPU runtime, plain ``jax.distributed.
initialize()`` auto-discovers all three; ``maybe_initialize`` calls it
bare when ROD_AUTO_DISTRIBUTED=1.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional, Sequence

import jax

_initialized = False


def maybe_initialize() -> bool:
    """Initialize jax.distributed from the environment; False if unset.

    Idempotent: safe to call from every entry point (CLI, trainers,
    __graft_entry__). Must run before the first jax.devices() touch.
    """
    global _initialized
    if _initialized:
        return True
    if os.environ.get("ROD_AUTO_DISTRIBUTED") == "1":
        jax.distributed.initialize()
        _initialized = True
        return True
    coord = (os.environ.get("ROD_COORDINATOR")
             or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    nproc = (os.environ.get("ROD_NUM_PROCESSES")
             or os.environ.get("JAX_NUM_PROCESSES"))
    pid = (os.environ.get("ROD_PROCESS_ID")
           or os.environ.get("JAX_PROCESS_ID"))
    if not (coord and nproc and pid):
        return False
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=int(nproc),
                               process_id=int(pid))
    _initialized = True
    return True


def is_primary() -> bool:
    """True on the artifact-writing process (single-host: always)."""
    return jax.process_index() == 0


def shard_samples(samples: Sequence, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> List:
    """This process's row shard of a sample list (strided, like Grain's
    ShardOptions): process k takes samples[k::count]. Every process must
    end with the SAME number of batches, so the list is truncated to a
    multiple of the process count first."""
    pc = process_count if process_count is not None else jax.process_count()
    pi = process_index if process_index is not None else jax.process_index()
    if pc == 1:
        return list(samples)
    n = (len(samples) // pc) * pc
    return list(samples[pi:n:pc])


def local_batch_size(global_batch: int) -> int:
    """Per-process slice of the global batch (must divide evenly)."""
    pc = jax.process_count()
    if global_batch % pc:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{pc} processes")
    return global_batch // pc


def grain_shard_options():
    """Grain ShardOptions for this process (data/grain_pipeline loaders)."""
    import grain.python as gp
    return gp.ShardOptions(shard_index=jax.process_index(),
                           shard_count=jax.process_count(),
                           drop_remainder=True)
