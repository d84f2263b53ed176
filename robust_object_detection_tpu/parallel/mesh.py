"""Device mesh construction and sharding helpers.

Design (the scaling-book recipe): pick a mesh, annotate shardings on the
arguments of one jitted step, let XLA insert the collectives. For this
workload the natural layout is pure data parallelism — detection batches are
large and models are small (<100M params) — so parameters replicate and the
per-step gradient psum rides ICI. The `model` axis exists for forward
compatibility (sharding RT-DETR's decoder or very large batches of queries)
and is exercised by the multi-chip dry-run.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if cfg.data > 0:
        # explicit sizes: take the first data*model devices (lets tests and
        # single-chip runs use a sub-mesh of a larger host topology)
        need = cfg.data * max(1, cfg.model)
        if need > len(devices):
            raise ValueError(f"mesh needs {need} devices, "
                             f"have {len(devices)}")
        devices = devices[:need]
    data, model = cfg.axis_sizes(len(devices))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


@dataclasses.dataclass
class MeshContext:
    """A mesh plus its two standard shardings."""
    mesh: Mesh

    @property
    def data(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(DATA_AXIS))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    @property
    def n_data(self) -> int:
        return self.mesh.shape[DATA_AXIS]


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """device_put every array of a batch pytree with batch-dim sharding."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_params(mesh: Mesh, tree: Any) -> Any:
    """Replicate parameters/state across the mesh."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate_tree(ctx: "MeshContext", tree: Any) -> Any:
    """Replicate a host/state pytree across the (possibly multi-host) mesh.

    Single process: plain device_put with the replicated sharding. Multi
    process: device_put can't target non-addressable devices, so each
    process contributes its identical full copy via
    jax.make_array_from_process_local_data (P() spec: local == global).
    """
    s = ctx.replicated
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def rtdetr_decoder_tp(ctx: "MeshContext", tree: Any) -> Any:
    """NamedSharding tree: Megatron tensor parallelism for the RT-DETR
    decoder over the `model` axis; everything else replicated.

    Applied to the WHOLE train state: the optimizer/EMA subtrees mirror the
    param tree, so their leaf paths contain the same ``layer{i}/...``
    segments and pick up the matching specs. Layout (per decoder layer):

      linear1 (d, ffn)  column-sharded -> ffn activations sharded
      linear2 (ffn, d)  row-sharded    -> psum over `model` at the output
      self_attn q/k/v (d, H, hd) head-sharded; out (H, hd, d) row-sharded

    Head count (8) and ffn width must divide the model-axis size. XLA's
    SPMD partitioner inserts the all-reduces; the data-axis grad psum
    composes with them on the 2D mesh.
    """
    mesh = ctx.mesh

    def spec(path) -> P:
        keys = [str(getattr(k, "key", k)) for k in path]
        s = "/".join(keys)
        if any(k.startswith("layer") and k[5:].isdigit() for k in keys):
            if s.endswith("linear1/kernel"):
                return P(None, MODEL_AXIS)
            if s.endswith("linear1/bias"):
                return P(MODEL_AXIS)
            if s.endswith("linear2/kernel"):
                return P(MODEL_AXIS, None)
            if "self_attn" in s:
                if s.endswith(("query/kernel", "key/kernel",
                               "value/kernel")):
                    return P(None, MODEL_AXIS, None)
                if s.endswith(("query/bias", "key/bias", "value/bias")):
                    return P(MODEL_AXIS, None)
                if s.endswith("out/kernel"):
                    return P(MODEL_AXIS, None, None)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, spec(p)), tree)


def pad_batch_to(batch_arrays: Any, multiple: int) -> Any:
    """Pad leading dim up to a multiple (so it divides the data axis)."""
    def pad(x):
        n = x.shape[0]
        p = (-n) % multiple
        if p == 0:
            return x
        pads = [(0, p)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, pads)
    return jax.tree.map(pad, batch_arrays)
