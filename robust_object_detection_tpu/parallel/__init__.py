"""Parallelism: device mesh, sharded train/eval steps, collective helpers.

The reference is strictly single-GPU (SURVEY.md §2.3: no DP/TP/PP/SP/EP, no
distributed backend). Here data-parallelism over a `jax.sharding.Mesh` is
first-class: batches shard over the `data` axis, parameters replicate, XLA
inserts the gradient all-reduce over ICI.
"""

from .mesh import (MeshContext, make_mesh, data_sharding, replicated,
                   shard_batch)
