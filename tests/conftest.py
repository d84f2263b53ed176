"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 CPU devices (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# Hard override: the session environment preloads jax with the real TPU chip
# (jax_platforms=axon,cpu), so env vars alone are ignored — force the platform
# through jax.config before any backend initialises.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the slow tier is dominated by
# trainer-step compiles on the virtual 8-CPU mesh (identical HLO between
# runs). With the cache warm, repeat runs of the full suite drop from
# tens of minutes to the pure execution time. Keyed per repo checkout;
# safe to delete at any time.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_test_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
