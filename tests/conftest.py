"""Test configuration: run everything on an 8-device virtual CPU mesh.

The reference had no test suite at all (SURVEY.md §4); this suite uses
CPU devices so it runs anywhere, and 8 virtual devices so the multi-chip
sharding paths are exercised without TPU hardware.
"""

import os

# Must be set before jax is imported anywhere. Overrides the ambient
# JAX_PLATFORMS (e.g. a TPU tunnel) — the test suite is CPU-only.
# PALLAS_AXON_POOL_IPS must be cleared too: sitecustomize registers the
# axon TPU backend unconditionally when it is set, ignoring JAX_PLATFORMS.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# A sitecustomize may import jax and register a TPU plugin before this
# file runs, making the env vars above insufficient — force the platform
# through jax.config too (effective while no backend has been used yet).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: model-sized CPU compiles take minutes on
# this single-core host; cache them across test sessions.
jax.config.update("jax_compilation_cache_dir", "/tmp/pdgn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
