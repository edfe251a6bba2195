"""Test configuration: run everything on an 8-device virtual CPU mesh.

The reference had no test suite at all (SURVEY.md §4); this suite uses
CPU devices so it runs anywhere, and 8 virtual devices so the multi-chip
sharding paths are exercised without TPU hardware.
"""

import os

# Must be set before jax is imported anywhere. Overrides the ambient
# JAX_PLATFORMS (e.g. a TPU tunnel) — the test suite is CPU-only.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: model-sized CPU compiles take minutes on
# this single-core host; cache them across test sessions.
jax.config.update("jax_compilation_cache_dir", "/tmp/pdgn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
