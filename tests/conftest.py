"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of validating multi-backend logic on a single
machine (SURVEY.md §4): Pallas kernels run in interpreter mode on CPU, and all
sharding/collective tests use XLA's host-platform device simulation.
"""
import os

# NB: the sandbox's sitecustomize imports jax and registers the axon TPU
# plugin before conftest runs, so env vars are too late — use config-level
# overrides, which win as long as no computation has run yet.
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
