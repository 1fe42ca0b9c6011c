"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of validating multi-backend logic on a single
machine (SURVEY.md §4): Pallas kernels run in interpreter mode on CPU, and all
sharding/collective tests use XLA's host-platform device simulation.
"""
import os

# must be set before jax is imported anywhere; the shell presets
# JAX_PLATFORMS=axon (the real chip), so force-override for the test suite
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
