"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment's sitecustomize imports JAX at interpreter startup with
JAX_PLATFORMS=axon (the tunneled TPU), so plain env vars are too late here.
Backends initialize lazily, so flipping the config (and XLA_FLAGS, read at CPU
client init) before the first JAX computation still works. This emulates a TPU
mesh for sharding tests without hardware (SURVEY.md §4d).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# XLA CPU compiles of the full train step take minutes; persist them so
# repeated test runs only pay once.
os.makedirs("/tmp/jax_test_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
