"""Test configuration: run on CPU with a virtual 8-device mesh.

The container's sitecustomize registers the axon TPU plugin and forces
``jax_platforms='axon,cpu'`` at interpreter startup, so env vars are not
enough — the platform must be overridden at the jax.config level. Tests
always run on 8 virtual CPU devices (the standard JAX multi-host simulation
recipe); the real chip is reserved for benchmarks.
"""

import os

import jax
import numpy as np
import pytest

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(123)
