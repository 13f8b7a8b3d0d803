"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the standard JAX way to test pjit/shard_map/collectives without TPU
pod hardware (SURVEY.md §4). Kernels that are Pallas-based run in interpret
mode on CPU via their own `interpret=` plumbing.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# The axon PJRT plugin registers itself at interpreter startup (via
# sitecustomize) and wins backend selection even with JAX_PLATFORMS=cpu in
# the environment — the config flag is the only reliable override. Without
# it the whole suite silently runs over the single-chip TPU tunnel.
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_cache():
    """Drop compiled programs between modules: XLA-CPU's JIT state grown
    over the whole suite has produced compile-time segfaults."""
    yield
    jax.clear_caches()
