"""Test harness: force an 8-virtual-device CPU mesh so sharding logic is
exercised without TPU hardware (the driver separately dry-runs multi-chip).

Note: this image's sitecustomize registers the `axon` TPU plugin and forces
jax_platforms='axon,cpu', overriding the JAX_PLATFORMS env var — so we must
re-force 'cpu' through jax.config *after* import, before any backend use.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
# don't pollute the repo's persistent TPU compilation cache with CPU entries
os.environ.setdefault("FANGYAN_JAX_CACHE_DIR", "")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", f"tests must run on CPU, got {jax.devices()}"


@pytest.fixture
def rng():
    return np.random.default_rng(1986)
