"""Test harness: force an 8-virtual-device CPU mesh so sharding logic is
exercised without TPU hardware (the driver separately dry-runs multi-chip).

Note: this image's sitecustomize registers the `axon` TPU plugin and forces
jax_platforms='axon,cpu', overriding the JAX_PLATFORMS env var — so we must
re-force 'cpu' through jax.config *after* import, before any backend use.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
# CPU entries go to a DEDICATED persistent cache (not the TPU .jax_cache):
# the suite is compile-dominated on this box's single core, and the tiny
# fixture configs are stable across runs, so warm runs cut the fast tier
# from ~40 min to minutes. Code changes invalidate only the affected
# programs (HLO-fingerprint keyed).
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("FANGYAN_JAX_CACHE_DIR", os.path.join(_repo, ".jax_cache_cpu"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from fangyan_tts_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", f"tests must run on CPU, got {jax.devices()}"


@pytest.fixture
def rng():
    return np.random.default_rng(1986)
