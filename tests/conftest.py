"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Numerical parity tests run on CPU in float64 (the TPU path uses float32 at
runtime; tolerance-sensitive math is validated here at high precision).
The 8 virtual devices let multi-chip sharding tests run collectives without
TPU hardware (SURVEY.md §4 implication (d)).
"""
import os

# The session environment presets JAX_PLATFORMS=axon (TPU tunnel) and its
# sitecustomize imports jax at interpreter start, so the env var is already
# latched — the config update below is what actually wins.  Unit tests must
# run on local CPU (float64 parity) unless a TPU run is explicitly requested.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("BOUNDMPC_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)
assert jax.devices()[0].platform == "cpu" or os.environ.get("BOUNDMPC_TEST_TPU") == "1"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
