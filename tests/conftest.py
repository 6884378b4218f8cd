"""Test configuration.

Multi-chip logic is tested on a virtual 8-device CPU mesh — the TPU-native
analog of "test multi-node without a cluster" (SURVEY.md §4). These env vars
must be set before jax initializes its backends, hence the module-level
placement ahead of any jax import.
"""
import os

# NOTE: this image's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (real TPU), so env vars alone are too late here — the
# config update below is what actually pins tests to the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
