"""Test configuration: force a virtual 8-device CPU mesh and float64 tracing.

Tests run on CPU with 8 virtual XLA host devices so sharding paths can be
validated without real multi-chip hardware; float64 is enabled for tight
adjoint/accuracy tolerances (the TPU production path runs float32).
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the tunneled TPU) via a
# sitecustomize hook, so the env var alone is not enough — override through
# jax.config below unless the caller explicitly asks for the TPU
# (SURFH_TEST_TPU=1).
_USE_TPU = bool(os.environ.get("SURFH_TEST_TPU"))
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(19940407)
