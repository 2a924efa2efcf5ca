"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding logic is
exercised on a virtual CPU mesh (SURVEY.md §4: multi-host logic tested on CPU
meshes via ``xla_force_host_platform_device_count``).

Note: the container's sitecustomize imports jax at interpreter start with
``JAX_PLATFORMS=axon``, so env vars alone are too late here -- we override the
platform through ``jax.config`` before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
