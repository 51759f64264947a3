"""Test configuration: run everything on a virtual 8-device CPU mesh.

The dev environment preloads an `axon` TPU plugin via sitecustomize (jax is
already imported at interpreter start, env JAX_PLATFORMS=axon). Overriding the
env var is therefore not enough; we must flip the already-imported jax config
before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2022)
