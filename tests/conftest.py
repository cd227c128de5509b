"""Test configuration: force a virtual 8-device CPU platform.

Real-TPU access is reserved for ``bench.py``; tests (including the
multi-chip sharding tests in ``tests/test_parallel.py``) run on a CPU mesh
— the JAX analog of the reference's ``gfx-backend-empty`` compile-check
backend (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize may have already imported jax and registered
# the TPU backend with JAX_PLATFORMS=axon; the config update wins either way.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_state():
    """The shipped 512^2 initial conditions, as numpy."""
    from gfx_ocean_tpu.assets import load_omega, load_spectrum

    return load_spectrum(), load_omega()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
