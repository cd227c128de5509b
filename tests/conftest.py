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

# Persistent compilation cache: repeat suite runs skip CPU-mesh compiles
# (the dominant cost of this suite). Same default dir as the product
# entry points; cache keys include platform/flags so CPU and TPU coexist.
from gfx_ocean_tpu.utils.compile_cache import enable_default_cache  # noqa: E402

enable_default_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gfx_ocean_tpu.assets.bincode import reference_data_dir  # noqa: E402

# On hosts without the reference checkout (e.g. a bare CI runner), generate
# Phillips-synthesized 512^2 assets in the reference's bincode format and
# point the loader at them. Tests that assert the SHIPPED bins' statistics
# use the ``shipped_assets`` fixture and skip in that case.
HAVE_SHIPPED_ASSETS = os.path.exists(
    os.path.join(reference_data_dir(), "spectrum.bin"))
if not HAVE_SHIPPED_ASSETS:
    _gen = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "_generated_assets")
    os.makedirs(_gen, exist_ok=True)
    _spec = os.path.join(_gen, "spectrum.bin")
    _om = os.path.join(_gen, "omega.bin")
    if not (os.path.exists(_spec) and os.path.exists(_om)):
        from gfx_ocean_tpu.assets.bincode import save_omega, save_spectrum
        from gfx_ocean_tpu.config import PhillipsConfig
        from gfx_ocean_tpu.spectra.phillips import synthesize
        from gfx_ocean_tpu.utils.complexpair import from_pair_np

        _h0, _omega = synthesize(512, 1000.0, PhillipsConfig(),
                                 jax.random.PRNGKey(0))
        save_spectrum(_spec, from_pair_np(np.asarray(_h0)))
        save_omega(_om, np.asarray(_omega))
    os.environ["GFX_OCEAN_REFERENCE_DATA"] = _gen


@pytest.fixture(scope="session")
def shipped_assets():
    """Gate for tests that assert the shipped bins' exact statistics."""
    if not HAVE_SHIPPED_ASSETS:
        pytest.skip("reference data/ not available; using generated assets")


@pytest.fixture(scope="session")
def reference_state():
    """The shipped (or generated) 512^2 initial conditions, as numpy."""
    from gfx_ocean_tpu.assets import load_omega, load_spectrum

    return load_spectrum(), load_omega()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
