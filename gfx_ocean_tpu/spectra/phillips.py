"""Runtime Phillips-spectrum synthesis of initial conditions.

The reference ships ``data/spectrum.bin`` / ``data/omega.bin`` but not their
generator (SURVEY.md §3.4). This module regenerates compatible initial
conditions from physical wind parameters (BASELINE.json config 3):

    P(k)   = A * exp(-1 / (k L_w)^2) / k^4 * |k_hat . w_hat|^p
             * exp(-k^2 l^2)                       (small-wave cutoff)
    L_w    = V^2 / g
    h0(k)  = (xi_r + i xi_i) / sqrt(2) * sqrt(P(k))   xi ~ N(0, 1)
    w(k)   = sqrt(g |k|)                           (deep-water dispersion)

The wavenumber layout matches the reference's *centered* convention
(``shader/propagate.comp:45-52``): k = pi (2 i - N - 1) / L per axis with
DC near the grid center — so synthesized states drop straight into the same
``step()`` (the (-1)^(x+y) correction already assumes this layout).

Consistency with the shipped assets is validated in tests by the dispersion
relation: omega.bin's range [0.135, 4.729] rad/s equals sqrt(g |k|) over
this k-range (SURVEY.md §3.4), which this module reproduces exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gfx_ocean_tpu.config import PhillipsConfig
from gfx_ocean_tpu.golden.reference import wavenumber_1d


def _k_grids(n: int, domain_size: float) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    kx = wavenumber_1d(n, domain_size, wrap=False)[None, :]
    ky = wavenumber_1d(n, domain_size, wrap=False)[:, None]
    k_len = np.sqrt(kx * kx + ky * ky)
    return (
        np.broadcast_to(kx, (n, n)).astype(np.float64),
        np.broadcast_to(ky, (n, n)).astype(np.float64),
        k_len.astype(np.float64),
    )


def dispersion(n: int, domain_size: float, gravity: float = 9.81) -> jnp.ndarray:
    """Deep-water dispersion w(k) = sqrt(g |k|), (N, N) float32."""
    _, _, k_len = _k_grids(n, domain_size)
    return jnp.asarray(np.sqrt(gravity * k_len).astype(np.float32))


def phillips_spectrum(n: int, domain_size: float, cfg: PhillipsConfig) -> np.ndarray:
    """P(k) on the centered grid, float64 (N, N); zero at |k| ~ 0."""
    kxg, kyg, k_len = _k_grids(n, domain_size)
    g = cfg.gravity
    l_w = cfg.wind_speed ** 2 / g
    wd = np.asarray(cfg.wind_direction, dtype=np.float64)
    wd = wd / np.linalg.norm(wd)

    safe = k_len > 1.0e-8
    k_safe = np.where(safe, k_len, 1.0)
    k_hat_dot_w = (kxg * wd[0] + kyg * wd[1]) / k_safe
    directional = np.abs(k_hat_dot_w) ** cfg.directional_power

    small_l = cfg.small_wave_cutoff * domain_size / n
    p = (
        cfg.amplitude
        * np.exp(-1.0 / (k_safe * l_w) ** 2)
        / k_safe ** 4
        * directional
        * np.exp(-(k_safe ** 2) * small_l ** 2)
    )
    return np.where(safe, p, 0.0)


def synthesize(
    n: int,
    domain_size: float,
    cfg: PhillipsConfig,
    key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw h0(k) ~ CN(0, P(k)) and compute w(k).

    Returns ``(h0_pair, omega)`` with ``h0_pair`` float32 (2, N, N) — the
    (re, im)-planes convention of ``utils/complexpair.py`` — and ``omega``
    float32 (N, N). The Gaussian draw uses jax.random (reproducible,
    device-side); the spectrum envelope is built in float64 on host and
    rounded once.
    """
    p = jnp.asarray(np.sqrt(phillips_spectrum(n, domain_size, cfg) / 2.0).astype(np.float32))
    kr, ki = jax.random.split(key)
    xi_r = jax.random.normal(kr, (n, n), dtype=jnp.float32)
    xi_i = jax.random.normal(ki, (n, n), dtype=jnp.float32)
    h0 = jnp.stack([xi_r * p, xi_i * p], axis=0)
    return h0, dispersion(n, domain_size, cfg.gravity)
