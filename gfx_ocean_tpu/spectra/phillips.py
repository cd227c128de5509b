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


def dispersion(n: int, domain_size: float, gravity: float = 9.81,
               depth: float = float("inf")) -> jnp.ndarray:
    """Dispersion w(k), (N, N) float32.

    Deep water (the reference's shipped ``omega.bin`` convention):
    ``w = sqrt(g |k|)``. A finite ``depth`` h switches to the general
    finite-depth relation ``w = sqrt(g |k| tanh(|k| h))`` — long waves
    (k h << 1) slow toward the shallow-water limit ``|k| sqrt(g h)``
    while short waves are unaffected (tanh -> 1)."""
    _, _, k_len = _k_grids(n, domain_size)
    if np.isinf(depth):
        tanh = 1.0
    else:
        tanh = np.tanh(k_len * depth)
    return jnp.asarray(np.sqrt(gravity * k_len * tanh).astype(np.float32))


def _directional(kxg: np.ndarray, kyg: np.ndarray, k_safe: np.ndarray,
                 cfg: PhillipsConfig) -> np.ndarray:
    """|k_hat . w_hat|^p directional factor, with waves moving AGAINST
    the wind (dot < 0) damped by ``cfg.opposing_suppression``."""
    wd = np.asarray(cfg.wind_direction, dtype=np.float64)
    wd = wd / np.linalg.norm(wd)
    k_hat_dot_w = (kxg * wd[0] + kyg * wd[1]) / k_safe
    d = np.abs(k_hat_dot_w) ** cfg.directional_power
    if cfg.opposing_suppression != 1.0:
        d = d * np.where(k_hat_dot_w < 0.0, cfg.opposing_suppression, 1.0)
    return d


def phillips_spectrum(n: int, domain_size: float, cfg: PhillipsConfig) -> np.ndarray:
    """P(k) on the centered grid, float64 (N, N); zero at |k| ~ 0."""
    kxg, kyg, k_len = _k_grids(n, domain_size)
    g = cfg.gravity
    l_w = cfg.wind_speed ** 2 / g

    safe = k_len > 1.0e-8
    k_safe = np.where(safe, k_len, 1.0)
    directional = _directional(kxg, kyg, k_safe, cfg)

    small_l = cfg.small_wave_cutoff * domain_size / n
    p = (
        cfg.amplitude
        * np.exp(-1.0 / (k_safe * l_w) ** 2)
        / k_safe ** 4
        * directional
        * np.exp(-(k_safe ** 2) * small_l ** 2)
    )
    return np.where(safe, p, 0.0)


def jonswap_spectrum(n: int, domain_size: float, cfg: PhillipsConfig) -> np.ndarray:
    """JONSWAP wave-vector spectrum on the centered grid, float64 (N, N).

    The fetch-limited frequency spectrum of Hasselmann et al. 1973:

        S(w)  = alpha g^2 / w^5 * exp(-5/4 (wp/w)^4) * gamma^r
        r     = exp(-(w - wp)^2 / (2 sigma^2 wp^2)),  sigma = 0.07 (w <= wp)
                                                              0.09 (w >  wp)
        alpha = 0.076 (U^2 / (F g))^0.22
        wp    = 22 (g^2 / (U F))^(1/3)

    converted to the wave-vector domain through the dispersion relation
    (``P(k) = S(w(k)) * D(k_hat) * (dw/dk) / k``, the standard graphics
    conversion — Horvath, "Empirical directional wave spectra for
    computer graphics", 2015), using this module's ``|k_hat . w_hat|^p``
    directional factor and small-wave cutoff.

    A finite ``cfg.depth`` h makes this the TMA spectrum (Bouws et al.
    1985): the Kitaigorodskii attenuation ``Phi(w_h)``, ``w_h = w
    sqrt(h/g)``, multiplies S(w) (long waves lose energy over a shallow
    bottom), and the conversion consistently uses the finite-depth
    ``w = sqrt(g k tanh(k h))`` and its ``dw/dk``. At ``depth=inf`` every
    factor reduces exactly to the deep-water JONSWAP form.

    The overall magnitude is PEAK-NORMALIZED to the classic Phillips
    spectrum at the same (amplitude, wind): the reference's unnormalized
    inverse FFT (SURVEY.md Q3) makes the absolute scale a free visual
    choice absorbed by the /3.0, /3.5, height_scale render scalings, so
    matching the Phillips peak lets JONSWAP states drop into the same
    ``step()`` and render pipeline without retuning. The SHAPE (peak
    sharpness gamma, fetch-limited low-k rolloff, depth attenuation) is
    what the model adds.
    """
    kxg, kyg, k_len = _k_grids(n, domain_size)
    g = cfg.gravity
    u, fetch, gamma = cfg.wind_speed, cfg.fetch, cfg.peak_enhancement
    h = cfg.depth

    safe = k_len > 1.0e-8
    k_safe = np.where(safe, k_len, 1.0)
    if np.isinf(h):
        w = np.sqrt(g * k_safe)
        dw_dk = g / (2.0 * w)
        phi = 1.0
    else:
        kh = k_safe * h
        tanh = np.tanh(kh)
        w = np.sqrt(g * k_safe * tanh)
        # d/dk [g k tanh(kh)] = g (tanh + kh sech^2); sech^2 = 1 - tanh^2
        dw_dk = g * (tanh + kh * (1.0 - tanh * tanh)) / (2.0 * w)
        # Kitaigorodskii depth function, Thompson-Vincent approximation
        # (as used by TMA, Bouws et al. 1985):
        w_h = w * np.sqrt(h / g)
        phi = np.where(
            w_h <= 1.0, 0.5 * w_h ** 2,
            np.where(w_h < 2.0, 1.0 - 0.5 * (2.0 - w_h) ** 2, 1.0))
    wp = 22.0 * (g * g / (u * fetch)) ** (1.0 / 3.0)
    alpha = 0.076 * (u * u / (fetch * g)) ** 0.22
    sigma = np.where(w <= wp, 0.07, 0.09)
    r = np.exp(-((w - wp) ** 2) / (2.0 * sigma ** 2 * wp ** 2))
    s_w = (alpha * g * g / w ** 5
           * np.exp(-1.25 * (wp / w) ** 4)
           * gamma ** r
           * phi)

    directional = _directional(kxg, kyg, k_safe, cfg)
    small_l = cfg.small_wave_cutoff * domain_size / n
    p = np.where(
        safe,
        s_w * directional * dw_dk / k_safe
        * np.exp(-(k_safe ** 2) * small_l ** 2),
        0.0,
    )
    peak = p.max()
    if peak > 0.0:
        p = p * (phillips_spectrum(n, domain_size, cfg).max() / peak)
    return p


def spectrum(n: int, domain_size: float, cfg: PhillipsConfig) -> np.ndarray:
    """The configured model's P(k): ``cfg.model`` picks phillips/jonswap."""
    if cfg.model == "jonswap":
        return jonswap_spectrum(n, domain_size, cfg)
    return phillips_spectrum(n, domain_size, cfg)


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
    rounded once. ``cfg.model`` selects the envelope (phillips/jonswap).
    """
    p = jnp.asarray(np.sqrt(spectrum(n, domain_size, cfg) / 2.0).astype(np.float32))
    kr, ki = jax.random.split(key)
    xi_r = jax.random.normal(kr, (n, n), dtype=jnp.float32)
    xi_i = jax.random.normal(ki, (n, n), dtype=jnp.float32)
    h0 = jnp.stack([xi_r * p, xi_i * p], axis=0)
    return h0, dispersion(n, domain_size, cfg.gravity, cfg.depth)
