"""Golden-model self-consistency: quirk flags, Hermitian property, signs."""

import numpy as np
import pytest

from gfx_ocean_tpu.config import CompatFlags
from gfx_ocean_tpu.golden.reference import (
    correction_sign,
    golden_fields,
    golden_propagate,
    ifft2_unnorm_np,
    wavenumber_1d,
)


def _small_state(rng, n=32):
    h0 = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))) * 0.1
    omega = np.abs(rng.standard_normal((n, n))) + 0.1
    return h0, omega


def test_wavenumber_intended_signed():
    k = wavenumber_1d(8, 100.0, wrap=False)
    # i=0 -> pi*(-9)/100; i=7 -> pi*5/100
    assert np.isclose(k[0], np.pi * -9 / 100.0)
    assert np.isclose(k[-1], np.pi * 5 / 100.0)


def test_wavenumber_wrap_replicates_uint32():
    """Q1: for 2i <= N the uint32 value wraps to ~2**32 (then f32-rounds)."""
    n = 512
    k = wavenumber_1d(n, 1000.0, wrap=True)
    # i = 300: 600 - 513 = 87 — no wrap
    assert np.isclose(k[300], np.pi * 87 / 1000.0)
    # i = 0: wraps to float32(2**32 - 513)
    expected = np.pi * np.float64(np.float32(2.0 ** 32 - 513)) / 1000.0
    assert np.isclose(k[0], expected)
    assert k[0] > 1e6  # degenerate huge wavenumber, as in the reference


def test_correction_sign_q2():
    s = correction_sign(4, ref_sign=True)
    assert s[0, 0] == -1.0 and s[0, 1] == 1.0  # reference: -1 on even
    c = correction_sign(4, ref_sign=False)
    assert c[0, 0] == 1.0 and c[0, 1] == -1.0


def test_hermitian_spectrum_gives_real_field(rng):
    """Index-convention check: a spectrum that is Hermitian about the raw
    DFT origin (S[-y % N, -x % N] = conj(S[y, x])) inverse-transforms to a
    real field. Note this is *not* what the reference's (N-1-y, N-1-x)
    pairing produces — that flip is off by one texel from true negation
    (even with conj_neg=True), which is exactly why correction.comp can only
    keep the real part."""
    n = 32
    s = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    s_herm = (s + np.conj(np.roll(s[::-1, ::-1], 1, axis=(0, 1)))) / 2
    f = ifft2_unnorm_np(s_herm)
    assert np.abs(np.imag(f)).max() < 1e-9 * max(1.0, np.abs(f).max())


def test_reference_pairing_field_not_real(rng):
    """Documents the quirk above: even canonical conj_neg leaves a nonzero
    imaginary component that correction.comp discards (.x extraction)."""
    h0, omega = _small_state(rng)
    h, _, _ = golden_propagate(h0, omega, 1.7, 100.0, CompatFlags(conj_neg=True))
    f = ifft2_unnorm_np(h)
    assert np.abs(np.imag(f)).max() > 1e-6


def test_reference_vs_canonical_differ(rng):
    h0, omega = _small_state(rng)
    a = golden_fields(h0, omega, 2.0, 100.0, CompatFlags(conj_neg=False))
    b = golden_fields(h0, omega, 2.0, 100.0, CompatFlags(conj_neg=True))
    assert np.abs(a - b).max() > 1e-6


def test_t_zero_pairing(rng):
    """At t=0, h = h0 + h0[::-1,::-1] exactly (propagate.comp:55-62)."""
    h0, omega = _small_state(rng)
    h, _, _ = golden_propagate(h0, omega, 0.0, 100.0)
    assert np.allclose(h, h0 + h0[::-1, ::-1])


def test_displacement_is_minus_i_khat_h(rng):
    h0, omega = _small_state(rng)
    h, dx, dz = golden_propagate(h0, omega, 1.0, 100.0)
    n = h0.shape[0]
    kx = wavenumber_1d(n, 100.0, False)[None, :]
    ky = wavenumber_1d(n, 100.0, False)[:, None]
    kl = np.sqrt(kx * kx + ky * ky)
    kl = np.where(kl > 1e-10, kl, np.inf)
    assert np.allclose(dx, -1j * (kx / kl) * h)
    assert np.allclose(dz, -1j * (ky / kl) * h)


def test_golden_shapes(reference_state):
    h0, omega = reference_state
    out = golden_fields(h0[:64, :64], omega[:64, :64], 1.0, 1000.0)
    assert out.shape == (64, 64, 3)
