"""Unnormalized inverse FFT for TPU, three implementations.

The reference does its 2-D inverse FFT as 512 independent shared-memory
radix-2 Stockham workgroups per axis (``shader/fft_row.comp``,
``shader/fft_col.comp``; dispatch at ``src/render.rs:1158-1231``) with no
1/N normalization (SURVEY.md §2.4 Q3). We verified the kernel computes
exactly ``y[n] = sum_k x[k] e^{+2 pi i n k / N}`` = ``N * ifft(x)``.

TPU-native design — do NOT translate the butterfly network:

* ``matmul`` (default): a DFT is a dense linear map; on TPU the systolic
  MXU makes an N x N matmul the fastest way to apply it for moderate N.
  A full 2-D transform is ``W @ X @ W`` (W symmetric), i.e. two complex
  matmuls = 8 real MXU matmuls, zero shuffles, zero barriers. For large N
  (> ``direct_max``) a four-step Cooley-Tukey split N = N1*N2 reduces the
  work from O(N^2) to O(N*(N1+N2)) per line while *staying batched matmuls*:
  small-DFT (matmul) -> twiddle (elementwise, fused by XLA) -> small-DFT
  (matmul). This is the same row/col + staging decomposition as the
  reference's shared-memory kernel, re-expressed for a machine whose fast
  path is a 128x128 systolic array instead of 256 SIMT lanes.

* ``xla``: ``jnp.fft.ifftn`` scaled by N — XLA's FFT HLO. Golden / fallback.

* ``pallas``: fused single-kernel path (see ``ops/pallas_step.py``) — the
  whole step runs out of VMEM; exposed here for per-axis use as well.

Precision: all matmuls run at ``HIGHEST`` precision (f32-equivalent on the
MXU via multi-pass bf16) — the 1e-4 L-inf budget (BASELINE.md) rules out
plain bf16. Twiddle/DFT matrices are built in float64 on host, rounded once
to float32.
"""

from __future__ import annotations

import functools
import math
from typing import Literal, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Impl = Literal["matmul", "xla"]

_HIGHEST = jax.lax.Precision.HIGHEST

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,  # bf16x6 on MXU — f32-equivalent
    "high": jax.lax.Precision.HIGH,        # bf16x3 — ~2x MXU throughput
    "default": jax.lax.Precision.DEFAULT,  # bf16 — fastest, ~1e-2 error
}


def resolve_precision(name: str) -> jax.lax.Precision:
    try:
        return _PRECISIONS[name]
    except KeyError:
        raise ValueError(f"unknown matmul precision {name!r}; options: {sorted(_PRECISIONS)}")


@functools.lru_cache(maxsize=None)
def _dft_matrix_np(n: int, sign: int) -> Tuple[np.ndarray, np.ndarray]:
    """(real, imag) of W[j, k] = exp(sign * 2 pi i j k / n), float32 from f64."""
    j = np.arange(n, dtype=np.float64)
    # Compute the phase exponent modulo n in integers to keep the argument
    # small before the f64 multiply — exact twiddles even at n = 4096**2.
    jk = np.outer(np.arange(n, dtype=np.int64), np.arange(n, dtype=np.int64)) % n
    theta = (2.0 * np.pi * sign / n) * jk.astype(np.float64)
    del j
    return np.cos(theta).astype(np.float32), np.sin(theta).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _twiddle_np(n1: int, n2: int, sign: int) -> Tuple[np.ndarray, np.ndarray]:
    """Four-step twiddle T[a, b] = exp(sign * 2 pi i a b / (n1*n2)), (n1, n2)."""
    n = n1 * n2
    ab = np.outer(np.arange(n1, dtype=np.int64), np.arange(n2, dtype=np.int64)) % n
    theta = (2.0 * np.pi * sign / n) * ab.astype(np.float64)
    return np.cos(theta).astype(np.float32), np.sin(theta).astype(np.float32)


def _split(n: int) -> Tuple[int, int]:
    """Balanced N = N1 * N2 split with both factors powers of two."""
    log = n.bit_length() - 1
    l1 = log // 2
    return 1 << l1, 1 << (log - l1)


def _complex_matmul(ar, ai, br, bi, precision=_HIGHEST):
    """(ar + i ai) @ (br + i bi) -> (real, imag). 4 real MXU matmuls.

    3-mult Karatsuba saves one matmul but costs extra adds and, more
    importantly for f32-on-MXU, one extra rounding — measured irrelevant at
    these sizes, so keep the numerically cleaner 4-mult form.
    """
    rr = jnp.matmul(ar, br, precision=precision) - jnp.matmul(ai, bi, precision=precision)
    ri = jnp.matmul(ar, bi, precision=precision) + jnp.matmul(ai, br, precision=precision)
    return rr, ri


def dft_matrices(n: int, sign: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    wr, wi = _dft_matrix_np(n, sign)
    return jnp.asarray(wr), jnp.asarray(wi)


def _ifft_last_matmul_direct(x: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized inverse DFT along the last axis via one dense matmul."""
    n = x.shape[-1]
    wr, wi = dft_matrices(n, sign=1)
    w = jax.lax.complex(wr, wi)
    # y[..., j] = sum_k x[..., k] W[j, k]; W symmetric => x @ W.
    return jnp.matmul(x, w, precision=_HIGHEST)


def _ifft_last_matmul_foursteps(x: jnp.ndarray) -> jnp.ndarray:
    """Four-step split along the last axis: O(N*(N1+N2)) as batched matmuls.

    Derivation (sign +1, unnormalized): with k = N2*k1 + k2, n = n1 + N1*n2,
      y[n1 + N1 n2] = sum_{k2} W_N[n1 k2] * (sum_{k1} X[k1,k2] W_{N1}[n1 k1])
                      * W_{N2}[n2 k2]
    i.e. reshape -> small DFT over k1 (matmul) -> twiddle -> small DFT over
    k2 (matmul) -> transpose-reshape. The transposes are XLA relayouts, the
    twiddle fuses into the matmul epilogue.
    """
    n = x.shape[-1]
    n1, n2 = _split(n)
    batch = x.shape[:-1]
    xs = x.reshape(batch + (n1, n2))  # X[k1, k2], row-major: k = N2*k1 + k2

    w1r, w1i = _dft_matrix_np(n1, 1)
    w1 = jnp.asarray(w1r) + 1j * jnp.asarray(w1i)
    w2r, w2i = _dft_matrix_np(n2, 1)
    w2 = jnp.asarray(w2r) + 1j * jnp.asarray(w2i)
    tr, ti = _twiddle_np(n1, n2, 1)
    tw = jnp.asarray(tr) + 1j * jnp.asarray(ti)

    # A[n1, k2] = sum_k1 W1[n1, k1] X[k1, k2]
    a = jnp.einsum("nk,...kj->...nj", w1, xs, precision=_HIGHEST)
    b = a * tw
    # Y[n1, n2] = sum_k2 B[n1, k2] W2[n2, k2]
    y = jnp.einsum("...nk,mk->...nm", b, w2, precision=_HIGHEST)
    # y_flat[n1 + N1*n2] = Y[n1, n2] -> transpose to (n2, n1) then flatten.
    return jnp.swapaxes(y, -1, -2).reshape(batch + (n,))


def ifft1d_unnorm(x: jnp.ndarray, axis: int = -1, impl: Impl = "matmul",
                  direct_max: int = 1024) -> jnp.ndarray:
    """Unnormalized inverse DFT (= N * ifft) along ``axis``."""
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.complexfloating):
        x = x.astype(jnp.complex64)
    n = x.shape[axis]
    if impl == "xla":
        return jnp.fft.ifft(x, axis=axis) * n
    if axis != -1 and axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
        y = ifft1d_unnorm(x, -1, impl, direct_max)
        return jnp.moveaxis(y, -1, axis)
    if n <= direct_max:
        return _ifft_last_matmul_direct(x)
    return _ifft_last_matmul_foursteps(x)


def ifft2_unnorm(x: jnp.ndarray, impl: Impl = "matmul",
                 direct_max: int = 1024) -> jnp.ndarray:
    """Unnormalized 2-D inverse DFT over the last two axes (= N*M * ifft2).

    Matches the reference's row-pass + col-pass composition
    (``src/render.rs:1158-1231``); on TPU the "row/col" split is simply two
    matmuls from opposite sides — no transpose, no barrier, no shared memory.
    """
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.complexfloating):
        x = x.astype(jnp.complex64)
    m, n = x.shape[-2], x.shape[-1]
    if impl == "xla":
        return jnp.fft.ifftn(x, axes=(-2, -1)) * (m * n)
    if m == n and n <= direct_max:
        # Y = W @ X @ W (W symmetric). Two complex matmuls, fully on MXU.
        wr, wi = dft_matrices(n, sign=1)
        w = jax.lax.complex(wr, wi)
        return jnp.matmul(jnp.matmul(w, x, precision=_HIGHEST), w, precision=_HIGHEST)
    y = ifft1d_unnorm(x, axis=-1, impl=impl, direct_max=direct_max)
    return ifft1d_unnorm(y, axis=-2, impl=impl, direct_max=direct_max)


def ifft2_real_unnorm(
    xr: jnp.ndarray,
    xi: jnp.ndarray,
    impl: Impl = "matmul",
    direct_max: int = 1024,
    precision: str = "highest",
) -> jnp.ndarray:
    """Real part of the unnormalized 2-D inverse DFT, from (re, im) planes.

    This is the hot path of ``step()``: the correction pass keeps only the
    real component (``shader/correction.comp:31``), so the final column-pass
    matmul needs just Re(W @ A) = Wr@Ar - Wi@Ai — 6 real MXU matmuls per
    field instead of the 8 a full complex transform costs (25% fewer FLOPs).

    Args:
        xr, xi: float32 (..., N, N) spectrum planes (complex never crosses
            the jit boundary — ``utils/complexpair.py``).
        precision: "highest" (bf16x6, f32-equivalent), "high" (bf16x3,
            ~2x MXU throughput, ~1e-6 relative error), or "default".
    """
    prec = resolve_precision(precision)
    m, n = xr.shape[-2], xr.shape[-1]
    if impl == "xla":
        return jnp.real(ifft2_unnorm(jax.lax.complex(xr, xi), impl="xla"))
    if not (m == n and n <= direct_max):
        y = ifft1d_unnorm(jax.lax.complex(xr, xi), axis=-1, impl=impl, direct_max=direct_max)
        yr, yi = jnp.real(y), jnp.imag(y)
        wr_m, wi_m = dft_matrices(m, sign=1)
        # Column pass from the left, real output only.
        return (jnp.matmul(wr_m, yr, precision=prec)
                - jnp.matmul(wi_m, yi, precision=prec))
    wr, wi = dft_matrices(n, sign=1)
    # Row pass (full complex): A = X @ W.
    ar = jnp.matmul(xr, wr, precision=prec) - jnp.matmul(xi, wi, precision=prec)
    ai = jnp.matmul(xr, wi, precision=prec) + jnp.matmul(xi, wr, precision=prec)
    # Column pass, real output only: Re(W @ A).
    return jnp.matmul(wr, ar, precision=prec) - jnp.matmul(wi, ai, precision=prec)
