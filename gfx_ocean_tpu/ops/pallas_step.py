"""Fused single-kernel ocean step in Pallas (TPU Mosaic).

The reference runs 8 separate dispatches with pipeline barriers between
them (propagate, 6 FFT passes, correction — ``src/render.rs:1122-1310``),
bouncing three spectrum buffers through device memory between passes. At
N <= 512 the entire working set fits in VMEM (~16 MB), so the TPU-native
formulation is ONE kernel that:

    1. evolves the spectrum in registers (propagate, VPU),
    2. runs the row-pass DFT as MXU dots against the resident W matrix,
    3. runs the real-output column pass,
    4. writes the three field planes.

No intermediate ever touches HBM; the only traffic is the inputs in and
the (3, N, N) field planes out. The "shared memory + barrier" staging of
``shader/fft_row.comp:23-59`` maps to VMEM values between dots; the
inter-pass barriers of the reference map to nothing (dataflow in one
kernel). The correction pass does not exist at all: its (-1)^(x+y) sign is
folded into the DFT table (x-half and y-half as output-side diagonals —
see ``ops/fft.py``), and the reference's global Q2 flip is applied to the
evolved spectrum once (2 VPU multiplies).

VMEM economy (v5e has ~16 MB/core):
  - ONE folded matrix pair A = D_alt @ W serves both passes: the row pass
    contracts against A^T (W symmetric => X @ (W D_alt) == X @ A^T, and the
    MXU transposes operands for free), the column pass uses A directly.
  - k_hat and the sign handling are recomputed from 2-D iotas in-kernel.
  - h0 flipped (h0n) is passed in: it is time-invariant, and Mosaic has no
    lowering for lax.rev.

Precision: Mosaic has no HIGH lowering for dots, so "high" is implemented
manually as bf16x3 (split each f32 operand into a bf16 head + bf16
residual; three MXU passes hi*hi + hi*lo + lo*hi) — the same decomposition
XLA uses for Precision.HIGH. "highest" uses the native HIGHEST lowering.

Normals/foam stay outside the kernel (cheap elementwise XLA, fused by the
compiler into the consumer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gfx_ocean_tpu.config import OceanConfig
from gfx_ocean_tpu.ops.propagate import _phase_mod_2pi
from gfx_ocean_tpu.ops.fft import _dft_matrix_out_alt_np


def _dot3(a, b, dims):
    """bf16x3 f32-ish matmul: three bf16 MXU passes (~= Precision.HIGH)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(x, y, dims, preferred_element_type=jnp.float32)

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _make_dot(precision: str):
    if precision in ("high", "bf16x3", "bf16x4"):
        # Mosaic has no HIGH lowering; dot3 is the in-kernel bf16x3
        # equivalent (bf16x4's extra lo*lo term is below the scheme's
        # noise floor in-kernel).
        return _dot3
    if precision not in ("highest", "default"):
        # Mirror ops/fft.resolve_precision: an unknown tier must raise,
        # not silently run single-pass bf16 (~1e-2 error) physics.
        raise ValueError(
            f"unknown matmul precision {precision!r}; options: "
            "['bf16x3', 'bf16x4', 'default', 'high', 'highest']")
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)

    def d(a, b, dims):
        return jax.lax.dot_general(a, b, dims, precision=prec,
                                   preferred_element_type=jnp.float32)

    return d


_DIMS_NT = (((1,), (1,)), ((), ()))  # X @ A^T (contract both last axes)
_DIMS_NN = (((1,), (0,)), ((), ()))  # A @ X


def _khat_in_kernel(n: int, domain_size: float, wrap: bool,
                    rows: int | None = None, row_off=None):
    """Normalized centered wavenumbers from iotas.

    coord = pi*(2i - N - 1)/L (``shader/propagate.comp:45-52``); wrap=True
    replicates Q1's uint32 wraparound: adding 2**32 to the negative branch
    in f32 rounds to exactly float32(uint32 value) (both are round-to-
    nearest of the same exact integer).

    ``rows``/``row_off`` carve out a (rows, n) band starting at absolute
    row ``row_off`` (traced scalar) — the row-blocked kernel's view.
    """
    rows = n if rows is None else rows
    # Mosaic iota must be integer-typed; cast to f32 afterwards.
    ix = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 0).astype(jnp.float32)
    if row_off is not None:
        iy = iy + row_off.astype(jnp.float32)
    cx = 2.0 * ix - jnp.float32(n + 1)
    cy = 2.0 * iy - jnp.float32(n + 1)
    if wrap:
        two32 = jnp.float32(2.0 ** 32)
        cx = jnp.where(cx < 0, cx + two32, cx)
        cy = jnp.where(cy < 0, cy + two32, cy)
    scale = jnp.float32(np.pi / domain_size)
    kx = cx * scale
    ky = cy * scale
    k_len = jnp.sqrt(kx * kx + ky * ky)
    safe = k_len > 1.0e-10
    inv = jnp.where(safe, 1.0 / jnp.where(safe, k_len, 1.0), 0.0)
    return kx * inv, ky * inv


def _step_kernel(
    t_ref,        # SMEM (1, 1) f32 — absolute time
    h0_ref,       # VMEM (2, N, N) f32 — h0 planes
    h0n_ref,      # VMEM (2, N, N) f32 — h0 flipped planes (time-invariant)
    omega_ref,    # VMEM (N, N) f32
    ar_ref,       # VMEM (N, N) f32 — Re(D_alt @ W)
    ai_ref,       # VMEM (N, N) f32 — Im(D_alt @ W)
    out_ref,      # VMEM (3, N, N) f32 — (disp_x, height, disp_z), centered
    *,
    n: int,
    domain_size: float,
    wrap_k: bool,
    ref_sign: bool,
    conj_neg: bool,
    precision: str,
):
    dot = _make_dot(precision)
    t = t_ref[0, 0]
    # Dekker-corrected phase, same as the jnp hot path: a plain f32
    # product loses ~|omega*t| * 2^-24 rad (~3e-4 at t ~ 1000 s), which
    # would break the pallas/matmul numerical equivalence at resumed
    # large absolute times (pure arithmetic — Mosaic-safe).
    phase = _phase_mod_2pi(omega_ref[:, :], t)
    c = jnp.cos(phase)
    s = jnp.sin(phase)

    h0r = h0_ref[0, :, :]
    h0i = h0_ref[1, :, :]
    h0nr = h0n_ref[0, :, :]
    h0ni = h0n_ref[1, :, :]
    if conj_neg:
        h0ni = -h0ni

    # propagate (shader/propagate.comp:55-62), expanded to planes; the
    # reference's global Q2 sign rides on h (linear through the transform).
    g = jnp.float32(-1.0 if ref_sign else 1.0)
    hr = g * (c * (h0r + h0nr) + s * (h0ni - h0i))
    hi = g * (s * (h0r - h0nr) + c * (h0i + h0ni))

    awr = ar_ref[:, :]
    awi = ai_ref[:, :]

    def transform(xr, xi):
        # row pass: Y = X @ (W D_alt) = X @ A^T (full complex)
        yr = dot(xr, awr, _DIMS_NT) - dot(xi, awi, _DIMS_NT)
        yi = dot(xr, awi, _DIMS_NT) + dot(xi, awr, _DIMS_NT)
        # col pass, real out: Re((D_alt W) @ Y) = A.r @ Y.r - A.i @ Y.i
        return dot(awr, yr, _DIMS_NN) - dot(awi, yi, _DIMS_NN)

    khx, khy = _khat_in_kernel(n, domain_size, wrap_k)

    out_ref[0, :, :] = transform(khx * hi, -khx * hr)  # disp_x
    out_ref[1, :, :] = transform(hr, hi)               # height
    out_ref[2, :, :] = transform(khy * hi, -khy * hr)  # disp_z


def _row_block_kernel(
    t_ref,        # SMEM (1, 1) f32
    h0_ref,       # VMEM (2, B, N) f32 — h0 plane row band
    h0n_ref,      # VMEM (2, B, N) f32 — flipped planes row band
    omega_ref,    # VMEM (B, N) f32
    ar_ref,       # VMEM (N, N) f32 — Re(D_alt @ W), constant across the grid
    ai_ref,       # VMEM (N, N) f32
    y_ref,        # VMEM (3, 2, B, N) f32 — row-pass output (re, im) per spectrum
    *,
    n: int,
    block: int,
    domain_size: float,
    wrap_k: bool,
    ref_sign: bool,
    conj_neg: bool,
    precision: str,
):
    """Propagate + complex row pass for one band of ``block`` rows.

    The reference's propagate dispatch and three row-FFT dispatches
    (``src/render.rs:1123-1179``) fused per band; the evolved spectra never
    touch HBM."""
    dot = _make_dot(precision)
    t = t_ref[0, 0]
    # Dekker-corrected phase, same as the jnp hot path: a plain f32
    # product loses ~|omega*t| * 2^-24 rad (~3e-4 at t ~ 1000 s), which
    # would break the pallas/matmul numerical equivalence at resumed
    # large absolute times (pure arithmetic — Mosaic-safe).
    phase = _phase_mod_2pi(omega_ref[:, :], t)
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    h0r = h0_ref[0, :, :]
    h0i = h0_ref[1, :, :]
    h0nr = h0n_ref[0, :, :]
    h0ni = h0n_ref[1, :, :]
    if conj_neg:
        h0ni = -h0ni
    g = jnp.float32(-1.0 if ref_sign else 1.0)
    hr = g * (c * (h0r + h0nr) + s * (h0ni - h0i))
    hi = g * (s * (h0r - h0nr) + c * (h0i + h0ni))

    row_off = pl.program_id(0) * block
    khx, khy = _khat_in_kernel(n, domain_size, wrap_k, rows=block,
                               row_off=jnp.int32(row_off))
    awr = ar_ref[:, :]
    awi = ai_ref[:, :]

    def row(xr, xi, idx):
        # Y = X @ (W D_alt) = X @ A^T (MXU transposes operands for free)
        y_ref[idx, 0, :, :] = dot(xr, awr, _DIMS_NT) - dot(xi, awi, _DIMS_NT)
        y_ref[idx, 1, :, :] = dot(xr, awi, _DIMS_NT) + dot(xi, awr, _DIMS_NT)

    row(khx * hi, -khx * hr, 0)  # disp_x spectrum
    row(hr, hi, 1)               # height
    row(khy * hi, -khy * hr, 2)  # disp_z


def _col_block_kernel(y_ref, ar_ref, ai_ref, out_ref, *, precision: str):
    """Real-output column pass for one band of columns: Re(A @ Y_s)."""
    dot = _make_dot(precision)
    awr = ar_ref[:, :]
    awi = ai_ref[:, :]
    for idx in range(3):
        out_ref[idx, :, :] = (dot(awr, y_ref[idx, 0, :, :], _DIMS_NN)
                              - dot(awi, y_ref[idx, 1, :, :], _DIMS_NN))


def _pick_blocks(n: int) -> tuple:
    """(row_band, col_band) widths: tables (2 N^2 f32) dominate VMEM; keep
    the streamed bands a small fraction so double-buffering fits beside
    them. The column band is the block's LAST dim and must be a multiple
    of 128 (Mosaic lane tiling); the row band is a second-to-last dim and
    only needs divisibility by 8."""
    return (128 if n <= 512 else 64), 128


def _blocked_fields(h0_pair, omega, t_arr, h0n, awr, awi, config: OceanConfig,
                    n: int, interpret: bool) -> jnp.ndarray:
    """Two pipelined kernels when one block cannot hold the problem:
    grid over row bands (propagate + row pass), then over column bands
    (real-out column pass). The (3, 2, N, N) row-pass planes are the only
    intermediate HBM traffic — the reference writes its three spectra to
    device memory between every pass (``src/render.rs:1132-1231``)."""
    block, cblock = _pick_blocks(n)
    if n % block or n % cblock:
        raise ValueError(
            f"blocked pallas pipeline needs N divisible by {block}/{cblock} "
            f"(lane tiling), got {n}; use fft_impl='matmul' below 128")
    vmem_hint = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    row_kernel = functools.partial(
        _row_block_kernel,
        n=n, block=block,
        domain_size=float(config.domain_size),
        wrap_k=config.compat.wrap_k,
        ref_sign=config.compat.ref_sign,
        conj_neg=config.compat.conj_neg,
        precision=config.matmul_precision,
    )
    vmem = pltpu.VMEM
    y = pl.pallas_call(
        row_kernel,
        grid=(n // block,),
        out_shape=jax.ShapeDtypeStruct((3, 2, n, n), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, block, n), lambda i: (0, i, 0), memory_space=vmem),
            pl.BlockSpec((2, block, n), lambda i: (0, i, 0), memory_space=vmem),
            pl.BlockSpec((block, n), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((3, 2, block, n), lambda i: (0, 0, i, 0),
                               memory_space=vmem),
        interpret=interpret,
        compiler_params=vmem_hint,
        cost_estimate=pl.CostEstimate(
            flops=2 * 12 * block * n * n,
            bytes_accessed=(5 * block * n + 2 * n * n + 6 * block * n) * 4,
            transcendentals=2 * block * n,
        ),
    )(t_arr, h0_pair, h0n, omega, awr, awi)

    col_kernel = functools.partial(_col_block_kernel,
                                   precision=config.matmul_precision)
    planes = pl.pallas_call(
        col_kernel,
        grid=(n // cblock,),
        out_shape=jax.ShapeDtypeStruct((3, n, n), jnp.float32),
        in_specs=[
            pl.BlockSpec((3, 2, n, cblock), lambda j: (0, 0, 0, j),
                         memory_space=vmem),
            pl.BlockSpec((n, n), lambda j: (0, 0), memory_space=vmem),
            pl.BlockSpec((n, n), lambda j: (0, 0), memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((3, n, cblock), lambda j: (0, 0, j),
                               memory_space=vmem),
        interpret=interpret,
        compiler_params=vmem_hint,
        cost_estimate=pl.CostEstimate(
            flops=2 * 6 * cblock * n * n,
            bytes_accessed=(6 * n * cblock + 2 * n * n + 3 * n * cblock) * 4,
            transcendentals=0,
        ),
    )(y, awr, awi)
    return planes


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def pallas_fields(
    h0_pair: jnp.ndarray,
    omega: jnp.ndarray,
    t: jnp.ndarray,
    config: OceanConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused step: (2, N, N) h0 planes + omega + t -> (N, N, 3) displacement.

    Equivalent to propagate + centered ifft2_real_unnorm + channel packing
    (tested against both the jnp path and the CPU golden). N <= 512 at
    non-"highest" precision runs as ONE VMEM-resident kernel; N = 1024
    (any tier) and 512@"highest" use the row/column-blocked two-kernel
    pipeline (``_blocked_fields``). Larger N belongs to the four-step
    matmul path in ``ops/fft.py``.
    """
    if h0_pair.ndim != 3:
        raise ValueError("pallas_fields takes a single unbatched state; vmap for cascades")
    n = h0_pair.shape[-1]
    if n > 1024:
        raise ValueError(f"fused Pallas step supports N <= 1024, got {n}")

    # A = D_alt @ W: the y-half of the centering sign folded into rows.
    awr, awi = (jnp.asarray(a) for a in _dft_matrix_out_alt_np(n, 1, 0, False))
    h0n = h0_pair[:, ::-1, ::-1]
    t_arr = jnp.reshape(t.astype(jnp.float32), (1, 1))

    # Single block whenever it fits: 'highest' VMEM-OOMs at 512 (extra
    # MXU passes widen live ranges) but fits comfortably at <= 256 — and
    # the blocked pipeline REQUIRES n >= 128 (its column band is a
    # multiple of the 128-lane tiling; smaller n would get grid=(0,) and
    # return uninitialized memory).
    single_block = n <= (256 if config.matmul_precision == "highest"
                         else 512)
    if not single_block:
        planes = _blocked_fields(h0_pair, omega, t_arr, h0n, awr, awi,
                                 config, n, interpret)
        return jnp.moveaxis(planes, 0, -1)

    kernel = functools.partial(
        _step_kernel,
        n=n,
        domain_size=float(config.domain_size),
        wrap_k=config.compat.wrap_k,
        ref_sign=config.compat.ref_sign,
        conj_neg=config.compat.conj_neg,
        precision=config.matmul_precision,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    planes = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, n, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  vmem, vmem, vmem, vmem, vmem],
        out_specs=vmem,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 18 * n * n * n,
            bytes_accessed=(2 + 2 + 1 + 2 + 3) * n * n * 4,
            transcendentals=2 * n * n,
        ),
    )(t_arr, h0_pair, h0n, omega, awr, awi)
    # (disp_x, height, disp_z) channel order of shader/correction.comp:31-34.
    return jnp.moveaxis(planes, 0, -1)
