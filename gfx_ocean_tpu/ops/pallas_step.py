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
from gfx_ocean_tpu.ops.propagate import _phase_mod_2pi, _sincos_phase
from gfx_ocean_tpu.ops.fft import (_dft_matrix_np, _dft_matrix_out_alt_np,
                                   _twiddle_np)


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


def _normals_checksum_terms(x0, x1, z0, z1, n: int, scale: float):
    """Per-texel sum of normal components, for the in-kernel forcing sum.

    Same per-texel math as ``ops.derived.finite_difference_normals_planes``
    with the square-grid diff_x = diff_y = 2/N (shader/ocean.frag:50-67):
    the external checksum sums the three component planes, so the per-texel
    contribution is (cx + cy + cz) / |c|. Only the f32 accumulation ORDER
    differs from the XLA reduce — the checksum is a forcing device, not a
    field, and every cross-variant comparison (tb, sharded) allows for
    reassociation."""
    diff = jnp.float32(2.0 / n)
    hs = jnp.float32(scale)
    gx = (x1 - x0) / hs
    gz = (z1 - z0) / hs
    cx = gx * diff
    cz = -diff * gz
    cy = diff * diff
    length = jnp.sqrt(cx * cx + cy * cy + cz * cz)
    return (cx + cy + cz) / length


def _packed_grid_kernel(
    t_ref,        # SMEM (1, 1) f32 — absolute time
    pre_ref,      # VMEM (4, B, N) f32 — P1..P4 row band
    preq_ref,     # VMEM (4, B, N) f32 — rho-gathered P1..P4 row band
    om_ref,       # VMEM (B, N) f32
    omq_ref,      # VMEM (B, N) f32 — rho-gathered omega
    ar_ref,       # VMEM (N, N) f32 — Re(D_alt @ W), shared by both passes
    ai_ref,       # VMEM (N, N) f32
    out_ref,      # VMEM (3, N, N) f32 — (disp_x, height, disp_z), centered
    *rest,        # [sum_ref (1, 128) f32 when checksum,] y_ref scratch
    n: int,
    block: int,
    col_chunk: int,
    domain_size: float,
    wrap_k: bool,
    ref_sign: bool,
    precision: str,
    checksum: bool = False,
    normals_scale: float | None = None,
):
    """Hermitian-packed fused step: 14 MXU dot-stages instead of 18.

    One sequential-grid kernel over row bands. Each step fuses the packed
    propagate (``ops/propagate.propagate_packed_planes`` algebra — the
    symmetrized height spectrum H plus Z = H_dx + i*H_dz) with the complex
    row pass for its band (2 spectra x 4 dots), accumulating the row-pass
    planes in a VMEM scratch; the LAST step runs the column pass off the
    scratch (height real-out 2 dots + Z complex-out 4 dots, chunked over
    column bands to bound transient VMEM). Versus the unpacked single-block
    kernel this trades 3 transforms (18 dots) for 2 (14 dots) — the packing
    the Re-only output of ``shader/correction.comp:31`` licenses — while the
    grid streaming makes the 10 propagate input planes fit where a no-grid
    kernel would not (only one band is resident at a time).

    The rho-gathered inputs are required because the reference's sigma
    pairing (``index_neg``, shader/propagate.comp:48) is NOT the DFT
    negation: the evolved spectrum is not Hermitian, so symmetrization
    cannot be skipped. Q2's global flip (ref_sign) folds into the 1/2 of
    the symmetrization — free.

    ``checksum`` (round 5) additionally emits the benchmark-forcing
    reduction sum(planes) [+ sum(normals)] as a second (1, 128) output
    (value in lane 0), computed at the last grid step while the full
    planes sit in VMEM: the external XLA reduce re-reads all three
    planes plus four shifted height views from HBM (~8-9% of the frame
    at 512^2), the in-kernel fold reads VMEM. The planes output is
    written in full either way — only the O(1) forcing scalar moves.
    """
    if checksum:
        sum_ref, y_ref = rest
    else:
        (y_ref,) = rest
    dot = _make_dot(precision)
    i = pl.program_id(0)
    t = t_ref[0, 0]
    c, s = _sincos_phase(om_ref[:, :], t)
    cq, sq = _sincos_phase(omq_ref[:, :], t)
    sr = c * pre_ref[0] + s * pre_ref[1]       # S = evolved height spectrum
    si = s * pre_ref[2] + c * pre_ref[3]
    tr = cq * preq_ref[0] + sq * preq_ref[1]   # S o rho
    ti = sq * preq_ref[2] + cq * preq_ref[3]
    half = jnp.float32(-0.5 if ref_sign else 0.5)
    h_r = half * (sr + tr)
    h_i = half * (si - ti)
    row_off = (i * block).astype(jnp.float32)
    khx, khy, khxq, khyq = _khat_pair_in_kernel(
        n, domain_size, wrap_k, block, row_off)
    dx_r = half * (khx * si + khxq * ti)
    dx_i = half * (khxq * tr - khx * sr)
    dz_r = half * (khy * si + khyq * ti)
    dz_i = half * (khyq * tr - khy * sr)
    z_r = dx_r - dz_i                          # Z = H_dx + i * H_dz
    z_i = dx_i + dz_r

    awr = ar_ref[:, :]
    awi = ai_ref[:, :]
    band = pl.ds(i * block, block)
    # row pass: Y = X @ (W D_alt) = X @ A^T (x-half centering fold rides
    # the NT output index; MXU transposes operands for free)
    y_ref[0, 0, band, :] = dot(h_r, awr, _DIMS_NT) - dot(h_i, awi, _DIMS_NT)
    y_ref[0, 1, band, :] = dot(h_r, awi, _DIMS_NT) + dot(h_i, awr, _DIMS_NT)
    y_ref[1, 0, band, :] = dot(z_r, awr, _DIMS_NT) - dot(z_i, awi, _DIMS_NT)
    y_ref[1, 1, band, :] = dot(z_r, awi, _DIMS_NT) + dot(z_i, awr, _DIMS_NT)

    @pl.when(i == n // block - 1)
    def _col_pass():
        s = jnp.float32(0.0)
        for k in range(n // col_chunk):
            sl = slice(k * col_chunk, (k + 1) * col_chunk)
            yhr = y_ref[0, 0, :, sl]
            yhi = y_ref[0, 1, :, sl]
            # height: F(H) is exactly real -> 2 dots
            hv = dot(awr, yhr, _DIMS_NN) - dot(awi, yhi, _DIMS_NN)
            out_ref[1, :, sl] = hv
            yzr = y_ref[1, 0, :, sl]
            yzi = y_ref[1, 1, :, sl]
            # Z: Re -> disp_x, Im -> disp_z
            xv = dot(awr, yzr, _DIMS_NN) - dot(awi, yzi, _DIMS_NN)
            zv = dot(awr, yzi, _DIMS_NN) + dot(awi, yzr, _DIMS_NN)
            out_ref[0, :, sl] = xv
            out_ref[2, :, sl] = zv
            if checksum:
                s = s + jnp.sum(xv) + jnp.sum(hv) + jnp.sum(zv)
        if checksum and normals_scale is not None:
            # Normals contribution off the VMEM-resident height plane,
            # chunked over row bands to bound transient VMEM (~1 MB at
            # 64-row chunks); boundary rows wrap via static ref slices.
            nch = min(n, 64)
            for r0 in range(0, n, nch):
                hc = out_ref[1, r0:r0 + nch, :]
                up = (out_ref[1, r0 - 1:r0, :] if r0 > 0
                      else out_ref[1, n - 1:n, :])
                dn = (out_ref[1, r0 + nch:r0 + nch + 1, :] if r0 + nch < n
                      else out_ref[1, 0:1, :])
                z0 = jnp.concatenate([up, hc[:-1]], axis=0)
                z1 = jnp.concatenate([hc[1:], dn], axis=0)
                x0 = jnp.concatenate([hc[:, -1:], hc[:, :-1]], axis=1)
                x1 = jnp.concatenate([hc[:, 1:], hc[:, :1]], axis=1)
                s = s + jnp.sum(_normals_checksum_terms(
                    x0, x1, z0, z1, n, normals_scale))
        if checksum:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            sum_ref[0:1, :] = jnp.where(lane == 0, s, jnp.float32(0.0))


def _packed_single_fields(h0_pair, omega, t_arr, config: OceanConfig,
                          n: int, interpret: bool, checksum: bool = False,
                          normals_scale: float | None = None):
    """Packed-transform fused step for N <= 512 (see _packed_grid_kernel).

    With ``checksum`` returns ``(planes, sums)`` where ``sums`` is a
    (1, 128) f32 carrying the forcing reduction in lane 0 (the kernel's
    docstring); the planes output is materialized either way."""
    from gfx_ocean_tpu.ops.propagate import precompute_propagate_packed  # noqa: PLC0415

    pre, pre_rho, omega_rho = precompute_propagate_packed(
        h0_pair, omega, config.compat)
    awr, awi = (jnp.asarray(a) for a in _dft_matrix_out_alt_np(n, 1, 0, False))
    block = min(n, 64)
    col_chunk = min(n, 256)
    vmem = pltpu.VMEM
    kernel = functools.partial(
        _packed_grid_kernel,
        n=n, block=block, col_chunk=col_chunk,
        domain_size=float(config.domain_size),
        wrap_k=config.compat.wrap_k,
        ref_sign=config.compat.ref_sign,
        precision=config.matmul_precision,
        checksum=checksum,
        normals_scale=normals_scale,
    )
    out_shape = jax.ShapeDtypeStruct((3, n, n), jnp.float32)
    out_spec = pl.BlockSpec((3, n, n), lambda i: (0, 0, 0), memory_space=vmem)
    if checksum:
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((1, 128), jnp.float32)]
        out_spec = [out_spec,
                    pl.BlockSpec((1, 128), lambda i: (0, 0),
                                 memory_space=vmem)]
    out = pl.pallas_call(
        kernel,
        grid=(n // block,),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((4, block, n), lambda i: (0, i, 0), memory_space=vmem),
            pl.BlockSpec((4, block, n), lambda i: (0, i, 0), memory_space=vmem),
            pl.BlockSpec((block, n), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((block, n), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=vmem),
        ],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((2, 2, n, n), jnp.float32)],
        interpret=interpret,
        compiler_params=_VMEM_HINT,
        cost_estimate=pl.CostEstimate(
            flops=2 * 14 * n * n * n,
            bytes_accessed=(10 + 2 + 3) * n * n * 4,
            transcendentals=(4 + (1 if checksum and normals_scale else 0))
            * n * n,
        ),
    )(t_arr, pre, pre_rho, omega, omega_rho, awr, awi)
    return out


# ---------------------------------------------------------------------------
# Four-step pipeline for N >= 1024 (the reference's scaling frontier).
#
# The XLA einsum four-step (ops/fft.py) plateaus at ~7 ms/axis-pass at 4096^2
# because every stage (small DFT, twiddle, small DFT, swap) is its own HBM
# round trip. Here each axis pass is ONE Pallas kernel: a band is read once,
# all four-step stages run on VMEM-resident tiles (MXU dots against the tiny
# N1/N2 tables), and the band is written once. The row kernel additionally
# fuses the packed Hermitian propagate (ops/propagate.propagate_packed_planes
# — 3 fields from 2 transforms), so the evolved spectra never touch HBM,
# mirroring the single-block kernel's design at the four-step scale.
#
# Index bookkeeping (same algebra as ops/fft._foursteps_last):
#   k = N2*k1 + k2, n = n1 + N1*n2
#   y[n] = sum_k2 W_N[n1 k2] * (sum_k1 W_N1[n1 k1] X[k1,k2]) * W_N2[n2 k2]
# The row pass pins N1 = 128 (the lane width) and reads its inputs
# x-PERMUTED (kernel column c = k2*N1 + k1 holds true k = k1*N2 + k2 — a
# free reshape/swap of the TIME-INVARIANT propagate tables, hoisted out of
# the scan). Then stage 1 is a pure-view (B*N2, k1) @ W1^T dot with the n1
# output factor landing in lanes, every relayout between stages is
# sublane-only, and the final (B, n2, n1) flatten is n2*N1 + n1 = the TRUE
# x index. This kills the deferred (3, N, N) unblocking transpose the
# previous blocked-order scheme needed (~0.4 ms of a 1.6 ms frame at
# 2048^2) — the analog of the reference's Stockham auto-sort absorbing the
# butterfly permutation (shader/fft_row.comp:36). The column pass already
# lands true-y order naturally (its transform axis is the sublane axis, so
# the (n2-major, n1-minor) composition of the output index is free).
# ---------------------------------------------------------------------------


def _khat_pair_in_kernel(n: int, domain_size: float, wrap: bool,
                         rows: int, row_off, perm_n1: int = 0):
    """(khx, khy, khx o rho, khy o rho) from iotas for a row band.

    rho is the DFT-index negation (i -> (-i) mod N, ops/propagate.roll_flip);
    the rho-gathered grids are what conj(S o rho) of the packed propagate
    consumes. Computed pointwise from transformed iotas — no gathers, and
    no (N, N) host constants shipped per jit (the HTTP-413 trap,
    ops/propagate.propagate_packed_planes).

    ``perm_n1``: when nonzero, columns are in the four-step permuted order
    (column c holds true kx = (c % n1) * n2 + c // n1); the iota is decoded
    with a mask/shift (n1 is a power of two) so the grids match the
    permuted propagate tables."""

    def grids(ix, iy):
        cx = 2.0 * ix - jnp.float32(n + 1)
        cy = 2.0 * iy - jnp.float32(n + 1)
        if wrap:
            two32 = jnp.float32(2.0 ** 32)
            cx = jnp.where(cx < 0, cx + two32, cx)
            cy = jnp.where(cy < 0, cy + two32, cy)
        scale = jnp.float32(np.pi / domain_size)
        kx = cx * scale
        ky = cy * scale
        q = kx * kx + ky * ky
        safe = q > 1.0e-20
        inv = jnp.where(safe, jax.lax.rsqrt(jnp.where(safe, q, 1.0)), 0.0)
        return kx * inv, ky * inv

    ic = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    if perm_n1:
        shift = perm_n1.bit_length() - 1
        ic = (jnp.bitwise_and(ic, perm_n1 - 1) * (n // perm_n1)
              + jnp.right_shift(ic, shift))
    ix = ic.astype(jnp.float32)
    iy = (jax.lax.broadcasted_iota(jnp.int32, (rows, n), 0).astype(jnp.float32)
          + row_off.astype(jnp.float32))
    khx, khy = grids(ix, iy)
    nf = jnp.float32(n)
    ixq = jnp.where(ix == 0, 0.0, nf - ix)
    iyq = jnp.where(iy == 0, 0.0, nf - iy)
    khxq, khyq = grids(ixq, iyq)
    return khx, khy, khxq, khyq


def _fourstep_row_kernel(
    t_ref,          # SMEM (1, tb + 1) f32 — [t_0..t_{tb-1}, global row base]
    pre_ref,        # VMEM (4, B, N) f32 — P1..P4 row band, x-PERMUTED
    preq_ref,       # VMEM (4, B, N) f32 — rho-gathered P1..P4, x-PERMUTED
    om_ref,         # VMEM (B, N) f32 — x-PERMUTED
    omq_ref,        # VMEM (B, N) f32 — rho-gathered omega, x-PERMUTED
    w1cat_ref,      # (2*N1, 2*N1) — stacked complex stage-1 table
    w2cat_ref,      # stage-2: diag-fused (4*N2, 4*N2) when 4*N2 <= 128,
                    # else stacked (2*N2, 2*N2) (_fourstep_tables)
    ttr_ref, tti_ref,   # (N2, N1) twiddle T[k2, n1]
    y_ref,          # VMEM out — (2, 2, B, N) f32; (1, 2, 2, B, N) when tb>1
                    # (one frame's band — the frame is grid dim 1)
    *,
    n: int, n1: int, n2: int, block: int, tb: int,
    domain_size: float, wrap_k: bool, precision: str,
):
    """Packed Hermitian propagate + four-step row pass for one row band.

    ``tb`` (the in-kernel TIME BATCH, round 5) processes tb time values
    per band fetch: the 10 hoisted propagate planes — the row kernel's
    dominant HBM traffic (55% of peak at 4096^2, docs/BENCH.md roofline)
    — are fetched ONCE and reused for every t in the batch, cutting
    per-step input bytes by tb x. The batch rides the GRID, not the
    block: grid = (bands, tb) with the frame index minor, input index
    maps ignoring it (Mosaic skips the copy when a block's index is
    unchanged between consecutive grid steps), and each grid step
    computing ONE frame into a tb=1-sized output block. The first form
    tried — a tb-times-larger output block holding all frames — was a
    measured LOSS (4096^2 tb=2: 158 vs 193 steps/s; the (tb, 2, 2, B, N)
    block is 4-17 MB and kills VMEM double-buffering, docs/BENCH.md).
    Frames stay independent (the sim is stateless in time, SURVEY §5);
    each frame's dots have identical shapes to the tb=1 kernel, so
    per-frame outputs are bit-identical to tb=1. The vmap form of time
    batching (models.make_rollout) cannot do this: a vmapped pallas_call
    re-streams every input plane per frame.

    MEASURED OUTCOME (tools/prof_tb_sweep.py, subprocess-isolated, two
    repeats/config, device agreement exactly 0.0 everywhere): even in
    the grid form, tb > 1 does NOT pay on hardware — 4096^2 tb=1 192.6
    steps/s vs ~180 at tb in {2,4,8}; 2048^2 763.3 vs 758/702/656;
    8192^2 neutral (45.0 / 45.2 / 45.3); 1024^2 noise-level (2080 vs
    2141 at tb=4, inside the session band). Consistent with the
    roofline verdict that no single counter binds at ~45-55% of each
    roof: the input bytes saved were already overlapped with the dots,
    so removing them removes no critical-path time. Default stays tb=1
    on this path; the plumbing is kept (bit-identical per frame, and
    the honest negative needs the instrument to stay runnable).

    Inputs arrive x-permuted (column c = k2*N1 + k1 holds true k =
    k1*N2 + k2, applied once to the time-invariant tables in
    ``_fourstep_fields``), so stage 1 is a pure-view dot and the output
    flatten (B, n2, n1) -> (B, N) is already the true x order.

    Complex dots run STACKED (round 5): the (re, im) pair rides one dot
    against the block matrix [[Wr, -Wi], [Wi, Wr]] instead of four dots
    + two combines. This matters on the MXU because the stage-2 DFT
    matrix is (N2, N2) with N2 = N/128 — at 4096^2 a (32, 32) weight
    fills 6% of the 128x128 systolic array (the profiled bound: 0.63
    ms/pass measured vs 0.21 ideal); stacking quadruples the filled
    area AND halves the dot count. Operand stacking is a concat (VPU
    copy) paid once per stage, far below what the dots save.

    ``t_ref[0, 1]`` is the GLOBAL row index of this array's first row —
    0 single-chip; ``axis_index * local_rows`` under the row-sharded
    distributed pipeline (``parallel/distributed_fft``), where the chip
    sees only its band but the in-kernel k-hat grids must be evaluated
    at absolute wavenumbers. Exact in f32 for any supported N."""
    dot = _make_dot(precision)
    row_off = jnp.float32(pl.program_id(0) * block) + t_ref[0, tb]
    khx, khy, khxq, khyq = _khat_pair_in_kernel(
        n, domain_size, wrap_k, block, row_off, perm_n1=n1)

    w1cat = w1cat_ref[:, :]
    w2cat = w2cat_ref[:, :]
    ttr, tti = ttr_ref[:, :], tti_ref[:, :]

    def stage12(xr, xi):
        # permuted (B, N) -> (B*k2, k1): pure view, no relayout
        xr = xr.reshape(block * n2, n1)
        xi = xi.reshape(block * n2, n1)
        # stage 1: [A_r | A_i] = [X_r | X_i] @ W1cat^T over k1 — n1
        # lands in lanes (centering fold rides W1's rows = the NT
        # output index)
        x_cat = jnp.concatenate([xr, xi], axis=-1)
        a = dot(x_cat, w1cat, _DIMS_NT)
        # twiddle T[k2, n1], broadcast over the band
        ar = a[:, :n1].reshape(block, n2, n1)
        ai = a[:, n1:].reshape(block, n2, n1)
        br = ar * ttr - ai * tti
        bi = ar * tti + ai * ttr
        # ready for stage 2: (B, k2, n1) -> (k2, B*n1) is sublane-only;
        # lanes untouched
        return (br.transpose(1, 0, 2).reshape(n2, block * n1),
                bi.transpose(1, 0, 2).reshape(n2, block * n1))

    def unflatten(yv):
        # (n2, B, n1) -> (B, n2, n1): sublane-only; flat = n2*N1 + n1 =
        # the TRUE x index — no deferred unblocking needed
        return (yv[:n2].reshape(n2, block, n1).transpose(
                    1, 0, 2).reshape(block, n),
                yv[n2:].reshape(n2, block, n1).transpose(
                    1, 0, 2).reshape(block, n))

    t = t_ref[0, 0] if tb == 1 else t_ref[0, pl.program_id(1)]
    c, s = _sincos_phase(om_ref[:, :], t)
    cq, sq = _sincos_phase(omq_ref[:, :], t)
    sr = c * pre_ref[0] + s * pre_ref[1]       # S = evolved height spectrum
    si = s * pre_ref[2] + c * pre_ref[3]
    tr = cq * preq_ref[0] + sq * preq_ref[1]   # S o rho
    ti = sq * preq_ref[2] + cq * preq_ref[3]
    half = jnp.float32(0.5)
    h_r = half * (sr + tr)
    h_i = half * (si - ti)
    dx_r = half * (khx * si + khxq * ti)
    dx_i = half * (khxq * tr - khx * sr)
    dz_r = half * (khy * si + khyq * ti)
    dz_i = half * (khyq * tr - khy * sr)
    z_r = dx_r - dz_i                          # Z = H_dx + i * H_dz
    z_i = dx_i + dz_r
    bh_r, bh_i = stage12(h_r, h_i)
    bz_r, bz_i = stage12(z_r, z_i)
    if w2cat.shape[0] == 4 * n2:
        # stage 2, both field pairs in ONE dot against diag(W2cat,
        # W2cat) — one MXU pass instead of two (_fourstep_tables
        # docstring; measured exact vs the two-dot form)
        yv = dot(w2cat, jnp.concatenate([bh_r, bh_i, bz_r, bz_i], axis=0),
                 _DIMS_NN)
        h0p, h1p = unflatten(yv[:2 * n2])
        z0p, z1p = unflatten(yv[2 * n2:])
    else:
        # stage 2: [Y_r; Y_i] = W2cat @ [B_r; B_i] over k2
        h0p, h1p = unflatten(
            dot(w2cat, jnp.concatenate([bh_r, bh_i], axis=0), _DIMS_NN))
        z0p, z1p = unflatten(
            dot(w2cat, jnp.concatenate([bz_r, bz_i], axis=0), _DIMS_NN))
    if tb == 1:
        y_ref[0, 0], y_ref[0, 1] = h0p, h1p
        y_ref[1, 0], y_ref[1, 1] = z0p, z1p
    else:
        y_ref[0, 0, 0], y_ref[0, 0, 1] = h0p, h1p
        y_ref[0, 1, 0], y_ref[0, 1, 1] = z0p, z1p


def _fourstep_col_kernel(
    y_ref,          # VMEM (2, 2, N, C) f32 — row-pass planes, C true-x cols
                    # ((1, 2, 2, N, C) when time-batched: frame = grid dim 0)
    w1cat_ref,      # (2*N1, 2*N1) — stacked stage-1 (y-half fold + Q2 flip)
    w2cat_ref,      # stage-2: diag-fused (3*N2, 4*N2) when 4*N2 <= 128,
                    # else stacked (2*N2, 2*N2) (_fourstep_tables)
    w2top_ref,      # (N2, 2*N2) — stage-2 real-output rows (height;
                    # unused when the fused table carries them)
    ttr_ref, tti_ref,   # (N1, N2)
    out_ref,        # VMEM (3, N, C) f32 — (disp_x, height, disp_z)
                    # ((1, 3, N, C) when time-batched)
    *rest,          # when checksum: sums_ref (1, 128) f32 out
                    #                + seam_ref (N, 4) f32 scratch
    n: int, n1: int, n2: int, precision: str,
    nbands: int = 0, checksum: bool = False,
    normals_scale: float | None = None,
):
    """Four-step column pass, real/complex out, for one column band.

    Complex dots run STACKED against [[Wr, -Wi], [Wi, Wr]] block tables
    (see the row kernel's docstring — the (N2, N2) stage-2 matrix alone
    fills 6% of the MXU at 4096^2; stacked it fills 25% and the dot
    count halves). The stage-1 operand [X_r; X_i] is a PURE VIEW of the
    y block ((2, N, C) -> (2*n1, n2*C) groups plane-major over m1).

    ``checksum`` (round 5) folds the benchmark-forcing reduction
    sum(planes) [+ sum(normals)] into this pass: the external XLA reduce
    re-reads all three field planes plus four shifted height views from
    HBM (~0.63 ms/step at 4096^2, 12% of the step — the roofline's
    "other" bucket), the in-kernel fold sums the band values it just
    computed. Each band writes its partial into its own lane of
    ``sums_ref`` (bands <= 128 by the N <= 16384 plan guard); the caller
    sums lanes. Normal contributions are band-local in y (all rows
    present) but the x-derivative crosses bands, so the two edge columns
    are masked out of the band reduce and handled with a one-band lag
    through ``seam_ref`` (prev band's last two height columns, plus band
    0's first two for the final wrap) — TPU grid steps run sequentially,
    so the scratch carry is well-defined. The PLANES stay bit-identical
    across tb variants (their dots are untouched); the checksum itself
    agrees only to reassociation tolerance (XLA lowers the band reduces
    with program-dependent vectorization — measured ~1-2 ulp between the
    tb=1 and batched programs on identical band values). The planes
    output is written in full either way."""
    if checksum:
        sums_ref, seam_ref = rest
    dot = _make_dot(precision)
    w1cat = w1cat_ref[:, :]
    w2cat = w2cat_ref[:, :]
    w2top = w2top_ref[:, :]
    ttr, tti = ttr_ref[:, :][:, :, None], tti_ref[:, :][:, :, None]
    cb = y_ref.shape[-1]
    batched = y_ref.ndim == 5   # time-batched: (1, ...) frame-sliced blocks

    def stages(x_cat):
        # rows m = N2*m1 + m2: m1 is the outer dim — natural (m1, m2*C)
        # view, stacked plane-major: (2, n1, n2*C) -> (2*n1, n2*C)
        a = dot(w1cat, x_cat, _DIMS_NN)
        ar = a[:n1].reshape(n1, n2, cb)
        ai = a[n1:].reshape(n1, n2, cb)
        br = ar * ttr - ai * tti
        bi = ar * tti + ai * ttr
        # (n1, m2, C) -> (m2, n1*C): sublane-only relayout, then W2 @ .
        return (br.transpose(1, 0, 2).reshape(n2, n1 * cb),
                bi.transpose(1, 0, 2).reshape(n2, n1 * cb))

    y_h = y_ref[0, 0] if batched else y_ref[0]
    y_z = y_ref[0, 1] if batched else y_ref[1]
    bh_r, bh_i = stages(y_h.reshape(2 * n1, n2 * cb))
    bz_r, bz_i = stages(y_z.reshape(2 * n1, n2 * cb))
    if w2cat.shape[0] == 3 * n2:
        # stage 2, height (real-out) + choppy pair in ONE dot against
        # diag(W2top, W2cat) — one MXU pass instead of two, and every
        # output slice is already in true row order (k2 major); see
        # _fourstep_tables for the measured-equality record
        ov = dot(w2cat, jnp.concatenate([bh_r, bh_i, bz_r, bz_i], axis=0),
                 _DIMS_NN)
        h_out = ov[:n2].reshape(n, cb)
        x_out = ov[n2:2 * n2].reshape(n, cb)
        z_out = ov[2 * n2:].reshape(n, cb)
    else:
        # height: real output only (correction keeps Re — the top rows)
        h_out = dot(w2top, jnp.concatenate([bh_r, bh_i], axis=0),
                    _DIMS_NN).reshape(n, cb)
        # packed choppy pair: Re -> disp_x, Im -> disp_z
        zv = dot(w2cat, jnp.concatenate([bz_r, bz_i], axis=0), _DIMS_NN)
        x_out = zv[:n2].reshape(n, cb)
        z_out = zv[n2:].reshape(n, cb)
    if batched:
        out_ref[0, 0], out_ref[0, 1], out_ref[0, 2] = x_out, h_out, z_out
    else:
        out_ref[0], out_ref[1], out_ref[2] = x_out, h_out, z_out

    if not checksum:
        return
    b = pl.program_id(1) if batched else pl.program_id(0)
    s = jnp.sum(x_out) + jnp.sum(h_out) + jnp.sum(z_out)
    if normals_scale is not None:
        # Band 0 stores its first two height columns for the final wrap
        # BEFORE any read (also makes the degenerate nbands == 1 case —
        # shard-local distributed columns — fall out correctly).
        @pl.when(b == 0)
        def _save01():
            seam_ref[:, 2:4] = h_out[:, 0:2]

        def col_contrib(hl, hc, hr):
            z0 = jnp.concatenate([hc[-1:], hc[:-1]], axis=0)
            z1 = jnp.concatenate([hc[1:], hc[:1]], axis=0)
            return jnp.sum(_normals_checksum_terms(
                hl, hr, z0, z1, n, normals_scale))

        # Interior columns: in-band rolls, edge lanes masked out of the
        # reduce (their x-neighbors live in adjacent bands).
        x0 = jnp.concatenate([h_out[:, -1:], h_out[:, :-1]], axis=1)
        x1 = jnp.concatenate([h_out[:, 1:], h_out[:, :1]], axis=1)
        z0 = jnp.concatenate([h_out[-1:, :], h_out[:-1, :]], axis=0)
        z1 = jnp.concatenate([h_out[1:, :], h_out[:1, :]], axis=0)
        terms = _normals_checksum_terms(x0, x1, z0, z1, n, normals_scale)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, cb), 1)
        interior = jnp.logical_and(lane >= 1, lane <= cb - 2)
        s = s + jnp.sum(jnp.where(interior, terms, jnp.float32(0.0)))

        prev_last2 = seam_ref[:, 0:1]
        prev_last = seam_ref[:, 1:2]
        saved0 = seam_ref[:, 2:3]
        saved1 = seam_ref[:, 3:4]
        own0 = h_out[:, 0:1]
        own1 = h_out[:, 1:2]
        own_l = h_out[:, cb - 1:cb]
        own_l2 = h_out[:, cb - 2:cb - 1]
        # b > 0: this band's first column + the previous band's deferred
        # last column (seam reads at b == 0 hit stale/uninitialized
        # scratch — computed anyway, discarded by the select).
        e_first = col_contrib(prev_last, own0, own1)
        e_prev = col_contrib(prev_last2, prev_last, own0)
        s = s + jnp.where(b > 0, e_first + e_prev, jnp.float32(0.0))
        # Last band: its own last column wraps to saved col 0, and global
        # col 0 (deferred from band 0) wraps back to this band's last.
        e_last = col_contrib(own_l2, own_l, saved0)
        e_zero = col_contrib(own_l, saved0, saved1)
        s = s + jnp.where(b == nbands - 1, e_last + e_zero,
                          jnp.float32(0.0))
        seam_ref[:, 0:2] = h_out[:, cb - 2:cb]

    @pl.when(b == 0)
    def _init_sums():
        sums_ref[0:1, :] = jnp.zeros((1, 128), jnp.float32)

    slane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    sums_ref[0:1, :] = sums_ref[0:1, :] + jnp.where(
        slane == b, s, jnp.float32(0.0))


def _fourstep_bands(n: int):
    """(row band, column band) sizes for the four-step pipeline.

    A/B'd on v5e for the true-order scheme (steps/s): 2048: 16/128 = 599
    vs 549 (8/128), 577 (32/128), 558 (16/256); 4096: 16/128 = 151.1 vs
    149.9 (8/128), 150.5 (32/128), 149.4 (16/256); 1024: 16/128 and
    32/128 within tunnel noise (1,930-2,100). Small row bands
    double-buffer better on this HBM-bound pipeline; 16/128 wins or ties
    everywhere."""
    return 16, 128


def _fourstep_plan(n: int, config: OceanConfig):
    """Static plan for the four-step pipeline: (n1, n2, block, cblock).

    n1 pinned to the 128-lane width (NOT the FLOP-balanced _split): the
    row pass then lands its n1 output factor in lanes with (B, n2, n1)
    flattening to TRUE x order, and every reshape/elementwise/dot in
    both kernels runs on full lane tiles. The extra arithmetic (cost
    ~ n1 + n2 per element) is noise — the pipeline is HBM-bound."""
    n1 = 128
    n2 = n // n1
    block, cblock = _fourstep_bands(n)
    if n % block or n % cblock or n2 < 8 or n2 > 128:
        raise ValueError(
            f"four-step pallas pipeline supports N in [1024, 16384], got {n}")
    if n2 > 64 and config.hermitian_pack is not False:
        # 16384^2 single-chip capacity arithmetic (docs/DESIGN.md round 5):
        # the packed pipeline's resident planes (10 hoisted permuted
        # inputs + 3 state + 4 y + 3 out = 1.07 GB each) total ~18-21 GB,
        # past the 16 GB HBM of one v5e. The grid fits the ROW-SHARDED
        # distributed pipeline at D >= 2
        # (parallel.distributed_fft.pallas_fourstep_fields_sharded,
        # ~9.5 GB/chip at D=2), which passes plan validation through this
        # same function — only the unsharded single-chip entry warns.
        import warnings  # noqa: PLC0415

        warnings.warn(
            "16384^2 exceeds one chip's HBM with the packed pipeline "
            "(~18 GB resident); use the row-sharded distributed path "
            "(mesh with D >= 2 rows)", stacklevel=2)
    return n1, n2, block, cblock


def _cat_complex_np(wr, wi):
    """[[Wr, -Wi], [Wi, Wr]]: one stacked real matmul = a complex matmul.

    Block rows select the (re, im) OUTPUT, block columns the (re, im)
    contraction operand — valid for both the NN form ([Yr; Yi] = Wcat @
    [Xr; Xi]) and the NT form ([Yr | Yi] = [Xr | Xi] @ Wcat^T)."""
    return np.concatenate([np.concatenate([wr, -wi], axis=1),
                           np.concatenate([wi, wr], axis=1)], axis=0)


def _fourstep_tables(n: int, n1: int, n2: int, negate: bool):
    """The row-pass + col-pass stacked DFT/twiddle tables (device consts).

    Row: (W1cat (2n1, 2n1), W2 stage-2 table, Ttr, Tti (n2, n1));
    col: (W1cat, W2 stage-2 table, W2top (n2, 2n2) — the real-output
    rows for the height field, Ttr, Tti (n1, n2)).

    When 4*n2 <= 128 (N <= 4096) the stage-2 table is BLOCK-DIAGONAL
    over the kernel's two per-field operands, fusing its two stage-2
    dots into ONE MXU pass: row diag(W2cat, W2cat) (4n2, 4n2) carries
    the height pair and the packed-choppy pair together; col
    diag(W2top, W2cat) (3n2, 4n2) carries the height (real-out) and
    choppy stage-2s together. The roofline audit (docs/BENCH.md round
    5) pinned the column kernel as MXU-SHAPE bound: a (2n2, 2n2)
    weight fills (2n2/128)^2 of the systolic array, and MXU time is
    passes x free-dim CYCLES regardless of fill — halving the pass
    count halves stage-2 time outright. The zero off-diagonal blocks
    contribute exact +0.0 per accumulation term, so a SEQUENTIAL
    contraction (the MXU's systolic accumulate) is value-identical to
    the two-dot form; backends with reduction TREES may re-pair the
    real terms around the padding — measured: CPU interpret is exactly
    0.0 vs the two-dot form at n2 in {16, 32} for all fields and for
    the row kernel at every n2, with a 1-ulp height drift at n2 = 8
    only (tests/test_pallas.py pins both). Past 4n2 = 128 (8192^2+)
    the diagonal no longer fits one weight tile — (192, 256) tiles as
    4 passes where the split form takes 2 — so the tables stay
    separate and the kernels branch on the table SHAPE."""
    w1_row = _cat_complex_np(*_dft_matrix_out_alt_np(n1, 1, 0, False))
    w1_col = _cat_complex_np(*_dft_matrix_out_alt_np(n1, 1, 0, negate))
    w2r, w2i = _dft_matrix_np(n2, 1)
    w2cat = _cat_complex_np(w2r, w2i)
    w2top = w2cat[:n2]
    if 4 * n2 <= 128:
        z22 = np.zeros((2 * n2, 2 * n2), w2cat.dtype)
        w2_row = np.block([[w2cat, z22], [z22, w2cat]])
        w2_col = np.block([[w2top, np.zeros((n2, 2 * n2), w2cat.dtype)],
                           [z22, w2cat]])
    else:
        w2_row, w2_col = w2cat, w2cat
    ttr_row, tti_row = (jnp.asarray(a) for a in _twiddle_np(n2, n1, 1))
    ttr, tti = (jnp.asarray(a) for a in _twiddle_np(n1, n2, 1))
    return ((jnp.asarray(w1_row), jnp.asarray(w2_row), ttr_row, tti_row),
            (jnp.asarray(w1_col), jnp.asarray(w2_col), jnp.asarray(w2top),
             ttr, tti))


def _fourstep_permute_inputs(h0_pair, omega, config: OceanConfig, n: int,
                             n1: int, n2: int):
    """Packed-propagate precompute + the four-step x-permutation.

    column c = k2*N1 + k1 <- true k = k1*N2 + k2. Time-invariant, hoisted
    out of rollout scans by XLA's loop-invariant motion, so the row
    kernel's stage-1 view is free at step time. Expressed as a gather on
    a 1-D index constant, NOT reshape/swapaxes: the transpose form
    defeats LICM at N >= 2048 (measured 469 vs 624 steps/s at 2048^2)
    while the gather hoists just like precompute's rho-flip does."""
    from gfx_ocean_tpu.ops.propagate import precompute_propagate_packed  # noqa: PLC0415

    pre, pre_rho, omega_rho = precompute_propagate_packed(
        h0_pair, omega, config.compat)
    perm_idx = jnp.asarray(
        (np.arange(n, dtype=np.int32) % n1) * n2
        + np.arange(n, dtype=np.int32) // n1)

    def permute_x(a):
        return jnp.take(a, perm_idx, axis=-1)

    return (permute_x(pre), permute_x(pre_rho), permute_x(omega),
            permute_x(omega_rho))


_VMEM_HINT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _fourstep_row_call(t2, pre, pre_rho, omega_p, omega_rho, tabs,
                       config: OceanConfig, n: int, n1: int, n2: int,
                       block: int, interpret: bool) -> jnp.ndarray:
    """Row-pass pallas_call over the (possibly shard-local) rows of
    ``pre``; ``t2`` is the (1, tb + 1) [t_0..t_{tb-1}, global row base]
    SMEM scalar row. With tb > 1 the kernel time-batches (one band fetch
    serves tb frames) and the result grows a leading (tb,) axis.

    tb rides the GRID: grid = (bands, tb), frame index minor. The input
    specs' index maps ignore the frame index, so Mosaic keeps each band's
    fetched blocks resident across the tb consecutive frame steps (the
    copy is skipped when the block index repeats), while the output block
    stays at the tb=1 size — the tb-wide output BLOCK form was a measured
    VMEM-pressure loss (kernel docstring)."""
    rows = pre.shape[-2]
    tb = t2.shape[1] - 1
    vmem = pltpu.VMEM
    row_kernel = functools.partial(
        _fourstep_row_kernel, n=n, n1=n1, n2=n2, block=block, tb=tb,
        domain_size=float(config.domain_size), wrap_k=config.compat.wrap_k,
        precision=config.matmul_precision)
    tabspec = pl.BlockSpec(memory_space=vmem)
    if tb == 1:
        grid = (rows // block,)
        out_shape = jax.ShapeDtypeStruct((2, 2, rows, n), jnp.float32)
        out_spec = pl.BlockSpec((2, 2, block, n), lambda i: (0, 0, i, 0),
                                memory_space=vmem)
        band_idx4 = lambda i: (0, i, 0)  # noqa: E731
        band_idx2 = lambda i: (i, 0)     # noqa: E731
    else:
        grid = (rows // block, tb)
        out_shape = jax.ShapeDtypeStruct((tb, 2, 2, rows, n), jnp.float32)
        out_spec = pl.BlockSpec((1, 2, 2, block, n),
                                lambda i, j: (j, 0, 0, i, 0),
                                memory_space=vmem)
        band_idx4 = lambda i, j: (0, i, 0)  # noqa: E731
        band_idx2 = lambda i, j: (i, 0)     # noqa: E731
    return pl.pallas_call(
        row_kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((4, block, n), band_idx4, memory_space=vmem),
            pl.BlockSpec((4, block, n), band_idx4, memory_space=vmem),
            pl.BlockSpec((block, n), band_idx2, memory_space=vmem),
            pl.BlockSpec((block, n), band_idx2, memory_space=vmem),
            tabspec, tabspec, tabspec, tabspec,
        ],
        out_specs=out_spec,
        interpret=interpret,
        compiler_params=_VMEM_HINT,
        cost_estimate=pl.CostEstimate(
            flops=tb * 2 * 2 * 8 * block * n * (n1 + n2),
            bytes_accessed=(10 * block * n + tb * 4 * block * n) * 4,
            transcendentals=tb * 4 * block * n,
        ),
    )(t2, pre, pre_rho, omega_p, omega_rho, *tabs)


def _fourstep_col_call(y, tabs, config: OceanConfig, n: int, n1: int,
                       n2: int, cblock: int, interpret: bool,
                       checksum: bool = False,
                       normals_scale: float | None = None):
    """Column-pass pallas_call over the (possibly shard-local) columns of
    ``y``. The column kernel has no column-position dependence (its tables
    are per-ROW), so any contiguous column band computes locally.

    A time-batched ``y`` ((tb, 2, 2, N, C)) runs as ONE call with the
    frame on grid dim 0, writing (tb, 3, N, C) directly — per-frame col
    calls + ``jnp.stack`` would materialize tb extra (3, N, N) copies
    (pallas outputs cannot be fusion-written into a concat buffer), ~2
    ms/frame of pure HBM copy at 8192^2.

    With ``checksum`` additionally returns a (tb, 128) f32 of per-band
    forcing partials (the col kernel's docstring); the caller sums the
    lanes per frame."""
    cols = y.shape[-1]
    nbands = cols // cblock
    vmem = pltpu.VMEM
    col_kernel = functools.partial(
        _fourstep_col_kernel, n=n, n1=n1, n2=n2,
        precision=config.matmul_precision,
        nbands=nbands, checksum=checksum, normals_scale=normals_scale)
    tabspec = pl.BlockSpec(memory_space=vmem)
    tb = y.shape[0] if y.ndim == 5 else 1
    if y.ndim == 4:
        grid = (nbands,)
        out_shape = jax.ShapeDtypeStruct((3, n, cols), jnp.float32)
        in_spec = pl.BlockSpec((2, 2, n, cblock), lambda j: (0, 0, 0, j),
                               memory_space=vmem)
        out_spec = pl.BlockSpec((3, n, cblock), lambda j: (0, 0, j),
                                memory_space=vmem)
        sums_shape = jax.ShapeDtypeStruct((1, 128), jnp.float32)
        sums_spec = pl.BlockSpec((1, 128), lambda j: (0, 0),
                                 memory_space=vmem)
    else:
        grid = (tb, nbands)
        out_shape = jax.ShapeDtypeStruct((tb, 3, n, cols), jnp.float32)
        in_spec = pl.BlockSpec((1, 2, 2, n, cblock),
                               lambda f, j: (f, 0, 0, 0, j),
                               memory_space=vmem)
        out_spec = pl.BlockSpec((1, 3, n, cblock), lambda f, j: (f, 0, 0, j),
                                memory_space=vmem)
        sums_shape = jax.ShapeDtypeStruct((tb, 128), jnp.float32)
        sums_spec = pl.BlockSpec((1, 128), lambda f, j: (f, 0),
                                 memory_space=vmem)
    out_shapes = [out_shape, sums_shape] if checksum else out_shape
    out_specs = [out_spec, sums_spec] if checksum else out_spec
    scratch = ([pltpu.VMEM((n, 4), jnp.float32)] if checksum else [])
    out = pl.pallas_call(
        col_kernel,
        grid=grid,
        out_shape=out_shapes,
        out_specs=out_specs,
        in_specs=[in_spec, tabspec, tabspec, tabspec, tabspec, tabspec],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_VMEM_HINT,
        cost_estimate=pl.CostEstimate(
            flops=tb * 2 * 3 * 4 * cblock * n * (n1 + n2),
            bytes_accessed=tb * (4 * n * cblock + 3 * n * cblock) * 4,
            transcendentals=tb * n * cols if checksum else 0,
        ),
    )(y, *tabs)
    return out


def _fourstep_fields(h0_pair, omega, t_arr, config: OceanConfig, n: int,
                     interpret: bool, checksum: bool = False,
                     normals_scale: float | None = None):
    """Two-kernel four-step pipeline for N >= 1024: fused packed propagate
    + row pass (grid over row bands), column pass (grid over column bands).
    Both passes emit true index order (header comment), so the (2, 2, N, N)
    row-pass planes are the only intermediate HBM traffic and nothing is
    deferred.

    ``t_arr`` is (1, tb); tb > 1 time-batches IN the row kernel (each row
    band is fetched once and serves tb frames — the row kernel's docstring)
    and the result grows a leading (tb,) frame axis. The column pass has no
    time-invariant bulk inputs (its tables are KBs); it carries the frame
    on its grid so all tb frames land in one (tb, 3, N, N) output with no
    stack copies (the col call's docstring)."""
    n1, n2, block, cblock = _fourstep_plan(n, config)
    row_tabs, col_tabs = _fourstep_tables(n, n1, n2, config.compat.ref_sign)
    pre, pre_rho, omega_p, omega_rho = _fourstep_permute_inputs(
        h0_pair, omega, config, n, n1, n2)
    tb = t_arr.shape[1]
    t2 = jnp.concatenate([t_arr, jnp.zeros((1, 1), jnp.float32)], axis=1)
    y = _fourstep_row_call(t2, pre, pre_rho, omega_p, omega_rho, row_tabs,
                           config, n, n1, n2, block, interpret)
    # tb > 1: y is (tb, 2, 2, N, N) and the col call batches the frame on
    # its grid, writing (tb, 3, N, N) directly (no stack copies).
    return _fourstep_col_call(y, col_tabs, config, n, n1, n2, cblock,
                              interpret, checksum=checksum,
                              normals_scale=normals_scale)


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def pallas_planes(
    h0_pair: jnp.ndarray,
    omega: jnp.ndarray,
    t: jnp.ndarray,
    config: OceanConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused step in the kernels' NATIVE plane-major layout: (2, N, N) h0
    planes + omega + t -> (3, N, N) (disp_x, height, disp_z).

    ``pallas_fields`` wraps this with the channel-last moveaxis of the
    public contract (the rgba packing of ``shader/correction.comp:31``);
    plane-major consumers (the checksum rollout, anything reading one
    field) should use this directly — at 4096^2 the (3, N, N) ->
    (N, N, 3) relayout alone costs ~0.5 ms/step of HBM traffic.

    Equivalent to propagate + centered ifft2_real_unnorm + channel packing
    (tested against both the jnp path and the CPU golden). N <= 512 runs
    as ONE VMEM-resident kernel (the Hermitian-packed grid kernel when
    ``config.hermitian_pack``, the default; the unpacked single block
    otherwise, except 512@"highest" which falls back to the row/column-
    blocked two-kernel pipeline, ``_blocked_fields``); N >= 1024 uses the
    four-step two-kernel pipeline (``_fourstep_fields`` — fused
    packed-Hermitian propagate + in-VMEM four-step stages in true index
    order, the Pallas answer to the XLA einsum plateau at the reference's
    scaling frontier, SURVEY §7.3).
    """
    if h0_pair.ndim != 3:
        raise ValueError("pallas planes/fields take a single unbatched state; vmap for cascades")
    n = h0_pair.shape[-1]
    t_arr = jnp.reshape(t.astype(jnp.float32), (1, 1))
    if n > 512:
        return _fourstep_fields(h0_pair, omega, t_arr, config, n, interpret)

    if config.hermitian_pack:
        return _packed_single_fields(h0_pair, omega, t_arr, config, n,
                                     interpret)

    # A = D_alt @ W: the y-half of the centering sign folded into rows.
    awr, awi = (jnp.asarray(a) for a in _dft_matrix_out_alt_np(n, 1, 0, False))
    h0n = h0_pair[:, ::-1, ::-1]

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
    return planes


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def pallas_planes_batch(
    h0_pair: jnp.ndarray,
    omega: jnp.ndarray,
    ts: jnp.ndarray,
    config: OceanConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused step for ``tb`` frames at once: ts (tb,) -> (tb, 3, N, N).

    On the four-step path (N >= 1024) the batch rides IN the row kernel
    (``_fourstep_row_kernel``'s tb loop): each row band's 10 hoisted
    propagate planes — the pipeline's dominant HBM traffic — are fetched
    once and serve all tb frames, cutting per-frame row-pass input bytes
    by tb x. Per-frame outputs are bit-identical to ``pallas_planes``
    (identical dot shapes; frames are independent, SURVEY §5). For
    N <= 512 (whole grid VMEM-resident — nothing to amortize) this is
    the plain vmap over :func:`pallas_planes`."""
    if h0_pair.ndim != 3:
        raise ValueError(
            "pallas planes/fields take a single unbatched state; vmap for cascades")
    n = h0_pair.shape[-1]
    tb = ts.shape[0]
    if n > 512 and tb > 1:
        t_arr = jnp.reshape(ts.astype(jnp.float32), (1, tb))
        return _fourstep_fields(h0_pair, omega, t_arr, config, n, interpret)
    return jax.vmap(
        lambda tt: pallas_planes(h0_pair, omega, tt, config, interpret))(ts)


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def pallas_checksums(
    h0_pair: jnp.ndarray,
    omega: jnp.ndarray,
    ts: jnp.ndarray,
    config: OceanConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """Benchmark-forcing checksums for ``tb`` frames: ts (tb,) -> (tb,).

    Per frame: sum(planes) + sum(normals) (the latter when
    ``config.compute_normals``) — the O(1)-per-frame reduction the
    checksum rollout (``models.make_rollout(keep_fields=False)``) scans
    over. On the default packed/four-step kernels the reduction rides the
    kernels' final pass (the ``checksum`` kernel flag): every field plane
    is still computed and materialized to HBM exactly as in
    :func:`pallas_planes` — an unread custom-call output is still written
    — but the forcing sum reads VMEM instead of re-streaming ~5 field
    planes from HBM (measured 12% of the step at 4096^2, docs/BENCH.md
    round-5 roofline "other" bucket). Unpacked N <= 512 configs
    (``hermitian_pack=False``) keep the external XLA reduce.

    The f32 accumulation order differs from the external reduce (band
    partials vs XLA's tree), so values agree with the external formula —
    and across time-batch variants, whose reduces XLA vectorizes
    program-dependently (measured ~1-2 ulp) — only to reassociation
    tolerance. The field planes themselves stay bit-identical across tb
    variants (``pallas_planes_batch``'s contract, tested).
    """
    if h0_pair.ndim != 3:
        raise ValueError(
            "pallas planes/fields take a single unbatched state; vmap for cascades")
    n = h0_pair.shape[-1]
    ts = jnp.reshape(ts.astype(jnp.float32), (-1,))
    tb = ts.shape[0]
    nscale = (float(config.normal_height_scale)
              if config.compute_normals else None)
    if n > 512:
        _, sums = _fourstep_fields(
            h0_pair, omega, jnp.reshape(ts, (1, tb)), config, n, interpret,
            checksum=True, normals_scale=nscale)
        return jnp.sum(sums, axis=-1)
    if config.hermitian_pack:
        def one(t):
            _, sums = _packed_single_fields(
                h0_pair, omega, jnp.reshape(t, (1, 1)), config, n,
                interpret, checksum=True, normals_scale=nscale)
            return jnp.sum(sums)
        return jax.vmap(one)(ts)

    # Unpacked / blocked fallback: external reduction over the planes.
    from gfx_ocean_tpu.ops.derived import (  # noqa: PLC0415
        finite_difference_normals_planes)

    def one_ext(t):
        planes = pallas_planes(h0_pair, omega, t, config, interpret)
        out = jnp.sum(planes, dtype=jnp.float32)
        if nscale is not None:
            normals = finite_difference_normals_planes(planes[1], nscale)
            out = out + jnp.sum(normals, dtype=jnp.float32)
        return out
    return jax.vmap(one_ext)(ts)


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def pallas_fields(
    h0_pair: jnp.ndarray,
    omega: jnp.ndarray,
    t: jnp.ndarray,
    config: OceanConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused step: (2, N, N) h0 planes + omega + t -> (N, N, 3) displacement
    in the (disp_x, height, disp_z) channel order of
    ``shader/correction.comp:31-34``. See :func:`pallas_planes`."""
    return jnp.moveaxis(
        pallas_planes(h0_pair, omega, t, config, interpret), 0, -1)
