"""Explicit-collective distributed 2-D inverse FFT (shard_map + all_to_all).

The reference decomposes its 2-D FFT into independent row FFTs, a barrier,
then column FFTs (``src/render.rs:1158-1231``) — exactly the transpose
decomposition every distributed FFT uses. On a TPU mesh this becomes:

    row pass   : each chip DFTs its local band of rows (local MXU matmul)
    transpose  : one ``all_to_all`` over the "row" axis reshards from
                 row-bands to column-bands (rides ICI)
    col pass   : each chip DFTs its local band of columns (local matmul)

``sharding.make_sharded_step`` gets the same schedule implicitly from
GSPMD; this module is the hand-scheduled formulation — it pins the
communication pattern (useful at scales where GSPMD's choice regresses)
and is the template for a future Pallas kernel with fused RDMA.

Layout note: inputs are row-sharded (re, im) planes; the output field comes
back **row-sharded** again (a second all_to_all) so downstream elementwise
passes see the same layout they were given.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gfx_ocean_tpu.ops.fft import dft_matrices, resolve_precision


def _local_ifft2_real(xr, xi, wr, wi, axis_name: str, prec) -> jnp.ndarray:
    """Per-shard body: row DFT -> all_to_all transpose -> col DFT (real out).

    Shapes (per shard, P = axis size): xr/xi (..., N/P, N); returns
    (..., N/P, N) — the real field, row-sharded like the input.
    """
    # Row pass: full complex DFT along the last axis. W is replicated.
    ar = jnp.matmul(xr, wr, precision=prec) - jnp.matmul(xi, wi, precision=prec)
    ai = jnp.matmul(xr, wi, precision=prec) + jnp.matmul(xi, wr, precision=prec)

    # Transpose: row-bands -> column-bands. tiled=True keeps the block
    # layout (split the last axis across chips, concat the row axis).
    a2r = jax.lax.all_to_all(ar, axis_name, split_axis=ar.ndim - 1,
                             concat_axis=ar.ndim - 2, tiled=True)
    a2i = jax.lax.all_to_all(ai, axis_name, split_axis=ai.ndim - 1,
                             concat_axis=ai.ndim - 2, tiled=True)

    # Col pass from the left, real output only: Re(W @ A) on the local
    # (..., N, N/P) column band.
    fr = jnp.matmul(wr, a2r, precision=prec) - jnp.matmul(wi, a2i, precision=prec)

    # Back to row-sharded so the caller's layout is unchanged.
    return jax.lax.all_to_all(fr, axis_name, split_axis=fr.ndim - 2,
                              concat_axis=fr.ndim - 1, tiled=True)


def ifft2_real_unnorm_sharded(
    xr: jnp.ndarray,
    xi: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "row",
    precision: str = "high",
) -> jnp.ndarray:
    """Row-sharded real-output unnormalized 2-D inverse DFT.

    Args:
        xr, xi: float32 (..., N, N) spectrum planes, sharded along the
            second-to-last axis over ``axis_name``.
    Returns:
        float32 (..., N, N) real field, identically sharded.
    """
    n = xr.shape[-1]
    wr, wi = dft_matrices(n, sign=1)
    prec = resolve_precision(precision)

    ndim = xr.ndim
    row_spec = P(*([None] * (ndim - 2)), axis_name, None)
    body = functools.partial(_local_ifft2_real, axis_name=axis_name, prec=prec)
    fn = shard_map(
        lambda a, b, c, d: body(a, b, c, d),
        mesh=mesh,
        in_specs=(row_spec, row_spec, P(None, None), P(None, None)),
        out_specs=row_spec,
    )
    return fn(xr, xi, wr, wi)
