"""Point queries of the displaced ocean surface (buoy sampling).

Beyond the reference: its surface exists only as pixels
(``shader/ocean.vert:21-25`` displaces the render mesh and the result is
never readable back), so a host application cannot ask "how high is the
water at (x, z)?" — the question every floating object needs. This
module answers it against the same displacement texture with the same
sampler semantics (bilinear, repeat wrap, GL texel centers —
``render/shade._sample_bilinear_wrap``) and the same world mapping the
renderer uses (mesh grid step 1 world unit, uv = world / (h - 1),
``ocean.vert:22-23`` visual scales).

The displaced surface is parametric: a grid point (x0, z0) renders at

    (x0 + dx(x0, z0) / horiz_div,  dy(x0, z0) / height_div,
     z0 + dz(x0, z0) / horiz_div)

so the height *above* a world point (x, z) requires inverting the
horizontal map — the classic Tessendorf choppy-inversion fixed point:

    x0 <- x - dx(x0, z0) / horiz_div        (and likewise z0)

which converges when the horizontal displacement Jacobian has spectral
radius < 1 (the same |J| the foam mask thresholds; folding seas where
the surface self-intersects have no single-valued height and the
iterate lands on one of the folded sheets). Each iteration is one
bilinear texture sample; everything is jit-able and batched over query
points.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gfx_ocean_tpu.render import shade as sh


class SurfaceSample(NamedTuple):
    """Result of a surface point query (all leading-shape = points)."""

    height: jnp.ndarray      # water height (world y) above (x, z)
    base_xz: jnp.ndarray     # (..., 2) converged undisplaced grid point
    residual: jnp.ndarray    # horizontal fixed-point residual (world units)
    normal: jnp.ndarray      # (..., 3) unit surface normal at the sample


def _composite_sample(displacement, tiles, u, v):
    """Bilinear displacement at (u, v), summed over cascades.

    Matches ``raster._vertex_stage`` compositing: cascade c samples at
    uv * tiles[c] (repeat wrap makes the factor a tiling).
    """
    if displacement.ndim == 4:
        return sum(
            sh.sample_displacement(displacement[c], u * tiles[c],
                                   v * tiles[c])
            for c in range(displacement.shape[0]))
    return sh.sample_displacement(displacement, u, v)


@functools.partial(
    jax.jit,
    static_argnames=("mesh_resolution", "height_div", "horiz_div",
                     "iterations", "tiles", "eps"))
def sample_surface(displacement, x, z, *, mesh_resolution: int = 128,
                   height_div: float = 3.0, horiz_div: float = 3.5,
                   iterations: int = 4, tiles=None,
                   eps: float = 0.05) -> SurfaceSample:
    """Water height (and normal) of the displaced surface above (x, z).

    ``displacement``: (N, N, 3) field from ``make_step`` (channels
    x/height/z, reference texture layout), or a (C, N, N, 3) cascade
    stack with ``tiles`` the per-cascade uv factors
    (``OceanConfig.cascade_tiles()``). ``x``/``z``: world coordinates,
    any (broadcastable) shape; the mesh-grid world step is 1 unit, i.e.
    one patch spans ``mesh_resolution - 1`` units (``build_grid``).
    ``iterations``: choppy-inversion fixed-point steps; 0 samples the
    height directly above (x, z) (exact whenever horiz displacement is
    disabled). ``eps``: finite-difference step (world units) for the
    normal — within one bilinear piece (texel span (h-1)/N world units)
    the FD slope is exact, so the default stays below a 512-texture's
    ~0.25-unit span while avoiding f32 cancellation.

    Scales mirror ``OceanConfig.height_div`` / ``horiz_div``; pass the
    config's values if they were changed from the reference's 3.0 / 3.5.
    """
    x = jnp.asarray(x, jnp.float32)
    z = jnp.asarray(z, jnp.float32)
    if tiles is None:
        tiles = (1.0,) * (displacement.shape[0]
                          if displacement.ndim == 4 else 1)
    inv_uv = 1.0 / float(mesh_resolution - 1)
    inv_h = 1.0 / float(horiz_div)

    def horiz(x0, z0):
        d = _composite_sample(displacement, tiles, x0 * inv_uv, z0 * inv_uv)
        return d[..., 0] * inv_h, d[..., 2] * inv_h, d[..., 1]

    def body(_, carry):
        x0, z0 = carry
        dx, dz, _ = horiz(x0, z0)
        return x - dx, z - dz

    x0, z0 = jax.lax.fori_loop(0, iterations, body, (x, z))

    def height_at(xq, zq):
        # Re-run the inversion for the probe points too: the normal is
        # the derivative of the *displaced* surface height field, which
        # includes the horizontal map's local stretch.
        xp, zp = jax.lax.fori_loop(
            0, iterations, lambda _, c: (
                xq - horiz(c[0], c[1])[0], zq - horiz(c[0], c[1])[1]),
            (xq, zq))
        return horiz(xp, zp)[2] / float(height_div)

    dx, dz, dy = horiz(x0, z0)
    height = dy / float(height_div)
    residual = jnp.hypot(x0 + dx - x, z0 + dz - z)
    hx = (height_at(x + eps, z) - height_at(x - eps, z)) / (2.0 * eps)
    hz = (height_at(x, z + eps) - height_at(x, z - eps)) / (2.0 * eps)
    n = jnp.stack([-hx, jnp.ones_like(hx), -hz], axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    return SurfaceSample(height=height,
                         base_xz=jnp.stack([x0, z0], axis=-1),
                         residual=residual, normal=n)
