"""Vectorized JAX rasterizer for verification frames.

Stands in for the reference's graphics pipeline (``src/render.rs:264-395``
render pass + ``shader/ocean.vert``/``ocean.frag``): vertex displacement,
projection with the reference's clip-space y negation, z-buffered triangle
rasterization with perspective-correct varyings, and the stylized water
shading of ``shade.py``. Clear color (0.6, 0.6, 0.6) and depth-clear 1.0
match ``src/render.rs:1340-1350``.

Design: TPU-friendly data-parallel two-pass rasterization. Every triangle
gets a fixed SAMPLES x SAMPLES pixel grid anchored at its bbox corner
(masked outside bbox/edges); pass 1 scatter-mins depth into the z-buffer,
pass 2 re-tests each sample against the winning depth and scatters its
perspective-corrected varyings. Ties write arbitrarily (equal depth).
This trades redundant samples for static shapes — the XLA-compatible
formulation of a rasterizer (no data-dependent loops). Triangles whose
bbox exceeds SAMPLES pixels are rendered partially (near-field geometry);
raise ``samples`` for close-ups. Rendering is a verification path, not the
benchmarked inner loop (BASELINE.json: rendering decoupled).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gfx_ocean_tpu.render import shade as sh
from gfx_ocean_tpu.render.camera import Camera, perspective
from gfx_ocean_tpu.render.mesh import build_grid, instantiate


def _vertex_stage(displacement, positions, uvs, view_proj):
    """``shader/ocean.vert``: displace, offset, project, negate clip y."""
    disp = sh.sample_displacement(displacement, uvs[:, 0], uvs[:, 1])
    disp = disp.at[:, 1].multiply(1.0 / 3.0)
    disp = disp.at[:, 0].multiply(1.0 / 3.5)
    disp = disp.at[:, 2].multiply(1.0 / 3.5)
    world = positions + disp
    ones = jnp.ones((world.shape[0], 1), world.dtype)
    clip = jnp.concatenate([world, ones], axis=-1) @ view_proj.T
    clip = clip.at[:, 1].multiply(-1.0)  # ocean.vert:27
    return world, clip


_TRI_CHUNK = 4096  # triangles per scan iteration — bounds peak memory


@functools.partial(jax.jit, static_argnames=("width", "height", "samples"))
def _rasterize(displacement, positions, uvs, tris, view_proj, camera_pos,
               width: int, height: int, samples: int):
    world, clip = _vertex_stage(displacement, positions, uvs, view_proj)

    # Pad triangles to a chunk multiple; padding points at vertex 0 thrice
    # (zero area -> masked out).
    t_count = tris.shape[0]
    chunks = -(-t_count // _TRI_CHUNK)
    pad = chunks * _TRI_CHUNK - t_count
    tris = jnp.concatenate([tris, jnp.zeros((pad, 3), tris.dtype)], axis=0)
    tris = tris.reshape(chunks, _TRI_CHUNK, 3)

    gy, gx = jnp.meshgrid(jnp.arange(samples), jnp.arange(samples), indexing="ij")
    spill = width * height  # out-of-screen scatter cell

    def edge(ax, ay, bx, by, x, y):
        return (x - ax) * (by - ay) - (y - ay) * (bx - ax)

    def chunk_body(carry, tri_chunk):
        zbuf, uv_buf, world_buf = carry
        v_clip = clip[tri_chunk]          # (C, 3, 4)
        v_world = world[tri_chunk]        # (C, 3, 3)
        v_uv = uvs[tri_chunk]             # (C, 3, 2)

        w = v_clip[..., 3]
        valid = jnp.all(w > 1e-6, axis=-1)  # crude near-plane cull
        w_safe = jnp.where(valid[:, None], w, 1.0)
        ndc = v_clip[..., :3] / w_safe[..., None]
        sx = (ndc[..., 0] + 1.0) * 0.5 * width
        sy = (ndc[..., 1] + 1.0) * 0.5 * height
        sz = ndc[..., 2]

        x_min = jnp.floor(jnp.min(sx, axis=-1)).astype(jnp.int32)
        y_min = jnp.floor(jnp.min(sy, axis=-1)).astype(jnp.int32)
        px = x_min[:, None, None] + gx[None]           # (C, S, S)
        py = y_min[:, None, None] + gy[None]
        on_screen = (px >= 0) & (px < width) & (py >= 0) & (py < height)
        cx = px.astype(jnp.float32) + 0.5
        cy = py.astype(jnp.float32) + 0.5

        e0 = edge(sx[:, 1, None, None], sy[:, 1, None, None],
                  sx[:, 2, None, None], sy[:, 2, None, None], cx, cy)
        e1 = edge(sx[:, 2, None, None], sy[:, 2, None, None],
                  sx[:, 0, None, None], sy[:, 0, None, None], cx, cy)
        e2 = edge(sx[:, 0, None, None], sy[:, 0, None, None],
                  sx[:, 1, None, None], sy[:, 1, None, None], cx, cy)
        area = edge(sx[:, 1], sy[:, 1], sx[:, 2], sy[:, 2], sx[:, 0], sy[:, 0])
        degenerate = jnp.abs(area) < 1e-12
        area = jnp.where(degenerate, 1.0, area)[:, None, None]
        b0 = e0 / area
        b1 = e1 / area
        b2 = e2 / area
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)  # no backface culling

        mask = (inside & on_screen & valid[:, None, None]
                & ~degenerate[:, None, None])
        z = (b0 * sz[:, 0, None, None] + b1 * sz[:, 1, None, None]
             + b2 * sz[:, 2, None, None])
        mask = mask & (z > -1.0) & (z < 1.0)
        z_masked = jnp.where(mask, z, jnp.inf).astype(jnp.float32)
        flat_ix = jnp.where(mask, py * width + px, spill)

        zbuf = zbuf.at[flat_ix.reshape(-1)].min(z_masked.reshape(-1))

        won = mask & (z_masked <= zbuf[flat_ix])
        inv_w = 1.0 / w_safe  # (C, 3)

        def persp(attr):  # (C, 3, A) -> (C, S, S, A), perspective-correct
            num = (b0[..., None] * (attr[:, 0] * inv_w[:, 0, None])[:, None, None]
                   + b1[..., None] * (attr[:, 1] * inv_w[:, 1, None])[:, None, None]
                   + b2[..., None] * (attr[:, 2] * inv_w[:, 2, None])[:, None, None])
            den = (b0 * inv_w[:, 0, None, None] + b1 * inv_w[:, 1, None, None]
                   + b2 * inv_w[:, 2, None, None])
            return num / den[..., None]

        scatter_ix = jnp.where(won, flat_ix, spill).reshape(-1)
        uv_buf = uv_buf.at[scatter_ix].set(persp(v_uv).reshape(-1, 2))
        world_buf = world_buf.at[scatter_ix].set(persp(v_world).reshape(-1, 3))
        return (zbuf, uv_buf, world_buf), None

    init = (jnp.full((spill + 1,), jnp.inf, jnp.float32),
            jnp.zeros((spill + 1, 2), jnp.float32),
            jnp.zeros((spill + 1, 3), jnp.float32))
    (zbuf, uv_buf, world_buf), _ = jax.lax.scan(chunk_body, init, tris)

    covered = (zbuf[:-1] != jnp.inf).reshape(height, width)
    uv_img = uv_buf[:-1].reshape(height, width, 2)
    world_img = world_buf[:-1].reshape(height, width, 3)

    color = sh.shade_fragments(displacement, uv_img[..., 0], uv_img[..., 1],
                               world_img, camera_pos)
    clear = jnp.asarray(sh.CLEAR_COLOR)
    img = jnp.where(covered[..., None], color, clear[None, None])
    return img, zbuf[:-1].reshape(height, width)


def render_frame(
    displacement: jnp.ndarray,
    camera: Camera,
    width: int = 300,
    height: int = 175,
    mesh_resolution: int = 128,
    num_patches: int = 4,
    samples: int = 32,
    return_depth: bool = False,
):
    """Render one frame from a displacement map along a camera.

    Args:
        displacement: (N, N, 3) field from ``step()`` (raw, unscaled — the
            /3.0 and /3.5 visual scales of ``ocean.vert:22-23`` are applied
            here, in the vertex stage).
        camera: a ``render.camera.Camera`` (numpy, host-side).
    Returns:
        (H, W, 3) float32 image (plus the depth buffer if requested).
    """
    mesh = build_grid(mesh_resolution, num_patches)
    positions, uvs, tris = instantiate(mesh)
    proj = perspective(width / height)
    view_proj = jnp.asarray((proj @ camera.view()).astype(np.float32))
    img, depth = _rasterize(
        jnp.asarray(displacement), jnp.asarray(positions), jnp.asarray(uvs),
        jnp.asarray(tris.astype(np.int32)), view_proj,
        jnp.asarray(camera.position.astype(np.float32)),
        width, height, samples)
    if return_depth:
        return img, depth
    return img


def render_frames(
    displacements: jnp.ndarray,
    cameras,
    width: int = 300,
    height: int = 175,
    mesh_resolution: int = 128,
    num_patches: int = 4,
    samples: int = 32,
) -> jnp.ndarray:
    """Batched frame generation (BASELINE config 5): vmap the rasterizer
    over per-frame displacement maps and cameras.

    Args:
        displacements: (F, N, N, 3) fields (e.g. a ``make_rollout(...,
            keep_fields=True)`` trajectory).
        cameras: sequence of F ``Camera``s (host-side; their matrices are
            stacked and shipped once).
    Returns:
        (F, H, W, 3) float32 images.
    """
    mesh = build_grid(mesh_resolution, num_patches)
    positions, uvs, tris = instantiate(mesh)
    proj = perspective(width / height)
    view_projs = np.stack([(proj @ c.view()).astype(np.float32) for c in cameras])
    cam_pos = np.stack([c.position.astype(np.float32) for c in cameras])

    f = jax.vmap(
        lambda d, vp, cp: _rasterize(
            d, jnp.asarray(positions), jnp.asarray(uvs),
            jnp.asarray(tris.astype(np.int32)), vp, cp,
            width, height, samples)[0])
    return f(jnp.asarray(displacements), jnp.asarray(view_projs),
             jnp.asarray(cam_pos))
