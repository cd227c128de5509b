"""Vectorized JAX rasterizer for verification frames.

Stands in for the reference's graphics pipeline (``src/render.rs:264-395``
render pass + ``shader/ocean.vert``/``ocean.frag``): vertex displacement,
projection with the reference's clip-space y negation, z-buffered triangle
rasterization with perspective-correct varyings, and the stylized water
shading of ``shade.py``. Clear color (0.6, 0.6, 0.6) and depth-clear 1.0
match ``src/render.rs:1340-1350``.

Design: TPU-friendly data-parallel rasterization in 2D homogeneous
coordinates (Olano & Greer 1997). Coverage and interpolation use
lambda_i(p) = (v_j x v_k) . p on clip-space (x, y, w) directly — no
near-plane clipping stage is ever needed, and triangles crossing the eye
plane rasterize their visible part correctly. Perspective-correct
interpolation of any vertex attribute is the normalized-lambda weighted
sum; z comes from the same weights applied to clip z.

Two coverage passes, both static-shape (the XLA-compatible formulation —
no data-dependent loops):
 1. scatter: every fully-in-front triangle gets samples^2 sample points
    that snake row-major through its own screen bbox (covering any bbox
    of AREA <= samples^2 — thin grazing slivers included); depth
    scatter-mins into the z-buffer, then winners scatter their triangle
    ID. Ties write arbitrarily (equal depth).
 2. gather: triangles the budget cannot cover — screen bbox area above
    samples^2, or any vertex behind the eye plane (unbounded bbox) — are
    ranked by need and the top ``giants`` are edge-tested against every
    pixel, in groups, merging depth + ID. On a displaced regular grid
    only near-field cells qualify, so a modest K is exact.
 3. deferred varyings: one per-pixel interpolation of uv/world from the
    winning-ID image (scatter traffic is the TPU bottleneck; z+id is 2
    scattered channels instead of 6).

Rendering is a verification path, not the benchmarked inner loop
(BASELINE.json: rendering decoupled).
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
    # precision='highest': on TPU this 4x4 transform would otherwise run
    # in bf16 on the MXU — quantized clip coords break the homogeneous
    # edge tests (pixel-level speckle). Full f32 costs nothing at V x 4 x 4.
    clip = jnp.einsum("vi,ji->vj", jnp.concatenate([world, ones], axis=-1),
                      view_proj, precision="highest")
    clip = clip.at[:, 1].multiply(-1.0)  # ocean.vert:27
    return world, clip


_TRI_CHUNK = 4096   # scatter triangles per scan iteration — bounds memory
_GIANT_GROUP = 32   # gather triangles per scan iteration


def _lambdas(v_clip, pnx, pny, pix_dims):
    """Homogeneous edge functions at pixels.

    Args:
        v_clip: (..., 3, 4) clip coords of a triangle batch.
        pnx, pny: pixel-center NDC coords with ``pix_dims`` trailing pixel
            dims, broadcastable against the triangle batch dims.
    Returns:
        (lam0, lam1, lam2, det): lam_i(p) = (v_j x v_k) . (pnx, pny, 1)
        over clip (x, y, w); det = (v1 x v2) . v0. A pixel is a visible
        hit iff all lam_i * det >= 0 and (lam0+lam1+lam2) * det > 0
        (the last also enforces w(p) > 0 — in front of the eye).
    """
    v = v_clip[..., (0, 1, 3)]                      # (..., 3, 3): x, y, w
    cr = jnp.cross(v[..., (1, 2, 0), :], v[..., (2, 0, 1), :])  # (...,3,3)
    det = jnp.sum(cr[..., 0, :] * v[..., 0, :], axis=-1)
    pix_axes = tuple(range(-pix_dims, 0))

    def ev(i):  # lam_i = cr_i . (pnx, pny, 1), broadcast over pixels
        c0 = jnp.expand_dims(cr[..., i, 0], pix_axes)
        c1 = jnp.expand_dims(cr[..., i, 1], pix_axes)
        c2 = jnp.expand_dims(cr[..., i, 2], pix_axes)
        return c0 * pnx + c1 * pny + c2

    return ev(0), ev(1), ev(2), det


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "samples", "giants"))
def _rasterize(displacement, positions, uvs, tris, view_proj, camera_pos,
               width: int, height: int, samples: int, giants: int = 512):
    world, clip = _vertex_stage(displacement, positions, uvs, view_proj)

    # Pad triangles to a chunk multiple; padding points at vertex 0 thrice
    # (degenerate -> rejected by the det/denom sign tests).
    t_count = tris.shape[0]
    tris_all = tris
    chunks = -(-t_count // _TRI_CHUNK)
    pad = chunks * _TRI_CHUNK - t_count
    tris = jnp.concatenate([tris, jnp.zeros((pad, 3), tris.dtype)], axis=0)
    tris = tris.reshape(chunks, _TRI_CHUNK, 3)

    budget = samples * samples   # scatter samples per triangle
    gk = jnp.arange(budget)
    spill = width * height  # out-of-screen scatter cell

    def ndc_xy(cx, cy):
        return 2.0 * cx / width - 1.0, 2.0 * cy / height - 1.0

    # --- pass 1+2: windowed scatter for fully-in-front triangles ----------
    # The ``budget`` samples per triangle snake row-major through the
    # triangle's own pixel bbox (not a fixed square), so any bbox of AREA
    # <= budget is fully covered — thin grazing slivers included. Bboxes
    # larger than the budget are the gather pass's job.
    #
    # Only depth and the winning triangle ID are scattered (visibility);
    # varyings are reconstructed once per *pixel* at the end — scatter
    # traffic is the TPU bottleneck, and z+id is 2 channels vs 6.
    def chunk_body(carry, chunk):
        zbuf, idbuf = carry
        tri_chunk, tri_ids = chunk
        v_clip = clip[tri_chunk]          # (C, 3, 4)

        w = v_clip[..., 3]
        fully_front = jnp.all(w > 1e-6, axis=-1)  # else: gather pass owns it
        w_safe = jnp.where(fully_front[:, None], w, 1.0)
        sx = (v_clip[..., 0] / w_safe * 0.5 + 0.5) * width
        sy = (v_clip[..., 1] / w_safe * 0.5 + 0.5) * height

        x_min = jnp.floor(jnp.min(sx, axis=-1)).astype(jnp.int32)
        y_min = jnp.floor(jnp.min(sy, axis=-1)).astype(jnp.int32)
        bw = (jnp.floor(jnp.max(sx, axis=-1)).astype(jnp.int32) - x_min
              + 1).clip(1)
        px = x_min[:, None] + gk[None] % bw[:, None]   # (C, K)
        py = y_min[:, None] + gk[None] // bw[:, None]
        on_screen = (px >= 0) & (px < width) & (py >= 0) & (py < height)
        pnx, pny = ndc_xy(px.astype(jnp.float32) + 0.5,
                          py.astype(jnp.float32) + 0.5)

        lam0, lam1, lam2, det = _lambdas(v_clip, pnx, pny, 1)
        det = det[:, None]
        denom = lam0 + lam1 + lam2
        hit = ((lam0 * det >= 0) & (lam1 * det >= 0) & (lam2 * det >= 0)
               & (denom * det > 0))
        mask = hit & on_screen & fully_front[:, None]
        # z_ndc = z_clip(p) / w(p); both are linear varyings: sum(lam * .)
        lam_w = (lam0 * v_clip[:, None, 0, 3] + lam1 * v_clip[:, None, 1, 3]
                 + lam2 * v_clip[:, None, 2, 3])
        z = (lam0 * v_clip[:, None, 0, 2] + lam1 * v_clip[:, None, 1, 2]
             + lam2 * v_clip[:, None, 2, 2]) / jnp.where(lam_w == 0, 1.0,
                                                         lam_w)
        mask = mask & (z > -1.0) & (z < 1.0)
        z_masked = jnp.where(mask, z, jnp.inf).astype(jnp.float32)
        flat_ix = jnp.where(mask, py * width + px, spill)

        zbuf = zbuf.at[flat_ix.reshape(-1)].min(z_masked.reshape(-1))

        won = mask & (z_masked <= zbuf[flat_ix])
        scatter_ix = jnp.where(won, flat_ix, spill).reshape(-1)
        ids = jnp.broadcast_to(tri_ids[:, None], won.shape).reshape(-1)
        idbuf = idbuf.at[scatter_ix].set(ids)
        return (zbuf, idbuf), None

    all_ids = jnp.arange(chunks * _TRI_CHUNK,
                         dtype=jnp.int32).reshape(chunks, _TRI_CHUNK)
    init = (jnp.full((spill + 1,), jnp.inf, jnp.float32),
            jnp.zeros((spill + 1,), jnp.int32))
    (zbuf, idbuf), _ = jax.lax.scan(chunk_body, init, (tris, all_ids))

    z_img = zbuf[:-1].reshape(height, width)
    id_img = idbuf[:-1].reshape(height, width)

    # --- pass 3: gather for triangles the window cannot cover -------------
    # Need = screen bbox AREA above the sample budget, or any vertex
    # behind the eye plane (projected region unbounded — scored to the top
    # unconditionally). Rank by need, test the top K per-pixel in groups
    # of _GIANT_GROUP, merge by depth. Extra slots redo small triangles:
    # no-ops under the same depth test. Lowering ``samples`` makes more
    # triangles qualify — raise ``giants`` with it.
    k_giants = min(giants, t_count)
    groups = -(-k_giants // _GIANT_GROUP)

    all_clip = clip[tris_all]                     # (T, 3, 4)
    aw = all_clip[..., 3]
    front = aw > 1e-6
    fully_front = jnp.all(front, axis=-1)
    crossing = jnp.any(front, axis=-1) & ~fully_front
    # Conservative frustum cull, valid for any w sign (clip-space plane
    # tests are linear): a triangle is invisible if all three vertices sit
    # outside the same frustum plane. Without this, the strip of triangles
    # straddling the camera *plane* — which spans the whole grid, mostly
    # far outside the view — would flood the gather ranking.
    def all_outside(c):
        return jnp.all(c < -aw, axis=-1) | jnp.all(c > aw, axis=-1)

    outside = (all_outside(all_clip[..., 0]) | all_outside(all_clip[..., 1])
               | all_outside(all_clip[..., 2]))
    aw_safe = jnp.where(fully_front[:, None], aw, 1.0)
    asx = (all_clip[..., 0] / aw_safe * 0.5 + 0.5) * width
    asy = (all_clip[..., 1] / aw_safe * 0.5 + 0.5) * height
    bbw = jnp.floor(asx.max(-1)) - jnp.floor(asx.min(-1)) + 1.0
    bbh = jnp.floor(asy.max(-1)) - jnp.floor(asy.min(-1)) + 1.0
    area = bbw * bbh
    overlaps = ((asx.max(-1) >= 0) & (asx.min(-1) < width)
                & (asy.max(-1) >= 0) & (asy.min(-1) < height))
    score = jnp.where(
        crossing & ~outside, jnp.inf,
        jnp.where(fully_front & ~outside & overlaps & (area > budget),
                  area, -1.0))
    _, giant_ix = jax.lax.top_k(score, k_giants)
    giant_ok = jnp.take(score, giant_ix) > 0
    gpad = groups * _GIANT_GROUP - k_giants
    giant_ix = jnp.concatenate([giant_ix, jnp.zeros(gpad, giant_ix.dtype)])
    giant_ok = jnp.concatenate([giant_ok, jnp.zeros(gpad, bool)])
    giant_ix = giant_ix.reshape(groups, _GIANT_GROUP)
    giant_ok = giant_ok.reshape(groups, _GIANT_GROUP)

    pnx_f, pny_f = ndc_xy(jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5,
                          jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5)

    def giant_body(carry, group):
        zb, idb = carry
        ix, ok = group                                  # (G,), (G,)
        v_clip = clip[tris_all[ix]]                     # (G, 3, 4)
        lam0, lam1, lam2, det = _lambdas(v_clip, pnx_f[None], pny_f[None], 2)
        det = det[:, None, None]
        denom = lam0 + lam1 + lam2                      # (G, H, W)
        hit = ((lam0 * det >= 0) & (lam1 * det >= 0) & (lam2 * det >= 0)
               & (denom * det > 0)) & ok[:, None, None]
        lam_w = (lam0 * v_clip[:, None, None, 0, 3]
                 + lam1 * v_clip[:, None, None, 1, 3]
                 + lam2 * v_clip[:, None, None, 2, 3])
        z = (lam0 * v_clip[:, None, None, 0, 2]
             + lam1 * v_clip[:, None, None, 1, 2]
             + lam2 * v_clip[:, None, None, 2, 2]) / jnp.where(
                 lam_w == 0, 1.0, lam_w)
        hit = hit & (z > -1.0) & (z < 1.0)
        z_masked = jnp.where(hit, z, jnp.inf).astype(jnp.float32)

        best = jnp.argmin(z_masked, axis=0)             # (H, W)
        z_best = jnp.take_along_axis(z_masked, best[None], axis=0)[0]
        win = z_best <= zb                              # inf where no hit
        zb = jnp.where(win, z_best, zb)
        idb = jnp.where(win, ix[best], idb)
        return (zb, idb), None

    (z_img, id_img), _ = jax.lax.scan(
        giant_body, (z_img, id_img), (giant_ix, giant_ok))

    covered = z_img != jnp.inf

    # --- pass 4: per-pixel varying reconstruction from the ID image -------
    # Perspective-correct uv/world for each pixel's winning triangle, with
    # the same lambda weights (uncovered pixels compute garbage from id 0
    # and are masked by ``covered`` at the end).
    vt = tris_all[id_img]                               # (H, W, 3)
    v_clip_pix = clip[vt]                               # (H, W, 3, 4)
    lam0, lam1, lam2, _ = _lambdas(v_clip_pix, pnx_f, pny_f, 0)
    denom = lam0 + lam1 + lam2
    inv_denom = 1.0 / jnp.where(denom == 0, 1.0, denom)

    def interp_pix(attr_table):                         # (V, A) -> (H, W, A)
        a = attr_table[vt]                              # (H, W, 3, A)
        return (lam0[..., None] * a[..., 0, :]
                + lam1[..., None] * a[..., 1, :]
                + lam2[..., None] * a[..., 2, :]) * inv_denom[..., None]

    uv_img = interp_pix(uvs)
    world_img = interp_pix(world)

    color = sh.shade_fragments(displacement, uv_img[..., 0], uv_img[..., 1],
                               world_img, camera_pos)
    clear = jnp.asarray(sh.CLEAR_COLOR)
    img = jnp.where(covered[..., None], color, clear[None, None])
    return img, z_img


def render_frame(
    displacement: jnp.ndarray,
    camera: Camera,
    width: int = 300,
    height: int = 175,
    mesh_resolution: int = 128,
    num_patches: int = 4,
    samples: int = 16,
    giants: int = 512,
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
        width, height, samples, giants)
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
    samples: int = 16,
    giants: int = 512,
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
            width, height, samples, giants)[0])
    return f(jnp.asarray(displacements), jnp.asarray(view_projs),
             jnp.asarray(cam_pos))
