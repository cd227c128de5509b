#!/usr/bin/env python
"""Scene statistics for the binned visibility resolve design (round 4).

Computes, on CPU from the real default-pose scene (512^2 step, 128^2 x 4
mesh, 1200x700 and fuzz poses), the input sizes the tile-binned resolve
would see: live triangles, pair-slot demand (the current sort size),
(tile_h x tile_w) incidence counts, and per-tile candidate skew. These
decide tile geometry and pool sizes before any kernel is written.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import gfx_ocean_tpu as ot
    from gfx_ocean_tpu.render.camera import Camera, perspective
    from gfx_ocean_tpu.render.raster import _mesh_constants, _vertex_stage

    w, h = 1200, 700
    cfg = ot.OceanConfig(compute_normals=False)
    state = ot.ocean_state_from_assets()
    disp = np.asarray(ot.make_step(cfg)(state, jnp.float32(11.25)).displacement)
    positions, uvs, tris = _mesh_constants(128, 4)

    def stats(cam, label):
        proj = perspective(w / h)
        vp = jnp.asarray((proj @ cam.view()).astype(np.float32))
        _, clip = _vertex_stage(jnp.asarray(disp), positions, uvs, vp)
        clip = np.asarray(clip)
        v = clip[np.asarray(tris)]                      # (T, 3, 4)
        wc = v[..., 3]
        fully_front = np.all(wc > 1e-6, axis=-1)
        out = (np.all(v[..., 0] < -wc, -1) | np.all(v[..., 0] > wc, -1)
               | np.all(v[..., 1] < -wc, -1) | np.all(v[..., 1] > wc, -1)
               | np.all(v[..., 2] < -wc, -1) | np.all(v[..., 2] > wc, -1))
        ws = np.where(fully_front[:, None], wc, 1.0)
        sx = (v[..., 0] / ws * 0.5 + 0.5) * w
        sy = (v[..., 1] / ws * 0.5 + 0.5) * h
        x0 = np.maximum(np.ceil(sx.min(-1) - 0.5), 0.0)
        x1 = np.minimum(np.floor(sx.max(-1) - 0.5), w - 1.0)
        y0 = np.maximum(np.ceil(sy.min(-1) - 0.5), 0.0)
        y1 = np.minimum(np.floor(sy.max(-1) - 0.5), h - 1.0)
        bw = np.maximum(x1 - x0 + 1, 0)
        bh = np.maximum(y1 - y0 + 1, 0)
        live = fully_front & ~out & (bw > 0) & (bh > 0)
        bw, bh, x0, y0 = bw[live], bh[live], x0[live], y0[live]
        pair_slots = (np.ceil(bw / 2) * bh).sum()
        print(f"--- {label}")
        print(f"T={len(live)} live={live.sum()} crossing={np.sum(np.any(wc>1e-6,-1)&~fully_front&~out)}")
        print(f"pair_slots={pair_slots:.0f}  (current sort1 n = {2*pair_slots + w*h:.0f})")
        print(f"bw: mean={bw.mean():.2f} p50={np.median(bw):.0f} p99={np.percentile(bw,99):.0f} max={bw.max():.0f}")
        print(f"bh: mean={bh.mean():.2f} p50={np.median(bh):.0f} p99={np.percentile(bh,99):.0f} max={bh.max():.0f} sum={bh.sum():.0f}")
        for th, tw in ((1, 128), (8, 128), (4, 128), (16, 128), (8, 256)):
            ty0 = np.floor(y0 / th)
            ty1 = np.floor((y0 + bh - 1) / th)
            tx0 = np.floor(x0 / tw)
            tx1 = np.floor((x0 + bw - 1) / tw)
            inc = ((ty1 - ty0 + 1) * (tx1 - tx0 + 1)).astype(np.int64)
            total = inc.sum()
            # per-tile candidate histogram
            ntx = -(-w // tw)
            nty = -(-h // th)
            counts = np.zeros(ntx * nty, np.int64)
            # expand (small enough at these totals)
            for t in range(len(inc)):
                for yy in range(int(ty0[t]), int(ty1[t]) + 1):
                    for xx in range(int(tx0[t]), int(tx1[t]) + 1):
                        counts[yy * ntx + xx] += 1
            nz = counts[counts > 0]
            print(f"tile {th}x{tw}: incidences={total} tiles={ntx*nty} "
                  f"nonempty={len(nz)} per-tile max={nz.max()} "
                  f"p99={np.percentile(nz,99):.0f} p90={np.percentile(nz,90):.0f} "
                  f"mean={nz.mean():.1f}")

    stats(Camera(), "default pose")
    # adversarial-ish poses: lower camera (horizon high in frame), yawed
    c2 = Camera()
    c2.position = np.array([-8.0, 10.0, 120.0], np.float32)
    stats(c2, "low camera y=10")
    c3 = Camera()
    c3.rotation = np.array([-0.15, -1.5, 0.0], np.float32)
    stats(c3, "grazing pitch -0.15")


if __name__ == "__main__":
    main()
