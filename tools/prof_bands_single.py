"""Measure single-chip BAND-SPLIT rasterization at 1200x700.

The multi-chip band path (parallel/render.py) wins because the two
visibility sorts are n log n in per-band hit count. This experiment asks
whether the same split pays on ONE chip: D sequential band dispatches
(one executable — y_origin is traced) whose sorts each run at n/D scale.
Per docs/DESIGN.md the measured sort scaling (2.69 ns @840K vs 3.57 ns
@3.36M) caps the win at ~25% of sort time, against D x the T-sized
triangle-setup overhead — this measures the actual net.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/gfx_ocean_tpu/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import time
import numpy as np, jax.numpy as jnp
import gfx_ocean_tpu as ot
from gfx_ocean_tpu.render.camera import Camera, perspective
from gfx_ocean_tpu.render import raster as rr

W, H = 1200, 700
state = ot.ocean_state_from_assets()
disp = ot.make_step(ot.OceanConfig())(state, jnp.float32(11.25)).displacement
cam = Camera()
positions, uvs, tris = rr._mesh_constants(128, 4)
interp = rr._interp_matrices(128, 512)
vp = jnp.asarray((perspective(W / H) @ cam.view()).astype(np.float32))
cp = jnp.asarray(cam.position.astype(np.float32))
gs = (4, 128)
args = (disp, positions, uvs, tris, vp, cp)

# Full-frame baseline.
pool_full = rr._auto_pool(W, H)
kw = dict(width=W, height=H, pool=pool_full, giants=512)
img, _ = rr._rasterize_pool(*args, **kw, interp=interp, grid_shape=gs)
np.asarray(img)
for trial in range(3):
    t0 = time.perf_counter(); n = 20
    for _ in range(n):
        img, _ = rr._rasterize_pool(*args, **kw, interp=interp, grid_shape=gs)
    np.asarray(img[0, 0])
    print(f"full frame: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)
ref_img = np.asarray(img)

for D in (2, 4):
    bh = H // D
    pool_band = rr._auto_pool(W, bh, D)
    kwb = dict(width=W, height=bh, pool=pool_band, giants=512)
    origins = [jnp.int32(i * bh) for i in range(D)]
    outs = [rr._rasterize_pool(*args, **kwb, interp=interp, grid_shape=gs,
                               y_origin=o, full_height=H)[0] for o in origins]
    np.asarray(outs[-1])
    # bit-equality vs the full frame
    got = np.concatenate([np.asarray(o) for o in outs], axis=0)
    eq = np.array_equal(got, ref_img)
    print(f"D={D}: band pool {pool_band} (full {pool_full}), bit-equal={eq}",
          flush=True)
    for trial in range(3):
        t0 = time.perf_counter(); n = 20
        for _ in range(n):
            outs = [rr._rasterize_pool(*args, **kwb, interp=interp,
                                       grid_shape=gs, y_origin=o,
                                       full_height=H)[0] for o in origins]
        np.asarray(outs[-1][0, 0])
        print(f"D={D} bands: {(time.perf_counter()-t0)/n*1e3:.2f} ms/frame",
              flush=True)
