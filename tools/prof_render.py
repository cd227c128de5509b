import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/gfx_ocean_tpu/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import time, numpy as np, jax.numpy as jnp
import gfx_ocean_tpu as ot
from gfx_ocean_tpu.render.camera import Camera, perspective
from gfx_ocean_tpu.render import raster as rr

state = ot.ocean_state_from_assets()
disp = ot.make_step(ot.OceanConfig())(state, jnp.float32(11.25)).displacement
cam = Camera(); W, H = 480, 280
positions, uvs, tris = rr._mesh_constants(128, 4)
interp = rr._interp_matrices(128, 512)
vp = jnp.asarray((perspective(W / H) @ cam.view()).astype(np.float32))
cp = jnp.asarray(cam.position.astype(np.float32))
pool = rr._auto_pool(W, H)
gs = (4, 128)

img, z = rr._rasterize_pool(disp, positions, uvs, tris, vp, cp, W, H, pool, 512, interp, gs)
np.asarray(img)
print("compiled", flush=True)
for trial in range(3):
    t0 = time.perf_counter(); n = 20
    for i in range(n):
        img, z = rr._rasterize_pool(disp, positions, uvs, tris, vp, cp, W, H, pool, 512, interp, gs)
    jax.block_until_ready(img)
    print(f"wall/frame: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)
with jax.profiler.trace("/tmp/raster_trace2"):
    for i in range(10):
        img, z = rr._rasterize_pool(disp, positions, uvs, tris, vp, cp, W, H, pool, 512, interp, gs)
    jax.block_until_ready(img)
    np.asarray(img)
print("trace done", flush=True)
