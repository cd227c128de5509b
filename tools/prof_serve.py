import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/gfx_ocean_tpu/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import time, numpy as np, jax.numpy as jnp
import gfx_ocean_tpu as ot
from gfx_ocean_tpu.render.camera import Camera, perspective
from gfx_ocean_tpu.render.raster import make_frame_renderer

W = int(os.environ.get("PW", 480)); H = int(os.environ.get("PH", 280))
state = ot.ocean_state_from_assets()
cfg = ot.OceanConfig()
fr = make_frame_renderer(cfg, width=W, height=H)
cam = Camera()
vp = jnp.asarray((perspective(W/H) @ cam.view()).astype(np.float32))
cp = jnp.asarray(cam.position.astype(np.float32))
img = fr(state, jnp.float32(0.0), vp, cp); np.asarray(img)
print(f"compiled {W}x{H}", flush=True)
# device-pipelined (dispatch overlap)
for _ in range(3):
    t0 = time.perf_counter(); n = 20
    for i in range(n):
        img = fr(state, jnp.float32(i * 0.016), vp, cp)
    jax.block_until_ready(img)
    print(f"pipelined wall/frame: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)
# serial with transfer (what one HTTP request pays)
for _ in range(2):
    t0 = time.perf_counter(); n = 10
    for i in range(n):
        np.asarray(fr(state, jnp.float32(i * 0.016), vp, cp))
    print(f"serial+transfer wall/frame: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)
