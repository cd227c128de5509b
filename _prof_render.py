import time, numpy as np, jax, jax.numpy as jnp
import gfx_ocean_tpu as ot
from gfx_ocean_tpu.render.camera import Camera, perspective
from gfx_ocean_tpu.render import raster as rr

state = ot.ocean_state_from_assets()
cfg = ot.OceanConfig()
step = ot.make_step(cfg)
disp = step(state, jnp.float32(11.25)).displacement
cam = Camera()
W, H = 480, 280
positions, uvs, tris = rr._mesh_constants(128, 4)
vp = jnp.asarray((perspective(W / H) @ cam.view()).astype(np.float32))
cp = jnp.asarray(cam.position.astype(np.float32))
pool = rr._auto_pool(W, H)

img, z = rr._rasterize_pool(disp, positions, uvs, tris, vp, cp, W, H, pool, 512)
np.asarray(img)  # compile + sanity

# wall timing
for trial in range(3):
    t0 = time.perf_counter()
    n = 20
    for i in range(n):
        img, z = rr._rasterize_pool(disp, positions, uvs, tris, vp, cp, W, H, pool, 512)
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / n
    print(f"wall/frame: {dt*1e3:.1f} ms")

with jax.profiler.trace("/tmp/raster_trace"):
    for i in range(10):
        img, z = rr._rasterize_pool(disp, positions, uvs, tris, vp, cp, W, H, pool, 512)
    jax.block_until_ready(img)
    np.asarray(img)
print("trace done")
