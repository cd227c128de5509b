import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax, jax.numpy as jnp
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
txt = rr._rasterize_pool.lower(disp, positions, uvs, tris, vp, cp, W, H, pool, 512, interp, (4, 128)).compile().as_text()
open("/tmp/raster_hlo.txt", "w").write(txt)
print(len(txt))
