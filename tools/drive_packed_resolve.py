"""TPU drive for the packed-resolve change (raster.py _zq_pack_rows).

1. tiny-jit tunnel probe,
2. 512^2 step vs the float64 golden (default fused bf16x3 path:
   expect rel L-inf ~7.9e-6, the recorded headline accuracy),
3. fused 480x280 frame rendered on the REAL TPU vs the same renderer
   on CPU (interpret-mode Pallas): the packed sort payload must leave
   coverage tie-band-bounded (CLAUDE.md: ~1/840K px flip budget on
   hardware; scale to the 134K-px viewport).
"""
import os, subprocess, sys, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/gfx_ocean_tpu/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

t0 = time.perf_counter()
probe = np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8, 8), jnp.float32)))
print(f"probe ok in {time.perf_counter() - t0:.1f}s "
      f"backend={jax.default_backend()}", flush=True)

import gfx_ocean_tpu as ot
from gfx_ocean_tpu.golden.reference import golden_fields
from gfx_ocean_tpu.utils.complexpair import from_pair_np
from gfx_ocean_tpu.render.camera import Camera, perspective
from gfx_ocean_tpu.render.raster import make_frame_renderer

state = ot.ocean_state_from_assets()
out = ot.make_step(ot.OceanConfig())(state, jnp.float32(11.25))
disp = np.asarray(out.displacement)
want = golden_fields(from_pair_np(np.asarray(state.h0)),
                     np.asarray(state.omega), 11.25, 1000.0,
                     ot.OceanConfig().compat)
rel = np.abs(disp - want).max() / np.abs(want).max()
print(f"step rel Linf vs golden: {rel:.2e}", flush=True)
assert rel < 2e-5, rel

W, H = 480, 280
fr = make_frame_renderer(ot.OceanConfig(), width=W, height=H)
vp = jnp.asarray((perspective(W / H) @ Camera().view()).astype(np.float32))
cp = jnp.asarray(Camera().position.astype(np.float32))
tpu_img = np.asarray(fr(state, jnp.float32(11.25), vp, cp))
print("tpu frame done", flush=True)

# CPU render in a subprocess (JAX_PLATFORMS must be set before import).
code = f"""
import os, sys, numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import gfx_ocean_tpu as ot
from gfx_ocean_tpu.render.camera import Camera, perspective
from gfx_ocean_tpu.render.raster import make_frame_renderer
state = ot.ocean_state_from_assets()
fr = make_frame_renderer(ot.OceanConfig(), width={W}, height={H})
vp = jnp.asarray((perspective({W} / {H}) @ Camera().view()).astype(np.float32))
cp = jnp.asarray(Camera().position.astype(np.float32))
np.save("/tmp/cpu_frame.npy", np.asarray(fr(state, jnp.float32(11.25), vp, cp)))
print("cpu frame done", flush=True)
"""
subprocess.run([sys.executable, "-c", code], check=True)
cpu_img = np.load("/tmp/cpu_frame.npy")

diff = (tpu_img.astype(np.int32) - cpu_img.astype(np.int32))
ndiff_px = int((np.abs(diff).max(axis=-1) > 0).sum())
big_px = int((np.abs(diff).max(axis=-1) > 8).sum())
print(f"tpu-vs-cpu 480x280: {ndiff_px}/{W*H} px differ, "
      f"{big_px} differ by >8 LSB, max |d|={np.abs(diff).max()}", flush=True)
# shading-precision wiggle is fine; coverage flips (a wrong winner ->
# big color jump) must stay in the tie-band budget.
assert big_px <= 4, big_px
print("DRIVE OK", flush=True)
