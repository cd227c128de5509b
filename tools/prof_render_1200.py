"""Profile the pool rasterizer at the reference's 1200x700 window.

Prints the device-pipelined wall/frame and a per-op cost breakdown from a
jax.profiler trace, with each fusion mapped back to its op_name metadata
(source expression) via the compiled HLO text.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/gfx_ocean_tpu/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import time, re, collections, gzip, json, glob
import numpy as np, jax.numpy as jnp
import gfx_ocean_tpu as ot
from gfx_ocean_tpu.render.camera import Camera, perspective
from gfx_ocean_tpu.render import raster as rr

W = int(os.environ.get("PW", 1200)); H = int(os.environ.get("PH", 700))
state = ot.ocean_state_from_assets()
disp = ot.make_step(ot.OceanConfig())(state, jnp.float32(11.25)).displacement
cam = Camera()
positions, uvs, tris = rr._mesh_constants(128, 4)
interp = rr._interp_matrices(128, 512)
vp = jnp.asarray((perspective(W / H) @ cam.view()).astype(np.float32))
cp = jnp.asarray(cam.position.astype(np.float32))
pool = rr._auto_pool(W, H)
gs = (4, 128)
print(f"viewport {W}x{H}, pool {pool}", flush=True)

args = (disp, positions, uvs, tris, vp, cp)
kw = dict(width=W, height=H, pool=pool, giants=512)

lowered = rr._rasterize_pool.lower(*args, **kw, interp=interp, grid_shape=gs)
compiled = lowered.compile()
hlo = compiled.as_text()
img, z = rr._rasterize_pool(*args, **kw, interp=interp, grid_shape=gs)
np.asarray(img)
print("compiled", flush=True)
for trial in range(3):
    t0 = time.perf_counter(); n = 20
    for i in range(n):
        img, z = rr._rasterize_pool(*args, **kw, interp=interp, grid_shape=gs)
    jax.block_until_ready(img)
    np.asarray(img[0, 0])
    print(f"wall/frame: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)

trace_dir = "/tmp/raster_trace_1200"
os.system(f"rm -rf {trace_dir}")
frames = 10
with jax.profiler.trace(trace_dir):
    for i in range(frames):
        img, z = rr._rasterize_pool(*args, **kw, interp=interp, grid_shape=gs)
    jax.block_until_ready(img)
    np.asarray(img[0, 0])
print("trace done", flush=True)

meta = {}
for m in re.finditer(r'%(\S+?) = \S+ (\w+)\(.*?metadata=\{op_name="([^"]*)"'
                     r'(?: source_file="[^"]*" source_line=(\d+))?', hlo):
    meta[m.group(1)] = (m.group(3), m.group(4))
paths = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
data = json.load(gzip.open(sorted(paths)[-1]))
names = {}
for e in data["traceEvents"]:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
by_op = collections.Counter()
for e in data["traceEvents"]:
    if e.get("ph") == "X" and "dur" in e and "TPU" in names.get(e.get("pid"), ""):
        by_op[e["name"]] += e["dur"]
tot = 0.0
for k, v in by_op.most_common(60):
    if k.startswith("jit_"):
        continue
    om, line = meta.get(k, ("?", None))
    tot += v
    print(f"{v/1e3/frames:8.2f} ms  {k:32s} {om[:90]} L{line}")
print(f"accounted {tot/1e3/frames:.1f} ms/frame")
