"""Map the fused 1200x700 frame's hot device ops to source lines.

Dumps the compiled HLO (with op_name/source metadata) for the fused
renderer, runs a 10-frame profiler trace, and joins the two: each hot
op prints its XLA name, total device ms/frame, the op_name metadata
(jit scope path), and the python source line that emitted it.
"""
import os, sys, time, glob, gzip, json, collections, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/gfx_ocean_tpu/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
import gfx_ocean_tpu as ot
from gfx_ocean_tpu.render.camera import Camera, perspective
from gfx_ocean_tpu.render.raster import make_frame_renderer

W = int(os.environ.get("PW", 1200)); H = int(os.environ.get("PH", 700))
st = ot.ocean_state_from_assets()
fr = make_frame_renderer(ot.OceanConfig(), width=W, height=H)
vp = jnp.asarray((perspective(W / H) @ Camera().view()).astype(np.float32))
cp = jnp.asarray(Camera().position.astype(np.float32))

lowered = fr.lower(st, jnp.float32(11.25), vp, cp)
hlo = lowered.compile().as_text()
with open("/tmp/raster_hlo.txt", "w") as f:
    f.write(hlo)
print(f"hlo bytes: {len(hlo)}", flush=True)

meta = {}
for m in re.finditer(
        r'%?(\S+?) = \S+ \w+\(.*?metadata=\{op_name="([^"]*)"'
        r'(?: source_file="([^"]*)" source_line=(\d+))?', hlo):
    meta[m.group(1)] = (m.group(2), m.group(3), m.group(4))
print(f"meta entries: {len(meta)}", flush=True)

out = fr(st, jnp.float32(11.25), vp, cp)
np.asarray(out).reshape(-1)[:1]
print("compiled", flush=True)

trace_dir = "/tmp/fused_trace"
os.system(f"rm -rf {trace_dir}")
frames = 10
with jax.profiler.trace(trace_dir):
    for _ in range(frames):
        out = fr(st, jnp.float32(11.25), vp, cp)
    jax.block_until_ready(out)
    np.asarray(out).reshape(-1)[:1]
paths = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
data = json.load(gzip.open(sorted(paths)[-1]))
names = {}
for e in data["traceEvents"]:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
by_op = collections.Counter()
for e in data["traceEvents"]:
    if (e.get("ph") == "X" and "dur" in e
            and "TPU" in names.get(e.get("pid"), "")
            and not e["name"].startswith("jit_")):
        by_op[e["name"]] += e["dur"]
tot = sum(by_op.values())
print(f"device total {tot/1e3/frames:.1f} ms/frame", flush=True)
for k, v in by_op.most_common(40):
    om, sf, sl = meta.get(k, ("?", None, None))
    src = f"{os.path.basename(sf)}:{sl}" if sf else ""
    print(f"{v/1e3/frames:8.2f} ms  {k:22s} {src:26s} {om[:110]}")
