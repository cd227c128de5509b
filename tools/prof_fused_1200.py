"""Device-pipelined fused step->render->sRGB frame at the reference's
1200x700 window (docs/BENCH.md config 8's fused_1200x700_device_ms) —
the round-4 target metric, isolated for fast iteration."""
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
out = fr(st, jnp.float32(11.25), vp, cp)
np.asarray(out).reshape(-1)[:1]
print("compiled", flush=True)
for trial in range(4):
    t0 = time.perf_counter(); depth = 25
    for _ in range(depth):
        out = fr(st, jnp.float32(11.25), vp, cp)
    jax.block_until_ready(out)
    np.asarray(out).reshape(-1)[:1]
    print(f"fused {W}x{H} device-pipelined: "
          f"{(time.perf_counter()-t0)/depth*1e3:.1f} ms", flush=True)

if os.environ.get("TRACE"):
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
    nops = 0
    for e in data["traceEvents"]:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in names.get(e.get("pid"), "")
                and not e["name"].startswith("jit_")):
            by_op[e["name"]] += e["dur"]
            nops += 1
    tot = sum(by_op.values())
    print(f"device total {tot/1e3/frames:.1f} ms/frame over "
          f"{nops//frames} ops", flush=True)
    for k, v in by_op.most_common(25):
        print(f"{v/1e3/frames:8.2f} ms  {k}")
