"""Cost model for lax.sort / segmented-min alternatives on the TPU.

Measures device time (profiler, not wall) for:
  - lax.sort at n in {0.84M, 1.26M, 2.1M, 3.36M} x operands in {2, 3, 5}
    (num_keys=1 with payloads, and the 2-key form the rasterizer uses)
  - log-shift segmented min over a sorted (n,) u32 column (22 passes)

These decide the visibility-resolve restructuring (round 4): quad slots
shrink the sort element count 2-3x but widen entries to 5 operands and
need a segmented component-wise min instead of the run-first trick.
"""
import os, sys, time, re, collections, gzip, json, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/gfx_ocean_tpu/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import functools

rng = np.random.default_rng(0)

def dev_time(fn, args, iters=20, tag=""):
    out = fn(*args)
    jax.block_until_ready(out)
    trace_dir = f"/tmp/sort_trace_{tag}"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    paths = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    data = json.load(gzip.open(sorted(paths)[-1]))
    names = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    tot = 0.0
    for e in data["traceEvents"]:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in names.get(e.get("pid"), "")
                and not e["name"].startswith("jit_")):
            tot += e["dur"]
    return tot / 1e3 / iters


def mk(n, ops):
    cols = [jnp.asarray(rng.integers(0, 1 << 20, n, dtype=np.uint32))]
    for _ in range(ops - 1):
        cols.append(jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32)))
    return tuple(cols)


for n in (840_000, 1_260_000, 2_100_000, 3_360_000):
    for ops in (2, 3, 5):
        for nk in (1, 2) if ops == 2 else (1,):
            cols = mk(n, ops)
            f = jax.jit(functools.partial(jax.lax.sort, num_keys=nk,
                                          is_stable=False))
            ms = dev_time(f, (cols,), tag=f"{n}_{ops}_{nk}")
            print(f"sort n={n/1e6:.2f}M ops={ops} keys={nk}: {ms:7.2f} ms "
                  f"({ms*1e6/n:.2f} ns/elem)", flush=True)

# segmented min: sorted segment ids (avg run ~3), 4 value columns
for n in (1_260_000, 2_100_000):
    seg = np.sort(rng.integers(0, n // 3, n)).astype(np.uint32)
    vals = rng.integers(0, 1 << 32, (4, n), dtype=np.uint32)
    segj = jnp.asarray(seg)
    valj = jnp.asarray(vals)

    @jax.jit
    def segmin(seg, v):
        # Hillis-Steele log-shift prefix-min with segment reset.
        k = 1
        while k < n:  # static unroll, log2(n) passes
            seg_s = jnp.concatenate([seg[:k], seg[:-k]])
            v_s = jnp.concatenate([jnp.full((4, k), 0xFFFFFFFF, jnp.uint32),
                                   v[:, :-k]], axis=1)
            same = (seg_s == seg)[None, :]
            v = jnp.minimum(v, jnp.where(same, v_s, jnp.uint32(0xFFFFFFFF)))
            k *= 2
        return v

    ms = dev_time(segmin, (segj, valj), iters=5, tag=f"segmin_{n}")
    print(f"segmin n={n/1e6:.2f}M 4cols ({int(np.log2(n))+1} passes): "
          f"{ms:7.2f} ms", flush=True)
