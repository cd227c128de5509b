"""Micro-benchmark the round-4 oct-slot visibility-resolve candidates.

Compares, at the 1200x700 default-pose demand (485K oct slots, 105K octs):
  A. current pair scheme's sort pair (2-key 3.24M sort + 3.36M compaction)
  B. oct: 9-op sort1 + XLA log-shift segmin (8 cols) + row-scatter place
  C. oct: 9-op sort1 + XLA segmin + (sk, idx) sort2 + row-gather place
plus the isolated pieces, so the winner's budget is explainable.
"""
import os, sys, glob, gzip, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/gfx_ocean_tpu/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import functools

rng = np.random.default_rng(0)
POOL = 655360          # oct pool (~0.62M: 485K demand + margin, 8192-row mult)
OCTS = 105_000         # (1200/4) * (700/2)
HW = 840_000

def dev_time(fn, args, iters=20, tag=""):
    out = fn(*args)
    jax.block_until_ready(out)
    trace_dir = f"/tmp/res_trace_{tag}"
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

# synthetic oct-slot output: oct ids skewed like a real scene (horizon pile)
oct_id = np.sort(rng.integers(0, OCTS, POOL).astype(np.int32) % OCTS)
oct_id = rng.permutation(oct_id).astype(np.int32)   # slot order is scrambled
keys8 = rng.integers(0, 1 << 32, (8, POOL), dtype=np.uint32)
oj = jnp.asarray(oct_id)
kj = [jnp.asarray(keys8[i]) for i in range(8)]

@jax.jit
def variant_b(o, *ks):
    cols = jax.lax.sort((o, *ks), num_keys=1, is_stable=False)
    so, sk = cols[0], jnp.stack(cols[1:])               # (8, P)
    n = so.shape[0]
    k = 1
    while k < n:
        same = (jnp.concatenate([so[:k], so[:-k]]) == so)[None, :]
        shifted = jnp.concatenate(
            [jnp.full((8, k), 0xFFFFFFFF, jnp.uint32), sk[:, :-k]], axis=1)
        sk = jnp.minimum(sk, jnp.where(same, shifted, jnp.uint32(0xFFFFFFFF)))
        k *= 2
    run_last = jnp.concatenate([so[1:] != so[:-1], jnp.ones((1,), bool)])
    tgt = jnp.where(run_last, so, OCTS)
    img = jnp.full((OCTS + 1, 8), 0xFFFFFFFF, jnp.uint32)
    img = img.at[tgt].set(sk.T, mode="drop")
    return img[:OCTS]

@jax.jit
def variant_c(o, *ks):
    cols = jax.lax.sort((o, *ks), num_keys=1, is_stable=False)
    so, sk = cols[0], jnp.stack(cols[1:])
    n = so.shape[0]
    k = 1
    while k < n:
        same = (jnp.concatenate([so[:k], so[:-k]]) == so)[None, :]
        shifted = jnp.concatenate(
            [jnp.full((8, k), 0xFFFFFFFF, jnp.uint32), sk[:, :-k]], axis=1)
        sk = jnp.minimum(sk, jnp.where(same, shifted, jnp.uint32(0xFFFFFFFF)))
        k *= 2
    run_last = jnp.concatenate([so[1:] != so[:-1], jnp.ones((1,), bool)])
    skey = jnp.where(run_last, so, OCTS)
    allk = jnp.concatenate([skey, jnp.arange(OCTS, dtype=jnp.int32)])
    alli = jnp.concatenate([jnp.arange(n, dtype=jnp.int32),
                            jnp.full((OCTS,), n, jnp.int32)])
    _, idx = jax.lax.sort((allk, alli), num_keys=2, is_stable=False)
    win = idx[:OCTS]
    tab = jnp.concatenate([sk.T, jnp.full((1, 8), 0xFFFFFFFF, jnp.uint32)])
    return tab[win]

# isolated pieces
sort1 = jax.jit(functools.partial(jax.lax.sort, num_keys=1, is_stable=False))
print("sort1 9op 0.64M:", f"{dev_time(sort1, ((oj, *kj),), tag='s1'):.2f} ms",
      flush=True)

tgt = jnp.asarray(np.where(rng.random(POOL) < OCTS / POOL,
                           np.sort(oct_id), OCTS).astype(np.int32))
rows = jnp.asarray(keys8.T)

@jax.jit
def scat(t, r):
    img = jnp.full((OCTS + 1, 8), 0xFFFFFFFF, jnp.uint32)
    return img.at[t].set(r, mode="drop")[:OCTS]

print("row-scatter 0.64M tgts (105K live):",
      f"{dev_time(scat, (tgt, rows), tag='sc'):.2f} ms", flush=True)

print("B (sort1+segmin+scatter):",
      f"{dev_time(variant_b, (oj, *kj), tag='b'):.2f} ms", flush=True)
print("C (sort1+segmin+sort2+gather):",
      f"{dev_time(variant_c, (oj, *kj), tag='c'):.2f} ms", flush=True)

# current scheme at the same scene: 3.24M 2-key sort + 3.36M 1-key sort
flat = jnp.asarray(rng.integers(0, HW + 1, 2 * 1_200_000 + HW).astype(np.int32))
key1 = jnp.asarray(rng.integers(0, 1 << 32, 2 * 1_200_000 + HW, dtype=np.uint32))

@jax.jit
def current(f, k):
    fs, ks = jax.lax.sort((f, k), num_keys=2, is_stable=False)
    run_first = jnp.concatenate([jnp.ones((1,), bool), fs[1:] != fs[:-1]])
    sk = jnp.where(run_first & (fs < HW), fs, HW)
    _, kimg = jax.lax.sort((sk, ks), num_keys=1, is_stable=False)
    return kimg[:HW]

print("A (current two sorts @3.36M):",
      f"{dev_time(current, (flat, key1), tag='a'):.2f} ms", flush=True)
