"""Microbenchmarks for the rasterizer's candidate visibility primitives.

Measures, on the real chip, the throughput of every primitive the
round-3 visibility redesign could be built from:
  - scatter-min of u32 keys (the current z-buffer resolve),
  - windowed scatter-min (one update = a 2- or 4-lane row),
  - plain overwrite scatter,
  - multi-operand lax.sort at slot-pixel scales,
  - wide packed table-row gathers (deferred-pass candidates).
Each op runs in its own jit with a forcing transfer; times are medians
of repeats of a scan-free loop (dispatch-pipelined, per-op amortized).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/gfx_ocean_tpu/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import time
import numpy as np
import jax.numpy as jnp
import functools


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).reshape(-1)[0]
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:1]
        best.append((time.perf_counter() - t0) / reps * 1e3)
    return min(best)


rng = np.random.default_rng(0)
M = 840_000          # pixels at 1200x700

print("== scatter-min u32 (current resolve) ==", flush=True)
for n in (1_000_000, 2_000_000, 4_000_000):
    idx = jnp.asarray(rng.integers(0, M + 1, n), jnp.int32)
    val = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))

    @jax.jit
    def scat(idx, val):
        buf = jnp.full((M + 1,), jnp.uint32(0xFFFFFFFF))
        return buf.at[idx].min(val)

    t = timeit(scat, idx, val)
    print(f"  n={n/1e6:.1f}M: {t:6.2f} ms  ({t/n*1e6:.2f} ns/update)", flush=True)

print("== windowed scatter-min: one update = one W-lane row ==", flush=True)
for w in (2, 4, 8):
    n = 1_000_000
    idx = jnp.asarray(rng.integers(0, M // w, n), jnp.int32)
    val = jnp.asarray(rng.integers(0, 2**32, (n, w), dtype=np.uint32))

    @functools.partial(jax.jit, static_argnames=("w",))
    def scatw(idx, val, w=w):
        buf = jnp.full((M // w + 1, w), jnp.uint32(0xFFFFFFFF))
        return buf.at[idx].min(val)

    t = timeit(scatw, idx, val)
    print(f"  w={w} n=1.0M rows: {t:6.2f} ms  ({t/n*1e6:.2f} ns/row)", flush=True)

print("== plain overwrite scatter u32 ==", flush=True)
n = 2_000_000
idx = jnp.asarray(rng.integers(0, M + 1, n), jnp.int32)
val = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))

@jax.jit
def scat_set(idx, val):
    buf = jnp.full((M + 1,), jnp.uint32(0xFFFFFFFF))
    return buf.at[idx].set(val, mode="drop")

t = timeit(scat_set, idx, val)
print(f"  n=2.0M: {t:6.2f} ms ({t/n*1e6:.2f} ns/update)", flush=True)

print("== lax.sort (stable) ==", flush=True)
for n, ops in ((1_700_000, 2), (3_400_000, 2), (1_700_000, 3), (5_000_000, 2)):
    keys = jnp.asarray(rng.integers(0, M, n), jnp.int32)
    pays = [jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
            for _ in range(ops - 1)]

    @jax.jit
    def dosort(keys, *pays):
        return jax.lax.sort((keys, *pays), num_keys=1)

    t = timeit(dosort, keys, *pays)
    print(f"  n={n/1e6:.1f}M x{ops} ops: {t:6.2f} ms", flush=True)

print("== 2-key sort (pixel, key) ==", flush=True)
n = 3_400_000
keys = jnp.asarray(rng.integers(0, M, n), jnp.int32)
k2 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))

@jax.jit
def dosort2(keys, k2):
    return jax.lax.sort((keys, k2), num_keys=2)

t = timeit(dosort2, keys, k2)
print(f"  n=3.4M 2-key: {t:6.2f} ms", flush=True)

print("== packed table-row gathers (deferred pass) ==", flush=True)
T = 129_032
for cols, npix in ((16, M), (28, M), (32, M)):
    tab = jnp.asarray(rng.standard_normal((T, cols)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, T, npix), jnp.int32)

    @jax.jit
    def gat(tab, ids):
        return tab[ids]

    t = timeit(gat, tab, ids)
    print(f"  ({T},{cols}) f32 rows x {npix/1e6:.2f}M: {t:6.2f} ms", flush=True)

print("== cumsum forms at 4.2M i32 ==", flush=True)
x = jnp.asarray(rng.integers(0, 3, 4_200_000), jnp.int32)
from gfx_ocean_tpu.render.raster import _prefix_sum_mxu
t = timeit(jax.jit(jnp.cumsum), x)
print(f"  jnp.cumsum:      {t:6.2f} ms", flush=True)
t = timeit(jax.jit(_prefix_sum_mxu), x)
print(f"  _prefix_sum_mxu: {t:6.2f} ms", flush=True)
