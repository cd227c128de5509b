"""A/B the oct visibility sort forms at the real 1200x700 frame shapes.

The round-4 resolve sorts ONE entry per oct slot with the 8 quantized-z
key columns riding as payload operands (9-operand sort, measured ~3.0 ms
of the 13.7 ms fused frame). Sort cost scales ~32% per extra operand
column, while table-row gather cost is per-ROW and invariant to index
coherence (round-3b micros) — so sorting only (oct id, row iota) and
gathering the 8 key columns afterwards through the sorted iota may be
cheaper. Variants:

  a. 9-op sort (current form)
  b. 2-op sort + (pool, 8) row-table gather of the key columns
     (the sentinel rows collapse to ONE pad row: gather at min(i, pool))
  c. 2-op sort + 8 separate 1-D fancy-index gathers (form control)
  t. the (8, pool) -> (pool, 8) transpose alone (b's layout tax)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/gfx_ocean_tpu/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

POOL = 630784            # slot pool at 1200x700 (prof_fused_1200 log)
N_OCT = 300 * 350        # oct grid at 1200x700
KEY_MAX = jnp.uint32(0xFFFFFFFF)

rng = np.random.default_rng(0)
octid_np = np.sort(rng.integers(0, N_OCT, size=POOL)).astype(np.int32)
rng.shuffle(octid_np)    # realistic: segment-ordered-ish but scrambled
keys_np = rng.integers(0, 2**32, size=(8, POOL), dtype=np.uint64).astype(np.uint32)

octid = jnp.asarray(octid_np)
keys8 = jnp.asarray(keys_np)
bg = jnp.arange(N_OCT, dtype=jnp.int32)
kmax = jnp.full((N_OCT,), KEY_MAX, jnp.uint32)


@jax.jit
def form_a(octid, keys8):
    cols = jax.lax.sort(
        (jnp.concatenate([octid, bg]),
         *[jnp.concatenate([keys8[i], kmax]) for i in range(8)]),
        num_keys=1, is_stable=False)
    return cols[0], jnp.stack(cols[1:])


@jax.jit
def form_b(octid, keys8):
    n_res = POOL + N_OCT
    so, si = jax.lax.sort(
        (jnp.concatenate([octid, bg]), jnp.arange(n_res, dtype=jnp.int32)),
        num_keys=1, is_stable=False)
    tab = jnp.concatenate(
        [keys8.T, jnp.full((1, 8), KEY_MAX, jnp.uint32)], axis=0)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(0,), start_index_map=(0,))
    sk = jax.lax.gather(tab, jnp.minimum(si, POOL)[..., None], dn,
                        slice_sizes=(1, 8))
    return so, sk


@jax.jit
def form_c(octid, keys8):
    n_res = POOL + N_OCT
    so, si = jax.lax.sort(
        (jnp.concatenate([octid, bg]), jnp.arange(n_res, dtype=jnp.int32)),
        num_keys=1, is_stable=False)
    kp = jnp.concatenate([keys8, jnp.full((8, 1), KEY_MAX, jnp.uint32)],
                         axis=1)
    sic = jnp.minimum(si, POOL)
    return so, jnp.stack([kp[i][sic] for i in range(8)])


@jax.jit
def form_t(keys8):
    return jnp.concatenate(
        [keys8.T, jnp.full((1, 8), KEY_MAX, jnp.uint32)], axis=0)


def checksummed(fn):
    # Reduce to ONE uint32 scalar inside jit: the timed transfer is 4
    # bytes, not the 3 MB output (tunnel ~30 MB/s would drown compute).
    @jax.jit
    def run(*args):
        out = fn(*args)
        acc = jnp.uint32(0)
        for leaf in jax.tree.leaves(out):
            acc = acc + jnp.sum(leaf.astype(jnp.uint32))
        return acc
    return run


def bench(name, fn, *args):
    run = checksummed(fn)
    np.asarray(run(*args))          # warm compile + one real transfer
    reps, depth = 5, 20
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(depth):
            s = run(*args)
        np.asarray(s)               # scalar transfer forces completion
        best = min(best, (time.perf_counter() - t0) / depth * 1e3)
    print(f"{name}: {best:.2f} ms", flush=True)


print(f"pool={POOL} n_oct={N_OCT} n_res={POOL + N_OCT}", flush=True)
bench("a 9-op sort          ", form_a, octid, keys8)
bench("b 2-op sort + rowgath", form_b, octid, keys8)
bench("c 2-op sort + 8 1-D  ", form_c, octid, keys8)
bench("t transpose alone    ", form_t, keys8)
oa = form_a(octid, keys8)
ob = form_b(octid, keys8)

# equality of the multiset per run: component-min over runs must agree.
# (sort is not stable, so rows differ; compare sorted-within-run copies)
sa_o, sa_k = map(np.asarray, oa)
sb_o, sb_k = map(np.asarray, ob)
assert (sa_o == sb_o).all()
# verify same multiset of key-rows per oct id via lexicographic sort
def canon(o, k):
    idx = np.lexsort((k[7], k[6], k[5], k[4], k[3], k[2], k[1], k[0], o))
    return k[:, idx]
assert (canon(sa_o, sa_k) == canon(sb_o, sb_k)).all()
print("b multiset-equal to a: OK", flush=True)
