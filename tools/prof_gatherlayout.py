"""A/B the transposed-row-gather layout tax at the fused frame's shapes.

The 1200x700 fused frame pays ~1.6 ms/frame in XLA `copy` ops that
transpose row-gather results into plane-major layout (profile:
tools/prof_fused_map.py):

  ctab  (129K, 19) u32 @ 630K 1-D monotonic idx -> (19, P)    copy 0.43
  dtab  (129K, 30) f32 @ (700,1200) image idx   -> (30, H, W) copy 0.57
  tap   (131K, 8)  u32 @ (700,1200) image idx, gather+moveaxis copy 0.57

Forms: (a) transposed gather (offset_dims=(0,), current for ctab/dtab),
(b) idx reshaped 2-D before the same gather (1-D sites only),
(c) plain row gather + explicit transpose (current for tap),
(d) plain row gather, NO transpose (floor: what the gather alone costs).
All timed via in-jit uint32 checksums (4-byte transfers).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/gfx_ocean_tpu/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
T, P, H, W = 129032, 630784, 700, 1200

dn = jax.lax.GatherDimensionNumbers(
    offset_dims=(0,), collapsed_slice_dims=(0,), start_index_map=(0,))


def gat_t(tab, idx):
    return jax.lax.gather(tab, idx[..., None], dn,
                          slice_sizes=(1, tab.shape[1]))


LOOP = 50


def bench(name, fn, tab, idx):
    # Repeat INSIDE one jit (the ~3 ms tunnel dispatch floor swamps
    # sub-ms deltas otherwise); perturb the indices per iteration so the
    # gather can't be hoisted out of the loop.
    nrow = tab.shape[0]

    def body(k, acc):
        out = fn(tab, (idx + k) % nrow)
        for l in jax.tree.leaves(out):
            if l.dtype != jnp.uint32:
                l = jax.lax.bitcast_convert_type(l, jnp.uint32)
            acc = acc + jnp.sum(l)
        return acc

    run = jax.jit(lambda t, i: jax.lax.fori_loop(0, LOOP, body, jnp.uint32(0)))
    np.asarray(run(tab, idx))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        s = run(tab, idx)
        np.asarray(s)
        best = min(best, (time.perf_counter() - t0) / LOOP * 1e3)
    print(f"{name}: {best:.2f} ms", flush=True)


# --- ctab site: 1-D monotonic idx, u32 19 cols ---
ctab = jnp.asarray(rng.integers(0, 2**32, (T, 19), np.uint64).astype(np.uint32))
ci = jnp.asarray(np.sort(rng.integers(0, T, P)).astype(np.int32))
bench("ctab a tgather 1-D      ", lambda t, i: gat_t(t, i), ctab, ci)
bench("ctab b tgather idx 2-D  ",
      lambda t, i: gat_t(t, i.reshape(1232, 512)).reshape(19, P), ctab, ci)
bench("ctab c gather+transpose ",
      lambda t, i: t[i].T, ctab, ci)
bench("ctab d gather only      ", lambda t, i: t[i], ctab, ci)

# --- dtab site: image idx, f32 30 cols ---
dtab = jnp.asarray(rng.standard_normal((T, 30)).astype(np.float32))
di = jnp.asarray(rng.integers(0, T, (H, W)).astype(np.int32))
bench("dtab a tgather image    ", lambda t, i: gat_t(t, i), dtab, di)
bench("dtab b tgather idx flat ",
      lambda t, i: gat_t(t, i.reshape(-1)).reshape(30, H, W), dtab, di)
bench("dtab c gather+moveaxis  ",
      lambda t, i: jnp.moveaxis(t[i], -1, 0), dtab, di)
bench("dtab d gather only      ", lambda t, i: t[i], dtab, di)

# --- tap site: image idx, u32 8 cols ---
tap = jnp.asarray(rng.integers(0, 2**32, (131072, 8), np.uint64).astype(np.uint32))
ti = jnp.asarray(rng.integers(0, 131072, (H, W)).astype(np.int32))
bench("tap  a tgather image    ", lambda t, i: gat_t(t, i), tap, ti)
bench("tap  c gather+moveaxis  ",
      lambda t, i: jnp.moveaxis(t[i], -1, 0), tap, ti)
bench("tap  d gather only      ", lambda t, i: t[i], tap, ti)
