"""Micro: segmented component-wise min over sorted oct runs — XLA
log-shift vs one sequential-grid Pallas kernel (round-4 resolve work).
Shapes match the 1200x700 fused frame: n_res = 735784 (pool 630784 +
n_oct 105000), 8 key columns."""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/gfx_ocean_tpu/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_RES = 735784
N_OCT = 105000
KEYMAX = np.uint32(0xFFFFFFFF)

rng = np.random.default_rng(0)
octid = np.sort(rng.integers(0, N_OCT + 1, N_RES)).astype(np.int32)
keys = rng.integers(0, 2**32, (8, N_RES), dtype=np.uint32)

so_d = jnp.asarray(octid)
sk_d = jnp.asarray(keys)


@jax.jit
def xla_logshift(so, sk):
    n = so.shape[0]
    k = 1
    while k < n:
        same = (jnp.concatenate([so[:k], so[:-k]]) == so)[None, :]
        sh = jnp.concatenate(
            [jnp.full((8, k), KEYMAX, jnp.uint32), sk[:, :-k]], axis=1)
        sk = jnp.minimum(sk, jnp.where(same, sh, KEYMAX))
        k *= 2
    run_last = jnp.concatenate([so[1:] != so[:-1], jnp.ones((1,), bool)])
    skey = jnp.where(run_last, so, N_OCT)
    return sk, skey


def _segmin_kernel(so_ref, sn_ref, sk_ref, skey_ref, min_ref, co_ref, cm_ref,
                   *, bl: int, n_oct: int):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        co_ref[0, 0] = jnp.int32(-1)
        cm_ref[:, :] = jnp.full((8, 128), 0x7FFFFFFF, jnp.int32)

    so = so_ref[0:1, :]
    # keys enter sign-FLIPPED (u32 order == i32 order on flipped bits);
    # Mosaic has no unsigned min.
    m = sk_ref[:, :]
    k = 1
    while k < bl:
        same = jnp.concatenate(
            [jnp.full((1, k), -1, jnp.int32), so[:, :-k]], axis=1) == so
        sh = jnp.concatenate(
            [jnp.full((8, k), 0x7FFFFFFF, jnp.int32), m[:, :-k]], axis=1)
        m = jnp.minimum(m, jnp.where(same, sh, jnp.int32(0x7FFFFFFF)))
        k *= 2
    carry_oct = co_ref[0, 0]
    carry_min = cm_ref[:, 0:1]
    m = jnp.where(so == carry_oct, jnp.minimum(m, carry_min), m)
    sn = sn_ref[0:1, :]
    run_last = so != sn
    skey_ref[0:1, :] = jnp.where(run_last, so, jnp.int32(n_oct))
    min_ref[:, :] = m
    co_ref[0, 0] = so[0, bl - 1]
    cm_ref[:, :] = jnp.broadcast_to(m[:, bl - 1:bl], (8, 128))


def pallas_segmin(so, sk, bl=32768):
    n = so.shape[0]
    n_pad = -(-n // bl) * bl
    so_p = jnp.concatenate([so, jnp.full((n_pad - n,), N_OCT, jnp.int32)])
    sn_p = jnp.concatenate([so_p[1:], jnp.full((1,), -2, jnp.int32)])
    flip = jnp.int32(-0x80000000)
    sk_p = jnp.concatenate(
        [sk, jnp.full((8, n_pad - n), KEYMAX, jnp.uint32)], axis=1)
    sk_f = (jax.lax.bitcast_convert_type(sk_p, jnp.int32) ^ flip)
    kern = functools.partial(_segmin_kernel, bl=bl, n_oct=N_OCT)
    interpret = jax.default_backend() == "cpu"
    skey, mins = pl.pallas_call(
        kern,
        grid=(n_pad // bl,),
        out_shape=(jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
                   jax.ShapeDtypeStruct((8, n_pad), jnp.int32)),
        in_specs=[pl.BlockSpec((1, bl), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, bl), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, bl), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, bl), lambda i: (0, i), memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, bl), lambda i: (0, i), memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.int32)],
        interpret=interpret,
    )(so_p.reshape(1, n_pad), sn_p.reshape(1, n_pad), sk_f)
    mins_u = jax.lax.bitcast_convert_type(mins ^ flip, jnp.uint32)
    return mins_u[:, :n], skey[0, :n]


pj = jax.jit(pallas_segmin, static_argnums=2)

# correctness vs XLA
a_m, a_k = xla_logshift(so_d, sk_d)
for bl in (8192, 32768):
    b_m, b_k = pj(so_d, sk_d, bl)
    am, bm = np.asarray(a_m), np.asarray(b_m)
    ak, bk = np.asarray(a_k), np.asarray(b_k)
    # compare only at run-lasts (prefix interiors may differ legally? no —
    # both compute full prefix mins; compare everywhere)
    print(f"bl={bl}: mins equal {np.array_equal(am, bm)}, skey equal {np.array_equal(ak, bk)}", flush=True)

def timeit(f, *a):
    for _ in range(2): jax.block_until_ready(f(*a))
    t0 = time.perf_counter(); R = 20
    for _ in range(R): out = f(*a)
    jax.block_until_ready(out); np.asarray(out[0])[:1]
    return (time.perf_counter() - t0) / R * 1e3

print(f"xla log-shift: {timeit(xla_logshift, so_d, sk_d):.2f} ms", flush=True)
for bl in (8192, 32768, 65536):
    print(f"pallas bl={bl}: {timeit(pj, so_d, sk_d, bl):.2f} ms", flush=True)

if os.environ.get("TRACE"):
    import glob, gzip, json, collections
    for name, f, args in (("xla", xla_logshift, (so_d, sk_d)),
                          ("pallas8k", pj, (so_d, sk_d, 8192)),
                          ("pallas32k", pj, (so_d, sk_d, 32768))):
        td = f"/tmp/segmin_trace_{name}"
        os.system(f"rm -rf {td}")
        R = 10
        with jax.profiler.trace(td):
            for _ in range(R):
                out = f(*args)
            jax.block_until_ready(out); np.asarray(out[0])[:1]
        paths = glob.glob(td + "/**/*.trace.json.gz", recursive=True)
        data = json.load(gzip.open(sorted(paths)[-1]))
        names = {e["pid"]: e["args"].get("name", "") for e in data["traceEvents"]
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
        tot = nops = 0
        for e in data["traceEvents"]:
            if (e.get("ph") == "X" and "dur" in e
                    and "TPU" in names.get(e.get("pid"), "")
                    and not e["name"].startswith("jit_")):
                tot += e["dur"]; nops += 1
        print(f"{name}: device {tot/1e3/R:.2f} ms/call over {nops//R} ops", flush=True)
