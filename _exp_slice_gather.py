import time, numpy as np, jax, jax.numpy as jnp

N = 512; P = 134400
tex4 = jnp.asarray(np.random.rand(4, N, N).astype(np.float32))
texs = [jnp.asarray(np.random.rand(N, N).astype(np.float32)) for _ in range(4)]
yi = jnp.asarray(np.random.randint(0, N, P, dtype=np.int32))
xi = jnp.asarray(np.random.randint(0, N, P, dtype=np.int32))

@jax.jit
def four_gathers(t0, t1, t2, t3, y, x):
    return t0[y, x] + t1[y, x] + t2[y, x] + t3[y, x]

@jax.jit
def slice_gather(t4, y, x):
    # gather (4,1,1) slices: one gather op fetching the leading dim
    return t4[:, y, x].sum(0)

a = four_gathers(*texs, yi, xi); np.asarray(a)
b = slice_gather(tex4, yi, xi); np.asarray(b)
print("match:", bool(jnp.allclose(a, b)))
for name, fn, args in [("four", four_gathers, (*texs, yi, xi)), ("slice", slice_gather, (tex4, yi, xi))]:
    t0 = time.perf_counter(); n = 50
    for _ in range(n): r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms")
