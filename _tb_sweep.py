import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/gfx_ocean_tpu/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import time, numpy as np, jax.numpy as jnp
import gfx_ocean_tpu as ot

cfg = ot.OceanConfig(fft_impl="pallas", matmul_precision="bf16x3")
state = ot.ocean_state_from_assets()
ts = jnp.arange(600, dtype=jnp.float32) / 60
for tb in (2, 4, 6, 8):
    try:
        ro = ot.make_rollout(cfg, keep_fields=False, time_batch=tb)
        np.asarray(ro(state, ts))
        times = []
        for _ in range(3):
            t0 = time.perf_counter(); out = ro(state, ts); jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        print(f"tb={tb}: {600/np.median(times):.1f} steps/s", flush=True)
    except Exception as e:
        print(f"tb={tb}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
