#!/usr/bin/env python
"""Wall-rate sweep of the four-step Pallas pipeline after the round-5
stacked-complex-dot + fused-sincos kernels (commit 62cc63b).

Re-records the production rollout steps/s (same rules as
benchmarks/run_all.py: median of repeats, device-resident scan, forcing
transfer) at each N, with one-step accuracy vs the matmul 'highest'
reference so the docs' config-5/6 entries can be refreshed without a
full run_all pass.

Run detached (the tunnel can take minutes per compile):
    nohup python tools/prof_fourstep_sweep.py 1024 2048 4096 8192 \
        > /tmp/fourstep_sweep.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from gfx_ocean_tpu.cli import _honor_platform_env

    _honor_platform_env()
    from gfx_ocean_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    import dataclasses

    import jax.numpy as jnp

    import gfx_ocean_tpu as ot
    from gfx_ocean_tpu.config import PhillipsConfig
    from gfx_ocean_tpu.models.ocean import ocean_state_from_phillips
    from gfx_ocean_tpu.utils.profiling import time_rollout

    grids = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    dt = 1.0 / 60.0
    for n in grids:
        cfg = ot.OceanConfig(resolution=n, domain_size=2000.0,
                             fft_impl="pallas", matmul_precision="high")
        state = ocean_state_from_phillips(cfg, PhillipsConfig())
        frames = {1024: 120, 2048: 120}.get(n, 60)
        ts = jnp.arange(frames, dtype=jnp.float32) * dt
        print(f"[{time.strftime('%H:%M:%S')}] {n}^2 rollout "
              f"({frames} frames x 2 repeats)", flush=True)
        rec = time_rollout(ot.make_rollout(cfg, keep_fields=False), state, ts,
                           repeats=2)
        out = {"n": n, "steps_per_sec": round(rec["steps_per_sec"], 1),
               "repeats_sec": [round(s, 3) for s in rec.get("repeats_sec", [])]}
        # one-step accuracy vs the matmul 'highest' tier (f64 golden is
        # hours at 4096+; the highest tier is itself golden-pinned in tests)
        if n <= 4096:
            t_check = 11.25
            cfg_hi = dataclasses.replace(
                cfg, fft_impl="matmul", matmul_precision="highest",
                compute_normals=False, compute_foam=False)
            cfg1 = dataclasses.replace(cfg, compute_normals=False,
                                       compute_foam=False)
            got = np.asarray(ot.make_step(cfg1)(
                state, jnp.float32(t_check)).displacement[..., 1])
            want = np.asarray(ot.make_step(cfg_hi)(
                state, jnp.float32(t_check)).displacement[..., 1])
            scale = float(np.max(np.abs(want)))
            out["rel_linf_vs_matmul_highest"] = float(
                np.max(np.abs(got - want)) / scale)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
