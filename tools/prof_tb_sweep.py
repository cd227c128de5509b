#!/usr/bin/env python
"""In-kernel time-batch sweep for the four-step Pallas pipeline (round 5).

``make_rollout(time_batch=tb)`` on the pallas checksum path now routes
through ``ops.pallas_step.pallas_planes_batch``: the row kernel fetches
each row band's 10 hoisted propagate planes ONCE and computes tb frames
from VMEM (docs/BENCH.md roofline: those planes are 10/14 of the row
kernel's HBM traffic, and the row kernel sits at 55% of HBM peak at
4096^2). This sweep records steps/s per (N, tb) plus a per-frame
max-abs diff of the tb>1 planes vs tb=1 on the device, so the docs can
quote both the win and the (expected ~bit-level) agreement.

Run detached (the tunnel can take minutes per compile):
    nohup python tools/prof_tb_sweep.py 4096 2048 8192 1024 \
        > /tmp/tb_sweep.log 2>&1 &
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
    import jax.numpy as jnp

    import gfx_ocean_tpu as ot
    from gfx_ocean_tpu.config import PhillipsConfig
    from gfx_ocean_tpu.models.ocean import ocean_state_from_phillips
    from gfx_ocean_tpu.ops.pallas_step import pallas_planes, pallas_planes_batch
    from gfx_ocean_tpu.utils.profiling import time_rollout

    grids = [int(a) for a in sys.argv[1:]] or [4096]
    dt = 1.0 / 60.0
    frames = 120
    for n in grids:
        cfg = ot.OceanConfig(resolution=n, domain_size=2000.0,
                             fft_impl="pallas", matmul_precision="high")
        state = ocean_state_from_phillips(cfg, PhillipsConfig())
        ts = jnp.arange(frames, dtype=jnp.float32) * dt

        # device-side agreement check, tb=4 vs tb=1 (one frame set)
        ts4 = jnp.asarray([3.0, 3.5, 7.25, 11.0], jnp.float32)
        batch = pallas_planes_batch(state.h0, state.omega, ts4, cfg)
        diffs = []
        for j in range(4):
            single = pallas_planes(state.h0, state.omega, ts4[j], cfg)
            diffs.append(float(jnp.max(jnp.abs(batch[j] - single))))
        scale = float(jnp.max(jnp.abs(batch[:, 1])))
        print(json.dumps({"n": n, "tb4_vs_tb1_max_abs_diff": diffs,
                          "height_scale": round(scale, 3)}), flush=True)

        for tb in (1, 2, 4, 8):
            print(f"[{time.strftime('%H:%M:%S')}] {n}^2 rollout tb={tb} "
                  f"({frames} frames x 2 repeats)", flush=True)
            rec = time_rollout(
                ot.make_rollout(cfg, keep_fields=False, time_batch=tb),
                state, ts, repeats=2)
            print(json.dumps({
                "n": n, "tb": tb,
                "steps_per_sec": round(rec["steps_per_sec"], 1),
                "repeats_sec": [round(s, 3)
                                for s in rec.get("repeats_sec", [])]}),
                flush=True)


if __name__ == "__main__":
    main()
