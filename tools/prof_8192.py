#!/usr/bin/env python
"""Measure the four-step Pallas pipeline at 8192^2 (VERDICT r3 item 5).

The pipeline guard advertises N in [1024, 32768]; this records the first
point above 4096^2: steps/s (device-resident scan, forcing transfer),
height rel L-inf vs the float64 golden, and whether the VMEM/HBM budget
fits at all. Config mirrors benchmarks/run_all.py config 5 at 2x N.

Run detached (the tunnel can take minutes per compile):
    nohup python tools/prof_8192.py > /tmp/prof_8192.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    import gfx_ocean_tpu as ot
    from gfx_ocean_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    from gfx_ocean_tpu.config import PhillipsConfig
    from gfx_ocean_tpu.golden.reference import golden_fields
    from gfx_ocean_tpu.models.ocean import ocean_state_from_phillips
    from gfx_ocean_tpu.utils.complexpair import from_pair_np
    from gfx_ocean_tpu.utils.profiling import time_rollout

    n = 8192
    out: dict = {"grid": n, "device": str(jax.devices()[0])}
    cfg = ot.OceanConfig(resolution=n, domain_size=2000.0,
                         fft_impl="pallas", matmul_precision="high")
    print(f"[{time.strftime('%H:%M:%S')}] synthesizing {n}^2 Phillips state",
          flush=True)
    state = ocean_state_from_phillips(cfg, PhillipsConfig())

    # accuracy first (one step; cheapest to compile); height channel only
    # to bound the tunnel transfer (0.27 GB at 8192^2).
    import dataclasses

    cfg1 = dataclasses.replace(cfg, compute_normals=False, compute_foam=False)
    t_check = 11.25
    print(f"[{time.strftime('%H:%M:%S')}] one step (compile + accuracy)",
          flush=True)
    height = np.asarray(
        ot.make_step(cfg1)(state, jnp.float32(t_check)).displacement[..., 1])
    print(f"[{time.strftime('%H:%M:%S')}] float64 golden", flush=True)
    want = golden_fields(from_pair_np(np.asarray(state.h0)),
                         np.asarray(state.omega), t_check, cfg.domain_size,
                         cfg.compat)[..., 1]
    out["rel_linf_vs_golden_height"] = float(
        np.abs(height - want).max() / np.abs(want).max())
    del height, want

    print(f"[{time.strftime('%H:%M:%S')}] rollout throughput", flush=True)
    ts = jnp.arange(16, dtype=jnp.float32) * jnp.float32(1.0 / 60.0)
    rollout = ot.make_rollout(cfg, keep_fields=False)
    rec = time_rollout(rollout, state, ts, repeats=2)
    out["steps_per_sec"] = round(rec["steps_per_sec"], 1)
    out["repeats_sec"] = [round(t, 3) for t in rec["repeats_sec"]]
    out["hermitian_pack"] = cfg.hermitian_pack
    out["matmul_precision"] = cfg.matmul_precision

    # the XLA einsum four-step fallback for comparison (same tier)
    try:
        cfgx = ot.OceanConfig(resolution=n, domain_size=2000.0,
                              matmul_precision="high")
        recx = time_rollout(ot.make_rollout(cfgx, keep_fields=False),
                            state, ts, repeats=2)
        out["xla_fourstep_steps_per_sec"] = round(recx["steps_per_sec"], 1)
    except Exception as e:  # noqa: BLE001
        out["xla_fourstep_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        import traceback

        traceback.print_exc()
        print(json.dumps({"grid": 8192, "ok": False,
                          "error": f"{type(e).__name__}: {e}"[:300]}))
