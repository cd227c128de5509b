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

Every (N, tb) config runs in a FRESH SUBPROCESS: the row kernel's output
block grows with tb (tb * 2 * 2 * block * N f32), so large (N, tb) can
VMEM-OOM — and one axon runtime failure poisons every later op in the
same process (.claude/skills/verify/SKILL.md). Isolation turns an OOM
into one "error" record instead of a dead sweep.

Run detached (the tunnel can take minutes per compile):
    nohup python tools/prof_tb_sweep.py 4096 2048 8192 1024 \
        > /tmp/tb_sweep.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TBS = (1, 2, 4, 8)


def worker(n: int, tb: int) -> None:
    """One (N, tb) measurement; prints one JSON line (mode: --worker N tb).

    tb == 0 is the agreement check: device max-abs diff of the tb=4
    batch vs four tb=1 calls (expected exactly 0 — identical dot shapes,
    tests/test_pallas.py pins bit-equality in interpret mode)."""
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

    cfg = ot.OceanConfig(resolution=n, domain_size=2000.0,
                         fft_impl="pallas", matmul_precision="high")
    state = ocean_state_from_phillips(cfg, PhillipsConfig())

    if tb == 0:
        ts4 = jnp.asarray([3.0, 3.5, 7.25, 11.0], jnp.float32)
        batch = pallas_planes_batch(state.h0, state.omega, ts4, cfg)
        diffs = []
        for j in range(4):
            single = pallas_planes(state.h0, state.omega, ts4[j], cfg)
            diffs.append(float(jnp.max(jnp.abs(batch[j] - single))))
        scale = float(jnp.max(jnp.abs(batch[:, 1])))
        print(json.dumps({"n": n, "tb4_vs_tb1_max_abs_diff": diffs,
                          "height_scale": round(scale, 3)}), flush=True)
        return

    frames = 120
    ts = jnp.arange(frames, dtype=jnp.float32) * (1.0 / 60.0)
    rec = time_rollout(
        ot.make_rollout(cfg, keep_fields=False, time_batch=tb),
        state, ts, repeats=2)
    print(json.dumps({
        "n": n, "tb": tb,
        "steps_per_sec": round(rec["steps_per_sec"], 1),
        "repeats_sec": [round(s, 3) for s in rec.get("repeats_sec", [])]}),
        flush=True)


def main() -> None:
    if len(sys.argv) >= 4 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return

    grids = [int(a) for a in sys.argv[1:]] or [4096]
    for n in grids:
        for tb in (0,) + TBS:
            what = "agreement check" if tb == 0 else f"rollout tb={tb}"
            print(f"[{time.strftime('%H:%M:%S')}] {n}^2 {what}", flush=True)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", str(n), str(tb)],
                capture_output=True, text=True, timeout=3600)
            out = proc.stdout.strip()
            if proc.returncode == 0 and out:
                print(out.splitlines()[-1], flush=True)
            else:
                lines = (proc.stderr or proc.stdout).strip().splitlines()
                # last real exception line, not JAX's trailing
                # "For simplicity..." traceback-filtering boilerplate
                errs = [ln for ln in lines
                        if ("Error" in ln or "Exception" in ln)
                        and not ln.startswith(" ")]
                msg = errs[-1] if errs else (
                    lines[-1] if lines else f"rc={proc.returncode}")
                print(json.dumps({"n": n, "tb": tb, "error": msg[:300]}),
                      flush=True)


if __name__ == "__main__":
    main()
