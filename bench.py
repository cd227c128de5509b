#!/usr/bin/env python
"""Headline benchmark: 512^2 full ocean steps/sec on one TPU chip.

Workload (BASELINE.json config 2): full step — propagate, 3x 2-D
unnormalized inverse FFT, correction (choppy displacement), normal map —
over a 600-frame ``lax.scan`` rollout on the shipped spectrum.bin/omega.bin
initial conditions.

Measurement rules (BASELINE.md): device-resident scan with per-frame
full-field reductions (every output is computed and consumed on device),
jit warmup excluded, completion forced by a host transfer each repeat
(only transfers are trustworthy on the axon backend), median of repeats.
An accuracy gate (relative L-inf vs the float64 CPU golden) runs first; a
throughput number with broken numerics is meaningless.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is against the 5,000 steps/s north star (BASELINE.json; the
reference publishes no numbers of its own — SURVEY.md §6).
"""

from __future__ import annotations

import json

import numpy as np


STEPS = 600
REPEATS = 5
TIME_BATCH = 6   # sweeps on the pallas step: tb=6/8 beat tb=4 by ~2-5%
BASELINE_STEPS_PER_SEC = 5000.0
ACCURACY_GATE = 1e-4


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gfx_ocean_tpu.cli import _honor_platform_env

    _honor_platform_env()

    import gfx_ocean_tpu as ot
    from gfx_ocean_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    from gfx_ocean_tpu.golden.reference import golden_fields
    from gfx_ocean_tpu.utils.complexpair import from_pair_np

    # Fused single-kernel Pallas step: the fastest AND most accurate 512^2
    # config in the benchmark matrix (docs/BENCH.md config 6 vs config 2).
    # The matmul-DFT path is the fallback if the Pallas kernel ever fails
    # in a fresh environment — the headline must not void. The fallback
    # RE-EXECS this script rather than continuing in-process: one axon
    # runtime error can poison subsequent ops in the same process
    # (.claude/skills/verify/SKILL.md), so in-process fallback numbers
    # would be untrustworthy. The JSON detail records which config ran.
    import os
    import sys

    if os.environ.get("GFX_OCEAN_BENCH_FALLBACK"):
        cfg = ot.OceanConfig()  # matmul DFT, explicit-split bf16x3
    else:
        cfg = ot.OceanConfig(fft_impl="pallas", matmul_precision="bf16x3")
    state = ot.ocean_state_from_assets(resolution=cfg.resolution)

    # --- accuracy gate + pallas compile probe ----------------------------
    # BOTH pallas programs (single step for the gate, and the scan rollout
    # — a different compile that can fail independently, e.g. VMEM OOM at
    # the time-batched shape) run inside the fallback guard.
    t_check = 11.25
    rollout = ot.make_rollout(cfg, keep_fields=False, time_batch=TIME_BATCH)
    ts = jnp.arange(STEPS, dtype=jnp.float32) * jnp.float32(1.0 / 60.0)
    try:
        disp = np.asarray(
            ot.make_step(cfg)(state, jnp.float32(t_check)).displacement)
        np.asarray(rollout(state, ts))  # warmup: compile + force completion
    except Exception as e:  # noqa: BLE001 - pallas fallback, see above
        if cfg.fft_impl != "pallas":
            raise
        print(f"pallas step failed ({type(e).__name__}: {str(e)[:200]}); "
              "re-exec on the matmul-DFT path", file=sys.stderr)
        os.environ["GFX_OCEAN_BENCH_FALLBACK"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)
    want = golden_fields(from_pair_np(np.asarray(state.h0)), np.asarray(state.omega),
                         t_check, cfg.domain_size, cfg.compat)
    rel_linf = float(np.abs(disp - want).max() / np.abs(want).max())
    if not np.isfinite(rel_linf) or rel_linf > ACCURACY_GATE:
        raise SystemExit(f"accuracy gate failed: relative L-inf {rel_linf:.3e} "
                         f"> {ACCURACY_GATE}")

    # --- throughput -------------------------------------------------------
    # time_rollout forces completion with a host transfer of the per-step
    # checksums each repeat: on the axon backend block_until_ready can
    # both under-report and swallow async errors (utils/profiling.py) —
    # only a transfer is trustworthy. The 600-float download costs one
    # RPC (~2-5% here, ~0 on an untunneled host), the honest price.
    from gfx_ocean_tpu.utils.profiling import time_rollout

    record = time_rollout(rollout, state, ts, repeats=REPEATS)
    steps_per_sec = record["steps_per_sec"]
    times = record["repeats_sec"]

    print(json.dumps({
        "metric": "ocean_full_step_512_steps_per_sec",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
        "detail": {
            "grid": cfg.resolution,
            "rollout_steps": STEPS,
            "time_batch": TIME_BATCH,
            "matmul_precision": cfg.matmul_precision,
            "effective_precision": _effective_precision(cfg),
            "fft_impl": cfg.fft_impl,
            "rel_linf_vs_golden": rel_linf,
            "device": str(jax.devices()[0]),
            "repeats_sec": [round(t, 4) for t in times],
            "sharded_rollout": _sharded_record(),
            "fused_frame_1200x700": _fused_frame_record(),
        },
    }))


def _effective_precision(cfg):
    """The tier that actually ran (the bf16x3 -> HIGH remap above
    direct_max is invisible otherwise — VERDICT r3 weak #2)."""
    from gfx_ocean_tpu.ops.fft import effective_precision

    return effective_precision(cfg.matmul_precision, cfg.resolution,
                               cfg.direct_dft_max, cfg.fft_impl)


def _sharded_record():
    """Multi-chip surface record: run the full sharded rollout on an
    8-device virtual CPU mesh in a subprocess (real multi-chip hardware
    is unreachable from this host — this is a correctness record, not a
    throughput claim; on real ICI the row axis splits each DFT pass with
    one all_to_all resharding per transform). Best-effort: a failure
    here must not void the headline benchmark."""
    import os
    import subprocess
    import sys

    try:
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=8")
        out = subprocess.run(
            [sys.executable, "-m", "gfx_ocean_tpu", "bench",
             "--resolution", "512", "--steps", "8", "--repeats", "1",
             "--time-batch", "1", "--mesh", "2,4"],
            capture_output=True, text=True, timeout=420, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)), check=True)
        rec = json.loads(out.stdout)
        return {"ok": True, "mesh": rec["mesh"], "grid": rec["resolution"],
                "cpu_mesh_steps_per_sec": round(rec["steps_per_sec"], 1),
                "note": "8-device virtual CPU mesh correctness record"}
    except Exception as e:  # noqa: BLE001
        return {"ok": False, "error": f"{type(e).__name__}: {e}"[:200]}


def _fused_frame_record():
    """Interactive-rate record: the fused step->render->sRGB frame at the
    reference's own 1200x700 window (it presents vsync-capped at 16.7
    ms/frame — /root/reference/src/lib.rs:48, src/render.rs:153). Runs in
    a subprocess (a renderer failure must not void or poison the headline)
    and reports trace-derived device ms + pipelined wall ms."""
    import os
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "from gfx_ocean_tpu.utils.profiling import frame_bench_main; "
             "frame_bench_main()"],
            capture_output=True, text=True, timeout=1500,
            cwd=os.path.dirname(os.path.abspath(__file__)), check=True)
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        rec["ok"] = True
        rec["vsync_budget_ms"] = 16.7
        return rec
    except Exception as e:  # noqa: BLE001
        return {"ok": False, "error": f"{type(e).__name__}: {e}"[:200]}


if __name__ == "__main__":
    # The tunneled TPU backend occasionally drops a request; one retry
    # keeps a single flake from voiding the benchmark record. The retry
    # RE-EXECS into a fresh process: a failed axon op can poison later
    # ops in the same process (.claude/skills/verify/SKILL.md).
    # Watchdog: a fully-down tunnel hangs the first device op PAST any
    # jit timeout (round 3 saw a multi-hour outage where even
    # jax.devices() never returned) — fail loudly instead of wedging the
    # caller. A THREAD (not SIGALRM: a C-blocked main thread never runs
    # Python signal handlers) that hard-exits. Generous default: a
    # healthy cold TPU run finishes in minutes; a DEGRADED tunnel has
    # shown >10 min per compile and this script compiles ~4 programs, so
    # only a 90-minute silence counts as wedged.
    import os as _os
    import threading as _threading

    _WATCHDOG_SEC = int(_os.environ.get("GFX_OCEAN_BENCH_WATCHDOG_SEC",
                                        "5400"))

    def _watchdog():
        _os.write(2, (f"bench watchdog: no completion within "
                      f"{_WATCHDOG_SEC} s — TPU backend unreachable or "
                      f"wedged; aborting instead of hanging\n").encode())
        _os._exit(3)

    if _WATCHDOG_SEC > 0:
        _timer = _threading.Timer(_WATCHDOG_SEC, _watchdog)
        _timer.daemon = True
        _timer.start()
    try:
        main()
    except SystemExit:
        raise
    except Exception as e:  # noqa: BLE001
        import os
        import sys
        import traceback

        traceback.print_exc()
        if os.environ.get("GFX_OCEAN_BENCH_RETRIED"):
            raise
        print(f"bench attempt 1 failed ({type(e).__name__}); retrying in a "
              "fresh process", file=sys.stderr)
        os.environ["GFX_OCEAN_BENCH_RETRIED"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)
