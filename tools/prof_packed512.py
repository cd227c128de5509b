"""A/B the Hermitian-packed fused Pallas kernel vs the unpacked one at
N <= 512 on the real chip (VERDICT r4 next-step #2).

Methodology matches bench.py: 600-frame scan, time_batch sweep, repeats,
completion forced by host transfer of the checksums. Also sweeps the
'highest' tier (VERDICT r4 next-step #8: does packed fit 512@highest in
one kernel, and at what rate vs the blocked two-kernel fallback?).
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax.numpy as jnp

    from gfx_ocean_tpu.cli import _honor_platform_env

    _honor_platform_env()
    import gfx_ocean_tpu as ot
    from gfx_ocean_tpu.utils.compile_cache import enable_default_cache
    from gfx_ocean_tpu.utils.profiling import time_rollout

    enable_default_cache()

    steps = 600
    state = ot.ocean_state_from_assets(resolution=512)
    ts = jnp.arange(steps, dtype=jnp.float32) * jnp.float32(1.0 / 60.0)

    golden = None

    def rel_vs_matmul_highest(cfg):
        nonlocal golden
        if golden is None:
            gcfg = ot.OceanConfig(matmul_precision="highest")
            golden = np.asarray(
                ot.make_step(gcfg)(state, jnp.float32(11.25)).displacement)
        disp = np.asarray(
            ot.make_step(cfg)(state, jnp.float32(11.25)).displacement)
        return float(np.abs(disp - golden).max() / np.abs(golden).max())

    # Each (prec, pack) config can run as its own process invocation
    # (argv: PREC PACK) — one axon failure poisons a process, so the
    # driving shell loop isolates configs. Risky config ('highest'
    # packed — may VMEM OOM) ordered last.
    configs = [("bf16x3", True), ("bf16x3", False),
               ("highest", False), ("highest", True)]
    if len(sys.argv) == 3:
        configs = [(sys.argv[1], sys.argv[2] == "1")]

    for prec, pack in configs:
        cfg = ot.OceanConfig(fft_impl="pallas", matmul_precision=prec,
                             hermitian_pack=pack)
        for tb in (4, 6, 8):
            try:
                rollout = ot.make_rollout(cfg, keep_fields=False,
                                          time_batch=tb)
                np.asarray(rollout(state, ts))  # warmup/compile
                rec = time_rollout(rollout, state, ts, repeats=3)
                rel = rel_vs_matmul_highest(cfg) if tb == 6 else None
                print(json.dumps({
                    "prec": prec, "packed": pack, "tb": tb,
                    "steps_per_sec": round(rec["steps_per_sec"], 1),
                    "repeats_sec": [round(t, 4) for t in rec["repeats_sec"]],
                    "rel_vs_matmul_highest": rel,
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "prec": prec, "packed": pack, "tb": tb,
                    "error": f"{type(e).__name__}: {str(e)[:300]}",
                }), flush=True)
                # one failure can poison the process on axon — bail and
                # let the caller re-run remaining configs
                sys.exit(2)


if __name__ == "__main__":
    main()
