#!/usr/bin/env python
"""A/B the block-diagonal fused stage-2 tables against the split form.

The fusion (ops/pallas_step._fourstep_tables, round 5) is value-pinned
by tests; this measures whether it MOVES throughput at a given N in one
session (docs/BENCH.md records it as a wash at 4096^2/2048^2). The
unfused arm monkeypatches `_fourstep_tables` in a fresh subprocess to
rebuild the split (2n2, 2n2) stage-2 tables — the kernels branch on the
table SHAPE, so this exercises the exact pre-fusion program.

Usage: python tools/prof_fuse2_ab.py [N ...]    (default 1024)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(n: int, arm: str) -> None:
    from gfx_ocean_tpu.cli import _honor_platform_env

    _honor_platform_env()
    from gfx_ocean_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    import jax.numpy as jnp

    import gfx_ocean_tpu as ot
    import gfx_ocean_tpu.ops.pallas_step as ps
    from gfx_ocean_tpu.config import PhillipsConfig
    from gfx_ocean_tpu.models.ocean import ocean_state_from_phillips
    from gfx_ocean_tpu.utils.profiling import time_rollout

    if arm == "unfused":
        orig = ps._fourstep_tables

        def split_tables(nn, n1, n2, negate):
            row, col = orig(nn, n1, n2, negate)
            w2cat = jnp.asarray(ps._cat_complex_np(*ps._dft_matrix_np(n2, 1)))
            return ((row[0], w2cat, row[2], row[3]),
                    (col[0], w2cat, col[2], col[3], col[4]))

        ps._fourstep_tables = split_tables

    cfg = ot.OceanConfig(resolution=n, domain_size=2000.0,
                         fft_impl="pallas", matmul_precision="high")
    state = ocean_state_from_phillips(cfg, PhillipsConfig())
    frames = 120
    ts = jnp.arange(frames, dtype=jnp.float32) * (1.0 / 60.0)
    rec = time_rollout(ot.make_rollout(cfg, keep_fields=False), state, ts,
                       repeats=2)
    print(json.dumps({
        "n": n, "arm": arm,
        "steps_per_sec": round(rec["steps_per_sec"], 1),
        "repeats_sec": [round(s, 3) for s in rec.get("repeats_sec", [])]}),
        flush=True)


def main() -> None:
    if len(sys.argv) >= 4 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
        return
    grids = [int(a) for a in sys.argv[1:]] or [1024]
    for n in grids:
        for arm in ("fused", "unfused", "fused"):   # F/U/F to bound drift
            print(f"[{time.strftime('%H:%M:%S')}] {n}^2 {arm}", flush=True)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", str(n), arm],
                capture_output=True, text=True, timeout=3600)
            out = proc.stdout.strip()
            if proc.returncode == 0 and out:
                print(out.splitlines()[-1], flush=True)
            else:
                lines = (proc.stderr or proc.stdout).strip().splitlines()
                errs = [ln for ln in lines
                        if ("Error" in ln or "Exception" in ln)
                        and not ln.startswith(" ")]
                msg = errs[-1] if errs else (
                    lines[-1] if lines else f"rc={proc.returncode}")
                print(json.dumps({"n": n, "arm": arm, "error": msg[:300]}),
                      flush=True)


if __name__ == "__main__":
    main()
