"""Roofline audit of the Pallas four-step pipeline (VERDICT r4 next-step #1).

For each grid size: trace a short checksum rollout (scan, so the
time-invariant permuted inputs are LICM-hoisted exactly as in bench
conditions), break the trace into per-op device time, and compute each
kernel's achieved MXU FLOP/s and HBM bytes/s against chip peaks from an
analytic cost model of the kernel (dots and planes are static).

Usage: python tools/prof_roofline.py [N ...]   (default 1024 2048 4096)
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e (1 TensorCore): bf16 MXU peak and HBM bandwidth peak.
MXU_BF16_TFLOPS = 197.0
HBM_GBPS = 819.0


def step_model(n: int, precision: str = "bf16x3") -> dict:
    """Analytic per-step MXU FLOPs and HBM bytes of the four-step pipeline.

    Mirrors ops/pallas_step._fourstep_{row,col}_kernel: n1 = 128, bf16x3
    triples every dot's MXU passes. Bytes are the streamed planes only
    (tables are grid-invariant and VMEM-resident).
    """
    n1, n2 = 128, n // 128
    passes = {"bf16x3": 3, "high": 3, "highest": 6, "default": 1}[precision]
    # row kernel: 2 sets x (stage1 4 dots over n1 + stage2 4 dots over n2)
    row_flops = passes * 16 * n * n * (n1 + n2)
    # col kernel: stage1 4 dots x 2 sets over n1; stage2 2 (height) + 4 (z)
    col_flops = passes * (16 * n * n * n1 + 12 * n * n * n2)
    row_bytes = (10 + 4) * n * n * 4       # 10 planes in, y (2,2,N,N) out
    col_bytes = (4 + 3) * n * n * 4        # y in, 3 field planes out
    # normals (finite differences of height) + checksum reduction, XLA side:
    # reads height + disp, writes 3 normal planes, reads both for the sum —
    # upper bound, XLA fuses some of these.
    aux_bytes = (1 + 3 + 3 + 3) * n * n * 4
    return {"row_flops": row_flops, "col_flops": col_flops,
            "row_bytes": row_bytes, "col_bytes": col_bytes,
            "aux_bytes": aux_bytes}


def trace_rollout(n: int, steps: int = 20,
                  log_dir: str = "/tmp/gfx_ocean_roofline") -> dict:
    import jax
    import jax.numpy as jnp

    import gfx_ocean_tpu as ot
    from gfx_ocean_tpu.config import PhillipsConfig
    from gfx_ocean_tpu.models.ocean import ocean_state_from_phillips
    from gfx_ocean_tpu.utils.profiling import trace

    cfg = ot.OceanConfig(resolution=n, domain_size=2000.0, fft_impl="pallas")
    state = ocean_state_from_phillips(cfg, PhillipsConfig())
    rollout = ot.make_rollout(cfg, keep_fields=False)
    ts = jnp.arange(steps, dtype=jnp.float32) * jnp.float32(1.0 / 60.0)
    np.asarray(rollout(state, ts))  # compile + force
    shutil.rmtree(log_dir, ignore_errors=True)
    with trace(log_dir):
        np.asarray(rollout(state, ts))
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    data = json.load(gzip.open(sorted(paths)[-1]))
    names = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    by_op = collections.Counter()
    for e in data["traceEvents"]:
        # jit_* module events and while/body loop wrappers CONTAIN their
        # children — counting them would double the total.
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in names.get(e.get("pid"), "")
                and not e["name"].startswith(("jit_", "while", "body",
                                              "condition"))):
            by_op[e["name"]] += e["dur"]
    return {op: dur / 1e3 / steps for op, dur in by_op.items()}  # ms/step


def main() -> None:
    from gfx_ocean_tpu.cli import _honor_platform_env

    _honor_platform_env()
    from gfx_ocean_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()

    grids = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    for n in grids:
        per_op = trace_rollout(n)
        model = step_model(n)
        # The two Mosaic kernels trace as pallas_* custom calls in program
        # order: row pass first, column pass second.
        pallas = sorted((op for op in per_op if "pallas" in op),
                        key=lambda op: per_op[op], reverse=True)[:2]
        pallas.sort()
        row_ms = per_op[pallas[0]] if pallas else 0.0
        col_ms = per_op[pallas[1]] if len(pallas) > 1 else 0.0
        total_ms = sum(per_op.values())
        other_ms = total_ms - row_ms - col_ms
        top = sorted(per_op.items(), key=lambda kv: -kv[1])[:10]

        def roof(flops, bytes_, ms):
            if ms <= 0:
                return {}
            return {"ms": round(ms, 3),
                    "tflops": round(flops / ms / 1e9, 1),
                    "mxu_pct": round(flops / ms / 1e9 / MXU_BF16_TFLOPS * 100, 1),
                    "gbps": round(bytes_ / ms / 1e6, 0),
                    "hbm_pct": round(bytes_ / ms / 1e6 / HBM_GBPS * 100, 1)}

        print(json.dumps({
            "n": n,
            "device_ms_per_step": round(total_ms, 3),
            "steps_per_sec_device": round(1e3 / total_ms, 1) if total_ms else None,
            "row_kernel": roof(model["row_flops"], model["row_bytes"], row_ms),
            "col_kernel": roof(model["col_flops"], model["col_bytes"], col_ms),
            "other_ms": round(other_ms, 3),
            "top_ops_ms": [[op[:80], round(ms, 3)] for op, ms in top],
        }), flush=True)


if __name__ == "__main__":
    main()
