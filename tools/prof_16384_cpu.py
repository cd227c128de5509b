"""16384^2 grid record (VERDICT r4 next-step #4) on the virtual CPU mesh.

One step of the ROW-SHARDED distributed Pallas four-step at 16384^2 over
8 virtual CPU devices (interpret mode), height checked against the
float64 CPU golden. Single-chip 16384^2 is HBM-capacity-infeasible on a
16 GB v5e (see ops/pallas_step._fourstep_plan and docs/DESIGN.md round
5); the distributed pipeline at D >= 2 fits, and this run proves the
sharded four-step algebra/index math AT that N end-to-end. Speed on the
1-core CPU host is meaningless — this is an accuracy/feasibility record.

Usage (detached; takes tens of minutes on one core):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/prof_16384_cpu.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    from gfx_ocean_tpu.config import OceanConfig
    from gfx_ocean_tpu.models.ocean import OceanState
    from gfx_ocean_tpu.parallel import make_mesh, make_sharded_step, shard_state
    from gfx_ocean_tpu.utils.complexpair import to_pair

    n = 16384
    t = 3.0
    rng = np.random.default_rng(0)
    # Sparse-ish small spectrum keeps the f64 golden numerically tame.
    h0 = ((rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
          * 1e-3).astype(np.complex128)
    omega = (np.abs(rng.standard_normal((n, n))) + 0.1).astype(np.float32)

    cfg = OceanConfig(resolution=n, domain_size=4000.0, fft_impl="pallas",
                      matmul_precision="highest", compute_normals=False)
    mesh = make_mesh(jax.devices()[:8], batch=1, row=8)
    state = OceanState(h0=jnp.asarray(to_pair(h0.astype(np.complex64))),
                       omega=jnp.asarray(omega))
    sstate = shard_state(state, mesh)
    step = make_sharded_step(cfg, mesh, batched=False, fft="shard_map")
    t0 = time.time()
    out = step(sstate, jnp.float32(t))
    height = np.asarray(out.displacement[..., 1])
    dt = time.time() - t0
    print(f"step done in {dt:.0f}s", flush=True)

    # float64 golden, height only (the BASELINE-gated field).
    from gfx_ocean_tpu.golden.reference import golden_fields

    want = golden_fields(h0, omega.astype(np.float64), t, cfg.domain_size,
                         cfg.compat)[..., 1]
    rel = float(np.abs(height - want).max() / np.abs(want).max())
    print(json.dumps({"n": n, "mesh": "1x8 cpu (interpret)",
                      "matmul_precision": "highest",
                      "rel_linf_height_vs_f64_golden": rel,
                      "step_seconds_1core_cpu": round(dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
