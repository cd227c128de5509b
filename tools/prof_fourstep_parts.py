"""Decompose the four-step pipeline's kernel time (roofline follow-up).

For each of the row and col kernels at N: time the kernel alone at
precision 'default' (1 MXU pass/dot) and 'bf16x3' (3 passes). Model
t(p) = fixed + slope * passes: 'fixed' is the non-MXU share (DMA + VPU
conversions/twiddles/transcendentals), 'slope*3' the MXU share at the
production tier. Identifies WHICH resource actually bounds each kernel
(the roofline shows neither MXU nor HBM does).

Usage: python tools/prof_fourstep_parts.py [N]   (default 4096)
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
    from gfx_ocean_tpu.config import OceanConfig
    from gfx_ocean_tpu.ops.pallas_step import (
        _fourstep_col_call, _fourstep_plan, _fourstep_row_call,
        _fourstep_tables)
    from gfx_ocean_tpu.utils.compile_cache import enable_default_cache
    from gfx_ocean_tpu.utils.profiling import traced_device_ms

    enable_default_cache()
    import jax

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(0)

    def dev(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.01)

    for prec in ("default", "bf16x3"):
        cfg = OceanConfig(resolution=n, domain_size=2000.0,
                          fft_impl="pallas", matmul_precision=prec)
        n1, n2, block, cblock = _fourstep_plan(n, cfg)
        row_tabs, col_tabs = _fourstep_tables(n, n1, n2, cfg.compat.ref_sign)
        pre, preq = dev((4, n, n)), dev((4, n, n))
        om = jnp.abs(dev((n, n))) * 100.0
        omq = jnp.abs(dev((n, n))) * 100.0
        t2 = jnp.zeros((1, 2), jnp.float32)
        y = dev((2, 2, n, n))

        row = jax.jit(lambda t2, pre, preq, om, omq: _fourstep_row_call(
            t2, pre, preq, om, omq, row_tabs, cfg, n, n1, n2, block, False))
        col = jax.jit(lambda y: _fourstep_col_call(
            y, col_tabs, cfg, n, n1, n2, cblock, False))
        row_ms = traced_device_ms(row, (t2, pre, preq, om, omq), frames=8)
        col_ms = traced_device_ms(col, (y,), frames=8)
        print(json.dumps({"n": n, "precision": prec,
                          "row_ms": round(row_ms, 3),
                          "col_ms": round(col_ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
