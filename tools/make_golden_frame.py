"""Generate the production-window shaded golden frame artifact.

Runs the FULL fused production pipeline (step -> rasterize -> deferred
shade -> sRGB, ``render/raster.make_frame_renderer``) on CPU at the
reference's presented window (1200x700, ``/root/reference/src/lib.rs:48``)
on the shipped 512^2 assets, and stores the uint8 sRGB frame as a
compressed npz. ``tests/test_render.py::test_production_frame_golden``
asserts against it — the pin the reference's de-facto test (its presented
image, README.md:7) implies, which the coverage/z-equality guards alone
do not give (a silent shade.py constants change passes those).

Regenerate ONLY for an intended visual change:
    JAX_PLATFORMS=cpu python tools/make_golden_frame.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    import gfx_ocean_tpu as ot
    from gfx_ocean_tpu.render.camera import Camera, perspective
    from gfx_ocean_tpu.render.raster import make_frame_renderer

    w, h, t = 1200, 700, 11.25
    state = ot.ocean_state_from_assets()
    fr = make_frame_renderer(ot.OceanConfig(), width=w, height=h)
    vp = jnp.asarray((perspective(w / h) @ Camera().view()).astype(np.float32))
    cp = jnp.asarray(Camera().position.astype(np.float32))
    t0 = time.time()
    frame = np.asarray(fr(state, jnp.float32(t), vp, cp))
    print(f"rendered {frame.shape} in {time.time() - t0:.1f}s "
          f"(mean rgb {frame.reshape(-1, 3).mean(0)})")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data",
        "golden_frame_production_1200x700.npz")
    np.savez_compressed(out, frame=frame,
                        meta=np.array([w, h, 512], dtype=np.int64))
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
