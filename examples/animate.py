#!/usr/bin/env python
"""Render an animated ocean GIF — the headless stand-in for the reference's
interactive demo window (README.md:7 links a video; this produces one).

Usage:
    python examples/animate.py [--frames 48] [--out ocean.gif]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=48)
    parser.add_argument("--fps", type=int, default=24)
    parser.add_argument("--width", type=int, default=300)
    parser.add_argument("--height", type=int, default=175)
    parser.add_argument("--samples", type=int, default=32)
    parser.add_argument("--keys", type=str, default="",
                        help="held keys during the flight (e.g. 'w' or 'w,left')")
    parser.add_argument("--out", type=str, default="ocean.gif")
    args = parser.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    import gfx_ocean_tpu as ot
    from gfx_ocean_tpu.render import render_frame
    from gfx_ocean_tpu.render.camera import Camera, scripted_camera

    state = ot.ocean_state_from_assets()
    cfg = ot.OceanConfig(compute_normals=False)
    step = ot.make_step(cfg)

    frames = []
    script = [(args.frames, args.keys.split(",") if args.keys else [])]
    for i, cam in scripted_camera(script, dt=1.0 / args.fps, camera=Camera()):
        fields = step(state, jnp.float32(i / args.fps))
        img = np.asarray(render_frame(
            fields.displacement, cam, width=args.width, height=args.height,
            samples=args.samples))
        srgb = (np.clip(img, 0.0, 1.0) ** (1 / 2.2) * 255).astype(np.uint8)
        frames.append(Image.fromarray(srgb))
        print(f"\rframe {i + 1}/{args.frames}", end="", flush=True)
    print()
    frames[0].save(args.out, save_all=True, append_images=frames[1:],
                   duration=int(1000 / args.fps), loop=0)
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 1024:.0f} KB)")


if __name__ == "__main__":
    main()
