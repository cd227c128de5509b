"""Refreshed viewer-loop FPS record (VERDICT r4 next-step #3).

Starts the REAL serve server on the TPU and drives the viewer protocol
exactly as the browser does — /session/strip.jpg at 960x540, n=4, two
strips in flight — and reports frames/sec through the full HTTP + JPEG
stack. Also measures the old single-frame loop (two /session/frame.jpg
in flight) for the before/after, and the 1200x700 strip loop.

Usage: python tools/prof_strip_serve.py
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def drive(base: str, path: str, frames_per_req: int, total_frames: int) -> dict:
    def get(timeout: int = 120):
        with urllib.request.urlopen(base + path, timeout=timeout) as r:
            return r.read()

    # warm: this route's viewport key may need a fresh compile (minutes
    # through the tunnel)
    get(timeout=1800)
    reqs = max(2, total_frames // frames_per_req)
    pool = ThreadPoolExecutor(max_workers=2)
    t0 = time.perf_counter()
    nxt = pool.submit(get)
    nbytes = 0
    for _ in range(reqs - 1):
        cur, nxt = nxt, pool.submit(get)   # two in flight
        nbytes += len(cur.result())
    nbytes += len(nxt.result())
    dt = time.perf_counter() - t0
    frames = reqs * frames_per_req
    return {"frames": frames, "fps": round(frames / dt, 1),
            "ms_per_frame": round(dt / frames * 1e3, 1),
            "kb_per_frame": round(nbytes / frames / 1e3, 1)}


def main() -> None:
    from gfx_ocean_tpu.cli import _honor_platform_env

    _honor_platform_env()
    import gfx_ocean_tpu as ot
    from gfx_ocean_tpu.serve import serve
    from gfx_ocean_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    state = ot.ocean_state_from_assets()
    srv = serve(state, ot.OceanConfig(), host="127.0.0.1", port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    out = {}
    out["single_960x540"] = drive(base, "/session/frame.jpg?w=960&h=540",
                                  1, 60)
    out["strip4_960x540"] = drive(base, "/session/strip.jpg?w=960&h=540&n=4",
                                  4, 120)
    out["strip8_960x540"] = drive(base, "/session/strip.jpg?w=960&h=540&n=8",
                                  8, 160)
    out["strip4_1200x700"] = drive(base,
                                   "/session/strip.jpg?w=1200&h=700&n=4",
                                   4, 80)
    met = json.loads(urllib.request.urlopen(base + "/metrics",
                                            timeout=30).read())
    out["server_latency_ema_ms"] = round(met["latency_ema_sec"] * 1e3, 1)
    print(json.dumps(out), flush=True)
    srv.shutdown()


if __name__ == "__main__":
    main()
