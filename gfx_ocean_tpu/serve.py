"""Frame server: the deployment surface of the engine.

The reference is a windowed demo; the production analog of "present a
frame" is serving computed fields over HTTP. A deliberately dependency-free
stdlib server (ThreadingHTTPServer) wraps one jitted ``step``:

    GET /health            -> {"status": "ok", "device": ...}
    GET /config            -> the OceanConfig as JSON
    GET /frame?t=12.5      -> .npz of (displacement[, normals][, foam])
    GET /frame.png?t=12.5  -> rendered PNG along the default camera
                              (&w=&h=&samples= override the viewport)
    GET /metrics           -> frames served, error count, latency EMA
                              (the reference's title-bar EMA, src/lib.rs:146-148)

Computation is serialized behind a lock (one TPU executable, in-order
device queue); the threaded server still overlaps request parsing and
response IO. The sim being stateless in time, every request is
independently addressable by absolute ``t`` — a cache-friendly,
horizontally scalable design: replicas need only (h0, omega).
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from gfx_ocean_tpu.config import OceanConfig
from gfx_ocean_tpu.models.ocean import OceanState, make_step
from gfx_ocean_tpu.utils.profiling import Ema


class FrameService:
    """Engine wrapper: jitted step + serialization + metrics."""

    def __init__(self, state: OceanState, config: OceanConfig):
        import dataclasses

        self.state = state
        self.config = config
        self.config_json = json.dumps(dataclasses.asdict(config))
        self._step = make_step(config)
        self._lock = threading.Lock()
        self.frames_served = 0
        self.errors = 0
        self.latency_ema = Ema()

    def fields(self, t: float):
        import jax.numpy as jnp

        t0 = time.perf_counter()
        with self._lock:
            out = self._step(self.state, jnp.float32(t))
            arrays = {"displacement": np.asarray(out.displacement), "t": np.float64(t)}
            if out.normals is not None:
                arrays["normals"] = np.asarray(out.normals)
            if out.foam is not None:
                arrays["foam"] = np.asarray(out.foam)
        self.latency_ema.update(time.perf_counter() - t0)
        self.frames_served += 1
        return arrays

    def frame_npz(self, t: float) -> bytes:
        buf = io.BytesIO()
        np.savez(buf, **self.fields(t))
        return buf.getvalue()

    def frame_png(self, t: float, width: int, height: int, samples: int) -> bytes:
        from PIL import Image  # noqa: PLC0415

        from gfx_ocean_tpu.render import render_frame  # noqa: PLC0415
        from gfx_ocean_tpu.render.camera import Camera  # noqa: PLC0415

        disp = self.fields(t)["displacement"]
        img = np.asarray(render_frame(
            disp, Camera(), width=width, height=height,
            mesh_resolution=self.config.mesh_resolution,
            num_patches=self.config.num_patches, samples=samples))
        srgb = (np.clip(img, 0.0, 1.0) ** (1 / 2.2) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(srgb).save(buf, format="PNG")
        return buf.getvalue()

    def metrics(self) -> dict:
        import jax

        return {
            "frames_served": self.frames_served,
            "errors": self.errors,
            "latency_ema_sec": round(self.latency_ema.value, 6),
            "device": str(jax.devices()[0]),
            "resolution": self.config.resolution,
        }


def _make_handler(service: FrameService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet; metrics cover observability
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):  # noqa: N802
            try:
                url = urlparse(self.path)
                q = parse_qs(url.query)
                if url.path == "/health":
                    import jax

                    self._json(200, {"status": "ok",
                                     "device": str(jax.devices()[0])})
                elif url.path == "/config":
                    self._send(200, service.config_json.encode(), "application/json")
                elif url.path == "/metrics":
                    self._json(200, service.metrics())
                elif url.path == "/frame":
                    t = float(q.get("t", ["0"])[0])
                    self._send(200, service.frame_npz(t), "application/octet-stream")
                elif url.path == "/frame.png":
                    t = float(q.get("t", ["0"])[0])
                    w = int(q.get("w", ["300"])[0])
                    h = int(q.get("h", ["175"])[0])
                    s = int(q.get("samples", ["24"])[0])
                    if not (16 <= w <= 2048 and 16 <= h <= 2048 and 4 <= s <= 128):
                        raise ValueError("viewport out of range")
                    self._send(200, service.frame_png(t, w, h, s), "image/png")
                else:
                    self._json(404, {"error": f"no route {url.path}"})
            except (ValueError, KeyError) as e:
                service.errors += 1
                self._json(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001
                service.errors += 1
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(state: OceanState, config: OceanConfig, host: str = "127.0.0.1",
          port: int = 8807) -> ThreadingHTTPServer:
    """Start the frame server (returns it; call ``serve_forever`` or use
    the CLI which does). A warmup frame is computed first so the first
    request does not pay the jit compile."""
    service = FrameService(state, config)
    service.fields(0.0)  # warmup: compile + first transfer
    server = ThreadingHTTPServer((host, port), _make_handler(service))
    server.service = service  # for tests/metrics access
    return server
