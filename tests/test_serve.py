"""Frame server: routes, payloads, error paths (the serving surface)."""

import io
import json
import threading
import urllib.request
import urllib.error

import numpy as np
import pytest

import gfx_ocean_tpu as ot
from gfx_ocean_tpu.models.ocean import downsample_state
from gfx_ocean_tpu.serve import serve


@pytest.fixture(scope="module")
def server():
    state = downsample_state(ot.ocean_state_from_assets(), 64)
    cfg = ot.OceanConfig(resolution=64, compute_normals=True)
    srv = serve(state, cfg, host="127.0.0.1", port=0)  # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", srv
    srv.shutdown()
    srv.server_close()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, r.read(), r.headers.get("Content-Type")


def test_health_and_config(server):
    base, _ = server
    code, body, ctype = _get(base + "/health")
    assert code == 200 and json.loads(body)["status"] == "ok"
    code, body, _ = _get(base + "/config")
    assert json.loads(body)["resolution"] == 64


def test_frame_npz(server):
    base, srv = server
    code, body, ctype = _get(base + "/frame?t=2.5")
    assert code == 200 and ctype == "application/octet-stream"
    with np.load(io.BytesIO(body)) as z:
        assert z["displacement"].shape == (64, 64, 3)
        assert z["normals"].shape == (64, 64, 3)
        assert float(z["t"]) == 2.5
        assert np.isfinite(z["displacement"]).all()
    # statelessness: same t -> identical frame
    _, body2, _ = _get(base + "/frame?t=2.5")
    with np.load(io.BytesIO(body)) as a, np.load(io.BytesIO(body2)) as b:
        assert np.array_equal(a["displacement"], b["displacement"])


def test_frame_png(server):
    base, _ = server
    code, body, ctype = _get(base + "/frame.png?t=1.0&w=64&h=48&samples=8")
    assert code == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_metrics_progress(server):
    base, srv = server
    before = json.loads(_get(base + "/metrics")[1])["frames_served"]
    _get(base + "/frame?t=9.0")
    after = json.loads(_get(base + "/metrics")[1])["frames_served"]
    assert after == before + 1
    assert json.loads(_get(base + "/metrics")[1])["latency_ema_sec"] > 0


def test_error_paths(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/frame?t=notanumber")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/frame.png?t=1&w=99999")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/nope")
    assert e.value.code == 404
