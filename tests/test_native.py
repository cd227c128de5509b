"""Native C++ loader vs the pure-Python golden (byte-identical)."""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native():
    lib = os.path.join(REPO, "gfx_ocean_tpu", "native", "libocean_native.so")
    if not os.path.exists(lib):
        r = subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                           capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"native build unavailable: {r.stderr[:200]}")
    from gfx_ocean_tpu.native import bincode_native

    return bincode_native


def test_native_matches_python_parser(native):
    from gfx_ocean_tpu.assets import bincode

    spath = os.path.join(bincode.reference_data_dir(), "spectrum.bin")
    opath = os.path.join(bincode.reference_data_dir(), "omega.bin")
    with open(spath, "rb") as f:
        py_spec = bincode.parse_bincode_vec2f(f.read(), spath)
    with open(opath, "rb") as f:
        py_om = bincode.parse_bincode_f32(f.read(), opath)
    assert np.array_equal(native.parse_vec2f(spath), py_spec)
    assert np.array_equal(native.parse_f32(opath), py_om)


def test_native_rejects_corrupt(native, tmp_path):
    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"\x10\x00\x00\x00\x00\x00\x00\x00" + b"\x00" * 8)  # claims 16
    with pytest.raises(ValueError, match="size does not match"):
        native.parse_f32(str(bad))
    tiny = tmp_path / "tiny.bin"
    tiny.write_bytes(b"\x01")
    with pytest.raises(ValueError, match="too small"):
        native.parse_f32(str(tiny))
    with pytest.raises(ValueError, match="cannot open"):
        native.parse_f32(str(tmp_path / "missing.bin"))


def test_native_npy_writer_roundtrip(native, tmp_path, rng):
    arr = rng.standard_normal((3, 5, 7)).astype(np.float32)
    p = str(tmp_path / "a.npy")
    native.write_npy(p, arr)
    back = np.load(p)
    assert np.array_equal(back, arr)
    v = rng.standard_normal(11).astype(np.float32)
    native.write_npy(str(tmp_path / "v.npy"), v)
    assert np.array_equal(np.load(str(tmp_path / "v.npy")), v)


def test_native_timer_monotonic(native):
    a = native.now_ns()
    b = native.now_ns()
    assert b >= a > 0


def test_assets_loader_uses_native_when_built(native):
    """load_spectrum should route through the native parser transparently."""
    from gfx_ocean_tpu.assets import load_spectrum

    h0 = load_spectrum()
    assert h0.shape == (512, 512) and h0.dtype == np.complex64
