"""Loader for the reference's bincode-serialized initial conditions.

The reference embeds ``data/spectrum.bin`` (``Vec<[f32; 2]>``, the initial
complex height spectrum h0(k)) and ``data/omega.bin`` (``Vec<f32>``, the
precomputed deep-water dispersion omega(k)) and deserializes them with
bincode 1.x at ``src/render.rs:769-771`` and ``:808-810``.

The wire format (bincode 1.x default options) is trivially simple:
a u64 little-endian element count followed by the packed payload.
For ``spectrum.bin``: count = N*N, payload = N*N * 2 * f32-LE.
For ``omega.bin``:    count = N*N, payload = N*N * f32-LE.

Flat index convention is ``index = x + N * y`` (``shader/propagate.comp:42``),
so reshaping row-major to (N, N) yields ``array[y, x]``.

A zero-copy C++ parser (``native/``) is used when the shared library has been
built (it memory-maps the file and validates the header); this pure-numpy
implementation is the always-available fallback and the golden reference for
the native one.
"""

from __future__ import annotations

import os
import struct

import numpy as np

def reference_data_dir() -> str:
    """Directory holding the reference's shipped bins.

    Overridable with GFX_OCEAN_REFERENCE_DATA (resolved per call, so test
    harnesses can point it at generated fixtures — see tests/conftest.py,
    which synthesizes Phillips assets on hosts without the reference
    checkout).
    """
    return os.environ.get("GFX_OCEAN_REFERENCE_DATA", "/root/reference/data")


def _read_header(buf: bytes, path: str) -> int:
    if len(buf) < 8:
        raise ValueError(f"{path}: too short for a bincode header")
    (count,) = struct.unpack_from("<Q", buf, 0)
    return count


def parse_bincode_f32(buf: bytes, path: str = "<bytes>") -> np.ndarray:
    """Parse a bincode ``Vec<f32>`` into a 1-D float32 array."""
    count = _read_header(buf, path)
    expected = 8 + 4 * count
    if len(buf) != expected:
        raise ValueError(f"{path}: expected {expected} bytes for Vec<f32> of len {count}, got {len(buf)}")
    return np.frombuffer(buf, dtype="<f4", count=count, offset=8)


def parse_bincode_vec2f(buf: bytes, path: str = "<bytes>") -> np.ndarray:
    """Parse a bincode ``Vec<[f32; 2]>`` into an (n, 2) float32 array."""
    count = _read_header(buf, path)
    expected = 8 + 8 * count
    if len(buf) != expected:
        raise ValueError(f"{path}: expected {expected} bytes for Vec<[f32;2]> of len {count}, got {len(buf)}")
    return np.frombuffer(buf, dtype="<f4", count=2 * count, offset=8).reshape(count, 2)


def _native_loader():
    try:
        from gfx_ocean_tpu.native import bincode_native  # noqa: PLC0415

        return bincode_native
    except Exception:
        return None


def load_spectrum(path: str | None = None, resolution: int = 512) -> np.ndarray:
    """Load h0(k) as a complex64 (N, N) array indexed [y, x].

    Defaults to the reference's shipped ``data/spectrum.bin``.
    """
    path = path or os.path.join(reference_data_dir(), "spectrum.bin")
    native = _native_loader()
    if native is not None:
        flat = native.parse_vec2f(path)
    else:
        with open(path, "rb") as f:
            flat = parse_bincode_vec2f(f.read(), path)
    n2 = flat.shape[0]
    n = int(round(n2 ** 0.5))
    if n * n != n2:
        raise ValueError(f"{path}: element count {n2} is not a perfect square")
    if resolution is not None and n != resolution:
        raise ValueError(f"{path}: resolution {n} != expected {resolution}")
    return (flat[:, 0] + 1j * flat[:, 1]).astype(np.complex64).reshape(n, n)


def load_omega(path: str | None = None, resolution: int = 512) -> np.ndarray:
    """Load omega(k) as a float32 (N, N) array indexed [y, x].

    Defaults to the reference's shipped ``data/omega.bin``.
    """
    path = path or os.path.join(reference_data_dir(), "omega.bin")
    native = _native_loader()
    if native is not None:
        flat = native.parse_f32(path)
    else:
        with open(path, "rb") as f:
            flat = parse_bincode_f32(f.read(), path)
    n2 = flat.shape[0]
    n = int(round(n2 ** 0.5))
    if n * n != n2:
        raise ValueError(f"{path}: element count {n2} is not a perfect square")
    if resolution is not None and n != resolution:
        raise ValueError(f"{path}: resolution {n} != expected {resolution}")
    return np.asarray(flat, dtype=np.float32).reshape(n, n)


def save_spectrum(path: str, h0: np.ndarray) -> None:
    """Write h0 back out in the reference's bincode format (round-trip)."""
    h0 = np.asarray(h0)
    n2 = h0.shape[0] * h0.shape[1]
    flat = np.empty((n2, 2), dtype="<f4")
    flat[:, 0] = np.real(h0).reshape(-1)
    flat[:, 1] = np.imag(h0).reshape(-1)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n2))
        f.write(flat.tobytes())


def save_omega(path: str, omega: np.ndarray) -> None:
    """Write omega back out in the reference's bincode format (round-trip)."""
    omega = np.asarray(omega, dtype="<f4")
    n2 = omega.shape[0] * omega.shape[1]
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n2))
        f.write(omega.reshape(-1).tobytes())
