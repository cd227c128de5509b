"""ctypes wrapper over libocean_native.so (see ``native/ocean_native.cpp``).

Build with ``make -C native``. Importing this module raises ImportError when
the library is absent; callers (``assets/bincode.py``) catch that and fall
back to the pure-Python parser, which is also the golden reference for
these functions (byte-identical outputs, tested in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libocean_native.so")
if not os.path.exists(_LIB_PATH):
    raise ImportError(f"native library not built: {_LIB_PATH} (run `make -C native`)")

_lib = ctypes.CDLL(_LIB_PATH)

_lib.on_bincode_count.restype = ctypes.c_int64
_lib.on_bincode_count.argtypes = [ctypes.c_char_p, ctypes.c_int64]
_lib.on_load_f32.restype = ctypes.c_int64
_lib.on_load_f32.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                             ctypes.c_int64]
_lib.on_load_vec2f.restype = ctypes.c_int64
_lib.on_load_vec2f.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                               ctypes.c_int64]
_lib.on_write_npy_f32.restype = ctypes.c_int64
_lib.on_write_npy_f32.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                  ctypes.POINTER(ctypes.c_int64), ctypes.c_int32]
_lib.on_now_ns.restype = ctypes.c_int64
_lib.on_now_ns.argtypes = []

_ERRORS = {
    -1: "cannot open file",
    -2: "cannot stat file",
    -3: "file too small for bincode header",
    -4: "payload size does not match length prefix",
    -5: "mmap failed",
    -6: "write failed",
    -7: "invalid argument",
}


def _check(status: int, path: str) -> int:
    if status < 0:
        raise ValueError(f"{path}: {_ERRORS.get(status, f'native error {status}')}")
    return status


def count(path: str, components: int = 1) -> int:
    return _check(_lib.on_bincode_count(path.encode(), components), path)


def parse_f32(path: str) -> np.ndarray:
    """Load a bincode Vec<f32> -> (n,) float32."""
    n = count(path, 1)
    out = np.empty(n, dtype=np.float32)
    _check(_lib.on_load_f32(path.encode(),
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n),
           path)
    return out


def parse_vec2f(path: str) -> np.ndarray:
    """Load a bincode Vec<[f32; 2]> -> (n, 2) float32."""
    n = count(path, 2)
    out = np.empty((n, 2), dtype=np.float32)
    _check(_lib.on_load_vec2f(path.encode(),
                              out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n),
           path)
    return out


def write_npy(path: str, array: np.ndarray) -> None:
    """Write a float32 array as .npy v1 (numpy-compatible)."""
    arr = np.ascontiguousarray(array, dtype=np.float32)
    shape = (ctypes.c_int64 * arr.ndim)(*arr.shape)
    _check(_lib.on_write_npy_f32(path.encode(),
                                 arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                                 shape, arr.ndim),
           path)


def now_ns() -> int:
    """Monotonic nanoseconds (CLOCK_MONOTONIC_RAW)."""
    return int(_lib.on_now_ns())
