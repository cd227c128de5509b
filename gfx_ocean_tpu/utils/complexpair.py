"""Complex arrays as (re, im) float32 plane pairs at the jit boundary.

Complex64 never crosses the host<->device boundary in this framework:

1. The axon TPU PJRT backend used in this environment does not implement
   complex64 host<->device transfers (verified empirically: ``device_put``
   of a complex64 array fails with UNIMPLEMENTED; complex math *inside* a
   jitted computation is fine — XLA decomposes it into real ops).
2. Pallas kernels cannot take complex refs at all; the fused step kernel
   needs the (re, im)-planes layout anyway.
3. On TPU a trailing complex dimension of 2 would sit in the lane axis and
   waste 126/128 of each register; a leading plane axis keeps (N, N) tiles.

Convention: a complex array of shape (..., N, N) is carried as float32
(..., 2, N, N) with plane 0 = real, plane 1 = imaginary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def to_pair(x: np.ndarray) -> np.ndarray:
    """Host-side: complex (..., N, N) -> float32 (..., 2, N, N)."""
    x = np.asarray(x)
    return np.stack([np.real(x), np.imag(x)], axis=-3).astype(np.float32)


def pair_to_complex(x: jnp.ndarray) -> jnp.ndarray:
    """Trace-side: float32 (..., 2, N, N) -> complex64 (..., N, N)."""
    return jax.lax.complex(x[..., 0, :, :], x[..., 1, :, :])


def from_pair_np(x: np.ndarray) -> np.ndarray:
    """Host-side inverse of ``to_pair`` (numpy, for tests/golden)."""
    x = np.asarray(x)
    return x[..., 0, :, :] + 1j * x[..., 1, :, :]
