from .fft import ifft1d_unnorm, ifft2_unnorm
from .propagate import propagate, wavenumber_grid
from .derived import correction, finite_difference_normals, jacobian_foam

__all__ = [
    "correction",
    "finite_difference_normals",
    "ifft1d_unnorm",
    "ifft2_unnorm",
    "jacobian_foam",
    "propagate",
    "wavenumber_grid",
]
