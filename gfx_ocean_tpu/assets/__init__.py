from .bincode import load_omega, load_spectrum, parse_bincode_f32, parse_bincode_vec2f

__all__ = [
    "load_omega",
    "load_spectrum",
    "parse_bincode_f32",
    "parse_bincode_vec2f",
]
