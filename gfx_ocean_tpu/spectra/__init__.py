from .phillips import dispersion, phillips_spectrum, synthesize

__all__ = ["dispersion", "phillips_spectrum", "synthesize"]
