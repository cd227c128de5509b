from .complexpair import pair_to_complex, to_pair

__all__ = ["pair_to_complex", "to_pair"]
