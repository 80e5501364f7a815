from .naive import ntt_naive
from .fourstep import ntt_fourstep

__all__ = ["ntt_naive", "ntt_fourstep"]
