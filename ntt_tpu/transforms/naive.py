"""Naive per-stage NTT over the flat coefficient vector.

The correctness anchor of the variant ladder — same role as the reference's
``naive`` kernel + ``NTT_GPU_Naive`` host loop
(/root/reference/src/GZKP-NTT.cu:59-113): one full pass over the data per
radix-2 stage (log n passes), bit-reversal up front, full-size twiddle table.
Natural-order in/out, Montgomery form in/out.
"""

from __future__ import annotations

from ..fields import Field
from .core import ntt_along_axis


def ntt_naive(x, field: Field, inverse: bool = False):
    """x: uint32[W, n] Montgomery form. Returns the forward (or inverse,
    unscaled) transform in natural order."""
    return ntt_along_axis(x, field, inverse=inverse)
