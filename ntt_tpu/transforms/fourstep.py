"""Four-step (self-sorting) NTT — the flagship transform.

This is the TPU-native re-derivation of the reference's SSIP two-stage
self-sort-in-place transform (/root/reference/src/GZKP-NTT.cu:1452-1558,
CPU spec self-sort-in-place.cu:79-128): split log n into a top and a bottom
half so both halves get on-chip locality, fuse the decomposition twiddle,
and make the inter-half data exchange one dense transpose instead of
scattered bit-reversed addressing.

Derivation (natural order in/out, no bit-reversal pass over the full vector):
with n = n1*n2, i = i1*n2 + i2, k = k2*n1 + k1 and ω the n-th root,

    X[k2*n1 + k1] = Σ_{i2} ω_{n2}^{i2 k2} · ω^{i2 k1} · Σ_{i1} x[i1*n2+i2] ω_{n1}^{i1 k1}

so the algorithm is:

    1. reshape x -> A[i1, i2]            (free)
    2. column NTTs of length n1          (≙ SSIP stage 1 sub-FFTs)
    3. multiply by T[k1, i2] = ω^{k1·i2} (≙ SSIP decomposition twiddle,
                                          GZKP-NTT.cu:1346-1356; T is
                                          generated on device, ~1 stage cost)
    4. transpose                         (≙ SSIP stage-2 mirrored-pair
                                          exchange; on one chip a relayout,
                                          across chips one all-to-all —
                                          see ntt_tpu.parallel)
    5. column NTTs of length n2          (≙ SSIP stage 2 sub-FFTs)
    6. flatten                           -> X in natural order

Montgomery form in/out; inverse runs the same graph with ω^{-1} masters
(scaling by n^{-1} is applied by the API layer).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import limbs
from ..fields import Field
from .core import ntt_along_axis, power_matrix, split_log


def ntt_fourstep(x, field: Field, inverse: bool = False):
    """x: uint32[W, n] Montgomery form, n a power of two >= 4."""
    W, n = x.shape
    n1, n2 = split_log(n)
    if n2 == 1:
        return ntt_along_axis(x, field, inverse=inverse)
    omega = field.inv_root_of_unity(n) if inverse else field.root_of_unity(n)

    A = x.reshape(W, n1, n2)
    B = ntt_along_axis(A, field, inverse=inverse)         # over i1 -> k1
    T = power_matrix(field, omega, n1, n2)                # ω^{k1·i2}
    C = limbs.mont_mul(B, T, field)
    Ct = jnp.transpose(C, (0, 2, 1))                      # [W, i2, k1]
    D = ntt_along_axis(Ct, field, inverse=inverse)        # over i2 -> k2
    return D.reshape(W, n)                                # X[k2*n1 + k1]
