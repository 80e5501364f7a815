"""Digit-plane codec: field elements <-> int8 digit planes for MXU matmuls.

The TPU's fastest multiply engine is the MXU (128x128 systolic array), not
the VPU — so the framework's flagship transform moves the O(n log n) field
multiplications onto the MXU as *integer matmuls over digit planes*:

- A field element (Montgomery form, canonical < p) is decomposed into D
  digits of ``DIGIT_BITS`` = 7 bits, stored as int8 planes. 7-bit digits make
  int8 x int8 -> int32 accumulation exact: products are < 2^14 and a
  contraction of depth m*D (< 2^17 for the radix-64 base case) accumulates to
  < 2^31 with no overflow — a hard-integer analog of keeping matmuls on the
  MXU in low precision.
- A *modular linear map* Y = M @ X (mod p) becomes ONE int8 matmul with a
  host-precomputed "convolution matrix" A[(e,k),(d2,i)] = digit_{e-d2}(M̃[k,i])
  — the digit-product convolution sum Z[k,e] = Σ_{d1+d2=e} Σ_i
  digit_{d1}(M̃[k,i])·digit_{d2}(x[i]) is linear in x's digits, so it is a
  single [E*m, D*m] @ [D*m, B] contraction that XLA tiles straight onto the
  MXU.
- The matrix entries are pre-scaled to M̃ = M * R * 2^16 mod p so one
  Montgomery wide-reduction by 2^(16*(L+1)) (``limbs.mont_reduce_wide``)
  lands the result back in canonical Montgomery form: Σ M̃·x̄ · 2^{-16(L+1)}
  = Σ M·x·R = mont(M @ x). The bound Σ M̃·x̄ < m·p² < 2^{16(L+1)}·p holds
  for any m ≤ 2^16, so the reduction window never overflows.

Role in the reference's terms: this layer replaces the CGBN Montgomery
multiply inside the butterfly (/root/reference/src/big-num.cu:88-92,
include/cgbn/core/core_mont_wmad.cu:29-191) for the *matrix-structured* part
of the transform — the per-butterfly scalar products become per-stage MXU
contractions, which is the TPU-native way to reach the multiply roofline.
Only carry propagation and the final reduction remain on the VPU.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import limbs
from .fields import HALF_BITS, Field

DIGIT_BITS = 7
DIGIT_MASK = (1 << DIGIT_BITS) - 1


def n_digits(field: Field) -> int:
    """Digits per element (covers the full Montgomery width)."""
    return -(-field.mont_bits // DIGIT_BITS)


def extract_digits(x, field: Field) -> jnp.ndarray:
    """uint32[W, *b] word planes -> int8[D, *b] digit planes (little-endian
    base 2^DIGIT_BITS). All shifts are static; each digit costs 1-3 VPU ops."""
    W = field.n_words
    D = n_digits(field)
    planes = []
    for d in range(D):
        bitpos = DIGIT_BITS * d
        w0, r = bitpos >> 5, bitpos & 31
        if w0 >= W:
            planes.append(jnp.zeros_like(x[0]))
            continue
        v = x[w0] >> np.uint32(r)
        if r + DIGIT_BITS > 32 and w0 + 1 < W:
            v = v | (x[w0 + 1] << np.uint32(32 - r))
        planes.append(v & np.uint32(DIGIT_MASK))
    return jnp.stack(planes, axis=0).astype(jnp.int8)


def conv_matrix(entries, field: Field) -> np.ndarray:
    """Host build of the digit convolution matrix for a modular linear map.

    ``entries``: m x m nested list of Python ints (the map M̃, already
    pre-scaled by R*2^16 mod p — see :func:`apply_matrix`). Returns int8
    A[(e*m + k), (d2*m + i)] = digit_{e-d2}(M̃[k][i]), shape [E*m, D*m] with
    E = 2D-1.
    """
    m = len(entries)
    D = n_digits(field)
    E = 2 * D - 1
    digs = np.zeros((m, m, D), dtype=np.int8)
    for k in range(m):
        row = entries[k]
        for i in range(m):
            v = row[i]
            for t in range(D):
                digs[k, i, t] = (v >> (DIGIT_BITS * t)) & DIGIT_MASK
    A = np.zeros((E, m, D, m), dtype=np.int8)
    for d2 in range(D):
        for t in range(D):
            A[d2 + t, :, d2, :] = digs[:, :, t]
    return A.reshape(E * m, D * m)


def matrix_prescale(field: Field) -> int:
    """The factor baked into matrix entries: R * 2^16 mod p."""
    return (field.R << HALF_BITS) % field.p


def reduce_iters(field: Field) -> int:
    return field.n_halves + 1


def recompose_reduce(Z, field: Field, zmax_bits: int):
    """int32[E, m, *b] digit-plane accumulators (non-negative, < 2^zmax_bits)
    -> canonical Montgomery word planes uint32[W, m, *b]: re-base the digit
    sums to 16-bit half planes (lazy), then Montgomery wide-reduce by
    2^(16*(L+1))."""
    E = Z.shape[0]
    Zu = Z.astype(jnp.uint32)
    total_bits = DIGIT_BITS * (E - 1) + zmax_bits
    n_halves = -(-total_bits // HALF_BITS) + 1
    acc = [None] * n_halves

    def _add(idx, val):
        acc[idx] = val if acc[idx] is None else acc[idx] + val

    M = np.uint32(0xFFFF)
    for e in range(E):
        bitpos = DIGIT_BITS * e
        q, r = bitpos >> 4, bitpos & 15
        z = Zu[e]
        # z * 2^r spread over halves q, q+1, q+2 (z < 2^zmax_bits, r < 16)
        _add(q, ((z & M) << np.uint32(r)) & M)
        if r:
            _add(q + 1, (z >> np.uint32(16 - r)) & M)
        else:
            _add(q + 1, (z >> np.uint32(16)) & M)
        if zmax_bits + r > 32:
            _add(q + 2, z >> np.uint32(32 - r))
    zero = jnp.zeros_like(Zu[0])
    halves = [a if a is not None else zero for a in acc]
    return limbs.mont_reduce_wide(halves, field, reduce_iters(field))


def apply_matrix(A: jnp.ndarray, x, field: Field, m: int, zmax_bits: int):
    """Apply a digit convolution matrix (from :func:`conv_matrix`) to
    Montgomery-form data.

    x: uint32[W, m, *batch]  ->  uint32[W, m, *batch], the modular linear map
    mont(M @ x) along axis 1, computed as one int8 MXU matmul + one VPU
    Montgomery reduction.
    """
    W = field.n_words
    D = n_digits(field)
    E = 2 * D - 1
    rest = x.shape[2:]
    d = extract_digits(x, field)              # [D, m, *rest] int8

    def dot2(Xf):
        return jax.lax.dot_general(
            A, Xf, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    if len(rest) <= 1 or rest[-1] % 128 == 0:
        # Single matmul over the flattened batch. For peeled (>= 4-D)
        # views this merges trailing dims into the LANE dim — a shape
        # cast Mosaic supports only when the lane dim is 128-aligned
        # (AOT-verified: small 2^22 m=512 and BLS Bt=128 compile; BLS
        # Bt=64 does not) — hence the gate.
        Z = dot2(d.reshape(D * m, -1))        # [(e,k), B]
        Z = Z.reshape((E, m) + rest)
    else:
        # Sub-128-lane peeled views (multi-level recursion inside a
        # Pallas kernel at small batch): the lane merge fails Mosaic
        # layout inference ("unsupported shape cast" — found by the AOT
        # TPU compile, tools/tpucompile.py), so contract each
        # second-minor slice separately (static unrolled loop, small at
        # peel radices) and restack on the sublane side; the lane dim
        # never changes.
        B = rest[-1]
        mid = int(np.prod(rest[:-1]))
        d4 = d.reshape(D, m, mid, B)          # sublane-side split only
        Zs = [dot2(d4[:, :, j, :].reshape(D * m, B)).reshape(E, m, B)
              for j in range(mid)]
        Z = jnp.stack(Zs, axis=2).reshape((E, m) + rest)
    return recompose_reduce(Z, field, zmax_bits)
