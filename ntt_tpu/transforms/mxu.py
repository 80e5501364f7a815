"""MXU matmul NTT — the TPU-first flagship transform.

Same four-step/SSIP decomposition as :mod:`ntt_tpu.transforms.fourstep`
(the TPU re-derivation of the reference SSIP transform,
/root/reference/src/GZKP-NTT.cu:1452-1558), but the length-64 base
transforms run on the MXU: a 64-point NTT over F_p is a modular linear map,
so it is ONE int8 digit-plane matmul (see :mod:`ntt_tpu.digits`) instead of
6 radix-2 butterfly stages of VPU half-limb arithmetic.

Structure for n = 64^k * r (r <= 64):

    ntt(x, m):
      if m <= 64:   one MXU matmul against the cached m-point DFT
                    convolution matrix (digit planes of ω_m^{ik}·R·2^16)
      else:         reshape [64, m/64]; 64-point column NTTs (MXU);
                    decomposition twiddle ω_m^{k1·i2} (VPU mont_mul, device-
                    generated); transpose; recurse on rows of length m/64.

Per level the VPU does only digit extraction, one Montgomery wide-reduction,
and the twiddle product; all digit multiplication rides the MXU. This is the
multiply-roofline-seeking design BASELINE.md's speed-of-light model assumes
(2*(bits/digit)^2 MACs per modular product on the matrix unit).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .. import digits, limbs
from ..fields import Field
from .core import power_matrix

BASE_LOG = 6  # radix-64 base case
BASE = 1 << BASE_LOG

_matrix_cache: dict = {}


def _base_matrix(field: Field, m: int, inverse: bool) -> jnp.ndarray:
    """Digit convolution matrix of the m-point DFT (m <= 64), entries
    ω_m^{ik} * R * 2^16 mod p (pre-scaled for Montgomery-form-in/out,
    digits.apply_matrix contract)."""
    key = (field.name, m, inverse)
    got = _matrix_cache.get(key)
    if got is None:
        p = field.p
        w = field.inv_root_of_unity(m) if inverse else field.root_of_unity(m)
        scale = digits.matrix_prescale(field)
        wp = [pow(w, j, p) for j in range(m)]
        entries = [[wp[(i * k) % m] * scale % p for i in range(m)]
                   for k in range(m)]
        got = digits.conv_matrix(entries, field)  # cache host numpy only —
        # a cached jnp array would leak tracers across jit traces
        _matrix_cache[key] = got
    return jnp.asarray(got)


def _zmax_bits(field: Field, m: int) -> int:
    """Exact bound on one int32 accumulator entry: <= m * D * (2^7-1)^2."""
    bound = m * digits.n_digits(field) * digits.DIGIT_MASK ** 2
    return bound.bit_length()


def _base_ntt(x, field: Field, inverse: bool):
    """m <= 64 point NTT along axis 1 as one MXU matmul."""
    m = x.shape[1]
    if m == 1:
        return x
    A = _base_matrix(field, m, inverse)
    return digits.apply_matrix(A, x, field, m, _zmax_bits(field, m))


def twiddle_requests(m: int) -> list:
    """(m, n1, n2) decomposition-twiddle tables in consumption order (see
    fourstep.twiddle_requests)."""
    if m <= BASE:
        return []
    return [(m, BASE, m // BASE)] + twiddle_requests(m // BASE)


def ntt_axis_mxu(x, field: Field, inverse: bool = False, tws=None):
    """Full natural-order NTT along axis 1 of uint32[W, m, *batch]
    (Montgomery form in/out, no 1/n scaling) — MXU base transforms."""
    W, m = x.shape[0], x.shape[1]
    rest = x.shape[2:]
    if m <= BASE:
        return _base_ntt(x, field, inverse)
    n1, n2 = BASE, m // BASE
    omega = field.inv_root_of_unity(m) if inverse else field.root_of_unity(m)

    A = x.reshape((W, n1, n2) + rest)
    B = _base_ntt(A, field, inverse)                     # columns over i1
    T = next(tws) if tws is not None else power_matrix(
        field, omega, n1, n2)                            # ω_m^{k1·i2}
    C = limbs.mont_mul(B, T.reshape(T.shape + (1,) * len(rest)), field)
    Ct = jnp.moveaxis(C, 2, 1)                           # [W, i2, k1, *rest]
    D = ntt_axis_mxu(Ct, field, inverse, tws)            # rows over i2
    return D.reshape((W, m) + rest)                      # X[k2*n1 + k1]


def ntt_mxu(x, field: Field, inverse: bool = False, tws=None):
    """x: uint32[W, n] Montgomery form — flagship MXU transform."""
    return ntt_axis_mxu(x, field, inverse, tws=tws)
