"""Public API: forward/inverse/coset NTT and low-degree extension.

Conventions (matching the reference semantics, SURVEY.md §7):

- natural order in, natural order out;
- ``inverse=True`` runs the transform with ω^{-1} and scales by n^{-1}
  (the reference's roundtrip convention, GZKP-NTT.cu:1725-1732);
- ``mont_io=True`` takes and returns Montgomery-form limbs and skips the
  conversion passes (BASELINE.json config 2);
- arrays are limb-leading ``uint32[W, n]`` (see ``ntt_tpu.limbs``).

Every (field, n, flags) combination is traced and compiled once and cached.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import limbs
from .fields import Field, get_field, inv_mod
from .transforms.core import geometric_outer, ntt_along_axis, split_log
from .transforms.fourstep import ntt_fourstep, ntt_fourstep_pallas
from .transforms.mxu import ntt_mxu
from .transforms.naive import ntt_naive

ALGORITHMS = {
    "naive": ntt_naive,
    "fourstep": ntt_fourstep,
    "pallas": ntt_fourstep_pallas,
    "mxu": ntt_mxu,
}

_compiled_cache: dict = {}


def _scale_by_const(x, c_int: int, field: Field):
    """Multiply every element by the constant c (standard-form int):
    mont_mul by mont(c)."""
    c = limbs.const_planes(field.to_mont_int(c_int), field, ndim=x.ndim - 1)
    return limbs.mont_mul(x, c, field)


def _coset_powers_flat(field: Field, shift: int, n: int):
    n1, n2 = split_log(n)
    return geometric_outer(field, shift, n1, n2).reshape(field.n_words, n)


def _build(field: Field, n: int, inverse: bool, algorithm: str,
           mont_io: bool, coset_shift):
    fn = ALGORITHMS[algorithm]

    def run(x):
        if not mont_io:
            x = limbs.to_mont(x, field)
        if coset_shift is not None and not inverse:
            x = limbs.mont_mul(
                x, _coset_powers_flat(field, coset_shift, n), field)
        y = fn(x, field, inverse=inverse)
        if inverse:
            y = _scale_by_const(y, inv_mod(n, field.p), field)
            if coset_shift is not None:
                y = limbs.mont_mul(
                    y,
                    _coset_powers_flat(
                        field, inv_mod(coset_shift, field.p), n),
                    field)
        if not mont_io:
            y = limbs.from_mont(y, field)
        return y

    return jax.jit(run)


def _get_compiled(field: Field, n: int, inverse: bool, algorithm: str,
                  mont_io: bool, coset_shift):
    key = (field.name, n, inverse, algorithm, mont_io, coset_shift)
    got = _compiled_cache.get(key)
    if got is None:
        got = _build(field, n, inverse, algorithm, mont_io, coset_shift)
        _compiled_cache[key] = got
    return got


def ntt(x, field: Field | str, inverse: bool = False,
        algorithm: str = "fourstep", mont_io: bool = False,
        coset_shift: int | None = None):
    """Number Theoretic Transform of ``x`` (uint32[W, n], natural order).

    Forward: X[k] = Σ_i x[i]·ω_n^{ik} mod p, with ω_n = g^((p-1)/n) —
    identical semantics to the reference golden NTT (GZKP-NTT.cu:30-48).
    """
    if isinstance(field, str):
        field = get_field(field)
    n = x.shape[-1]
    assert n & (n - 1) == 0, "transform size must be a power of two"
    assert x.shape[0] == field.n_words, (
        f"expected limb-leading uint32[{field.n_words}, n], got {x.shape}")
    return _get_compiled(field, n, inverse, algorithm, mont_io,
                         coset_shift)(x)


def intt(x, field: Field | str, **kw):
    """Inverse NTT including the 1/n scaling."""
    return ntt(x, field, inverse=True, **kw)


def coset_ntt(x, field: Field | str, shift: int | None = None, **kw):
    """NTT over the coset shift·<ω_n> (polynomial-commitment workloads;
    BASELINE.json config 4)."""
    if isinstance(field, str):
        field = get_field(field)
    shift = field.generator if shift is None else shift
    return ntt(x, field, coset_shift=shift, **kw)


def coset_intt(x, field: Field | str, shift: int | None = None, **kw):
    if isinstance(field, str):
        field = get_field(field)
    shift = field.generator if shift is None else shift
    return ntt(x, field, inverse=True, coset_shift=shift, **kw)


def lde(x, field: Field | str, blowup: int = 4, shift: int | None = None,
        algorithm: str = "fourstep"):
    """Low-degree extension: interpolate the n evaluations, then evaluate on
    a coset domain of size blowup*n (zero-pad coefficients + coset NTT)."""
    if isinstance(field, str):
        field = get_field(field)
    shift = field.generator if shift is None else shift
    W, n = x.shape
    coeffs = intt(x, field, algorithm=algorithm)
    padded = jnp.concatenate(
        [coeffs, jnp.zeros((W, n * (blowup - 1)), dtype=jnp.uint32)], axis=1)
    return coset_ntt(padded, field, shift=shift, algorithm=algorithm)
