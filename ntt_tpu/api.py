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
from .transforms import core as _core
from .transforms import fourstep as _fourstep
from .transforms import mxu as _mxu
from .transforms.core import host_power_matrix, host_powers_fast
from .transforms.fourstep import (ntt_fourstep, ntt_fourstep_pallas,
                                  ntt_fourstep_pallas_fused,
                                  ntt_fourstep_stockham)
from .transforms.mxu import ntt_mxu, ntt_mxu_pallas
from .transforms.naive import ntt_naive

#: tables up to this many elements are built host-side (exact, cheap);
#: bigger ones are generated ON DEVICE once by the log-doubling generator —
#: shipping a 0.5GB host table through the remote-device tunnel is far
#: slower than one small generation graph
_HOST_TW_LIMIT = 1 << 18


def _tw_tables(field, n, inverse, requests):
    from .transforms.core import power_matrix_chunked
    out = []
    for (m, n1, n2) in requests:
        w = field.inv_root_of_unity(m) if inverse else field.root_of_unity(m)
        if n1 * n2 <= _HOST_TW_LIMIT:
            out.append(jnp.asarray(host_power_matrix(field, w, n1, n2)))
        else:
            out.append(jax.jit(
                lambda field=field, w=w, n1=n1, n2=n2: power_matrix_chunked(
                    field, w, n1, n2))())
    return out


def _prep_fourstep(base_max):
    def prep(field, n, inverse):
        return {"tws": _tw_tables(
            field, n, inverse,
            _fourstep.twiddle_requests(n, base_max, field))}
    return prep


def _prep_mxu(field, n, inverse):
    return {"tws": _tw_tables(field, n, inverse, _mxu.twiddle_requests(n)),
            "mats": _mxu.base_mats(field, n, inverse)}


def _prep_mxu_fused(field, n, inverse):
    return {"tws": _mxu.expanded_twiddles(field, n, inverse),
            "mats": _mxu.base_mats(field, n, inverse)}


def _prep_mxu_chunked(field, n, inverse):
    return {"tws": _tw_tables(
                field, n, inverse,
                _fourstep.twiddle_requests(n, _mxu.BASE, field)),
            "mats": _mxu.base_mats(field, n, inverse, residency=True)}


#: algorithm -> (fn(x, field, inverse, aux), prepare(field, n, inverse) ->
#: aux pytree of device arrays). ALL data-sized tables (decomposition
#: twiddles, base conv matrices) live in aux and enter jit as arguments —
#: embedding them as constants bloats/OOMs compiles and breaks outer-jit
#: composition (e.g. the benchmark chain loop).
ALGORITHMS = {
    "naive": (lambda x, field, inverse, aux: ntt_naive(
        x, field, inverse=inverse), lambda field, n, inverse: {}),
    "stockham": (lambda x, field, inverse, aux: _core.ntt_along_axis_stockham(
        x, field, inverse=inverse), lambda field, n, inverse: {}),
    "fourstep": (lambda x, field, inverse, aux: ntt_fourstep(
        x, field, inverse, iter(aux["tws"])),
        _prep_fourstep(_fourstep.BASE_MAX)),
    "fourstep_st": (lambda x, field, inverse, aux: ntt_fourstep_stockham(
        x, field, inverse, iter(aux["tws"])),
        _prep_fourstep(_fourstep.BASE_MAX)),
    "pallas": (lambda x, field, inverse, aux: ntt_fourstep_pallas(
        x, field, inverse, iter(aux["tws"])),
        _prep_fourstep(_fourstep.PALLAS_BASE_MAX)),
    "mxu": (lambda x, field, inverse, aux: ntt_mxu(
        x, field, inverse, iter(aux["tws"]), aux["mats"]), _prep_mxu),
    "mxu_pallas": (lambda x, field, inverse, aux: ntt_mxu_pallas(
        x, field, inverse, iter(aux["tws"]), aux["mats"]), _prep_mxu),
    "mxu_fused": (lambda x, field, inverse, aux: _mxu.ntt_mxu_fused(
        x, field, inverse, iter(aux["tws"]), aux["mats"]), _prep_mxu_fused),
    "pallas_fused": (lambda x, field, inverse, aux: ntt_fourstep_pallas_fused(
        x, field, inverse, iter(aux["tws"])),
        lambda field, n, inverse: {"tws": _mxu.expanded_twiddles(
            field, n, inverse, base=_fourstep.FUSED_M)}),
    "mxu_chunked": (lambda x, field, inverse, aux: _mxu.ntt_mxu_chunked(
        x, field, inverse, iter(aux["tws"]), aux["mats"]),
        _prep_mxu_chunked),
}

_compiled_cache: dict = {}


def resolve_algorithm(algorithm: str, field: Field, n: int) -> str:
    """'auto' picks per size (measured on v5e, docs/DESIGN.md): the VPU
    butterfly-ladder four-step wins while the working set stays VMEM-
    resident; above that the MXU digit-matmul base through the chunked
    recursion is ~2x faster (142ms vs 300ms+ at 2^22 BLS)."""
    if algorithm != "auto":
        return algorithm
    from .transforms.core import CHUNK_SINGLE
    big = field.n_words * n * 4 > CHUNK_SINGLE
    # the MXU-at-scale win is measured on 256-bit fields; narrow fields
    # (small Proth, Goldilocks) have far cheaper VPU ladders and stay on
    # fourstep (2^26 small-proth: 158ms via fourstep)
    return "mxu_chunked" if (big and field.n_words >= 8) else "fourstep"


def _scale_by_const(x, c_int: int, field: Field):
    """Multiply every element by the constant c (standard-form int):
    mont_mul by mont(c)."""
    c = limbs.const_planes(field.to_mont_int(c_int), field, ndim=x.ndim - 1)
    return limbs.mont_mul(x, c, field)


def get_runner(field: Field, n: int, inverse: bool, algorithm: str,
               mont_io: bool, coset_shift):
    """(run, aux): ``run(x, aux)`` is a pure traceable function and ``aux``
    the pytree of device-resident tables it consumes. Wrap run in your own
    jit (benchmark chain loops etc.) passing aux as an argument — never
    close over it."""
    algorithm = resolve_algorithm(algorithm, field, n)
    fn, prepare = ALGORITHMS[algorithm]
    aux = prepare(field, n, inverse)
    if coset_shift is not None:
        shift = coset_shift if not inverse else inv_mod(coset_shift, field.p)
        if n <= _HOST_TW_LIMIT:
            aux["coset"] = jnp.asarray(host_powers_fast(field, shift, n))
        else:
            from .transforms.core import geometric_outer_chunked
            aux["coset"] = jax.jit(
                lambda: geometric_outer_chunked(field, shift, n))()

    from .transforms.core import chunked_along_axis

    def run(x, aux):
        batch_dims = x.ndim - 2  # [W, n, *batch]
        if not mont_io:
            x = chunked_along_axis(
                lambda c: limbs.to_mont(c, field), x, axis=1)
        if coset_shift is not None and not inverse:
            cs = aux["coset"].reshape(aux["coset"].shape + (1,) * batch_dims)
            x = chunked_along_axis(
                lambda c, t: limbs.mont_mul(c, t, field), x, axis=1, also=cs)
        y = fn(x, field, inverse, aux)
        if inverse:
            y = chunked_along_axis(
                lambda c: _scale_by_const(c, inv_mod(n, field.p), field),
                y, axis=1)
            if coset_shift is not None:
                cs = aux["coset"].reshape(
                    aux["coset"].shape + (1,) * batch_dims)
                y = chunked_along_axis(
                    lambda c, t: limbs.mont_mul(c, t, field), y, axis=1,
                    also=cs)
        if not mont_io:
            y = chunked_along_axis(
                lambda c: limbs.from_mont(c, field), y, axis=1)
        return y

    return run, aux


def _build(field: Field, n: int, inverse: bool, algorithm: str,
           mont_io: bool, coset_shift):
    run, aux = get_runner(field, n, inverse, algorithm, mont_io, coset_shift)
    jitted = jax.jit(run)
    return lambda x: jitted(x, aux)


def _get_compiled(field: Field, n: int, inverse: bool, algorithm: str,
                  mont_io: bool, coset_shift):
    key = (field.name, n, inverse, algorithm, mont_io, coset_shift)
    got = _compiled_cache.get(key)
    if got is None:
        got = _build(field, n, inverse, algorithm, mont_io, coset_shift)
        _compiled_cache[key] = got
    return got


def ntt(x, field: Field | str, inverse: bool = False,
        algorithm: str = "auto", mont_io: bool = False,
        coset_shift: int | None = None):
    """Number Theoretic Transform of ``x`` (uint32[W, n] or batched
    uint32[W, n, *batch]; transforms along axis 1, natural order).

    Forward: X[k] = Σ_i x[i]·ω_n^{ik} mod p, with ω_n = g^((p-1)/n) —
    identical semantics to the reference golden NTT (GZKP-NTT.cu:30-48).
    """
    if isinstance(field, str):
        field = get_field(field)
    n = x.shape[1]
    assert n & (n - 1) == 0, "transform size must be a power of two"
    assert x.shape[0] == field.n_words, (
        f"expected limb-leading uint32[{field.n_words}, n, *batch], "
        f"got {x.shape}")
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


def ramp_mont(field: Field | str, n: int):
    """The de-facto reference test vector (ramp 0..n-1, SURVEY.md §4) in
    Montgomery form, built ON DEVICE with chunked conversion — the shared
    input builder for benchmarks (a full-vector to_mont at 2^24 otherwise
    exhausts HBM with lazy-CIOS temporaries)."""
    if isinstance(field, str):
        field = get_field(field)
    from .transforms.core import chunked_along_axis

    def make():
        i = jnp.arange(n, dtype=jnp.uint32)
        planes = [i] + [jnp.zeros(n, jnp.uint32)] * (field.n_words - 1)
        x = jnp.stack(planes, axis=0)
        return chunked_along_axis(
            lambda c: limbs.to_mont(c, field), x, axis=1)

    x = jax.jit(make)()
    x.block_until_ready()
    return x


def polymul(a, b, field: Field | str, algorithm: str = "auto",
            cyclic: bool = False):
    """Polynomial product via NTT (the canonical ZKP workload).

    ``a``, ``b``: coefficient vectors uint32[W, n] (same n). With
    ``cyclic=True`` returns the length-n cyclic convolution; otherwise the
    full product of degree < 2n-1, computed on the 2n-point domain
    (zero-padded), returned as uint32[W, 2n].
    """
    if isinstance(field, str):
        field = get_field(field)
    W, n = a.shape[0], a.shape[1]
    assert b.shape == a.shape
    if not cyclic:
        pad = jnp.zeros((W, n), dtype=jnp.uint32)
        a = jnp.concatenate([a, pad], axis=1)
        b = jnp.concatenate([b, pad], axis=1)
    fa = ntt(a, field, algorithm=algorithm, mont_io=False)
    fb = ntt(b, field, algorithm=algorithm, mont_io=False)
    prod = jax.jit(
        lambda u, v: limbs.from_mont(
            limbs.mont_mul(limbs.to_mont(u, field),
                           limbs.to_mont(v, field), field), field)
    )(fa, fb)
    return intt(prod, field, algorithm=algorithm)


def lde(x, field: Field | str, blowup: int = 4, shift: int | None = None,
        algorithm: str = "auto"):
    """Low-degree extension: interpolate the n evaluations, then evaluate on
    a coset domain of size blowup*n (zero-pad coefficients + coset NTT)."""
    if isinstance(field, str):
        field = get_field(field)
    shift = field.generator if shift is None else shift
    W, n = x.shape[0], x.shape[1]
    coeffs = intt(x, field, algorithm=algorithm)
    zshape = (W, n * (blowup - 1)) + x.shape[2:]
    padded = jnp.concatenate(
        [coeffs, jnp.zeros(zshape, dtype=jnp.uint32)], axis=1)
    return coset_ntt(padded, field, shift=shift, algorithm=algorithm)
