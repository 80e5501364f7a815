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

#: OPTIONAL factorization of the TOP-level decomposition twiddle (data-
#: sized, n entries) into two tiny tables (i2 = j2·S2 + s2 -> TJ ⊗ TS,
#: see fourstep._fused_level): trades the table's HBM read + generation +
#: residency for one extra mont_mul per element. MEASURED A LOSS on this
#: tile at every size (2^18: 2.1->3.7ms, 2^20: 19->30ms, 2^22: 120->170ms
#: — the VPU mul + reshape relayouts cost more than the table stream), so
#: OFF by default; set NTT_FACTOR_TW_MIN=<n> to enable above size n
#: (useful when the table itself would exhaust HBM, e.g. 2^26-scale).
FACTOR_TW_MIN = int(__import__("os").environ.get("NTT_FACTOR_TW_MIN", "0"))


def _factor_split(n2: int) -> tuple:
    """n2 = J2 * S2 with S2 = min(2^floor(log2(n2)/2), 512) — S2 capped so
    chunked execution (chunk >= S2 columns) always aligns."""
    S2 = 1 << min((n2.bit_length() - 1) // 2, 9)
    return n2 // S2, S2


def _tw_tables(field, n, inverse, requests, allow_factored=False):
    # ``allow_factored``: only the fourstep-family drivers (everything
    # routed through fourstep._fused_level) understand the (TJ, TS)
    # factored-table tuples; the flat drivers (mxu/mxu_pallas) reshape the
    # table and would crash at trace time (ADVICE round 2)
    from .transforms.core import power_matrix_chunked
    out = []
    for (m, n1, n2) in requests:
        w = field.inv_root_of_unity(m) if inverse else field.root_of_unity(m)
        if (allow_factored and FACTOR_TW_MIN and m == n
                and m > FACTOR_TW_MIN and n2 > 1):
            J2, S2 = _factor_split(n2)
            tj = host_power_matrix(field, pow(w, S2, field.p), n1, J2)
            ts = host_power_matrix(field, w, n1, S2)
            out.append((jnp.asarray(tj), jnp.asarray(ts)))
        elif n1 * n2 <= _HOST_TW_LIMIT:
            out.append(jnp.asarray(host_power_matrix(field, w, n1, n2)))
        else:
            out.append(jax.jit(
                lambda field=field, w=w, n1=n1, n2=n2: power_matrix_chunked(
                    field, w, n1, n2))())
    return out


def _prep_fourstep(base_max):
    """``base_max``: an int, or a callable(field) -> int (the per-field
    ladder caps, fourstep.pallas_base_max)."""
    def prep(field, n, inverse):
        bm = base_max(field) if callable(base_max) else base_max
        return {"tws": _tw_tables(
            field, n, inverse,
            _fourstep.twiddle_requests(n, bm, field),
            allow_factored=True)}
    return prep


def _prep_mxu(field, n, inverse):
    return {"tws": _tw_tables(field, n, inverse, _mxu.twiddle_requests(n)),
            "mats": _mxu.base_mats(field, n, inverse)}


def _prep_mxu_fused(field, n, inverse):
    return {"tws": _mxu.expanded_twiddles(field, n, inverse),
            "mats": _mxu.base_mats(field, n, inverse)}


def _matfold_tws(field, n, inverse, base_max, coset_shift=None):
    """The twiddle MATRIX-FOLD table list (mxu.matfold_tw_tables) when the
    config is eligible: the fold targets the single-level peel-BASE MXU
    drivers on wide fields (where the VPU twiddle product dominated
    kernel time — VERDICT r4). None -> caller falls back to _tw_tables."""
    if (not _mxu.TW_MATFOLD or field.n_words < 8 or base_max != _mxu.BASE
            or FACTOR_TW_MIN and n > FACTOR_TW_MIN):
        return None
    return _mxu.matfold_tw_tables(field, n, inverse,
                                  coset_shift=coset_shift)


def _prep_mxu_chunked(field, n, inverse):
    tws = _matfold_tws(field, n, inverse, _mxu.BASE)
    if tws is None:
        tws = _tw_tables(
            field, n, inverse,
            _fourstep.twiddle_requests(n, _mxu.BASE, field),
            allow_factored=True)
    return {"tws": tws,
            "mats": _mxu.base_mats(field, n, inverse, residency=True)}


def _prep_mxu_sub(field, n, inverse):
    sub = _mxu.effective_subbase(field)
    tws = _matfold_tws(field, n, inverse, sub)
    if tws is None:
        tws = _tw_tables(
            field, n, inverse,
            _fourstep.twiddle_requests(n, sub, field),
            allow_factored=True)
    return {"tws": tws, "mats": _mxu.sub_mats(field, n, inverse)}


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
        x, field, inverse, iter(aux["tws"]),
        pre_col=aux.get("coset_col")),
        _prep_fourstep(_fourstep.BASE_MAX)),
    "fourstep_st": (lambda x, field, inverse, aux: ntt_fourstep_stockham(
        x, field, inverse, iter(aux["tws"]),
        pre_col=aux.get("coset_col")),
        _prep_fourstep(_fourstep.BASE_MAX)),
    "pallas": (lambda x, field, inverse, aux: ntt_fourstep_pallas(
        x, field, inverse, iter(aux["tws"]),
        pre_col=aux.get("coset_col")),
        _prep_fourstep(_fourstep.pallas_base_max)),
    "mxu": (lambda x, field, inverse, aux: ntt_mxu(
        x, field, inverse, iter(aux["tws"]), aux["mats"]), _prep_mxu),
    "mxu_pallas": (lambda x, field, inverse, aux: ntt_mxu_pallas(
        x, field, inverse, iter(aux["tws"]), aux["mats"]), _prep_mxu),
    "mxu_fused": (lambda x, field, inverse, aux: _mxu.ntt_mxu_fused(
        x, field, inverse, iter(aux["tws"]), aux["mats"]), _prep_mxu_fused),
    "pallas_fused": (lambda x, field, inverse, aux: ntt_fourstep_pallas_fused(
        x, field, inverse, iter(aux["tws"])),
        lambda field, n, inverse: {"tws": _mxu.expanded_twiddles(
            field, n, inverse, base=_fourstep.fused_m(field))}),
    "mxu_chunked": (lambda x, field, inverse, aux: _mxu.ntt_mxu_chunked(
        x, field, inverse, iter(aux["tws"]), aux["mats"],
        pre_col=aux.get("coset_col"), first_mats=aux.get("first_mats")),
        _prep_mxu_chunked),
    "mxu_sub": (lambda x, field, inverse, aux: _mxu.ntt_mxu_sub(
        x, field, inverse, iter(aux["tws"]), aux["mats"],
        pre_col=aux.get("coset_col"), first_mats=aux.get("first_mats")),
        _prep_mxu_sub),
}

_compiled_cache: dict = {}


def resolve_algorithm(algorithm: str, field: Field, n: int) -> str:
    """'auto' picks per (field, size), from sustained chain-64 shootouts
    on v5e (docs/DESIGN.md):

    - 256-bit fields: ``mxu_chunked`` at EVERY size — round 2 measured it
      3.5-8.5x faster than the VPU ladder at 2^18 BLS sustained and 2-5x
      at 2^14/2^16/2^22. Round 1's 'fourstep when resident' rule was
      tuned on burst numbers; under the sustained protocol the ladder's
      advantage evaporates (the tile is power-capped, and the MXU path
      does ~6x less VPU work per element). (``mxu_sub`` measures
      identically here: the Mosaic compile helper caps 16-half multi-
      level kernels at the same single-level base.)
    - narrow fields (small Proth, Goldilocks): ``mxu_sub`` — whole
      512-point sub-NTTs per Pallas kernel: 3.8x over fourstep at
      2^26 small-proth (40.4 vs 155 ms) and ~4x at 2^22.
    """
    if algorithm != "auto":
        return algorithm
    return "mxu_chunked" if field.n_words >= 8 else "mxu_sub"


def _first_level(algorithm: str, field: Field, n: int):
    """(n1, n2, tws_index) of the top four-step level for the algorithms
    whose aux twiddle list follows fourstep.twiddle_requests order — the
    coset-fusion targets. None when the algorithm has no such level (flat
    drivers, naive/stockham, or n within one base transform)."""
    base_max = {"fourstep": _fourstep.BASE_MAX,
                "fourstep_st": _fourstep.BASE_MAX,
                "pallas": _fourstep.pallas_base_max(field),
                "mxu_chunked": _mxu.BASE,
                "mxu_sub": _mxu.effective_subbase(field)}.get(algorithm)
    if base_max is None or n <= base_max:
        return None
    n1, n2 = _fourstep._split(n, base_max, field)
    idx = len(_fourstep.twiddle_requests(n1, base_max, field))
    return n1, n2, idx


def get_runner(field: Field, n: int, inverse: bool, algorithm: str,
               mont_io: bool, coset_shift):
    """(run, aux): ``run(x, aux)`` is a pure traceable function and ``aux``
    the pytree of device-resident tables it consumes. Wrap run in your own
    jit (benchmark chain loops etc.) passing aux as an argument — never
    close over it."""
    algorithm = resolve_algorithm(algorithm, field, n)
    fn, prepare = ALGORITHMS[algorithm]
    aux = prepare(field, n, inverse)

    from .transforms.core import chunked_along_axis

    fused_coset = False
    if coset_shift is not None:
        shift = coset_shift if not inverse else inv_mod(coset_shift, field.p)
        fl = _first_level(algorithm, field, n) if not inverse else None
        if fl is not None:
            # Fuse the forward coset premultiply c^{i1·n2+i2} into the
            # first four-step level instead of a standalone HBM pass
            # (VERDICT round 1 item 4; reference analog: twiddle applied
            # on load, GZKP-NTT.cu:423-429). Rank-1 factorization:
            #   c^{i2}      -> folded into the first decomposition
            #                  twiddle table here, at prepare time;
            #   c^{i1·n2}   -> tiny [W, n1] column vector applied inside
            #                  the first level's VMEM-resident chunk.
            n1, n2, idx = fl
            aux["tws"] = list(aux["tws"])
            T0 = aux["tws"][idx]
            matfolded = isinstance(
                T0, (_fourstep.TwMatStack, _fourstep.TwStackResid))
            if matfolded:
                # matrix-fold level 0: rebuild the fold with the coset
                # absorbed — c^{i1·n2} as the stack's input diagonal,
                # c^{a·s0} as per-entry scalars, c^{b} in the merged
                # level-1 table (mxu.matfold_tw_tables) — the coset NTT
                # costs literally the same kernels as the plain NTT
                aux["tws"] = _matfold_tws(field, n, inverse, _mxu.BASE,
                                          coset_shift=shift)
                assert aux["tws"] is not None
            elif isinstance(T0, tuple):
                # factored table: fold c^{i2} = (c^{S2})^{j2} · c^{s2}
                # into the respective factor (all tiny, device one-time)
                TJ, TS = T0
                J2, S2 = TJ.shape[2], TS.shape[2]
                rj = jnp.asarray(host_powers_fast(
                    field, pow(shift % field.p, S2, field.p), J2))
                rs = jnp.asarray(host_powers_fast(field, shift, S2))
                fold = jax.jit(lambda T, r: limbs.mont_mul(
                    T, r[:, None, :], field))
                aux["tws"][idx] = (fold(TJ, rj), fold(TS, rs))
            else:
                if n2 <= _HOST_TW_LIMIT:
                    rowv = jnp.asarray(host_powers_fast(field, shift, n2))
                else:
                    from .transforms.core import geometric_outer_chunked
                    rowv = jax.jit(
                        lambda: geometric_outer_chunked(field, shift, n2))()
                aux["tws"][idx] = jax.jit(lambda T, r: chunked_along_axis(
                    lambda c, t: limbs.mont_mul(c, t, field), T, axis=2,
                    also=r))(T0, rowv[:, None, :])
            # The c^{i1·n2} column factor: for the single-level MXU
            # drivers, absorb it INTO the first level's conv matrix
            # (an input-side diagonal folds into a matmul exactly —
            # mxu.coset_base_matrix), which keeps the fused level
            # kernel engaged and makes the coset premultiply literally
            # free (the round-4 coset path fell back to the unfused
            # base + a separate VPU pre_col pass: 361.7 vs 193 ms at
            # 2^24, VERDICT r4 weak #2). Other algorithms keep the
            # [W, n1] pre_col column applied inside the chunk body.
            if matfolded:
                pass        # the stack's input diagonal already has it
            elif (algorithm in ("mxu_chunked", "mxu_sub")
                    and "mats" in aux and n1 in aux["mats"]):
                fm = {n1: _mxu.coset_base_matrix(
                    field, n1, inverse,
                    pow(shift % field.p, n2, field.p))}
                aux["first_mats"] = fm
            else:
                aux["coset_col"] = jnp.asarray(host_powers_fast(
                    field, pow(shift % field.p, n2, field.p), n1))
            fused_coset = True
        elif n <= _HOST_TW_LIMIT:
            aux["coset"] = jnp.asarray(host_powers_fast(field, shift, n))
        else:
            from .transforms.core import geometric_outer_chunked
            aux["coset"] = jax.jit(
                lambda: geometric_outer_chunked(field, shift, n))()

    def run(x, aux):
        batch_dims = x.ndim - 2  # [W, n, *batch]
        x = limbs.debug_check(x, field, "ntt input")
        if not mont_io:
            x = chunked_along_axis(
                lambda c: limbs.to_mont(c, field), x, axis=1)
        if coset_shift is not None and not inverse and not fused_coset:
            cs = aux["coset"].reshape(aux["coset"].shape + (1,) * batch_dims)
            x = chunked_along_axis(
                lambda c, t: limbs.mont_mul(c, t, field), x, axis=1, also=cs)
        y = fn(x, field, inverse, aux)
        y = limbs.debug_check(y, field, "transform output")
        if inverse:
            ninv = limbs.const_planes(
                field.to_mont_int(inv_mod(n, field.p)), field,
                ndim=y.ndim - 1)
            if coset_shift is not None:
                # ONE fused pass: 1/n scale and coset post-multiply share
                # the chunk body (two VMEM muls, one HBM read+write)
                cs = aux["coset"].reshape(
                    aux["coset"].shape + (1,) * batch_dims)
                y = chunked_along_axis(
                    lambda c, t: limbs.mont_mul(
                        limbs.mont_mul(c, ninv, field), t, field),
                    y, axis=1, also=cs)
            else:
                y = chunked_along_axis(
                    lambda c: limbs.mont_mul(c, ninv, field), y, axis=1)
        if not mont_io:
            y = chunked_along_axis(
                lambda c: limbs.from_mont(c, field), y, axis=1)
        return y

    return run, aux


def _build(field: Field, n: int, inverse: bool, algorithm: str,
           mont_io: bool, coset_shift, donate: bool = False):
    run, aux = get_runner(field, n, inverse, algorithm, mont_io, coset_shift)
    # ``donate``: give XLA the input buffer for in-place reuse — the TPU
    # analog of the reference SSIP's single-buffer operation
    # (GZKP-NTT.cu:1452-1558 scatters back to the same addresses). Halves
    # peak HBM for the data at 2^24+; opt-in because the caller's array
    # is invalidated (deleted) by the call.
    jitted = jax.jit(run, donate_argnums=(0,) if donate else ())
    return lambda x: jitted(x, aux)


def _get_compiled(field: Field, n: int, inverse: bool, algorithm: str,
                  mont_io: bool, coset_shift, donate: bool = False):
    from .config import config_key
    # every trace-time knob must be part of the key, or a knob flip would
    # serve a stale compiled entry (VERDICT round 2, weak #8)
    key = (field.name, n, inverse, algorithm, mont_io, coset_shift, donate,
           config_key())
    got = _compiled_cache.get(key)
    if got is None:
        got = _build(field, n, inverse, algorithm, mont_io, coset_shift,
                     donate)
        _compiled_cache[key] = got
    return got


def ntt(x, field: Field | str, inverse: bool = False,
        algorithm: str = "auto", mont_io: bool = False,
        coset_shift: int | None = None, donate: bool = False):
    """Number Theoretic Transform of ``x`` (uint32[W, n] or batched
    uint32[W, n, *batch]; transforms along axis 1, natural order).

    Forward: X[k] = Σ_i x[i]·ω_n^{ik} mod p, with ω_n = g^((p-1)/n) —
    identical semantics to the reference golden NTT (GZKP-NTT.cu:30-48).

    ``donate=True`` lets XLA reuse the input buffer for the output
    (in-place operation; the input array is invalidated) — required
    headroom at HBM-limit sizes (2^26 x 256-bit).
    """
    if isinstance(field, str):
        field = get_field(field)
    n = x.shape[1]
    # real exceptions, not asserts: public-API validation must survive -O
    if n & (n - 1) != 0:
        raise ValueError(f"transform size must be a power of two, got {n}")
    if x.shape[0] != field.n_words:
        raise ValueError(
            f"expected limb-leading uint32[{field.n_words}, n, *batch], "
            f"got {x.shape}")
    return _get_compiled(field, n, inverse, algorithm, mont_io,
                         coset_shift, donate)(x)


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


_field_jit_cache: dict = {}


def _field_jits(field: Field):
    """Per-field cached jitted elementwise helpers (chunked along axis 1).
    Module-level cache: a fresh ``jax.jit(lambda ...)`` per call would
    recompile every time — expensive on the ~420ms-per-dispatch remote
    backend (ADVICE round 1)."""
    got = _field_jit_cache.get(field.name)
    if got is None:
        from .transforms.core import chunked_along_axis
        got = {
            "to_mont": jax.jit(lambda u: chunked_along_axis(
                lambda c: limbs.to_mont(c, field), u, axis=1)),
            "from_mont": jax.jit(lambda u: chunked_along_axis(
                lambda c: limbs.from_mont(c, field), u, axis=1)),
            "mul": jax.jit(lambda u, v: chunked_along_axis(
                lambda c, t: limbs.mont_mul(c, t, field), u, axis=1,
                also=v)),
        }
        _field_jit_cache[field.name] = got
    return got


def polymul(a, b, field: Field | str, algorithm: str = "auto",
            cyclic: bool = False):
    """Polynomial product via NTT (the canonical ZKP workload).

    ``a``, ``b``: coefficient vectors uint32[W, n] (same n). With
    ``cyclic=True`` returns the length-n cyclic convolution; otherwise the
    full product of degree < 2n-1, computed on the 2n-point domain
    (zero-padded), returned as uint32[W, 2n].

    The whole pipeline stays in Montgomery form: one conversion in, one
    out, and the pointwise product is a single cached mont_mul pass.
    """
    if isinstance(field, str):
        field = get_field(field)
    W, n = a.shape[0], a.shape[1]
    assert b.shape == a.shape
    if not cyclic:
        pad = jnp.zeros((W, n), dtype=jnp.uint32)
        a = jnp.concatenate([a, pad], axis=1)
        b = jnp.concatenate([b, pad], axis=1)
    fj = _field_jits(field)
    fa = ntt(fj["to_mont"](a), field, algorithm=algorithm, mont_io=True)
    fb = ntt(fj["to_mont"](b), field, algorithm=algorithm, mont_io=True)
    prod = fj["mul"](fa, fb)
    res = intt(prod, field, algorithm=algorithm, mont_io=True)
    return fj["from_mont"](res)


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
