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

# Radix-32 base case: the conv matrix [(2D-1)*m, D*m] must fit VMEM next to
# the Z tile (v5e scoped VMEM = 16MB; m=64 needs an 11MB matrix at default
# batch tile — usable only with the VMEM-aware tile shrink in
# kernels/mxu_ntt), and total MXU MACs scale with sum of per-level m.
# NTT_MXU_BASE=64 trades one decomposition-twiddle level (a VPU/HBM pass)
# for 2x the MXU MACs — measure per size.
BASE_LOG = int(__import__("os").environ.get("NTT_MXU_BASE_LOG", "5"))
BASE = 1 << BASE_LOG

_matrix_cache: dict = {}


def _base_matrix(field: Field, m: int, inverse: bool) -> jnp.ndarray:
    """Digit convolution matrix of the m-point DFT (m <= 64), entries
    ω_m^{ik} * R * 2^16 mod p (pre-scaled for Montgomery-form-in/out,
    digits.apply_matrix contract)."""
    key = (field.name, m, inverse, digits.FOLD)
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


def coset_base_matrix(field: Field, m: int, inverse: bool,
                      col_shift: int) -> jnp.ndarray:
    """Conv matrix of the m-point DFT with the coset column scaling
    ``col_shift^{i}`` absorbed into the INPUT side: entries
    M'[k][i] = ω_m^{ik} · col_shift^i · R · 2^16 mod p.

    This is the kernel-fused realization of the coset premultiply's
    c^{i1·n2} factor (col_shift = c^{n2}): a diagonal on the matmul's
    contraction index folds into the matrix exactly, so the coset NTT's
    first level costs the SAME matmul as the plain NTT — the reference's
    twiddle-on-load idea (/root/reference/src/GZKP-NTT.cu:423-429)
    taken all the way onto the MXU. Not cached (one per coset runner;
    get_runner caches the compiled closure)."""
    p = field.p
    w = field.inv_root_of_unity(m) if inverse else field.root_of_unity(m)
    scale = digits.matrix_prescale(field)
    wp = [pow(w, j, p) for j in range(m)]
    cp = [pow(col_shift % p, i, p) for i in range(m)]
    entries = [[wp[(i * k) % m] * cp[i] % p * scale % p for i in range(m)]
               for k in range(m)]
    return jnp.asarray(digits.conv_matrix(entries, field))


def _fold_matrix(field: Field, m: int):
    """Per-(field, m) Montgomery fold matrix (digits.FOLD path) as a
    device array, or None when the fold is off. Keyed -m in the mats
    dicts so it rides the existing aux-operand plumbing into kernels."""
    if not digits.fold_active(field):
        return None
    zb = _zmax_bits(field, m)
    J, hbits = digits.halves_info(digits.out_planes(field), zb)
    return jnp.asarray(digits.fold_reduce_matrix(field, J, hbits, zb))


def _zmax_bits(field: Field, m: int) -> int:
    """Exact bound on one int32 accumulator entry: <= m * D * (2^7-1)^2."""
    bound = m * digits.n_digits(field) * digits.DIGIT_MASK ** 2
    return bound.bit_length()


def _base_ntt(x, field: Field, inverse: bool, mats=None):
    """m <= 64 point NTT along axis 1 as one MXU matmul."""
    m = x.shape[1]
    if m == 1:
        return x
    A = mats[m] if mats is not None else _base_matrix(field, m, inverse)
    F = mats.get(-m) if mats is not None else _fold_matrix(field, m)
    return digits.apply_matrix(A, x, field, m, _zmax_bits(field, m),
                               fold_mat=F)


def twiddle_requests(m: int) -> list:
    """(m, n1, n2) decomposition-twiddle tables in consumption order (see
    fourstep.twiddle_requests)."""
    if m <= BASE:
        return []
    return [(m, BASE, m // BASE)] + twiddle_requests(m // BASE)


def base_sizes(n: int, field: Field | None = None) -> set:
    """Distinct base-transform sizes the recursion hits. With ``field``,
    mirrors the residency-aware split of fourstep._split (used by
    mxu_chunked); without, the plain peel-BASE recursion."""
    if n <= BASE:
        return {n}
    if field is not None:
        from .fourstep import _split
        n1, n2 = _split(n, BASE, field)
        return base_sizes(n1, field) | base_sizes(n2, field)
    m = n
    while m > BASE:
        m //= BASE
    return {BASE, m}


def base_mats(field: Field, n: int, inverse: bool,
              residency: bool = False) -> dict:
    """{m: device int8 conv matrix} for every base size — built host-side
    and passed into jit as arguments (an 11MB matrix embedded as an MLIR
    constant OOMs the TPU compile helper). Under digits.FOLD the dict
    also carries the per-size fold matrices keyed -m (Pallas kernels
    take them as operands — constants are rejected in kernel bodies)."""
    sizes = [m for m in base_sizes(n, field if residency else None) if m > 1]
    out = {m: _base_matrix(field, m, inverse) for m in sizes}
    if digits.fold_active(field):
        out.update({-m: _fold_matrix(field, m) for m in sizes})
        out[-1] = jnp.asarray(digits.fold_mul_matrix(field))
    return out


def _base_ntt_pallas(x, field: Field, inverse: bool, mats=None):
    """Fused-kernel base: digit extract + MXU matmul + reduction in VMEM
    (kernels/mxu_ntt.py), batch flattened to one axis."""
    from ..kernels.mxu_ntt import base_ntt_mxu_pallas
    W, m = x.shape[0], x.shape[1]
    rest = x.shape[2:]
    if m == 1:
        return x
    A = mats[m] if mats is not None else None
    F = mats.get(-m) if mats is not None else None
    xf = x.reshape(W, m, -1) if rest else x.reshape(W, m, 1)
    y = base_ntt_mxu_pallas(xf, field, inverse, A=A, F=F)
    return y.reshape((W, m) + rest)


def ntt_axis_mxu(x, field: Field, inverse: bool = False, tws=None,
                 base_fn=None, mats=None):
    """Full natural-order NTT along axis 1 of uint32[W, m, *batch]
    (Montgomery form in/out, no 1/n scaling) — MXU base transforms."""
    base = base_fn or _base_ntt
    W, m = x.shape[0], x.shape[1]
    rest = x.shape[2:]
    if m <= BASE:
        return base(x, field, inverse, mats)
    n1, n2 = BASE, m // BASE
    omega = field.inv_root_of_unity(m) if inverse else field.root_of_unity(m)

    A = x.reshape((W, n1, n2) + rest)
    B = base(A, field, inverse, mats)                    # columns over i1
    T = next(tws) if tws is not None else power_matrix(
        field, omega, n1, n2)                            # ω_m^{k1·i2}
    C = limbs.mont_mul(B, T.reshape(T.shape + (1,) * len(rest)), field)
    Ct = jnp.moveaxis(C, 2, 1)                           # [W, i2, k1, *rest]
    D = ntt_axis_mxu(Ct, field, inverse, tws, base_fn, mats)  # rows over i2
    return D.reshape((W, m) + rest)                      # X[k2*n1 + k1]


def ntt_mxu(x, field: Field, inverse: bool = False, tws=None, mats=None):
    """x: uint32[W, n] Montgomery form — flagship MXU transform."""
    return ntt_axis_mxu(x, field, inverse, tws=tws, mats=mats)


def ntt_mxu_pallas(x, field: Field, inverse: bool = False, tws=None,
                   mats=None):
    """MXU transform with the fused Pallas base kernel (no HBM round trip
    for the digit-product planes)."""
    return ntt_axis_mxu(x, field, inverse, tws=tws, base_fn=_base_ntt_pallas,
                        mats=mats)


#: apply the top level's decomposition twiddle INSIDE the base kernel
#: (kernels/mxu_level.py) — saves the separate HBM-bound twiddle pass
FUSE_TW = __import__("os").environ.get("NTT_FUSE_TW", "1") == "1"

#: peel size for the multi-level sub-NTT driver (ntt_mxu_sub): a whole
#: SUBBASE-point transform runs in ONE kernel (kernels/mxu_level.py
#: fused_subntt), so n = SUBBASE^2 needs just TWO HBM passes — the
#: two-stage structure of the reference SSIP (GZKP-NTT.cu:1452-1558).
#: Per-field ceiling: Mosaic needs a 128-lane batch tile, so the kernel
#: working set (dominated by the int32 Z plane, E*m*128*4) caps m —
#: see effective_subbase.
SUBBASE_LOG = int(__import__("os").environ.get("NTT_MXU_SUBBASE_LOG", "9"))
SUBBASE = 1 << SUBBASE_LOG

_subbase_cache: dict = {}


#: multi-level sub-NTT peel for 256-bit fields, log2 (0 = single-level
#: BASE). Round 2 measured the Mosaic compile helper dying on FULLY
#: UNROLLED 16-half multi-level kernels at any m >= 64; the limb CIOS
#: now traces as fori_loop bodies inside kernels (limbs.fori_limb_loops,
#: ~16x smaller kernel IR), which is expected to lift that — but the
#: helper only runs on real TPU, so the wider peel stays opt-in until a
#: same-session healthcheck+A/B on the chip proves it (the round-2
#: lesson: no Pallas-path default flips without TPU evidence).
SUB256_LOG = int(__import__("os").environ.get("NTT_MXU_SUB256_LOG", "0"))


def effective_subbase(field: Field) -> int:
    """Largest peel size <= SUBBASE whose multi-level kernel (a) fits
    the VMEM budget at the Mosaic-required 128-lane batch tile and (b)
    stays within the Mosaic compile helper's capacity. Narrow fields get
    the full one-kernel-per-SUBBASE-transform fusion (SMALL m=512
    verified compiling+bit-exact on the real chip); 256-bit fields use
    the NTT_MXU_SUB256_LOG peel (default: single-level BASE — see
    SUB256_LOG)."""
    got = _subbase_cache.get((field.name, SUBBASE, SUB256_LOG))
    if got is None:
        from ..kernels.mxu_ntt import vmem_batch_tile
        if field.n_halves <= 8:
            s = SUBBASE
        else:
            s = max(BASE, 1 << SUB256_LOG) if SUB256_LOG else BASE
        while s > BASE and vmem_batch_tile(
                field, s, 1 << 30, has_tw=True, multi=True) < 128:
            s //= 2
        got = _subbase_cache[(field.name, SUBBASE, SUB256_LOG)] = s
    return got


def sub_base_sizes(n: int, sub: int) -> set:
    """Every kernel transform length the sub-peel recursion hits (outer
    sizes), expanded to the inner matmul base sizes."""
    outer = set()
    m = n
    while m > sub:
        outer.add(sub)
        m //= sub
    outer.add(m)
    inner = set()
    for s in outer:
        inner |= base_sizes(s)
    return inner


def sub_mats(field: Field, n: int, inverse: bool) -> dict:
    """{m: device int8 conv matrix} for the multi-level sub-NTT driver
    (fold matrices keyed -m under digits.FOLD, as in base_mats)."""
    sizes = [m for m in sub_base_sizes(n, effective_subbase(field))
             if m > 1]
    out = {m: _base_matrix(field, m, inverse) for m in sizes}
    if digits.fold_active(field):
        out.update({-m: _fold_matrix(field, m) for m in sizes})
        out[-1] = jnp.asarray(digits.fold_mul_matrix(field))
    return out


def ntt_mxu_sub(x, field: Field, inverse: bool = False, tws=None,
                mats=None, pre_col=None, first_mats=None):
    """Four-step with SUBBASE-point single-kernel sub-NTTs: the minimum-
    HBM-pass production path (n = 2^18 runs in two passes; the level-at-
    a-time mxu_chunked takes ~8). ``first_mats``: conv-matrix overrides
    for the TOP level only (the coset fusion — see
    mxu.coset_base_matrix)."""
    from ..kernels.mxu_level import fused_subntt
    from .fourstep import ntt_axis_fourstep

    def make(md):
        def base(c, f, inv):
            W, m = c.shape[0], c.shape[1]
            rest = c.shape[2:]
            cf = c.reshape(W, m, -1) if rest else c.reshape(W, m, 1)
            y = fused_subntt(cf, f, inv, md, None, transpose_out=False)
            return y.reshape(c.shape)

        def tw_base(c3, t3, rep=1):
            return fused_subntt(c3, field, inverse, md, t3,
                                transpose_out=False, rep=rep)
        return base, tw_base

    base, tw_base = make(mats)
    first_base = first_tw = None
    if first_mats is not None:
        first_base, first_tw = make({**mats, **first_mats})

    return ntt_axis_fourstep(x, field, inverse, base,
                             base_max=effective_subbase(field),
                             tws=tws, pre_col=pre_col, tw_base_fn=tw_base,
                             first_base_fn=first_base,
                             first_tw_base_fn=first_tw)


def ntt_mxu_chunked(x, field: Field, inverse: bool = False, tws=None,
                    mats=None, pre_col=None, first_mats=None):
    """MXU digit-matmul base transforms driven by the CHUNKED four-step
    recursion (fourstep._fused_level): twiddle products and transposes run
    in VMEM-sized chunks, so large sizes aren't stage-pass HBM-bound like
    the plain ntt_axis_mxu composition. ``first_mats``: conv-matrix
    overrides for the TOP level only (the coset fusion — see
    mxu.coset_base_matrix)."""
    from .fourstep import ntt_axis_fourstep

    def make(md):
        def base(c, f, inv):
            return _base_ntt_pallas(c, f, inv, md)

        tw_base = None
        if FUSE_TW and md is not None:
            def tw_base(c3, t3, rep=1):
                # c3: [W, m, B]; one kernel: digits + MXU matmul +
                # Montgomery reduce + twiddle mont_mul (no in-kernel
                # transpose — the XLA relayout after it measured free).
                # rep>1 (deep levels): sublane-layout i2-resolution
                # twiddle streamed at 1/rep the data size
                # (kernels/mxu_level.py).
                from ..kernels.mxu_level import fused_subntt
                mm = c3.shape[1]
                sub = {k: md[k] for k in (mm, -mm, -1) if k in md}
                return fused_subntt(c3, field, inverse, sub, t3,
                                    transpose_out=False, rep=rep)
        return base, tw_base

    base, tw_base = make(mats)
    first_base = first_tw = None
    if first_mats is not None:
        first_base, first_tw = make({**mats, **first_mats})

    return ntt_axis_fourstep(x, field, inverse, base, base_max=BASE,
                             tws=tws, pre_col=pre_col, tw_base_fn=tw_base,
                             first_base_fn=first_base,
                             first_tw_base_fn=first_tw)


def expanded_twiddles(field: Field, n: int, inverse: bool,
                      base: int = BASE) -> list:
    """Full-resolution per-level twiddles for the fully-fused flat-peel
    drivers: level l's [W, base, I2_l] table expanded across the already-
    processed suffix S_l so each level's twiddle is exactly batch-shaped
    [W, base, n/base]. (Optionally permuted by the caller for brev-order
    outputs.)"""
    from .core import host_power_matrix
    out = []
    S = 1
    remaining = n
    W = field.n_words
    while remaining > base:
        I2 = remaining // base
        w = (field.inv_root_of_unity(remaining) if inverse
             else field.root_of_unity(remaining))
        T = host_power_matrix(field, w, base, I2)      # [W, base, I2]
        Te = np.broadcast_to(T[:, :, :, None], T.shape + (S,))
        out.append(jnp.asarray(
            np.ascontiguousarray(Te).reshape(W, base, I2 * S)))
        remaining //= base
        S *= base
    return out


def ntt_mxu_fused(x, field: Field, inverse: bool = False, tws=None,
                  mats=None):
    """Fully-fused MXU transform: ONE Pallas kernel per level (digit
    extract + MXU matmul + Montgomery reduce + twiddle + transposed store),
    one HBM pass per level. ``tws`` must be the iterator of
    :func:`expanded_twiddles`; ``mats`` the :func:`base_mats` dict.

    The flat level loop is the iterative form of :func:`ntt_axis_mxu`:
    carving the next 64-point transform axis off the front of the flattened
    remainder is a pure reshape after the kernel's transposed store.
    """
    from ..kernels.mxu_level import fused_level
    assert x.ndim == 2, "fused flat-peel drivers take unbatched uint32[W, n]"
    W, n = x.shape
    remaining = n
    m0 = min(BASE, n)
    cur = x.reshape(W, m0, n // m0)
    levels = 0
    while remaining > BASE:
        T3 = next(tws)                                   # [W, BASE, n/BASE]
        cur = fused_level(cur, field, mats[BASE], T3, transpose_out=True,
                          F=mats.get(-BASE), F2=mats.get(-1))
        remaining //= BASE
        levels += 1
        m_next = min(BASE, remaining)
        cur = cur.reshape(W, m_next, n // m_next)
    y = fused_level(cur, field, mats[remaining], None,
                    transpose_out=False, F=mats.get(-remaining))
    # The per-level transposed stores append each level's output digit
    # AFTER the older suffix, yielding flat order (k_L, k_1, ..., k_{L-1});
    # the four-step convention is (k_L, k_{L-1}, ..., k_1) — one final
    # suffix-reversing relayout restores it.
    if levels > 1:
        y = y.reshape((W, remaining) + (BASE,) * levels)
        y = y.transpose((0, 1) + tuple(range(levels + 1, 1, -1)))
    return y.reshape(W, n)
