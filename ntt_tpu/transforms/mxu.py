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

import jax
import jax.numpy as jnp

from .. import digits, limbs
from ..fields import Field
from .core import host_power_matrix, host_powers_fast, power_matrix

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


def twiddle_matrix_stack(field: Field, m: int, inverse: bool, tvals,
                         col_shift: int | None = None) -> np.ndarray:
    """Host build of a STACK of conv matrices ``diag(t_s) @ DFT_m``
    (optionally ``@ diag(col_shift^i)`` on the input side): int8
    [NT, P*m, D*m], NT = len(tvals), ``tvals[s][k]`` the plain (non-
    Montgomery) twiddle value multiplying output row k of stack entry s.

    This is the round-5 twiddle MATRIX FOLD: at a four-step level whose
    decomposition twiddle is constant across each kernel batch tile, the
    twiddle diagonal composes with the level's DFT matrix into ONE conv
    matrix per twiddle value — the per-element VPU Montgomery product
    (the knockout's dominant stage, ~45% of kernel time) vanishes into
    the already-free MXU matmul, matching the reference's
    every-multiply-on-the-multiply-engine design point
    (/root/reference/include/cgbn/core/core_mont_wmad.cu:29-191).
    Exactness: entries are < p with the same R·2^16 prescale, so the
    zmax window and the Montgomery reduction are unchanged — bit-exact
    with matmul-then-mont_mul by construction."""
    p = field.p
    w = field.inv_root_of_unity(m) if inverse else field.root_of_unity(m)
    scale = digits.matrix_prescale(field)
    wp = [pow(w, j, p) for j in range(m)]
    if col_shift is not None:
        cp = [pow(col_shift % p, i, p) for i in range(m)]
        base = [[wp[(i * k) % m] * cp[i] % p * scale % p
                 for i in range(m)] for k in range(m)]
    else:
        base = [[wp[(i * k) % m] * scale % p for i in range(m)]
                for k in range(m)]
    mats = []
    for ts in tvals:
        entries = [[base[k][i] * ts[k] % p for i in range(m)]
                   for k in range(m)]
        mats.append(digits.conv_matrix(entries, field))
    return np.stack(mats, axis=0)


#: twiddle MATRIX-FOLD (round 5): replace per-element VPU decomposition-
#: twiddle products (the knockout's dominant stage, ~45% of kernel time,
#: TPU_CAMPAIGN_r4) with conv-matrix stacks + ONE merged batch-resolution
#: table — per transform, levels-1 twiddle mont_muls become 1.
TW_MATFOLD = __import__("os").environ.get("NTT_TW_MATFOLD", "1") == "1"
#: largest per-level stack (matrices) the fold may build: bounds both the
#: host build time (~NT * m^2 * D bigint shift-reduces) and the stack's
#: HBM stream (NT * ~1.4MB for 256-bit fields at m=32)
TW_STACK_MAX_NT = int(__import__("os").environ.get(
    "NTT_TW_STACK_MAX_NT", "128"))
#: largest n whose MERGED level-1 table (n elements, data-sized) is
#: affordable; above it the level-0 fold switches to the PERIODIC
#: RESIDUAL form (TwStackResid: stack + compact [W, BASE, s0] table —
#: the in-kernel twiddle-generation analog of the reference's
#: FIELD_pow_lookup, GZKP-NTT.cu:298-319) instead of being skipped
TW_MERGED_MAX = int(__import__("os").environ.get(
    "NTT_TW_MERGED_MAX", str(1 << 24)))
#: periodic-residual mode: "auto" = only above TW_MERGED_MAX (the merged
#: table is chip-proven and saves a product below it); "1" = force at
#: every eligible size (A/B probe); "0" = off
TW_RESID = __import__("os").environ.get("NTT_TW_RESID", "auto")


def matfold_tw_tables(field: Field, n: int, inverse: bool,
                      coset_shift: int | None = None):
    """Twiddle tables for the peel-BASE four-step with the decomposition
    twiddles FOLDED into the MXU where tile geometry allows — the round-5
    answer to the VPU twiddle product dominating kernel time (reference
    design point: every multiply rides the multiply engine,
    /root/reference/include/cgbn/core/core_mont_wmad.cu:29-191).

    Per level l (transform length m_l = n/BASE^l, suffix R_l = BASE^l,
    twiddle T_l[k, i2] = w_l^{k*i2}):

    - l == 0 (R=1, batch-resolution twiddle): pair-decompose
      i2 = a*s0 + b (s0 = n2_0/BASE). The w^{k*a*s0} factor is constant
      across each s0-column span -> a BASE-entry conv-matrix stack
      indexed by a (fourstep.TwMatStack); the w^{k*b} residual commutes
      with level 1's column transforms and is DEFERRED into level 1.
      Above TW_MERGED_MAX (or with NTT_TW_RESID=1) the residual is NOT
      deferred: it rides the level-0 kernel's own twiddle stage from a
      COMPACT periodic [W, BASE, s0] table (fourstep.TwStackResid) —
      same product count as the plain streamed table but O(n/BASE)
      table bytes instead of O(n·BASE): the 2^26 HBM-ledger unlock.
    - l == 1 (when level 0 deferred): the residual merges with level 1's
      own twiddle into ONE batch-resolution table
      M[k1, b, k0] = w_n^{(BASE*k1 + k0) * b} (fourstep.TwBatch) — a
      single mont_mul carries both levels.
    - l >= 2: R_l >= BASE^2 spans whole batch tiles, so the twiddle
      folds entirely into an n2_l-entry matrix stack when n2_l <=
      TW_STACK_MAX_NT (deeper early levels keep the streamed table).

    ``coset_shift`` (forward only) folds the coset premultiply c^{i}
    in exactly: c^{i1*n2_0} as the level-0 stack's input-side diagonal,
    c^{a*s0} as a per-stack-entry scalar, c^{b} into the merged level-1
    table — the coset costs ZERO extra passes or products.

    Returns the tws list (mixed TwMatStack / TwBatch / plain arrays), or
    None when nothing is foldable (caller falls back to _tw_tables)."""
    from .fourstep import (TwBatch, TwMatStack, TwStackResid,
                           twiddle_requests)
    requests = twiddle_requests(n, BASE, field)
    if not requests or any(n1 != BASE for (_, n1, _) in requests):
        return None                     # non-peel split (resident mode)
    p = field.p
    shift = None if coset_shift is None else coset_shift % p

    def stack_bytes(nt: int) -> int:
        D = digits.n_digits(field)
        E = digits.out_planes(field)
        return nt * E * BASE * D * BASE

    # eligibility per level, then bail out early if nothing folds
    s0 = requests[0][2] // BASE
    geom0 = (len(requests) >= 2 and s0 >= 128 and requests[0][0] == n)
    resid0 = geom0 and (TW_RESID == "1" or
                        (TW_RESID == "auto" and n > TW_MERGED_MAX))
    fold0 = geom0 and not resid0 and n <= TW_MERGED_MAX
    deep_fold = [False] * len(requests)
    for l in range(2, len(requests)):
        m_l, _, n2_l = requests[l]
        R_l = n // m_l
        if (n2_l <= TW_STACK_MAX_NT and R_l % 128 == 0
                and stack_bytes(n2_l) <= 4 * n * field.n_words * 4):
            deep_fold[l] = True
    if not fold0 and not resid0 and not any(deep_fold):
        return None

    out = []
    for l, (m_l, n1, n2_l) in enumerate(requests):
        w = (field.inv_root_of_unity(m_l) if inverse
             else field.root_of_unity(m_l))
        if l == 0 and (fold0 or resid0):
            # stack over the HIGH digit a of i2 (= level 1's column
            # index): entry a covers s0 consecutive batch columns
            lam = [1] * BASE if shift is None else [
                pow(shift, a * s0, p) for a in range(BASE)]
            tvals = [[pow(w, (k * a * s0) % m_l, p) * lam[a] % p
                      for k in range(BASE)] for a in range(BASE)]
            # the c^{i1*n2_0} coset factor: input-side diagonal
            col = None if shift is None else pow(shift, m_l // BASE, p)
            As = jnp.asarray(twiddle_matrix_stack(
                field, BASE, inverse, tvals, col_shift=col))
            if fold0:
                out.append(TwMatStack(As, s0))
            else:
                # PERIODIC RESIDUAL (big-n form): w^{k·b} (· c^b), the
                # fast factor of i2 = a·s0 + b, as a compact [W, BASE,
                # s0] table the level-0 kernel streams modulo s0 — no
                # deferral into level 1, whose own table stays as built
                # below (the merged table would be data-sized here)
                if BASE * s0 <= 1 << 18:
                    Tr = jnp.asarray(host_power_matrix(field, w, BASE, s0))
                else:
                    from .core import power_matrix_chunked
                    Tr = jax.jit(lambda: power_matrix_chunked(
                        field, w, BASE, s0))()
                if shift is not None:
                    # chunked for the same reason as the merged-table
                    # coset fold below (CIOS temporaries)
                    from .core import chunked_along_axis
                    cb = jnp.asarray(host_powers_fast(field, shift, s0))
                    Tr = jax.jit(lambda a, b: chunked_along_axis(
                        lambda c, t: limbs.mont_mul(c, t, field),
                        a, axis=2, also=b[:, None, :]))(Tr, cb)
                out.append(TwStackResid(As, s0, Tr))
        elif l == 1 and fold0:
            # merged table M[k1, b, k0] = w_n^{(BASE*k1+k0)*b} (* c^b):
            # rows j = BASE*k1 + k0 of the full-n power matrix
            wn = (field.inv_root_of_unity(n) if inverse
                  else field.root_of_unity(n))
            BB = BASE * BASE
            if BB * n2_l <= 1 << 18:
                M = jnp.asarray(host_power_matrix(field, wn, BB, n2_l))
            else:
                from .core import power_matrix_chunked
                M = jax.jit(lambda: power_matrix_chunked(
                    field, wn, BB, n2_l))()
            cb = None if shift is None else jnp.asarray(
                host_powers_fast(field, shift, n2_l))
            if cb is not None:
                # CHUNKED coset fold: a whole-table mont_mul's CIOS
                # temporaries are data-sized x n_halves — at 2^24 the
                # unchunked form asked the compiler for 36GB of HBM
                # (TPU_CAMPAIGN_r5/suite.log attempt 1). Same chunk
                # discipline as every data-path mont_mul.
                from .core import chunked_along_axis
                M = jax.jit(lambda a, b: chunked_along_axis(
                    lambda c: limbs.mont_mul(c, b[:, None, :], field),
                    a, axis=1))(M, cb)
            M = jax.jit(lambda a: a.reshape(
                field.n_words, BASE, BASE, n2_l).transpose(
                    0, 1, 3, 2))(M)                # [W, k1, b, k0]
            out.append(TwBatch(M))
        elif deep_fold[l]:
            tvals = [[pow(w, (k * s) % m_l, p) for k in range(BASE)]
                     for s in range(n2_l)]
            out.append(TwMatStack(jnp.asarray(twiddle_matrix_stack(
                field, BASE, inverse, tvals)), n // m_l))
        else:
            if n1 * n2_l <= 1 << 18:
                out.append(jnp.asarray(host_power_matrix(
                    field, w, n1, n2_l)))
            else:
                from .core import power_matrix_chunked
                out.append(jax.jit(lambda w=w, n2=n2_l: power_matrix_chunked(
                    field, w, n1, n2))())
    return out


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
            from .fourstep import TwMatStack, TwStackResid
            if isinstance(t3, (TwMatStack, TwStackResid)):
                from ..kernels.mxu_level import fused_level_stack
                tres = t3.Tres if isinstance(t3, TwStackResid) else None
                return fused_level_stack(c3, field, t3.As, rep=t3.rep,
                                         F=md.get(-c3.shape[1]), T3=tres)
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
                # (kernels/mxu_level.py). A TwMatStack/TwStackResid
                # routes to the stack kernel: the twiddle rides the
                # matmul itself (+ the compact periodic residual).
                from .fourstep import TwMatStack, TwStackResid
                if isinstance(t3, (TwMatStack, TwStackResid)):
                    from ..kernels.mxu_level import fused_level_stack
                    tres = (t3.Tres if isinstance(t3, TwStackResid)
                            else None)
                    return fused_level_stack(c3, field, t3.As, rep=t3.rep,
                                             F=md.get(-c3.shape[1]),
                                             T3=tres)
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
