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

import os

import numpy as np

import jax
import jax.numpy as jnp

from . import limbs
from .fields import HALF_BITS, Field

DIGIT_BITS = 7
DIGIT_MASK = (1 << DIGIT_BITS) - 1

#: MXU Montgomery fold (round 4): route the mod-p reduction work through
#: the MXU instead of the VPU CIOS elimination loop. Two composable
#: pieces, one knob:
#: (a) the conv matrix's digit rows are pre-folded mod p
#:     (``conv_matrix_folded``): row (d2, i) holds the digits of
#:     M̃[k,i]·2^(7·d2) mod p, so the matmul emits D output planes
#:     instead of E = 2D-1 — half the MACs, half the recompose;
#: (b) the 16-bit-half elimination loop (iters = n_halves+1 VPU passes)
#:     is replaced by ONE small int8 matmul against a per-(field, J)
#:     fold matrix (reduction mod p is linear over digit planes) plus a
#:     2-iteration CIOS tail (``recompose_reduce`` fold path).
#: Bit-exact vs the CIOS path by construction (residues are preserved
#: plane-by-plane); property-tested. Default ON for wide fields since
#: the round-4 chip proof: bit-exact at 2^18/2^20/2^22 on the v5e and
#: 1.63x sustained at 2^18 BLS (1.089 vs 1.771 ms, TPU_CAMPAIGN_r4/
#: fold_{a_base,b,sweep}.log); NTT_MXU_FOLD=0 restores the CIOS path.
FOLD = os.environ.get("NTT_MXU_FOLD", "1") == "1"

#: CIOS elimination steps remaining after the fold matmul: the folded
#: value V2 < 2^(7·(D-1) + 21) must satisfy V2 < 2^(16·tail)·p
#: (mont_reduce_wide precondition) — tail = 2 covers every field here
#: (BLS: 2^273 < 2^32·p ≈ 2^287).
FOLD_TAIL_ITERS = 2


def n_digits(field: Field) -> int:
    """Digits per element (covers the full Montgomery width)."""
    return -(-field.mont_bits // DIGIT_BITS)


def fold_active(field: Field) -> bool:
    """The fold applies to WIDE fields only: narrow fields run a 3-5
    iteration CIOS already (nothing to win), and the fold's in-kernel
    digit-split planes blow the multi-level narrow kernels' scoped VMEM
    (AOT-measured: SMALL m=512 18.87M vs the 16M cap)."""
    return FOLD and field.n_halves >= 12


def out_planes(field: Field) -> int:
    """Digit planes the base conv matmul emits: the full convolution
    profile E = 2D-1, or D when the matrix rows are pre-folded mod p
    (fold_active)."""
    D = n_digits(field)
    return D if fold_active(field) else 2 * D - 1


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


def digits_of_ints(vals, n_digits: int) -> np.ndarray:
    """Vectorized host digit extraction: a list of python ints (each
    < 2^(7*n_digits)) -> int8[len(vals), n_digits] little-endian 7-bit
    digits. bytes -> bit matrix -> 7-bit regrouping, all numpy — the
    conv-matrix builders call this on up to ~10^5 entries per matrix
    (the per-entry python loop took minutes on the twiddle matrix
    stacks; ADVICE-round-4-adjacent hot path)."""
    nbytes = (7 * n_digits + 7) // 8
    buf = b"".join(v.to_bytes(nbytes, "little") for v in vals)
    raw = np.frombuffer(buf, np.uint8).reshape(len(vals), nbytes)
    bits = np.unpackbits(raw, axis=1, bitorder="little")[:, :7 * n_digits]
    w = (1 << np.arange(7, dtype=np.uint8))
    digs = (bits.reshape(len(vals), n_digits, 7) * w).sum(
        axis=2, dtype=np.uint8)
    return digs.astype(np.int8)


def conv_matrix(entries, field: Field) -> np.ndarray:
    """Host build of the digit convolution matrix for a modular linear map.

    ``entries``: m x m nested list of Python ints (the map M̃, already
    pre-scaled by R*2^16 mod p — see :func:`apply_matrix`). Returns int8
    A[(e*m + k), (d2*m + i)] = digit_{e-d2}(M̃[k][i]), shape [E*m, D*m] with
    E = 2D-1.
    """
    if fold_active(field):
        return conv_matrix_folded(entries, field)
    m = len(entries)
    D = n_digits(field)
    E = 2 * D - 1
    digs = digits_of_ints(
        [v for row in entries for v in row], D).reshape(m, m, D)
    A = np.zeros((E, m, D, m), dtype=np.int8)
    for d2 in range(D):
        A[d2:d2 + D, :, d2, :] = digs.transpose(2, 0, 1)
    return A.reshape(E * m, D * m)


def conv_matrix_folded(entries, field: Field) -> np.ndarray:
    """Pre-folded conv matrix: row (d2, i) holds the digits of
    M̃[k][i]·2^(7·d2) mod p — each shifted row REDUCED mod p at build
    time, so the matmul emits D output planes instead of E = 2D-1
    (half the MACs and half the downstream recompose work). Exact:
    residues are preserved term-by-term, so
    Σ_e 2^(7e)·Z'[e] ≡ Σ_i M̃[k][i]·x[i] (mod p) still holds — only the
    integer REPRESENTATIVE changes, and the Montgomery wide-reduction
    window only needs the representative bounded (see zmax asserts)."""
    m = len(entries)
    D = n_digits(field)
    p = field.p
    # per entry, the D shifted residues (v·2^(7·d2)) mod p by iterated
    # shift-reduce; digit extraction vectorized (digits_of_ints) — the
    # triple python loop took ~seconds/matrix and made the round-5
    # twiddle matrix stacks (O(n2) matrices per level) unbuildable
    vals = []
    for row in entries:
        for v in row:
            cur = v
            for _ in range(D):
                vals.append(cur)
                cur = (cur << DIGIT_BITS) % p
    digs = digits_of_ints(vals, D).reshape(m, m, D, D)  # [k, i, d2, t]
    A = digs.transpose(3, 0, 2, 1)                      # [t, k, d2, i]
    return np.ascontiguousarray(A).reshape(D * m, D * m)


def matrix_prescale(field: Field) -> int:
    """The factor baked into matrix entries: R * 2^16 mod p."""
    return (field.R << HALF_BITS) % field.p


def reduce_iters(field: Field) -> int:
    return field.n_halves + 1


def halves_info(P: int, zmax_bits: int) -> tuple:
    """Static shape/bound metadata of :func:`_planes_to_halves` for P
    digit planes < 2^zmax_bits: (J half planes, max bits per half).
    Used to pre-build fold matrices host-side (they enter Pallas kernels
    as operands, so their shape must be known before tracing)."""
    total_bits = DIGIT_BITS * (P - 1) + zmax_bits
    J = -(-total_bits // HALF_BITS) + 1
    cnt = [0] * J
    for e in range(P):
        bitpos = DIGIT_BITS * e
        q, r = bitpos >> 4, bitpos & 15
        cnt[q] += 1
        cnt[q + 1] += 1
        if zmax_bits + r > 32:
            cnt[q + 2] += 1
    # exact bound: each contribution < 2^16, so a half with c of them
    # is <= c*(2^16-1) — tighter than 2^(16+ceil(log2 c)) at powers of 2
    return J, (max(1, max(cnt)) * ((1 << HALF_BITS) - 1)).bit_length()


def _planes_to_halves(Z, zmax_bits: int):
    """int32[P, m, *b] digit-plane accumulators (non-negative,
    < 2^zmax_bits, plane e weighted 2^(7e)) -> (list of lazy uint32
    16-bit-half planes, max bits per half). Each half receives at most
    a handful of <2^16 contributions, so entries stay well under
    uint32. Shape/bounds match :func:`halves_info` by construction."""
    P = Z.shape[0]
    Zu = Z.astype(jnp.uint32)
    n_halves, hbits = halves_info(P, zmax_bits)
    acc = [None] * n_halves

    def _add(idx, val):
        acc[idx] = val if acc[idx] is None else acc[idx] + val

    M = np.uint32(0xFFFF)
    for e in range(P):
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
    return halves, hbits


def recompose_reduce(Z, field: Field, zmax_bits: int, fold_mat=None):
    """int32[P, m, *b] digit-plane accumulators (non-negative, < 2^zmax_bits)
    -> canonical Montgomery word planes uint32[W, m, *b]: re-base the digit
    sums to 16-bit half planes (lazy), then Montgomery wide-reduce by
    2^(16*(L+1)).

    FOLD path: instead of the iters = L+1 VPU CIOS elimination passes,
    ONE small int8 matmul against the fold matrix (``fold_mat`` operand
    inside Pallas kernels; built on the fly for XLA graphs) followed by a
    FOLD_TAIL_ITERS-step tail — reduction mod p is linear over digit
    planes, so it rides the MXU (VERDICT r3 item 3b)."""
    halves, hbits = _planes_to_halves(Z, zmax_bits)
    if not fold_active(field):
        return limbs.mont_reduce_wide(halves, field, reduce_iters(field))
    if fold_mat is None:
        fold_mat = jnp.asarray(fold_reduce_matrix(
            field, len(halves), hbits, zmax_bits))
    return _fold_reduce(halves, hbits, field, fold_mat)


def _fold_reduce(halves: list, hbits: int, field: Field, F):
    """Σ_j halves[j]·2^(16j), each < 2^hbits  ->  value·2^(-16·iters)
    mod p, canonical: 7-bit digit split, fold matmul, short CIOS tail.
    ``F`` must match fold_reduce_matrix(field, len(halves), hbits, ...)."""
    J = len(halves)
    nd = -(-hbits // DIGIT_BITS)
    D = n_digits(field)
    rest = halves[0].shape
    planes = []
    for j in range(J):
        h = halves[j]
        for t in range(nd):
            planes.append((h >> np.uint32(DIGIT_BITS * t))
                          & np.uint32(DIGIT_MASK))
    C = F.shape[1]  # padded contraction size (>= J*nd)
    zero = jnp.zeros_like(halves[0])
    planes += [zero] * (C - len(planes))
    Hd = jnp.stack(planes, axis=0).astype(jnp.int8)  # [C, m, *b]

    def dot2(Xf):
        return jax.lax.dot_general(
            F, Xf, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    if len(rest) <= 1 or rest[-1] % 128 == 0:
        # single matmul over the flattened batch — the lane merge is
        # Mosaic-legal only when the lane dim is 128-aligned (same gate
        # as apply_matrix; the transposed/sub-128 merge fails with
        # "unsupported shape cast", found by the AOT dist suite)
        Z2 = dot2(Hd.reshape(C, -1)).reshape((D,) + rest)
    else:
        # non-128-aligned trailing lane dim: zero-pad it up to the next
        # multiple of 128 and run ONE merged matmul (<= 4x wasted MACs
        # on the padding, vs the former per-second-minor-slice unroll —
        # up to mid separate dispatches on the fold hot path, ADVICE
        # round 4). The padded merge is the Mosaic-legal case above.
        B = rest[-1]
        mid = 1
        for r in rest[:-1]:
            mid *= r
        Bp = -(-B // 128) * 128
        Hd3 = Hd.reshape(C, mid, B)
        pad = jnp.zeros((C, mid, Bp - B), dtype=Hd3.dtype)
        Hp = jnp.concatenate([Hd3, pad], axis=2)
        Z2 = dot2(Hp.reshape(C, mid * Bp)).reshape(D, mid, Bp)
        Z2 = Z2[:, :, :B].reshape((D,) + rest)
    zmax2 = (J * nd * DIGIT_MASK ** 2).bit_length()
    halves2, _ = _planes_to_halves(Z2, zmax2)
    return limbs.mont_reduce_wide(halves2, field, FOLD_TAIL_ITERS)


_fold_matrix_cache: dict = {}


def fold_reduce_matrix(field: Field, J: int, hbits: int,
                       zmax_bits: int, iters: int | None = None
                       ) -> np.ndarray:
    """int8 fold matrix F[e, j·nd + t] = digit_e((2^(7t + 16j)
    · 2^(16·FOLD_TAIL_ITERS − 16·iters)) mod p): one matmul against it
    maps J lazy half planes to D digit planes whose recomposed value is
    ≡ input·2^(16·tail − 16·iters) (mod p) — the whole Montgomery
    elimination except a 2-step tail. Host numpy, cached, contraction
    dim zero-padded to a multiple of 32 (int8 sublane tile).

    ``iters``: total halves the fold+tail eliminates — the base-matmul
    reduction uses reduce_iters (prescale R·2^16); the twiddle-product
    fold uses n_halves (plain Montgomery R).

    Build-time asserts pin the exactness window: the folded value must
    fit the tail's mont_reduce_wide precondition."""
    if iters is None:
        iters = reduce_iters(field)
    key = (field.name, J, hbits, zmax_bits, iters)
    got = _fold_matrix_cache.get(key)
    if got is not None:
        return got
    p = field.p
    D = n_digits(field)
    nd = -(-hbits // DIGIT_BITS)
    # scale = 2^(16·tail − 16·iters) mod p (modular inverse of 2^16 per
    # net eliminated half)
    sh = 16 * FOLD_TAIL_ITERS - 16 * iters
    scale = pow(2, sh, p) if sh >= 0 else pow(
        pow(2, -sh, p), p - 2, p)
    C = -(-(J * nd) // 32) * 32
    F = np.zeros((D, C), dtype=np.int8)
    for j in range(J):
        cj = (pow(2, 16 * j, p) * scale) % p
        for t in range(nd):
            v = (cj << (DIGIT_BITS * t)) % p
            for e in range(D):
                F[e, j * nd + t] = (v >> (DIGIT_BITS * e)) & DIGIT_MASK
    # exactness windows (build-time, host ints):
    zmax2 = (J * nd * DIGIT_MASK ** 2).bit_length()
    v2_max = 1 << (DIGIT_BITS * (D - 1) + zmax2)
    assert v2_max < (1 << (16 * FOLD_TAIL_ITERS)) * p, \
        "fold tail window overflow — raise FOLD_TAIL_ITERS"
    assert J * nd * DIGIT_MASK ** 2 < (1 << 31), "fold matmul overflow"
    _fold_matrix_cache[key] = F
    return F


def mul_fold_info(field: Field) -> tuple:
    """(J, hbits) of the schoolbook half-product planes of
    :func:`mont_mul_fold`: 2L+1 planes, the middle one accumulating up
    to 2L sixteen-bit contributions."""
    L = field.n_halves
    return 2 * L + 1, (2 * L * ((1 << HALF_BITS) - 1)).bit_length()


def fold_mul_matrix(field: Field) -> np.ndarray:
    """Fold matrix for the twiddle Montgomery product: eliminates the
    plain Montgomery factor R = 2^(16·L) (iters = n_halves), applied to
    the schoolbook product planes of :func:`mont_mul_fold`."""
    J, hbits = mul_fold_info(field)
    return fold_reduce_matrix(field, J, hbits, 0, iters=field.n_halves)


def mont_mul_fold(x, y, field: Field, F):
    """Montgomery product x·y·R^{-1} mod p via schoolbook half products
    + the fold matmul + 2-iteration tail — the MXU-fold replacement for
    the in-kernel twiddle ``limbs.mont_mul`` (the knockout's largest
    single VPU stage). ``F`` = :func:`fold_mul_matrix` operand.
    Bit-exact with limbs.mont_mul (same residue, canonical output)."""
    a = limbs.unpack(x)
    b = limbs.unpack(y)
    L = field.n_halves
    P = [None] * (2 * L + 1)

    def _add(k, v):
        P[k] = v if P[k] is None else P[k] + v

    M = np.uint32((1 << HALF_BITS) - 1)
    for i in range(L):
        for j in range(L):
            prod = a[i] * b[j]           # exact: both < 2^16
            _add(i + j, prod & M)
            _add(i + j + 1, prod >> np.uint32(HALF_BITS))
    shp = jnp.broadcast_shapes(*[p.shape for p in P if p is not None])
    zero = jnp.zeros(shp, jnp.uint32)
    halves = [jnp.broadcast_to(p, shp) if p is not None else zero
              for p in P]
    J, hbits = mul_fold_info(field)
    return _fold_reduce(halves, hbits, field, F)


def apply_matrix(A: jnp.ndarray, x, field: Field, m: int, zmax_bits: int,
                 fold_mat=None):
    """Apply a digit convolution matrix (from :func:`conv_matrix`) to
    Montgomery-form data.

    x: uint32[W, m, *batch]  ->  uint32[W, m, *batch], the modular linear map
    mont(M @ x) along axis 1, computed as one int8 MXU matmul + one VPU
    Montgomery reduction (or the fold path — see FOLD).
    """
    W = field.n_words
    D = n_digits(field)
    E = out_planes(field)
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
    return recompose_reduce(Z, field, zmax_bits, fold_mat=fold_mat)
