"""Vectorized multi-limb Montgomery field arithmetic for TPU.

This is the TPU-native replacement for the reference's vendored CGBN library
(/root/reference/include/cgbn/). The design is deliberately *not* a
translation of CGBN's warp-cooperative layout:

- CGBN distributes the limbs of one big number across TPI warp threads and
  communicates with ``__shfl_sync``/``__ballot_sync``
  (cgbn_cuda.h:110, core/core_mont_wmad.cu:30-46, warp_resolver.cu:68-110).
- Here, **all limbs of an element live in one lane's column**: an element is
  a stack of limb *planes*, ``uint32[W, *batch]`` (W = 32-bit words,
  little-endian), and the batch dimensions are vectorized across the VPU's
  (8, 128) lanes. Limb loops are unrolled in Python at trace time, so there
  is no cross-"thread" shuffle and no ballot-based carry resolution — carries
  ripple through a fixed-depth unrolled chain of elementwise uint32 ops.

Multiplication strategy (SURVEY.md §7 "hard parts"): TPU has no 32x32→64
multiply, so arithmetic is *planned* onto 16-bit half-limbs held in uint32
lanes. The schoolbook identity ``a*b + c + d <= (2^16-1)^2 + 2*(2^16-1) =
2^32 - 1`` means every CIOS multiply-accumulate step fits exactly in a
native uint32 multiply-add with no overflow, so the whole Montgomery product
is straight-line uint32 VPU code.

The Montgomery CIOS loop implements the same algorithm as CGBN's
``core_t::mont_mul`` (core/core_mont.cu:29-77) restructured for local limbs,
with the quotient constant ``np0 = -p^{-1} mod 2^16`` mirroring CGBN's
``-ubinary_inverse(n0)`` (impl_cuda.cu:1008).

Reduction discipline: every public op takes canonical inputs (< p) and
returns canonical outputs (< p). This freezes the cross-backend bit-exactness
contract (SURVEY.md §7) at the cost of one conditional subtract per op.

All functions are pure jnp (traceable under jit, CPU and TPU identical) and
broadcast over trailing batch dimensions.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .fields import HALF_BITS, HALF_MASK, Field

_U = jnp.uint32
_MASK = np.uint32(HALF_MASK)


# ---------------------------------------------------------------------------
# Host <-> device conversions
# ---------------------------------------------------------------------------

def from_ints(values, field: Field) -> jnp.ndarray:
    """Pack python ints (canonical, < p) into the limb-leading device layout
    ``uint32[W, n]`` (the framework's analog of ``cgbn_mem_t::_limbs``,
    /root/reference/include/cgbn/cgbn_cuda.h:117-136, but limb-major so the
    batch dim maps onto TPU lanes)."""
    W = field.n_words
    arr = np.empty((W, len(values)), dtype=np.uint32)
    for j, v in enumerate(values):
        for w in range(W):
            arr[w, j] = (v >> (32 * w)) & 0xFFFFFFFF
    return jnp.asarray(arr)


def to_ints(x, field: Field) -> list:
    """Unpack a ``uint32[W, *batch]`` array back to a flat list of ints
    (batch dims flattened in C order)."""
    a = np.asarray(x, dtype=np.uint64)
    W = field.n_words
    flat = a.reshape(W, -1)
    out = []
    for j in range(flat.shape[1]):
        v = 0
        for w in range(W):
            v |= int(flat[w, j]) << (32 * w)
        out.append(v)
    return out


def const_planes(value: int, field: Field, ndim: int = 1) -> jnp.ndarray:
    """A broadcastable constant element: shape [W] + [1]*(ndim-... ) — i.e.
    uint32[W, 1, 1, ...] with (ndim) trailing singleton dims."""
    W = field.n_words
    words = [(value >> (32 * w)) & 0xFFFFFFFF for w in range(W)]
    arr = np.asarray(words, dtype=np.uint32).reshape((W,) + (1,) * ndim)
    return jnp.asarray(arr)


# ---------------------------------------------------------------------------
# Half-limb pack/unpack
# ---------------------------------------------------------------------------

def unpack(x) -> list:
    """uint32[W, *b] word planes -> list of 2W uint32[*b] 16-bit half planes
    (little-endian)."""
    halves = []
    W = x.shape[0]
    for w in range(W):
        word = x[w]
        halves.append(word & _MASK)
        halves.append(word >> HALF_BITS)
    return halves


def pack(halves: list) -> jnp.ndarray:
    """Inverse of :func:`unpack`."""
    words = []
    for w in range(len(halves) // 2):
        words.append(halves[2 * w] | (halves[2 * w + 1] << HALF_BITS))
    return jnp.stack(words, axis=0)


def _field_halves(field: Field) -> list:
    return [np.uint32(h) for h in field.p_halves]


# ---------------------------------------------------------------------------
# Carry/borrow chains on half-limb lists (each entry an uint32[*b] array
# holding a value < 2^16; intermediate sums may use the full 32 bits)
# ---------------------------------------------------------------------------

def _add_halves(a: list, b: list):
    """(a + b) over L half-limbs -> (L half-limbs, carry-out in {0,1})."""
    out = []
    c = None
    for j in range(len(a)):
        s = a[j] + b[j] if c is None else a[j] + b[j] + c
        out.append(s & _MASK)
        c = s >> HALF_BITS
    return out, c


def _sub_halves(a: list, b: list):
    """(a - b) wrapped over L half-limbs -> (limbs, borrow-out in {0,1}).

    Relies on uint32 wraparound: each step computes a[j] - b[j] - borrow in
    uint32; since a[j] <= 0xFFFF and b[j]+borrow <= 0x10000 the wrapped high
    half is 0 (no borrow) or 0xFFFF (borrow), so ``(s >> 16) & 1`` is the
    borrow bit."""
    out = []
    brw = None
    for j in range(len(a)):
        s = a[j] - b[j] if brw is None else a[j] - b[j] - brw
        out.append(s & _MASK)
        brw = (s >> HALF_BITS) & np.uint32(1)
    return out, brw


def _cond_sub_p(t: list, top, field: Field) -> list:
    """Given t (L half-limbs) + top word (0/1, i.e. value = t + top*2^(16L))
    with value < 2p, return value mod p as L canonical half-limbs.

    Branch-free: computes t - p with a borrow chain and selects — the
    vectorized analog of CGBN's two's-complement conditional subtract
    (core/core_mont.cu:55-76)."""
    u, brw = _sub_halves(t, _field_halves(field))
    # value >= p  iff  top >= borrow-out.
    if top is None:
        ge = brw == 0
    else:
        ge = top >= brw
    return [jnp.where(ge, u[j], t[j]) for j in range(len(t))]


# ---------------------------------------------------------------------------
# Public modular ops (word-plane format in, word-plane format out)
# ---------------------------------------------------------------------------

def add_mod(x, y, field: Field):
    """(x + y) mod p, canonical in/out. Equivalent of the reference butterfly
    add path ``cgbn_add; cgbn_compare; cgbn_sub``
    (/root/reference/src/big-num.cu:95-97)."""
    a, b = unpack(x), unpack(y)
    t, c = _add_halves(a, b)
    return pack(_cond_sub_p(t, c, field))


def sub_mod(x, y, field: Field):
    """(x - y) mod p, canonical in/out (reference big-num.cu:100-103)."""
    a, b = unpack(x), unpack(y)
    d, brw = _sub_halves(a, b)
    dp, _ = _add_halves(d, _field_halves(field))
    neg = brw != 0
    return pack([jnp.where(neg, dp[j], d[j]) for j in range(len(d))])


def neg_mod(x, field: Field):
    """(-x) mod p, canonical."""
    zero = [np.uint32(0)] * field.n_halves
    a = unpack(x)
    d, brw = _sub_halves(zero, a)
    dp, _ = _add_halves(d, _field_halves(field))
    nonzero = brw != 0  # x != 0
    return pack([jnp.where(nonzero, dp[j], d[j]) for j in range(len(d))])


def _halves_stacked(x) -> jnp.ndarray:
    """uint32[W, *b] word planes -> uint32[2W, *b] stacked 16-bit half
    planes (little-endian along axis 0)."""
    lo = x & _MASK
    hi = x >> HALF_BITS
    W = x.shape[0]
    # interleave: [lo0, hi0, lo1, hi1, ...]
    stacked = jnp.stack([lo, hi], axis=1)  # [W, 2, *b]
    return stacked.reshape((2 * W,) + x.shape[1:])


# ---------------------------------------------------------------------------
# fori-loop CIOS scope (Mosaic trace-footprint control)
#
# The unrolled CIOS forms below trace L (resp. ``iters``) copies of their
# loop body — for 16-half (256-bit) fields that is hundreds of vector ops
# per modular product, and a Pallas kernel containing several of them (the
# multi-level sub-NTT kernels) overflows the Mosaic compile helper's memory
# (round-2 limit: no 256-bit multi-level kernel at any m >= 64). Inside
# ``fori_limb_loops()`` the wide-field ops switch to jax.lax.fori_loop
# bodies traced ONCE — identical arithmetic (bit-exact, property-tested),
# ~L-fold smaller kernel IR. Kernels enable the scope around their body
# trace; XLA-level graphs keep the unrolled form (XLA handles the op count
# fine and fuses across iterations).
# ---------------------------------------------------------------------------

_LOOP_SCOPE = False

#: only fields at least this wide switch (narrow-field unrolls are small
#: and faster: no loop-carried state, better Mosaic scheduling).
#: NTT_LOOP_MIN_HALVES overrides — set 99 to force the unrolled round-2
#: form everywhere (the production-kernel loop-vs-unroll TPU A/B; the
#: loop form is REQUIRED only for the SUB256 multi-level compiles)
LOOP_MIN_HALVES = int(
    __import__("os").environ.get("NTT_LOOP_MIN_HALVES", "12"))

#: force the loop form in SINGLE-level MXU kernels too (the round-3
#: default). The round-3 chip A/B (TPU_CAMPAIGN_r3/cios_unrolled.log)
#: measured the unrolled form 2.45x faster at 2^18 BLS mxu_chunked
#: (1.787ms vs 4.37ms sustained), and the loop form is compile-REQUIRED
#: only for the multi-level wide-field kernels — so single-level kernels
#: default to the unrolled round-2 form and only kernels that need the
#: smaller IR opt in (via fori_limb_loops(enabled=...)).
LOOP_SINGLE = __import__("os").environ.get("NTT_LOOP_SINGLE", "0") == "1"


class fori_limb_loops:
    """Context manager: within, mont_mul/mont_reduce_wide on wide fields
    (n_halves >= LOOP_MIN_HALVES) trace as fori_loop bodies.

    ``enabled=False`` makes the scope a no-op (single-level kernels whose
    unrolled form both compiles and runs 2.45x faster on chip);
    NTT_LOOP_SINGLE=1 re-enables it everywhere for the chip A/B."""

    def __init__(self, enabled: bool = True):
        self._enabled = enabled or LOOP_SINGLE

    def __enter__(self):
        global _LOOP_SCOPE
        self._prev = _LOOP_SCOPE
        _LOOP_SCOPE = self._enabled
        return self

    def __exit__(self, *exc):
        global _LOOP_SCOPE
        _LOOP_SCOPE = self._prev
        return False


def _mont_mul_loop(x, y, field: Field):
    """fori_loop form of :func:`mont_mul` — same lazy-CIOS recurrence with
    the outer half-limb iteration as a traced-once loop body."""
    import jax
    L = field.n_halves
    a = _halves_stacked(x)
    b = _halves_stacked(y)
    bb = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    b = jnp.broadcast_to(b, (L,) + bb)
    p_h = _field_halves(field)  # scalar literals — a jnp array here would
    # be a captured constant, which pallas_call rejects inside kernels
    np0 = np.uint32(field.np0)
    z1 = jnp.zeros((1,) + bb, dtype=jnp.uint32)
    t0 = jnp.zeros((L + 1,) + bb, dtype=jnp.uint32)

    # The loop reads one plane of ``a`` per iteration. Indexing with the
    # traced loop variable would be a dynamic_slice — UNIMPLEMENTED in
    # the Pallas TPU lowering (caught by tests/test_lowering.py) — so the
    # stack rides the loop carry and ROLLS by one each iteration: the
    # needed plane is always statically index 0.
    def body(i, carry):
        t, ar = carry
        prod = ar[0] * b                                # [L, *bb]
        t = t + jnp.concatenate([prod & _MASK, z1], axis=0) \
              + jnp.concatenate([z1, prod >> HALF_BITS], axis=0)
        m = (t[0] * np0) & _MASK
        mp = jnp.stack([m * ph for ph in p_h], axis=0)  # [L, *bb]
        t = t + jnp.concatenate([mp & _MASK, z1], axis=0) \
              + jnp.concatenate([z1, mp >> HALF_BITS], axis=0)
        carry0 = t[0] >> HALF_BITS
        t = jnp.concatenate([(t[1] + carry0)[None], t[2:], z1], axis=0)
        return t, jnp.concatenate([ar[1:], ar[:1]], axis=0)

    t, _ = jax.lax.fori_loop(0, L, body, (t0, a))
    out = []
    c = None
    for j in range(L):
        s = t[j] if c is None else t[j] + c
        out.append(s & _MASK)
        c = s >> HALF_BITS
    top = t[L] + c
    return pack(_cond_sub_p(out, top, field))


def _mont_reduce_wide_loop(halves: list, field: Field, iters: int):
    """fori_loop form of :func:`mont_reduce_wide`: a sliding window of
    L+2 half planes rides the eliminations; each iteration retires the
    bottom plane and shifts the next stacked input plane in."""
    import jax
    L = field.n_halves
    Wn = L + 2
    T0 = len(halves)
    assert T0 <= iters + Wn, "value wider than the elimination window"
    zero = jnp.zeros_like(halves[0])
    Hp = jnp.stack(list(halves) + [zero] * (iters + Wn - T0), axis=0)
    bshape = Hp.shape[1:]
    p_h = _field_halves(field)  # scalar literals (see _mont_mul_loop)
    np0 = np.uint32(field.np0)
    z1 = jnp.zeros((1,) + bshape, dtype=jnp.uint32)

    # The incoming-plane stream Hp[Wn:] rides the loop carry and rolls by
    # one per iteration so the read is statically index 0 (no
    # dynamic_slice — unimplemented in the Pallas TPU lowering; see
    # _mont_mul_loop).
    def body(i, carry):
        win, R = carry
        m = (win[0] * np0) & _MASK
        mp = jnp.stack([m * ph for ph in p_h], axis=0)  # [L, *b]
        win = win + jnp.concatenate([mp & _MASK, z1, z1], axis=0) \
                  + jnp.concatenate([z1, mp >> HALF_BITS, z1], axis=0)
        carry0 = win[0] >> HALF_BITS  # low half 0 by construction of m
        win = jnp.concatenate([win[1:], R[:1]], axis=0)
        win = jnp.concatenate([(win[0] + carry0)[None], win[1:]], axis=0)
        return win, jnp.concatenate([R[1:], R[:1]], axis=0)

    win, _ = jax.lax.fori_loop(0, iters, body, (Hp[:Wn], Hp[Wn:]))
    out = []
    c = None
    for j in range(L):
        s = win[j] if c is None else win[j] + c
        out.append(s & _MASK)
        c = s >> HALF_BITS
    top = c + win[L] + win[L + 1]
    return pack(_cond_sub_p(out, top, field))


def mont_mul(x, y, field: Field):
    """Montgomery product  x*y*R^{-1} mod p, canonical in/out.

    Lazy-carry CIOS with 16-bit half-limbs (base 2^16), vectorized over the
    half-limb axis: the local-limb restructuring of CGBN
    ``core_t::mont_mul`` (/root/reference/include/cgbn/core/core_mont.cu:
    29-77), but instead of rippling a carry through every inner step
    (O(L^2) traced ops), each outer iteration accumulates the 16x16->32
    partial products lo/hi into a redundant uint32 accumulator vector. Each
    accumulator entry gains at most 4*(2^16-1) per iteration and survives at
    most L iterations, so entries stay below ~2^22 — far from uint32
    overflow — and a single carry-propagation pass at the end restores the
    canonical representation (the "lazy/redundant representation" plan of
    SURVEY.md §7).
    """
    L = field.n_halves
    if _LOOP_SCOPE and L >= LOOP_MIN_HALVES:
        return _mont_mul_loop(x, y, field)
    a = _halves_stacked(x)  # [L, *ba]
    b = _halves_stacked(y)  # [L, *bb]
    p_h = _field_halves(field)  # scalar literals (Pallas-kernel friendly:
    # no captured array constants, cf. kernels/vmem_ntt.py)
    np0 = np.uint32(field.np0)

    bb = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    t = jnp.zeros((L + 1,) + bb, dtype=jnp.uint32)
    z1 = jnp.zeros((1,) + bb, dtype=jnp.uint32)

    for i in range(L):
        # --- multiply-accumulate a_i * b into t (lazy) ---
        prod = a[i] * b  # exact: both operands < 2^16
        prod = jnp.broadcast_to(prod, (L,) + bb)
        t = t + jnp.concatenate([prod & _MASK, z1], axis=0) \
              + jnp.concatenate([z1, prod >> HALF_BITS], axis=0)
        # --- Montgomery step: choose m so position 0 becomes 0 mod 2^16 ---
        m = (t[0] * np0) & _MASK  # t[0]&M is the true low half (exact)
        mp = jnp.stack([m * ph for ph in p_h], axis=0)  # [L, *bb]
        t = t + jnp.concatenate([mp & _MASK, z1], axis=0) \
              + jnp.concatenate([z1, mp >> HALF_BITS], axis=0)
        # --- exact divide by 2^16: drop position 0, push its carry up ---
        carry0 = t[0] >> HALF_BITS  # low half is 0 by construction of m
        t = jnp.concatenate([(t[1] + carry0)[None], t[2:], z1], axis=0)

    # --- final carry propagation (redundant -> canonical half-limbs) ---
    out = []
    c = None
    for j in range(L):
        s = t[j] if c is None else t[j] + c
        out.append(s & _MASK)
        c = s >> HALF_BITS
    top = t[L] + c  # < 2^16; value < 2p so top word is 0 or 1
    return pack(_cond_sub_p(out, top, field))


def mont_sqr(x, field: Field):
    return mont_mul(x, x, field)


def mont_reduce_wide(halves: list, field: Field, iters: int):
    """Montgomery-reduce a wide value given as a list of uint32 half-limb
    planes (little-endian base 2^16; entries may be *lazy*, i.e. hold sums up
    to a few bits above 2^16): returns ``value * 2^(-16*iters) mod p`` as
    canonical word planes.

    The local-limb analog of CGBN ``mont_reduce_wide``
    (/root/reference/include/cgbn/impl_cuda.cu:1013-1024,
    core/core_mont.cu:80-114): ``iters`` CIOS elimination steps, each
    choosing q = (t0 * np0) mod 2^16 so the lowest half becomes divisible by
    2^16, using the lazy uint32 accumulator discipline of :func:`mont_mul`
    (each entry gains < 2^17 per surviving iteration, so nothing overflows
    uint32 for iters <= ~32).

    Precondition: value < 2^(16*iters) * p, so the result is < 2p before the
    final conditional subtract.
    """
    L = field.n_halves
    if (_LOOP_SCOPE and L >= LOOP_MIN_HALVES and iters > 0
            and len(halves) <= iters + L + 2):
        return _mont_reduce_wide_loop(halves, field, iters)
    p_h = _field_halves(field)
    np0 = np.uint32(field.np0)
    t = list(halves)
    zero = jnp.zeros_like(t[0])
    for _ in range(iters):
        # q so that (t[0] + q*p) ≡ 0 mod 2^16; masking a lazy t[0] is exact
        # because uint32 wraparound preserves the value mod 2^16.
        m = (t[0] * np0) & _MASK
        add_lo = [(m * p_h[j]) & _MASK for j in range(L)]
        add_hi = [(m * p_h[j]) >> HALF_BITS for j in range(L)]
        carry0 = (t[0] + add_lo[0]) >> HALF_BITS  # low half 0 by construction
        nt = []
        for j in range(1, max(len(t), L + 1)):
            v = t[j] if j < len(t) else zero
            if j < L:
                v = v + add_lo[j]
            if j - 1 < L:
                v = v + add_hi[j - 1]
            if j == 1:
                v = v + carry0
            nt.append(v)
        t = nt
    # final carry propagation (lazy -> canonical), fold everything above L
    out = []
    c = None
    for j in range(L):
        s = t[j] if c is None else t[j] + c
        out.append(s & _MASK)
        c = s >> HALF_BITS
    top = c
    for j in range(L, len(t)):
        top = top + t[j]
    return pack(_cond_sub_p(out, top, field))


def to_mont(x, field: Field):
    """Standard -> Montgomery form: x*R mod p = mont_mul(x, R^2)."""
    r2 = const_planes(field.R2, field, ndim=x.ndim - 1)
    return mont_mul(x, r2, field)


def from_mont(x, field: Field):
    """Montgomery -> standard form: mont_mul(x, 1)."""
    one = const_planes(1, field, ndim=x.ndim - 1)
    return mont_mul(x, one, field)


def mont_pow(x, exponent: int, field: Field):
    """x^exponent (x in Montgomery form, result in Montgomery form) by
    square-and-multiply with a *static* Python exponent — the trace-time
    analog of CGBN ``cgbn_modular_power`` (impl_cuda.cu:938-970) /
    ``FIELD_pow`` (GZKP-NTT.cu:310-319)."""
    result = None
    base = x
    e = int(exponent)
    while e > 0:
        if e & 1:
            result = base if result is None else mont_mul(result, base, field)
        e >>= 1
        if e:
            base = mont_sqr(base, field)
    if result is None:
        return const_planes(field.R, field, ndim=x.ndim - 1) + jnp.zeros_like(x)
    return result


def eq(x, y) -> jnp.ndarray:
    """Elementwise equality over all word planes (CGBN cgbn_equals analog,
    cgbn.h:156-159)."""
    return jnp.all(x == y, axis=0)


def is_canonical(x, field: Field) -> jnp.ndarray:
    """Debug check: every element < p (value-check analog of CGBN's error
    monitor taxonomy, cgbn.h:30-43)."""
    _, brw = _sub_halves(unpack(x), _field_halves(field))
    return brw != 0


def debug_check(x, field: Field, where: str):
    """NTT_DEBUG=1 tripwire: insert a traced canonicity check that raises
    host-side if any element is >= p — the runtime analog of CGBN's error
    monitor (cgbn.h:30-63, instantiable per kernel but unused by the
    reference programs). A no-op (identity) unless the env var is set, so
    production graphs carry zero overhead. Used at layer boundaries by the
    API layer; the intended guard-rail for lazy-reduction internals."""
    import os
    if os.environ.get("NTT_DEBUG", "0") != "1":
        return x
    import jax

    def _raise(ok, bad):
        if not bool(ok):
            raise ValueError(
                f"NTT_DEBUG: {int(bad)} non-canonical element(s) (>= p) "
                f"at {where} [{field.name}]")

    c = is_canonical(x, field)
    ok = jnp.all(c)
    bad = jnp.sum(~c)
    jax.debug.callback(_raise, ok, bad)
    return x
