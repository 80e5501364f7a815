"""Shared building blocks for the NTT transform variants.

Everything operates on Montgomery-form limb-plane arrays ``uint32[W, m,
*batch]`` and transforms along axis 1. Twiddle *masters* (powers of the
m-th root of unity, in Montgomery form) are computed host-exactly with
Python ints — they are tiny (m/2 entries for sub-transforms of length m <=
a few thousand) — while data-sized twiddle structures (the four-step
correction matrix, coset power vectors) are generated on device by
log-doubling so they never need host precompute or persistent HBM (see
``power_matrix`` / ``geometric_outer``).

The stage structure mirrors the reference's kernels in role:

- :func:`dit_stage` is the radix-2 decimation-in-time butterfly stage, the
  vectorized analog of the reference's ``naive`` kernel
  (/root/reference/src/GZKP-NTT.cu:59-71) — one full data pass per stage.
- :func:`ntt_along_axis` runs bit-reversal + all stages, i.e. the golden
  ``NTT()`` semantics (GZKP-NTT.cu:30-48) vectorized over a batch axis.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import limbs
from ..fields import Field
from ..oracle import bit_reverse_table


# ---------------------------------------------------------------------------
# Host-exact twiddle masters (tiny; analog of the reference's host-side
# pq[]/omegas[] table builds, GZKP-NTT.cu:487-511)
# ---------------------------------------------------------------------------

_master_cache: dict = {}


def twiddle_master(field: Field, m: int, inverse: bool) -> np.ndarray:
    """Powers ω_m^0 .. ω_m^{m/2-1} in Montgomery form, as a host numpy
    uint32[W, m/2] array. Cached per (field, m, inverse)."""
    key = (field.name, m, inverse)
    got = _master_cache.get(key)
    if got is None:
        w = field.inv_root_of_unity(m) if inverse else field.root_of_unity(m)
        p = field.p
        vals = []
        cur = 1
        for _ in range(max(m // 2, 1)):
            vals.append(field.to_mont_int(cur))
            cur = cur * w % p
        got = np.asarray(
            [[field.int_to_words(v)[k] for v in vals] for k in range(field.n_words)],
            dtype=np.uint32,
        )
        _master_cache[key] = got
    return got


def host_powers(field: Field, base: int, count: int) -> np.ndarray:
    """Montgomery-form powers base^0..base^{count-1} as uint32[W, count]
    (host-exact; use only for small count)."""
    p = field.p
    vals = []
    cur = 1
    for _ in range(count):
        vals.append(field.to_mont_int(cur))
        cur = cur * base % p
    return np.asarray(
        [[field.int_to_words(v)[k] for v in vals] for k in range(field.n_words)],
        dtype=np.uint32,
    )


# ---------------------------------------------------------------------------
# Stage ops
# ---------------------------------------------------------------------------

def _bcast_tw(tw, x_ndim: int, axis_extra: int):
    """Reshape a [W, s] twiddle table for broadcasting against
    [W, g, s, *batch]: -> [W, 1, s, 1...]."""
    W, s = tw.shape
    shape = (W, 1, s) + (1,) * (x_ndim - 2 - axis_extra)
    return tw.reshape(shape)


def dit_stage(x, s: int, tw, field: Field):
    """One radix-2 DIT butterfly stage at stride ``s`` along axis 1.

    x: uint32[W, m, *batch]; tw: uint32[W, s] (Montgomery form, ω_{2s}^j),
    or None for the trivial first stage (all twiddles = 1 — skipping the
    Montgomery product there saves ~1/log2(m) of the ladder's multiplies).
    Pairs (start+j, start+j+s) within contiguous groups of 2s — identical
    pairing to the reference golden model (GZKP-NTT.cu:39-47).
    """
    W, m = x.shape[0], x.shape[1]
    rest = x.shape[2:]
    g = m // (2 * s)
    xr = x.reshape((W, g, 2, s) + rest)
    a = xr[:, :, 0]
    b = xr[:, :, 1]
    if tw is not None:
        twb = _bcast_tw(tw, a.ndim, 1)
        b = limbs.mont_mul(b, twb, field)
    lo = limbs.add_mod(a, b, field)
    hi = limbs.sub_mod(a, b, field)
    return jnp.stack([lo, hi], axis=2).reshape(x.shape)


def dit_stage4(x, s: int, tw1, tw2, field: Field):
    """TWO radix-2 DIT stages (strides s and 2s) fused into one reshape
    round — the ladder analog of the reference's radix-2^deg stage
    batching (deg stages per launch, GZKP-NTT.cu:523). Montgomery-product
    count is identical to two radix-2 stages (radix-4 saves no modular
    muls in an NTT: the ω_4 factor is a full field constant, unlike the
    free i of a complex FFT); what it halves is the number of
    stack/reshape relayout rounds.

    tw1: [W, s] stage-s twiddles ω_{2s}^j or None (trivial, s == 1);
    tw2: [W, 2s] stage-2s twiddles ω_{4s}^j.
    """
    W, m = x.shape[0], x.shape[1]
    rest = x.shape[2:]
    g = m // (4 * s)
    xr = x.reshape((W, g, 4, s) + rest)
    x0, x1, x2, x3 = xr[:, :, 0], xr[:, :, 1], xr[:, :, 2], xr[:, :, 3]
    if tw1 is not None:
        b1 = _bcast_tw(tw1, x0.ndim, 1)
        x1 = limbs.mont_mul(x1, b1, field)
        x3 = limbs.mont_mul(x3, b1, field)
    t0 = limbs.add_mod(x0, x1, field)
    t1 = limbs.sub_mod(x0, x1, field)
    t2 = limbs.add_mod(x2, x3, field)
    t3 = limbs.sub_mod(x2, x3, field)
    if s > 1:  # ω_{4s}^j over j < s; trivial (=1) when s == 1
        t2 = limbs.mont_mul(t2, _bcast_tw(tw2[:, :s], t2.ndim, 1), field)
    t3 = limbs.mont_mul(t3, _bcast_tw(tw2[:, s:], t3.ndim, 1), field)
    y0 = limbs.add_mod(t0, t2, field)
    y2 = limbs.sub_mod(t0, t2, field)
    y1 = limbs.add_mod(t1, t3, field)
    y3 = limbs.sub_mod(t1, t3, field)
    return jnp.stack([y0, y1, y2, y3], axis=2).reshape(x.shape)


def bit_reverse_axis1(x):
    """Bit-reverse permute along axis 1 (the vectorized analog of the
    reference's ``rearrange`` kernel, GZKP-NTT.cu:50-57)."""
    m = x.shape[1]
    rev = np.asarray(bit_reverse_table(m), dtype=np.int32)
    return jnp.take(x, rev, axis=1)


def ntt_along_axis_stockham(x, field: Field, inverse: bool = False):
    """Self-sorting NTT along axis 1 (natural order in/out, Montgomery
    form, no 1/n scaling) with NO bit-reversal permutation anywhere:
    radix-2 four-step applied recursively (n1 = 2), where each level's
    "transpose" is a pure reshape/stack. This is the Stockham autosort
    dataflow — the role the reference's out-of-place ``No_Swap`` variant
    plays (scattered ping-pong writes that eliminate the rearrange pass,
    /root/reference/src/GZKP-NTT.cu:237-296), expressed as reshapes XLA can
    lower without gathers.

    Identity per level (n = 2·h, i = i1·h + i2, ω the n-th root):
        X[k2·2 + k1] = NTT_h over i2 of [ ω^{k1·i2} · (x[i2] ± x[h+i2]) ]
    """
    W, m = x.shape[0], x.shape[1]
    rest = x.shape[2:]
    if m == 1:
        return x
    h = m // 2
    xf = x.reshape(W, 2, h, -1)             # batch flattened (rank stays 4)
    a = xf[:, 0]
    b = xf[:, 1]
    lo = limbs.add_mod(a, b, field)
    hi = limbs.sub_mod(a, b, field)
    if m > 2:  # the m=2 level's twiddle is identically 1
        tw = twiddle_master(field, m, inverse)  # [W, m/2] = ω_m^{i2}
        hi = limbs.mont_mul(hi, jnp.asarray(tw)[:, :, None], field)
    y = jnp.stack([lo, hi], axis=2)         # [W, h(i2), 2(k1), B]
    y = y.reshape(W, h, -1)                 # fold k1 into the batch
    z = ntt_along_axis_stockham(y, field, inverse)   # over i2 -> k2
    return z.reshape((W, m) + rest)         # flat (k2, k1, batch) = X[k2*2+k1]


#: fuse DIT stage pairs into radix-4 rounds (halves reshape relayouts;
#: same Montgomery-product count) — A/B knob, read at trace time
RADIX4 = __import__("os").environ.get("NTT_RADIX4", "0") == "1"


def ntt_along_axis(x, field: Field, inverse: bool = False):
    """Full natural-order NTT along axis 1 of uint32[W, m, *batch]
    (Montgomery form in/out, no 1/n scaling)."""
    m = x.shape[1]
    if m == 1:
        return x
    master = twiddle_master(field, m, inverse)  # [W, m/2]
    x = bit_reverse_axis1(x)
    s = 1
    while s < m:
        step = (m // 2) // s
        if RADIX4 and 4 * s <= m:
            tw1 = None if s == 1 else jnp.asarray(master[:, ::step][:, :s])
            step2 = (m // 2) // (2 * s)
            tw2 = jnp.asarray(master[:, ::step2][:, : 2 * s])
            x = dit_stage4(x, s, tw1, tw2, field)
            s <<= 2
        else:
            tw = None if s == 1 else jnp.asarray(master[:, ::step][:, :s])
            x = dit_stage(x, s, tw, field)
            s <<= 1
    return x


# ---------------------------------------------------------------------------
# Chunked execution: keep per-op working sets VMEM-sized.
#
# Measured on the v5e benching tile: an op graph whose arrays fit on-chip
# (~8MB) runs at full VPU rate; the identical graph at 4x the size runs
# ~26x slower per element because every stage round-trips the (heavily
# throttled, ~21GB/s) HBM. So any data-sized ladder or elementwise pass is
# applied chunk-by-chunk over a batch axis with a fori_loop + dynamic
# slices: each chunk's sub-graph stays VMEM-resident, and HBM sees one
# read + one write per chunk instead of one per stage.
# ---------------------------------------------------------------------------

#: below this total size, never chunk — measured: an 8MB input (2^18 x 8
#: words) runs the whole stage chain fully resident at 1.7ms, and chunking
#: it is a large regression.
CHUNK_SINGLE = int(8.6e6)
#: when chunking, aim for chunks of this size (slightly above 4MiB so a
#: 4MiB chunk isn't re-chunked by nested calls)
CHUNK_BYTES = int(4.3e6)


def n_chunks_for(n_bytes: int, cap: int) -> int:
    if n_bytes <= CHUNK_SINGLE:
        return 1
    n = 1
    while n_bytes // n > CHUNK_BYTES and n < cap:
        n *= 2
    return n


def chunked_along_axis(fn, x, axis: int, also=None):
    """Apply ``fn`` chunk-by-chunk along ``axis`` of x (power-of-two sized
    axes). ``also``: optional second array sliced along the same axis and
    passed as fn's second argument (e.g. a twiddle table). fn must be
    shape-preserving."""
    size = x.shape[axis]
    n_chunks = n_chunks_for(x.size * x.dtype.itemsize, size)
    if n_chunks <= 1:
        return fn(x, also) if also is not None else fn(x)
    bc = size // n_chunks

    def body(i, acc):
        sl = jax.lax.dynamic_slice_in_dim(x, i * bc, bc, axis=axis)
        if also is not None:
            asl = jax.lax.dynamic_slice_in_dim(also, i * bc, bc, axis=axis)
            y = fn(sl, asl)
        else:
            y = fn(sl)
        return jax.lax.dynamic_update_slice_in_dim(acc, y, i * bc, axis=axis)

    return jax.lax.fori_loop(0, n_chunks, body, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# Host-side data-sized twiddle tables (passed into jit as arguments, so the
# generation graph never bloats the compiled program — the C++ hostlib plays
# the role CGBN's GMP backend plays for the reference's host-side twiddle
# precompute, /root/reference/src/big-num.cu:122-145)
# ---------------------------------------------------------------------------

def host_powers_fast(field: Field, base: int, count: int) -> np.ndarray:
    """Montgomery-form powers base^0..base^{count-1} as np.uint32[W, count]
    via the native hostlib when available (Python-int fallback)."""
    from .. import hostlib
    if field.bits <= 256 and hostlib.available():
        return hostlib.powers_np(base, count, field, mont_form=True)
    return host_powers(field, base, count)


def host_power_matrix(field: Field, base: int, n1: int, n2: int) -> np.ndarray:
    """Montgomery-form T[i, j] = base^{i*j} as np.uint32[W, n1, n2], built on
    host (the four-step decomposition twiddle — see :func:`power_matrix` for
    the on-device variant used inside shard_map)."""
    count = (n1 - 1) * (n2 - 1) + 1
    pw = host_powers_fast(field, base, count)
    idx = np.outer(np.arange(n1, dtype=np.int64),
                   np.arange(n2, dtype=np.int64))
    return np.ascontiguousarray(pw[:, idx])


# ---------------------------------------------------------------------------
# Device-side twiddle generation (data-sized structures)
# ---------------------------------------------------------------------------

def power_matrix_chunked(field: Field, base: int, n1: int, n2: int):
    """power_matrix for big tables: generated row-chunk by row-chunk so the
    doubling loop's Montgomery temporaries stay bounded (a monolithic
    mont_mul over [W, 512, 16384] allocates ~18GB of lazy-CIOS temps and
    OOMs HBM). One-time cost at aux-build."""
    W = field.n_words
    col = jnp.asarray(host_powers_fast(field, base, n1))  # [W, n1]: base^i
    rows_per_chunk = max(1, (1 << 20) // max(n2, 1))
    n_chunks = max(1, n1 // rows_per_chunk)
    rows_per_chunk = n1 // n_chunks
    if n_chunks <= 1:
        return power_matrix(field, base, n1, n2)

    def gen_chunk(col_c):
        # T[i, j] = (base^i)^j for the rows of this chunk, by j-doubling
        T = limbs.const_planes(field.R, field, 2) + jnp.zeros(
            (W, col_c.shape[1], 1), jnp.uint32)
        wk = col_c
        k = 1
        while k < n2:
            grow = min(k, n2 - k)
            T = jnp.concatenate(
                [T, limbs.mont_mul(T[:, :, :grow], wk[:, :, None], field)],
                axis=2)
            if 2 * k < n2:
                wk = limbs.mont_sqr(wk, field)
            k *= 2
        return T

    def body(i, acc):
        col_c = jax.lax.dynamic_slice_in_dim(
            col, i * rows_per_chunk, rows_per_chunk, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(
            acc, gen_chunk(col_c), i * rows_per_chunk, axis=1)

    out = jnp.zeros((W, n1, n2), dtype=jnp.uint32)
    return jax.lax.fori_loop(0, n_chunks, body, out)


def geometric_outer_chunked(field: Field, base: int, n: int):
    """Consecutive Montgomery-form powers base^0..base^{n-1} as
    uint32[W, n], generated on device in row chunks (rank-1 structure:
    base^{i1*n2+j} = (base^{n2})^{i1} * base^j)."""
    n1, n2 = split_log(n)
    W = field.n_words
    row = jnp.asarray(host_powers_fast(field, base, n2))          # [W, n2]
    col = jnp.asarray(host_powers_fast(
        field, pow(base, n2, field.p), n1))                       # [W, n1]
    rows_per_chunk = max(1, (1 << 21) // max(n2, 1))
    n_chunks = max(1, n1 // rows_per_chunk)
    rows_per_chunk = n1 // n_chunks

    def body(i, acc):
        col_c = jax.lax.dynamic_slice_in_dim(
            col, i * rows_per_chunk, rows_per_chunk, axis=1)
        chunk = limbs.mont_mul(col_c[:, :, None], row[:, None, :], field)
        return jax.lax.dynamic_update_slice_in_dim(
            acc, chunk, i * rows_per_chunk, axis=1)

    out = jnp.zeros((W, n1, n2), dtype=jnp.uint32)
    out = jax.lax.fori_loop(0, n_chunks, body, out)
    return out.reshape(W, n)


def power_matrix(field: Field, base: int, n1: int, n2: int):
    """Montgomery-form matrix T[i, j] = base^{i*j}, uint32[W, n1, n2],
    generated on device with log2(n2) doubling steps (~n total mont_muls —
    about the cost of one butterfly stage; this replaces materializing an
    O(n)-entry host table).

    This is the four-step decomposition twiddle — the role played in the
    reference SSIP stage-1 kernel by the per-element ``twiddle^brev(lid)``
    correction (/root/reference/src/GZKP-NTT.cu:1346-1356).
    """
    col = jnp.asarray(host_powers(field, base, n1))  # [W, n1]: base^i
    T = jnp.asarray(host_powers(field, 1, 1)).reshape(field.n_words, 1, 1)
    T = jnp.broadcast_to(T, (field.n_words, n1, 1))
    wk = col  # base^{i*k}, k = 1
    k = 1
    while k < n2:
        grow = min(k, n2 - k)
        part = limbs.mont_mul(T[:, :, :grow], wk[:, :, None], field)
        T = jnp.concatenate([T, part], axis=2)
        if 2 * k < n2:
            wk = limbs.mont_sqr(wk, field)
        k *= 2
    return T


def geometric_outer(field: Field, base: int, n1: int, n2: int):
    """Montgomery-form powers base^0..base^{n1*n2-1} as uint32[W, n1, n2]
    via the rank-1 outer product base^{i1*n2+i2} = (base^{n2})^{i1} *
    base^{i2} — two tiny host tables, one device mont_mul."""
    p = field.p
    row = jnp.asarray(host_powers(field, base, n2))  # [W, n2]
    col = jnp.asarray(host_powers(field, pow(base, n2, p), n1))  # [W, n1]
    return limbs.mont_mul(col[:, :, None], row[:, None, :], field)


def split_log(n: int) -> tuple:
    """Four-step split n = n1*n2 with n1 >= n2 (mirrors the reference SSIP
    stage-1/stage-2 split of log n into a top and bottom half,
    GZKP-NTT.cu:1509-1545)."""
    log_n = n.bit_length() - 1
    l2 = log_n // 2
    l1 = log_n - l2
    return 1 << l1, 1 << l2
