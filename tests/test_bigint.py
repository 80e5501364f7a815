"""Property tests of the general big-integer layer (ntt_tpu.bigint) —
the CGBN breadth surface (div/rem, sqrt, gcd, modular inverse,
accumulator, bit counting; /root/reference/include/cgbn/cgbn.h:85-425)
— against Python ints."""

import math
import random

import numpy as np
import pytest

from ntt_tpu import bigint
from ntt_tpu.fields import Field, get_field


def _pack(vals, W):
    arr = np.empty((W, len(vals)), dtype=np.uint32)
    for j, v in enumerate(vals):
        for w in range(W):
            arr[w, j] = (v >> (32 * w)) & 0xFFFFFFFF
    return arr


def _unpack(x):
    a = np.asarray(x, dtype=np.uint64)
    W = a.shape[0]
    out = []
    for j in range(a.shape[1]):
        v = 0
        for w in range(W):
            v |= int(a[w, j]) << (32 * w)
        out.append(v)
    return out


def _rand(W, n, seed):
    rng = random.Random(seed)
    top = (1 << (32 * W)) - 1
    special = [0, 1, 2, 3, top, top - 1, top >> 1, (top >> 1) + 1,
               1 << (16 * W), (1 << (16 * W)) - 1]
    vals = [v & top for v in special]
    vals += [rng.randrange(top + 1) for _ in range(n - len(vals))]
    return vals


WIDTHS = [2, 8]   # 64-bit and 256-bit elements
N = 64


@pytest.mark.parametrize("W", WIDTHS)
def test_add_sub_compare(W):
    bits = 32 * W
    xs, ys = _rand(W, N, 10 + W), _rand(W, N, 20 + W)
    X, Y = _pack(xs, W), _pack(ys, W)
    s, c = bigint.add(X, Y)
    assert _unpack(s) == [(a + b) % (1 << bits) for a, b in zip(xs, ys)]
    assert list(np.asarray(c)) == [(a + b) >> bits for a, b in zip(xs, ys)]
    d, brw = bigint.sub(X, Y)
    assert _unpack(d) == [(a - b) % (1 << bits) for a, b in zip(xs, ys)]
    assert list(np.asarray(brw)) == [1 if a < b else 0
                                     for a, b in zip(xs, ys)]
    cmp = list(np.asarray(bigint.compare(X, Y)))
    assert cmp == [(a > b) - (a < b) for a, b in zip(xs, ys)]
    assert list(np.asarray(bigint.equals(X, X))) == [True] * N


@pytest.mark.parametrize("W", WIDTHS)
def test_mul_wide(W):
    bits = 32 * W
    xs, ys = _rand(W, N, 30 + W), _rand(W, N, 40 + W)
    lo, hi = bigint.mul_wide(_pack(xs, W), _pack(ys, W))
    prods = [a * b for a, b in zip(xs, ys)]
    assert _unpack(lo) == [p % (1 << bits) for p in prods]
    assert _unpack(hi) == [p >> bits for p in prods]


@pytest.mark.parametrize("W", WIDTHS)
def test_div_rem(W):
    xs = _rand(W, N, 50 + W)
    ys = [y if y else 7 for y in _rand(W, N, 60 + W)]
    # include tiny and power-of-two divisors
    ys[:6] = [1, 2, 3, 1 << 16, (1 << (16 * W)) + 1, xs[5] or 5]
    q, r = bigint.div_rem(_pack(xs, W), _pack(ys, W))
    assert _unpack(q) == [a // b for a, b in zip(xs, ys)]
    assert _unpack(r) == [a % b for a, b in zip(xs, ys)]


@pytest.mark.parametrize("W", WIDTHS)
def test_div_by_zero_sentinel(W):
    bits = 32 * W
    xs = _rand(W, 16, 70 + W)
    q, r = bigint.div_rem(_pack(xs, W), _pack([0] * 16, W))
    assert _unpack(q) == [(1 << bits) - 1] * 16
    assert _unpack(r) == xs


@pytest.mark.parametrize("W", WIDTHS)
def test_sqrt(W):
    rng = random.Random(80 + W)
    bits = 32 * W
    xs = _rand(W, N, 80 + W)
    # exact squares and off-by-one neighbours
    sq = [rng.randrange(1 << (bits // 2)) ** 2 for _ in range(8)]
    xs[:8] = [v % (1 << bits) for v in sq]
    xs[8:12] = [max(v - 1, 0) for v in xs[:4]]
    got = _unpack(bigint.sqrt(_pack(xs, W)))
    assert got == [math.isqrt(a) for a in xs]


@pytest.mark.parametrize("W", WIDTHS)
def test_gcd(W):
    rng = random.Random(90 + W)
    xs, ys = _rand(W, N, 90 + W), _rand(W, N, 91 + W)
    # shared even factors + zero cases
    g = rng.randrange(1, 1 << 40) << 5
    xs[:4] = [g * 3, g * 4, 0, xs[3]]
    ys[:4] = [g * 5, g * 6, ys[2], 0]
    got = _unpack(bigint.gcd(_pack(xs, W), _pack(ys, W)))
    assert got == [math.gcd(a, b) for a, b in zip(xs, ys)]


@pytest.mark.parametrize("W", WIDTHS)
def test_modular_inverse(W):
    rng = random.Random(100 + W)
    bits = 32 * W
    ms = [rng.randrange(3, 1 << bits) | 1 for _ in range(N)]
    # a real prime modulus too (the BN254 field prime fits 256-bit)
    if W == 8:
        ms[0] = get_field("bn254-fr").p
    xs = [rng.randrange(1 << bits) for _ in range(N)]
    xs[1] = 0
    xs[2] = ms[2] * 3 % (1 << bits)   # shares every factor of m
    got = _unpack(bigint.modular_inverse(_pack(xs, W), _pack(ms, W)))
    for a, m, r in zip(xs, ms, got):
        if math.gcd(a, m) == 1:
            assert r == pow(a, -1, m), (a, m)
        else:
            assert r == 0, (a, m)


@pytest.mark.parametrize("W", WIDTHS)
def test_bit_counting(W):
    xs = _rand(W, N, 110 + W)
    bits = 32 * W
    X = _pack(xs, W)
    assert list(np.asarray(bigint.pop_count(X))) == [
        bin(a).count("1") for a in xs]
    assert list(np.asarray(bigint.clz(X))) == [
        bits - a.bit_length() for a in xs]
    assert list(np.asarray(bigint.ctz(X))) == [
        bits if a == 0 else (a & -a).bit_length() - 1 for a in xs]


@pytest.mark.parametrize("W", WIDTHS)
def test_modular_power(W):
    rng = random.Random(130 + W)
    bits = 32 * W
    n = 12
    ms = [rng.randrange(2, 1 << bits) for _ in range(n)]
    ms[0] = 1 << (bits - 1)          # even modulus works too (not Barrett)
    xs = [rng.randrange(1 << bits) for _ in range(n)]
    es = [rng.randrange(1 << bits) for _ in range(n)]
    es[1] = 0
    got = _unpack(bigint.modular_power(_pack(xs, W), _pack(es, W),
                                       _pack(ms, W)))
    assert got == [pow(a, e, m) for a, e, m in zip(xs, es, ms)]


@pytest.mark.parametrize("W", WIDTHS)
def test_shift_rotate_bits(W):
    bits = 32 * W
    top = (1 << bits) - 1
    xs = _rand(W, N, 140 + W)
    X = _pack(xs, W)
    for k in (0, 1, 7, 16, 31, 32, 100 % bits, bits - 1):
        assert _unpack(bigint.shift_left(X, k)) == [
            (a << k) & top for a in xs], k
        assert _unpack(bigint.shift_right(X, k)) == [a >> k for a in xs], k
        assert _unpack(bigint.rotate_left(X, k)) == [
            ((a << k) | (a >> (bits - k))) & top if k else a
            for a in xs], k
        assert _unpack(bigint.rotate_right(X, k)) == [
            ((a >> k) | (a << (bits - k))) & top if k else a
            for a in xs], k
    got = _unpack(bigint.bit_extract(X, 13, 37))
    assert got == [(a >> 13) & ((1 << 37) - 1) for a in xs]
    ys = _rand(W, N, 141 + W)
    got = _unpack(bigint.bit_insert(X, _pack(ys, W), 13, 37))
    m = ((1 << 37) - 1) << 13
    assert got == [(a & ~m & top) | (((b & ((1 << 37) - 1)) << 13))
                   for a, b in zip(xs, ys)]


@pytest.mark.parametrize("W", WIDTHS)
def test_negate_mul_high_sqr(W):
    bits = 32 * W
    xs, ys = _rand(W, N, 150 + W), _rand(W, N, 151 + W)
    X, Y = _pack(xs, W), _pack(ys, W)
    assert _unpack(bigint.negate(X)) == [(-a) % (1 << bits) for a in xs]
    assert _unpack(bigint.mul_high(X, Y)) == [
        (a * b) >> bits for a, b in zip(xs, ys)]
    assert _unpack(bigint.sqr(X)) == [a * a % (1 << bits) for a in xs]
    lo, hi = bigint.sqr_wide(X)
    assert _unpack(lo) == [a * a % (1 << bits) for a in xs]
    assert _unpack(hi) == [(a * a) >> bits for a in xs]
    assert _unpack(bigint.sqr_high(X)) == [(a * a) >> bits for a in xs]


@pytest.mark.parametrize("W", WIDTHS)
def test_div_rem_wide(W):
    bits = 32 * W
    rng = random.Random(160 + W)
    ys = [y if y else 7 for y in _rand(W, N, 161 + W)]
    ys[0] = 1
    # hi < y (CGBN's precondition: the quotient fits W words)
    his = [rng.randrange(y) for y in ys]
    los = _rand(W, N, 162 + W)
    nums = [(h << bits) | l for h, l in zip(his, los)]
    q, r = bigint.div_rem_wide(_pack(los, W), _pack(his, W), _pack(ys, W))
    assert _unpack(q) == [n // y for n, y in zip(nums, ys)]
    assert _unpack(r) == [n % y for n, y in zip(nums, ys)]
    # remainder stays exact even when hi >= y (quotient truncates)
    q, r = bigint.div_rem_wide(_pack(los[:8], W), _pack(ys[:8], W),
                               _pack(ys[:8], W))
    wides = [(y << bits) | l for l, y in zip(los[:8], ys[:8])]
    assert _unpack(r) == [n % y for n, y in zip(wides, ys[:8])]
    # zero divisor sentinel
    q, r = bigint.div_rem_wide(_pack(los[:4], W), _pack(his[:4], W),
                               _pack([0] * 4, W))
    assert _unpack(q) == [(1 << bits) - 1] * 4
    assert _unpack(r) == los[:4]


@pytest.mark.parametrize("W", WIDTHS)
def test_sqrt_rem_and_wide(W):
    bits = 32 * W
    rng = random.Random(170 + W)
    xs = _rand(W, N, 170 + W)
    s, r = bigint.sqrt_rem(_pack(xs, W))
    assert _unpack(s) == [math.isqrt(a) for a in xs]
    assert _unpack(r) == [a - math.isqrt(a) ** 2 for a in xs]
    # wide: radicand up to 2^(2*bits)
    nums = [rng.randrange(1 << (2 * bits)) for _ in range(N)]
    nums[:3] = [0, (1 << (2 * bits)) - 1, (1 << bits) ** 2 >> 2]
    los = [v % (1 << bits) for v in nums]
    his = [v >> bits for v in nums]
    got = _unpack(bigint.sqrt_wide(_pack(los, W), _pack(his, W)))
    assert got == [math.isqrt(v) for v in nums]
    s, (rlo, rhi) = bigint.sqrt_rem_wide(_pack(los, W), _pack(his, W))
    assert _unpack(s) == [math.isqrt(v) for v in nums]
    rems = [v - math.isqrt(v) ** 2 for v in nums]
    assert _unpack(rlo) == [v % (1 << bits) for v in rems]
    assert _unpack(rhi) == [v >> bits for v in rems]


@pytest.mark.parametrize("W", WIDTHS)
def test_ui32_family(W):
    bits = 32 * W
    top = (1 << bits) - 1
    rng = random.Random(180 + W)
    xs = _rand(W, N, 180 + W)
    us = [rng.randrange(1 << 32) for _ in range(N)]
    us[:4] = [0, 1, 2, 0xFFFFFFFF]
    X = _pack(xs, W)
    U = np.array(us, dtype=np.uint32)
    assert list(np.asarray(bigint.get_ui32(X))) == [
        a & 0xFFFFFFFF for a in xs]
    assert _unpack(bigint.set_ui32(W, U, (N,))) == us
    s, c = bigint.add_ui32(X, U)
    assert _unpack(s) == [(a + u) % (1 << bits) for a, u in zip(xs, us)]
    assert list(np.asarray(c)) == [(a + u) >> bits for a, u in zip(xs, us)]
    d, brw = bigint.sub_ui32(X, U)
    assert _unpack(d) == [(a - u) % (1 << bits) for a, u in zip(xs, us)]
    p, hi = bigint.mul_ui32(X, U)
    assert _unpack(p) == [(a * u) % (1 << bits) for a, u in zip(xs, us)]
    assert list(np.asarray(hi)) == [
        ((a * u) >> bits) & 0xFFFFFFFF for a, u in zip(xs, us)]
    vs = [u if u else 3 for u in us]
    V = np.array(vs, dtype=np.uint32)
    q, r = bigint.div_rem_ui32(X, V)
    assert _unpack(q) == [a // v for a, v in zip(xs, vs)]
    assert list(np.asarray(r)) == [a % v for a, v in zip(xs, vs)]
    # div-by-zero sentinel: q all-ones, r = low word
    q0, r0 = bigint.div_rem_ui32(X[:, :4], np.zeros(4, np.uint32))
    assert _unpack(q0) == [top] * 4
    assert list(np.asarray(r0)) == [a & 0xFFFFFFFF for a in xs[:4]]
    assert list(np.asarray(bigint.equals_ui32(X, U))) == [
        a == u for a, u in zip(xs, us)]
    assert list(np.asarray(bigint.compare_ui32(X, U))) == [
        (a > u) - (a < u) for a, u in zip(xs, us)]
    got = list(np.asarray(bigint.extract_bits_ui32(X, 13, 27)))
    assert got == [(a >> 13) & ((1 << 27) - 1) for a in xs]
    got = _unpack(bigint.insert_bits_ui32(X, 13, 27, U))
    m = ((1 << 27) - 1) << 13
    assert got == [(a & ~m & top) | ((u & ((1 << 27) - 1)) << 13)
                   for a, u in zip(xs, us)]
    odds = np.array([u | 1 for u in us], dtype=np.uint32)
    inv = list(np.asarray(bigint.binary_inverse_ui32(odds)))
    assert inv == [pow(u | 1, -1, 1 << 32) for u in us]
    assert list(np.asarray(bigint.gcd_ui32(X, U))) == [
        0 if u == 0 else math.gcd(a, u) for a, u in zip(xs, us)]


@pytest.mark.parametrize("W", WIDTHS)
def test_binary_inverse(W):
    bits = 32 * W
    xs = [a | 1 for a in _rand(W, N, 190 + W)]
    got = _unpack(bigint.binary_inverse(_pack(xs, W)))
    assert got == [pow(a, -1, 1 << bits) for a in xs]


@pytest.mark.parametrize("W", WIDTHS)
def test_barrett(W):
    bits = 32 * W
    rng = random.Random(200 + W)
    ds = [d if d else 7 for d in _rand(W, N, 200 + W)]
    ds[:5] = [1, 2, 3, (1 << (bits - 1)) + 1, (1 << bits) - 1]
    D = _pack(ds, W)
    approx, shift = bigint.barrett_approximation(D)
    # approximation contract: floor((2^(2b)-1) / (d << clz)) - 2^b
    got_a = _unpack(approx)
    got_s = list(np.asarray(shift))
    for d, a, s in zip(ds, got_a, got_s):
        s_true = bits - d.bit_length()
        assert s == s_true, d
        assert a == ((1 << (2 * bits)) - 1) // (d << s_true) - (1 << bits)
    # div_rem via the approximation
    xs = _rand(W, N, 201 + W)
    q, r = bigint.barrett_div_rem(_pack(xs, W), D, approx, shift)
    assert _unpack(q) == [a // d for a, d in zip(xs, ds)]
    assert _unpack(r) == [a % d for a, d in zip(xs, ds)]
    # wide: hi < d
    his = [rng.randrange(d) for d in ds]
    los = _rand(W, N, 202 + W)
    nums = [(h << bits) | l for h, l in zip(his, los)]
    q, r = bigint.barrett_div_rem_wide(_pack(los, W), _pack(his, W),
                                       D, approx, shift)
    assert _unpack(q) == [v // d for v, d in zip(nums, ds)]
    assert _unpack(r) == [v % d for v, d in zip(nums, ds)]


@pytest.mark.parametrize("W", WIDTHS)
def test_masks_and_select(W):
    bits = 32 * W
    top = (1 << bits) - 1
    xs, ys, zs = _rand(W, N, 210 + W), _rand(W, N, 211 + W), \
        _rand(W, N, 212 + W)
    X, Y, Z = _pack(xs, W), _pack(ys, W), _pack(zs, W)

    def mask_val(nb):
        if 0 <= nb < bits:
            return (1 << nb) - 1
        if -bits < nb < 0:
            return ((1 << -nb) - 1) << (bits + nb)
        return top

    for nb in (0, 1, 13, 32, bits - 1, bits, -1, -13, -bits, 2 * bits):
        m = mask_val(nb)
        assert _unpack(bigint.bitwise_mask_copy(W, nb, (N,))) == [m] * N, nb
        assert _unpack(bigint.bitwise_mask_and(X, nb)) == [
            a & m for a in xs], nb
        assert _unpack(bigint.bitwise_mask_ior(X, nb)) == [
            a | m for a in xs], nb
        assert _unpack(bigint.bitwise_mask_xor(X, nb)) == [
            a ^ m for a in xs], nb
        assert _unpack(bigint.bitwise_mask_select(X, Y, nb)) == [
            (a & ~m & top) | (b & m) for a, b in zip(xs, ys)], nb
    assert _unpack(bigint.bitwise_select(X, Y, Z)) == [
        (a & ~s & top) | (b & s) for a, b, s in zip(xs, ys, zs)]
    sw = bigint.swap(X, Y)
    assert _unpack(sw[0]) == ys and _unpack(sw[1]) == xs
    assert _unpack(bigint.set_(X)) == xs


@pytest.mark.parametrize("W", WIDTHS)
def test_accumulator(W):
    bits = 32 * W
    xs = _rand(W, N, 120 + W)
    ys = _rand(W, N, 121 + W)
    zs = _rand(W, N, 122 + W)
    acc = bigint.Accumulator(W, (N,))
    acc.add(_pack(xs, W)).add(_pack(ys, W)).sub(_pack(zs, W))
    got = _unpack(acc.resolve())
    assert got == [(a + b - c) % (1 << bits)
                   for a, b, c in zip(xs, ys, zs)]
