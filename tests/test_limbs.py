"""Property tests of the vectorized limb layer against Python ints —
the SURVEY.md §7 layer-2 oracle contract ("Property-test vs fields/")."""

import random

import numpy as np
import pytest

from ntt_tpu import BLS12_381_FR, BN254_FR, GOLDILOCKS, SMALL, limbs

FIELDS = [SMALL, GOLDILOCKS, BN254_FR, BLS12_381_FR]
N = 128


def _rand(field, n, seed):
    rng = random.Random(seed)
    # mix uniform values with adversarial boundary values
    special = [0, 1, 2, field.p - 1, field.p - 2, field.p >> 1,
               (1 << 16) - 1, (1 << 32) - 1 if field.p > (1 << 32) else 3]
    vals = [v % field.p for v in special]
    vals += [rng.randrange(field.p) for _ in range(n - len(vals))]
    return vals


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_pack_roundtrip(field):
    xs = _rand(field, N, 1)
    assert limbs.to_ints(limbs.from_ints(xs, field), field) == xs


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(field):
    p = field.p
    xs, ys = _rand(field, N, 2), _rand(field, N, 3)
    X, Y = limbs.from_ints(xs, field), limbs.from_ints(ys, field)
    assert limbs.to_ints(limbs.add_mod(X, Y, field), field) == [
        (a + b) % p for a, b in zip(xs, ys)]
    assert limbs.to_ints(limbs.sub_mod(X, Y, field), field) == [
        (a - b) % p for a, b in zip(xs, ys)]
    assert limbs.to_ints(limbs.neg_mod(X, field), field) == [
        (-a) % p for a in xs]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_mont_mul(field):
    p = field.p
    xs, ys = _rand(field, N, 4), _rand(field, N, 5)
    X, Y = limbs.from_ints(xs, field), limbs.from_ints(ys, field)
    got = limbs.to_ints(limbs.mont_mul(X, Y, field), field)
    assert got == [a * b * field.R_inv % p for a, b in zip(xs, ys)]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_mont_form_roundtrip(field):
    xs = _rand(field, N, 6)
    X = limbs.from_ints(xs, field)
    Xm = limbs.to_mont(X, field)
    assert limbs.to_ints(Xm, field) == [field.to_mont_int(a) for a in xs]
    assert limbs.to_ints(limbs.from_mont(Xm, field), field) == xs


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_mont_pow(field):
    xs = _rand(field, 16, 7)
    Xm = limbs.to_mont(limbs.from_ints(xs, field), field)
    for e in (0, 1, 2, 3, 65537):
        got = limbs.to_ints(limbs.mont_pow(Xm, e, field), field)
        assert got == [field.to_mont_int(pow(a, e, field.p)) for a in xs], e


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_broadcasting(field):
    """mont_mul must broadcast a [W, 1] constant against [W, n]."""
    xs = _rand(field, 32, 8)
    X = limbs.from_ints(xs, field)
    C = limbs.from_ints([3], field)
    got = limbs.to_ints(limbs.mont_mul(X, C, field), field)
    assert got == [a * 3 * field.R_inv % field.p for a in xs]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_mont_reduce_wide(field):
    """mont_reduce_wide(value) == value * 2^(-16*iters) mod p for wide
    values (the CGBN mont_reduce_wide contract, impl_cuda.cu:1013-1024)."""
    from ntt_tpu.fields import HALF_BITS, inv_mod

    f = field
    rng = random.Random(3)
    L = f.n_halves
    iters = L + 1
    # value < 2^(16*iters) * p
    vals = [rng.randrange((1 << (16 * iters)) * f.p) for _ in range(4)]
    n_h = (max(v.bit_length() for v in vals) + HALF_BITS - 1) // HALF_BITS
    halves = [
        np.asarray([(v >> (16 * j)) & 0xFFFF for v in vals], dtype=np.uint32)
        for j in range(n_h)
    ]
    import jax.numpy as jnp
    halves = [jnp.asarray(h) for h in halves]
    got = limbs.to_ints(limbs.mont_reduce_wide(halves, f, iters), f)
    rinv = inv_mod(1 << (16 * iters), f.p)
    assert got == [v * rinv % f.p for v in vals]


@pytest.mark.parametrize("field", [BN254_FR, BLS12_381_FR],
                         ids=lambda f: f.name)
def test_fori_loop_forms_bitexact(field):
    """Inside limbs.fori_limb_loops() the wide-field CIOS ops trace as
    fori_loop bodies (the Mosaic trace-footprint fix for 256-bit
    multi-level kernels) — must be bit-identical to the unrolled forms
    on uniform + boundary values, including the broadcast call shapes
    the twiddle paths use."""
    from ntt_tpu.fields import HALF_BITS, inv_mod
    import jax.numpy as jnp

    f = field
    p = f.p
    xs, ys = _rand(f, N, 21), _rand(f, N, 22)
    X, Y = limbs.from_ints(xs, f), limbs.from_ints(ys, f)
    with limbs.fori_limb_loops():
        got = limbs.to_ints(limbs.mont_mul(X, Y, f), f)
    assert got == [a * b * f.R_inv % p for a, b in zip(xs, ys)]

    # broadcast: [W, m, k, r] * [W, m, k, 1] (the deep-twiddle shape)
    Xb = X.reshape(f.n_words, 8, 4, 4)
    Yb = limbs.from_ints(ys[:32], f).reshape(f.n_words, 8, 4, 1)
    with limbs.fori_limb_loops():
        gb = limbs.mont_mul(Xb, Yb, f)
    ref = limbs.mont_mul(Xb, Yb, f)
    assert limbs.to_ints(gb, f) == limbs.to_ints(ref, f)

    # mont_reduce_wide at the digit-recompose width (the kernel call site)
    rng = random.Random(23)
    iters = f.n_halves + 1
    vals = [rng.randrange((1 << (16 * iters)) * p) for _ in range(8)]
    n_h = (max(v.bit_length() for v in vals) + HALF_BITS - 1) // HALF_BITS
    halves = [jnp.asarray(np.asarray(
        [(v >> (16 * j)) & 0xFFFF for v in vals], dtype=np.uint32))
        for j in range(n_h)]
    with limbs.fori_limb_loops():
        got = limbs.to_ints(limbs.mont_reduce_wide(halves, f, iters), f)
    rinv = inv_mod(1 << (16 * iters), p)
    assert got == [v * rinv % p for v in vals]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_eq_and_canonical(field):
    xs = _rand(field, 32, 9)
    X = limbs.from_ints(xs, field)
    assert bool(np.all(np.asarray(limbs.eq(X, X))))
    assert bool(np.all(np.asarray(limbs.is_canonical(X, field))))
    # p itself is non-canonical
    P = limbs.from_ints([0], field) + limbs.const_planes(field.p, field, 1)
    assert not bool(np.any(np.asarray(limbs.is_canonical(P, field))))
