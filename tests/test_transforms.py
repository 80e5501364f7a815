"""End-to-end transform tests vs the Python oracle.

Pattern follows the reference's verification scheme (SURVEY.md §4):
golden-model comparison on the ramp input for every variant, plus the
roundtrip check, plus Montgomery-form I/O, coset and LDE configs
(BASELINE.json configs 1-4 at test scale).

Sizes are kept small because every (field, n, variant) pair is a fresh XLA
compile of a fully unrolled limb graph. Scale testing happens in bench.py
on the real chip.
"""

import pytest

import ntt_tpu as nt
from ntt_tpu import oracle

ALGOS = ["naive", "fourstep"]
# ladder variants checked on the small field only (each (field, n, algo)
# combination is a fresh unrolled-limb compile; big fields are covered for
# these variants by quick single-size tests below)
ALGOS_ALL = ALGOS + ["stockham", "fourstep_st"]


def run_and_check(field, n, algo):
    x = oracle.ramp(n, field)
    X = nt.from_ints(x, field)
    golden = oracle.ntt_golden(x, field)
    y = nt.to_ints(nt.ntt(X, field, algorithm=algo), field)
    assert y == golden, f"{field.name} n={n} {algo} forward"
    rt = nt.to_ints(
        nt.intt(nt.from_ints(golden, field), field, algorithm=algo), field)
    assert rt == x, f"{field.name} n={n} {algo} roundtrip"


@pytest.mark.parametrize("algo", ALGOS_ALL)
@pytest.mark.parametrize("log_n", [2, 3, 6, 9])
def test_small_field(algo, log_n):
    run_and_check(nt.SMALL, 1 << log_n, algo)


def test_stockham_bls():
    run_and_check(nt.BLS12_381_FR, 16, "stockham")


@pytest.mark.parametrize("algo", ALGOS)
@pytest.mark.parametrize("log_n", [4, 5])
def test_bn254(algo, log_n):
    run_and_check(nt.BN254_FR, 1 << log_n, algo)


@pytest.mark.parametrize("algo", ALGOS)
def test_bls12_381(algo):
    run_and_check(nt.BLS12_381_FR, 16, algo)


def test_goldilocks():
    run_and_check(nt.GOLDILOCKS, 64, "fourstep")


def test_mont_io():
    """BASELINE.json config 2 at test scale: Montgomery-form I/O skips the
    conversion passes but produces the same transform."""
    f, n = nt.BN254_FR, 16
    x = oracle.ramp(n, f)
    Xm = nt.to_mont(nt.from_ints(x, f), f)
    ym = nt.ntt(Xm, f, mont_io=True)
    y = nt.to_ints(nt.from_mont(ym, f), f)
    assert y == oracle.ntt_golden(x, f)
    back = nt.intt(ym, f, mont_io=True)
    assert nt.to_ints(nt.from_mont(back, f), f) == x


def test_donated_buffer():
    """donate=True (in-place operation, the SSIP single-buffer analog,
    GZKP-NTT.cu:1452-1558): same transform, and XLA actually consumes the
    input buffer (the caller's array is deleted)."""
    f, n = nt.SMALL, 256
    x = oracle.ramp(n, f)
    X = nt.from_ints(x, f)
    y = nt.ntt(X, f, donate=True)
    assert nt.to_ints(y, f) == oracle.ntt_golden(x, f)
    assert X.is_deleted(), "donated input should be consumed"


def test_coset_ntt_and_intt():
    f, n = nt.SMALL, 64
    x = oracle.ramp(n, f)
    X = nt.from_ints(x, f)
    shift = f.generator
    y = nt.to_ints(nt.coset_ntt(X, f), f)
    assert y == oracle.coset_ntt_golden(x, f, shift)
    back = nt.to_ints(nt.coset_intt(nt.from_ints(y, f), f), f)
    assert back == x


def test_coset_fused_first_level():
    """Coset premultiply fused into the first four-step level (n > base):
    the c^{i2} factor lives in the folded twiddle table and c^{i1·n2} in
    the pre_col hook — must match the golden coset NTT exactly."""
    f, n = nt.SMALL, 1 << 10  # > BASE_MAX=512 -> fourstep takes fused path
    x = oracle.ramp(n, f)
    shift = f.generator
    y = nt.to_ints(nt.coset_ntt(nt.from_ints(x, f), f,
                                algorithm="fourstep"), f)
    assert y == oracle.coset_ntt_golden(x, f, shift)
    # mxu_chunked (BASE=32) also takes the fused path at this size
    y2 = nt.to_ints(nt.coset_ntt(nt.from_ints(x, f), f,
                                 algorithm="mxu_chunked"), f)
    assert y2 == oracle.coset_ntt_golden(x, f, shift)
    # roundtrip through the (pass-merged) inverse coset path
    back = nt.to_ints(nt.coset_intt(nt.from_ints(y, f), f,
                                    algorithm="fourstep"), f)
    assert back == x


@pytest.mark.parametrize("field,log_n", [("small-proth", 9),
                                         ("small-proth", 6),
                                         ("bls12-381-fr", 5)])
def test_radix4_ladder(monkeypatch, field, log_n):
    """The fused radix-4 DIT rounds (dit_stage4) must be bit-identical to
    the radix-2 ladder — odd and even stage counts, narrow and 256-bit
    fields."""
    from ntt_tpu.transforms import core as _core
    monkeypatch.setattr(_core, "RADIX4", True)
    f = nt.get_field(field)
    n = 1 << log_n
    x = [(i * 29 + 5) % f.p for i in range(n)]
    import jax
    Xm = nt.to_mont(nt.from_ints(x, f), f)
    y = jax.jit(lambda v: _core.ntt_along_axis(v, f))(Xm)
    assert nt.to_ints(nt.from_mont(y, f), f) == oracle.ntt_golden(x, f)


def test_factored_top_twiddle(monkeypatch):
    """Factorized top-level decomposition twiddle (TJ ⊗ TS, round 2):
    bit-exact through the unchunked, chunked, and fused-coset paths.
    The threshold is lowered so test-scale sizes take the factored path."""
    import ntt_tpu.api as api
    from ntt_tpu.transforms import core as _core
    monkeypatch.setattr(api, "FACTOR_TW_MIN", 1 << 6)
    api._compiled_cache.clear()  # drop entries built with the real knob
    f, n = nt.SMALL, 1 << 10
    x = oracle.ramp(n, f)
    golden = oracle.ntt_golden(x, f)
    for algo in ("fourstep", "mxu_chunked"):
        got = nt.to_ints(nt.ntt(nt.from_ints(x, f), f, algorithm=algo), f)
        assert got == golden, algo
    # chunked execution slicing TJ per fori-loop chunk
    monkeypatch.setattr(_core, "CHUNK_SINGLE", 1 << 10)
    monkeypatch.setattr(_core, "CHUNK_BYTES", 1 << 9)
    api._compiled_cache.clear()
    got = nt.to_ints(nt.ntt(nt.from_ints(x, f), f,
                            algorithm="mxu_chunked"), f)
    assert got == golden
    # fused coset folded into BOTH factors
    got = nt.to_ints(nt.coset_ntt(nt.from_ints(x, f), f,
                                  algorithm="mxu_chunked"), f)
    assert got == oracle.coset_ntt_golden(x, f, f.generator)
    api._compiled_cache.clear()  # no stale knob-baked entries for others


def test_lde():
    f, n = nt.SMALL, 16
    x = oracle.ramp(n, f)
    got = nt.to_ints(nt.lde(nt.from_ints(x, f), f, blowup=4), f)
    assert got == oracle.lde_golden(x, f, 4)


def test_nonramp_input():
    f, n = nt.SMALL, 64
    x = [(i * 1234567 + 89) % f.p for i in range(n)]
    got = nt.to_ints(nt.ntt(nt.from_ints(x, f), f), f)
    assert got == oracle.ntt_golden(x, f)


@pytest.mark.parametrize("algo", ["fourstep", "mxu_chunked"])
@pytest.mark.parametrize("field", ["bls12-381-fr", "goldilocks"])
def test_random_inputs(field, algo):
    """Randomized (non-ramp) vectors including boundary values — the ramp
    inputs the reference de-facto uses (SURVEY.md §4) can mask value-
    dependent carry bugs."""
    import random
    import zlib
    f = nt.get_field(field)
    n = 32
    # deterministic seed (hash() is PYTHONHASHSEED-randomized per run,
    # which would make failures unreproducible — ADVICE round 1)
    rng = random.Random(zlib.crc32(f"{field}-{algo}".encode()))
    x = [f.p - 1, 0, 1, f.p - 2] + [rng.randrange(f.p) for _ in range(n - 4)]
    got = nt.to_ints(nt.ntt(nt.from_ints(x, f), f, algorithm=algo), f)
    assert got == oracle.ntt_golden(x, f)


def test_batched_api():
    """uint32[W, n, B] transforms along axis 1 — every column matches the
    per-vector golden model."""
    import numpy as np
    f, n, B = nt.SMALL, 64, 3
    cols = [[(i * 7 + b) % f.p for i in range(n)] for b in range(B)]
    flat = [cols[b][i] for i in range(n) for b in range(B)]
    X = nt.from_ints(flat, f).reshape(f.n_words, n, B)
    got = np.asarray(nt.ntt(X, f, algorithm="fourstep"))
    for b in range(B):
        assert [int(got[0, i, b]) for i in range(n)] == \
            oracle.ntt_golden(cols[b], f)


def test_polymul():
    """Full polynomial product via NTT == schoolbook convolution mod p."""
    f, n = nt.SMALL, 32
    import random
    rng = random.Random(7)
    a = [rng.randrange(f.p) for _ in range(n)]
    b = [rng.randrange(f.p) for _ in range(n)]
    want = [0] * (2 * n)
    for i in range(n):
        for j in range(n):
            want[i + j] = (want[i + j] + a[i] * b[j]) % f.p
    got = nt.to_ints(nt.polymul(nt.from_ints(a, f), nt.from_ints(b, f), f), f)
    assert got == want
    # cyclic convolution
    wantc = [(want[i] + want[i + n]) % f.p for i in range(n)]
    gotc = nt.to_ints(nt.polymul(nt.from_ints(a, f), nt.from_ints(b, f), f,
                                 cyclic=True), f)
    assert gotc == wantc


def test_linearity_spot_check():
    """NTT(a+b) == NTT(a)+NTT(b) — independent algebraic property."""
    f, n = nt.SMALL, 64
    import random
    rng = random.Random(0)
    a = [rng.randrange(f.p) for _ in range(n)]
    b = [rng.randrange(f.p) for _ in range(n)]
    fa = oracle.ntt_golden(a, f)
    fb = oracle.ntt_golden(b, f)
    s = nt.to_ints(nt.ntt(nt.from_ints(
        [(x + y) % f.p for x, y in zip(a, b)], f), f), f)
    assert s == [(x + y) % f.p for x, y in zip(fa, fb)]
