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


def test_coset_matrix_fusion():
    """Coset premultiply absorbed into the FIRST level's conv matrix
    (mxu.coset_base_matrix): the c^{i1·n2} column rides the matmul's
    contraction diagonal and c^{i2} the folded twiddle table, so the
    coset NTT runs the exact same kernel graph as the plain NTT (the
    round-4 pre_col hook disabled the fused kernel and cost +87% at
    2^24 — VERDICT r4 weak #2). Checks the path actually engages
    (first_mats in aux, no coset_col) and bit-exactness vs the golden
    coset NTT for both 256-bit and narrow fields."""
    from ntt_tpu.api import get_runner
    for f, n, algo in ((nt.BLS12_381_FR, 1 << 8, "mxu_chunked"),
                       (nt.BLS12_381_FR, 1 << 8, "mxu_sub"),
                       (nt.SMALL, 1 << 10, "mxu_chunked")):
        shift = f.generator
        run, aux = get_runner(f, n, False, algo, False, shift)
        assert "first_mats" in aux and "coset_col" not in aux, (
            f.name, algo)
        x = oracle.ramp(n, f)
        import jax
        y = nt.to_ints(jax.jit(run)(nt.from_ints(x, f), aux), f)
        assert y == oracle.coset_ntt_golden(x, f, shift), (f.name, algo)


def test_mxu_chunked_deep_level_ktw():
    """End-to-end with a DEEP four-step level (R>1) taking the in-kernel
    sublane-layout twiddle path: n=2^11 -> top (2^11,32,64) then
    (64,32,2) with R=32."""
    f, n = nt.SMALL, 1 << 11
    x = oracle.ramp(n, f)
    golden = oracle.ntt_golden(x, f)
    for algo in ("mxu_chunked", "mxu_sub"):
        got = nt.to_ints(nt.ntt(nt.from_ints(x, f), f, algorithm=algo), f)
        assert got == golden, algo


def test_fused_subntt_rep_twiddle():
    """Deep-level in-kernel twiddle (rep>1): T3 is the i2-resolution
    table in SUBLANE layout [W, B//rep, m], streamed at ~1/rep the data
    size through Mosaic-legal 8-aligned-row blocks. Must equal
    base-transform-then-explicit-multiply across every tiling regime:
    k_cols >= 8 natively; Bt/8 < rep (incl. rep > Bt) via the caller's
    table expansion to rep_e = Bt/8 (fused_subntt pre-expands so every
    grid step statically owns its 8 rows — no in-kernel dynamic
    addressing, which the Pallas TPU lowering lacks)."""
    import jax.numpy as jnp
    from ntt_tpu.kernels.mxu_level import fused_subntt
    from ntt_tpu.transforms.mxu import _base_matrix, _base_ntt
    f = nt.SMALL
    rng = random.Random(11)
    # batch tiles must themselves be lane-legal (>= 128 or == B):
    # (n2=32, R=16, Bt=256) -> k_cols=16 static; (n2=8, R=32, Bt=128) ->
    # k_cols=4 dynamic offset; (n2=2, R=256, Bt=128) -> rep > Bt
    for (m, n2, R, bts) in ((32, 32, 16, (256,)),
                            (32, 8, 32, (128,)),
                            (32, 2, 256, (128,))):
        B = n2 * R
        xv = [rng.randrange(f.p) for _ in range(m * B)]
        tv = [rng.randrange(1, f.p) for _ in range(m * n2)]
        X = limbs.to_mont(nt.from_ints(xv, f).reshape(f.n_words, m, B), f)
        Tn = limbs.to_mont(
            nt.from_ints(tv, f).reshape(f.n_words, m, n2), f)
        mats = {m: _base_matrix(f, m, False)}
        base = _base_ntt(X, f, False, mats)
        Texp = jnp.repeat(Tn, R, axis=2)           # [W, m, B] expanded
        want = nt.to_ints(limbs.mont_mul(base, Texp, f), f)
        Ts = jnp.swapaxes(Tn, 1, 2)                # [W, n2, m] sublane
        for bt in bts:
            got = fused_subntt(X, f, False, mats, T3=Ts, rep=R,
                               batch_tile=bt)
            assert nt.to_ints(got, f) == want, (m, n2, R, bt)


def test_fused_subntt_256bit_multilevel():
    """256-bit multi-level sub-NTT in ONE Pallas kernel (m=128 = 32*4,
    two in-kernel MXU levels) — the round-2 gap (effective_subbase capped
    16-half fields at the single-level BASE because the fully-unrolled
    kernel overflowed the Mosaic compile helper; the limb CIOS now traces
    as fori_loop bodies, limbs.fori_limb_loops). Bit-exact vs the XLA
    ntt_axis_mxu composition, with and without the in-kernel twiddle."""
    import jax.numpy as jnp
    from ntt_tpu.kernels.mxu_level import fused_subntt
    from ntt_tpu.transforms.mxu import (_base_matrix, base_sizes,
                                        ntt_axis_mxu)
    f, m, B = nt.BN254_FR, 128, 128
    rng = random.Random(31)
    xv = [rng.randrange(f.p) for _ in range(m * B)]
    X = limbs.to_mont(nt.from_ints(xv, f).reshape(f.n_words, m, B), f)
    # level radices follow the live BASE knob (32*4 at the default
    # BASE_LOG=5; 64*2 under NTT_MXU_BASE_LOG=6)
    mats = {s: _base_matrix(f, s, False) for s in base_sizes(m) if s > 1}
    want = ntt_axis_mxu(X, f, inverse=False, mats=mats)
    got = fused_subntt(X, f, False, mats, None, transpose_out=False)
    assert nt.to_ints(got, f) == nt.to_ints(want, f)
    # with the batch-resolution in-kernel decomposition twiddle
    tv = [rng.randrange(1, f.p) for _ in range(m * B)]
    T3 = limbs.to_mont(nt.from_ints(tv, f).reshape(f.n_words, m, B), f)
    want_tw = limbs.mont_mul(want, T3, f)
    got_tw = fused_subntt(X, f, False, mats, T3, transpose_out=False)
    assert nt.to_ints(got_tw, f) == nt.to_ints(want_tw, f)


def test_mxu_sub_256bit_end_to_end(monkeypatch):
    """ntt_mxu_sub with the NTT_MXU_SUB256_LOG peel enabled: n=2^9 BN254
    via m=128 multi-level kernels, bit-exact vs golden."""
    from ntt_tpu.transforms import mxu as _mxu
    monkeypatch.setattr(_mxu, "SUB256_LOG", 7)
    _mxu._subbase_cache.clear()
    try:
        f, n = nt.BN254_FR, 1 << 9
        assert _mxu.effective_subbase(f) == 128
        x = oracle.ramp(n, f)
        golden = oracle.ntt_golden(x, f)
        X = limbs.to_mont(nt.from_ints(x, f), f)
        mats = _mxu.sub_mats(f, n, False)
        y = _mxu.ntt_mxu_sub(X, f, mats=mats)
        assert nt.to_ints(limbs.from_mont(y, f), f) == golden
        # inverse kernels (the ω^{-1} conv matrices + twiddles) roundtrip
        imats = _mxu.sub_mats(f, n, True)
        back = _mxu.ntt_mxu_sub(y, f, inverse=True, mats=imats)
        from ntt_tpu.fields import inv_mod
        ninv = limbs.const_planes(f.to_mont_int(inv_mod(n, f.p)), f, 1)
        back = limbs.mont_mul(back, ninv, f)
        assert nt.to_ints(limbs.from_mont(back, f), f) == x
    finally:
        _mxu._subbase_cache.clear()


def test_fused_level_probe_stages():
    """Knockout probe (tools/microbench.py knockout): every truncation
    stage traces+runs, and the final 'tw' stage computes exactly the
    production fused level (base matmul + reduce + twiddle)."""
    import jax.numpy as jnp
    from ntt_tpu.kernels.mxu_level import (PROBE_STAGES, fused_level,
                                           fused_level_probe)
    from ntt_tpu.transforms.mxu import _base_matrix
    f, m, B = nt.SMALL, 32, 256
    rng = random.Random(41)
    xv = [rng.randrange(f.p) for _ in range(m * B)]
    tv = [rng.randrange(1, f.p) for _ in range(m * B)]
    X = limbs.to_mont(nt.from_ints(xv, f).reshape(f.n_words, m, B), f)
    T = limbs.to_mont(nt.from_ints(tv, f).reshape(f.n_words, m, B), f)
    A = _base_matrix(f, m, False)
    for stage in PROBE_STAGES:
        y = fused_level_probe(X, f, A, stage,
                              T3=T if stage == "tw" else None)
        assert y.shape == X.shape, stage
    got = fused_level_probe(X, f, A, "tw", T3=T)
    want = fused_level(X, f, A, T, transpose_out=False)
    assert nt.to_ints(got, f) == nt.to_ints(want, f)


def test_fused_level_deep_bc1(monkeypatch):
    """Deep four-step level where chunking hits bc == R//n_chunks == 1 —
    the round-3 BLS >= 2^22 TPU kernel fault: deep_chunk passed rep=1
    with the SUBLANE-layout table Ts, whose [W, m, Bt] T3 BlockSpec then
    read out-of-bounds blocks (block extent Bt over an array whose dim-2
    extent is only n1). Reproduced at tiny size by shrinking the chunk
    constants so n_chunks reaches the R cap — the production constants
    only hit bc=1 at data >= 2^22 x 256-bit, beyond CPU-test sizes."""
    import jax.numpy as jnp
    from ntt_tpu.kernels.mxu_level import fused_subntt
    from ntt_tpu.transforms import core as _core
    from ntt_tpu.transforms.fourstep import _fused_level
    from ntt_tpu.transforms.mxu import _base_matrix, _base_ntt
    monkeypatch.setattr(_core, "CHUNK_SINGLE", 4096)
    monkeypatch.setattr(_core, "CHUNK_BYTES", 512)
    f = nt.SMALL
    n1, n2, R = 32, 8, 32  # 32KB data -> n_chunks caps at R -> bc=1
    rng = random.Random(7)
    xv = [rng.randrange(f.p) for _ in range(n1 * n2 * R)]
    tv = [rng.randrange(1, f.p) for _ in range(n1 * n2)]
    X = limbs.to_mont(
        nt.from_ints(xv, f).reshape(f.n_words, n1, n2, R), f)
    T = limbs.to_mont(nt.from_ints(tv, f).reshape(f.n_words, n1, n2), f)
    mats = {n1: _base_matrix(f, n1, False)}

    def base(c, ff, inv):
        return _base_ntt(c, ff, inv, mats)

    def tw_base(c3, t3, rep=1):
        return fused_subntt(c3, f, False, {c3.shape[1]: mats[n1]}, t3,
                            transpose_out=False, rep=rep)

    got = _fused_level(X, T, f, False, base, tw_base_fn=tw_base)
    want = limbs.mont_mul(base(X, f, False), T[:, :, :, None], f)
    want = jnp.swapaxes(want, 1, 2)
    assert nt.to_ints(got, f) == nt.to_ints(want, f)


def test_mxu_fold_linear_map(monkeypatch):
    """MXU Montgomery fold (NTT_MXU_FOLD): pre-folded conv matrix (D
    output planes) + fold-matmul reduction must be bit-identical to the
    host-exact map for every field — the residue-preservation argument
    of digits.conv_matrix_folded/fold_reduce_matrix, executed."""
    from ntt_tpu import digits
    monkeypatch.setattr(digits, "FOLD", True)
    import jax.numpy as jnp
    # fold is wide-field-only (narrow CIOS is already 3-5 iterations and
    # the fold split planes blow narrow multi-level kernels' VMEM)
    assert not digits.fold_active(nt.SMALL)
    assert not digits.fold_active(nt.GOLDILOCKS)
    for f in (nt.BN254_FR, nt.BLS12_381_FR):
        m, batch = 8, 3
        rng = random.Random(5)
        M = [[rng.randrange(f.p) for _ in range(m)] for _ in range(m)]
        xs = [[rng.randrange(f.p) for _ in range(m)] for _ in range(batch)]
        scale = digits.matrix_prescale(f)
        A = np.asarray(digits.conv_matrix_folded(
            [[v * scale % f.p for v in row] for row in M], f))
        assert A.shape[0] == digits.n_digits(f) * m
        flat = [xs[b][i] for i in range(m) for b in range(batch)]
        X = limbs.to_mont(
            limbs.from_ints(flat, f).reshape(f.n_words, m, batch), f)
        zb = (m * digits.n_digits(f) * digits.DIGIT_MASK ** 2).bit_length()
        Y = digits.apply_matrix(jnp.asarray(A), X, f, m, zb)
        got = nt.to_ints(limbs.from_mont(Y, f), f)
        want = [sum(M[k][i] * xs[b][i] for i in range(m)) % f.p
                for k in range(m) for b in range(batch)]
        assert got == want, f.name


def test_mxu_fold_full_transform(monkeypatch):
    """End-to-end under the fold: the Pallas kernel paths (single-level
    base, fused level with twiddle via mxu_chunked, multi-level
    fused_subntt via mxu_sub) all take the fold matrices as kernel
    operands and must match golden."""
    from ntt_tpu import digits
    monkeypatch.setattr(digits, "FOLD", True)
    f, n = nt.BLS12_381_FR, 1 << 8
    x = oracle.ramp(n, f)
    golden = oracle.ntt_golden(x, f)
    for algo in ("mxu_pallas", "mxu_chunked", "mxu_sub"):
        got = nt.to_ints(nt.ntt(nt.from_ints(x, f), f, algorithm=algo), f)
        assert got == golden, algo
    # narrow-field multi-level kernel (m=512 sub-NTT) + roundtrip
    fs, ns = nt.SMALL, 1 << 10
    xs = oracle.ramp(ns, fs)
    gs = oracle.ntt_golden(xs, fs)
    assert nt.to_ints(nt.ntt(nt.from_ints(xs, fs), fs,
                             algorithm="mxu_sub"), fs) == gs
    rt = nt.to_ints(nt.intt(nt.from_ints(gs, fs), fs,
                            algorithm="mxu_sub"), fs)
    assert rt == xs


def test_mxu_coset_lde():
    f, n = nt.SMALL, 64
    x = oracle.ramp(n, f)
    y = nt.to_ints(nt.coset_ntt(nt.from_ints(x, f), f, algorithm="mxu"), f)
    assert y == oracle.coset_ntt_golden(x, f, f.generator)


def test_fused_level_stack_kernel():
    """Twiddle MATRIX-FOLD stack kernel (round 5): fused_level_stack over
    a twiddle_matrix_stack must equal base-transform-then-explicit-
    multiply across stack/tile regimes (rep == Bt, rep > Bt, 1-entry
    chunks) for a narrow (2D-1-plane) and a 256-bit (folded) field,
    including the coset input-side diagonal."""
    import jax.numpy as jnp
    from ntt_tpu.kernels.mxu_level import fused_level_stack
    from ntt_tpu.transforms.mxu import (_base_matrix, _base_ntt,
                                        twiddle_matrix_stack)
    rng = random.Random(12)
    for f, NT, rep, col in ((nt.SMALL, 4, 128, None),
                            (nt.SMALL, 2, 256, 7),
                            (nt.BLS12_381_FR, 2, 128, None)):
        m, B = 32, NT * rep
        xv = [rng.randrange(f.p) for _ in range(m * B)]
        tvals = [[rng.randrange(1, f.p) for _ in range(m)]
                 for _ in range(NT)]
        X = limbs.to_mont(nt.from_ints(xv, f).reshape(f.n_words, m, B), f)
        As = jnp.asarray(twiddle_matrix_stack(f, m, False, tvals,
                                              col_shift=col))
        got = nt.to_ints(fused_level_stack(X, f, As, rep=rep), f)
        Xs = X
        if col is not None:
            cs = limbs.to_mont(nt.from_ints(
                [pow(col, i, f.p) for i in range(m)], f), f)
            Xs = limbs.mont_mul(X, cs[:, :, None], f)
        base = _base_ntt(Xs, f, False, {m: _base_matrix(f, m, False)})
        tv_flat = [tvals[c // rep][k] for k in range(m) for c in range(B)]
        T = limbs.to_mont(
            nt.from_ints(tv_flat, f).reshape(f.n_words, m, B), f)
        want = nt.to_ints(limbs.mont_mul(base, T, f), f)
        assert got == want, (f.name, NT, rep, col)


def test_fused_level_stack_kernel_resid():
    """The stack kernel's T3 residual stage (round-5 TwStackResid): stack
    matmul + in-kernel batch-resolution mont_mul must equal base-then-
    explicit-two-products for a narrow and a 256-bit (folded) field."""
    import jax.numpy as jnp
    from ntt_tpu.kernels.mxu_level import fused_level_stack
    from ntt_tpu.transforms.mxu import (_base_matrix, _base_ntt,
                                        twiddle_matrix_stack)
    rng = random.Random(21)
    for f, NT, rep in ((nt.SMALL, 4, 128), (nt.BLS12_381_FR, 2, 128)):
        m, B = 32, NT * rep
        xv = [rng.randrange(f.p) for _ in range(m * B)]
        tvals = [[rng.randrange(1, f.p) for _ in range(m)]
                 for _ in range(NT)]
        rvals = [rng.randrange(1, f.p) for _ in range(m * B)]
        X = limbs.to_mont(nt.from_ints(xv, f).reshape(f.n_words, m, B), f)
        As = jnp.asarray(twiddle_matrix_stack(f, m, False, tvals))
        T3 = limbs.to_mont(
            nt.from_ints(rvals, f).reshape(f.n_words, m, B), f)
        got = nt.to_ints(fused_level_stack(X, f, As, rep=rep, T3=T3), f)
        base = _base_ntt(X, f, False, {m: _base_matrix(f, m, False)})
        tv_flat = [tvals[c // rep][k] for k in range(m) for c in range(B)]
        T = limbs.to_mont(
            nt.from_ints(tv_flat, f).reshape(f.n_words, m, B), f)
        want = limbs.mont_mul(limbs.mont_mul(base, T, f), T3, f)
        assert got == nt.to_ints(want, f), (f.name, NT, rep)


def test_matfold_resid_2e17(monkeypatch):
    """End-to-end periodic-residual fold (TwStackResid, the big-n level-0
    form, forced down to 2^17 via NTT_TW_RESID=1): forward, inverse and
    fully-folded coset bit-equal to the streamed-table path — in BOTH
    chunk regimes (single-chunk tiled residual, and the 2^26-style
    chunked run where the residual is sliced modulo s0 with bc2 < s0,
    forced via a shrunken chunk budget)."""
    from ntt_tpu.api import ramp_mont
    from ntt_tpu.transforms import core as _c
    from ntt_tpu.transforms import mxu as _m
    from ntt_tpu.transforms.fourstep import TwStackResid
    f, n = nt.BLS12_381_FR, 1 << 17
    tws = _m.matfold_tw_tables(f, n, False)
    assert not isinstance(tws[0], TwStackResid)  # auto keeps merged here
    monkeypatch.setattr(_m, "TW_RESID", "1")
    tws = _m.matfold_tw_tables(f, n, False)
    assert isinstance(tws[0], TwStackResid)
    x = ramp_mont(f, n)
    outs = {}
    for mode in ("resid", "resid_chunked", "off"):
        # build runners directly: the api compiled-cache keys on
        # config_key, which does not (and should not) include the chunk
        # budget monkeypatch below
        import jax

        from ntt_tpu.api import get_runner
        if mode == "off":
            monkeypatch.setattr(_m, "TW_MATFOLD", False)
        if mode == "resid_chunked":
            # n_chunks=128 at 2^17 -> bc2=32 < s0=128: the modulo slice
            monkeypatch.setattr(_c, "CHUNK_SINGLE", 1 << 16)
            monkeypatch.setattr(_c, "CHUNK_BYTES", 1 << 15)
        else:
            monkeypatch.setattr(_c, "CHUNK_SINGLE", 8600000)
            monkeypatch.setattr(_c, "CHUNK_BYTES", 4300000)
        res = []
        for inv, cs in ((False, None), (True, None), (False, f.generator)):
            run, aux = get_runner(f, n, inv, "mxu_chunked", True, cs)
            res.append(np.asarray(jax.jit(run)(x, aux)))
        outs[mode] = res
    for mode in ("resid", "resid_chunked"):
        for i, name in enumerate(("forward", "inverse", "coset")):
            assert (outs[mode][i] == outs["off"][i]).all(), (mode, name)


def test_matfold_deep_stack_2e16(monkeypatch):
    """End-to-end twiddle matrix fold, deep-stack-only regime (2^16 BLS:
    levels 0/1 keep streamed tables, level 2 folds into a 2-entry stack
    at rep=1024): forward AND inverse bit-equal to the streamed path."""
    from ntt_tpu.api import ramp_mont
    from ntt_tpu.transforms import mxu as _m
    f, n = nt.BLS12_381_FR, 1 << 16
    x = ramp_mont(f, n)
    outs = {}
    for fold in (True, False):
        monkeypatch.setattr(_m, "TW_MATFOLD", fold)
        outs[fold] = (
            np.asarray(nt.ntt(x, f, algorithm="mxu_chunked", mont_io=True)),
            np.asarray(nt.intt(x, f, algorithm="mxu_chunked",
                               mont_io=True)))
    assert (outs[True][0] == outs[False][0]).all(), "forward"
    assert (outs[True][1] == outs[False][1]).all(), "inverse"


def test_matfold_full_config_bls_2e17(monkeypatch):
    """THE round-5 production configuration (smallest full-fold size):
    level-0 conv-matrix stack (rep=s0=128) + merged batch-resolution
    level-1 table (TwBatch) + deep stack — forward and fully-folded
    coset bit-equal to the streamed-table path."""
    from ntt_tpu.api import ramp_mont
    from ntt_tpu.transforms import mxu as _m
    from ntt_tpu.transforms.fourstep import TwBatch, TwMatStack
    f, n = nt.BLS12_381_FR, 1 << 17
    tws = _m.matfold_tw_tables(f, n, False)
    assert isinstance(tws[0], TwMatStack) and isinstance(tws[1], TwBatch)
    x = ramp_mont(f, n)
    outs = {}
    for fold in (True, False):
        monkeypatch.setattr(_m, "TW_MATFOLD", fold)
        outs[fold] = (
            np.asarray(nt.ntt(x, f, algorithm="mxu_chunked", mont_io=True)),
            np.asarray(nt.coset_ntt(x, f, algorithm="mxu_chunked",
                                    mont_io=True)))
    assert (outs[True][0] == outs[False][0]).all(), "forward"
    assert (outs[True][1] == outs[False][1]).all(), "coset"
