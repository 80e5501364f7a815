"""Mosaic BlockSpec legality guard (kernels/specs.py).

The Pallas CPU interpreter does not enforce Mosaic's (8, 128) last-two-
dims tiling rule, so an illegal BlockSpec passes every CPU test and dies
only at TPU lowering — exactly how the round-2 deep-level twiddle block
(W, m, 8) over a (W, m, 256) array shipped broken (VERDICT round 2,
weak #1/#2). These tests pin the guard's semantics and that the exact
historical bug now fails loudly on CPU.
"""

import pytest

from ntt_tpu.kernels.specs import assert_block_legal, block_legal


def test_block_legal_rule():
    # divisible last-two dims
    assert block_legal((16, 32, 256), (16, 32, 1024))
    assert block_legal((8, 128), (64, 512))
    # block == array dim is legal even when not divisible
    assert block_legal((16, 32, 12), (16, 32, 12))
    assert block_legal((15, 3, 5), (15, 3, 5))
    # sublane dim violations
    assert not block_legal((16, 4, 256), (16, 32, 1024))
    # lane dim violations
    assert not block_legal((16, 32, 64), (16, 32, 1024))
    # leading dims unconstrained
    assert block_legal((1, 32, 256), (7, 32, 1024))
    # rank mismatch is never legal
    assert not block_legal((32, 256), (16, 32, 1024))
    # rank-0/1 pass through
    assert block_legal((), ())
    assert block_legal((5,), (10,))


def test_round2_regression_shape_rejected():
    """The exact a54494f bug: twiddle tile (W, m, tw_cols=8) over the
    (W, m, 256) i2-resolution table — must raise at build time."""
    with pytest.raises(ValueError, match="Mosaic-illegal"):
        assert_block_legal((8, 32, 8), (8, 32, 256), "regression")
    with pytest.raises(ValueError, match="Mosaic-illegal"):
        # the rep > Bt width-1 variant
        assert_block_legal((8, 32, 1), (8, 32, 256), "regression")


@pytest.mark.parametrize("field_name,logn,algo", [
    ("bls12-381-fr", 18, "mxu_chunked"),   # the driver's headline config
    ("bls12-381-fr", 18, "mxu_sub"),
    ("bls12-381-fr", 22, "mxu_chunked"),
    ("small-proth", 22, "mxu_sub"),        # deep sub-peel levels
    ("small-proth", 26, "mxu_sub"),        # the 2^26 sweep ceiling
    ("goldilocks", 20, "mxu_sub"),
])
def test_production_sizes_trace_legal(field_name, logn, algo):
    """jax.eval_shape traces the FULL production transform (running every
    assert_block_legal) without compiling or allocating — a seconds-cheap
    CPU check that the driver's exact TPU configs build legal kernels.
    This is the static half of the round-3 verification fix; the dynamic
    half is `tools/healthcheck.py --deep` on the real chip."""
    import jax
    import jax.numpy as jnp

    import ntt_tpu as nt
    from ntt_tpu.api import ALGORITHMS
    from ntt_tpu.transforms import fourstep as _fourstep
    from ntt_tpu.transforms import mxu as _mxu

    f = nt.get_field(field_name)
    n = 1 << logn
    fn, _ = ALGORITHMS[algo]
    base_max = (_mxu.effective_subbase(f) if algo == "mxu_sub"
                else _mxu.BASE)
    reqs = _fourstep.twiddle_requests(n, base_max, f)
    tws = [jax.ShapeDtypeStruct((f.n_words, n1, n2), jnp.uint32)
           for (_, n1, n2) in reqs]
    mats = (_mxu.sub_mats(f, n, False) if algo == "mxu_sub"
            else _mxu.base_mats(f, n, False, residency=True))
    aux = {"tws": tws, "mats": mats}
    x = jax.ShapeDtypeStruct((f.n_words, n), jnp.uint32)
    out = jax.eval_shape(lambda x, aux: fn(x, f, False, aux), x, aux)
    assert out.shape == (f.n_words, n)


def test_production_sizes_trace_legal_sub256(monkeypatch):
    """Same eval_shape legality check for the 256-bit multi-level peel
    (NTT_MXU_SUB256_LOG=7): BLS 2^18 via m=128 two-level kernels."""
    import jax
    import jax.numpy as jnp

    import ntt_tpu as nt
    from ntt_tpu.transforms import fourstep as _fourstep
    from ntt_tpu.transforms import mxu as _mxu

    monkeypatch.setattr(_mxu, "SUB256_LOG", 7)
    _mxu._subbase_cache.clear()
    try:
        f = nt.get_field("bls12-381-fr")
        n = 1 << 18
        base_max = _mxu.effective_subbase(f)
        assert base_max == 128
        reqs = _fourstep.twiddle_requests(n, base_max, f)
        tws = [jax.ShapeDtypeStruct((f.n_words, n1, n2), jnp.uint32)
               for (_, n1, n2) in reqs]
        mats = _mxu.sub_mats(f, n, False)
        x = jax.ShapeDtypeStruct((f.n_words, n), jnp.uint32)
        out = jax.eval_shape(
            lambda x, aux: _mxu.ntt_mxu_sub(
                x, f, tws=iter(aux["tws"]), mats=aux["mats"]),
            x, {"tws": tws, "mats": mats})
        assert out.shape == (f.n_words, n)
    finally:
        _mxu._subbase_cache.clear()


def test_kernel_builders_guard_their_specs():
    """An illegal batch tile reaching a kernel builder raises at trace
    time on ANY backend (the CPU-side tripwire for TPU-only crashes)."""
    import jax.numpy as jnp

    import ntt_tpu as nt
    from ntt_tpu.kernels.mxu_level import fused_subntt
    from ntt_tpu.transforms.mxu import _base_matrix

    f = nt.SMALL
    m, B = 32, 256
    X = jnp.zeros((f.n_words, m, B), dtype=jnp.uint32)
    mats = {m: _base_matrix(f, m, False)}
    with pytest.raises(ValueError, match="Mosaic-illegal"):
        fused_subntt(X, f, False, mats, None, batch_tile=16)


def test_config_key_tracks_module_constants(monkeypatch):
    """The compiled-runner cache key must follow the ACTUAL knob module
    constants (the values the trace consults) — an env snapshot taken at
    config-import time recorded the wrong variant for in-process knob
    changes and direct monkeypatches (round-3 self-review finding)."""
    from ntt_tpu import config, limbs
    from ntt_tpu.transforms import mxu
    k0 = config.config_key()
    monkeypatch.setattr(mxu, "SUB256_LOG", 7)
    k1 = config.config_key()
    assert k1 != k0
    monkeypatch.setattr(limbs, "LOOP_MIN_HALVES", 99)
    assert config.config_key() not in (k0, k1)
