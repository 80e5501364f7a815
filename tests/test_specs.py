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
