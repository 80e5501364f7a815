"""Distributed four-step NTT on the virtual 8-device CPU mesh
(SURVEY.md §4 item 8: emulate the pod on CPU so the all-to-all four-step
path is exercised without TPUs)."""

import pytest

import jax

import ntt_tpu as nt
from ntt_tpu import limbs, oracle
from ntt_tpu.parallel import (make_dist_ntt, make_mesh, shard_for_ntt,
                              unshard)


def _mesh(n_dev):
    return make_mesh(jax.devices()[:n_dev])


@pytest.mark.parametrize("n_dev", [2, 8])
def test_dist_forward_small(n_dev):
    f, n = nt.SMALL, 256
    mesh = _mesh(n_dev)
    x = oracle.ramp(n, f)
    Xs = shard_for_ntt(limbs.to_mont(nt.from_ints(x, f), f), f, mesh)
    y = make_dist_ntt(f, n, mesh)(Xs)
    got = nt.to_ints(limbs.from_mont(unshard(y), f), f)
    assert got == oracle.ntt_golden(x, f)


def test_dist_roundtrip_small():
    f, n = nt.SMALL, 256
    mesh = _mesh(4)
    x = [(7 * i * i + 3) % f.p for i in range(n)]
    Xs = shard_for_ntt(limbs.to_mont(nt.from_ints(x, f), f), f, mesh)
    y = make_dist_ntt(f, n, mesh)(Xs)
    flat = limbs.from_mont(unshard(y), f)
    # feed the natural-order forward output back through the inverse
    Ys = shard_for_ntt(limbs.to_mont(flat, f), f, mesh)
    back = make_dist_ntt(f, n, mesh, inverse=True)(Ys)
    assert nt.to_ints(limbs.from_mont(unshard(back), f), f) == x


def test_dist_matches_single_chip_bn254():
    """Multi-device output must be bit-identical to the single-chip
    four-step (SURVEY.md §7: bit-exactness across backends)."""
    f, n = nt.BN254_FR, 64
    mesh = _mesh(8)
    x = oracle.ramp(n, f)
    Xm = limbs.to_mont(nt.from_ints(x, f), f)
    single = nt.to_ints(nt.ntt(nt.from_ints(x, f), f, algorithm="fourstep"),
                        f)
    y = make_dist_ntt(f, n, mesh)(shard_for_ntt(Xm, f, mesh))
    got = nt.to_ints(limbs.from_mont(unshard(y), f), f)
    assert got == single == oracle.ntt_golden(x, f)


@pytest.mark.parametrize("algorithm", ["mxu", "pallas"])
def test_dist_local_algorithms(algorithm):
    """The per-device sub-NTT is pluggable (jnp/Pallas/MXU); every local
    algorithm must produce the same bit-exact distributed transform."""
    f, n = nt.SMALL, 256
    mesh = _mesh(4)
    x = oracle.ramp(n, f)
    Xs = shard_for_ntt(limbs.to_mont(nt.from_ints(x, f), f), f, mesh)
    y = make_dist_ntt(f, n, mesh, algorithm=algorithm)(Xs)
    got = nt.to_ints(limbs.from_mont(unshard(y), f), f)
    assert got == oracle.ntt_golden(x, f)


def test_dist_coset_roundtrip():
    """Distributed coset NTT (BASELINE config 4 at pod scale): forward on
    the coset matches the golden coset model; inverse interpolates back."""
    f, n = nt.SMALL, 256
    mesh = _mesh(4)
    shift = f.generator
    x = oracle.ramp(n, f)
    Xs = shard_for_ntt(limbs.to_mont(nt.from_ints(x, f), f), f, mesh)
    y = make_dist_ntt(f, n, mesh, coset_shift=shift)(Xs)
    got = nt.to_ints(limbs.from_mont(unshard(y), f), f)
    assert got == oracle.coset_ntt_golden(x, f, shift)
    # inverse: interpolate back from the coset evaluations
    Ys = shard_for_ntt(limbs.to_mont(nt.from_ints(got, f), f), f, mesh)
    back = make_dist_ntt(f, n, mesh, inverse=True, coset_shift=shift)(Ys)
    assert nt.to_ints(limbs.from_mont(unshard(back), f), f) == x


def test_dist_ring_exchange():
    """The ring-ppermute transpose must be bit-identical to the monolithic
    all_to_all."""
    f, n = nt.SMALL, 256
    mesh = _mesh(4)
    x = oracle.ramp(n, f)
    Xs = shard_for_ntt(limbs.to_mont(nt.from_ints(x, f), f), f, mesh)
    y = make_dist_ntt(f, n, mesh, exchange="ring")(Xs)
    got = nt.to_ints(limbs.from_mont(unshard(y), f), f)
    assert got == oracle.ntt_golden(x, f)


def test_dist_lde():
    """Distributed LDE: interpolate sharded evaluations, zero-pad, coset
    NTT at blowup*n — matches the host golden LDE."""
    from ntt_tpu.parallel import dist_lde
    f, n, blowup = nt.SMALL, 64, 4
    mesh = _mesh(4)
    x = oracle.ramp(n, f)
    Xs = shard_for_ntt(limbs.to_mont(nt.from_ints(x, f), f), f, mesh)
    y = dist_lde(Xs, f, mesh, n, blowup=blowup)
    got = nt.to_ints(limbs.from_mont(unshard(y), f), f)
    assert got == oracle.lde_golden(x, f, blowup)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    y = jax.jit(fn)(*args)
    assert y.shape == args[0].shape
