"""Full AOT TPU compiles on the CPU host (no chip) — the Mosaic
COMPILE stage that tests/test_lowering.py cannot reach.

jax.export lowering validates BlockSpecs and primitives; vector-layout
inference, shape-cast legality, and VMEM budgeting run only in the
Mosaic backend compile, which the local libtpu provides through
``jax.experimental.topologies`` (see tools/tpucompile.py — its first
runs caught three driver-crashing bugs every other check passed: the
deep-twiddle lane-splitting reshape, the SUB256 peel's lane merge +
VMEM overflow, and the remote-DMA exchange's unaligned lane slices).

Only the cheapest configs that cover those bug classes run here
(~1 min); the full config set is ``tools/tpucompile.py --suite/--dist``
per the verify recipe.
"""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def topo_devices(request):
    from jax.experimental import topologies
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    return topo.devices


@pytest.fixture
def force_mosaic(monkeypatch):
    monkeypatch.setenv("NTT_FORCE_MOSAIC", "1")


def test_compile_deep_bls(force_mosaic, topo_devices):
    """The deep (rep > 1) twiddle kernel class at the smallest config
    that exercises it — the shape that crashed the 2^18 headline."""
    import jax.numpy as jnp
    from jax.sharding import SingleDeviceSharding
    from ntt_tpu.api import get_runner
    from ntt_tpu.fields import get_field
    sh = SingleDeviceSharding(topo_devices[0])
    f = get_field("bls12-381-fr")
    n = 1 << 13
    run, aux = get_runner(f, n, False, "auto", True, None)
    args = (jax.ShapeDtypeStruct((f.n_words, n), jnp.uint32, sharding=sh),
            jax.tree.map(lambda a: jax.ShapeDtypeStruct(
                a.shape, a.dtype, sharding=sh), aux))
    jax.jit(lambda v, a: run(v, a)).lower(*args).compile()


def test_compile_dist_pallas_exchange(force_mosaic, topo_devices):
    """The remote-DMA all-to-all kernel (its Mosaic compile runs
    nowhere else off-chip) at the smallest alignment-compliant shard."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from ntt_tpu.fields import get_field
    from ntt_tpu.parallel import make_dist_ntt
    from ntt_tpu.parallel.dist_ntt import split_log
    mesh = Mesh(np.array(topo_devices), ("ntt",))
    f = get_field("small-proth")
    n = 1 << 12
    n1, n2 = split_log(n)
    fwd = make_dist_ntt(f, n, mesh, exchange="pallas")
    shd = NamedSharding(mesh, P(None, None, "ntt"))
    jax.jit(fwd).lower(jax.ShapeDtypeStruct(
        (f.n_words, n1, n2), np.uint32, sharding=shd)).compile()
