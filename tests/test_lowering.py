"""TPU-lowering checks on the CPU host (no chip required).

The Pallas CPU interpreter skips the Mosaic lowering entirely, so a
kernel that is illegal on TPU can pass every CPU test and then crash the
driver on the real chip. That shipped twice: the round-2 deep-level
twiddle BlockSpec (VERDICT r2 weak #1) and the round-3 in-kernel
``dynamic_slice`` forms (unimplemented primitive in the Pallas TPU
lowering — both the deep-twiddle offset slice and the fori-loop CIOS
plane indexing), all caught by exactly this check before any TPU time.

``jax.export(..., platforms=['tpu'])`` runs the full TPU lowering —
including Pallas→Mosaic kernel serialization and its BlockSpec/primitive
validation — on any host, in seconds. These tests lower the PRODUCTION
runner graphs at the driver's own configs with ``NTT_FORCE_MOSAIC=1``
(kernels/specs.pallas_interpret), so every Mosaic-lowering-visible
illegality is a CPU test failure.

Not covered here: the Mosaic *compile* stage (vector-layout inference,
shape-cast legality, VMEM budgeting) — run ``tools/tpucompile.py``
(AOT compile against a v5e topology via the local libtpu, also
chip-free; it caught the round-3 deep-twiddle lane-splitting reshape
that passed every test in THIS file) — and numerical execution, which
remains tools/healthcheck.py --deep territory on the real chip.
"""

import pytest

import jax
import jax.export

from ntt_tpu.api import get_runner, ramp_mont
from ntt_tpu.fields import get_field


def _lower(field_name: str, log_n: int, algo: str, inverse: bool = False,
           coset: int | None = None):
    f = get_field(field_name)
    n = 1 << log_n
    x = ramp_mont(f, n)
    run, aux = get_runner(f, n, inverse, algo, True, coset)
    jax.export.export(jax.jit(lambda v, a: run(v, a)),
                      platforms=["tpu"])(x, aux)


@pytest.fixture
def force_mosaic(monkeypatch):
    monkeypatch.setenv("NTT_FORCE_MOSAIC", "1")


def test_lower_driver_headline_bls_2e18(force_mosaic):
    """THE driver config: bench.py runs auto/BLS/2^18 — its graph must
    lower for TPU. Covers the deep (rep=1024) twiddle path that crashed
    round 2."""
    _lower("bls12-381-fr", 18, "auto")


def test_lower_bls_deep_forward_and_inverse(force_mosaic):
    _lower("bls12-381-fr", 13, "auto")
    _lower("bls12-381-fr", 13, "auto", inverse=True)


def test_lower_narrow_deep_2e22(force_mosaic):
    """The narrow-field driver config (small-proth 2^22 mxu_sub) with the
    deep sub-peel level."""
    _lower("small-proth", 22, "mxu_sub")


def test_lower_goldilocks_deep(force_mosaic):
    """Goldilocks joins the proof ladder (VERDICT r4 missing #4): the
    healthcheck --deep row (2^19, production algos) must lower for TPU
    — the 2-word layout gives different BlockSpecs than small-proth."""
    _lower("goldilocks", 19, "mxu_chunked")
    _lower("goldilocks", 19, "mxu_sub")


def test_lower_coset(force_mosaic):
    f = get_field("bls12-381-fr")
    _lower("bls12-381-fr", 13, "auto", coset=f.generator)


def test_lower_matfold_coset_2e17(force_mosaic):
    """The round-5 twiddle MATRIX-FOLD config at its smallest full-fold
    size, with the fully-folded coset: level-0 conv-matrix stack +
    merged batch-resolution TwBatch + deep stack kernels. (The plain
    forward matfold at 2^18 is covered by the headline test above.)"""
    f = get_field("bls12-381-fr")
    _lower("bls12-381-fr", 17, "mxu_chunked", coset=f.generator)


def test_lower_matfold_resid(force_mosaic, monkeypatch):
    """The periodic-residual fold (TwStackResid, the 2^26-regime level-0
    form) forced down to a lowerable size: stack kernel WITH the T3
    residual stage, forward + coset."""
    from ntt_tpu.transforms import mxu
    monkeypatch.setattr(mxu, "TW_RESID", "1")
    f = get_field("bls12-381-fr")
    _lower("bls12-381-fr", 17, "mxu_chunked")
    _lower("bls12-381-fr", 17, "mxu_chunked", coset=f.generator)


#: algorithms that hit Pallas kernels (Mosaic lowering risk); the pure
#: jnp ladders (naive/stockham/fourstep*) lower through plain XLA and
#: cost ~16s each to trace for BLS — covered for small-proth only
_PALLAS_ALGOS = ("pallas", "pallas_fused", "mxu", "mxu_pallas",
                 "mxu_fused", "mxu_chunked", "mxu_sub")


def test_lower_registry_small(force_mosaic):
    from ntt_tpu.api import ALGORITHMS
    for algo in list(ALGORITHMS):
        _lower("small-proth", 10, algo)


def test_lower_registry_bls_pallas_algos(force_mosaic):
    for algo in _PALLAS_ALGOS:
        _lower("bls12-381-fr", 10, algo)


def test_lower_distributed(force_mosaic):
    """The multi-chip shard_map graphs lower for TPU from the CPU mesh —
    including the Pallas remote-DMA all-to-all (kernels/exchange.py),
    whose execution needs real chips but whose Mosaic lowering does not."""
    from ntt_tpu.parallel import make_dist_ntt, make_mesh, shard_for_ntt
    mesh = make_mesh()
    for field_name, algo, exchange in (
            ("small-proth", None, None),
            ("small-proth", None, "ring"),
            # pallas exchange needs n >= 128*D^2 (Mosaic DMA slice
            # alignment; kernels/exchange.a2a_transpose) — 2^14 on the
            # 8-device mesh
            ("small-proth", None, "pallas"),
            ("bls12-381-fr", "mxu_sub", None)):
        f = get_field(field_name)
        n = 1 << (14 if exchange == "pallas" else 12)
        kw = {}
        if algo:
            kw["algorithm"] = algo
        if exchange:
            kw["exchange"] = exchange
        fwd = make_dist_ntt(f, n, mesh, **kw)
        x = shard_for_ntt(ramp_mont(f, n), f, mesh)
        jax.export.export(jax.jit(fwd), platforms=["tpu"])(x)


def test_lower_sub256_peel(force_mosaic, monkeypatch):
    """The SUB256 multi-level candidate (m=128 two-level peel for 256-bit
    fields) must lower before any TPU A/B spends chip time on it —
    forward AND inverse (the campaign's shootout drives both)."""
    from ntt_tpu.transforms import mxu
    monkeypatch.setattr(mxu, "SUB256_LOG", 7)
    mxu._subbase_cache.clear()
    try:
        _lower("bls12-381-fr", 13, "mxu_sub")
        _lower("bls12-381-fr", 13, "mxu_sub", inverse=True)
    finally:
        mxu._subbase_cache.clear()


def test_lower_sub256_peel_m64_fallback(force_mosaic, monkeypatch):
    """The m=64 fallback peel (campaign stages sub256_m64_*) used when the
    Mosaic compile helper rejects m=128."""
    from ntt_tpu.transforms import mxu
    monkeypatch.setattr(mxu, "SUB256_LOG", 6)
    mxu._subbase_cache.clear()
    try:
        _lower("bls12-381-fr", 13, "mxu_sub")
    finally:
        mxu._subbase_cache.clear()
