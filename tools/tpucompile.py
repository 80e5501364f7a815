"""Full AOT TPU compile of any runner config on the CPU host (no chip).

``jax.export`` (tools/lowercheck.py) runs the TPU *lowering* only; the
Mosaic backend *compile* stage — vector layout inference, shape-cast
legality, VMEM budgeting — runs at XLA-compile time and needs the TPU
compiler, not a TPU. The local ``libtpu`` provides exactly that through
``jax.experimental.topologies``: compiling against a v5e topology
description runs the ENTIRE XLA+Mosaic pipeline host-side.

This catches the bug class the lowering check cannot: round 3's
deep-twiddle lane-splitting reshape lowered cleanly and passed every CPU
test, then failed Mosaic compile ("unsupported shape cast") in the
driver's exact headline config — found by this tool's first run, fixed
before any chip time (kernels/mxu_level.py _kernel_sub).

Usage:
    python tools/tpucompile.py [field] [logn] [algo] [--inverse] [--coset]
    python tools/tpucompile.py --suite     # the driver/campaign config set
    python tools/tpucompile.py --knobs     # knob-gated campaign configs
    python tools/tpucompile.py --dist      # shard_map graphs (4-dev topo)
    NTT_MXU_SUB256_LOG=7 python tools/tpucompile.py bls12-381-fr 18 mxu_sub

NOTE: libtpu holds /tmp/libtpu_lockfile for the process lifetime —
concurrent tpucompile (or test_compile.py) processes fail with a
lockfile error; run them serialized (stale lock after a kill:
``rm /tmp/libtpu_lockfile``).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["NTT_FORCE_MOSAIC"] = "1"

#: the chip-critical configs: everything the driver and the TPU campaign
#: run, at the smallest sizes that still exercise the deep (rep > 1)
#: twiddle levels and both field regimes
SUITE = [
    ("bls12-381-fr", 18, "auto", False, None),     # bench.py headline
                                                   # (r5: matfold stacks)
    ("bls12-381-fr", 17, "auto", False, "gen"),    # matfold coset (stack
                                                   # diag + merged table)
    ("bls12-381-fr", 17, "auto", True, None),      # matfold inverse
    ("bls12-381-fr", 20, "auto", False, None),     # matfold chunked level
                                                   # (multi-entry slices)
    ("bls12-381-fr", 13, "auto", False, None),     # deep tier, forward
    ("bls12-381-fr", 13, "auto", True, None),      # deep tier, inverse
    ("bls12-381-fr", 13, "auto", False, "gen"),    # fused coset
    ("small-proth", 22, "mxu_sub", False, None),   # narrow driver config
    ("small-proth", 19, "mxu_sub", True, None),    # narrow deep inverse
    ("goldilocks", 19, "auto", False, None),       # goldilocks proof
    ("goldilocks", 22, "auto", False, None),       # ladder (VERDICT r4
                                                   # missing #4)
]

#: knob-gated campaign configs (env read at import time -> each runs as
#: its own subprocess): the SUB256 peels, the unrolled-CIOS A/B form,
#: and the dimension-semantics A/B
KNOB_SUITE = [
    # periodic-residual fold (TwStackResid, the 2^26 level-0 form):
    # forced small for the T3 stack-kernel compile, plus the production
    # chunked regime (bc2 < s0 modulo slicing) at 2^22
    ({"NTT_TW_RESID": "1"}, ["bls12-381-fr", "17", "mxu_chunked"]),
    ({"NTT_TW_RESID": "1"}, ["bls12-381-fr", "17", "mxu_chunked",
                             "--coset"]),
    # 2^23 is the smallest size whose chunking gives bc2 < s0 (the
    # modulo-slice residual stream, the 2^26 production regime)
    ({"NTT_TW_RESID": "1"}, ["bls12-381-fr", "23", "mxu_chunked"]),
    ({"NTT_MXU_FOLD": "1"}, ["bls12-381-fr", "18", "mxu_chunked"]),
    ({"NTT_MXU_FOLD": "1"}, ["bls12-381-fr", "13", "auto", "--inverse"]),
    ({"NTT_MXU_FOLD": "1"}, ["small-proth", "19", "mxu_sub"]),
    ({"NTT_MXU_SUB256_LOG": "7"}, ["bls12-381-fr", "13", "mxu_sub"]),
    ({"NTT_MXU_SUB256_LOG": "7"}, ["bls12-381-fr", "13", "mxu_sub",
                                   "--inverse"]),
    ({"NTT_MXU_SUB256_LOG": "7"}, ["bls12-381-fr", "18", "mxu_sub"]),
    ({"NTT_MXU_SUB256_LOG": "6"}, ["bls12-381-fr", "13", "mxu_sub"]),
    ({"NTT_LOOP_MIN_HALVES": "99"}, ["bls12-381-fr", "18", "mxu_chunked"]),
    ({"NTT_DIMSEM": "parallel"}, ["bls12-381-fr", "18", "mxu_sub"]),
    ({"NTT_DIMSEM": "parallel"}, ["small-proth", "22", "mxu_sub"]),
]


def _cache():
    """Share the persistent compile cache with the test suite/bench:
    repeat --suite/--knobs runs skip finished compiles. Override the dir
    with NTT_TEST_CACHE_DIR (run against a separate cache while a suite
    holds .jax_cache — concurrent access implicated in the round-5
    zstandard segfaults). zlib compression forced for the same reason
    (see tests/conftest.py)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", os.environ.get(
        "NTT_TEST_CACHE_DIR", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    from jax._src import compilation_cache as _cc
    _cc.zstd = None
    _cc.zstandard = None


def _topology_sharding():
    import jax
    jax.config.update("jax_platforms", "cpu")
    _cache()
    from jax.experimental import topologies
    from jax.sharding import SingleDeviceSharding
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    return SingleDeviceSharding(topo.devices[0])


def aot_compile(sh, field_name, log_n, algo, inverse=False, coset=None):
    import jax
    import jax.numpy as jnp
    from ntt_tpu.api import get_runner
    from ntt_tpu.fields import get_field
    f = get_field(field_name)
    n = 1 << log_n
    shift = f.generator if coset == "gen" else coset
    t0 = time.time()
    run, aux = get_runner(f, n, inverse, algo, True, shift)
    # shape-only input: materializing the real 2^26 ramp would cost GBs
    # of host RAM + a full to_mont pass for a compile that never runs it
    args = (jax.ShapeDtypeStruct((f.n_words, n), jnp.uint32, sharding=sh),
            jax.tree.map(lambda a: jax.ShapeDtypeStruct(
                a.shape, a.dtype, sharding=sh), aux))
    lowered = jax.jit(lambda v, a: run(v, a)).lower(*args)
    t1 = time.time()
    lowered.compile()
    print(f"TPU compile OK: {f.name} 2^{log_n} {algo} inverse={inverse} "
          f"coset={coset} (setup+lower {t1 - t0:.1f}s, "
          f"compile {time.time() - t1:.1f}s)", flush=True)


def dist_suite():
    """AOT-compile the distributed shard_map graphs — including the
    Pallas remote-DMA all-to-all, whose Mosaic compile the CPU-mesh
    tests and the jax.export lowering never run (its DMA slice
    alignment failed here first; kernels/exchange.py)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    _cache()
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from ntt_tpu.fields import get_field
    from ntt_tpu.parallel import make_dist_ntt
    from ntt_tpu.parallel.dist_ntt import split_log
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    mesh = Mesh(np.array(topo.devices), ("ntt",))
    for field_name, algo, exchange in (
            ("small-proth", None, None),
            ("small-proth", None, "ring"),
            ("small-proth", None, "pallas"),
            ("bls12-381-fr", None, "pallas"),
            ("bls12-381-fr", "mxu_sub", None)):
        f = get_field(field_name)
        n = 1 << 12
        n1, n2 = split_log(n)
        kw = {}
        if algo:
            kw["algorithm"] = algo
        if exchange:
            kw["exchange"] = exchange
        fwd = make_dist_ntt(f, n, mesh, **kw)
        shd = NamedSharding(mesh, P(None, None, "ntt"))
        t0 = time.time()
        jax.jit(fwd).lower(jax.ShapeDtypeStruct(
            (f.n_words, n1, n2), np.uint32, sharding=shd)).compile()
        print(f"TPU compile OK: dist {f.name} 2^12 algo={algo} "
              f"exchange={exchange} ({time.time() - t0:.1f}s)", flush=True)


def registry_suite():
    """AOT-compile EVERY algorithm in the registry, both field regimes,
    at 2^10 — the sweep that first exposed the 256-bit VPU-ladder
    compile failures (fixed via per-field ladder caps)."""
    sh = _topology_sharding()
    from ntt_tpu.api import ALGORITHMS
    for field_name in ("small-proth", "bls12-381-fr"):
        for algo in list(ALGORITHMS):
            aot_compile(sh, field_name, 10, algo)


def main():
    if "--dist" in sys.argv:
        dist_suite()
        print("dist: all configs compile for TPU")
        return
    if "--registry" in sys.argv:
        registry_suite()
        print("registry: all algorithms compile for TPU")
        return
    if "--knobs" in sys.argv:
        import subprocess
        me = os.path.abspath(__file__)
        for env, argv in KNOB_SUITE:
            full = dict(os.environ)
            full.update(env)
            rc = subprocess.run([sys.executable, "-u", me] + argv,
                                env=full).returncode
            if rc:
                print(f"FAIL env={env} args={argv}")
                sys.exit(rc)
        print("knobs: all configs compile for TPU")
        return
    sh = _topology_sharding()
    if "--suite" in sys.argv:
        for cfg in SUITE:
            aot_compile(sh, *cfg)
        print("suite: all configs compile for TPU")
        return
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    field_name = args[0] if len(args) > 0 else "bls12-381-fr"
    log_n = int(args[1]) if len(args) > 1 else 13
    algo = args[2] if len(args) > 2 else "auto"
    aot_compile(sh, field_name, log_n, algo,
                inverse="--inverse" in sys.argv,
                coset="gen" if "--coset" in sys.argv else None)


if __name__ == "__main__":
    main()
