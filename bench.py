"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: sustained NTT butterflies/sec/chip on the flagship transform
(algorithm='auto', 256-bit BLS12-381 Fr, Montgomery-form I/O) at
n = 2^BENCH_LOGN (default 2^18), on whatever backend jax selects (real
TPU under the driver).

``vs_baseline`` is measured throughput / the per-chip modular-multiply
roofline (BASELINE.md): the reference publishes no numbers
(BASELINE.json "published": {}), so the roofline model is the baseline.
Model: a radix-2 butterfly needs one modular product >= 2*(bits/8)^2
8-bit-digit MACs on the MXU at the measured MAC rate (see
_roofline_butterflies_per_sec; timing caveats in docs/DESIGN.md).

Env overrides: BENCH_LOGN, BENCH_FIELD, BENCH_ALGO (any name in
ntt_tpu.api.ALGORITHMS or 'auto'), BENCH_REPS, BENCH_CHAIN,
BENCH_MAC_RATE. ``--smoke`` runs a tiny config.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _roofline_butterflies_per_sec(field) -> float:
    """Speed-of-light limb-op model: a radix-2 butterfly needs at least one
    modular product (one digit-convolution a*b plus one Montgomery
    reduction m*p) however the digits are planned.

    The multiply rate is the scarce resource, and the fastest multiply
    engine on the chip is the MXU: with 8-bit digit planes, a modular
    product needs >= 2*(mont_bits/8)^2 digit MACs (a*b plus the Montgomery
    reduction m*p). The MAC rate defaults to the int8 matmul rate measured
    on this benching tile with tools/microbench.py (6.0e12 MAC/s — ~3% of
    public v5e spec; the tile is heavily throttled, so the roofline is
    calibrated to the silicon actually underneath; override with
    BENCH_MAC_RATE).
    """
    d8 = field.mont_bits // 8
    macs_per_butterfly = 2 * d8 * d8 + 4 * d8
    mac_rate = float(os.environ.get("BENCH_MAC_RATE", "6.0e12"))
    return mac_rate / macs_per_butterfly


def main() -> None:
    smoke = "--smoke" in sys.argv
    log_n = int(os.environ.get("BENCH_LOGN", "10" if smoke else "18"))
    field_name = os.environ.get("BENCH_FIELD", "bls12-381-fr")
    # 'auto' = size-adaptive measured-fastest (api.resolve_algorithm)
    algo = os.environ.get("BENCH_ALGO", "auto")
    reps = int(os.environ.get("BENCH_REPS", "3" if smoke else "5"))

    import jax

    # persistent compile cache for the TPU path too (shared with the CPU
    # test suite's .jax_cache): repeat driver invocations skip XLA compiles
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import ntt_tpu as nt

    field = nt.get_field(field_name)
    n = 1 << log_n

    # Build the ramp input on device (avoid pushing MBs through the host
    # tunnel); chunked Montgomery conversion (see api.ramp_mont).
    x = nt.api.ramp_mont(field, n)

    run, aux = nt.api.get_runner(field, n, False, algo, True, None)

    # Timing protocol: the repeat loop lives INSIDE one jit (lax.fori_loop
    # with a loop-carried dependency) and the result is fetched to host.
    # On tunneled backends both block_until_ready and dependent-call
    # chaining have been observed to return before remote execution
    # finishes; an in-graph loop + host fetch is the only honest clock.
    # The axon tunnel costs ~300-500ms per dispatch with ±5% jitter, so
    # short bursts are unmeasurable (work << jitter). The headline is the
    # SUSTAINED rate at chain 64 (~1s continuous work per call): stable,
    # reproducible, and what production serving would see. NOTE the tile is
    # power-capped: short bursts run up to ~9x faster (1.7ms vs 15ms/iter
    # at 2^18) — see docs/DESIGN.md. aux (twiddle tables, conv matrices)
    # is passed as an argument — closing over it would embed MB-scale
    # constants.
    chain = int(os.environ.get("BENCH_CHAIN", "2" if smoke else "64"))

    looped = jax.jit(lambda v, aux: jax.lax.fori_loop(
        0, chain, lambda i, z: run(z, aux), v))

    def sync1(y):
        np.asarray(jax.jit(lambda v: v.ravel()[:1])(y))

    # measure the fixed dispatch round-trip (tunnel latency); the floor
    # jitters ±5%, so both floor and call times use MEDIANS over enough
    # samples (min-of-few under-subtracts and inflates throughput)
    tiny = jax.jit(lambda v: v + np.uint32(1))
    sync1(tiny(x))
    floor_samples = []
    for _ in range(9):
        t0 = time.time()
        sync1(tiny(x))
        floor_samples.append(time.time() - t0)
    floor = float(np.median(floor_samples))

    t_compile0 = time.time()
    y = looped(x, aux)
    sync1(y)
    compile_s = time.time() - t_compile0

    reps = max(reps, 9)
    totals = []
    for _ in range(reps):
        t0 = time.time()
        y = looped(x, aux)
        sync1(y)
        totals.append(time.time() - t0)
    best = max(float(np.median(totals)) - floor, 1e-9) / chain
    times = [(t - floor) / chain for t in totals]

    # optional profiler capture (BENCH_PROFILE=<dir>); works on local
    # backends, best-effort through the remote tunnel
    prof_dir = os.environ.get("BENCH_PROFILE")
    if prof_dir:
        try:
            with jax.profiler.trace(prof_dir):
                y = looped(x, aux)
                y.block_until_ready()
            print(f"# profile written to {prof_dir}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# profiling unavailable: {e}", file=sys.stderr)

    butterflies = n * log_n / 2
    bps = butterflies / best
    roofline = _roofline_butterflies_per_sec(field)

    print(
        f"# field={field.name} n=2^{log_n} algo={algo} "
        f"compile+first={compile_s:.1f}s floor={floor*1e3:.0f}ms "
        f"times={['%.4f' % t for t in times]} "
        f"backend={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"ntt_butterflies_per_sec_per_chip_{field.name}_2^{log_n}",
        "value": round(bps, 1),
        "unit": "butterflies/s",
        "vs_baseline": round(bps / roofline, 4),
    }))


if __name__ == "__main__":
    main()
