"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: NTT butterflies/sec/chip on the flagship transform (four-step,
256-bit BLS12-381 Fr, Montgomery-form I/O) at n = 2^BENCH_LOGN (default
2^18), on whatever backend jax selects (real TPU under the driver).

``vs_baseline`` is measured throughput / the per-chip limb-arithmetic
roofline ("speed-of-light limb-op model", BASELINE.md): the reference
publishes no numbers (BASELINE.json "published": {}), so the roofline model
is the baseline. Model (documented assumptions, see _rooflinebelow):
a radix-2 butterfly costs one Montgomery product plus a modular add and
subtract in 16-bit half-limb arithmetic; the VPU issues one uint32 ALU op
per lane per cycle across 8x128 lanes.

Env overrides: BENCH_LOGN, BENCH_FIELD (ntt_tpu field name), BENCH_ALGO
(fourstep|naive), BENCH_REPS. ``--smoke`` runs a tiny config.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _roofline_butterflies_per_sec(field) -> float:
    """Speed-of-light butterflies/sec/chip for the lazy-carry CIOS on the
    VPU. Counted uint32 ops per butterfly (L = half-limbs):

      mont_mul: per outer iteration, 2 multiplies + ~10 add/logic ops per
      half-limb lane => ~12*L^2 total; final carry + conditional subtract
      ~ 10*L. add_mod + sub_mod ~ 12*L.

    VPU model (TPU v5e): 8*128 lanes * 1 uint32 op/lane/cycle * 1.5 GHz
    ~= 1.54e12 uint32 ops/s. (v5e clock inferred from 197 bf16 TFLOPs /
    (4 MXUs * 128*128 * 2); integer multiply assumed single-issue.)
    """
    L = field.n_halves
    ops_per_butterfly = 12 * L * L + 22 * L
    vpu_ops_per_sec = 8 * 128 * 1.5e9
    return vpu_ops_per_sec / ops_per_butterfly


def main() -> None:
    smoke = "--smoke" in sys.argv
    log_n = int(os.environ.get("BENCH_LOGN", "10" if smoke else "18"))
    field_name = os.environ.get("BENCH_FIELD", "bls12-381-fr")
    algo = os.environ.get("BENCH_ALGO", "fourstep")
    reps = int(os.environ.get("BENCH_REPS", "3" if smoke else "5"))

    import jax
    import jax.numpy as jnp

    import ntt_tpu as nt
    from ntt_tpu import limbs

    field = nt.get_field(field_name)
    n = 1 << log_n

    # Build the ramp input on device (avoid pushing MBs through the host
    # tunnel): values 0..n-1 always < p, so word 0 = low 32 bits of i,
    # word 1 = high bits, upper words zero.
    def make_input():
        i = jnp.arange(n, dtype=jnp.uint32)
        hi = (jnp.arange(n) >> 32).astype(jnp.uint32) if log_n > 32 else \
            jnp.zeros(n, jnp.uint32)
        planes = [i, hi] + [jnp.zeros(n, jnp.uint32)] * (field.n_words - 2)
        x = jnp.stack(planes[: field.n_words], axis=0)
        return limbs.to_mont(x, field)

    x = jax.jit(make_input)()
    x.block_until_ready()

    fn = nt.api._get_compiled(field, n, False, algo, True, None)

    t_compile0 = time.time()
    y = fn(x)
    y.block_until_ready()
    compile_s = time.time() - t_compile0
    np.asarray(y[:1, :1])  # full host sync (remote backends ack lazily)

    # chained dependent calls: amortizes dispatch latency and defeats
    # async-ack timing artifacts on tunneled backends
    chain = 10
    times = []
    for _ in range(reps):
        z = x
        t0 = time.time()
        for _ in range(chain):
            z = fn(z)
        z.block_until_ready()
        times.append((time.time() - t0) / chain)
    best = min(times)

    butterflies = n * log_n / 2
    bps = butterflies / best
    roofline = _roofline_butterflies_per_sec(field)

    print(
        f"# field={field.name} n=2^{log_n} algo={algo} "
        f"compile+first={compile_s:.1f}s times={['%.4f' % t for t in times]} "
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
