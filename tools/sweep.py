"""Size sweep — the reference's benchmark shape (big-num.cu:370 loops
sizes 2^5..2^24 printing per-variant times). One JSON line per size.

Usage: python tools/sweep.py [field] [algo] [logn,logn,...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax


def sync(y):
    np.asarray(jax.jit(lambda v: v.ravel()[:1])(y))


def main():
    field_name = sys.argv[1] if len(sys.argv) > 1 else "bls12-381-fr"
    algo = sys.argv[2] if len(sys.argv) > 2 else "auto"
    logns = ([int(s) for s in sys.argv[3].split(",")] if len(sys.argv) > 3
             else [8, 10, 12, 14, 16, 18, 20, 22])

    import ntt_tpu as nt
    from ntt_tpu.api import get_runner, ramp_mont, resolve_algorithm

    field = nt.get_field(field_name)
    print(f"# sweep field={field.name} algo={algo} "
          f"backend={jax.devices()[0].device_kind}", file=sys.stderr)

    for log_n in logns:
        n = 1 << log_n
        x = ramp_mont(field, n)
        tiny = jax.jit(lambda v: v + np.uint32(1))
        sync(tiny(x))
        fl = []
        for _ in range(7):
            t0 = time.time()
            sync(tiny(x))
            fl.append(time.time() - t0)
        floor = float(np.median(fl))
        run, aux = get_runner(field, n, False, algo, True, None)
        # chain long enough that total work >> the ±5% dispatch-floor
        # jitter (~20ms): aim for ~0.5-1s of work per call
        chain = max(8, min(8192, (1 << 25) // n))
        looped = jax.jit(lambda v, a: jax.lax.fori_loop(
            0, chain, lambda i, z: run(z, a), v))
        sync(looped(x, aux))
        ts = []
        for _ in range(5):
            t0 = time.time()
            sync(looped(x, aux))
            ts.append(time.time() - t0)
        per = max(float(np.median(ts)) - floor, 1e-9) / chain
        print(json.dumps({
            "log_n": log_n,
            "ms": round(per * 1e3, 3),
            "butterflies_per_s": round(n * log_n / 2 / per, 1),
            "algo": resolve_algorithm(algo, field, n),
        }))


if __name__ == "__main__":
    main()
