"""Algorithm shootout: time every registered algorithm at one size.

Usage: python tools/shootout.py [logn] [field] [algos,comma,separated]

Protocol: floor-corrected chained loops with the chain AUTO-SCALED so
each timed call does ~1.5s of in-graph work (SHOOT_TARGET_S overrides;
SHOOT_CHAIN pins a fixed chain). A fixed short chain under-measures by
>10x whenever the per-iter time drops below the tunnel's floor jitter.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def sync(y):
    np.asarray(jax.jit(lambda v: v.ravel()[:1])(y))


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    field_name = sys.argv[2] if len(sys.argv) > 2 else "bls12-381-fr"

    import ntt_tpu as nt
    from ntt_tpu.api import ALGORITHMS, get_runner

    algos = (sys.argv[3].split(",") if len(sys.argv) > 3
             else [a for a in ALGORITHMS if a != "naive"])
    field = nt.get_field(field_name)
    n = 1 << log_n
    target_s = float(os.environ.get("SHOOT_TARGET_S", "1.5"))
    pinned = os.environ.get("SHOOT_CHAIN")

    from ntt_tpu.api import ramp_mont
    x = ramp_mont(field, n)

    tiny = jax.jit(lambda v: v + np.uint32(1))
    sync(tiny(x))
    fl = []
    for _ in range(9):
        t0 = time.time()
        sync(tiny(x))
        fl.append(time.time() - t0)
    floor = float(np.median(fl))
    print(f"# n=2^{log_n} field={field.name} target={target_s}s "
          f"floor={floor*1e3:.0f}ms backend={jax.devices()[0].device_kind}")

    butterflies = n * log_n / 2
    for algo in algos:
        try:
            run, aux = get_runner(field, n, False, algo, True, None)

            def make(c, run=run):
                return jax.jit(lambda v, a: jax.lax.fori_loop(
                    0, c, lambda i, z: run(z, a), v))

            chain = int(pinned) if pinned else 16
            looped = make(chain)
            t0 = time.time()
            sync(looped(x, aux))
            comp = time.time() - t0
            if not pinned:
                # converge on CALL time (median of 2, 20ms noise floor):
                # per-iter estimates break down when a fast tile returns
                # calls at the dispatch floor
                for _ in range(6):
                    samples = []
                    for _ in range(2):
                        t0 = time.time()
                        sync(looped(x, aux))
                        samples.append(time.time() - t0 - floor)
                    t_call = max(float(np.median(samples)), 0.0)
                    if 0.5 * target_s <= t_call <= 3 * target_s:
                        break
                    grow = target_s / max(t_call, 0.02)
                    chain = int(min(16384, max(8, chain * grow)))
                    looped = make(chain)
                    sync(looped(x, aux))
            ts = []
            for _ in range(5):
                t0 = time.time()
                sync(looped(x, aux))
                ts.append(max(time.time() - t0 - floor, 1e-9) / chain)
            per = float(np.median(ts))
            print(f"{algo:14s} {per*1e3:9.3f} ms/iter "
                  f"{butterflies/per/1e6:9.1f} Mbfly/s "
                  f"(chain {chain}, compile+first {comp:.0f}s)")
        except Exception as e:  # noqa: BLE001
            print(f"{algo:14s} FAILED: {str(e)[:180]}")


if __name__ == "__main__":
    main()
