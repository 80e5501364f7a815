"""Algorithm shootout: time every registered algorithm at one size.

Usage: python tools/shootout.py [logn] [field] [algos,comma,separated]
Floor-corrected chain-loop protocol (see tools/microbench.py docstring).
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
    from ntt_tpu import limbs
    from ntt_tpu.api import ALGORITHMS, get_runner

    algos = (sys.argv[3].split(",") if len(sys.argv) > 3
             else [a for a in ALGORITHMS if a != "naive"])
    field = nt.get_field(field_name)
    n = 1 << log_n
    chain = int(os.environ.get("SHOOT_CHAIN", "16"))

    from ntt_tpu.api import ramp_mont
    x = ramp_mont(field, n)

    tiny = jax.jit(lambda v: v + np.uint32(1))
    sync(tiny(x))
    floor = 1e9
    for _ in range(5):
        t0 = time.time()
        sync(tiny(x))
        floor = min(floor, time.time() - t0)
    print(f"# n=2^{log_n} field={field.name} chain={chain} "
          f"floor={floor*1e3:.0f}ms backend={jax.devices()[0].device_kind}")

    butterflies = n * log_n / 2
    for algo in algos:
        try:
            run, aux = get_runner(field, n, False, algo, True, None)
            looped = jax.jit(lambda v, a, run=run: jax.lax.fori_loop(
                0, chain, lambda i, z: run(z, a), v))
            t0 = time.time()
            sync(looped(x, aux))
            comp = time.time() - t0
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                sync(looped(x, aux))
                best = min(best, max(time.time() - t0 - floor, 1e-9) / chain)
            print(f"{algo:14s} {best*1e3:9.2f} ms/iter "
                  f"{butterflies/best/1e6:9.1f} Mbfly/s "
                  f"(compile+first {comp:.0f}s)")
        except Exception as e:  # noqa: BLE001
            print(f"{algo:14s} FAILED: {str(e)[:180]}")


if __name__ == "__main__":
    main()
