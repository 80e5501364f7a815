"""Health check: run every registered algorithm at a small size on the
current backend and verify bit-exactness against the Python oracle.

Usage: python tools/healthcheck.py [field] [logn]
Prints one line per algorithm (OK / FAIL) and exits non-zero on failure.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    import ntt_tpu as nt
    from ntt_tpu import oracle
    from ntt_tpu.api import ALGORITHMS

    field_name = sys.argv[1] if len(sys.argv) > 1 else "small-proth"
    log_n = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    f = nt.get_field(field_name)
    n = 1 << log_n
    x = oracle.ramp(n, f)
    golden = oracle.ntt_golden(x, f)
    print(f"# healthcheck field={f.name} n=2^{log_n} "
          f"backend={jax.devices()[0].device_kind}")

    failures = 0
    for algo in list(ALGORITHMS) + ["auto"]:
        try:
            y = nt.to_ints(nt.ntt(nt.from_ints(x, f), f, algorithm=algo), f)
            ok = y == golden
            rt = nt.to_ints(
                nt.intt(nt.from_ints(golden, f), f, algorithm=algo), f)
            ok = ok and rt == x
            print(f"{algo:14s} {'OK' if ok else 'MISMATCH'}")
            failures += 0 if ok else 1
        except Exception as e:  # noqa: BLE001
            print(f"{algo:14s} FAIL: {str(e)[:140]}")
            failures += 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
