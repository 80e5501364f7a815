"""Ad-hoc host-side TPU lowering check for any runner config.

Runs the full Pallas->Mosaic TPU lowering on the CPU host via
``jax.export`` (no chip needed) — the same mechanism as
tests/test_lowering.py, as a CLI so new configs/knob combinations can be
pre-flighted before spending TPU time on them.

Usage:
    python tools/lowercheck.py [field] [logn] [algo] [--inverse]
    NTT_MXU_SUB256_LOG=7 python tools/lowercheck.py bls12-381-fr 18 mxu_sub
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["NTT_FORCE_MOSAIC"] = "1"


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.export

    import ntt_tpu as nt
    from ntt_tpu.api import get_runner, ramp_mont

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    field_name = args[0] if len(args) > 0 else "bls12-381-fr"
    log_n = int(args[1]) if len(args) > 1 else 13
    algo = args[2] if len(args) > 2 else "auto"
    inverse = "--inverse" in sys.argv

    f = nt.get_field(field_name)
    n = 1 << log_n
    t0 = time.time()
    x = ramp_mont(f, n)
    run, aux = get_runner(f, n, inverse, algo, True, None)
    setup = time.time() - t0
    t0 = time.time()
    jax.export.export(jax.jit(lambda v, a: run(v, a)),
                      platforms=["tpu"])(x, aux)
    print(f"TPU lowering OK: {f.name} 2^{log_n} {algo} inverse={inverse} "
          f"(setup {setup:.1f}s, lower {time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
