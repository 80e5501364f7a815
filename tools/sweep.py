"""Size sweep — the reference's benchmark shape (big-num.cu:370 loops
sizes 2^5..2^24 printing per-variant times). One JSON line per size,
each point spot-verified against the native C++ hostlib oracle
(64 output positions vs the exact host NTT of the ramp input).

Usage: python tools/sweep.py [field] [algo] [logn,logn,...]
Env: SWEEP_VERIFY=0 to skip the hostlib check (it costs one exact host
NTT per size — ~2 min at 2^24). SWEEP_VERIFY=full compares EVERY output
position against the host oracle (the reference checks all elements,
GZKP-NTT.cu:1627-1631), streamed through the tunnel in
2^SWEEP_FULL_CHUNK_LOG-position slices (default 2^18 = 8MB per fetch
for 256-bit fields).
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


def full_compare(y_mont, want_rows, field, chunk_log=18):
    """Delegates to ntt_tpu.hostlib.full_compare (shared with the
    healthcheck --deep gate)."""
    from ntt_tpu import hostlib
    return hostlib.full_compare(y_mont, want_rows, field, chunk_log)


def main():
    field_name = sys.argv[1] if len(sys.argv) > 1 else "bls12-381-fr"
    algo = sys.argv[2] if len(sys.argv) > 2 else "auto"
    logns = ([int(s) for s in sys.argv[3].split(",")] if len(sys.argv) > 3
             else [8, 10, 12, 14, 16, 18, 20, 22])

    import ntt_tpu as nt
    from ntt_tpu import hostlib, limbs
    from ntt_tpu.api import get_runner, ramp_mont, resolve_algorithm

    field = nt.get_field(field_name)
    vmode = os.environ.get("SWEEP_VERIFY", "1")
    verify = (vmode != "0" and hostlib.available() and field.bits <= 256)
    full = verify and vmode == "full"
    print(f"# sweep field={field.name} algo={algo} verify={verify} "
          f"full={full} backend={jax.devices()[0].device_kind}",
          file=sys.stderr)

    def check_subsample(n, y_mont, k=64):
        """k output positions vs the exact native-host NTT of the ramp."""
        idx = np.linspace(0, n - 1, k, dtype=np.int64)
        sel = jax.jit(
            lambda v: limbs.from_mont(v[:, idx], field))(y_mont)
        got = nt.to_ints(sel, field)
        want_all = hostlib.ntt_np(hostlib.ramp_np(n), field)
        want = hostlib._arr_to_ints(want_all[idx])
        return got == want

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
        # refine the chain on CALL time until each timed call does ~1.5s
        # of in-graph work (see bench.py: fixed chains under-measure once
        # per-iter time drops below the tunnel's floor jitter)
        target_s = 1.5

        def make(c, run=run):
            return jax.jit(lambda v, a: jax.lax.fori_loop(
                0, c, lambda i, z: run(z, a), v))

        chain = 16
        looped = make(chain)
        sync(looped(x, aux))
        for _ in range(6):
            samples = []
            for _ in range(2):
                t0 = time.time()
                sync(looped(x, aux))
                samples.append(time.time() - t0 - floor)
            t_call = max(float(np.median(samples)), 0.0)
            if 0.5 * target_s <= t_call <= 3 * target_s:
                break
            chain = int(min(16384, max(4, chain * target_s /
                                       max(t_call, 0.02))))
            looped = make(chain)
            sync(looped(x, aux))
        ts = []
        for _ in range(5):
            t0 = time.time()
            sync(looped(x, aux))
            ts.append(time.time() - t0)
        in_graph = float(np.median(ts)) - floor
        rec = {
            "log_n": log_n,
            "algo": resolve_algorithm(algo, field, n),
        }
        if in_graph < 0.5:
            # even the max chain couldn't accumulate enough in-graph work
            # to rise above the tunnel-floor jitter: any ms derived from
            # this would be noise (round-2 sweep printed 0.0ms /
            # 8.4e15 bf/s rows this way — VERDICT r2 weak #7). Record the
            # refusal instead of a garbage number.
            rec["skipped"] = "under-floor"
            rec["chain"] = chain
            rec["in_graph_s"] = round(max(in_graph, 0.0), 3)
        else:
            per = max(in_graph, 1e-9) / chain
            rec["ms"] = round(per * 1e3, 3)
            rec["butterflies_per_s"] = round(n * log_n / 2 / per, 1)
        if verify:
            # the verify call is the LAST use of x: donate it so the
            # forward pass at the HBM-limit sizes (2^26 BLS = 4GB data)
            # reuses the input buffer instead of holding x+y live
            y = jax.jit(lambda v, a: run(v, a), donate_argnums=0)(x, aux)
            if full:
                want_all = hostlib.ntt_np(hostlib.ramp_np(n), field)
                rec["bitexact"] = bool(full_compare(
                    y, want_all, field,
                    int(os.environ.get("SWEEP_FULL_CHUNK_LOG", "18"))))
                rec["verify"] = f"full:{n}"
            else:
                rec["bitexact"] = bool(check_subsample(n, y))
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
