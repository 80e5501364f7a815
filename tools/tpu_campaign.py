"""One-shot round-5 TPU campaign: every chip-gated validation and
measurement, in priority order, unattended and resumable.

The round-2 lesson (VERDICT weak #1/#2) is that TPU-side proof must not
wait for a human in the loop: the tunnel comes and goes, so the moment it
is up we run the whole backlog in one supervised pass. Priority order
means that if the tunnel dies mid-campaign the most important artifacts
(bench.py green, deep healthcheck) already exist.

Round-5 queue: the twiddle MATRIX-FOLD validation + measurement ladder
(VERDICT r4 items 1/2/3/4/6/7/8) — knockout with the stack row, the
raised --deep gate (goldilocks + full-position 2^22), merged-vs-residual
A/Bs, the 2^26 run WITHOUT the factored fallback, and the suite with the
coset and goldilocks bars.

Usage:
    python -u tools/tpu_campaign.py            # run / resume
    python -u tools/tpu_campaign.py --list     # show stages + status
    python -u tools/tpu_campaign.py --only bench,hc_deep
    python -u tools/tpu_campaign.py --redo shootout_2e18

Each stage is a subprocess (fresh import-time env knobs; a crash cannot
take down the campaign). Results land in TPU_CAMPAIGN_r5/: state.json
plus one .log per stage. A stage that already recorded ok=True is
skipped on resume unless --redo names it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "TPU_CAMPAIGN_r5")
STATE = os.path.join(OUT, "state.json")

PY = sys.executable or "python3"


def _stages():
    """(name, argv, extra_env, timeout_s). Order = priority."""
    hc = os.path.join("tools", "healthcheck.py")
    shoot = os.path.join("tools", "shootout.py")
    micro = os.path.join("tools", "microbench.py")
    sweep = os.path.join("tools", "sweep.py")
    drive = (
        "import jax; print(jax.devices());\n"
        "import ntt_tpu as nt\n"
        "from ntt_tpu import oracle\n"
        "f, n = nt.SMALL, 256\n"
        "x = oracle.ramp(n, f)\n"
        "y = nt.to_ints(nt.ntt(nt.from_ints(x, f), f), f)\n"
        "assert y == oracle.ntt_golden(x, f)\n"
        "rt = nt.to_ints(nt.intt(nt.from_ints(y, f), f), f)\n"
        "assert rt == x\n"
        "print('TPU forward+roundtrip OK')\n")
    return [
        # 0. tunnel sanity — abort the campaign if this fails
        ("probe", [PY, "-u", "-c", "import jax; print(jax.devices())"],
         {}, 300),
        # 1. the /verify drive leg on the real chip
        ("verify_small", [PY, "-u", "-c", drive], {}, 1200),
        # 2. THE headline: driver-protocol bench (matfold + dual roofs).
        #    Done-bar from VERDICT r4 item 1: <= 0.7 ms at 2^18 BLS.
        ("bench", [PY, "-u", "bench.py"], {}, 3600),
        # 3. the raised gate (VERDICT r4 items 7+8): production algos at
        #    depth sizes, goldilocks row, 2^20 subsampled, and the 2^22
        #    FULL-position compare
        ("hc_deep", [PY, "-u", hc, "--deep"], {}, 10800),
        # 4. knockout with the round-5 stack row — VERDICT r4 item 1
        #    done-bar: tw <= 15% of kernel time
        ("knockout", [PY, "-u", micro, "knockout", "18", "bls12-381-fr"],
         {}, 3600),
        # 5. periodic-residual numerics on chip at the smallest
        #    modulo-slicing size (2^23) BEFORE spending 2^26 time
        ("resid_2e23", [PY, "-u", sweep, "bls12-381-fr", "mxu_chunked",
                        "23"], {"NTT_TW_RESID": "1"}, 7200),
        # 6. THE 2^26 unlock (VERDICT r4 items 4+6): matfold periodic
        #    residual, NO factored fallback, plain auto dispatch.
        #    Done-bar: <= 1.4 s, bit-exact (subsampled).
        ("bls26_resid", [PY, "-u", sweep, "bls12-381-fr", "auto", "26"],
         {}, 14400),
        # 7. merged-vs-residual A/B at 2^22/2^24 (pick the default from
        #    data; merged is chip-proven, residual streams less table)
        ("ab_resid_2e22", [PY, "-u", shoot, "22", "bls12-381-fr",
                           "mxu_chunked"], {"NTT_TW_RESID": "1"}, 7200),
        ("ab_merged_2e22", [PY, "-u", shoot, "22", "bls12-381-fr",
                            "mxu_chunked"], {}, 7200),
        # 8. the recorded all-configs artifact: BENCH_SUITE_r5 (now with
        #    the goldilocks config; coset 2^24 bar <= 225 ms — VERDICT
        #    r4 item 3, matfold folds the coset entirely)
        ("suite", [PY, "-u", os.path.join("tools", "bench_suite.py")],
         {}, 14400),
        # 9. the reference-shaped sweep through 2^24 (2^24 done-bar from
        #    VERDICT r4 item 6: <= 120 ms)
        ("sweep_full", [PY, "-u", sweep, "bls12-381-fr", "auto",
                        "12,14,16,18,20,22,24"], {}, 14400),
        # 10. goldilocks proof ladder sweep point (VERDICT r4 item 8)
        ("sweep_goldi", [PY, "-u", sweep, "goldilocks", "auto",
                         "18,22"], {}, 7200),
        # 11. narrow-field regression sweep (kernel changes must not
        #     move small-proth)
        ("sweep_small", [PY, "-u", sweep, "small-proth", "auto",
                         "20,22,24,26"], {}, 10800),
        # 12. the round-4 comparison anchor: 2^26 with the factored
        #     fallback (what the resid replaces); lowest priority
        ("bls26_factored", [PY, "-u", sweep, "bls12-381-fr", "auto", "26"],
         {"NTT_FACTOR_TW_MIN": str(1 << 25)}, 14400),
    ]


def _load():
    if os.path.exists(STATE):
        with open(STATE) as fh:
            return json.load(fh)
    return {}


def _save(state):
    tmp = STATE + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh, indent=1, sort_keys=True)
    os.replace(tmp, STATE)


def main():
    os.makedirs(OUT, exist_ok=True)
    stages = _stages()
    state = _load()
    only = None
    redo = set()
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    if "--redo" in sys.argv:
        redo = set(sys.argv[sys.argv.index("--redo") + 1].split(","))
    if "--list" in sys.argv:
        for name, _, env, tmo in stages:
            st = state.get(name, {})
            print(f"{name:18s} ok={st.get('ok')} rc={st.get('rc')} "
                  f"{st.get('wall_s', 0):.0f}s env={env} timeout={tmo}")
        return

    for name, argv, env, tmo in stages:
        if only and name not in only:
            continue
        if name in state and state[name].get("ok") and name not in redo:
            print(f"== {name}: already ok, skip", flush=True)
            continue
        log = os.path.join(OUT, f"{name}.log")
        print(f"== {name}: start ({' '.join(argv[2:])}) env={env}",
              flush=True)
        t0 = time.time()
        full_env = dict(os.environ)
        full_env.update(env)
        # the time-shared tile throws sporadic transient failures ("TPU
        # worker crashed", tunnel resets) where an immediate retry works
        # — every stage except the tunnel probe gets one retry
        attempts = 1 if name == "probe" else 2
        for attempt in range(attempts):
            with open(log, "a") as fh:
                fh.write(f"\n==== {time.ctime()} env={env} "
                         f"attempt={attempt + 1}\n")
                fh.flush()
                try:
                    rc = subprocess.run(
                        argv, cwd=REPO, env=full_env, stdout=fh,
                        stderr=subprocess.STDOUT, timeout=tmo).returncode
                except subprocess.TimeoutExpired:
                    rc = -9
                    fh.write(f"\n==== TIMEOUT after {tmo}s\n")
            if rc == 0:
                break
            if attempt + 1 < attempts:
                print(f"== {name}: rc={rc}, retrying once in 60s",
                      flush=True)
                time.sleep(60)
        wall = time.time() - t0
        tail = ""
        try:
            with open(log) as fh:
                tail = fh.read()[-400:]
        except OSError:
            pass
        state[name] = {"ok": rc == 0, "rc": rc, "wall_s": round(wall, 1),
                       "ts": time.time()}
        _save(state)
        print(f"== {name}: rc={rc} {wall:.0f}s\n--- tail ---\n{tail}\n---",
              flush=True)
        if name == "probe" and rc != 0:
            print("== tunnel still down; aborting campaign", flush=True)
            sys.exit(2)
    print("== campaign complete", flush=True)


if __name__ == "__main__":
    main()
