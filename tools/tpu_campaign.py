"""One-shot round-4 TPU campaign: every chip-gated validation and
measurement, in priority order, unattended and resumable.

The round-2 lesson (VERDICT weak #1/#2) is that TPU-side proof must not
wait for a human in the loop: the tunnel comes and goes, so the moment it
is up we run the whole backlog in one supervised pass. Priority order
means that if the tunnel dies mid-campaign the most important artifacts
(bench.py green, deep healthcheck) already exist.

Usage:
    python -u tools/tpu_campaign.py            # run / resume
    python -u tools/tpu_campaign.py --list     # show stages + status
    python -u tools/tpu_campaign.py --only bench,hc_deep
    python -u tools/tpu_campaign.py --redo shootout_2e18

Each stage is a subprocess (fresh import-time env knobs; a crash cannot
take down the campaign). Results land in TPU_CAMPAIGN_r4/: state.json
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
OUT = os.path.join(REPO, "TPU_CAMPAIGN_r4")
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
        # 2. THE headline: driver-protocol bench must exit 0
        ("bench", [PY, "-u", "bench.py"], {}, 3600),
        # 3. the raised gate: production algos at depth sizes PLUS the
        #    round-3 crash regime (BLS 2^20 + 2^22 subsampled) —
        #    VERDICT r3 item 6
        ("hc_deep", [PY, "-u", hc, "--deep"], {}, 10800),
        # 4. auto-dispatch shootout under the restored unrolled-CIOS
        #    default, INCLUDING fourstep (VERDICT r3 item 4):
        #    2^14 / 2^18 / 2^22 BLS
        ("shootout_2e14", [PY, "-u", shoot, "14", "bls12-381-fr",
                           "fourstep,mxu_chunked,mxu_sub"], {}, 3600),
        ("shootout_2e18", [PY, "-u", shoot, "18", "bls12-381-fr",
                           "fourstep,mxu_chunked,mxu_sub"], {}, 3600),
        ("shootout_2e22", [PY, "-u", shoot, "22", "bls12-381-fr",
                           "fourstep,mxu_chunked"], {}, 7200),
        # 5. knockout attribution re-run with the unrolled default
        #    (VERDICT r3 item 3 done-bar: fresh stage attribution)
        ("knockout", [PY, "-u", micro, "knockout", "18", "bls12-381-fr"],
         {}, 3600),
        # 6. the recorded all-configs artifact (VERDICT r3 item 7):
        #    BENCH_SUITE_r4 comes from this log
        ("suite", [PY, "-u", os.path.join("tools", "bench_suite.py")],
         {}, 14400),
        # 7. the reference-shaped sweep through 2^24 (VERDICT r3 item 1
        #    done-bar; big-num.cu:370-378 sweeps 256-bit to 2^24)
        ("sweep_full", [PY, "-u", sweep, "bls12-381-fr", "auto",
                        "12,14,16,18,20,22,24"], {}, 14400),
        # 8. 2^26 BLS single chip, factored top table (VERDICT r3 item 5;
        #    the 2GB plain table is the HBM-budget breaker)
        ("bls26_factored", [PY, "-u", sweep, "bls12-381-fr", "auto", "26"],
         {"NTT_FACTOR_TW_MIN": str(1 << 25)}, 14400),
        # 9. narrow-field regression sweep (the kernel-default changes
        #    must not move small-proth)
        ("sweep_small", [PY, "-u", sweep, "small-proth", "auto",
                         "20,22,24,26"], {}, 10800),
        # 10. SUB256 multi-level peel A/B at the new default (fewer
        #     levels = fewer reduce+twiddle passes; VERDICT r3 item 3a)
        ("sub256_b", [PY, "-u", shoot, "18", "bls12-381-fr", "mxu_sub"],
         {"NTT_MXU_SUB256_LOG": "7"}, 3600),
        # 11. highest-crash-risk stage last: plain-table 2^26 (donated
        #     input). The factored stage already secured the 2^26
        #     artifact; a worker crash here costs only this stage.
        ("bls26", [PY, "-u", sweep, "bls12-381-fr", "auto", "26"],
         {}, 14400),
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
