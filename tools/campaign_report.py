"""Summarize a TPU campaign directory into one markdown report.

Reads TPU_CAMPAIGN_r3/state.json plus the per-stage logs and extracts the
measurement lines (bench JSON, shootout per-algo rates, healthcheck
verdicts, sweep records) so the round artifacts / RESPONSE can quote one
place instead of twenty logs.

Usage:
    python tools/campaign_report.py [campaign_dir] [> CAMPAIGN_REPORT.md]
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Lines worth quoting from each stage log, by stage-name prefix.
PATTERNS = {
    "bench": [r'^\{"metric"'],
    "hc_": [r"\bOK\b|FAIL|^#"],
    "verify_small": [r"roundtrip OK"],
    "sub256_probe": [r"\bOK\b|FAIL|^#"],
    "sub256_m64_probe": [r"\bOK\b|FAIL|^#"],
    "sub256_": [r"ms/iter|FAILED|^#"],
    "cios_unrolled": [r"ms/iter|FAILED|^#"],
    "dimsem_": [r"ms/iter|FAILED|^#"],
    "knockout": [r"^\S+\s+\d+\.\d+ ms|^#"],
    "bls2": [r'^\{"|bitexact'],
    "suite": [r'^\{"'],
    "sweep_": [r'^\{"'],
}


def _patterns_for(name: str):
    for prefix, pats in PATTERNS.items():
        if name.startswith(prefix):
            return [re.compile(p) for p in pats]
    return []


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "TPU_CAMPAIGN_r3")
    state_path = os.path.join(out, "state.json")
    state = {}
    if os.path.exists(state_path):
        with open(state_path) as fh:
            state = json.load(fh)

    print(f"# Campaign report — {os.path.basename(out)}\n")
    print("| stage | ok | rc | wall_s |")
    print("|---|---|---|---|")
    for name, st in state.items():
        print(f"| {name} | {st.get('ok')} | {st.get('rc')} "
              f"| {st.get('wall_s')} |")
    print()

    for name in state:
        log = os.path.join(out, f"{name}.log")
        if not os.path.exists(log):
            continue
        pats = _patterns_for(name)
        if not pats:
            continue
        with open(log, errors="replace") as fh:
            lines = [ln.rstrip() for ln in fh
                     if any(p.search(ln) for p in pats)]
        if lines:
            print(f"## {name}\n")
            print("```")
            # keep at most the last 40 matches (later attempts win)
            for ln in lines[-40:]:
                print(ln)
            print("```\n")


if __name__ == "__main__":
    main()
