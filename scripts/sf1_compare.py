"""Canary-normalized sf1 suite comparison (VERDICT r12 next-round #1).

Compares BENCH_SF1_r13.json (the first sf1 artifact carrying its own
machine control — bench.py's start/end canary composites) against the
r11/r12 records on the SHARED query set, three ways:

- raw shared-sum ratio (the number that read 2.01x in r12 and took
  three bracketing runs to adjudicate as machine drift);
- canary-normalized ratio for rounds that carry a canary (r13+):
  shared-sum divided by the run's mean canary composite — the
  machine-immune form, comparable r13-onward;
- the r13 canary composites themselves vs the r12b closing pin's
  (2.12-2.23 s at sf0.1; sf1 runs read the same lineitem, symlinked),
  which anchors r13's machine speed to the last known-quiet window
  even though r11/r12's sf1 runs carried no control.

Usage: python scripts/sf1_compare.py [r13.json r12.json r11.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(name: str) -> dict:
    with open(os.path.join(REPO, name)) as fh:
        return json.load(fh)


def shared_sum(a: dict, b: dict) -> "tuple[float, float, int]":
    qa, qb = a["queries"], b["queries"]
    shared = [q for q in qa if q in qb and qa[q] > 0 and qb[q] > 0]
    return (sum(qa[q] for q in shared), sum(qb[q] for q in shared),
            len(shared))


def main() -> None:
    names = sys.argv[1:] or [
        "BENCH_SF1_r13.json", "BENCH_SF1_r12.json", "BENCH_SF1_r11.json"
    ]
    cur = load(names[0])
    canary = cur.get("canary", {})
    comps = [c["composite"] for c in canary.values() if "composite" in c]
    mean_canary = sum(comps) / len(comps) if comps else None
    out = {
        "artifact": names[0],
        "canary_per_rep": {k: v.get("composite") for k, v in canary.items()},
        "vs": {},
    }
    for prev_name in names[1:]:
        prev = load(prev_name)
        s_cur, s_prev, n = shared_sum(cur, prev)
        row = {
            "shared_n": n,
            "shared_sum_cur": round(s_cur, 1),
            "shared_sum_prev": round(s_prev, 1),
            "raw_ratio": round(s_cur / s_prev, 3),
        }
        pc = prev.get("canary", {})
        pcomps = [c["composite"] for c in pc.values() if "composite" in c]
        if mean_canary and pcomps:
            pmean = sum(pcomps) / len(pcomps)
            row["canary_ratio"] = round(mean_canary / pmean, 3)
            row["normalized_ratio"] = round(
                (s_cur / mean_canary) / (s_prev / pmean), 3
            )
        row["prev_has_canary"] = bool(pcomps)
        out["vs"][prev_name] = row
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
