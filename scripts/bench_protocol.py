"""Pinned benchmark protocol: attribute per-query deltas, not noise.

Runs ``bench.py`` REPS times, each in a **fresh subprocess** (cold JVM —
no cross-run codegen/Arrow warmup leaks), and reports the per-query
**median** plus min/max spread. If a prior recorded run is given, also
prints the per-query delta of medians, flagging only moves larger than
the observed cross-rep spread (anything inside the spread is
run-to-run variance, not a code change).

Usage:

    python scripts/bench_protocol.py [--reps 3] [--vs BENCH_r02.json] \
        [--out BENCH_PINNED.json]

The JSON written to --out is the round-over-round comparison artifact:
commit it (or paste its table into BASELINE.md) so the next round's
claims are attributable.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def machine_state() -> dict:
    """Load average + CPU frequency snapshot, so thermal/contention
    attributions (d02 r6, d26 history) are recorded data, not
    narrative (VERDICT r6 item 5)."""
    state: dict = {}
    try:
        la1, la5, _ = os.getloadavg()
        state["load_avg_1m"] = round(la1, 2)
        state["load_avg_5m"] = round(la5, 2)
    except OSError:
        pass
    freqs = []
    for f in sorted(glob.glob(
        "/sys/devices/system/cpu/cpu*/cpufreq/scaling_cur_freq"
    )):
        try:
            with open(f) as fh:
                freqs.append(int(fh.read().strip()) / 1000.0)  # kHz -> MHz
        except (OSError, ValueError):
            continue
    if not freqs:  # fallback: /proc/cpuinfo reports MHz directly
        try:
            with open("/proc/cpuinfo") as fh:
                for line in fh:
                    if line.lower().startswith("cpu mhz"):
                        freqs.append(float(line.split(":", 1)[1]))
        except (OSError, ValueError):
            pass
    if freqs:
        state["cpu_mhz_mean"] = round(sum(freqs) / len(freqs), 0)
        state["cpu_mhz_min"] = round(min(freqs), 0)
    return state


def run_once(env: dict[str, str]) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench.py failed:\n{proc.stderr[-2000:]}")
    # bench.py prints the FULL object first, then a compact tail line
    # sized for the driver's 2000-char capture — take the full one
    # (identified by its shared_builds/machine keys, absent from the
    # compact line)
    objs = [json.loads(ln) for ln in proc.stdout.splitlines()
            if ln.startswith("{")]
    full = [o for o in objs if "machine" in o]
    return (full or objs)[-1]


def load_prior(path: str) -> dict[str, float] | None:
    if not path or not os.path.exists(path):
        return None
    with open(path) as fh:
        data = json.load(fh)
    # accept a raw bench.py line, the driver's BENCH_r{N} wrapper, or a
    # prior pinned artifact (whose "queries" is a list of row dicts —
    # compare against its per-query MIN, the protocol's faithful
    # estimator on a throttling machine)
    queries = data.get("queries") or data.get("parsed", {}).get("queries")
    if isinstance(queries, list):
        queries = {
            r["query"]: r.get("min", r.get("median")) for r in queries
        }
    return queries


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--vs", default=os.path.join(REPO, "BENCH_r02.json"))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_PINNED.json"))
    args = ap.parse_args()

    env = dict(os.environ)
    runs = []
    machine = []
    for i in range(args.reps):
        print(f"# rep {i + 1}/{args.reps} (cold JVM)", file=sys.stderr)
        before = machine_state()
        runs.append(run_once(env))
        after = machine_state()
        machine.append({"rep": i + 1, "before": before, "after": after})
        print(f"#   machine before={before} after={after}", file=sys.stderr)

    names = list(runs[0]["queries"])
    med, lo, hi = {}, {}, {}
    for q in names:
        vals = [r["queries"][q] for r in runs if r["queries"][q] >= 0]
        med[q] = round(statistics.median(vals), 3) if vals else -1.0
        lo[q] = min(vals) if vals else -1.0
        hi[q] = max(vals) if vals else -1.0

    prior = load_prior(args.vs)
    rows = []
    for q in names:
        spread = hi[q] - lo[q]
        row = {"query": q, "median": med[q], "min": lo[q], "max": hi[q]}
        if prior and q in prior:
            delta = round(med[q] - prior[q], 3)
            row["prior"] = prior[q]
            row["delta"] = delta
            # attributable only when the move exceeds the cross-rep spread
            row["attributable"] = abs(delta) > max(spread, 0.15)
        rows.append(row)

    # shared per-session builds (pair-graph family): reported once,
    # separately, so d02/d03/d14/d29/d59/d26 rows are incremental work
    # (VERDICT r9 item 8)
    shared_rows = []
    for b in runs[0].get("shared_builds", {}):
        vals = [r["shared_builds"][b] for r in runs
                if r.get("shared_builds", {}).get(b, -1) >= 0]
        if vals:
            shared_rows.append({
                "build": b, "median": round(statistics.median(vals), 3),
                "min": min(vals), "max": max(vals),
            })

    total_med = round(statistics.median([r["value"] for r in runs]), 3)
    out = {
        "protocol": {
            "reps": args.reps, "cold_jvm_per_rep": True,
            "sf": runs[0].get("sf"), "cpus": runs[0].get("cpus"),
        },
        "total_median_sec": total_med,
        "total_per_rep": [r["value"] for r in runs],
        "machine_per_rep": machine,
        "vs": os.path.basename(args.vs) if prior else None,
        "shared_builds": shared_rows,
        "queries": rows,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)

    print(f"total median {total_med}s over {args.reps} cold reps "
          f"(per-rep: {[r['value'] for r in runs]})")
    if prior:
        moved = [r for r in rows if r.get("attributable")]
        print(f"{len(moved)}/{len(rows)} queries moved beyond cross-rep "
              f"spread vs {os.path.basename(args.vs)}:")
        for r in sorted(moved, key=lambda r: r["delta"]):
            print(f"  {r['query']}: {r['prior']} -> {r['median']} "
                  f"({r['delta']:+.3f}s)")


if __name__ == "__main__":
    main()
