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


def run_canary(env: dict[str, str]) -> dict:
    """One cold-JVM run of the fixed control queries
    (scripts/bench_canary.py). Returns its JSON line: per-canary best
    seconds + ``composite``. The composite is the per-rep machine
    yardstick: code-query seconds divided by it are machine-drift-
    immune ratios (VERDICT r11 'what's missing #2')."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "bench_canary.py")],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench_canary.py failed:\n{proc.stderr[-2000:]}")
    return [json.loads(ln) for ln in proc.stdout.splitlines()
            if ln.startswith("{")][-1]


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


def load_prior(path: str):
    """(per-query min/median seconds, per-query canary ratio_min or
    None) from a prior bench/pin artifact."""
    if not path or not os.path.exists(path):
        return None, None
    with open(path) as fh:
        data = json.load(fh)
    # accept a raw bench.py line, the driver's BENCH_r{N} wrapper, or a
    # prior pinned artifact (whose "queries" is a list of row dicts —
    # compare against its per-query MIN, the protocol's faithful
    # estimator on a throttling machine)
    queries = data.get("queries") or data.get("parsed", {}).get("queries")
    ratios = None
    if isinstance(queries, list):
        ratios = {
            r["query"]: r["ratio_min"] for r in queries
            if r.get("ratio_min") is not None
        } or None
        queries = {
            r["query"]: r.get("min", r.get("median")) for r in queries
        }
    return queries, ratios


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--vs", default=os.path.join(REPO, "BENCH_r02.json"))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_PINNED.json"))
    args = ap.parse_args()

    env = dict(os.environ)
    runs = []
    machine = []
    canaries = []
    for i in range(args.reps):
        print(f"# rep {i + 1}/{args.reps} (cold JVM)", file=sys.stderr)
        before = machine_state()
        canaries.append(run_canary(env))
        runs.append(run_once(env))
        after = machine_state()
        machine.append({"rep": i + 1, "before": before, "after": after})
        print(f"#   canary={canaries[-1]} machine before={before} "
              f"after={after}", file=sys.stderr)

    composites = [c["composite"] for c in canaries]
    names = list(runs[0]["queries"])
    med, lo, hi, rlo, rhi = {}, {}, {}, {}, {}
    for q in names:
        pairs = [
            (r["queries"][q], c)
            for r, c in zip(runs, composites) if r["queries"][q] >= 0
        ]
        vals = [v for v, _ in pairs]
        med[q] = round(statistics.median(vals), 3) if vals else -1.0
        lo[q] = min(vals) if vals else -1.0
        hi[q] = max(vals) if vals else -1.0
        # the canary-normalized instrument: seconds per canary-composite
        # second, per rep, so a uniformly slow window cancels
        ratios = [v / c for v, c in pairs if c > 0]
        rlo[q] = round(min(ratios), 4) if ratios else None
        rhi[q] = round(max(ratios), 4) if ratios else None

    prior, prior_ratios = load_prior(args.vs)
    rows = []
    for q in names:
        spread = hi[q] - lo[q]
        row = {"query": q, "median": med[q], "min": lo[q], "max": hi[q],
               "ratio_min": rlo[q], "ratio_max": rhi[q]}
        if prior and q in prior:
            delta = round(med[q] - prior[q], 3)
            row["prior"] = prior[q]
            row["delta"] = delta
            # attributable only when the move exceeds the cross-rep spread
            row["attributable"] = abs(delta) > max(spread, 0.15)
        if prior_ratios and q in prior_ratios and rlo[q] is not None:
            # the drift-immune verdict: a delta counts as CODE only when
            # the canary ratio moved beyond the rep-to-rep ratio spread
            rspread = (rhi[q] or 0) - (rlo[q] or 0)
            rdelta = round(rlo[q] - prior_ratios[q], 4)
            row["ratio_prior"] = prior_ratios[q]
            row["ratio_delta"] = rdelta
            row["ratio_attributable"] = abs(rdelta) > max(
                rspread, 0.05 * max(prior_ratios[q], rlo[q]), 0.01
            )
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
            "canary": "scripts/bench_canary.py",
        },
        "total_median_sec": total_med,
        "total_per_rep": [r["value"] for r in runs],
        "machine_per_rep": machine,
        "canary_per_rep": canaries,
        "vs": os.path.basename(args.vs) if prior else None,
        "shared_builds": shared_rows,
        "queries": rows,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)

    print(f"total median {total_med}s over {args.reps} cold reps "
          f"(per-rep: {[r['value'] for r in runs]}; canary composites "
          f"{composites})")
    if prior:
        moved = [r for r in rows if r.get("attributable")]
        print(f"{len(moved)}/{len(rows)} queries moved beyond cross-rep "
              f"spread vs {os.path.basename(args.vs)} (raw seconds):")
        for r in sorted(moved, key=lambda r: r["delta"]):
            print(f"  {r['query']}: {r['prior']} -> {r['median']} "
                  f"({r['delta']:+.3f}s)")
    if prior_ratios:
        rmoved = [r for r in rows if r.get("ratio_attributable")]
        print(f"{len(rmoved)}/{len(rows)} queries moved beyond ratio "
              "spread (canary-normalized — machine drift cancelled):")
        for r in sorted(rmoved, key=lambda r: r["ratio_delta"]):
            print(f"  {r['query']}: ratio {r['ratio_prior']} -> "
                  f"{r['ratio_min']} ({r['ratio_delta']:+.4f})")
    elif prior:
        print("# prior artifact has no canary ratios — raw-second "
              "attribution only (first canary-carrying pin)")


if __name__ == "__main__":
    main()
