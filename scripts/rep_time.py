"""Within-JVM repeated query timing: min-of-N per query, canary
bracketed — the steal-resistant harness for attributing a single
query's cost on a contended host (r14: host steal measured 1-31%
minute to minute, so single-shot wall numbers are not attributable).

Each rep re-evaluates the full query plan against a noop sink (same
methodology as bench.py); the MIN over reps is the number closest to
the machine-limited cost. Shared prebuilds fire once, before the reps,
exactly like the full suite does.

Usage:
    python scripts/rep_time.py [--reps 3] [--sf-dir DIR] q1 [q2 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("rep_time")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from impuls_spark.showcase import SHARED_BUILD_GROUPS
    from scripts.bench_canary import canary_timings

    qs = e.queries()
    want = [q for q in args.queries if q in qs]
    unknown = set(args.queries) - set(want)
    if unknown:
        print(f"# unknown: {sorted(unknown)}", file=sys.stderr)

    # warmup (JVM/codegen/Arrow)
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite").save()

    for group in SHARED_BUILD_GROUPS:
        if any(q in group["consumers"] for q in want):
            for bname, force in group["builds"].items():
                t0 = time.time()
                force(spark, args.sf_dir)
                print(f"# prebuild {bname}: {time.time()-t0:.2f}s",
                      file=sys.stderr)

    out: dict = {"canary_start": canary_timings(spark, args.sf_dir)}
    for name in want:
        reps = []
        for _ in range(args.reps):
            t0 = time.time()
            qs[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            reps.append(round(time.time() - t0, 3))
        out[name] = {"min": min(reps), "reps": reps}
    out["canary_end"] = canary_timings(spark, args.sf_dir)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
