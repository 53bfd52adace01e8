"""In-literal pushdown cost at production-ish scale (VERDICT r12 #2).

PROBE_SCALE.json proves the probe law at 30k->300k artifact rows with
200-key batches; this instrument measures WHERE the In pushdown stops
paying as the batch grows toward PROBE_PUSHDOWN_MAX, against a 20M-row
(default; --rows to go bigger) range-clustered + bloomed key artifact —
the exact layout DedupIndex/AnnIndex write.

Per batch size, three end-to-end probe strategies (each timed fresh,
min of --reps):

- in:   pushdown_key_filter's In path (driver collect + isin literal +
        pushed In predicate) followed by the exact broadcast semi-join
        — the production probe.
- span: the over-cap [min, max] fallback (cap forced below the batch)
        followed by the same semi-join.
- semi: the bare broadcast semi-join with no scan prefilter — the
        pre-r12 plan, linear in the index.

The In path's cost is split once per size into its driver-side
component (collect + literal construction + analysis/optimize/physical
planning, measured via executedPlan()) and its execution component, so
the cap can be chosen where driver+planning overtakes the scan savings.

Writes PROBE_CAP.json:
    {"rows": N, "files": F, "sizes": {"<k>": {"in_e2e": s,
     "in_driver_plan": s, "span_e2e": s, "semi_e2e": s}, ...},
     "recommended_cap": K}

Run:  python scripts/probe_cap.py [--rows 20000000] [--reps 3]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

#: 5k+ sizes are guarded: raising the parquet In threshold past ~2-5k
#: string keys makes the reader evaluate a values-deep Or-chain and
#: DIES with StackOverflowError (first measured here, r13) — the run
#: records the failure instead of crashing.
SIZES = [200, 500, 1_000, 2_000, 5_000]


def keys_of(spark, ids):
    return ids.select(F.md5(F.col("id").cast("string")).alias("__h"))


def batch_of(spark, n_rows: int, size: int, absent: bool = False):
    """``size`` distinct keys spread uniformly over the artifact's key
    population (or shifted past it for the absent case)."""
    step = max(n_rows // size, 1)
    ids = spark.range(0, size).select(
        (F.col("id") * step + (n_rows if absent else 0)).alias("id")
    )
    return keys_of(spark, ids).localCheckpoint(eager=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "PROBE_CAP.json"))
    ap.add_argument("--keep", action="store_true",
                    help="reuse an artifact left by a previous run")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # many small row groups emulate a 100 TB artifact's row-group
        # count at test scale — the pruning ratio is what transfers
        .config("spark.hadoop.parquet.block.size", str(1 << 20))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from impuls_spark.llm import probe
    from impuls_spark.llm.probe import key_bloom, range_cluster

    path = f"/tmp/spark_graft_probe_cap_{args.rows}"
    if not (args.keep and os.path.exists(path)):
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.time()
        key_bloom(
            range_cluster(keys_of(spark, spark.range(args.rows)), ["__h"])
            .write.mode("overwrite"), "__h",
        ).parquet(path)
        print(f"# built {args.rows}-row artifact in {time.time()-t0:.1f}s",
              file=sys.stderr)
    files = len(glob.glob(f"{path}/*.parquet"))
    out = {"rows": args.rows, "files": files, "reps": args.reps,
           "sizes": {}}

    def timed(fn):
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 3)

    for size in SIZES:
        idx = spark.read.parquet(path)
        batch = batch_of(spark, args.rows, size)
        row = {}

        def in_e2e():
            # force the In path even above the shipped cap — this
            # instrument is what MEASURES where the cap belongs
            old = probe.PROBE_PUSHDOWN_MAX
            probe.PROBE_PUSHDOWN_MAX = max(old, size + 1)
            try:
                probe.pushdown_key_filter(idx, "__h", batch).join(
                    F.broadcast(batch), "__h", "left_semi"
                ).count()
            finally:
                probe.PROBE_PUSHDOWN_MAX = old

        def span_e2e():
            old = probe.PROBE_PUSHDOWN_MAX
            probe.PROBE_PUSHDOWN_MAX = size - 1
            try:
                probe.pushdown_key_filter(idx, "__h", batch).join(
                    F.broadcast(batch), "__h", "left_semi"
                ).count()
            finally:
                probe.PROBE_PUSHDOWN_MAX = old

        def semi_e2e():
            idx.join(F.broadcast(batch), "__h", "left_semi").count()

        # driver-side cost of the In path alone: collect + literal +
        # full query planning, no execution
        def in_driver_plan():
            old = probe.PROBE_PUSHDOWN_MAX
            probe.PROBE_PUSHDOWN_MAX = max(old, size + 1)
            try:
                f = probe.pushdown_key_filter(idx, "__h", batch).join(
                    F.broadcast(batch), "__h", "left_semi"
                )
                f._jdf.queryExecution().executedPlan().toString()
            finally:
                probe.PROBE_PUSHDOWN_MAX = old

        try:
            row["in_e2e"] = timed(in_e2e)
            row["in_driver_plan"] = timed(in_driver_plan)
        except Exception as ex:
            # the In path breaking IS a data point (the Or-chain SOE)
            row["in_error"] = type(ex).__name__
            print(f"# {size}: In path failed: {ex}"[:300], file=sys.stderr)
        row["span_e2e"] = timed(span_e2e)
        row["semi_e2e"] = timed(semi_e2e)
        out["sizes"][str(size)] = row
        print(f"# {size}: {row}", file=sys.stderr)

    # absent-key batch at one size shows the bloom path
    absent = batch_of(spark, args.rows, 500, absent=True)
    idx = spark.read.parquet(path)

    def absent_in():
        probe.pushdown_key_filter(idx, "__h", absent).join(
            F.broadcast(absent), "__h", "left_semi"
        ).count()

    out["absent_500_in_e2e"] = timed(absent_in)

    # cap recommendation: largest measured size where the In path still
    # beats BOTH alternatives end to end (and did not error)
    winning = [
        int(s) for s, r in out["sizes"].items()
        if "in_e2e" in r
        and r["in_e2e"] <= min(r["span_e2e"], r["semi_e2e"])
    ]
    out["recommended_cap"] = max(winning) if winning else 0
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
