"""Machine-drift canary: 2-3 FIXED trivial-plan control queries whose
cost depends only on the box, never on impuls_spark code (VERDICT r11
"what's missing #2"). bench_protocol.py runs this once per rep (cold
JVM, same as bench.py) and reports every code query as a ratio to the
canary composite alongside raw seconds — one pin can then answer
"code or machine" without bracketing runs.

Prints ONE JSON line:
    {"c_scan": s, "c_shuffle": s, "c_sort": s, "composite": s}

Each canary is the MIN of 3 in-process repetitions (JVM/codegen warmup
excluded — the composite must track machine speed, not startup), after
one untimed warmup of each.

The three plans cover the three resources a drifting box moves:
- c_scan:    parquet IO + whole-stage agg over lineitem (read path)
- c_shuffle: hash aggregation over a synthetic range (exchange path)
- c_sort:    global sort + parquet write of a synthetic range (sort,
             encode and disk-write path — a bare sort-then-agg would be
             optimized away by EliminateSorts, so the write IS the sink)

DO NOT EDIT the canary queries: their whole value is being identical
across rounds. If they must change, rename the keys so stale
comparisons fail loudly instead of silently comparing different work.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def canary_timings(spark, sf_dir: str = SF_DIR) -> dict:
    """The fixed control queries against an EXISTING session — the
    importable form, so bench.py (the driver's single-rep instrument)
    and the sf1 suite runner can carry the same machine yardstick
    inside their own artifacts (VERDICT r12 next-round #1/#5). Same
    measurement procedure as the cold-JVM script: one untimed warmup,
    then min of 3 timed reps per canary."""
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def c_scan():
        lineitem.groupBy("l_returnflag").agg(
            F.sum("l_quantity"), F.avg("l_extendedprice"),
            F.count("*"),
        ).collect()

    def c_shuffle():
        (
            spark.range(0, 20_000_000)
            .select((F.col("id") % 100_000).alias("k"),
                    (F.col("id") * 2654435761 % 1_000_003).alias("v"))
            .groupBy("k").agg(F.sum("v"), F.max("v"))
            .agg(F.count("*")).collect()
        )

    sort_out = "/tmp/spark_graft_canary_sort"

    def c_sort():
        (
            spark.range(0, 10_000_000)
            .select((F.col("id") * 2654435761 % 1_000_003).alias("v"))
            .orderBy("v")
            .write.mode("overwrite").parquet(sort_out)
        )

    out = {}
    for name, fn in (("c_scan", c_scan), ("c_shuffle", c_shuffle),
                     ("c_sort", c_sort)):
        fn()  # untimed warmup (codegen + file listing)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    out["composite"] = round(sum(out.values()), 3)
    return out


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(canary_timings(spark)))
    spark.stop()


if __name__ == "__main__":
    main()
