"""Membership-probe flatness evidence (VERDICT r11 #2).

Builds a DedupIndex with the library's own (key-clustered) layout at
1x and 10x corpus size, then classifies the SAME fixed bounded batch
against both with the micro-batch join mode — the exact per-epoch
probe the streaming ingest runs. Before r12, probe cost grew with the
index (the scan read every row group); with the clustered layout +
pushed In predicate it should stay ~flat.

Writes PROBE_SCALE.json:
    {"n_small": ..., "n_large": ..., "batch": ...,
     "classify_small_sec": ..., "classify_large_sec": ...,
     "slope_at_10x": ...}

Run:  python scripts/probe_scale.py  [--small 30000] [--factor 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from impuls_spark.llm.dedup import DedupIndex  # noqa: E402


def docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document "), F.col("id").cast("string"), F.lit(" "),
            F.md5(F.col("id").cast("string")),
            F.lit(" "),
            F.md5((F.col("id") * 31 + 7).cast("string")),
        ).alias("text"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=30_000)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--batch", type=int, default=200)
    ap.add_argument("--out", default=os.path.join(REPO, "PROBE_SCALE.json"))
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        # many small row groups emulate a 100 TB artifact's row-group
        # count at test scale — the pruning ratio is what transfers
        .config("spark.hadoop.parquet.block.size", str(1 << 20))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = "/tmp/spark_graft_probe_scale"
    shutil.rmtree(base, ignore_errors=True)
    n_small, n_large = args.small, args.small * args.factor
    batch = docs(spark, 0, args.batch).localCheckpoint(eager=True)

    out = {"n_small": n_small, "n_large": n_large, "batch": args.batch}
    for n, tag in ((n_small, "small"), (n_large, "large")):
        path = f"{base}/idx_{tag}"
        t0 = time.time()
        DedupIndex.build(docs(spark, 0, n), path)
        build_s = time.time() - t0
        idx = DedupIndex.load(spark, path)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            idx.classify(batch, broadcast_new=True).collect()
            best = min(best, time.time() - t0)
        out[f"build_{tag}_sec"] = round(build_s, 3)
        out[f"classify_{tag}_sec"] = round(best, 3)
        print(f"{tag}: n={n} build {build_s:.1f}s probe {best:.3f}s",
              file=sys.stderr)

    out["slope_at_10x"] = round(
        out["classify_large_sec"] / max(out["classify_small_sec"], 1e-9), 3
    )
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
