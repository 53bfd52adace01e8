"""Phase-timing probe for d69_dedup_index_takedown: clone / ingest /
remove / classify+collect walls, min-of-N, canary-bracketed — the
attribution tool for VERDICT r14 next-round item 1."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("phase_d69")
        .config("spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_CPUS", "32"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from impuls_spark.llm.dedup import DedupIndex
    from impuls_spark.showcase.llm import (
        _build_didx_tracked_mod3,
        _cloned_fixture,
        _docs_wide,
    )
    from scripts.bench_canary import canary_timings

    out: dict = {"canary_start": canary_timings(spark, sf_dir)}
    docs = _docs_wide(spark, sf_dir).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    fresh1 = F.concat(
        F.lit("fresh b1 crawl document "), F.col("doc_id").cast("string"),
        F.lit(" payload alpha beta gamma delta epsilon"),
    )
    b1 = (
        docs.filter(F.col("doc_id") % 6 == 0)
        .select((F.col("doc_id") + 7000000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 3 == 1)
            .select((F.col("doc_id") + 8000000).alias("doc_id"),
                    fresh1.alias("text"))
        )
    )
    probes = (
        docs.filter(F.col("doc_id") % 6 == 0)
        .select((F.col("doc_id") + 9000000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 6 == 3)
            .select((F.col("doc_id") + 9300000).alias("doc_id"), "text")
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 6 == 1)
            .select((F.col("doc_id") + 9600000).alias("doc_id"),
                    fresh1.alias("text"))
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 6 == 4)
            .select((F.col("doc_id") + 9900000).alias("doc_id"),
                    F.concat(fresh1, F.lit(" extrawordZZZ")).alias("text"))
        )
    )
    phases: dict[str, list] = {}

    def t(name, fn):
        t0 = time.time()
        r = fn()
        phases.setdefault(name, []).append(round(time.time() - t0, 3))
        return r

    for _ in range(reps):
        path = t("clone", lambda: _cloned_fixture(
            spark, sf_dir, "d69_didx", _build_didx_tracked_mod3))
        idx = t("load", lambda: DedupIndex.load(spark, path))
        s1 = t("ingest", lambda: idx.ingest(b1))
        removed = (
            corpus.filter(F.col("doc_id") % 6 == 0).select("doc_id")
            .unionByName(
                s1.filter(
                    (F.col("status") == "novel")
                    & ((F.col("doc_id") - 8000000) % 6 == 1)
                ).select("doc_id")
            )
        )
        t("remove", lambda: idx.remove(removed))
        s2 = t("classify", lambda: DedupIndex.load(spark, path)
               .classify(probes))
        t("sink", lambda: s1.select(
            F.lit("b1").alias("batch"), "doc_id", "status"
        ).unionByName(
            s2.select(F.lit("probe").alias("batch"), "doc_id", "status")
        ).write.format("noop").mode("overwrite").save())
    out["phases"] = {k: {"min": min(v), "reps": v} for k, v in phases.items()}
    out["canary_end"] = canary_timings(spark, sf_dir)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
