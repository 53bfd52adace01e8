"""Continuous corpus ingest, operationally complete: the crawl-side
write path a training-data team actually runs, composed from
``impuls_spark.streaming``:

1. **classify-and-ingest** — each micro-batch of crawled documents is
   deduped in-batch, classified against the accepted corpus's
   maintained hash/MinHash-band indexes (``exact`` / ``near`` /
   ``novel``), and only novel documents land — exactly-once at rest
   via epoch-partitioned dynamic overwrite (``ingest_with_dedup``);
2. **auto-compaction** — every ``--compact-every`` epochs the
   committed epoch directories (and the index sidecars) fold into one
   partition with a bounded file count, preserving first-arrival
   (``compact_corpus`` riding inside the ingest loop);
3. **observability** — a ``StreamingQueryListener`` appends one JSON
   line per micro-batch (rows, durations) to a sidecar the operator
   tails (``attach_progress_log``);
4. **cardinality sidecar** — the raw crawl streams through the KMV
   partial sink (``stream_kmv_partials``), so "distinct documents
   seen per language" — dup-robust, unlike accepted-row counts — reads
   off merged O(groups·k) partials instead of rescanning the crawl
   (``read_kmv_partials``).

Run (simulates a crawl by dropping N parquet batches into a dir):

    python -m examples.continuous_ingest --out /tmp/ci [--batches 6]
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import SparkSession

from impuls_spark.sources.corpus import read_corpus
from impuls_spark.streaming import (
    attach_progress_log,
    detach_progress_log,
    ingest_with_dedup,
    read_progress_log,
)
from impuls_spark.streaming.compact import _epoch_dirs


def run_ingest(
    spark: SparkSession,
    out_dir: str,
    n_batches: int = 6,
    compact_every: int = 3,
) -> dict:
    src = os.path.join(out_dir, "crawl")
    corpus = os.path.join(out_dir, "corpus")
    ckpt = os.path.join(out_dir, "ckpt")
    progress = os.path.join(out_dir, "progress.jsonl")
    os.makedirs(src, exist_ok=True)
    schema = "doc_id long, text string, lang string"

    listener = attach_progress_log(spark, progress)
    try:
        for b in range(n_batches):
            rows = [
                (b * 10 + i,
                 f"crawled document {b * 10 + i} words "
                 + " ".join(f"w{(b * 10 + i) * 7 % 97 + j}"
                            for j in range(6)),
                 ["en", "fr"][i % 2])
                for i in range(3)
            ]
            # every batch re-crawls one earlier doc: an exact dup that
            # the index classification must reject
            if b > 0:
                rows.append((b * 10 + 9, rows[0][1], "en"))
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(src, f"b{b}"))

            stream = (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
            q = ingest_with_dedup(
                stream, corpus, ckpt, compact_every=compact_every
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
                q.awaitTermination(30)
    finally:
        detach_progress_log(spark, listener)

    # cardinality sidecar over the raw crawl: distinct-docs-per-lang
    # that re-crawls cannot inflate (same text -> same hash)
    from impuls_spark.streaming import read_kmv_partials, stream_kmv_partials

    sk_dir = os.path.join(out_dir, "sketches")
    sk_ckpt = os.path.join(out_dir, "ckpt_sk")
    crawl_stream = (spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    qs = stream_kmv_partials(
        crawl_stream, sk_dir, sk_ckpt, "text", ["lang"], k=16
    )
    try:
        qs.processAllAvailable()
    finally:
        qs.stop()
        qs.awaitTermination(30)
    distinct_per_lang = {
        r["lang"]: r["est_ndv"]
        for r in read_kmv_partials(spark, sk_dir, ["lang"], k=16).collect()
    }

    accepted = read_corpus(spark, corpus)
    batches_logged = [
        r for r in read_progress_log(progress) if r["event"] == "progress"
    ]
    return {
        "accepted_docs": accepted.count(),
        "epoch_dirs": len(_epoch_dirs(corpus)),
        "progress_batches": len(batches_logged),
        "langs": sorted(
            r["lang"] for r in accepted.select("lang").distinct().collect()
        ),
        "distinct_per_lang": distinct_per_lang,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/continuous_ingest")
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--compact-every", type=int, default=3)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    stats = run_ingest(spark, args.out, args.batches, args.compact_every)
    print(stats)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
