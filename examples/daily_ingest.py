"""Day-N BATCH ingest against persisted indexes — the scheduled
(airflow-shaped) sibling of ``continuous_ingest``'s streaming loop,
composed from the two at-rest index artifacts:

1. **text dedup via DedupIndex** — day 0 builds the MinHash-LSH index
   from the seed corpus and saves it as parquet; each day's batch is
   classified (``exact``/``near``/``novel``) against the STORED index
   and only novel documents are accepted, their hashes/band buckets
   appended — corpus signatures are never recomputed, accepted text is
   never reread (``llm.dedup.DedupIndex``);
2. **vector ingest via AnnIndex** — the accepted documents' embeddings
   append to the saved ANN index: routed to the day-0 anchors and
   encoded with the day-0 PQ codebooks, no re-clustering
   (``llm.similarity.AnnIndex.append``); ``recon_error`` on the
   appended batch's own codes is the drift gauge, and when it crosses
   ``retrain_above`` the pipeline calls ``AnnIndex.retrain`` — anchors
   and codebooks re-derived from the accreted corpus, artifacts
   rewritten atomically, new anchors persisted with the index;
3. **takedown** — ``--takedown id...`` removes documents from BOTH
   indexes (``DedupIndex.remove`` via the tracked ``__id`` provenance
   rows; ``AnnIndex.remove`` directly by vector id): their content
   classifies novel again and their vectors stop surfacing as
   neighbors;
4. **maintenance** — when the per-ingest small files accrete,
   ``DedupIndex.compact()`` folds each artifact to a bounded file
   count with no data-loss window (``streaming.compact.compact_flat_dir``).

Embeddings here come from the deterministic stub encoder
(``llm.embed``); swap ``encoder="real"`` for sentence-transformers.

Run:

    python -m examples.daily_ingest --out /tmp/di [--days 3]
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from impuls_spark.llm import AnnIndex, DedupIndex
from impuls_spark.llm.embed import embed_texts


def _spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[4]")
        .appName("daily_ingest")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _day_batch(spark: SparkSession, day: int, n: int = 40):
    """Simulated crawl day: half re-crawls of day-(N-1), half fresh."""
    rows = []
    for i in range(n):
        if i % 2 == 0 and day > 0:
            text = f"day {day - 1} doc {i} body alpha beta gamma delta {i}"
        else:
            text = f"day {day} doc {i} body alpha beta gamma delta {i}"
        rows.append((day * 10_000 + i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def run_days(spark: SparkSession, out: str, days: int = 3,
             dim: int = 64,
             retrain_above: "float | None" = None,
             takedown: "list | None" = None) -> dict:
    """The pipeline body, session-injectable for tests. Returns the
    per-day status counts plus the final compaction stats.
    ``takedown`` doc ids are removed from BOTH indexes after the day
    loop (licensing/GDPR) — their content becomes re-acceptable and
    their vectors stop surfacing as neighbors."""
    dd_path = os.path.join(out, "dedup_index")
    ann_path = os.path.join(out, "ann_index")
    report: dict = {"days": {}}

    # -- day 0: seed corpus builds both indexes -------------------------
    seed = _day_batch(spark, 0)
    # track_ids: one string __id per artifact row buys per-document
    # takedown later; classification reads column-prune it for free
    DedupIndex.build(seed, dd_path, track_ids=True)
    seed_vecs = embed_texts(seed, dim=dim).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    anchors = seed_vecs.orderBy("vec_id").limit(4)
    AnnIndex.build(
        seed_vecs, anchors, dim=dim, m=4, pq_k=4
    ).save(ann_path)
    print(f"day 0: seeded {seed.count()} docs into both indexes")

    # -- days 1..N: classify -> accept novel -> append vectors ----------
    all_vecs = seed_vecs  # the accreted corpus a retrain trains on
    retrained = False
    for day in range(1, days + 1):
        batch = _day_batch(spark, day)
        didx = DedupIndex.load(spark, dd_path)
        # daily batches are bounded: the micro-batch join mode scans
        # but never exchanges the index tables (see incremental_dedup)
        status = didx.ingest(batch, broadcast_new=True)
        by = {r["status"]: r["n"] for r in status.groupBy("status")
              .agg(F.count("*").alias("n")).collect()}
        novel = batch.join(
            status.filter(F.col("status") == "novel").select("doc_id"),
            "doc_id", "left_semi",
        )
        vecs = embed_texts(novel, dim=dim).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        aidx = AnnIndex.load(
            spark, ann_path, all_vecs,
            None if retrained else anchors,  # retrain persists anchors
        )
        appended = aidx.append(vecs, path=ann_path)
        all_vecs = all_vecs.unionByName(vecs)
        # drift gauge over the APPENDED BATCH's own codes (ADVICE r9:
        # averaging over all codes dilutes the signal the docstring
        # promises) — semi-join the just-written codes to the batch ids
        row = appended.model[0].join(
            vecs.select("vec_id"), "vec_id", "left_semi"
        ).agg(F.round(F.avg("recon_error"), 4).alias("e")).collect()[0]
        drift = row["e"]  # None on an all-duplicate day
        print(f"day {day}: {by} -> appended {vecs.count()} vectors; "
              f"batch mean recon_error {drift} (retrain gauge)")
        report["days"][day] = {"status": by, "recon_error": drift}
        if (retrain_above is not None and drift is not None
                and drift > retrain_above):
            # the gauge tripped: rebuild anchors + codebooks from the
            # accreted corpus and rewrite the artifacts atomically
            appended.retrain(path=ann_path)
            retrained = True
            print(f"day {day}: recon_error {drift} > {retrain_above} "
                  "-> retrained (anchors now stored with the index)")
            report["days"][day]["retrained"] = True

    # -- takedown: remove docs from BOTH indexes -------------------------
    if takedown:
        dd_rm = DedupIndex.load(spark, dd_path).remove(takedown)
        ann_rm = AnnIndex.remove(spark, ann_path, takedown)
        print(f"takedown {len(takedown)} docs: dedup hashes "
              f"{dd_rm['hashes']['rows_before']}->"
              f"{dd_rm['hashes']['rows_after']}, ann cells "
              f"{ann_rm['cells']['rows_before']}->"
              f"{ann_rm['cells']['rows_after']}")
        report["takedown"] = {"dedup": dd_rm, "ann": ann_rm}

    # -- maintenance -----------------------------------------------------
    stats = DedupIndex.load(spark, dd_path).compact()
    ann_stats = AnnIndex.compact(spark, ann_path)
    print(f"compacted: hashes {stats['hashes']['files_before']}->"
          f"{stats['hashes']['files_after']} files, bands "
          f"{stats['bands']['files_before']}->"
          f"{stats['bands']['files_after']}, ann cells "
          f"{ann_stats['cells']['files_before']}->"
          f"{ann_stats['cells']['files_after']}")
    report["compact"] = stats
    report["ann_compact"] = ann_stats
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--days", type=int, default=3)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--retrain-above", type=float, default=None,
                    help="mean batch recon_error that triggers a retrain")
    ap.add_argument("--takedown", type=int, nargs="*", default=None,
                    help="doc ids to remove from both indexes at the end")
    args = ap.parse_args()
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    run_days(spark, args.out, args.days, args.dim,
             retrain_above=args.retrain_above, takedown=args.takedown)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
