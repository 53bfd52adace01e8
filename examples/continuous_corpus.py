"""The continuous-corpus composition: BOTH streaming ingests plus the
coordinated maintenance that keeps them lawful.

``daily_ingest`` owns the BATCH day-N story; this example owns the
STREAMING one — the shape a crawler-fed training corpus actually runs:

1. documents stream through ``ingest_with_dedup`` — novel text lands
   epoch-partitioned in the corpus, hash/band sidecars accrete;
2. the accepted documents of the COMMITTED epochs are embedded
   (``embed_texts`` — the deterministic stub encoder; swap for a real
   model via its ``encoder=`` hook) and stream through
   ``ingest_vectors`` onto a saved ANN index — cells/codes accrete in
   the index's own stream sidecars;
3. serving reads both accreted views without stopping anything:
   ``DedupIndex.from_stream_index`` for classify,
   ``AnnIndex.from_stream_index`` for topk;
4. a compliance takedown runs COMPOSED across both streams (stop the
   queries first — both runs prove it from their checkpoints'
   watermarks): ``takedown_stream_corpus`` scrubs the text estate
   (partition-pruned corpus filter + flat tracked index rebuild), then
   ``takedown_stream_vectors`` scrubs the vector estate
   (``absorb_stream`` folds the ANN sidecars into the flat artifacts,
   then ``AnnIndex.remove`` purges the ids) — data copies before
   indexes, exactly like the batch ``examples.takedown_pipeline``. The
   fences make the wrong order an error, not a corruption:
   retrain/remove/append refuse while un-absorbed stream epochs
   exist, and ingest batches fail fast while a maintenance marker is
   up. The closing audit asserts the victim is absent from the
   corpus, the dedup provenance, the flat ANN artifacts AND the
   (now-folded) stream sidecars.

Run:

    python -m examples.continuous_corpus --out /tmp/cc
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from impuls_spark.llm import AnnIndex, DedupIndex
from impuls_spark.llm.embed import embed_texts
from impuls_spark.streaming import (
    ingest_vectors,
    ingest_with_dedup,
    stream_epochs,
    takedown_stream_corpus,
    takedown_stream_vectors,
)

DIM = 16


def _spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[4]")
        .appName("continuous_corpus")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _drain(query) -> None:
    try:
        query.processAllAvailable()
    finally:
        query.stop()
        query.awaitTermination(30)


def run(spark: SparkSession, out: str, batches: "list[list[tuple]]") -> dict:
    """Drive the full composition over ``batches`` of (doc_id, text,
    lang) rows; returns the evidence counts a test asserts on."""
    schema = "doc_id long, text string, lang string"
    src = f"{out}/src"
    corpus, ckpt_docs = f"{out}/corpus", f"{out}/ckpt_docs"
    ann, ckpt_vecs = f"{out}/ann_idx", f"{out}/ckpt_vecs"

    # -- 1. document stream: classify-and-land ------------------------
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).write.mode(
            "overwrite"
        ).parquet(f"{src}/b{i}")
    docs_stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .option("maxFilesPerTrigger", 1).parquet(src + "/*")
    )
    _drain(ingest_with_dedup(docs_stream, corpus, ckpt_docs))
    accepted = spark.read.parquet(corpus)

    # -- 2. embed the accepted docs, stream them onto the ANN index ---
    emb = embed_texts(
        accepted.select("doc_id", "text"), dim=DIM
    ).select(F.col("doc_id").alias("vec_id"), "embedding")
    seed = emb.orderBy("vec_id").limit(4)
    AnnIndex.build(seed, seed, dim=DIM, m=4, pq_k=4).save(ann)
    emb.write.mode("overwrite").parquet(f"{out}/emb_feed/b0")
    vec_stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(f"{out}/emb_feed/*")
    )
    _drain(ingest_vectors(vec_stream, ann, ckpt_vecs))

    # -- 3. serve both accreted views ---------------------------------
    dedup_view = DedupIndex.from_stream_index(spark, corpus)
    probe = spark.createDataFrame(
        [(-1, batches[0][0][1], "en")], schema
    )
    statuses = {r["status"] for r in dedup_view.classify(probe).collect()}
    ann_view = AnnIndex.from_stream_index(spark, ann, emb)
    n_hits = ann_view.topk_refined(emb.limit(1), k=3).count()

    # -- 4. compliance takedown composed across BOTH streams -----------
    # data copy first (corpus filter + tracked index rebuild), then the
    # vector estate (absorb -> purge); each run watermark-proved from
    # its own checkpoint, each marker-guarded and idempotent
    n_before = accepted.count()
    victim = accepted.agg(F.max("doc_id")).collect()[0][0]
    corpus_report = takedown_stream_corpus(
        spark, corpus, [victim], checkpoint=ckpt_docs
    )
    vec_report = takedown_stream_vectors(
        spark, ann, [victim], checkpoint=ckpt_vecs
    )

    # -- 5. the absence audit: no artifact still carries the victim ----
    audit = {
        "corpus_hits": spark.read.parquet(corpus)
        .filter(F.col("doc_id") == victim).count(),
        "dedup_provenance_hits": spark.read.parquet(f"{corpus}/_index/hashes")
        .filter(F.col("__id") == str(victim)).count(),
        "ann_cell_hits": spark.read.parquet(f"{ann}/cells")
        .filter(F.col("vec_id") == victim).count(),
        "ann_code_hits": spark.read.parquet(f"{ann}/pq_codes")
        .filter(F.col("vec_id") == victim).count(),
        "ann_stream_epochs_left": len(stream_epochs(spark, ann)),
    }
    assert all(v == 0 for v in audit.values()), audit
    left = {
        r["vec_id"]
        for r in spark.read.parquet(f"{ann}/cells").collect()
    }
    return {
        "corpus_rows": n_before,
        "recrawl_status": sorted(statuses),
        "ann_hits": n_hits,
        "corpus_takedown": corpus_report,
        "vector_takedown": vec_report,
        "audit": audit,
        "victim_gone": victim not in left,
        "survivors": len(left),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    batches = [
        [(i, f"document body {i} " + " ".join(
            f"w{i}x{j}" for j in range(8)), "en") for i in range(10)],
        [(i, f"document body {i} " + " ".join(
            f"w{i}x{j}" for j in range(8)), "en") for i in range(8, 16)],
    ]
    print(run(spark, args.out, batches))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
