"""Compliance takedown across the WHOLE data estate (VERDICT r10
item 1): a licensing/right-to-be-forgotten request is only honored
when the text is gone from EVERY artifact that carries it, not just
the indexes. This example owns that composition:

1. **training shards** (``sources.remove_from_shards``) — the packed
   copies a training run actually reads; the shard hash law locates
   exactly the directories holding the removed ids, only those are
   rewritten, untouched shards stay byte-identical;
2. **corpus** (``sources.remove_from_corpus``) — the at-rest source of
   truth; partition-pruned rewrite, emptied partition dirs deleted;
3. **dedup index** (``DedupIndex.remove``) — tracked ``__id``
   provenance rows anti-joined out under one root marker, so the
   removed content classifies ``novel`` again (re-acceptable) while
   hash/band rows shared with survivors stay;
4. **ANN index** (``AnnIndex.remove``) — cells and PQ codes purged by
   vector id under one root marker, so the removed vectors stop
   surfacing as neighbors.

The DATA copies (shards, corpus) go first and the INDEXES last: while
the text is still being scrubbed, the indexes keep classifying it as
a duplicate, so a concurrent ingest cannot re-accept the very content
being removed; once the copies are gone, dropping the index rows makes
the content legitimately novel again. Every step is individually
marker-guarded and idempotent, so a crash anywhere fail-fasts that
artifact's readers and a ``force=True`` re-run of the pipeline
converges.

``verify_takedown`` is the audit: it asserts the removed ids are
absent from all four artifacts (and that the removed TEXT classifies
novel), returning the per-artifact evidence a compliance log wants.

Run:

    python -m examples.takedown_pipeline --out /tmp/estate \
        --takedown 3 7 11
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impuls_spark.llm import AnnIndex, DedupIndex
from impuls_spark.sources import (
    read_corpus,
    read_training_shards,
    remove_from_corpus,
    remove_from_shards,
    write_corpus,
    write_training_shards,
)


def _spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[4]")
        .appName("takedown_pipeline")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def build_estate(
    spark: SparkSession,
    out: str,
    docs: DataFrame,
    embeddings: DataFrame,
    dim: int,
    n_shards: int = 16,
) -> dict:
    """Materialize the four artifacts a takedown must reach: corpus,
    training shards, tracked dedup index, saved ANN index. ``docs``
    carries (doc_id, text, lang); ``embeddings`` (vec_id, embedding)
    keyed by the same ids."""
    write_corpus(docs, f"{out}/corpus", partition_by=("lang",))
    write_training_shards(docs, f"{out}/shards", n_shards=n_shards)
    DedupIndex.build(docs, f"{out}/dedup_idx", track_ids=True)
    anchors = embeddings.orderBy("vec_id").limit(4)
    AnnIndex.build(
        embeddings, anchors, dim=dim, m=4, pq_k=4
    ).save(f"{out}/ann_idx")
    return {
        "corpus_rows": read_corpus(spark, f"{out}/corpus").count(),
        "shard_rows": read_training_shards(spark, f"{out}/shards").count(),
    }


def takedown(
    spark: SparkSession, out: str, ids: list, force: bool = False
) -> dict:
    """Remove ``ids`` from every artifact, data copies before indexes
    (see module docstring for why). Idempotent; re-run with
    ``force=True`` after any crash."""
    report = {}
    report["shards"] = remove_from_shards(
        spark, f"{out}/shards", ids, force=force
    )
    report["corpus"] = remove_from_corpus(
        spark, f"{out}/corpus", ids, force=force
    )
    report["dedup_index"] = DedupIndex.load(
        spark, f"{out}/dedup_idx", force=force
    ).remove(ids, force=force)
    report["ann_index"] = AnnIndex.remove(
        spark, f"{out}/ann_idx", ids, force=force
    )
    return report


def verify_takedown(
    spark: SparkSession, out: str, ids: list, removed_texts: list
) -> dict:
    """The compliance audit: removed ids absent from corpus, shards,
    both dedup artifacts' provenance and both ANN artifacts; removed
    TEXT classifies novel (re-acceptable). Raises AssertionError with
    the failing artifact named; returns the evidence counts."""
    sids = [str(i) for i in ids]
    ev = {}
    ev["corpus_hits"] = (
        read_corpus(spark, f"{out}/corpus")
        .filter(F.col("doc_id").cast("string").isin(sids)).count()
    )
    ev["shard_hits"] = (
        read_training_shards(spark, f"{out}/shards")
        .filter(F.col("doc_id").cast("string").isin(sids)).count()
    )
    ev["dedup_hash_hits"] = (
        spark.read.parquet(f"{out}/dedup_idx/hashes")
        .filter(F.col("__id").isin(sids)).count()
    )
    ev["dedup_band_hits"] = (
        spark.read.parquet(f"{out}/dedup_idx/bands")
        .filter(F.col("__id").isin(sids)).count()
    )
    ev["ann_cell_hits"] = (
        spark.read.parquet(f"{out}/ann_idx/cells")
        .filter(F.col("vec_id").cast("string").isin(sids)).count()
    )
    ev["ann_code_hits"] = (
        spark.read.parquet(f"{out}/ann_idx/pq_codes")
        .filter(F.col("vec_id").cast("string").isin(sids)).count()
    )
    for artifact, hits in ev.items():
        assert hits == 0, f"takedown incomplete: {artifact}={hits}"
    if removed_texts:
        probe = spark.createDataFrame(
            [(-(i + 1), t) for i, t in enumerate(removed_texts)],
            "doc_id long, text string",
        )
        idx = DedupIndex.load(spark, f"{out}/dedup_idx")
        statuses = {r["status"] for r in idx.classify(probe).collect()}
        ev["removed_text_status"] = sorted(statuses)
        assert statuses <= {"novel"}, (
            "removed text still classifies as duplicate: a copy "
            f"survives somewhere ({statuses})"
        )
    return ev


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--docs", type=int, default=60)
    ap.add_argument("--takedown", type=int, nargs="+", required=True)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    from impuls_spark.llm.embed import embed_texts

    # per-doc-unique tokens: the audit's "removed text classifies
    # novel" bar is only meaningful when no SURVIVOR legitimately
    # shares shingles with the removed docs (shared buckets survive
    # through the survivor's own rows, by design)
    docs = spark.createDataFrame(
        [(i, f"document body {i} " + " ".join(
            f"w{i}x{j}" for j in range(10)),
          ["en", "de", "fr"][i % 3])
         for i in range(args.docs)],
        "doc_id long, text string, lang string",
    )
    emb = embed_texts(docs, text_col="text", id_col="doc_id", dim=16)
    emb = emb.select(F.col("doc_id").alias("vec_id"), "embedding")
    print("estate:", build_estate(spark, args.out, docs, emb, dim=16))
    removed_texts = [
        r["text"] for r in docs.filter(
            F.col("doc_id").isin(args.takedown)).collect()
    ]
    print("takedown:", takedown(spark, args.out, args.takedown,
                                force=args.force))
    print("audit:", verify_takedown(spark, args.out, args.takedown,
                                    removed_texts))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
