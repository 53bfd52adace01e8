"""End-to-end training-corpus curation: the pipeline a pre-training
data team runs over raw crawled documents, composed entirely from the
``impuls_spark.llm`` operators.

Stages (order matters — cheap scan-stage filters first, pair-generating
dedup last, so the expensive stages see the smallest corpus):

1. **quality gate** — scan-stage scoring (length, alpha ratio, stopword
   ratio); drops garbage before anything shuffles;
2. **exact dedup** — md5 hash-groupBy keep-first;
3. **near-dup removal** — MinHash-LSH candidate pairs → connected
   components → keep one canonical doc per cluster;
4. **stratified sampling** — deterministic per-language keep rates (the
   training-mixture knob), reproducible across runs and engines;
5. **stats** — token counts + vocabulary document frequency for the
   datasheet.

Run:

    python -m examples.clean_corpus --in /root/testdata/sf0.001 \\
        --out /tmp/clean_corpus [--en-rate 0.5]
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impuls_spark.llm import (
    apply_clusters,
    duplicate_clusters,
    exact_dedup,
    hash_stratified_sample,
    lsh_candidate_pairs,
    quality_scores,
    token_counts,
    vocabulary_df,
)


def clean_corpus(
    docs: DataFrame,
    min_quality: float = 0.3,
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Return (clean documents, vocabulary stats) for the input corpus."""
    # 1. quality gate — narrow filter, no shuffle
    q = quality_scores(docs).select("doc_id", "quality_score")
    docs = (
        docs.join(q, "doc_id")
        .filter(F.col("quality_score") >= min_quality)
        .drop("quality_score")
    )

    # 2. exact dedup — one hash shuffle
    docs = exact_dedup(docs)

    # 3. near-dup clusters — banded LSH pairs, transitive closure,
    # keep the canonical member of each cluster
    pairs = lsh_candidate_pairs(docs)
    clusters = duplicate_clusters(pairs)
    docs = apply_clusters(docs, clusters)

    # 4. training mixture — deterministic per-language rates
    if rates:
        docs = hash_stratified_sample(
            docs, rates=rates, strata_col="lang", default_rate=default_rate
        )

    # 5. datasheet stats over the *surviving* corpus
    stats = vocabulary_df(docs, top_n=100)
    docs = docs.join(token_counts(docs), "doc_id")
    return docs, stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_dir", required=True)
    ap.add_argument("--out", dest="out_dir", required=True)
    ap.add_argument("--en-rate", type=float, default=None,
                    help="downsample rate for 'en' (default: keep all)")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("clean_corpus")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(args.in_dir, "documents.parquet"))
    rates = {"en": args.en_rate} if args.en_rate is not None else None
    clean, stats = clean_corpus(docs, rates=rates)
    clean.write.mode("overwrite").parquet(os.path.join(args.out_dir, "documents"))
    stats.write.mode("overwrite").parquet(os.path.join(args.out_dir, "vocab"))
    n_in = docs.count()
    n_out = spark.read.parquet(os.path.join(args.out_dir, "documents")).count()
    print(json.dumps({"docs_in": n_in, "docs_out": n_out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
