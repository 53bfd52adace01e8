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


def prepare_training_set(
    docs: DataFrame,
    eval_df: DataFrame,
    alpha: float = 0.5,
    split_weights: dict[str, float] | None = None,
    budget_per_source: int | None = None,
    token_budget: int = 2048,
) -> dict[str, DataFrame]:
    """The round-trip from a CLEANED corpus to training-ready shards —
    the second half of the pipeline, composed from the round-4
    operators. Returns a dict of DataFrames:

    - ``documents``: decontaminated, mixture-balanced, split-labeled,
      budget-capped corpus with token counts;
    - ``mixture``: the per-source temperature mixture that was applied;
    - ``leakage``: near-dup pairs crossing the train/eval boundary
      (should be empty after decontamination — kept as the audit);
    - ``packed``: per-split contiguous token-bin assignments.

    Stage order mirrors production pipelines: decontaminate before
    splitting (a leaked eval twin must not even get a split label),
    balance before budget-capping (the cap sees the final mixture).
    """
    from impuls_spark.llm import (
        hash_split,
        lsh_candidate_pairs,
        mixture_rates,
        pack_sequences,
        select_by_budget,
    )
    from impuls_spark.llm.curation import (
        cross_split_contamination,
        decontaminate,
    )
    from impuls_spark.llm.sampling import hash_stratified_sample

    # 1. benchmark decontamination — broadcast eval n-grams, drop hits
    hits = decontaminate(docs, eval_df, min_overlap=3)
    docs = docs.join(hits.select("doc_id"), "doc_id", "left_anti")

    # 2. temperature mixture over sources: compute the dimension-sized
    # rate table, then realize it with the deterministic hash sampler
    mix = mixture_rates(docs, alpha=alpha, strata_col="source")
    rate_map = {r["source"]: r["rate"] for r in mix.collect()}  # dim-sized
    docs = hash_stratified_sample(
        docs, rates=rate_map, strata_col="source", default_rate=1.0,
        salt="mixture",
    )

    # 3. per-source budget cap (optional): hash-ranked prefix per source
    if budget_per_source is not None:
        docs = select_by_budget(
            docs, budget=budget_per_source, weight_col="n_chars",
            strata_col="source",
        )

    # 4. split labeling — scan-stage CASE, stable under appends
    docs = hash_split(docs, weights=split_weights)

    # 5. leakage audit: near-dup pairs straddling train/eval (the
    # decontamination step should leave this empty for text twins)
    pairs = lsh_candidate_pairs(docs)
    leakage = cross_split_contamination(
        docs.select("doc_id"), pairs, weights=split_weights
    )

    # 6. token counts + per-(split, lang) contiguous packing
    from impuls_spark.llm import token_counts as _tc

    docs = docs.join(
        _tc(docs).select("doc_id", F.col("n_ws_tokens").alias("n_tokens")),
        "doc_id",
    )
    packed = pack_sequences(
        docs.withColumn("shard", F.concat_ws("/", "split", "lang")),
        token_budget=token_budget,
        shard_col="shard",
    )
    return {
        "documents": docs,
        "mixture": mix,
        "leakage": leakage,
        "packed": packed,
    }


def ingest_batch(
    spark: SparkSession,
    batch_path: str,
    corpus: DataFrame,
    max_dup_word_frac: float = 0.5,
    max_top_word_frac: float = 0.3,
) -> dict[str, DataFrame]:
    """The continuous-ingest front door — the third pipeline half, for
    a corpus that GROWS: each arriving batch of JSONL shards is
    quarantined, deduplicated against everything already accepted, and
    repetition-gated before any accepted row exists.

    Returns:

    - ``accepted``: novel, non-degenerate documents to append;
    - ``status``: every batch doc labeled exact/near/novel (the
      acceptance ledger);
    - ``quarantine``: raw lines that failed to parse (audit/repair);
    - ``rejected_repetitive``: novel docs dropped by the Gopher-style
      repetition gate.

    Stage order: parse-quarantine first (free — same scan), dedup
    second (semi-joins against corpus-sized hash/band sets), the
    scan-stage repetition gate last so it only scores survivors.
    """
    from impuls_spark.llm import incremental_dedup, repetition_rates
    from impuls_spark.sources import read_jsonl

    good, quarantine = read_jsonl(spark, batch_path)
    status = incremental_dedup(good, corpus)
    novel = good.join(
        status.filter(F.col("status") == "novel").select("doc_id"),
        "doc_id", "left_semi",
    )
    rep = repetition_rates(novel)
    ok_ids = rep.filter(
        (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("top_word_frac") <= max_top_word_frac)
    ).select("doc_id")
    accepted = novel.join(ok_ids, "doc_id", "left_semi")
    rejected = novel.join(ok_ids, "doc_id", "left_anti")
    return {
        "accepted": accepted,
        "status": status,
        "quarantine": quarantine,
        "rejected_repetitive": rejected,
    }


def emit_training_shards(
    docs: DataFrame,
    out_dir: str,
    n_merges: int = 500,
    seq_len: int = 2048,
    n_shards: int = 256,
    shard_col: str = "lang",
) -> DataFrame:
    """The final pipeline half: cleaned corpus → tokenizer → training
    rows → deterministic shards on disk. Returns the shard manifest
    (the balance/completeness record the loader checks).

    Composition of the round-5 operators, in the order a production
    run uses them:

    1. :func:`impuls_spark.llm.bpe_train` — one distributed word count,
       then the driver-side merge loop (the tokenizer artifact);
    2. :func:`impuls_spark.llm.bpe_encode` — Arrow-batched, zero-shuffle
       application back over the corpus;
    3. :func:`impuls_spark.llm.packing.chunk_token_stream` — the
       GPT-style fixed-length re-cut, crossing document boundaries;
    4. :func:`impuls_spark.sources.write_training_shards` — hash-law
       shard layout (reproducible global shuffle);
    5. :func:`impuls_spark.llm.shard_manifest` over the written rows.
    """
    from impuls_spark.llm import bpe_encode, bpe_train, shard_manifest
    from impuls_spark.llm.packing import chunk_token_stream
    from impuls_spark.sources import write_training_shards

    merges = bpe_train(docs, n_merges=n_merges)
    encoded = bpe_encode(docs, merges).join(
        docs.select("doc_id", shard_col), "doc_id"
    )
    rows = chunk_token_stream(
        encoded, seq_len=seq_len, shard_col=shard_col,
        id_col="doc_id", tokens_col="bpe_tokens",
    )
    # training rows get a synthetic stable id: shard stream × position
    rows = rows.withColumn(
        "row_id", F.concat_ws(":", "shard", F.col("seq_ix").cast("string"))
    )
    write_training_shards(rows, out_dir, n_shards=n_shards, key_col="row_id")
    return shard_manifest(
        rows, n_shards=n_shards, key_col="row_id", weight_col="n_tokens"
    )
