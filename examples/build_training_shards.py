"""Corpus → training shards: the last mile of a pre-training data
pipeline, composed entirely from ``impuls_spark`` operators. Picks up
where ``examples/clean_corpus.py`` stops (a curated document set) and
produces what a training job actually mounts:

1. **token counting** — scan-stage whitespace + BPE-ish regex counts
   (``llm.text.token_counts``); the regex count drives the packing
   budget;
2. **sequence packing** — per-language contiguous packing into
   ``--budget``-token bins (``llm.packing.pack_sequences``): each doc
   gets (bin, offset), the loader's addressing scheme, with overflow
   docs flagged;
3. **epoch order** — a deterministic global permutation
   (``llm.sampling.training_order``): hash-rank, no global sort;
   re-salt per epoch for a fresh shuffle that replays identically on
   any cluster size;
4. **sharded layout** — deterministic hash shards on disk
   (``sources.corpus.write_training_shards``): shard membership and
   in-file order are pure functions of doc_id, so a re-run (or an
   append) lands byte-identically;
5. **manifest** — per-shard doc counts, token weight and id ranges
   (``llm.sampling.shard_manifest``), the completeness/balance
   bookkeeping a loader checks before an epoch starts.

Every stage is deterministic: running this twice — or on a 1000-node
cluster vs this laptop — produces the same shards, the same packing,
and the same epoch order.

Run:

    python -m examples.build_training_shards --in /root/testdata/sf0.001 \\
        --out /tmp/shards [--budget 2048] [--shards 16] [--epoch 0]
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from impuls_spark.llm.packing import pack_sequences
from impuls_spark.llm.sampling import shard_manifest, training_order
from impuls_spark.llm.text import token_counts
from impuls_spark.sources.corpus import write_training_shards


def build(spark: SparkSession, in_dir: str, out_dir: str,
          budget: int = 2048, n_shards: int = 16, epoch: int = 0) -> dict:
    docs = spark.read.parquet(os.path.join(in_dir, "documents.parquet"))

    counted = docs.join(token_counts(docs), "doc_id")
    packed = pack_sequences(
        counted, token_budget=budget, shard_col="lang",
        tokens_col="n_re_tokens",
    )
    order = training_order(docs, salt=f"order:{epoch}")

    enriched = (
        docs.join(packed.select("doc_id", "bin_ix", "offset", "n_tokens",
                                "overflow"), "doc_id")
        .join(order.withColumnRenamed("position", "epoch_position"),
              "doc_id")
    )
    write_training_shards(
        enriched, os.path.join(out_dir, "shards"), n_shards=n_shards
    )
    manifest = shard_manifest(
        enriched, n_shards=n_shards, weight_col="n_tokens"
    )
    manifest.coalesce(1).write.mode("overwrite").json(
        os.path.join(out_dir, "manifest")
    )

    stats = {
        "n_docs": enriched.count(),
        "n_tokens": enriched.agg(F.sum("n_tokens")).collect()[0][0],
        "n_bins": packed.select("shard", "bin_ix").distinct().count(),
        "n_overflow": packed.filter("overflow").count(),
        "n_shards": n_shards,
        "epoch": epoch,
    }
    return stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", dest="out_dir", default="/tmp/shards")
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--shards", type=int, default=16,
                    help="one of 16/256/4096 (md5-prefix shard digits)")
    ap.add_argument("--epoch", type=int, default=0)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    stats = build(spark, args.in_dir, args.out_dir,
                  args.budget, args.shards, args.epoch)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    main()
