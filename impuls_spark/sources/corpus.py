"""Hive-partitioned parquet corpus layout — the at-rest format a
100 TB corpus actually lives in.

Beyond-reference surface. The layout IS the optimization: a corpus
partitioned by (lang, source) turns every per-language or per-source
query into a partition-PRUNED scan (the directory tree is the index),
and sorting within files by the dedup/join key gives parquet row-group
min/max statistics their bite. Both effects show up in
``explain("formatted")`` as ``PartitionFilters`` and smaller
``ReadSchema`` scans — see ``tests/test_corpus_layout.py``.

Writer rules:

- ``partition_by`` columns should be LOW cardinality (lang, source,
  date-bucket — not doc_id): each distinct combination is a directory,
  and a high-cardinality partition key shatters the corpus into
  millions of tiny files.
- ``target_shards`` bounds files per partition: the writer
  repartitions by the partition columns (plus a salt when shards > 1)
  so one task owns one output file, instead of every task writing a
  sliver of every partition (the small-files explosion).
- ``sort_by`` orders rows WITHIN each file (``sortWithinPartitions``
  after the repartition — a local sort, no extra shuffle), feeding
  row-group statistics for range-predicate skipping on keys like
  doc_id or quality score.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = ("lang",),
    sort_by: Sequence[str] = ("doc_id",),
    target_shards: int = 1,
    mode: str = "overwrite",
    dynamic_overwrite: bool = False,
) -> None:
    """Write ``df`` as a hive-partitioned parquet corpus at ``path``.

    ``mode="append"`` adds new files without touching existing ones —
    the micro-batch sink path (see ``streaming.sinks``).
    ``dynamic_overwrite`` switches ``mode="overwrite"`` from truncating
    the whole root to replacing ONLY the partitions present in ``df``
    (Spark's dynamic partitionOverwriteMode) — the idempotent-replay
    primitive the streaming sink builds on."""
    parts = [F.col(c) for c in partition_by]
    salt = F.pmod(
        F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                      for c in sort_by or partition_by])),
        F.lit(max(target_shards, 1)),
    )
    # two subtleties make this shape load-bearing:
    # 1. the task-local sort LEADS with the partition columns — when a
    #    task holds several hive partitions, FileFormatWriter re-sorts
    #    rows by the partition expression with an UNSTABLE sort, so the
    #    incoming order must already satisfy it or per-file ``sort_by``
    #    order is destroyed;
    # 2. the shard salt is in the REPARTITION only, never the sort: it
    #    spreads one partition's rows over ~target_shards tasks (files),
    #    but two shard groups hash-colliding into one task must still
    #    form a single sorted run in the one file that task writes.
    out = (
        df.withColumn("__shard", salt)
        .repartition(*parts, F.col("__shard"))
        .drop("__shard")
        .sortWithinPartitions(*partition_by, *[F.col(c) for c in sort_by])
    )
    writer = out.write.mode(mode)
    if dynamic_overwrite:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.partitionBy(*partition_by).parquet(path)


def read_corpus(
    spark: SparkSession,
    path: str,
    **equals,
) -> DataFrame:
    """Read a corpus written by :func:`write_corpus`; keyword args are
    partition-column equality filters applied BEFORE the scan plans, so
    Catalyst prunes the untouched directories entirely (verify with
    ``PartitionFilters`` in the explain output).

    The streaming sink's idempotent mode adds an ``__epoch``
    bookkeeping partition level (``streaming.sinks.EPOCH_COL``); it is
    dropped here so batch readers see one schema either way."""
    df = spark.read.parquet(path)
    for col, val in equals.items():
        df = df.filter(F.col(col) == val)
    if "__epoch" in df.columns:
        df = df.drop("__epoch")
    return df


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 256,
    key_col: str = "doc_id",
    salt: str = "shard",
    files_per_shard: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write the corpus as deterministic hash shards — the training-set
    "global shuffle" realized as a layout, not an operation.

    Each row's shard is its md5-prefix bucket
    (:func:`impuls_spark.llm.sampling.shard_assignment`), and rows
    within each file are ordered by the full digest (kept as the
    ``shuffle_key`` column), so document order in the training stream is
    decorrelated from crawl/ingest order without any global sort: one
    hash projection, one repartition keyed on (shard, file-salt), and a
    task-local sort. Re-running the writer on the same corpus produces
    byte-identical shard membership and order on any cluster size —
    and an APPENDED batch lands interleaved by the same law, never
    "new data at the end of the epoch".

    ``files_per_shard`` spreads one shard over several tasks/files for
    write parallelism; a loader that needs the shard's total order
    merges its files by ``shuffle_key`` (each file is a sorted run —
    the salt rides only the repartition, as in :func:`write_corpus`).
    Pair with :func:`impuls_spark.llm.sampling.shard_manifest` for the
    balance/completeness bookkeeping.
    """
    from ..llm.sampling import _SHARD_DIGITS

    if n_shards not in _SHARD_DIGITS:
        raise ValueError(
            f"n_shards must be one of {sorted(_SHARD_DIGITS)}, got {n_shards}"
        )
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string")))
    file_salt = F.pmod(F.crc32(F.col("shuffle_key")),
                       F.lit(max(files_per_shard, 1)))
    out = (
        df.withColumn("shuffle_key", h)
        .withColumn("shard", F.substring(h, 1, _SHARD_DIGITS[n_shards]))
        .repartition(F.col("shard"), file_salt)
        .sortWithinPartitions("shard", "shuffle_key")
    )
    out.write.mode(mode).partitionBy("shard").parquet(path)


def read_training_shards(
    spark: SparkSession, path: str, shard: "str | None" = None
) -> DataFrame:
    """Read a shard layout written by :func:`write_training_shards`;
    passing ``shard`` prunes to one shard directory (a loader rank
    reading its slice). Within-shard total order is restored by sorting
    the (one-shard-sized) slice on ``shuffle_key`` — or merge the
    per-file sorted runs streamingly outside Spark."""
    df = spark.read.parquet(path)
    if shard is not None:
        df = df.filter(F.col("shard") == shard)
    return df
