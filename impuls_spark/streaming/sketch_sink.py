"""Streaming KMV sketch sidecar: per-epoch cardinality partials.

A continuously-ingesting corpus wants "distinct documents per source"
WITHOUT rescanning months of parquet per dashboard refresh. KMV
partials make that an O(groups · k) problem: each micro-batch sketches
itself (``llm.sketches.kmv_sketch``) and lands the one-row-per-group
partial under an ``__epoch=<id>`` partition — the same idempotent
dynamic-overwrite recipe as the corpus sink (``sinks.stream_to_corpus``)
and its ``_index`` sidecars, so a replayed epoch REPLACES its own
partial instead of double-counting. The read side merges all landed
partials with ``kmv_merge`` (exact, by the k-min union property) and
reads estimates off with ``kmv_estimate``; cost is epochs · groups · k
longs, never the corpus.

Replay/crash safety comes from two independent properties: the epoch
overwrite (a replay rewrites its directory wholesale) AND merge
idempotency (re-merging an already-merged partial is a no-op on the
k-min set) — either alone keeps the estimate exact.

Beyond-reference scope (SURVEY §2's training-data charter); the batch
twin is showcased as s09.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm.sketches import kmv_estimate, kmv_merge, kmv_sketch
from .sinks import EPOCH_COL

__all__ = [
    "make_kmv_batch_writer",
    "read_kmv_partials",
    "stream_kmv_partials",
]


def make_kmv_batch_writer(
    path: str,
    value_col: str,
    group_cols: Sequence[str],
    *,
    k: int = 64,
    salt: str = "kmv",
    salt_buckets: int = 32,
    target_shards: int = 1,
):
    """The ``foreachBatch`` function, exposed (like
    ``sinks.make_corpus_batch_writer``) so the replay contract is
    directly testable: calling it twice with the same ``epoch_id``
    must leave exactly one partial per shard for that epoch.

    ``target_shards`` bounds files per epoch: 1 (default) for the
    usual dimension-sized group sets; raise it when the group column
    is ROW-scale (per-URL/per-document sketches), where one shard
    would funnel groups × k rows through a single write task."""
    group_cols = list(group_cols)

    def _write(batch: DataFrame, epoch_id: int) -> None:
        sk = kmv_sketch(
            batch, value_col, group_cols,
            k=k, salt=salt, salt_buckets=salt_buckets,
        )
        (
            sk.withColumn(EPOCH_COL, F.lit(int(epoch_id)))
            .repartition(max(target_shards, 1), *group_cols)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(EPOCH_COL)
            .parquet(path)
        )

    return _write


def stream_kmv_partials(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    value_col: str,
    group_cols: Sequence[str],
    *,
    k: int = 64,
    salt: str = "kmv",
    salt_buckets: int = 32,
    target_shards: int = 1,
):
    """Start a foreachBatch query landing one KMV partial per
    micro-batch at ``path``. Returns the StreamingQuery; callers own
    its lifecycle (``processAllAvailable``/``stop``)."""
    writer = make_kmv_batch_writer(
        path, value_col, group_cols,
        k=k, salt=salt, salt_buckets=salt_buckets,
        target_shards=target_shards,
    )
    return (
        stream.writeStream.foreachBatch(writer)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_kmv_partials(
    spark: SparkSession,
    path: str,
    group_cols: Sequence[str],
    *,
    k: int = 64,
    group_schema: str | None = None,
) -> DataFrame:
    """Merge every landed partial into per-group estimates — the
    dashboard read path. ``kmv_merge`` treats the multi-row-per-group
    partial frame as the list of sketches it is; output matches
    ``kmv_distinct`` over everything ever ingested (exactly — not
    approximately — per the merge property).

    The read passes an EXPLICIT schema through the same hardened
    reader as the dedup index sidecars (``ingest._read_or_empty``,
    ADVICE r8): a dashboard polling before the first epoch lands
    (PATH_NOT_FOUND) or after an empty first micro-batch (a directory
    holding only ``_SUCCESS``, which wedges schema inference with
    UNABLE_TO_INFER_SCHEMA) reads as zero groups instead of raising.
    Group columns default to ``string``; pass ``group_schema`` (DDL,
    e.g. ``"source string, day date"``) when they aren't."""
    from .ingest import _read_or_empty

    group_cols = list(group_cols)
    if group_schema is None:
        group_schema = ", ".join(f"{c} string" for c in group_cols)
    schema = f"{group_schema}, kmv_hashes array<bigint>"
    # current_epoch=-1: foreachBatch epoch ids are non-negative, so no
    # landed partition is excluded — unlike the ingest index read, a
    # dashboard merge wants every committed epoch.
    partials = _read_or_empty(spark, path, schema, current_epoch=-1)
    partials = partials.select(*group_cols, "kmv_hashes")
    merged = kmv_merge([partials], group_cols, k=k)
    return kmv_estimate(merged, group_cols, k=k)
