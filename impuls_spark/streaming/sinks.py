"""Streaming sink into the hive-partitioned corpus layout.

The write side of a continuous-ingest pipeline: accepted documents
stream in, each micro-batch lands as appended parquet files under the
same partition tree batch queries read (``sources.corpus``), so the
corpus a training job scans is always the corpus ingest has committed.

Delivery note: ``foreachBatch`` is at-least-once across query restarts
— a re-run epoch re-appends its files. Keep ingest idempotent UPSTREAM
(``dedup_stream_within_watermark`` / ``incremental_dedup``), or
partition by an epoch-derived column so replayed batches overwrite
their own directory. This module deliberately does not hide that
choice.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from ..sources.corpus import write_corpus


def stream_to_corpus(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: Sequence[str] = ("lang",),
    sort_by: Sequence[str] = ("doc_id",),
    target_shards: int = 1,
):
    """Start a foreachBatch query appending each micro-batch to the
    partitioned corpus at ``path``. Returns the StreamingQuery; callers
    own its lifecycle (``processAllAvailable``/``stop``)."""

    def _write(batch: DataFrame, epoch_id: int) -> None:
        write_corpus(
            batch, path,
            partition_by=partition_by, sort_by=sort_by,
            target_shards=target_shards, mode="append",
        )

    return (
        stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .start()
    )
