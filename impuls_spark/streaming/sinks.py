"""Streaming sink into the hive-partitioned corpus layout.

The write side of a continuous-ingest pipeline: accepted documents
stream in, each micro-batch lands as appended parquet files under the
same partition tree batch queries read (``sources.corpus``), so the
corpus a training job scans is always the corpus ingest has committed.

Delivery semantics — two modes, the choice is explicit:

- ``idempotent=False`` (plain append): ``foreachBatch`` is
  at-least-once across query restarts — a re-run epoch re-appends its
  files. Keep ingest idempotent UPSTREAM
  (``dedup_stream_within_watermark`` / ``incremental_dedup``) if you
  use this mode.
- ``idempotent=True``: each batch is written under an
  ``__epoch=<epoch_id>`` hive partition with DYNAMIC partition
  overwrite, the standard exactly-once-at-rest recipe for foreachBatch:
  a replayed epoch (same checkpointed offsets, hence the same rows)
  replaces its own partition directories instead of appending next to
  them, and a crash mid-write is cleaned up by the replay's overwrite.
  Readers see no difference — ``read_corpus`` drops the bookkeeping
  column — and per-(epoch, lang) directories stay partition-prunable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.corpus import write_corpus

EPOCH_COL = "__epoch"


def make_corpus_batch_writer(
    path: str,
    partition_by: Sequence[str] = ("lang",),
    sort_by: Sequence[str] = ("doc_id",),
    target_shards: int = 1,
    idempotent: bool = False,
):
    """The ``foreachBatch`` function :func:`stream_to_corpus` installs,
    exposed so the replay contract is directly testable: calling the
    idempotent writer twice with the same ``epoch_id`` must leave
    exactly one copy of the batch on disk."""

    if idempotent:
        def _write(batch: DataFrame, epoch_id: int) -> None:
            write_corpus(
                batch.withColumn(EPOCH_COL, F.lit(int(epoch_id))), path,
                partition_by=(EPOCH_COL, *partition_by), sort_by=sort_by,
                target_shards=target_shards, mode="overwrite",
                dynamic_overwrite=True,
            )
    else:
        def _write(batch: DataFrame, epoch_id: int) -> None:
            write_corpus(
                batch, path,
                partition_by=partition_by, sort_by=sort_by,
                target_shards=target_shards, mode="append",
            )

    return _write


def stream_to_corpus(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: Sequence[str] = ("lang",),
    sort_by: Sequence[str] = ("doc_id",),
    target_shards: int = 1,
    idempotent: bool = False,
):
    """Start a foreachBatch query writing each micro-batch to the
    partitioned corpus at ``path``. Returns the StreamingQuery; callers
    own its lifecycle (``processAllAvailable``/``stop``). See the
    module docstring for the ``idempotent`` delivery contract."""

    return (
        stream.writeStream.foreachBatch(
            make_corpus_batch_writer(
                path, partition_by, sort_by, target_shards, idempotent
            )
        )
        .option("checkpointLocation", checkpoint)
        .start()
    )
