"""Streaming deduplication — the ingestion-side twin of the batch
dedup operators in ``impuls_spark.llm.dedup``.

A crawler/ingest stream re-delivers documents (retries, re-crawls,
at-least-once sources); deduplicating at ingestion keeps every
downstream consumer exactly-once. Two state regimes:

- :func:`dedup_stream` — unbounded exact dedup by content key
  (``dropDuplicates``): state grows with the distinct-key count;
  right when the key space is bounded (entity ids).
- :func:`dedup_stream_within_watermark` — watermarked dedup
  (``dropDuplicatesWithinWatermark``): state is evicted once the
  event-time watermark passes, so memory is bounded by the duplicate
  *horizon* (e.g. "retries arrive within 1 hour"), independent of
  stream length — the only regime that survives an unbounded crawl.

Both run the identical plan on a batch frame (Spark unifies the
APIs), so finite-input parity tests cover the streaming logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_key(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Annotate rows with the md5 content hash used as the dedup key."""
    return df.withColumn("content_hash", F.md5(F.col(text_col)))


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Exact-dedup a stream (or batch frame) on ``key_cols``
    (default: the md5 of ``text_col``). Unbounded state — prefer
    :func:`dedup_stream_within_watermark` on long-running streams."""
    if key_cols is None:
        events = content_key(events, text_col)
        key_cols = ["content_hash"]
    return events.dropDuplicates(key_cols)


def dedup_stream_within_watermark(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    key_cols: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Watermarked streaming dedup: a duplicate arriving within
    ``watermark`` of the original's event time is dropped; state for
    keys older than the watermark is evicted. On a batch frame falls
    back to plain ``dropDuplicates`` (a finite frame has no notion of
    state eviction — every duplicate is "within" the horizon)."""
    if key_cols is None:
        events = content_key(events, text_col)
        key_cols = ["content_hash"]
    if events.isStreaming:
        return events.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(key_cols)
    return events.dropDuplicates(key_cols)


def dedup_stream_vs_corpus(
    stream: DataFrame,
    corpus_hashes: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Drop stream rows whose text already exists in the ACCEPTED
    corpus: a stream-static LEFT ANTI join against the corpus's
    content-hash table (one md5 column — the maintained table
    :func:`impuls_spark.llm.incremental_dedup` also consumes).

    The streaming half of the ingest dedup story:
    ``dedup_stream_within_watermark`` removes re-deliveries WITHIN the
    stream (bounded state), this removes re-crawls of content accepted
    in any PREVIOUS run (no state at all — the static side is re-read
    per micro-batch, so refreshing the hash table on disk takes effect
    without restarting the query). Works identically on batch frames.

    Scale note: inside a CONTINUOUS streaming plan the stream side can
    never be a broadcast build side, so once ``corpus_hashes`` outgrows
    the broadcast threshold this join exchanges it every micro-batch.
    At that size run the ingest through ``ingest_with_dedup`` instead —
    its ``foreachBatch`` body uses the micro-batch join mode
    (``incremental_dedup(broadcast_new=True)``), which scans but never
    shuffles the index tables.
    """
    keyed = content_key(stream, text_col)
    return keyed.join(
        corpus_hashes.select(F.col(corpus_hashes.columns[0]).alias("content_hash")),
        "content_hash",
        "left_anti",
    ).drop("content_hash")
