"""Stream-static enrichment: join an unbounded stream against a slowly
changing dimension, then aggregate per window.

Part of the beyond-reference streaming surface (the reference engine is
batch-only, SURVEY §2.3). The canonical ingest shape for a training-data
pipeline: an event/document stream tagged with dimension attributes
(tenant, segment, license tier) before windowed accounting.

Scale notes: Spark re-reads a *static* join side per micro-batch, so
the dimension is explicitly broadcast — state stays bounded by the
watermark and the join never shuffles the stream. A dimension too big
to broadcast should become a stream-stream join with its own watermark
instead (different operator, different state story).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enriched_window_stats(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    attrs: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Left-join ``dim`` (small, broadcast) onto ``stream`` by ``on``,
    then count/sum ``value_col`` per (window, *attrs*). Events without
    a dimension row keep NULL attrs — accounting must not drop them.

    Accepts a streaming or batch frame (same plan either way), so the
    batch twin is oracle-checkable.
    """
    df = stream
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    joined = df.join(F.broadcast(dim), on=on, how="left")
    return (
        joined.groupBy(F.window(ts_col, window).alias("win"), *attrs)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            *attrs,
            "n",
            "total_value",
        )
    )
