"""Stream-stream interval join: correlate two unbounded event streams
per key within a bounded time interval.

The attribution primitive (purchase ← preceding click, alert ← earlier
deploy): Spark buffers both sides in state and the INTERVAL CONDITION is
what bounds that state — without the time bounds, a stream-stream join's
state grows forever. Both sides carry watermarks; rows older than
watermark + interval are evicted.

Part of the beyond-reference streaming surface (reference is
batch-only, SURVEY §2.3). Accepts batch frames identically, so the
batch twin is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Join ``left`` rows to ``right`` rows with the same ``on`` key
    where the right event happened in ``(left_ts - max_delay, left_ts]``
    — i.e. each left event is matched to the right events that PRECEDED
    it within the window (inner join; unmatched left rows drop).

    Column collisions are disambiguated by prefixing the right side's
    non-key columns with ``r_``. ``max_delay`` and the watermarks
    jointly bound the join state on streams; on batch frames the same
    plan is a plain range-predicate join.
    """
    l = left
    r = right
    if l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    r = r.select(
        F.col(on),
        *[F.col(c).alias(f"r_{c}") for c in r.columns if c != on],
    )
    rts = f"r_{right_ts}"
    cond = (
        (F.col(f"__{on}") == F.col(on))
        & (F.col(rts) <= F.col(left_ts))
        & (F.col(rts) > F.col(left_ts) - F.expr(f"INTERVAL {max_delay}"))
    )
    return (
        l.join(r.withColumnRenamed(on, f"__{on}"), cond, "inner")
        .drop(f"__{on}")
    )
