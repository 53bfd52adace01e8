"""Streaming per-key quota — the ingestion-side twin of the batch
per-source cap (:func:`impuls_spark.llm.sampling.cap_per_group`).

A crawl stream must not let one domain flood a collection window; the
quota keeps at most ``n`` events per (key, window). Selection is
DETERMINISTIC — the ``n`` smallest ``md5(salt:id)`` values win, not
the first ``n`` to arrive — so replaying the stream, re-partitioning
it, or running the batch twin over the same rows keeps the identical
set, and the DuckDB oracle can verify the semantics exactly.

Determinism forces emit-at-window-close (an early row can be evicted
by a later, smaller hash), so the streaming side is a per-(window,
key) ``applyInPandasWithState`` whose state is the bounded top-``n``
hash heap — O(n) per key regardless of how many events the window
saw — flushed when the event-time watermark passes the window end.
The batch twin is one partitioned window: ``row_number() over
(partition by window, key order by hash) <= n``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "window_start string, user_id long, event_id long"
#: kept as parallel lists: (hashes, ids) of the current top-n
STATE_SCHEMA = "hashes array<string>, ids array<long>"


def _win_seconds(window: str) -> int:
    qty, unit = window.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    return int(qty) * mult


def stream_quota(
    events: DataFrame,
    n: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    salt: str = "quota",
) -> DataFrame:
    """(window_start, user_id, event_id) — the ≤ ``n`` events kept per
    (key, window), chosen by ascending ``md5(salt:id)`` with the id as
    tiebreak. See module docstring for the state/emission contract."""
    secs = _win_seconds(window)
    wstart = F.to_timestamp(
        F.from_unixtime(F.floor(F.unix_timestamp(F.col(ts_col)) / secs) * secs)
    )
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    keyed = events.select(
        wstart.alias("__w"),
        F.col(key_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        h.alias("__h"),
        F.col(ts_col).alias(ts_col),
    )

    if events.isStreaming:

        def on_stream(
            key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
        ) -> Iterator[pd.DataFrame]:
            wstart_ts, user = key
            if state.hasTimedOut:
                # watermark passed the window end: flush the winners
                if state.exists:
                    hashes, ids = state.get
                    order = sorted(range(len(hashes)),
                                   key=lambda i: (hashes[i], ids[i]))
                    out = pd.DataFrame(
                        [(str(wstart_ts), user, ids[i]) for i in order],
                        columns=["window_start", "user_id", "event_id"],
                    )
                else:  # pragma: no cover - timeout without state
                    out = None
                state.remove()
                if out is not None:
                    yield out
                return
            pairs = (
                list(zip(*state.get)) if state.exists else []
            )  # [(hash, id), ...]
            for pdf in pdfs:
                pairs.extend(zip(pdf["__h"], pdf["event_id"]))
            pairs = sorted(set(pairs))[:n]  # bounded: top-n only
            state.update((
                [p[0] for p in pairs], [int(p[1]) for p in pairs],
            ))
            # fire once the event-time watermark passes the window end.
            # The group key arrives as a session-tz-naive datetime; the
            # repo standard is a UTC session (bench.py / conftest), so
            # localize as UTC to get epoch ms
            ts = pd.Timestamp(wstart_ts)
            if ts.tz is None:
                ts = ts.tz_localize("UTC")
            state.setTimeoutTimestamp(int(ts.timestamp() * 1000) + secs * 1000)

        return (
            keyed.withWatermark(ts_col, watermark)
            .groupBy("__w", "user_id")
            .applyInPandasWithState(
                on_stream,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )

    # batch twin: one window partitioned by (window, key) — the quota
    # sort never crosses group boundaries, same shape as cap_per_group
    rn = F.row_number().over(
        Window.partitionBy("__w", "user_id").orderBy("__h", "event_id")
    )
    return (
        keyed.withColumn("__rn", rn)
        .filter(F.col("__rn") <= n)
        .select(
            F.date_format("__w", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "user_id",
            "event_id",
        )
    )
