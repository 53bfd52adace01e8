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

Duplicate event ids within a (key, window) — the at-least-once replay
case — count ONCE toward the quota on both sides: the streaming state
keeps a set, and the batch twin ``dropDuplicates`` on (window, key, id)
before ranking, so neither a replay nor a repartition changes the kept
set.
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
    units = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
             "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}
    try:
        qty, unit = window.split()
        return int(qty) * units[unit]
    except (ValueError, KeyError):
        raise ValueError(
            f"unsupported window duration {window!r}: expected "
            f"'<integer> <unit>' with unit one of {sorted(set(units))}"
        ) from None


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
        # the window-start EPOCH, carried explicitly so the streaming
        # state function never re-derives it from the rendered (session
        # timezone-naive) group key — in a non-UTC session that shifted
        # the event-time timeout, east-of-UTC even behind the watermark
        (F.floor(F.unix_timestamp(F.col(ts_col)) / secs) * secs)
        .cast("long").alias("__wsec"),
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
            wsec = None
            for pdf in pdfs:
                pairs.extend(zip(pdf["__h"], pdf["event_id"]))
                if wsec is None and len(pdf):
                    wsec = int(pdf["__wsec"].iloc[0])
            # set() dedups replayed event ids (at-least-once sources);
            # the batch twin dropDuplicates on the same key for parity
            pairs = sorted(set(pairs))[:n]  # bounded: top-n only
            state.update((
                [p[0] for p in pairs], [int(p[1]) for p in pairs],
            ))
            # fire once the event-time watermark passes the window end;
            # the epoch rides in as __wsec, independent of session tz
            if wsec is None:  # pragma: no cover - data call, no rows
                ts = pd.Timestamp(wstart_ts)
                if ts.tz is None:
                    ts = ts.tz_localize("UTC")
                wsec = int(ts.timestamp())
            state.setTimeoutTimestamp((wsec + secs) * 1000)

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
    # sort never crosses group boundaries, same shape as cap_per_group.
    # dropDuplicates mirrors the streaming side's set(): a duplicate
    # event id (at-least-once replay) counts once toward the quota and
    # can't displace a distinct event
    rn = F.row_number().over(
        Window.partitionBy("__w", "user_id").orderBy("__h", "event_id")
    )
    return (
        keyed.dropDuplicates(["__w", "user_id", "event_id"])
        .withColumn("__rn", rn)
        .filter(F.col("__rn") <= n)
        .select(
            F.date_format("__w", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "user_id",
            "event_id",
        )
    )
