"""Custom stateful streaming operator via ``applyInPandasWithState``.

Beyond the built-in windows (sessions.py), this is the template for
arbitrary per-key streaming state — the Spark-native replacement for
what a single-node engine would keep in process memory. The example
operator, :func:`running_threshold_alerts`, maintains a per-user
cumulative value and emits one alert row each time the total crosses
another multiple of ``threshold`` (metering/quota semantics).

State is a single (total, alerts_sent) pair per key, bounded and
watermark-evictable; batches arrive as Arrow record batches, so the
Python cost is per-batch, not per-row. Works on a batch DataFrame too
(groupBy().applyInPandas path) for oracle-style verification.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, alert_ix int, total double"
STATE_SCHEMA = "total double, alerts_sent int"


def running_threshold_alerts(
    events: DataFrame,
    threshold: float = 100.0,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Emit (user_id, alert_ix, total) whenever a user's cumulative
    ``value`` crosses ``alert_ix * threshold``."""

    def on_stream(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # numpy cumsum per Arrow batch — the only per-row work is on the
        # (rare) crossing rows themselves
        import numpy as np

        if state.exists:
            total, sent = state.get
        else:
            total, sent = 0.0, 0
        def round6(x: float) -> float:
            # HALF_UP (away from zero), matching F.round and DuckDB
            # round — Python round() is banker's and would desync the
            # batch twin / oracle on knife-edge halves
            s = -1.0 if x < 0 else 1.0
            return s * np.floor(abs(x) * 1e6 + 0.5) / 1e6

        out_rows = []
        for pdf in pdfs:
            vals = pdf[value_col].to_numpy(dtype="float64")
            if len(vals) == 0:
                continue
            cum = total + np.cumsum(vals)
            k = np.floor(cum / threshold).astype(np.int64)
            run = np.maximum.accumulate(np.concatenate(([sent], k)))
            for i in np.nonzero(run[1:] > run[:-1])[0]:
                for ix in range(int(run[i]) + 1, int(run[i + 1]) + 1):
                    out_rows.append((key[0], ix, round6(float(cum[i]))))
            total = float(cum[-1])
            sent = int(run[-1])
        state.update((total, sent))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=["user_id", "alert_ix", "total"])

    if events.isStreaming:
        return (
            events.groupBy(F.col(key_col))
            .applyInPandasWithState(
                on_stream,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )

    # batch path: a fully declarative twin of the streaming operator, so
    # the DuckDB oracle can verify it. Per key, in event order, the
    # cumulative total's *high-water mark* determines how many alert
    # multiples have been passed (`sent` in the loop above never
    # decreases); each row emits one alert per threshold multiple newly
    # crossed: alert_ix in (floor(prev_hwm/T), floor(hwm/T)]. A pure
    # window-cumsum + explode(sequence(...)) plan — single shuffle on the
    # key, whole-stage codegen, no Python.
    order_cols = [c for c in ("ts", "event_id") if c in events.columns]
    if not order_cols:
        raise ValueError(
            "batch running_threshold_alerts needs a 'ts' or 'event_id' "
            "column to define event order (the streaming path orders by "
            "arrival instead)"
        )
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    # explicit ROWS frame: the default orderBy frame is RANGE, which
    # sums over all order-key peers on ties — the oracle uses ROWS
    # UNBOUNDED PRECEDING and F.lag is row-based, so keep all three
    # row-based
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = events.withColumn("__cum", F.sum(F.col(value_col)).over(wf))
    hw = cum.withColumn("__hwm", F.max("__cum").over(wf))
    bounds = hw.select(
        F.col(key_col).alias("user_id"),
        F.round("__hwm", 6).alias("total"),
        # clamp to 1: the streaming `sent` counter starts at 0 and never
        # decreases, so alert_ix 0 must not fire even when the cumsum
        # dips negative before recovering into [0, threshold)
        F.greatest(
            F.floor(
                F.coalesce(F.lag("__hwm").over(w), F.lit(0.0)) / F.lit(threshold)
            )
            + 1,
            F.lit(1).cast("bigint"),
        ).alias("__lo"),
        F.floor(F.col("__hwm") / F.lit(threshold)).alias("__hi"),
    )
    return (
        bounds.select(
            "user_id",
            F.explode(
                F.when(
                    F.col("__hi") >= F.col("__lo"),
                    F.sequence("__lo", "__hi"),
                ).otherwise(F.array().cast("array<bigint>"))
            ).alias("__k"),
            "total",
        )
        .select(
            "user_id", F.col("__k").cast("int").alias("alert_ix"), "total"
        )
    )
