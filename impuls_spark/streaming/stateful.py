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
from pyspark.sql import DataFrame
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
        if state.exists:
            total, sent = state.get
        else:
            total, sent = 0.0, 0
        out_rows = []
        for pdf in pdfs:
            for v in pdf[value_col]:
                total += float(v)
                while total >= (sent + 1) * threshold:
                    sent += 1
                    out_rows.append((key[0], sent, round(total, 6)))
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

    # batch path: same semantics in event order (ts, then any stable
    # column) — verification twin of the streaming operator
    def on_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([c for c in ("ts", "event_id") if c in pdf.columns])
        total, sent = 0.0, 0
        out = []
        for v in pdf[value_col]:
            total += float(v)
            while total >= (sent + 1) * threshold:
                sent += 1
                out.append((pdf[key_col].iloc[0], sent, round(total, 6)))
        return pd.DataFrame(out, columns=["user_id", "alert_ix", "total"])

    return events.groupBy(F.col(key_col)).applyInPandas(on_batch, OUTPUT_SCHEMA)
