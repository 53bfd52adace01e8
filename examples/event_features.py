"""Event-telemetry feature pipeline: the table a behavioral-model
team derives from a raw event stream, composed from the temporal
operators in ``impuls_spark.operators.temporal_join``.

Stages (each a single keyed shuffle — the whole pipeline is four
exchanges end to end, nothing quadratic):

1. **as-of enrichment** — every purchase picks up the most recent
   prior view by the same user (union + one keyed window);
2. **trailing activity features** — events in the last hour per user
   at each purchase (one RANGE-frame window);
3. **error proximity** — count of errors within ±5 minutes of each
   purchase (cell-bucketed range join, no nested loop);
4. **health rollup** — gap-filled 6-hour per-type event counts for
   the monitoring dashboard (sequence-exploded spine, no collect).

Run:

    python -m examples.event_features --in /root/testdata/sf0.01 \\
        --out /tmp/event_features
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impuls_spark.operators import (
    asof_join,
    range_join,
    rolling_window_agg,
    time_bucket_rollup,
)


def _events(spark: SparkSession, in_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(in_dir, "events.parquet"))
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def purchase_features(events: DataFrame) -> DataFrame:
    """One row per purchase: last-view recency, trailing-hour
    activity, and nearby-error count."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "ts", F.col("event_id").alias("error_id")
    )

    enriched = asof_join(
        purchases, views, on=["user_id"], left_ts="ts",
        tiebreak="event_id", prefix="view_",
    ).select(
        "event_id", "user_id", "ts_us", "value",
        ((F.col("ts_us") - F.col("view_ts_us")) / 1e6).alias(
            "secs_since_last_view"
        ),
    )

    activity = rolling_window_agg(
        purchases, "ts", key_col="user_id", window_s=3600,
        aggs={"n_events_1h": F.count(F.lit(1))},
    ).select("event_id", "n_events_1h")

    nearby = (
        range_join(
            purchases.select("ts", "event_id"), errors, on=None,
            lower_s=-300, upper_s=300, how="left",
        )
        .groupBy("event_id")
        .agg(F.count("error_id_r").alias("n_errors_5m"))
    )

    return (
        enriched.join(activity, "event_id")
        .join(nearby, "event_id")
    )


def health_rollup(events: DataFrame) -> DataFrame:
    return time_bucket_rollup(
        events, "ts", bucket_s=21_600, keys=["event_type"],
        aggs={"n_events": F.count(F.lit(1))},
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", dest="out_dir", default="/tmp/event_features")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    events = _events(spark, args.in_dir)

    feats = purchase_features(events)
    feats.write.mode("overwrite").parquet(
        os.path.join(args.out_dir, "purchase_features")
    )
    roll = health_rollup(events)
    roll.write.mode("overwrite").parquet(
        os.path.join(args.out_dir, "health_rollup")
    )
    stats = {
        "purchases": feats.count(),
        "with_prior_view": feats.filter(
            F.col("secs_since_last_view").isNotNull()
        ).count(),
        "rollup_cells": roll.count(),
    }
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
