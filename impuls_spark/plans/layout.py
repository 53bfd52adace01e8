"""Physical-layout helpers: partitioning and bucketing strategy for the
feed at cluster scale.

The feed's access pattern is stable: stop_times is the fact table and
joins/windows almost exclusively on ``trip_id``; trips joins routes and
calendars; everything else is dimension-sized. That makes the layout
decision static (SURVEY §4.1 "indexes" row):

- **stop_times, frequencies**: hash-partition (or bucket) by trip_id —
  every window (SplitTripLegs, GenerateTripHeadsign) and FK semi-join
  then reuses one shuffle.
- **trips**: bucket by trip_id for the stop_times joins; broadcast is
  usually fine for routes/calendars/stops joins.
- **dimensions** (agencies..stops): single-digit MiB even continent-
  scale — always broadcast, never bucket.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..feed import FeedDataset

#: tables that stay broadcast-sized at any realistic feed scale
DIMENSION_TABLES = (
    "agencies", "attributions", "calendars", "calendar_exceptions",
    "feed_info", "routes", "stops", "fare_attributes", "fare_rules",
    "shapes", "transfers", "translations",
)

#: fact tables and their co-location key
FACT_KEYS = {
    "stop_times": "trip_id",
    "frequencies": "trip_id",
    "trips": "trip_id",
    "shape_points": "shape_id",
}


def repartition_feed(feed: FeedDataset, n_partitions: int) -> FeedDataset:
    """Hash-partition the fact tables on their co-location keys so every
    downstream trip-keyed window/join reuses the same exchange."""
    updates = {}
    for table, key in FACT_KEYS.items():
        updates[table] = feed[table].repartition(n_partitions, key)
    return feed.with_tables(updates)


def bucket_for_joins(
    feed: FeedDataset, n_buckets: int, database: str = "impuls", path: str | None = None
) -> None:
    """Persist the fact tables bucketed by their co-location key
    (``bucketBy`` + saveAsTable). Later trip-keyed joins between two
    bucketed tables need no shuffle at all. Dimensions are written
    plain (they broadcast)."""
    spark = feed.spark
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for table, key in FACT_KEYS.items():
        writer = (
            feed[table].write.mode("overwrite")
            .bucketBy(n_buckets, key).sortBy(key)
            .format("parquet")
        )
        if path:
            writer = writer.option("path", f"{path}/{table}")
        writer.saveAsTable(f"{database}.{table}")
    for table in DIMENSION_TABLES:
        writer = feed[table].write.mode("overwrite").format("parquet")
        if path:
            writer = writer.option("path", f"{path}/{table}")
        writer.saveAsTable(f"{database}.{table}")


def scale_session_conf(spark: SparkSession, target_partitions: int) -> None:
    """Session knobs that must scale with data volume (SURVEY §4 +
    instructions): shuffle partition count ≈ cores × 2-3 at cluster
    scale, AQE on for runtime coalescing and skew splitting, max
    partition bytes sized so a partition fits comfortably in executor
    memory."""
    spark.conf.set("spark.sql.shuffle.partitions", str(target_partitions))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
