"""A reference-shaped example pipeline.

The reference ships city pipelines (examples/krakow, examples/warsaw,
examples/pkpic) that exercise the public operator surface: raw-SQL
curation statements, selector-scoped tasks, station merging, long-name
generation. This module reproduces those *usage shapes* against the
synthetic WKD-style feed — it is the "a reference user could switch"
demonstration, built only from public engine APIs.

Mirrored behaviors (by usage shape, reference cites in SURVEY §2.3):
- FixStopNames — regexp cleanup via the registered ``re_sub`` UDF
  (examples/krakow FixStopNames).
- DropBlockID — mass UPDATE to NULL (examples/krakow).
- RemoveTripsWithoutPickup — DELETE of trips whose every stop_time has
  pickup_type=1 (examples/krakow).
- GenerateRouteLongName — most-common first/last headsign pair per
  route (examples/krakow/generate_route_long_name.py).
- MergeRailwayStations — synthesize station (location_type=1) parents
  at the average position of same-name stops
  (examples/warsaw/merge_railway_stations.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from impuls_spark.feed import FeedDataset
from impuls_spark.operators import ExecuteSQL, GenerateTripHeadsign, RemoveUnusedEntities
from impuls_spark.pipeline import Pipeline
from impuls_spark.task import BaseTask, TaskRuntime


class FixStopNames(ExecuteSQL):
    """Trim trailing whitespace + collapse double spaces via re_sub."""

    def __init__(self) -> None:
        super().__init__(
            statement="UPDATE stops SET name = re_sub(' +', ' ', rtrim(name))"
        )


class DropBlockID(ExecuteSQL):
    def __init__(self) -> None:
        super().__init__(statement="UPDATE trips SET block_id = NULL")


class RemoveTripsWithoutPickup(BaseTask):
    """Drop trips where no stop allows boarding (every pickup_type=1),
    cascading stop_times (reference: examples/krakow)."""

    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        boardable = (
            feed["stop_times"].filter(F.col("pickup_type") != 1)
            .select("trip_id").distinct()
        )
        kept = feed["trips"].join(boardable, "trip_id", "left_semi")
        return feed.cascade_delete("trips", kept)


class GenerateRouteLongName(BaseTask):
    """route.long_name := the route's most common "first — last" stop
    name pair over direction-0 trips (most-common-value pattern,
    reference generate_route_long_name.py:31-37)."""

    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        st = feed["stop_times"]
        w_first = Window.partitionBy("trip_id").orderBy("stop_sequence")
        w_last = Window.partitionBy("trip_id").orderBy(F.col("stop_sequence").desc())
        ends = (
            st.select(
                "trip_id",
                F.first("stop_id").over(w_first).alias("__first_stop"),
                F.first("stop_id").over(w_last).alias("__last_stop"),
            )
            .groupBy("trip_id")
            .agg(F.min("__first_stop").alias("__first_stop"),
                 F.min("__last_stop").alias("__last_stop"))
        )
        stops = feed["stops"].select("stop_id", "name")
        named = (
            ends.join(stops.withColumnRenamed("stop_id", "__first_stop")
                      .withColumnRenamed("name", "__fn"), "__first_stop")
            .join(stops.withColumnRenamed("stop_id", "__last_stop")
                  .withColumnRenamed("name", "__ln"), "__last_stop")
        )
        pairs = (
            feed["trips"].filter(F.coalesce(F.col("direction"), F.lit(0)) == 0)
            .select("trip_id", "route_id")
            .join(named, "trip_id")
            .groupBy("route_id",
                     F.concat_ws(" — ", "__fn", "__ln").alias("__long_name"))
            .agg(F.count("*").alias("__n"))
        )
        w = Window.partitionBy("route_id").orderBy(
            F.col("__n").desc(), F.col("__long_name")
        )
        best = (
            pairs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("route_id", "__long_name")
        )
        routes = (
            feed["routes"].join(F.broadcast(best), "route_id", "left")
            .withColumn("long_name",
                        F.coalesce(F.col("__long_name"), F.col("long_name")))
            .drop("__long_name")
        )
        return feed.with_table("routes", routes)


class MergeRailwayStations(BaseTask):
    """Create a station (location_type=1) per stop-name group with >1
    stop, positioned at the group's average lat/lon; child stops point
    at it (reference merge_railway_stations.py:12-35)."""

    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        stops = feed["stops"]
        groups = (
            stops.filter(F.col("location_type") == 0)
            .groupBy("name")
            .agg(
                F.count("*").alias("__n"),
                F.round(F.avg("lat"), 6).alias("__lat"),
                F.round(F.avg("lon"), 6).alias("__lon"),
                F.min("stop_id").alias("__anchor"),
            )
            .filter(F.col("__n") > 1)
            .withColumn("__station_id", F.concat(F.lit("st_"), F.col("__anchor")))
        )
        stations = groups.select(
            F.col("__station_id").alias("stop_id"),
            F.col("name"),
            F.col("__lat").alias("lat"),
            F.col("__lon").alias("lon"),
            F.lit(1).alias("location_type"),
        )
        from impuls_spark.sources.gtfs_read import _align

        updated = (
            stops.join(F.broadcast(groups.select("name", "__station_id")), "name", "left")
            .withColumn(
                "parent_station",
                F.when(
                    (F.col("location_type") == 0) & F.col("__station_id").isNotNull(),
                    F.col("__station_id"),
                ).otherwise(F.col("parent_station")),
            )
            .drop("__station_id")
            .select(*stops.columns)
        )
        return feed.with_table("stops", updated.unionByName(_align(stations, "stops")))


def build_pipeline() -> Pipeline:
    """The full example pipeline, reference-ordered."""
    return Pipeline([
        FixStopNames(),
        DropBlockID(),
        RemoveTripsWithoutPickup(),
        GenerateTripHeadsign(),
        GenerateRouteLongName(),
        MergeRailwayStations(),
        RemoveUnusedEntities(),
    ])
