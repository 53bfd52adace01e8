"""RemoveUnusedEntities — cascading existence prunes over the feed.

Parity target: reference impuls/tasks/remove_unused_entities.py:28-99,
which runs 7 ``DELETE ... NOT EXISTS`` statements and relies on SQLite
``ON DELETE CASCADE`` to silently drop children. Here each prune is a
left-semi/left-anti join and the cascade is **explicit** via
``FeedDataset.cascade_delete`` (SURVEY §4.2.2).

Prunes, in reference order:
1. trips with fewer than 2 stop_times
2. calendars without trips
3. calendars with no active dates (no weekday flag and no ADDED
   exception)
4. stops (location_type=STOP) without stop_times
5. stations (location_type=STATION) without child stops
6. routes without trips
7. agencies without routes

All seven compile into one lazy DAG; nothing executes until the next
action. Each semi-join keys on the table's natural key, so at scale the
big tables (stop_times) shuffle once per prune that touches them and
AQE collapses the tiny sides to broadcasts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..feed import FeedDataset
from ..schema import ExceptionType, LocationType
from ..task import BaseTask, TaskRuntime


class RemoveUnusedEntities(BaseTask):
    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        # 1. trips with >=2 stop_times survive
        st_counts = (
            feed["stop_times"].groupBy("trip_id").agg(F.count("*").alias("__n"))
            .filter(F.col("__n") >= 2).select("trip_id")
        )
        trips = feed["trips"].join(st_counts, "trip_id", "left_semi")
        feed = feed.cascade_delete("trips", trips)

        # 2+3. calendars referenced by trips AND with at least one
        # active date source (a weekday flag, or an ADDED exception)
        used = feed["trips"].select("calendar_id").distinct()
        any_weekday = (
            F.col("monday") | F.col("tuesday") | F.col("wednesday") | F.col("thursday")
            | F.col("friday") | F.col("saturday") | F.col("sunday")
        )
        added = (
            feed["calendar_exceptions"]
            .filter(F.col("exception_type") == int(ExceptionType.ADDED))
            .select("calendar_id").distinct()
        )
        calendars = (
            feed["calendars"]
            .join(used, "calendar_id", "left_semi")
            .join(added.withColumnRenamed("calendar_id", "__cid"),
                  F.col("calendar_id") == F.col("__cid"), "left")
            .filter(any_weekday | F.col("__cid").isNotNull())
            .drop("__cid")
        )
        # cascade drops trips of removed calendars (and their
        # stop_times), matching SQLite's FK cascade
        feed = feed.cascade_delete("calendars", calendars)

        # 4. plain stops (loc 0) survive only if stop_times reference
        # them — single-branch left-join + filter (keeps the plan
        # linear; a union of filtered branches duplicates the subtree)
        used_stops = (
            feed["stop_times"].select("stop_id").distinct()
            .withColumn("__used", F.lit(1))
        )
        stops = (
            feed["stops"].join(used_stops, "stop_id", "left")
            .filter(
                (F.col("location_type") != int(LocationType.STOP))
                | F.col("__used").isNotNull()
            )
            .drop("__used")
        )

        # 5. stations (loc 1) survive only with child stops
        parents = (
            stops.filter(F.col("parent_station").isNotNull())
            .select(F.col("parent_station").alias("stop_id")).distinct()
            .withColumn("__haschild", F.lit(1))
        )
        stops = (
            stops.join(parents, "stop_id", "left")
            .filter(
                (F.col("location_type") != int(LocationType.STATION))
                | F.col("__haschild").isNotNull()
            )
            .drop("__haschild")
        )
        feed = feed.cascade_delete("stops", stops)

        # 6. routes without trips
        used_routes = feed["trips"].select("route_id").distinct()
        routes = feed["routes"].join(used_routes, "route_id", "left_semi")
        feed = feed.cascade_delete("routes", routes)

        # 7. agencies without routes
        used_agencies = feed["routes"].select("agency_id").distinct()
        agencies = feed["agencies"].join(used_agencies, "agency_id", "left_semi")
        feed = feed.cascade_delete("agencies", agencies)

        return feed
