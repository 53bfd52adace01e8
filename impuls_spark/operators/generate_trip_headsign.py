"""GenerateTripHeadsign — fill empty trip headsigns with the last stop's name.

Parity target: reference impuls/tasks/generate_trip_headsign.py:7-27,
which runs a correlated subquery (stop_times ⋈ stops ordered by
stop_sequence DESC LIMIT 1) per trip. Spark-first shape: one window
top-1-per-group over stop_times, one join to stops, one left join back
into trips — three shuffles total regardless of trip count, no
correlated per-row execution.

Scale: stop_times is the big table; the window partitions by trip_id
(same key later joined), stops is dimension-sized and broadcast.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..feed import FeedDataset
from ..task import BaseTask, TaskRuntime


class GenerateTripHeadsign(BaseTask):
    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        stop_times = feed["stop_times"]
        stops = feed["stops"]
        trips = feed["trips"]

        w = Window.partitionBy("trip_id").orderBy(F.col("stop_sequence").desc())
        last_stop = (
            stop_times.select("trip_id", "stop_id", "stop_sequence")
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .join(F.broadcast(stops.select("stop_id", F.col("name").alias("__last_name"))),
                  "stop_id")
            .select("trip_id", "__last_name")
        )

        filled = (
            trips.join(last_stop, "trip_id", "left")
            .withColumn(
                "headsign",
                F.when(
                    F.col("headsign").isNull() | (F.col("headsign") == ""),
                    F.col("__last_name"),
                ).otherwise(F.col("headsign")),
            )
            .drop("__last_name")
        )
        return feed.with_table("trips", filled)
