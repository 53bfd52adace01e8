"""AssignDirections — set trips.direction from ordered stop-pair rules.

Parity target: reference impuls/tasks/assign_directions.py:12-128.
Each rule is an ordered stop pair ``(earlier, later)``: a trip that
visits ``earlier`` strictly before ``later`` gets direction 0; the
reverse order gets direction 1. Only *unambiguous* stops participate —
stops a trip visits exactly once (``GROUP BY stop_id HAVING
COUNT(*)=1``, reference line 124-126). Rules are evaluated in order;
the first applicable rule wins. Trips matching no rule are collected
and raised together (collect-don't-fail-fast, §2.5).

Spark shape: one groupBy over stop_times for per-trip/stop visit
counts + first sequence, then a broadcast join against the (tiny) rule
list, a min-rule-index window, and a keyed update into trips. The big
table is touched once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..errors import MultipleDataErrors, DataError
from ..feed import FeedDataset
from ..selector import Routes
from ..task import BaseTask, TaskRuntime


class AssignDirections(BaseTask):
    def __init__(
        self,
        rules: Sequence[tuple[str, str]],
        routes: Routes | None = None,
        overwrite: bool = False,
    ) -> None:
        self.rules = list(rules)
        self.routes = routes
        self.overwrite = overwrite

    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        spark = runtime.spark
        trips = feed["trips"]

        in_scope = trips
        if self.routes is not None:
            route_ids = self.routes.apply(feed["routes"]).select("route_id")
            in_scope = in_scope.join(F.broadcast(route_ids), "route_id", "left_semi")
        if not self.overwrite:
            in_scope = in_scope.filter(F.col("direction").isNull())
        scope_ids = in_scope.select("trip_id")

        # unambiguous stop visits: exactly one occurrence per trip
        visits = (
            feed["stop_times"]
            .join(scope_ids, "trip_id", "left_semi")
            .groupBy("trip_id", "stop_id")
            .agg(F.count("*").alias("__n"), F.min("stop_sequence").alias("__seq"))
            .filter(F.col("__n") == 1)
        )

        rules_df = spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(self.rules)],
            "rule_ix int, stop_a string, stop_b string",
        )

        a = visits.select("trip_id", F.col("stop_id").alias("stop_a"),
                          F.col("__seq").alias("seq_a"))
        b = visits.select("trip_id", F.col("stop_id").alias("stop_b"),
                          F.col("__seq").alias("seq_b"))
        matches = (
            a.join(F.broadcast(rules_df), "stop_a")
            .join(b, ["trip_id", "stop_b"])
            .withColumn(
                "direction_candidate",
                F.when(F.col("seq_a") < F.col("seq_b"), F.lit(0)).otherwise(F.lit(1)),
            )
        )
        w = Window.partitionBy("trip_id").orderBy("rule_ix")
        decided = (
            matches.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("trip_id", "direction_candidate")
        )

        # collect-don't-fail-fast: every in-scope trip must match a rule
        unmatched = scope_ids.join(decided, "trip_id", "left_anti").limit(50).collect()
        if unmatched:
            raise MultipleDataErrors(
                "AssignDirections",
                [DataError(f"no direction rule matches trip {r[0]}") for r in unmatched],
            )

        out = (
            trips.join(decided, "trip_id", "left")
            .withColumn(
                "direction",
                F.coalesce(F.col("direction_candidate"), F.col("direction")),
            )
            .drop("direction_candidate")
        )
        return feed.with_table("trips", out.select(*trips.columns))
