"""Port of the reference's PKP-Intercity bus-leg splitter subclass.

The reference's ``examples/pkpic/split_bus_legs.py`` customizes the
trip-splitting task in four ways that the stock configuration cannot
express:

- it processes ALL trips, not just rail routes;
- a trip whose short_name contains ``ZKA`` is a whole-trip replacement
  bus (reference split_bus_legs.py:40 — takes priority over per-stop
  flags, no splitting happens);
- the bus twin of route R is a brand-new route ``ZKA R`` with
  short_name ``ZKA R``, empty long_name and type 3 — not a clone of
  the parent (split_bus_legs.py:76-83);
- no transfers are generated between legs (insert_legs:59-73 creates
  trips and stop_times only).

This module expresses the same pipeline against
:class:`~impuls_spark.operators.SplitTripLegs`'s hook surface — each
override is a Column/DataFrame transform, so the subclass stays on the
JVM fast path (no per-row Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from impuls_spark.operators import SplitTripLegs
from impuls_spark.selector import Routes


class SplitBusLegs(SplitTripLegs):
    """Reference examples/pkpic/split_bus_legs.py:12-87 on Spark hooks."""

    def __init__(self, agency_id: str = "0") -> None:
        super().__init__(
            routes=Routes(),  # all routes, not just rail
            replacement_bus_short_name_pattern="ZKA",
        )
        self.agency_id = agency_id

    def bus_route_id(self, route_id: Column) -> Column:
        # reference get_bus_route_id: "ZKA " + route_id
        return F.concat(F.lit("ZKA "), route_id)

    def make_bus_routes(self, routes: DataFrame, parent_route_ids: DataFrame) -> DataFrame:
        """Fresh minimal bus routes (reference ensure_bus_equivalent_exists:
        INSERT (agency_id, route_id, short_name, '', 3)) instead of
        cloning the parent row."""
        template = routes.limit(0)
        new_ids = parent_route_ids.select(self.bus_route_id(F.col("route_id")).alias("route_id"))
        fresh = new_ids.select(
            "route_id",
            F.lit(self.agency_id).alias("agency_id"),
            F.col("route_id").alias("short_name"),
            F.lit("").alias("long_name"),
            F.lit(3).alias("type"),
            *[
                F.lit(None).cast(template.schema[c].dataType).alias(c)
                for c in template.columns
                if c not in ("route_id", "agency_id", "short_name", "long_name", "type")
            ],
        )
        return fresh.select(*template.columns)

    def make_transfers(
        self, leg_pairs: DataFrame, existing_transfers: DataFrame
    ) -> DataFrame | None:
        # reference insert_legs creates no transfers between legs
        return None
