"""SplitTripLegs hook surface: the pkpic SplitBusLegs port
(examples/pkpic_like.py vs reference examples/pkpic/split_bus_legs.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from examples.pkpic_like import SplitBusLegs
from impuls_spark.feed import FeedDataset
from impuls_spark.task import TaskRuntime


def _mini_feed(spark):
    """One agency, one rail route; three trips:

    - IC1: train -> BUS halfway (platform flag) => splits into 2 legs
    - ZKA5: short_name contains ZKA => whole-trip replacement bus
    - IC2: plain train, untouched
    """
    feed = FeedDataset.empty(spark)

    def rows(table, data):
        schema = feed[table].schema
        names = [f.name for f in schema.fields]
        return spark.createDataFrame(
            [tuple(r.get(c) for c in names) for r in data], schema
        )

    routes = rows("routes", [
        {"route_id": "R1", "agency_id": "A", "short_name": "R1",
         "long_name": "Main line", "type": 2},
    ])
    trips = rows("trips", [
        {"trip_id": "IC1", "route_id": "R1", "calendar_id": "C",
         "short_name": "IC 1001"},
        {"trip_id": "ZKA5", "route_id": "R1", "calendar_id": "C",
         "short_name": "ZKA 5"},
        {"trip_id": "IC2", "route_id": "R1", "calendar_id": "C",
         "short_name": "IC 1002"},
    ])

    def st(trip_id, seq, platform=None):
        t = 3600 * 10 + seq * 600
        return {"trip_id": trip_id, "stop_id": f"S{seq}", "stop_sequence": seq,
                "arrival_time": t, "departure_time": t + 60,
                "pickup_type": 0, "drop_off_type": 0, "platform": platform}

    stop_times = rows("stop_times", [
        st("IC1", 0), st("IC1", 1),
        st("IC1", 2, "BUS"), st("IC1", 3, "BUS"),
        st("ZKA5", 0), st("ZKA5", 1), st("ZKA5", 2),
        st("IC2", 0), st("IC2", 1),
    ])
    return feed.with_tables(
        {"routes": routes, "trips": trips, "stop_times": stop_times}
    )


@pytest.fixture()
def out(spark):
    feed = _mini_feed(spark)
    return SplitBusLegs(agency_id="A").transform(feed, TaskRuntime(spark))


def test_flagged_trip_splits_with_zka_route(out):
    trips = {r["trip_id"]: r for r in out["trips"].collect()}
    # IC1 replaced by per-leg trips; bus leg rides the fresh "ZKA R1"
    assert "IC1" not in trips
    assert trips["IC1_0"]["route_id"] == "R1"
    assert trips["IC1_1"]["route_id"] == "ZKA R1"


def test_zka_short_name_is_whole_trip_bus(out):
    trips = {r["trip_id"]: r for r in out["trips"].collect()}
    # no splitting: the trip id survives, only the route changes
    assert trips["ZKA5"]["route_id"] == "ZKA R1"
    st = out["stop_times"].filter(F.col("trip_id") == "ZKA5").collect()
    assert len(st) == 3  # stop_times untouched


def test_plain_trip_untouched(out):
    trips = {r["trip_id"]: r for r in out["trips"].collect()}
    assert trips["IC2"]["route_id"] == "R1"


def test_fresh_bus_route_not_a_clone(out):
    routes = {r["route_id"]: r for r in out["routes"].collect()}
    zka = routes["ZKA R1"]
    # reference ensure_bus_equivalent_exists: (agency, id, id, '', 3)
    assert zka["short_name"] == "ZKA R1"
    assert zka["long_name"] == ""
    assert zka["type"] == 3
    assert zka["agency_id"] == "A"
    # the parent rail route survives unchanged
    assert routes["R1"]["type"] == 2
    assert len(routes) == 2  # exactly one bus twin, deduped across trips


def test_no_transfers_generated(out):
    assert out["transfers"].count() == 0


def test_boundary_duplication_still_applies(out):
    """The splitting core is inherited: the boundary stop appears as the
    arrival-only terminus of leg 0 AND the departure-only start of leg 1."""
    leg0 = out["stop_times"].filter(F.col("trip_id") == "IC1_0") \
        .orderBy("stop_sequence").collect()
    leg1 = out["stop_times"].filter(F.col("trip_id") == "IC1_1") \
        .orderBy("stop_sequence").collect()
    assert [r["stop_id"] for r in leg0] == ["S0", "S1", "S2"]
    assert [r["stop_id"] for r in leg1] == ["S2", "S3"]
    assert leg0[-1]["departure_time"] == leg0[-1]["arrival_time"]
    assert leg1[0]["arrival_time"] == leg1[0]["departure_time"]
