"""Regression tests for reference-parity fixes found in the round-1
code review (each cites the reference behavior it pins)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from impuls_spark.task import TaskRuntime

D = datetime.date


@pytest.fixture()
def rt(spark):
    return TaskRuntime(spark)


def test_split_trailing_single_stop_leg_not_split(spark, rt):
    """A flag flip on the trip's LAST stop must not create a degenerate
    1-stop leg; the stop becomes the previous leg's arrival-only
    terminus and the trip is NOT renamed (reference compute_legs final
    ``len(leg) > 1``)."""
    from impuls_spark.feed import FeedDataset
    from impuls_spark.operators import SplitTripLegs
    from impuls_spark.sources.gtfs_read import _align

    st = spark.createDataFrame(
        [
            ("T", "s1", 0, 100, 100, 0, 0, None),
            ("T", "s2", 1, 200, 200, 0, 0, None),
            ("T", "s3", 2, 300, 320, 0, 0, "BUS"),  # last stop flips
        ],
        "trip_id string, stop_id string, stop_sequence int, arrival_time int, "
        "departure_time int, pickup_type int, drop_off_type int, platform string",
    )
    trips = spark.createDataFrame(
        [("T", "R", "C")], "trip_id string, route_id string, calendar_id string"
    )
    routes = spark.createDataFrame(
        [("R", "0", "r", "R long", 2)],
        "route_id string, agency_id string, short_name string, long_name string, type int",
    )
    feed = FeedDataset.empty(spark).with_tables({
        "stop_times": _align(st, "stop_times"),
        "trips": _align(trips, "trips"),
        "routes": _align(routes, "routes"),
    })
    out = SplitTripLegs().transform(feed, rt)
    # trip NOT split: same id, still 3 stops, no new routes/transfers
    assert [r[0] for r in out["trips"].select("trip_id").collect()] == ["T"]
    rows = out["stop_times"].orderBy("stop_sequence").collect()
    assert len(rows) == 3
    # the trailing stop became arrival-only
    assert rows[2]["departure_time"] == rows[2]["arrival_time"] == 300
    assert rows[2]["pickup_type"] == 1
    assert out["routes"].count() == 1
    assert out["transfers"].count() == 0


def test_split_cascades_frequencies_of_split_trips(feed, rt):
    """frequencies rows of split trips are removed (the reference's
    ON DELETE CASCADE followed the deleted trip row)."""
    from impuls_spark.operators import SplitTripLegs

    # the fixture's frequency row references trip C-A1-000 (never split);
    # repoint it at a ZA trip that WILL split
    za_trip = "C-ZA1-000"
    freq = feed["frequencies"].withColumn("trip_id", F.lit(za_trip))
    feed2 = feed.with_table("frequencies", freq)
    out = SplitTripLegs().transform(feed2, rt)
    assert out["frequencies"].count() == 0  # cascaded with the split trip


def test_must_curate_all_checks_feed_coverage(feed, rt, tmp_path):
    """must_curate_all raises when FEED entities are missing from the
    CSV (reference check_if_all_entities_were_curated) — unknown CSV
    ids merely warn."""
    from impuls_spark.errors import DataError
    from impuls_spark.operators import ModifyRoutesFromCSV

    # covers only 1 of 3 routes -> must raise
    p = tmp_path / "partial.csv"
    p.write_text("route_id,route_short_name\nA1,X\n")
    with pytest.raises(DataError, match="not curated"):
        ModifyRoutesFromCSV(str(p), must_curate_all=True).transform(feed, rt)

    # unknown id with full coverage -> warns, does not raise
    p2 = tmp_path / "full.csv"
    p2.write_text("route_id,route_short_name\nA1,X\nZA1,Y\nZA12,Z\nNOPE,Q\n")
    out = ModifyRoutesFromCSV(str(p2), must_curate_all=True).transform(feed, rt)
    assert out["routes"].filter(F.col("short_name") == "X").count() == 1


def test_extend_calendars_noop_when_covered(feed, rt):
    """Expected window inside the covered span -> no rewrite (reference
    is_extension_necessary): days inside the span with no service stay
    serviceless."""
    from impuls_spark.operators import ExtendCalendars

    out = ExtendCalendars(D(2026, 6, 1), 30).transform(feed, rt)
    # untouched: calendars still weekday-ranged, not exception-based
    cal = out["calendars"].filter(F.col("calendar_id") == "D").collect()[0]
    assert cal["monday"] is True
    assert str(cal["start_date"]) == "2026-06-01"


def test_merge_platform_poles_never_geo_merge(spark, rt):
    """Stops with different platform_code within 10 m must not merge
    (reference StopHash includes platform_code)."""
    from impuls_spark.feed import FeedDataset
    from impuls_spark.operators import Merge
    from impuls_spark.sources.gtfs_read import _align

    def mk(platform):
        df = spark.createDataFrame(
            [("p" + platform, "Central", 52.0, 21.0, 0, platform)],
            "stop_id string, name string, lat double, lon double, "
            "location_type int, platform_code string",
        )
        return FeedDataset.empty(spark).with_table("stops", _align(df, "stops"))

    merged = Merge([("v1", mk("1")), ("v2", mk("2"))]).transform(mk("1"), rt)
    assert merged["stops"].count() == 2  # 3 m apart but different platforms


def test_remove_unused_drops_never_active_calendar(spark, feed, rt):
    """A weekday calendar whose date range contains none of its active
    weekdays is pruned with its trips (reference prune #3 computes real
    active dates)."""
    from impuls_spark.operators import RemoveUnusedEntities

    # Monday-only calendar valid Tue..Thu (no Monday inside)
    cal = feed["calendars"].limit(1).select(
        F.lit("dead").alias("calendar_id"),
        F.lit(True).alias("monday"),
        *[F.lit(False).alias(d) for d in
          ("tuesday", "wednesday", "thursday", "friday", "saturday", "sunday")],
        F.lit("2026-06-02").cast("date").alias("start_date"),
        F.lit("2026-06-04").cast("date").alias("end_date"),
        F.lit(None).cast("string").alias("desc"),
        F.lit(None).cast("map<string,string>").alias("extra_fields"),
    )
    trips2 = feed["trips"].withColumn(
        "calendar_id",
        F.when(F.col("trip_id") == "D-A1-001", "dead").otherwise(F.col("calendar_id")),
    )
    feed2 = feed.with_tables({
        "calendars": feed["calendars"].unionByName(cal),
        "trips": trips2,
    })
    out = RemoveUnusedEntities().transform(feed2, rt)
    assert out["calendars"].filter(F.col("calendar_id") == "dead").count() == 0
    assert out["trips"].filter(F.col("trip_id") == "D-A1-001").count() == 0
