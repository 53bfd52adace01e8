"""Phase-2 calendar suite tests: active_days, Simplify/Truncate/Extend,
DateRange algebra."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from impuls_spark.operators import (
    ExtendCalendars,
    NoServicesLeft,
    SimplifyCalendars,
    TruncateCalendars,
    active_days,
)
from impuls_spark.task import TaskRuntime
from impuls_spark.tools.temporal import DateRange, european_schedule_year

D = datetime.date


@pytest.fixture()
def rt(spark):
    return TaskRuntime(spark)


# -- DateRange algebra (pure python) ---------------------------------------

def test_daterange_basics():
    r = DateRange.bounded(D(2026, 1, 1), D(2026, 1, 10))
    assert len(r) == 10
    assert D(2026, 1, 5) in r
    assert D(2026, 1, 11) not in r
    assert DateRange.bounded(D(2026, 1, 10), D(2026, 1, 1)).is_empty()


def test_daterange_algebra():
    a = DateRange.bounded(D(2026, 1, 1), D(2026, 1, 10))
    b = DateRange.bounded(D(2026, 1, 8), D(2026, 1, 20))
    assert a.intersection(b) == DateRange.bounded(D(2026, 1, 8), D(2026, 1, 10))
    assert a.union(b) == DateRange.bounded(D(2026, 1, 1), D(2026, 1, 20))
    assert a.difference(b) == [DateRange.bounded(D(2026, 1, 1), D(2026, 1, 7))]
    mid = DateRange.bounded(D(2026, 1, 4), D(2026, 1, 6))
    assert a.difference(mid) == [
        DateRange.bounded(D(2026, 1, 1), D(2026, 1, 3)),
        DateRange.bounded(D(2026, 1, 7), D(2026, 1, 10)),
    ]
    assert mid.issubset(a)
    assert not a.issubset(mid)
    assert a.isdisjoint(DateRange.bounded(D(2026, 2, 1), D(2026, 2, 2)))
    inf = DateRange.infinite()
    assert a.issubset(inf)
    assert inf.intersection(a) == a
    with pytest.raises(ValueError):
        a.union(DateRange.bounded(D(2026, 3, 1), D(2026, 3, 2)))


def test_daterange_adjacent_union():
    a = DateRange.bounded(D(2026, 1, 1), D(2026, 1, 5))
    b = DateRange.bounded(D(2026, 1, 6), D(2026, 1, 9))
    assert a.union(b) == DateRange.bounded(D(2026, 1, 1), D(2026, 1, 9))


def test_compressed_weekdays():
    # 2026-01-05 is a Monday, 2026-01-11 a Sunday
    assert DateRange.compressed_weekdays([D(2026, 1, 5)]) == 1
    assert DateRange.compressed_weekdays([D(2026, 1, 5), D(2026, 1, 11)]) == 0b1000001


def test_european_schedule_year():
    r = european_schedule_year(2026)
    # revision switches the day AFTER the 2nd Saturday of December
    # (reference temporal.py:610-646: 2025-12-13 is still '2024-2025')
    assert r.start == D(2025, 12, 14)
    assert r.end == D(2026, 12, 12)
    assert r.start.weekday() == 6  # Sunday
    assert r.end.weekday() == 5    # the next 2nd Saturday, inclusive


def test_european_schedule_revision():
    from impuls_spark.tools.temporal import european_schedule_revision

    # pinned to the reference doctests (temporal.py:615-631)
    assert european_schedule_revision(D(2025, 12, 1)) == "2024-2025"
    assert european_schedule_revision(D(2025, 12, 13)) == "2024-2025"
    assert european_schedule_revision(D(2025, 12, 14)) == "2025-2026"
    assert european_schedule_revision(D(2025, 12, 31)) == "2025-2026"
    assert european_schedule_revision(D(2024, 12, 14)) == "2023-2024"
    assert european_schedule_revision(D(2024, 12, 15)) == "2024-2025"
    # consistency: every day of schedule-year Y maps to revision (Y-1)-Y
    r = european_schedule_year(2026)
    assert european_schedule_revision(r.start) == "2025-2026"
    assert european_schedule_revision(r.end) == "2025-2026"
    assert european_schedule_revision(r.end + datetime.timedelta(days=1)) == "2026-2027"


# -- active_days ------------------------------------------------------------

def test_active_days(feed):
    days = active_days(feed)
    rows = days.filter(F.col("calendar_id") == "D").select("date").collect()
    dates = {r[0] for r in rows}
    assert D(2026, 6, 1) in dates       # a Monday
    assert D(2026, 6, 6) not in dates   # a Saturday
    assert D(2026, 11, 11) not in dates  # holiday REMOVED exception
    c_dates = {
        r[0] for r in days.filter(F.col("calendar_id") == "C").select("date").collect()
    }
    assert D(2026, 11, 11) in c_dates   # holiday ADDED for weekend service
    assert D(2026, 6, 6) in c_dates


def test_simplify_calendars_dedups_identical_sets(spark, feed, rt):
    # clone calendar D as D2 with identical dates and point one trip at it
    cal_d = feed["calendars"].filter(F.col("calendar_id") == "D")
    clone = cal_d.withColumn("calendar_id", F.lit("D2"))
    exc_d = feed["calendar_exceptions"].filter(F.col("calendar_id") == "D")
    exc_clone = exc_d.withColumn("calendar_id", F.lit("D2"))
    feed2 = feed.with_tables({
        "calendars": feed["calendars"].unionByName(clone),
        "calendar_exceptions": feed["calendar_exceptions"].unionByName(exc_clone),
    })
    one_trip = feed2["trips"].limit(1).select("trip_id")
    trips2 = (
        feed2["trips"]
        .join(one_trip.withColumn("__m", F.lit(1)), "trip_id", "left")
        .withColumn("calendar_id",
                    F.when(F.col("__m").isNotNull(), "D2").otherwise(F.col("calendar_id")))
        .drop("__m")
    )
    feed2 = feed2.with_table("trips", trips2)

    out = SimplifyCalendars().transform(feed2, rt)
    ids = {r[0] for r in out["calendars"].select("calendar_id").collect()}
    assert ids == {"C", "D"}  # D2 deduped into D
    assert out["trips"].filter(F.col("calendar_id") == "D2").count() == 0
    assert out["trips"].count() == feed["trips"].count()


def test_truncate_calendars(feed, rt):
    out = TruncateCalendars(
        DateRange.bounded(D(2026, 6, 1), D(2026, 6, 14))
    ).transform(feed, rt)
    days = active_days(out)
    dates = [r[0] for r in days.select("date").distinct().collect()]
    assert min(dates) >= D(2026, 6, 1)
    assert max(dates) <= D(2026, 6, 14)
    # all calendars now exception-based
    cals = out["calendars"].collect()
    assert all(not c["monday"] and not c["sunday"] for c in cals)
    assert all(str(c["start_date"]) == "1111-11-11" for c in cals)


def test_truncate_calendars_empty_raises(feed, rt):
    with pytest.raises(NoServicesLeft):
        TruncateCalendars(
            DateRange.bounded(D(1990, 1, 1), D(1990, 1, 2))
        ).transform(feed, rt)


def test_extend_calendars(feed, rt):
    # feed covers 2026-06-01..2027-05-30; extend 30 days past a year
    out = ExtendCalendars(
        start_date=D(2026, 6, 1),
        duration_days=400,
        holidays={D(2027, 6, 3)},
    ).transform(feed, rt)
    days = active_days(out)
    covered = {r[0] for r in days.select("date").distinct().collect()}
    # every day in the target range is now covered
    missing = [d for d in DateRange.bounded(D(2026, 6, 1), D(2027, 7, 5)) if d not in covered]
    assert missing == []
    # the holiday uses the Sunday template: services active on 2027-06-03
    # must equal those active on the latest covered Sunday
    hol_services = {
        r[0] for r in days.filter(F.col("date") == F.lit("2027-06-03").cast("date"))
        .select("calendar_id").collect()
    }
    assert hol_services == {"C"}  # weekend calendar serves holidays
