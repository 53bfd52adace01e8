"""Calendar suite: active-days materialization + Simplify / Truncate /
Extend calendars.

All three operators share one building block, :func:`active_days` — the
(calendar_id, date) DataFrame of every service-active date, combining
weekday-ranged calendars with ADDED/REMOVED exceptions. This mirrors
the reference's ``Calendar.compute_active_dates`` (impuls/model/
calendar.py:140-157) + ``CalendarException.reflect_in_active_dates``
(impuls/model/calendar_exception.py:87-103), but set-at-once instead of
per-calendar Python loops.

Scale note: |calendars| × |days in range| rows — bounded by schedule
length (≤ a few thousand days), never by trip volume; the heavy tables
are touched only via semi-joins on calendar_id.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import schema as S
from ..errors import ImpulsError
from ..feed import FeedDataset
from ..task import BaseTask, TaskRuntime
from ..tools.temporal import DateRange


class NoServicesLeft(ImpulsError):
    """Truncation removed every active date (reference
    impuls/tasks/truncate_calendars.py:11-17)."""


_WEEKDAY_FLAGS = ("monday", "tuesday", "wednesday", "thursday", "friday",
                  "saturday", "sunday")


def active_days(feed: FeedDataset) -> DataFrame:
    """(calendar_id, date) for every active service date."""
    cal = feed["calendars"]
    sentinel = F.lit(str(S.SIGNALS_EXCEPTIONS)).cast("date")

    ranged = cal.filter(
        (F.col("start_date") != sentinel) & (F.col("end_date") >= F.col("start_date"))
    )
    exploded = ranged.select(
        "calendar_id",
        *_WEEKDAY_FLAGS,
        F.explode(F.sequence("start_date", "end_date")).alias("date"),
    )
    # dayofweek: 1=Sunday ... 7=Saturday
    wd = F.dayofweek("date")
    flag = (
        F.when(wd == 2, F.col("monday"))
        .when(wd == 3, F.col("tuesday"))
        .when(wd == 4, F.col("wednesday"))
        .when(wd == 5, F.col("thursday"))
        .when(wd == 6, F.col("friday"))
        .when(wd == 7, F.col("saturday"))
        .otherwise(F.col("sunday"))
    )
    base = exploded.filter(flag).select("calendar_id", "date")

    exc = feed["calendar_exceptions"]
    added = exc.filter(F.col("exception_type") == int(S.ExceptionType.ADDED)).select(
        "calendar_id", "date"
    )
    removed = exc.filter(F.col("exception_type") == int(S.ExceptionType.REMOVED)).select(
        "calendar_id", "date"
    )
    return (
        base.unionByName(added).distinct()
        .join(removed, ["calendar_id", "date"], "left_anti")
    )


def _exception_based_calendars(feed: FeedDataset, keep_ids: DataFrame) -> DataFrame:
    """Rewrite the calendars table as purely exception-based rows
    (all-False weekdays + sentinel dates), keeping the ids in
    ``keep_ids`` and preserving ``desc``/extra fields."""
    sentinel = F.lit(str(S.SIGNALS_EXCEPTIONS)).cast("date")
    out = feed["calendars"].join(keep_ids, "calendar_id", "left_semi")
    for day in _WEEKDAY_FLAGS:
        out = out.withColumn(day, F.lit(False))
    return out.withColumn("start_date", sentinel).withColumn("end_date", sentinel)


def _days_to_exceptions(days: DataFrame) -> DataFrame:
    """(calendar_id, date) -> ADDED calendar_exceptions rows."""
    return days.select(
        "calendar_id",
        "date",
        F.lit(int(S.ExceptionType.ADDED)).alias("exception_type"),
        F.lit(None).cast(S.TABLES["calendar_exceptions"].schema["extra_fields"].dataType).alias("extra_fields"),
    )


class SimplifyCalendars(BaseTask):
    """Dedup calendars by identical active-date sets; repoint trips to
    the canonical (lowest-id) calendar of each group and drop the rest.

    Parity target: impuls/tasks/simplify_calendars.py:11-90. The
    content-hash dedup pattern: group by the value, keep first, remap
    references via a mapping DataFrame.
    """

    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        days = active_days(feed)
        sets = days.groupBy("calendar_id").agg(
            F.sort_array(F.collect_set("date")).alias("__dates")
        )
        # calendars with zero active dates form their own group
        all_ids = feed["calendars"].select("calendar_id")
        sets = all_ids.join(sets, "calendar_id", "left").withColumn(
            "__dates", F.coalesce(F.col("__dates"), F.array())
        )
        w = Window.partitionBy("__dates")
        mapping = sets.select(
            "calendar_id",
            F.min("calendar_id").over(w).alias("__canonical"),
        )

        trips = (
            feed["trips"]
            .join(mapping, "calendar_id", "left")
            .withColumn("calendar_id", F.coalesce(F.col("__canonical"), F.col("calendar_id")))
            .drop("__canonical")
        )
        keep = mapping.filter(F.col("calendar_id") == F.col("__canonical")).select(
            "calendar_id"
        )
        calendars = feed["calendars"].join(keep, "calendar_id", "left_semi")
        feed = feed.with_table("trips", trips)
        return feed.cascade_delete("calendars", calendars)


class TruncateCalendars(BaseTask):
    """Intersect every calendar's active dates with ``date_range``; drop
    newly-empty calendars (cascading); rewrite all calendars as
    exception-based. Raises :class:`NoServicesLeft` when nothing
    survives (reference impuls/tasks/truncate_calendars.py:19-110)."""

    def __init__(self, date_range: DateRange) -> None:
        self.range = date_range

    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        days = active_days(feed)
        cond = F.lit(True)
        if self.range.start is not None:
            cond = cond & (F.col("date") >= F.lit(str(self.range.start)).cast("date"))
        if self.range.end is not None:
            cond = cond & (F.col("date") <= F.lit(str(self.range.end)).cast("date"))
        kept_days = days.filter(cond)

        if kept_days.limit(1).count() == 0:
            raise NoServicesLeft(f"no active service dates within {self.range}")

        keep_ids = kept_days.select("calendar_id").distinct()
        calendars = _exception_based_calendars(feed, keep_ids)
        feed = feed.cascade_delete("calendars", calendars)
        return feed.with_table("calendar_exceptions", _days_to_exceptions(kept_days))


class ExtendCalendars(BaseTask):
    """Extend service coverage to ``duration_days`` from ``start_date``
    by copying, onto every uncovered day, the active-service set of the
    latest covered day with the same weekday.

    Parity target: impuls/tasks/extend_calendars.py:17-221. Mirrored
    semantics: holidays are never copy *sources*; a holiday (or any
    uncovered Sunday-like day) uses the Sunday template; per-weekday
    fallback when a weekday never occurs in the covered window
    (extend_calendars.py:35-43): Mon-Fri fall back to the nearest
    covered weekday, Saturday to Sunday, Sunday to Saturday. All
    calendars are rewritten exception-based.
    """

    #: reference DEFAULT_FALLBACK_WEEKDAYS (extend_calendars.py:35-43)
    _FALLBACKS = {
        "Mon": ("Tue", "Wed", "Thu", "Fri"),
        "Tue": ("Wed", "Thu", "Mon", "Fri"),
        "Wed": ("Tue", "Thu", "Mon", "Fri"),
        "Thu": ("Wed", "Tue", "Mon", "Fri"),
        "Fri": ("Thu", "Wed", "Tue", "Mon"),
        "Sat": ("Sun",),
        "Sun": ("Sat",),
    }

    def __init__(
        self,
        start_date: datetime.date,
        duration_days: int,
        holidays: "set[datetime.date] | None" = None,
    ) -> None:
        self.start_date = start_date
        self.duration_days = duration_days
        self.holidays = holidays or set()

    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        spark = runtime.spark
        days = active_days(feed)

        # no-op guard (reference is_extension_necessary,
        # extend_calendars.py:185): when the expected window already
        # lies inside the covered span, do NOT rewrite — days inside
        # the span with no service are intentionally serviceless
        bounds = days.agg(F.min("date"), F.max("date")).collect()[0]
        cur_min, cur_max = bounds[0], bounds[1]
        expected_end = self.start_date + datetime.timedelta(days=self.duration_days)
        if (cur_min is not None and cur_min <= self.start_date
                and cur_max is not None and expected_end <= cur_max):
            return feed

        holidays = sorted(self.holidays)
        hol_lit = [str(d) for d in holidays]

        # per-weekday latest covered non-holiday day (template source) —
        # 7 rows of metadata, collected driver-side by design
        non_holiday = days
        if hol_lit:
            non_holiday = days.filter(~F.col("date").cast("string").isin(hol_lit))
        latest = (
            non_holiday.select(F.date_format("date", "E").alias("wd"), "date")
            .groupBy("wd").agg(F.max("date").alias("src_date"))
            .collect()
        )
        src_by_wd = {r["wd"]: r["src_date"] for r in latest}

        def source_for(wd: str) -> datetime.date | None:
            if wd in src_by_wd:
                return src_by_wd[wd]
            for fb in self._FALLBACKS[wd]:
                if fb in src_by_wd:
                    return src_by_wd[fb]
            return None

        covered = {r[0] for r in days.select("date").distinct().collect()}
        # inclusive end: the window is start .. start+duration_days
        # (duration_days+1 days, reference compute_coverages,
        # extend_calendars.py:180-183)
        target = DateRange.bounded(self.start_date, expected_end)
        new_pairs: list[tuple[datetime.date, datetime.date]] = []  # (target, source)
        for d in target:
            if d in covered:
                continue
            wd = "Sun" if d in self.holidays else d.strftime("%a")
            src = source_for(wd)
            if src is not None:
                new_pairs.append((d, src))

        feed_days = days
        if new_pairs:
            pairs_df = spark.createDataFrame(new_pairs, "target date, src_date date")
            copied = (
                days.withColumnRenamed("date", "src_date")
                .join(F.broadcast(pairs_df), "src_date")
                .select("calendar_id", F.col("target").alias("date"))
            )
            feed_days = days.unionByName(copied)

        keep_ids = feed_days.select("calendar_id").distinct()
        calendars = _exception_based_calendars(feed, keep_ids)
        feed = feed.cascade_delete("calendars", calendars)
        return feed.with_table("calendar_exceptions", _days_to_exceptions(feed_days))


class ExtendCalendarsFromPolishExceptions(ExtendCalendars):
    """ExtendCalendars with holidays loaded from the published CSV of
    Polish calendar exceptions (reference impuls/tasks/
    extend_calendars.py:223-249 + impuls/tools/
    polish_calendar_exceptions.py:59-84).

    CSV shape, matching the published sheet the reference consumes:
    ``date`` (YYYY-MM-DD); ``regions`` — dot-separated voivodeship
    codes, empty = nationwide; ``exception`` — dot-separated set from
    {holiday, no_school, commercial_sunday}; ``summer_holidays``;
    ``holiday_name``. Only rows whose exception set contains
    ``holiday`` (and that apply in ``region``) become holidays.
    """

    def __init__(
        self,
        start_date: datetime.date,
        duration_days: int,
        csv_path: str,
        region: str | None = None,
    ) -> None:
        import csv as _csv

        holidays: set[datetime.date] = set()
        with open(csv_path, newline="", encoding="utf-8") as fh:
            for row in _csv.DictReader(fh):
                regions = (row.get("regions") or "").strip()
                if region and regions and region not in regions.split("."):
                    continue
                exc_set = set((row.get("exception") or "").split("."))
                if "holiday" in exc_set:
                    holidays.add(datetime.date.fromisoformat(row["date"]))
        super().__init__(start_date, duration_days, holidays)
