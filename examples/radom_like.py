"""Radom-shaped minimal MultiFile app — the simplest provider in the
reference's examples matrix (/root/reference/examples/radom): versioned
BusMan MDB exports discovered by a provider, loaded per-version by
LoadBusManMDB, lightly curated with raw SQL, calendars generated from
the BusMan day-type names, stop positions patched from a side CSV, and
the merged result exported to GTFS.

Differences from the reference, by design:

- the provider reads a local directory of ``Rozklady-<YYYY-MM-DD>.mdb``
  files instead of scraping a city website (no network in examples);
  superseded versions are still pruned via ``MultiFile.for_date``
  exactly like the reference's ``prune_outdated_feeds``
  (examples/radom/provider.py:49).
- ``GenerateCalendars`` keeps only the weekday-pattern half of the
  reference task (examples/radom/generate_calendars.py); the
  Polish-holiday exception machinery lives in the engine as
  ``ExtendCalendarsFromPolishExceptions`` and is exercised by its own
  tests.

Usage:

    python -m examples.radom_like --feeds-dir ./mdbs \
        --soap-stops soap_stops.csv --out radom.zip
"""

from __future__ import annotations

import argparse
import datetime
import os
import re

from pyspark.sql import functions as F

from impuls_spark.app import App
from impuls_spark.feed import FeedDataset
from impuls_spark.multi_file import IntermediateFeed, MultiFile
from impuls_spark.operators import AddEntity, ExecuteSQL, ModifyStopsFromCSV
from impuls_spark.pipeline import Pipeline
from impuls_spark.resource import LocalResource
from impuls_spark.sources import save_gtfs
from impuls_spark.sources.busman import LoadBusManMDB, _mdb_export
from impuls_spark.task import BaseTask, TaskRuntime

#: reference examples/radom/__main__.py GTFS_HEADERS
GTFS_HEADERS = {
    "agency.txt": ["agency_id", "agency_name", "agency_url",
                   "agency_timezone", "agency_lang"],
    "stops.txt": ["stop_id", "stop_name", "stop_lat", "stop_lon"],
    "routes.txt": ["agency_id", "route_id", "route_short_name",
                   "route_long_name", "route_type"],
    "trips.txt": ["route_id", "service_id", "trip_id"],
    "stop_times.txt": ["trip_id", "stop_sequence", "stop_id",
                       "arrival_time", "departure_time"],
    "calendar.txt": ["service_id", "start_date", "end_date", "monday",
                     "tuesday", "wednesday", "thursday", "friday",
                     "saturday", "sunday", "service_desc"],
    "calendar_dates.txt": ["service_id", "date", "exception_type"],
}

#: stop ids the reference's RemoveUnknownStops statement deletes
UNKNOWN_STOP_IDS = ("649", "652", "653", "659", "662")

#: BusMan day-type name -> (mon..sun) flags
#: (reference examples/radom/generate_calendars.py day-type mapping)
DAY_TYPE_FLAGS = {
    "POWSZEDNI": (True, True, True, True, True, False, False),
    "SOBOTA": (False, False, False, False, False, True, False),
    "NIEDZIELA": (False, False, False, False, False, False, True),
}

_WEEKDAYS = ("monday", "tuesday", "wednesday", "thursday", "friday",
             "saturday", "sunday")


class GenerateCalendars(BaseTask):
    """Give every retained BusMan calendar its weekday pattern and a
    one-year validity window from the version's start date. The window
    is then clipped per-version by MultiFile's TruncateCalendars."""

    def __init__(self, start_date: datetime.date) -> None:
        self.start_date = start_date

    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        cal = feed["calendars"]
        for i, day in enumerate(_WEEKDAYS):
            flag = F.lit(False)
            for desc, flags in DAY_TYPE_FLAGS.items():
                flag = F.when(F.col("desc") == desc, F.lit(flags[i])).otherwise(flag)
            cal = cal.withColumn(day, flag)
        cal = cal.withColumn("start_date", F.lit(self.start_date)).withColumn(
            "end_date", F.lit(self.start_date + datetime.timedelta(days=365))
        )
        return feed.with_table("calendars", cal)


class SaveRadomGTFS(BaseTask):
    def __init__(self, target: str) -> None:
        self.target = target

    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        save_gtfs(feed, GTFS_HEADERS, self.target, ensure_order=True)
        return feed


def local_mdb_provider(feeds_dir: str):
    """Discover ``Rozklady-<YYYY-MM-DD>.mdb`` versions (the reference
    scrapes the same names off the MZDiK site, provider.py:33-46)."""

    def provider() -> list[IntermediateFeed]:
        feeds = []
        for name in sorted(os.listdir(feeds_dir)):
            m = re.fullmatch(r"Rozklady-(\d{4}-\d{2}-\d{2})\.mdb", name)
            if not m:
                continue
            feeds.append(IntermediateFeed(
                LocalResource(os.path.join(feeds_dir, name)),
                version=m[1],
                start_date=datetime.date.fromisoformat(m[1]),
                resource_name=name,
            ))
        return feeds

    return provider


def build_multi_file(
    feeds_dir: str,
    soap_stops_csv: str,
    out_path: str,
    options,
    *,
    exporter=_mdb_export,
    for_date: datetime.date | None = None,
) -> MultiFile:
    return MultiFile(
        provider=local_mdb_provider(feeds_dir),
        # the feed is built BY tasks (reference shape): start empty,
        # LoadBusManMDB fills it from the version's fetched resource
        loader=lambda spark, path: FeedDataset.empty(spark),
        intermediate_pipeline_tasks_factory=lambda feed: [
            AddEntity("agencies", {
                "agency_id": "0", "name": "MZDiK Example",
                "url": "https://example.invalid/", "timezone": "Europe/Warsaw",
                "lang": "pl",
            }),
            AddEntity("feed_info", {
                "feed_info_id": "0", "publisher_name": "radom_like",
                "publisher_url": "https://example.invalid/gtfs/",
                "lang": "pl", "version": feed.version,
            }),
            LoadBusManMDB(feed.resource_name, agency_id="0",
                          ignore_route_id=True, exporter=exporter),
            ExecuteSQL(statement=(
                "DELETE FROM stops WHERE stop_id IN ('"
                + "', '".join(UNKNOWN_STOP_IDS) + "')"
            )),
            ExecuteSQL(statement=(
                "DELETE FROM calendars WHERE desc NOT IN "
                "('POWSZEDNI', 'SOBOTA', 'NIEDZIELA')"
            )),
            GenerateCalendars(feed.start_date),
            ModifyStopsFromCSV("soap_stops.csv"),
        ],
        final_pipeline_tasks_factory=lambda: [SaveRadomGTFS(out_path)],
        additional_resources={"soap_stops.csv": LocalResource(soap_stops_csv)},
        options=options,
        for_date=for_date,
    )


class RadomLikeApp(App):
    name = "radom_like"

    def add_arguments(self, parser: argparse.ArgumentParser) -> None:
        parser.add_argument("--feeds-dir", required=True)
        parser.add_argument("--soap-stops", required=True)
        parser.add_argument("--out", default="radom.zip")

    def prepare(self, args: argparse.Namespace, options) -> Pipeline:
        mf = build_multi_file(args.feeds_dir, args.soap_stops, args.out, options)

        class RunMultiFile(BaseTask):
            def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
                return mf.run(runtime.spark)

        return Pipeline([RunMultiFile()], options=options)


if __name__ == "__main__":
    raise SystemExit(RadomLikeApp().run())
