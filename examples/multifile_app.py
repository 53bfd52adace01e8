"""A complete MultiFile application — the reference's flagship usage
shape (e.g. examples/radom, examples/warsaw: versioned feeds merged into
one continuous dataset behind a CLI).

Run against any directory of versioned GTFS zips named
``<YYYY-MM-DD>.zip`` (version start date in the name):

    python -m examples.multifile_app --feeds-dir ./feeds --out merged.zip

Demonstrates: provider-driven version discovery, conditional fetch +
intermediate snapshot caching (second run with unchanged inputs exits 2),
per-version truncation, Merge, post-merge curation, GTFS export.
"""

from __future__ import annotations

import argparse
import datetime
import os

from impuls_spark.app import App
from impuls_spark.feed import FeedDataset
from impuls_spark.multi_file import IntermediateFeed, MultiFile
from impuls_spark.operators import GenerateTripHeadsign, RemoveUnusedEntities
from impuls_spark.pipeline import Pipeline
from impuls_spark.resource import LocalResource
from impuls_spark.sources import save_gtfs
from impuls_spark.task import BaseTask, TaskRuntime

GTFS_HEADERS = {
    "agency.txt": ["agency_id", "agency_name", "agency_url", "agency_timezone"],
    "routes.txt": ["route_id", "agency_id", "route_short_name", "route_long_name",
                   "route_type"],
    "stops.txt": ["stop_id", "stop_name", "stop_lat", "stop_lon"],
    "trips.txt": ["route_id", "service_id", "trip_id", "trip_headsign"],
    "stop_times.txt": ["trip_id", "arrival_time", "departure_time", "stop_id",
                       "stop_sequence"],
    "calendar_dates.txt": ["service_id", "date", "exception_type"],
}


class SaveMerged(BaseTask):
    def __init__(self, target: str) -> None:
        self.target = target

    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        save_gtfs(feed, GTFS_HEADERS, self.target, ensure_order=True)
        return feed


class MultiFileApp(App):
    name = "multifile_merge"

    def add_arguments(self, parser: argparse.ArgumentParser) -> None:
        parser.add_argument("--feeds-dir", required=True,
                            help="directory of <YYYY-MM-DD>.zip version feeds")
        parser.add_argument("--out", default="merged.zip")

    def prepare(self, args: argparse.Namespace, options) -> Pipeline:
        def provider() -> list[IntermediateFeed]:
            feeds = []
            for name in sorted(os.listdir(args.feeds_dir)):
                if not name.endswith(".zip"):
                    continue
                start = datetime.date.fromisoformat(name.removesuffix(".zip"))
                feeds.append(IntermediateFeed(
                    LocalResource(os.path.join(args.feeds_dir, name)),
                    version=name.removesuffix(".zip"),
                    start_date=start,
                ))
            return feeds

        mf = MultiFile(
            provider=provider,
            final_pipeline_tasks_factory=lambda: [
                GenerateTripHeadsign(),
                RemoveUnusedEntities(),
                SaveMerged(args.out),
            ],
            options=options,
        )

        class RunMultiFile(BaseTask):
            def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
                return mf.run(runtime.spark)

        return Pipeline([RunMultiFile()], options=options)


if __name__ == "__main__":
    raise SystemExit(MultiFileApp().run())
