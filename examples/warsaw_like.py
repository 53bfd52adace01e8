"""A Warsaw-shaped end-to-end application: versioned feeds through
MultiFile, per-version curation (railway-station consolidation, stop
location patching), and a final merged GTFS export.

This mirrors the reference's flagship production pipeline
(``/root/reference/examples/warsaw/__main__.py``): a MultiFile whose
intermediate pipelines run ImportZTM + AddEntity(FeedInfo) +
MergeRailwayStations + FixStopLocations + GenerateTripHeadsign +
RemoveStopsWithoutLocations + RemoveUnusedEntities, and whose final
pipeline is SaveGTFS. Here the input versions are plain GTFS zips (the
ZTM TXT parser is a bespoke format outside the engine surface), but
every curation step keeps the reference's semantics:

- ``MergeRailwayStations`` — reference
  ``examples/warsaw/merge_railway_stations.py:12-46``: stops whose
  ``substr(stop_id, 2, 2)`` is a railway code collapse into one station
  per 4-char stop-id prefix (name with trailing digits stripped,
  averaged position); ``stop_times`` repoint to the prefix. Orphaned
  platform stops are left for ``RemoveUnusedEntities``, as the
  reference notes.
- ``FixStopLocations`` — reference
  ``examples/warsaw/fix_stop_locations.py``: patch stop lat/lon from a
  ``{stop_id: [lat, lon]}`` JSON resource (an additional, non-versioned
  MultiFile resource, like the reference's curated GitHub JSON).
- ``RemoveStopsWithoutLocations`` — reference
  ``examples/warsaw/remove_stops_without_locations.py``: delete stops
  at (0, 0).

Run:

    python -m examples.warsaw_like --feeds-dir ./feeds \\
        --stop-locations ./missing_stop_locations.json --out warsaw.zip
"""

from __future__ import annotations

import argparse
import datetime
import json
import os

from pyspark.sql import functions as F

from impuls_spark.app import App
from impuls_spark.feed import FeedDataset
from impuls_spark.multi_file import IntermediateFeed, MultiFile
from impuls_spark.operators import AddEntity, GenerateTripHeadsign, RemoveUnusedEntities
from impuls_spark.pipeline import Pipeline
from impuls_spark.resource import LocalResource
from impuls_spark.sources import save_gtfs
from impuls_spark.task import BaseTask, TaskRuntime

GTFS_HEADERS = {
    "agency.txt": ["agency_id", "agency_name", "agency_url", "agency_timezone"],
    "stops.txt": ["stop_id", "stop_name", "stop_lat", "stop_lon", "zone_id",
                  "wheelchair_boarding"],
    "routes.txt": ["agency_id", "route_id", "route_short_name",
                   "route_long_name", "route_type", "route_color",
                   "route_text_color"],
    "trips.txt": ["route_id", "service_id", "trip_id", "trip_headsign",
                  "direction_id", "wheelchair_accessible"],
    "stop_times.txt": ["trip_id", "stop_sequence", "stop_id", "arrival_time",
                       "departure_time", "pickup_type", "drop_off_type"],
    "calendar.txt": ["service_id", "monday", "tuesday", "wednesday",
                     "thursday", "friday", "saturday", "sunday",
                     "start_date", "end_date"],
    "calendar_dates.txt": ["service_id", "date", "exception_type"],
    "feed_info.txt": ["feed_publisher_name", "feed_publisher_url",
                      "feed_lang", "feed_version"],
}

RAILWAY_CODES = ("90", "91", "92", "93")


class MergeRailwayStations(BaseTask):
    """Collapse railway platform stops into one station per 4-char
    stop-id prefix (reference merge_railway_stations.py:12-46).

    Spark plan: one groupBy on the prefix over the (dimension-sized)
    railway subset — ``min_by`` picks the reference's "first row"
    deterministically — plus a codegen'd conditional rewrite of
    ``stop_times.stop_id``. No Python in the row path.
    """

    def __init__(self, codes: tuple[str, ...] = RAILWAY_CODES) -> None:
        self.codes = tuple(codes)

    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        stops = feed["stops"]
        is_rail = F.substring("stop_id", 2, 2).isin(*self.codes)
        merged = (
            stops.filter(is_rail)
            .groupBy(F.substring("stop_id", 1, 4).alias("stop_id"))
            .agg(
                # rtrim(name, ' 0123456789') on the first member's name
                F.regexp_replace(
                    F.min_by("name", "stop_id"), r"[ 0-9]+$", ""
                ).alias("name"),
                F.avg("lat").alias("lat"),
                F.avg("lon").alias("lon"),
                F.min_by("zone_id", "stop_id").alias("zone_id"),
                F.min_by("wheelchair_boarding", "stop_id").alias(
                    "wheelchair_boarding"
                ),
            )
            .withColumn("location_type", F.lit(0))
        )
        st = feed["stop_times"]
        repointed = st.withColumn(
            "stop_id",
            F.when(
                F.substring("stop_id", 2, 2).isin(*self.codes),
                F.substring("stop_id", 1, 4),
            ).otherwise(F.col("stop_id")),
        )
        # platform stops become unused and fall to RemoveUnusedEntities,
        # exactly like the reference (merge_railway_stations.py:46)
        return feed.insert("stops", merged).with_table("stop_times", repointed)


class FixStopLocations(BaseTask):
    """Patch stop positions from a ``{stop_id: [lat, lon]}`` JSON
    resource (reference fix_stop_locations.py). Unknown stop_ids are
    no-ops, matching the reference's UPDATE-by-PK loop — expressed here
    as one broadcast join instead of N driver statements."""

    def __init__(self, stop_locations_resource: str) -> None:
        self.stop_locations_resource = stop_locations_resource

    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        path = runtime.resources[self.stop_locations_resource].path
        with open(path, encoding="utf-8") as fh:
            patches = json.load(fh)
        if not patches:
            return feed
        patch_df = runtime.spark.createDataFrame(
            [(k, float(v[0]), float(v[1])) for k, v in patches.items()],
            "stop_id string, __lat double, __lon double",
        )
        stops = feed["stops"]
        fixed = (
            stops.join(F.broadcast(patch_df), "stop_id", "left")
            .withColumn("lat", F.coalesce("__lat", "lat"))
            .withColumn("lon", F.coalesce("__lon", "lon"))
            .drop("__lat", "__lon")
            .select(*stops.columns)
        )
        return feed.with_table("stops", fixed)


class RemoveStopsWithoutLocations(BaseTask):
    """DELETE FROM stops WHERE lat = 0 AND lon = 0 (reference
    remove_stops_without_locations.py). The reference's SQLite schema
    cascades the delete into stop_times; ``cascade_delete`` is the
    explicit analog."""

    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        kept = feed["stops"].filter(
            ~((F.col("lat") == 0.0) & (F.col("lon") == 0.0))
        )
        return feed.cascade_delete("stops", kept)


class SaveMerged(BaseTask):
    def __init__(self, target: str) -> None:
        self.target = target

    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        save_gtfs(feed, GTFS_HEADERS, self.target, ensure_order=True)
        return feed


def build_multi_file(
    feeds_dir: str,
    out: str,
    stop_locations: str | None,
    options,
    for_date: datetime.date | None = None,
) -> MultiFile:
    """The Warsaw wiring (reference __main__.py:64-99): versioned inputs
    from a provider, curation per intermediate, SaveGTFS at the end."""

    def provider() -> list[IntermediateFeed]:
        feeds = []
        for name in sorted(os.listdir(feeds_dir)):
            if not name.endswith(".zip"):
                continue
            start = datetime.date.fromisoformat(name.removesuffix(".zip"))
            feeds.append(IntermediateFeed(
                LocalResource(os.path.join(feeds_dir, name)),
                version=name.removesuffix(".zip"),
                start_date=start,
            ))
        return feeds

    def intermediate_tasks(feed: IntermediateFeed):
        tasks = [
            AddEntity("feed_info", {
                "feed_info_id": "0",
                "publisher_name": "impuls_spark example",
                "publisher_url": "https://example.invalid/gtfs/",
                "lang": "pl",
                "version": feed.version,
            }),
            MergeRailwayStations(),
        ]
        if stop_locations:
            tasks.append(FixStopLocations("stop_locations.json"))
        tasks += [
            GenerateTripHeadsign(),
            RemoveStopsWithoutLocations(),
            RemoveUnusedEntities(),
        ]
        return tasks

    return MultiFile(
        provider=provider,
        intermediate_pipeline_tasks_factory=intermediate_tasks,
        final_pipeline_tasks_factory=lambda: [SaveMerged(out)],
        additional_resources=(
            {"stop_locations.json": LocalResource(stop_locations)}
            if stop_locations else {}
        ),
        options=options,
        for_date=for_date,
    )


class WarsawLikeApp(App):
    name = "warsaw_like"

    def add_arguments(self, parser: argparse.ArgumentParser) -> None:
        parser.add_argument("--feeds-dir", required=True,
                            help="directory of <YYYY-MM-DD>.zip version feeds")
        parser.add_argument("--stop-locations", default=None,
                            help="JSON file of {stop_id: [lat, lon]} patches")
        parser.add_argument("--out", default="warsaw.zip")
        parser.add_argument("--for-date", default=None,
                            help="prune versions superseded before this date")

    def prepare(self, args: argparse.Namespace, options) -> Pipeline:
        mf = build_multi_file(
            args.feeds_dir,
            args.out,
            args.stop_locations,
            options,
            for_date=(
                datetime.date.fromisoformat(args.for_date)
                if args.for_date else None
            ),
        )

        class RunMultiFile(BaseTask):
            def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
                return mf.run(runtime.spark)

        return Pipeline([RunMultiFile()], options=options)


if __name__ == "__main__":
    raise SystemExit(WarsawLikeApp().run())
