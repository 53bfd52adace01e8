"""A/B the GTFS export tail (VERDICT r14 next-round #4): time
``save_gtfs`` to a ZIP target vs a DIRECTORY target on a feed large
enough that the zip stitch is data-proportional, min-of-N. Run once at
HEAD (parallel per-entry deflate + precompressed stitch) and once in a
worktree at the prior commit (single-thread deflate stitch) for the
before/after pair; the byte-identity of the zip itself is pinned by
tests/test_gtfs_roundtrip.py::test_gtfs_zip_parallel_assembly_is_byte_identical.

Usage: python scripts/ab_zip_assembly.py [trips_per_route] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADERS = {
    "agency.txt": ["agency_id", "agency_name", "agency_url",
                   "agency_timezone"],
    "routes.txt": ["route_id", "agency_id", "route_short_name",
                   "route_type"],
    "stops.txt": ["stop_id", "stop_name", "stop_lat", "stop_lon"],
    "trips.txt": ["route_id", "service_id", "trip_id", "trip_headsign"],
    "stop_times.txt": ["trip_id", "arrival_time", "departure_time",
                       "stop_id", "stop_sequence"],
    "calendar.txt": ["service_id", "monday", "tuesday", "wednesday",
                     "thursday", "friday", "saturday", "sunday",
                     "start_date", "end_date"],
}


def main() -> None:
    tpr = int(sys.argv[1]) if len(sys.argv) > 1 else 6200
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import SparkSession

    from impuls_spark.sources import load_gtfs, save_gtfs
    from tests.fixtures.make_feed import write_feed

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab_zip_assembly")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix=f"ab_zip_{tpr}_")
    write_feed(os.path.join(work, "feed"), trips_per_route=tpr)
    feed = load_gtfs(spark, os.path.join(work, "feed"))
    n_st = sum(1 for _ in open(
        os.path.join(work, "feed", "stop_times.txt"))) - 1

    out: dict = {"trips_per_route": tpr, "stop_times_rows": n_st}
    for mode, target in (("zip", "out.zip"), ("dir", "outdir")):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            save_gtfs(feed, HEADERS, os.path.join(work, target),
                      ensure_order=True)
            ts.append(round(time.time() - t0, 3))
        out[f"save_{mode}"] = {"min": min(ts), "reps": ts}
    out["zip_bytes"] = os.path.getsize(os.path.join(work, "out.zip"))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
