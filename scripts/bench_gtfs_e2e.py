"""GTFS end-to-end benchmark: load -> GenerateTripHeadsign -> save,
the regression reference called for by BASELINE.md.

Usage: python scripts/bench_gtfs_e2e.py [trips_per_route ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADERS = {
    "agency.txt": ["agency_id", "agency_name", "agency_url", "agency_timezone"],
    "routes.txt": ["route_id", "agency_id", "route_short_name", "route_type"],
    "stops.txt": ["stop_id", "stop_name", "stop_lat", "stop_lon"],
    "trips.txt": ["route_id", "service_id", "trip_id", "trip_headsign"],
    "stop_times.txt": ["trip_id", "arrival_time", "departure_time", "stop_id",
                       "stop_sequence"],
    "calendar.txt": ["service_id", "monday", "tuesday", "wednesday", "thursday",
                     "friday", "saturday", "sunday", "start_date", "end_date"],
}


def main() -> None:
    from pyspark.sql import SparkSession

    from impuls_spark.operators import GenerateTripHeadsign
    from impuls_spark.sources import load_gtfs, save_gtfs
    from impuls_spark.task import TaskRuntime
    from tests.fixtures.make_feed import write_feed

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("gtfs_e2e_bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rt = TaskRuntime(spark)

    sizes = [int(a) for a in sys.argv[1:]] or [62, 620]
    results = {}
    for tpr in sizes:
        work = tempfile.mkdtemp(prefix=f"gtfs_e2e_{tpr}_")
        t0 = time.time()
        write_feed(os.path.join(work, "feed"), trips_per_route=tpr)
        t_gen = time.time() - t0

        t0 = time.time()
        feed = load_gtfs(spark, os.path.join(work, "feed"))
        out = GenerateTripHeadsign().transform(feed, rt)
        save_gtfs(out, HEADERS, os.path.join(work, "out.zip"), ensure_order=True)
        t_run = time.time() - t0

        n_st = sum(1 for _ in open(os.path.join(work, "feed", "stop_times.txt"))) - 1
        results[f"trips={tpr * 3}"] = {
            "stop_times": n_st,
            "gen_sec": round(t_gen, 2),
            "load_transform_save_sec": round(t_run, 2),
            "rows_per_sec": int(n_st / t_run),
        }
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
