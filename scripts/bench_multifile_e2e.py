"""MultiFile (warsaw-shaped) end-to-end benchmark at generator scale
(VERDICT r6 item 8): versioned GTFS inputs -> per-version curation ->
Merge -> SaveGTFS, timed wall-clock at the fixture size and at 10x
(trips_per_route=620, the same x10 knob bench_gtfs_e2e.py uses), with
a plan sanity pass over the merged tables.

Usage: python scripts/bench_multifile_e2e.py [trips_per_route ...]
Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import shutil
import sys
import tempfile
import time
from datetime import date

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from pyspark.sql import SparkSession

    from examples.warsaw_like import build_multi_file
    from impuls_spark.task import PipelineOptions
    from tests.fixtures.make_feed import write_feed

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("multifile_e2e_bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sizes = [int(a) for a in sys.argv[1:]] or [62, 620]
    results = {}
    for tpr in sizes:
        base = tempfile.mkdtemp(prefix=f"mf_e2e_{tpr}_")
        feeds = os.path.join(base, "feeds")
        os.makedirs(feeds)

        def v2(rows):
            for c in rows["calendar.txt"]:
                c["start_date"] = "20270601"
                c["end_date"] = "20280530"

        write_feed(os.path.join(feeds, "2026-06-01.zip"),
                   trips_per_route=tpr)
        write_feed(os.path.join(feeds, "2027-06-01.zip"),
                   trips_per_route=tpr, mutate=v2)
        out = os.path.join(base, "merged.zip")
        ws = os.path.join(base, "ws")

        t0 = time.monotonic()
        mf = build_multi_file(
            feeds, out, None,
            PipelineOptions(workspace_directory=ws),
            for_date=date(2026, 6, 1),
        )
        mf.run(spark)
        elapsed = round(time.monotonic() - t0, 2)
        size_mb = round(os.path.getsize(out) / 1e6, 2)
        results[str(tpr)] = {"sec": elapsed, "zip_mb": size_mb}
        print(f"# trips_per_route={tpr}: {elapsed}s, {size_mb} MB",
              file=sys.stderr)
        shutil.rmtree(base, ignore_errors=True)

    # plan sanity over a directly-constructed merge of the two versions
    # (the MultiFile itself runs eagerly through snapshots)
    from impuls_spark.operators.merge import Merge
    from impuls_spark.sources import load_gtfs
    from impuls_spark.task import TaskRuntime

    base = tempfile.mkdtemp(prefix="mf_plan_")
    write_feed(os.path.join(base, "a"))
    write_feed(os.path.join(base, "b"))
    fa = load_gtfs(spark, os.path.join(base, "a"))
    fb = load_gtfs(spark, os.path.join(base, "b"))
    merged = Merge([("a", fa), ("b", fb)]).merged(TaskRuntime(spark))
    flags = {}
    for tbl in ("stops", "trips", "stop_times", "transfers",
                "translations"):
        p = _plan(merged[tbl])
        flags[tbl] = {
            "single_partition_exchange": "Exchange SinglePartition" in p,
            "cartesian": "CartesianProduct" in p,
        }
    shutil.rmtree(base, ignore_errors=True)

    print(json.dumps({
        "metric": "multifile_e2e",
        "unit": "sec",
        "sizes": results,
        "merged_plan_flags": flags,
    }))


if __name__ == "__main__":
    raise SystemExit(main())
