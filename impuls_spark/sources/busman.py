"""LoadBusManMDB — niche connector for BusMan MS-Access databases.

Parity target: reference impuls/tasks/load_busman.py:16-254, which
shells out to ``mdb-export`` and maps:

| MDB table  | feed table | notes |
|------------|-----------|-------|
| tLines     | routes    | nNumber = short name, nName = long name, type BUS |
| tDirs      | —         | pattern: resolves tDepts.nDir -> line |
| tStakes    | stops     | nSymbol = code, nLat/nLong (often 0) |
| tDayTypes  | calendars | empty (exception-based), desc = nName |
| tTeams     | —         | brigade names for block_short_name |
| tDepts     | trips     | ID, nDir (pattern), nDayType, nTeam |
| tPassages  | stop_times| nTime is MINUTES since midnight |

``ignore_route_id=True`` uses the human route number (nNumber) as the
id, collapsing duplicate lines sharing a number; likewise
``ignore_stop_id=True`` uses nSymbol. ``save_blocks`` fills block_id
from nTeam (+ block_short_name into extra_fields). Driver-side
extraction to CSV, Spark-side typed projection (the documented plugin
connector pattern); gated on ``mdb-export`` being installed.
"""

from __future__ import annotations

import csv
import io
import shutil
import subprocess

from pyspark.sql import functions as F

from .. import schema as S
from ..errors import ImpulsError
from ..feed import FeedDataset
from ..task import BaseTask, TaskRuntime


class MdbExportUnavailable(ImpulsError):
    pass


def _mdb_export(mdb_path: str, table: str) -> list[dict]:
    if shutil.which("mdb-export") is None:
        raise MdbExportUnavailable(
            "mdb-export (mdbtools) is not installed; LoadBusManMDB needs it"
        )
    out = subprocess.run(
        ["mdb-export", mdb_path, table],
        check=True, capture_output=True, text=True,
    ).stdout
    return list(csv.DictReader(io.StringIO(out)))


class LoadBusManMDB(BaseTask):
    def __init__(
        self,
        mdb_path: str,
        agency_id: str,
        ignore_route_id: bool = False,
        ignore_stop_id: bool = False,
        save_blocks: bool = False,
        exporter=_mdb_export,
    ) -> None:
        self.mdb_path = mdb_path
        self.agency_id = agency_id
        self.ignore_route_id = ignore_route_id
        self.ignore_stop_id = ignore_stop_id
        self.save_blocks = save_blocks
        self.exporter = exporter  # injectable for tests

    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        spark = runtime.spark
        # mdb_path may be a pipeline resource NAME (the reference passes
        # feed.resource_name, examples/radom/__main__.py) or a literal path
        res = runtime.resources.get(self.mdb_path)
        mdb = res.path if res is not None else self.mdb_path
        lines = self.exporter(mdb, "tLines")
        dirs = self.exporter(mdb, "tDirs")
        stakes = self.exporter(mdb, "tStakes")
        day_types = self.exporter(mdb, "tDayTypes")
        depts = self.exporter(mdb, "tDepts")
        passages = self.exporter(mdb, "tPassages")
        teams = (
            self.exporter(mdb, "tTeams") if self.save_blocks else []
        )

        # routes: ignore_route_id -> human number as id, first wins
        # (reference load_routes seen_numbers dedup)
        route_id_map: dict[str, str] = {}
        route_rows = []
        seen_numbers: set[str] = set()
        for r in lines:
            if self.ignore_route_id:
                route_id = r["nNumber"]
                route_id_map[r["ID"]] = route_id
                if route_id in seen_numbers:
                    continue
                seen_numbers.add(route_id)
            else:
                route_id = r["ID"]
            route_rows.append(
                (route_id, self.agency_id, r["nNumber"], r.get("nName", ""),
                 int(S.RouteType.BUS))
            )
        routes = spark.createDataFrame(
            route_rows,
            "route_id string, agency_id string, short_name string, "
            "long_name string, type int",
        )

        # stops: ignore_stop_id -> symbol as id, first wins
        stop_id_map: dict[str, str] = {}
        stop_rows = []
        seen_symbols: set[str] = set()
        for r in stakes:
            if self.ignore_stop_id:
                stop_id = r["nSymbol"]
                stop_id_map[r["ID"]] = stop_id
                if stop_id in seen_symbols:
                    continue
                seen_symbols.add(stop_id)
            else:
                stop_id = r["ID"]
            stop_rows.append((
                stop_id,
                r.get("nName", "").strip(),
                float(r["nLat"]) if r.get("nLat") else 0.0,
                float(r["nLong"]) if r.get("nLong") else 0.0,
                r.get("nSymbol", ""),
                0,
            ))
        stops = spark.createDataFrame(
            stop_rows,
            "stop_id string, name string, lat double, lon double, "
            "code string, location_type int",
        )

        # calendars: empty, exception-based (dates curated later)
        calendars = spark.createDataFrame(
            [(r["ID"], (r.get("nName") or "").strip()) for r in day_types],
            "calendar_id string, desc string",
        ).select(
            "calendar_id",
            *[F.lit(False).alias(d) for d in (
                "monday", "tuesday", "wednesday", "thursday", "friday",
                "saturday", "sunday")],
            F.lit(str(S.SIGNALS_EXCEPTIONS)).cast("date").alias("start_date"),
            F.lit(str(S.SIGNALS_EXCEPTIONS)).cast("date").alias("end_date"),
            "desc",
        )

        # trips: tDepts.nDir -> tDirs pattern -> line (reference
        # pattern_to_route_id)
        pattern_to_route = {
            r["ID"]: route_id_map.get(r["nLine"], r["nLine"]) for r in dirs
        }
        block_names = {r["ID"]: r.get("nName", "") for r in teams}
        trip_rows = []
        for r in depts:
            route_id = pattern_to_route.get(r["nDir"])
            if route_id is None:
                continue
            block = r.get("nTeam") if self.save_blocks else None
            extra = (
                {"block_short_name": block_names.get(r.get("nTeam", ""), "")}
                if self.save_blocks else None
            )
            trip_rows.append((r["ID"], route_id, str(r["nDayType"]).strip(),
                              block, extra))
        trips = spark.createDataFrame(
            trip_rows,
            "trip_id string, route_id string, calendar_id string, "
            "block_id string, extra_fields map<string,string>",
        )

        # stop_times: nTime is MINUTES -> seconds (reference *60)
        st_rows = []
        for r in passages:
            secs = int(r.get("nTime", 0) or 0) * 60
            st_rows.append((
                r["nDept"],
                stop_id_map.get(r["nStake"], r["nStake"]),
                int(r.get("nOrder", 0) or 0),
                secs,
                secs,
                0,
                0,
            ))
        stop_times = spark.createDataFrame(
            st_rows,
            "trip_id string, stop_id string, stop_sequence int, arrival_time int, "
            "departure_time int, pickup_type int, drop_off_type int",
        )

        from .gtfs_read import _align

        return feed.with_tables({
            "routes": _align(routes, "routes"),
            "stops": _align(stops, "stops"),
            "calendars": _align(calendars, "calendars"),
            "trips": _align(trips, "trips"),
            "stop_times": _align(stop_times, "stop_times"),
        })
