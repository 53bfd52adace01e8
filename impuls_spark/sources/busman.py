"""LoadBusManMDB — niche connector for BusMan MS-Access databases.

Parity target: reference impuls/tasks/load_busman.py:47-254, which
shells out to ``mdb-export`` and maps tLines -> routes, tStakes ->
stops, tDayTypes -> (empty) calendars, tDepts -> trips, tPassages ->
stop_times. This port keeps the same subprocess-CSV bridge shape (the
documented "plugin connector" pattern: driver-side extraction to CSV,
then Spark-side typed projection); it is gated on ``mdb-export`` being
installed.

The table/column mapping below follows the reference's documented
mapping; ``id_coalesce``/``save_blocks`` knobs mirror the ctor flags.
"""

from __future__ import annotations

import csv
import io
import shutil
import subprocess
from collections.abc import Iterable

from pyspark.sql import SparkSession
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
        lines = self.exporter(self.mdb_path, "tLines")
        stakes = self.exporter(self.mdb_path, "tStakes")
        day_types = self.exporter(self.mdb_path, "tDayTypes")
        depts = self.exporter(self.mdb_path, "tDepts")
        passages = self.exporter(self.mdb_path, "tPassages")

        route_id = (lambda r: r.get("sNumber", r.get("iLineID", "")).strip()) \
            if not self.ignore_route_id else (lambda r: r["iLineID"])
        routes = spark.createDataFrame(
            [
                (route_id(r), self.agency_id, route_id(r), "", 3)
                for r in lines
            ],
            "route_id string, agency_id string, short_name string, "
            "long_name string, type int",
        )

        stop_id = (lambda r: r.get("sSymbol", r.get("iStakeID", "")).strip()) \
            if not self.ignore_stop_id else (lambda r: r["iStakeID"])
        stops = spark.createDataFrame(
            [
                (
                    stop_id(r),
                    r.get("sName", "").strip(),
                    float(r.get("fGPSLat", 0) or 0),
                    float(r.get("fGPSLong", 0) or 0),
                    0,
                )
                for r in stakes
            ],
            "stop_id string, name string, lat double, lon double, location_type int",
        )

        calendars = spark.createDataFrame(
            [(str(r["iDayTypeID"]).strip(),) for r in day_types],
            "calendar_id string",
        ).select(
            "calendar_id",
            *[F.lit(False).alias(d) for d in (
                "monday", "tuesday", "wednesday", "thursday", "friday",
                "saturday", "sunday")],
            F.lit(str(S.SIGNALS_EXCEPTIONS)).cast("date").alias("start_date"),
            F.lit(str(S.SIGNALS_EXCEPTIONS)).cast("date").alias("end_date"),
        )

        line_by_id = {r["iLineID"]: r for r in lines}
        trips = spark.createDataFrame(
            [
                (
                    str(r["iDeptID"]),
                    route_id(line_by_id[r["iLineID"]]),
                    str(r["iDayTypeID"]),
                    str(r.get("iBlockID", "")) if self.save_blocks else None,
                )
                for r in depts
                if r.get("iLineID") in line_by_id
            ],
            "trip_id string, route_id string, calendar_id string, block_id string",
        )

        stake_by_id = {r["iStakeID"]: r for r in stakes}
        st_rows = []
        for r in passages:
            if r.get("iStakeID") not in stake_by_id:
                continue
            secs = int(r.get("iTime", 0) or 0)
            st_rows.append((
                str(r["iDeptID"]),
                stop_id(stake_by_id[r["iStakeID"]]),
                int(r.get("iOrder", 0) or 0),
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
