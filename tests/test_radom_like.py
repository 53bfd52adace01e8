"""End-to-end test of the Radom-shaped minimal MultiFile application
(examples/radom_like.py): versioned BusMan MDB inputs loaded BY a task
(empty loader + LoadBusManMDB), raw-SQL curation with FK cascade,
generated calendars, CSV stop patching, merged GTFS export, and the
InputNotModified short-circuit — mirroring the simplest provider in the
reference's examples matrix (/root/reference/examples/radom)."""

from __future__ import annotations

import csv
import io
import re
import zipfile
from datetime import date as D

import pytest

from examples.radom_like import build_multi_file
from impuls_spark.errors import InputNotModified
from impuls_spark.task import PipelineOptions


def _busman_tables(version: str) -> dict[str, list[dict]]:
    """BusMan MDB shape (reference load_busman.py). One line, two
    known stops plus one on the reference's removal list, three day
    types of which one (SPECJALNY) must be dropped WITH its trips."""
    name_suffix = "" if version == "2026-06-01" else " bis"
    return {
        "tLines": [{"ID": "7", "nNumber": "1", "nName": "Linia 1" + name_suffix}],
        "tDirs": [{"ID": "d1", "nLine": "7"}],
        "tStakes": [
            {"ID": "100", "nSymbol": "RAD01", "nName": "Radomska",
             "nLat": "51.40", "nLong": "21.15"},
            {"ID": "101", "nSymbol": "RAD02", "nName": "Struga",
             "nLat": "51.41", "nLong": "21.16"},
            # on UNKNOWN_STOP_IDS -> deleted, stop_times cascade
            {"ID": "649", "nSymbol": "BAD1", "nName": "Nieznany",
             "nLat": "51.00", "nLong": "21.00"},
        ],
        "tDayTypes": [
            {"ID": "P", "nName": "POWSZEDNI"},
            {"ID": "S", "nName": "SOBOTA"},
            {"ID": "X", "nName": "SPECJALNY"},  # retained-calendars DELETE
        ],
        "tDepts": [
            {"ID": "t1", "nDir": "d1", "nDayType": "P"},
            {"ID": "t2", "nDir": "d1", "nDayType": "S"},
            {"ID": "t3", "nDir": "d1", "nDayType": "X"},  # must cascade away
        ],
        "tPassages": [
            {"nDept": "t1", "nStake": "100", "nOrder": "0", "nTime": "360"},
            {"nDept": "t1", "nStake": "101", "nOrder": "1", "nTime": "365"},
            {"nDept": "t1", "nStake": "649", "nOrder": "2", "nTime": "370"},
            {"nDept": "t2", "nStake": "100", "nOrder": "0", "nTime": "400"},
            {"nDept": "t3", "nStake": "100", "nOrder": "0", "nTime": "500"},
        ],
    }


def _fake_exporter(path: str, table: str) -> list[dict]:
    m = re.search(r"(\d{4}-\d{2}-\d{2})", path)
    assert m, f"no version in fetched path {path!r}"
    return _busman_tables(m[1])[table]


@pytest.fixture(scope="module")
def radom_inputs(tmp_path_factory):
    base = tmp_path_factory.mktemp("radom_inputs")
    feeds = base / "mdbs"
    feeds.mkdir()
    # contents never parsed (exporter injected); names carry the version
    (feeds / "Rozklady-2026-06-01.mdb").write_bytes(b"v1")
    (feeds / "Rozklady-2026-09-01.mdb").write_bytes(b"v2")
    soap = base / "soap_stops.csv"
    soap.write_text(
        "stop_id,stop_name,stop_lat,stop_lon\n"
        "100,Radomska (SOAP),51.4567,21.1234\n"
        "ghost,Nope,50.0,20.0\n"  # unknown id -> warn-and-skip
    )
    return str(feeds), str(soap)


def _read_zip_csv(zf: zipfile.ZipFile, name: str) -> list[dict]:
    with zf.open(name) as fh:
        return list(csv.DictReader(io.TextIOWrapper(fh, encoding="utf-8")))


def test_radom_like_end_to_end(spark, radom_inputs, tmp_path):
    feeds_dir, soap = radom_inputs
    out = str(tmp_path / "radom.zip")
    ws = str(tmp_path / "ws")

    mf = build_multi_file(
        feeds_dir, soap, out, PipelineOptions(workspace_directory=ws),
        exporter=_fake_exporter, for_date=D(2026, 6, 1),
    )
    mf.run(spark)

    with zipfile.ZipFile(out) as zf:
        assert set(zf.namelist()) == {
            "agency.txt", "stops.txt", "routes.txt", "trips.txt",
            "stop_times.txt", "calendar.txt", "calendar_dates.txt",
        }
        agency = _read_zip_csv(zf, "agency.txt")
        stops = {r["stop_id"]: r for r in _read_zip_csv(zf, "stops.txt")}
        routes = _read_zip_csv(zf, "routes.txt")
        trips = _read_zip_csv(zf, "trips.txt")
        stop_times = _read_zip_csv(zf, "stop_times.txt")
        calendar = _read_zip_csv(zf, "calendar.txt")
        calendar_dates = _read_zip_csv(zf, "calendar_dates.txt")

    assert [a["agency_id"] for a in agency] == ["0"]

    # ignore_route_id -> the human number is the id
    assert {r["route_id"] for r in routes} == {"1"}

    # reference removal list: stop 649 gone, its stop_times cascaded
    assert "649" not in stops
    assert all(st["stop_id"] != "649" for st in stop_times)

    # SOAP patch applied to stop 100; unknown id skipped
    assert stops["100"]["stop_name"] == "Radomska (SOAP)"
    assert float(stops["100"]["stop_lat"]) == pytest.approx(51.4567)
    assert "ghost" not in stops
    # unpatched stop keeps its BusMan attributes
    assert stops["101"]["stop_name"] == "Struga"

    # per-version truncation rewrote every calendar exception-based
    # (reference truncate_calendars.py:92-110), so calendar.txt holds
    # only the header (SaveGTFS's WHERE monday OR ... filter) and all
    # service lives in calendar_dates.txt — exactly what the reference
    # radom feed ships
    assert calendar == []
    assert calendar_dates

    # day-type retention: SPECJALNY calendars AND their trips cascade
    svc = {c["service_id"] for c in calendar_dates}
    assert all(s.endswith((":P", ":S")) for s in svc), svc
    trip_services = {t["service_id"] for t in trips}
    assert trip_services <= svc

    # generated weekday patterns survive as exception dates
    from datetime import datetime as DT
    for c in calendar_dates:
        assert c["exception_type"] == "1"
        wd = DT.strptime(c["date"], "%Y%m%d").weekday()
        if c["service_id"].endswith(":P"):
            assert wd < 5, c
        else:
            assert wd == 5, c

    # per-version truncation: v1's dates end the day before v2 starts
    v1_dates = [c["date"] for c in calendar_dates
                if c["service_id"].startswith("2026-06-01")]
    v2_dates = [c["date"] for c in calendar_dates
                if c["service_id"].startswith("2026-09-01")]
    assert v1_dates and min(v1_dates) >= "20260601" and max(v1_dates) <= "20260831"
    assert v2_dates and min(v2_dates) >= "20260901"

    # both versions merged: each contributes its weekday+saturday trips
    assert len(trips) == 4
    assert all(any(st["trip_id"] == t["trip_id"] for st in stop_times)
               for t in trips)

    # second run with unchanged inputs short-circuits
    mf2 = build_multi_file(
        feeds_dir, soap, out, PipelineOptions(workspace_directory=ws),
        exporter=_fake_exporter, for_date=D(2026, 6, 1),
    )
    with pytest.raises(InputNotModified):
        mf2.run(spark)


def test_exec_sql_delete_cascades(spark):
    """Raw DELETE prunes FK dependents, matching SQLite's
    PRAGMA foreign_keys=1 + ON DELETE CASCADE (reference
    impuls/db.py:210, model/trip.py:65-73)."""
    from impuls_spark.feed import FeedDataset
    from impuls_spark.operators import ExecuteSQL
    from impuls_spark.sources.gtfs_read import _align
    from impuls_spark.task import TaskRuntime

    tables = {
        "calendars": [{"calendar_id": "C1"}, {"calendar_id": "C2"}],
        "routes": [{"route_id": "R", "agency_id": "0", "type": 3}],
        "trips": [
            {"trip_id": "T1", "route_id": "R", "calendar_id": "C1"},
            {"trip_id": "T2", "route_id": "R", "calendar_id": "C2"},
        ],
        "stop_times": [
            {"trip_id": "T1", "stop_id": "S", "stop_sequence": 0},
            {"trip_id": "T2", "stop_id": "S", "stop_sequence": 0},
        ],
    }
    feed = FeedDataset.empty(spark).with_tables({
        name: _align(spark.createDataFrame(rows), name)
        for name, rows in tables.items()
    })
    out = ExecuteSQL(
        statement="DELETE FROM calendars WHERE calendar_id = 'C2'"
    ).transform(feed, TaskRuntime(spark))
    assert [r["trip_id"] for r in out["trips"].collect()] == ["T1"]
    assert [r["trip_id"] for r in out["stop_times"].collect()] == ["T1"]
