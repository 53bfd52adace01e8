"""End-to-end test of the Warsaw-shaped MultiFile application
(examples/warsaw_like.py): versioned inputs, per-version railway-station
consolidation + location patching, merged GTFS export, and the
InputNotModified short-circuit — the reference's flagship usage shape
(/root/reference/examples/warsaw/__main__.py)."""

from __future__ import annotations

import csv
import io
import json
import zipfile
from datetime import date as D

import pytest

from examples.warsaw_like import WarsawLikeApp, build_multi_file
from impuls_spark.errors import InputNotModified
from impuls_spark.task import PipelineOptions
from tests.fixtures.make_feed import write_feed


def _warsawify(rows):
    """Turn two adjacent stops into railway platforms of one station
    ("4900"), add an unused (0,0) stop, and zero out one real stop that
    the location-patch JSON will rescue."""
    remap = {"wkd18": "490001", "wkd19": "490002"}
    names = {"490001": "Warszawa Testowa 1", "490002": "Warszawa Testowa 2"}
    for s in rows["stops.txt"]:
        if s["stop_id"] in remap:
            s["stop_id"] = remap[s["stop_id"]]
            s["stop_name"] = names[s["stop_id"]]
        if s["stop_id"] == "wkd27":
            s["stop_lat"] = "0"
            s["stop_lon"] = "0"
    rows["stops.txt"].append({
        "stop_id": "xtra01", "stop_name": "Nigdzie",
        "stop_lat": "0", "stop_lon": "0", "wheelchair_boarding": "0",
    })
    for st in rows["stop_times.txt"]:
        if st["stop_id"] in remap:
            st["stop_id"] = remap[st["stop_id"]]
    for t in rows.get("transfers.txt", []):
        t["from_stop_id"] = remap.get(t["from_stop_id"], t["from_stop_id"])
        t["to_stop_id"] = remap.get(t["to_stop_id"], t["to_stop_id"])


@pytest.fixture(scope="module")
def warsaw_inputs(tmp_path_factory):
    base = tmp_path_factory.mktemp("warsaw_inputs")
    feeds = base / "feeds"
    feeds.mkdir()
    write_feed(str(feeds / "2026-06-01.zip"), mutate=_warsawify)

    def v2(rows):
        _warsawify(rows)
        for c in rows["calendar.txt"]:
            c["start_date"] = "20270601"
            c["end_date"] = "20280530"

    write_feed(str(feeds / "2027-06-01.zip"), mutate=v2)
    patches = base / "missing_stop_locations.json"
    patches.write_text(json.dumps({
        "wkd27": [52.198, 20.849],       # rescues the zeroed real stop
        "ghost99": [50.0, 20.0],          # unknown id — must be a no-op
    }))
    return str(feeds), str(patches)


def _read_zip_csv(zf: zipfile.ZipFile, name: str) -> list[dict]:
    with zf.open(name) as fh:
        return list(csv.DictReader(io.TextIOWrapper(fh, encoding="utf-8")))


def test_warsaw_like_end_to_end(spark, warsaw_inputs, tmp_path):
    feeds_dir, patches = warsaw_inputs
    out = str(tmp_path / "warsaw.zip")
    ws = str(tmp_path / "ws")

    mf = build_multi_file(
        feeds_dir, out, patches,
        PipelineOptions(workspace_directory=ws),
        for_date=D(2026, 6, 1),
    )
    mf.run(spark)

    with zipfile.ZipFile(out) as zf:
        stops = {r["stop_id"]: r for r in _read_zip_csv(zf, "stops.txt")}
        stop_times = _read_zip_csv(zf, "stop_times.txt")
        trips = _read_zip_csv(zf, "trips.txt")
        feed_info = _read_zip_csv(zf, "feed_info.txt")

    # railway platforms consolidated into the 4-char-prefix station
    assert "4900" in stops
    assert stops["4900"]["stop_name"] == "Warszawa Testowa"
    assert "490001" not in stops and "490002" not in stops
    st_ids = {r["stop_id"] for r in stop_times}
    assert "4900" in st_ids
    assert not {"490001", "490002"} & st_ids

    # merged station sits at the average of its platforms
    lat = float(stops["4900"]["stop_lat"])
    assert 52.0 < lat < 52.5

    # location patch applied; unused (0,0) stop removed
    assert float(stops["wkd27"]["stop_lat"]) == pytest.approx(52.198)
    assert "xtra01" not in stops
    assert "ghost99" not in stops  # unknown patch id did not insert

    # both versions merged; headsigns generated for every trip
    assert len(trips) == 2 * 186
    assert all(t["trip_headsign"] for t in trips)
    assert len(feed_info) == 1

    # second run with unchanged inputs short-circuits
    mf2 = build_multi_file(
        feeds_dir, out, patches,
        PipelineOptions(workspace_directory=ws),
        for_date=D(2026, 6, 1),
    )
    with pytest.raises(InputNotModified):
        mf2.run(spark)


def test_warsaw_like_cli(spark, warsaw_inputs, tmp_path):
    feeds_dir, patches = warsaw_inputs
    out = str(tmp_path / "cli.zip")

    class TestApp(WarsawLikeApp):
        def build_session(self, args):
            return spark

    argv = [
        "-w", str(tmp_path / "ws"),
        "--feeds-dir", feeds_dir,
        "--stop-locations", patches,
        "--out", out,
        "--for-date", "2026-06-01",
    ]
    assert TestApp().run(argv) == 0
    assert zipfile.ZipFile(out).namelist()
    # unchanged rerun exits 2 (reference App/InputNotModified contract)
    assert TestApp().run(argv) == 2
