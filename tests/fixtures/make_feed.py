"""Deterministic synthetic GTFS feed generator (WKD-shaped, FIXTURES.md).

Generates a small railway-like feed: 1 agency, 3 routes, 28 stops,
2 calendars + exceptions, trips with stop_times (times may exceed
24:00:00), shapes, a couple of variant knobs to exercise edge paths.
Pure Python, seeded — every test run sees identical bytes.
"""

from __future__ import annotations

import csv
import io
import os
import random
import zipfile

STOP_NAMES = [
    "Warszawa Srodmiescie WKD", "Warszawa Ochota WKD", "Warszawa Zachodnia WKD",
    "Warszawa Reduta Ordona", "Warszawa Aleje Jerozolimskie", "Warszawa Raków",
    "Warszawa Salomea", "Opacz", "Michałowice", "Reguły", "Malichy", "Tworki",
    "Pruszków WKD", "Komorów", "Nowa Wieś Warszawska", "Kanie Helenowskie",
    "Otrębusy", "Podkowa Leśna Wschodnia", "Podkowa Leśna Główna",
    "Podkowa Leśna Zachodnia", "Polesie", "Milanówek Grudów", "Kazimierówka",
    "Grodzisk Mazowiecki Okrężna", "Grodzisk Mazowiecki Piaskowa",
    "Grodzisk Mazowiecki Jordanowice", "Grodzisk Mazowiecki Radońska", "Brzózki",
]


def _stop_id(i: int) -> str:
    return f"wkd{i:02d}"


def build_feed_rows(seed: int = 42, trips_per_route: int = 62):
    rng = random.Random(seed)
    rows: dict[str, list[dict]] = {}

    rows["agency.txt"] = [{
        "agency_id": "0",
        "agency_name": "Warszawska Kolej Dojazdowa",
        "agency_url": "https://wkd.example",
        "agency_timezone": "Europe/Warsaw",
        "agency_lang": "pl",
    }]

    rows["routes.txt"] = [
        {"route_id": "A1", "agency_id": "0", "route_short_name": "A1",
         "route_long_name": "Warszawa Śródmieście WKD — Grodzisk Mazowiecki Radońska",
         "route_type": "2", "route_color": "990099", "route_text_color": "FFFFFF"},
        # rail routes whose tail segments run as replacement buses
        # (platform='BUS' stop_times) — the SplitTripLegs scenario
        {"route_id": "ZA1", "agency_id": "0", "route_short_name": "ZA1",
         "route_long_name": "Podkowa Leśna Główna — Grodzisk Mazowiecki Radońska (ZKA)",
         "route_type": "2", "route_color": "", "route_text_color": ""},
        {"route_id": "ZA12", "agency_id": "0", "route_short_name": "ZA12",
         "route_long_name": "Podkowa Leśna Główna — Milanówek Grudów (ZKA)",
         "route_type": "2", "route_color": "", "route_text_color": ""},
    ]

    rows["calendar.txt"] = [
        {"service_id": "D", "monday": "1", "tuesday": "1", "wednesday": "1",
         "thursday": "1", "friday": "1", "saturday": "0", "sunday": "0",
         "start_date": "20260601", "end_date": "20270530"},
        {"service_id": "C", "monday": "0", "tuesday": "0", "wednesday": "0",
         "thursday": "0", "friday": "0", "saturday": "1", "sunday": "1",
         "start_date": "20260601", "end_date": "20270530"},
    ]
    rows["calendar_dates.txt"] = [
        # holidays: weekday service removed, weekend added
        {"service_id": "D", "date": "20261111", "exception_type": "2"},
        {"service_id": "C", "date": "20261111", "exception_type": "1"},
        {"service_id": "D", "date": "20261225", "exception_type": "2"},
        {"service_id": "C", "date": "20261225", "exception_type": "1"},
        {"service_id": "D", "date": "20270101", "exception_type": "2"},
        {"service_id": "C", "date": "20270101", "exception_type": "1"},
    ]

    rows["stops.txt"] = [
        {"stop_id": _stop_id(i), "stop_name": name,
         "stop_lat": f"{52.09 + i * 0.004:.6f}", "stop_lon": f"{20.66 + i * 0.007:.6f}",
         "wheelchair_boarding": str(rng.choice([0, 1, 2]))}
        for i, name in enumerate(STOP_NAMES)
    ]

    route_stops = {
        "A1": list(range(0, 28)),            # full line
        "ZA1": list(range(18, 28)),          # replacement bus tail
        "ZA12": list(range(18, 23)),
    }

    trips, stop_times, shapes = [], [], []
    for route_id, stop_ixs in route_stops.items():
        shape_id = f"shp_{route_id}"
        for j, ix in enumerate(stop_ixs):
            shapes.append({
                "shape_id": shape_id, "shape_pt_sequence": str(j),
                "shape_pt_lat": f"{52.09 + ix * 0.004:.6f}",
                "shape_pt_lon": f"{20.66 + ix * 0.007:.6f}",
            })
        for k in range(trips_per_route):
            service = "D" if k % 3 else "C"
            direction = k % 2
            trip_id = f"{service}-{route_id}-{k:03d}"
            headsign = ""  # left blank for GenerateTripHeadsign
            if k % 5 == 0:
                headsign = "Special"
            trips.append({
                "route_id": route_id, "service_id": service, "trip_id": trip_id,
                "trip_headsign": headsign, "trip_short_name": str(300 + k),
                "direction_id": str(direction) if k % 7 else "",
                "shape_id": shape_id,
                "wheelchair_accessible": str(rng.choice([0, 1, 2])),
                "block_id": f"blk{k // 4}" if k % 2 else "",
            })
            seq_ixs = stop_ixs if direction == 0 else list(reversed(stop_ixs))
            # some trips start before midnight and roll past 24:00:00
            base = 4 * 3600 + (k * 37 * 60) % (22 * 3600)
            if k % 11 == 0:
                base = 23 * 3600 + 30 * 60
            t = base
            for seq, ix in enumerate(seq_ixs):
                arr = t
                dep = t + (30 if seq % 6 == 0 else 0)
                stop_times.append({
                    "trip_id": trip_id,
                    "arrival_time": _fmt_time(arr),
                    "departure_time": _fmt_time(dep),
                    "stop_id": _stop_id(ix),
                    "stop_sequence": str(seq),
                    "pickup_type": "1" if (k % 13 == 0) else "0",
                    "drop_off_type": "0",
                    "platform": "BUS" if route_id.startswith("ZA") and seq >= 2 else "",
                })
                t = dep + 90 + (ix % 4) * 30
    rows["trips.txt"] = trips
    rows["stop_times.txt"] = stop_times
    rows["shapes.txt"] = shapes

    rows["feed_info.txt"] = [{
        "feed_publisher_name": "WKD synthetic", "feed_publisher_url": "https://wkd.example",
        "feed_lang": "pl", "feed_version": "2026-06-01",
    }]

    rows["fare_attributes.txt"] = [
        {"fare_id": "F1", "price": "4.00", "currency_type": "PLN",
         "payment_method": "0", "transfers": "", "agency_id": "0"},
        {"fare_id": "F2", "price": "7.00", "currency_type": "PLN",
         "payment_method": "1", "transfers": "2", "agency_id": "0",
         "transfer_duration": "3600"},
    ]
    rows["fare_rules.txt"] = [
        {"fare_id": "F1", "route_id": "A1"},
        {"fare_id": "F2", "route_id": ""},
    ]
    rows["frequencies.txt"] = [
        {"trip_id": trips[0]["trip_id"], "start_time": "05:00:00",
         "end_time": "09:00:00", "headway_secs": "1200"},
    ]
    rows["transfers.txt"] = [
        {"from_stop_id": _stop_id(18), "to_stop_id": _stop_id(19),
         "transfer_type": "2", "min_transfer_time": "180"},
    ]
    return rows


def _fmt_time(sec: int) -> str:
    return f"{sec // 3600:02d}:{sec % 3600 // 60:02d}:{sec % 60:02d}"


def write_feed(
    target: str,
    seed: int = 42,
    trips_per_route: int = 62,
    mutate=None,
) -> str:
    """Write the feed as a zip (if target endswith .zip) or directory.

    ``mutate(rows)`` can edit the dict-of-lists before writing (variant
    feeds: extra columns, missing files, ...).
    """
    rows = build_feed_rows(seed=seed, trips_per_route=trips_per_route)
    if mutate:
        mutate(rows)
    if target.endswith(".zip"):
        with zipfile.ZipFile(target, "w") as zf:
            for fname, rlist in rows.items():
                zf.writestr(fname, _to_csv(rlist))
    else:
        os.makedirs(target, exist_ok=True)
        for fname, rlist in rows.items():
            with open(os.path.join(target, fname), "w", encoding="utf-8") as fh:
                fh.write(_to_csv(rlist))
    return target


def _to_csv(rlist: list[dict]) -> str:
    if not rlist:
        return ""
    cols: list[str] = []
    for r in rlist:
        for c in r:
            if c not in cols:
                cols.append(c)
    buf = io.StringIO()
    w = csv.DictWriter(buf, fieldnames=cols, lineterminator="\n")
    w.writeheader()
    w.writerows(rlist)
    return buf.getvalue()
