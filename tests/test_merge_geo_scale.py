"""Merge stop geo-match at pathological block sizes (VERDICT r5 item 3).

The greedy first-wins matcher (reference impuls/tasks/merge.py:387-425)
was O(b^2) per content-hash block; it is now grid-indexed O(b) with
bit-identical output, plus an opt-in coarse geo-cell pre-split that
spreads a mega-block across tasks.
"""

from __future__ import annotations

import math
import random
import time

import pandas as pd
import pytest

from impuls_spark.operators.merge import (
    STOP_MERGE_DISTANCE_M,
    Merge,
    _make_greedy_geo_match,
)
from impuls_spark.task import TaskRuntime


@pytest.fixture()
def rt(spark):
    return TaskRuntime(spark)


def _hav_m(lat1, lon1, lat2, lon2):
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    a = (
        math.sin(dlat / 2) ** 2
        + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2))
        * math.sin(dlon / 2) ** 2
    )
    return 2 * 6371008.8 * math.asin(math.sqrt(a))


def _naive_greedy(pdf: pd.DataFrame, dist_m: float) -> list[tuple]:
    """The r5 reference implementation: ordered scan of the accepted
    list — quadratic, kept here as the equivalence oracle."""
    pdf = pdf.sort_values(["__ix", "stop_id"], kind="mergesort")
    accepted: list[tuple] = []
    out = []
    for ix, sid, lat, lon in zip(
        pdf["__ix"], pdf["stop_id"], pdf["lat"], pdf["lon"]
    ):
        target = None
        for aix, aid, alat, alon in accepted:
            if _hav_m(lat, lon, alat, alon) <= dist_m:
                target = (aix, aid)
                break
        if target is None:
            accepted.append((ix, sid, lat, lon))
            target = (ix, sid)
        out.append((int(ix), sid, int(target[0]), target[1]))
    return out


def _block(n: int, seed: int, spread_deg: float, lat0: float = 52.0) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = [
        (i, "s", lat0 + rng.uniform(-spread_deg, spread_deg),
         21.0 + rng.uniform(-spread_deg, spread_deg))
        for i in range(n)
    ]
    return pd.DataFrame(rows, columns=["__ix", "stop_id", "lat", "lon"])


@pytest.mark.parametrize("seed,spread", [
    (1, 0.0002),   # dense: everything within ~40 m — heavy merging
    (2, 0.002),    # mixed: clusters + singletons
    (3, 0.02),     # sparse: mostly accepted
])
def test_grid_greedy_equals_naive(seed, spread):
    pdf = _block(400, seed, spread)
    grid = _make_greedy_geo_match(STOP_MERGE_DISTANCE_M)(pdf)
    assert list(map(tuple, grid.itertuples(index=False))) == _naive_greedy(
        pdf, STOP_MERGE_DISTANCE_M
    )


def test_grid_greedy_equals_naive_high_latitude():
    """Longitude cells shrink by cos(lat); the bound must still hold at
    70 degrees north (cells sized by the block's max |lat|)."""
    pdf = _block(300, 7, 0.001, lat0=70.0)
    grid = _make_greedy_geo_match(STOP_MERGE_DISTANCE_M)(pdf)
    assert list(map(tuple, grid.itertuples(index=False))) == _naive_greedy(
        pdf, STOP_MERGE_DISTANCE_M
    )


def test_grid_greedy_knife_edge_pairs():
    """Pairs at ~exactly dist_m, aligned to cell boundaries."""
    dlat = STOP_MERGE_DISTANCE_M / 110_000.0
    rows = []
    for i in range(50):
        base = 52.0 + i * 10 * dlat
        rows.append((2 * i, "s", base, 21.0))
        # ~9.99 m north: must merge; lands exactly one cell up
        rows.append((2 * i + 1, "s", base + 9.99 / 111_195.0, 21.0))
    pdf = pd.DataFrame(rows, columns=["__ix", "stop_id", "lat", "lon"])
    out = _make_greedy_geo_match(STOP_MERGE_DISTANCE_M)(pdf)
    assert list(map(tuple, out.itertuples(index=False))) == _naive_greedy(
        pdf, STOP_MERGE_DISTANCE_M
    )
    # every odd stop merged into its even partner
    merged = out[out["__ix"] % 2 == 1]
    assert (merged["__w_ix"] == merged["__ix"] - 1).all()


def test_mega_block_completes_fast():
    """10k same-hash stops: the r5 scan was O(b^2) (~5e7 haversines,
    minutes of Python); the grid pass is O(b) and must finish in
    seconds.  Dense-urban spread: ~11 km box, thousands of accepted."""
    pdf = _block(10_000, 42, 0.05)
    t0 = time.monotonic()
    out = _make_greedy_geo_match(STOP_MERGE_DISTANCE_M)(pdf)
    elapsed = time.monotonic() - t0
    assert len(out) == 10_000
    assert elapsed < 20, f"grid greedy took {elapsed:.1f}s on 10k stops"
    # invariant: winners are pairwise > dist_m apart (accepted set)
    winners = out[out["__ix"] == out["__w_ix"]]
    assert 1 < len(winners) < 10_000
    # spot-check 200 random pairs of winners
    keyed = pdf.set_index("__ix")
    rng = random.Random(0)
    wix = list(winners["__ix"])
    for _ in range(200):
        a, b = rng.sample(wix, 2)
        assert _hav_m(
            keyed.at[a, "lat"], keyed.at[a, "lon"],
            keyed.at[b, "lat"], keyed.at[b, "lon"],
        ) > STOP_MERGE_DISTANCE_M


def test_geo_presplit_distributes_mega_block(spark, rt):
    """Opt-in pre-split: the blocking key gains a coarse cell, so a
    mega-block spreads across tasks.  Far-apart duplicates still merge
    per-cell; the documented approximation is only at cell edges."""
    from impuls_spark.feed import FeedDataset
    from impuls_spark.sources.gtfs_read import _align

    def mk(ix, lat, lon):
        df = spark.createDataFrame(
            [("s1", "Central", lat, lon, 0)],
            "stop_id string, name string, lat double, lon double, "
            "location_type int",
        )
        return FeedDataset.empty(spark).with_table("stops", _align(df, "stops"))

    # two clusters ~1 degree apart, two feeds each within 3 m
    feeds = [
        ("a", mk(0, 52.0, 21.0)), ("b", mk(1, 52.00002, 21.0)),
        ("c", mk(2, 53.0, 21.0)), ("d", mk(3, 53.00002, 21.0)),
    ]
    merged = Merge(list(feeds), geo_presplit_deg=0.1).transform(
        feeds[0][1], rt
    )
    got = sorted(
        (r["stop_id"], round(r["lat"], 3))
        for r in merged["stops"].collect()
    )
    # 4 rows -> 2 winners, one per cluster; the id conflict gets :2
    assert got == [("s1", 52.0), ("s1:2", 53.0)]


def test_grid_greedy_antimeridian_pairs():
    """Pairs straddling the +-180 seam must merge exactly like the
    naive scan (whose haversine handles the wrapped delta natively):
    near-seam accepted stops are registered under both signs
    (ADVICE r6, merge.py:95)."""
    rows = []
    for i in range(30):
        lat = 10.0 + i * 0.01
        # ~8.8 m apart across the seam at lat 10
        rows.append((2 * i, "s", lat, 179.99996))
        rows.append((2 * i + 1, "s", lat, -179.99996))
    pdf = pd.DataFrame(rows, columns=["__ix", "stop_id", "lat", "lon"])
    out = _make_greedy_geo_match(STOP_MERGE_DISTANCE_M)(pdf)
    assert list(map(tuple, out.itertuples(index=False))) == _naive_greedy(
        pdf, STOP_MERGE_DISTANCE_M
    )
    merged = out[out["__ix"] % 2 == 1]
    assert (merged["__w_ix"] == merged["__ix"] - 1).all()


def test_grid_greedy_near_polar_fallback():
    """Above 89 deg the longitude cell width is unbounded, so the
    matcher takes the exact naive scan (ADVICE r6: the old clamp made
    cells NARROWER near the poles and could miss in-range pairs)."""
    pdf = _block(120, 11, 0.001, lat0=89.7)
    out = _make_greedy_geo_match(STOP_MERGE_DISTANCE_M)(pdf)
    assert list(map(tuple, out.itertuples(index=False))) == _naive_greedy(
        pdf, STOP_MERGE_DISTANCE_M
    )
    # a genuinely-within-10m pair at 89.9: wide lon delta, small dist
    pdf2 = pd.DataFrame(
        [(0, "s", 89.9, 0.0), (1, "s", 89.9, 0.004)],
        columns=["__ix", "stop_id", "lat", "lon"],
    )
    assert _hav_m(89.9, 0.0, 89.9, 0.004) < STOP_MERGE_DISTANCE_M
    out2 = _make_greedy_geo_match(STOP_MERGE_DISTANCE_M)(pdf2)
    assert int(out2.iloc[1]["__w_ix"]) == 0


def test_geo_presplit_rejects_nonpositive():
    with pytest.raises(ValueError):
        Merge([("a", object())], geo_presplit_deg=0.0)


def _many_feeds(spark, n_feeds: int, n_stops: int, jitter_deg, disperse=False):
    """n_feeds feeds sharing n_stops stop ids+attrs — the Merge-level
    mega-block shape (per-block size is FEED-COUNT-bound because the
    content hash includes stop_id, so 'one city-center mega-block'
    means many feed versions of the same stops). ``disperse`` moves
    each feed's copy of stop 0 to its own far-apart cell (the
    moved-stop block presplit actually spreads)."""
    from pyspark.sql import functions as F

    from impuls_spark.feed import FeedDataset
    from impuls_spark.sources.gtfs_read import _align

    feeds = []
    for ix in range(n_feeds):
        df = spark.range(n_stops).select(
            F.concat(F.lit("s"), F.col("id").cast("string")).alias("stop_id"),
            F.lit("City Center").alias("name"),
            # clusters at cell centers, one per stop id; per-feed
            # deterministic jitter of ±~2 m keeps every feed's copy
            # inside the 10 m merge radius and far from 0.1° cell edges
            (F.lit(50.05) + (F.col("id") % 40) * 0.1
             + F.lit(((ix * 7919) % 41 - 20) * 1e-6)).alias("lat"),
            (F.lit(21.05) + (F.col("id") / 40).cast("int") * 0.1
             + F.lit(((ix * 104729) % 41 - 20) * 1e-6)).alias("lon"),
            F.lit(0).alias("location_type"),
        )
        if disperse:
            # stop 0 "moves" a full cell per feed: one content-hash
            # block whose members span n_feeds distinct 0.1° cells
            df = df.withColumn(
                "lat",
                F.when(F.col("stop_id") == "s0",
                       F.lit(10.05) + F.lit(ix * 0.1)).otherwise(F.col("lat")),
            )
        feeds.append(
            (f"f{ix}",
             FeedDataset.empty(spark).with_table("stops", _align(df, "stops")))
        )
    return feeds


def test_merge_geo_skew_at_generator_scale(spark, rt):
    """VERDICT r8 item 5: 60 feed versions × 500 shared stops (30k
    stop rows, 500 blocks of 60 — the many-feed city-center shape;
    per-block size is feed-count-bound at the Merge level) merge
    within a wall-time bound, and geo_presplit_deg produces
    BIT-IDENTICAL stops when no cluster touches a cell edge. The
    dispersed-block case measures the spread: one stop moved a full
    cell per feed goes from 1 blocking key to n_feeds keys."""
    import time

    from pyspark.sql import functions as F

    n_feeds, n_stops = 60, 500
    feeds = _many_feeds(spark, n_feeds, n_stops, None)

    t0 = time.monotonic()
    base = Merge(list(feeds)).transform(feeds[0][1], rt)
    rows_base = sorted(
        (r["stop_id"], round(r["lat"], 6), round(r["lon"], 6))
        for r in base["stops"].collect()
    )
    elapsed = time.monotonic() - t0
    # every block collapses to its first-feed winner
    assert len(rows_base) == n_stops
    assert elapsed < 180, f"50k-row geo merge took {elapsed:.0f}s"

    split = Merge(list(feeds), geo_presplit_deg=0.1).transform(
        feeds[0][1], rt
    )
    rows_split = sorted(
        (r["stop_id"], round(r["lat"], 6), round(r["lon"], 6))
        for r in split["stops"].collect()
    )
    assert rows_split == rows_base  # bit-identical away from cell edges

    # spread factor on the dispersed block: the s0 block's members sit
    # in n_feeds distinct cells, so presplit multiplies its blocking
    # keys by n_feeds (measured, for the SCALING.md row)
    disp = _many_feeds(spark, 20, 10, None, disperse=True)
    union = Merge(list(disp))._union("stops")
    m_unsplit = Merge(list(disp))
    m_split = Merge(list(disp), geo_presplit_deg=0.1)
    # the s0 block is ONE content hash (same id+attrs in every feed);
    # presplit keys it by cell as well — count those cells
    s0 = union.filter(F.col("stop_id") == "s0")
    keys_split = s0.select(
        F.floor(F.col("lat") / 0.1), F.floor(F.col("lon") / 0.1)
    ).distinct().count()
    assert keys_split == 20  # 20 feeds -> 20 cells -> 20x spread
    # and the dispersed copies (>10 m apart) merge in NEITHER mode
    w_unsplit = m_unsplit.transform(disp[0][1], rt)["stops"]
    w_split = m_split.transform(disp[0][1], rt)["stops"]
    n_s0 = w_unsplit.filter(F.col("stop_id").startswith("s0")).count()
    assert n_s0 == 20
    assert w_split.filter(F.col("stop_id").startswith("s0")).count() == n_s0


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(2, 120),
    spread=st.sampled_from([0.00005, 0.0002, 0.001, 0.01]),
    lat0=st.sampled_from([0.0, 52.0, -33.9, 70.0, 85.0, 89.6, -89.8]),
)
def test_grid_greedy_equals_naive_property(seed, n, spread, lat0):
    """Property form of the equivalence pin: across random block sizes,
    densities (down to every-stop-within-5m) and latitudes (including
    past the 89° naive-fallback threshold), the matcher returns
    byte-identical assignments to the naive ordered scan."""
    pdf = _block(n, seed, spread, lat0=lat0)
    grid = _make_greedy_geo_match(STOP_MERGE_DISTANCE_M)(pdf)
    assert list(map(tuple, grid.itertuples(index=False))) == _naive_greedy(
        pdf, STOP_MERGE_DISTANCE_M
    )
