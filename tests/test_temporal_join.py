"""asof_join / range_join / time_bucket_rollup vs naive Python oracles.

The operators promise exact pandas-merge_asof / BETWEEN-join semantics
through shuffle-friendly plans (union+window, cell-bucketed equi-join,
sequence-exploded spine); these tests pin the semantics against
brute-force per-row computation on randomized frames, plus the edge
cases the plan shapes could silently get wrong (ties, tolerance cuts,
cell boundaries, empty gaps).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from impuls_spark.operators import (
    asof_join,
    range_agg,
    range_join,
    rolling_window_agg,
    time_bucket_rollup,
)

US = 1_000_000


def _mk(spark, rows, cols):
    fields = []
    for name, typ in cols:
        fields.append(T.StructField(name, typ, True))
    return spark.createDataFrame(rows, T.StructType(fields))


def _rand_events(n, keys, seed, t0=1_700_000_000 * US):
    rng = random.Random(seed)
    return [
        (rng.choice(keys), t0 + rng.randrange(0, 3600 * US), i, float(i) / 4)
        for i in range(n)
    ]


LONG = T.LongType()
DBL = T.DoubleType()


def test_asof_backward_matches_bruteforce(spark):
    left = _rand_events(120, ["a", "b", "c"], seed=1)
    right = _rand_events(90, ["a", "b", "c", "d"], seed=2)
    cols = [("k", T.StringType()), ("t", LONG), ("eid", LONG), ("v", DBL)]
    ldf = _mk(spark, left, cols)
    rdf = _mk(spark, right, cols)
    out = asof_join(
        ldf, rdf, on=["k"], left_ts="t", tiebreak="eid", prefix="m_"
    )
    got = {
        (r["k"], r["t_us"]): (r["m_ts_us"], r["m_eid"], r["m_v"])
        for r in out.collect()
    }
    assert len(got) == len(left)
    for k, t, eid, v in left:
        cands = [r for r in right if r[0] == k and r[1] <= t]
        if not cands:
            assert got[(k, t)] == (None, None, None)
        else:
            # largest ts, then largest tiebreak
            best = max(cands, key=lambda r: (r[1], r[2]))
            assert got[(k, t)] == (best[1], best[2], best[3]), (k, t)


def test_asof_tolerance_and_equal_ts(spark):
    cols = [("k", T.StringType()), ("t", LONG), ("eid", LONG), ("v", DBL)]
    ldf = _mk(spark, [("a", 100 * US, 1, 0.0), ("a", 500 * US, 2, 0.0)], cols)
    # two right rows at the exact left timestamp: largest eid wins;
    # the 500s-left row's only candidate is 400s away — outside a 60s
    # tolerance, inside a 600s one
    rdf = _mk(
        spark,
        [("a", 100 * US, 7, 1.0), ("a", 100 * US, 9, 2.0)],
        cols,
    )
    tight = asof_join(
        ldf, rdf, on=["k"], left_ts="t", tiebreak="eid",
        tolerance_s=60, prefix="m_",
    ).collect()
    by_eid = {r["eid"]: r for r in tight}
    assert by_eid[1]["m_eid"] == 9 and by_eid[1]["m_v"] == 2.0
    assert by_eid[2]["m_eid"] is None and by_eid[2]["m_ts_us"] is None
    loose = asof_join(
        ldf, rdf, on=["k"], left_ts="t", tiebreak="eid",
        tolerance_s=600, prefix="m_",
    ).collect()
    assert {r["m_eid"] for r in loose} == {9}


def test_asof_forward_matches_bruteforce(spark):
    left = _rand_events(80, ["a", "b"], seed=3)
    right = _rand_events(60, ["a", "b"], seed=4)
    cols = [("k", T.StringType()), ("t", LONG), ("eid", LONG), ("v", DBL)]
    out = asof_join(
        _mk(spark, left, cols), _mk(spark, right, cols),
        on=["k"], left_ts="t", direction="forward",
        tiebreak="eid", prefix="m_",
    )
    got = {(r["k"], r["t_us"]): r["m_eid"] for r in out.collect()}
    for k, t, eid, v in left:
        cands = [r for r in right if r[0] == k and r[1] >= t]
        want = (
            max(cands, key=lambda r: (-r[1], r[2]))[2] if cands else None
        )
        assert got[(k, t)] == want, (k, t)


def test_range_join_matches_bruteforce(spark):
    left = _rand_events(100, ["a", "b"], seed=5)
    right = _rand_events(100, ["a", "b"], seed=6)
    cols = [("k", T.StringType()), ("t", LONG), ("eid", LONG), ("v", DBL)]
    lo, hi = -90, 45  # asymmetric window, seconds
    out = range_join(
        _mk(spark, left, cols), _mk(spark, right, cols),
        on=["k"], left_ts="t", lower_s=lo, upper_s=hi,
    )
    got = {(r["k"], r["t_us"], r["eid_r"]) for r in out.collect()}
    want = {
        (lk, lt, reid)
        for lk, lt, leid, lv in left
        for rk, rt, reid, rv in right
        if rk == lk and lt + lo * US <= rt <= lt + hi * US
    }
    assert got == want


def test_range_join_left_keeps_unmatched(spark):
    cols = [("k", T.StringType()), ("t", LONG), ("eid", LONG), ("v", DBL)]
    ldf = _mk(spark, [("a", 0, 1, 0.0), ("a", 10**9, 2, 0.0)], cols)
    rdf = _mk(spark, [("a", 5 * US, 50, 1.0)], cols)
    out = range_join(
        ldf, rdf, on=["k"], left_ts="t",
        lower_s=-10, upper_s=10, how="left",
    ).collect()
    by_eid = {r["eid"]: r for r in out}
    assert by_eid[1]["eid_r"] == 50
    assert by_eid[2]["eid_r"] is None and by_eid[2]["ts_us_r"] is None


def test_range_join_cell_boundaries(spark):
    # right rows exactly ON the window edges and exactly on cell
    # multiples must match inclusively; one microsecond outside must not
    cols = [("t", LONG), ("eid", LONG)]
    w = 30  # ±30s window → 60s cells
    t0 = 1_700_000_000 * US
    ldf = _mk(spark, [(t0, 1)], cols)
    rdf = _mk(
        spark,
        [
            (t0 - w * US, 10), (t0 + w * US, 11),          # edges: in
            (t0 - w * US - 1, 12), (t0 + w * US + 1, 13),  # just out
            (t0, 14),
        ],
        cols,
    )
    out = range_join(
        ldf, rdf, on=None, left_ts="t", lower_s=-w, upper_s=w
    )
    assert {r["eid_r"] for r in out.collect()} == {10, 11, 14}


def test_time_bucket_rollup_gap_fill(spark):
    cols = [("k", T.StringType()), ("t", LONG), ("v", DBL)]
    b = 60  # 1-minute buckets
    t0 = (1_700_000_000 // b * b) * US
    rows = [
        ("x", t0, 1.0),
        ("x", t0 + 59 * US, 2.0),          # same bucket
        ("x", t0 + 3 * b * US, 4.0),       # skips buckets 1-2
        ("y", t0 + b * US, 8.0),
    ]
    out = time_bucket_rollup(
        _mk(spark, rows, cols), "t",
        bucket_s=b, keys=["k"],
        aggs={"n": F.count(F.lit(1)), "s": F.sum("v")},
    )
    got = {(r["k"], r["bucket_start_s"]): (r["n"], r["s"]) for r in out.collect()}
    base_s = t0 // US
    # 4 buckets x 2 keys, zero-filled gaps
    assert len(got) == 8
    assert got[("x", base_s)] == (2, 3.0)
    assert got[("x", base_s + b)] == (0, 0.0)
    assert got[("x", base_s + 3 * b)] == (1, 4.0)
    assert got[("y", base_s + b)] == (1, 8.0)
    assert got[("y", base_s + 3 * b)] == (0, 0.0)


def test_time_bucket_rollup_no_fill(spark):
    cols = [("t", LONG), ("v", DBL)]
    out = time_bucket_rollup(
        _mk(spark, [(0, 1.0), (600 * US, 2.0)], cols), "t",
        bucket_s=300, gap_fill=False,
    )
    got = {r["bucket_start_s"]: r["n_events"] for r in out.collect()}
    assert got == {0: 1, 600: 1}


def test_asof_plan_has_no_single_partition_exchange(spark):
    cols = [("k", T.StringType()), ("t", LONG), ("eid", LONG), ("v", DBL)]
    ldf = _mk(spark, _rand_events(10, ["a"], seed=7), cols)
    rdf = _mk(spark, _rand_events(10, ["a"], seed=8), cols)
    plan = (
        asof_join(ldf, rdf, on=["k"], left_ts="t", tiebreak="eid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" not in plan


def test_rolling_window_agg_vs_bruteforce(spark):
    cols = [("k", T.StringType()), ("t", LONG), ("eid", LONG), ("v", DBL)]
    rows = _rand_events(80, ["a", "b", "c"], seed=11)
    out = rolling_window_agg(
        _mk(spark, rows, cols), "t",
        key_col="k", window_s=600,
        aggs={"n": F.count(F.lit(1)), "s": F.sum("v")},
    )
    got = {(r["k"], r["eid"]): (r["n"], round(r["s"], 9)) for r in out.collect()}
    assert len(got) == len(rows)
    for k, t, eid, v in rows:
        members = [rv for rk, rt, _, rv in rows
                   if rk == k and t - 600 * US <= rt <= t]
        assert got[(k, eid)] == (len(members), round(sum(members), 9)), eid


def test_rolling_window_includes_ts_ties(spark):
    cols = [("k", T.StringType()), ("t", LONG), ("eid", LONG), ("v", DBL)]
    rows = [("a", 0, 1, 1.0), ("a", 0, 2, 2.0), ("a", 700 * US, 3, 4.0)]
    out = rolling_window_agg(
        _mk(spark, rows, cols), "t", key_col="k", window_s=600,
        aggs={"n": F.count(F.lit(1))},
    )
    got = {r["eid"]: r["n"] for r in out.collect()}
    # RANGE frame: timestamp peers count for each other; the 700 s row
    # sees neither (window is 600 s)
    assert got == {1: 2, 2: 2, 3: 1}


def test_rolling_window_plan_single_exchange(spark):
    cols = [("k", T.StringType()), ("t", LONG), ("eid", LONG), ("v", DBL)]
    df = _mk(spark, _rand_events(10, ["a"], seed=3), cols)
    plan = (
        rolling_window_agg(df, "t", key_col="k", window_s=60)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" not in plan
    assert plan.count("Exchange") == 1


def test_event_features_example_end_to_end(spark):
    """examples/event_features.py: the composed temporal pipeline at
    sf0.001 — every purchase gets a feature row, recency is
    non-negative, and the rollup conserves the event count."""
    from examples.event_features import _events, health_rollup, purchase_features

    events = _events(spark, "/root/testdata/sf0.001")
    feats = purchase_features(events).collect()
    n_purchases = events.filter(F.col("event_type") == "purchase").count()
    assert len(feats) == n_purchases
    for r in feats:
        if r["secs_since_last_view"] is not None:
            assert r["secs_since_last_view"] >= 0
        assert r["n_events_1h"] >= 1  # the purchase itself
        assert r["n_errors_5m"] >= 0
    roll = health_rollup(events)
    total = sum(r["n_events"] for r in roll.collect())
    assert total == events.count()


def test_range_agg_matches_bruteforce(spark):
    cols = [("k", T.StringType()), ("t", LONG), ("eid", LONG), ("v", DBL)]
    lrows = _rand_events(40, ["a", "b"], seed=21)
    rrows = _rand_events(200, ["a", "b"], seed=22)
    out = range_agg(
        _mk(spark, lrows, cols), _mk(spark, rrows, cols), on=["k"],
        left_ts="t", left_id="eid", lower_s=-120, upper_s=300,
        sums={"n": F.lit(1), "s": F.col("v")},
    )
    got = {r["eid"]: (r["n"], round(r["s"], 9)) for r in out.collect()}
    assert len(got) == len(lrows)
    for k, t, eid, _ in lrows:
        members = [rv for rk, rt, _, rv in rrows
                   if rk == k and t - 120 * US <= rt <= t + 300 * US]
        assert got[eid] == (len(members), round(sum(members), 9)), eid


def test_range_agg_subcell_boundary_alignment(spark):
    """Timestamps exactly on subcell edges must count once — the full
    range and the boundary scans are provably disjoint."""
    cols = [("t", LONG), ("eid", LONG), ("v", DBL)]
    # window [t-16, t+16] us, subcells=16 -> w = 2 us; right rows sit
    # exactly on every boundary multiple around the left row at t=100
    left = [(100, 1, 0.0)]
    right = [(t, 100 + i, 1.0) for i, t in enumerate(range(80, 121, 2))]
    out = range_agg(
        _mk(spark, left, cols), _mk(spark, right, cols), on=None,
        left_ts="t", left_id="eid",
        lower_s=-16e-6, upper_s=16e-6, subcells=16,
        sums={"n": F.lit(1)},
    )
    rows = out.collect()
    # in [84, 116]: right ts 84..116 step 2 -> 17 rows
    assert rows[0]["n"] == 17


def test_range_agg_equals_range_join_counts(spark):
    cols = [("k", T.StringType()), ("t", LONG), ("eid", LONG), ("v", DBL)]
    ldf = _mk(spark, _rand_events(30, ["a", "b", "c"], seed=31), cols)
    rdf = _mk(spark, _rand_events(150, ["a", "b", "c"], seed=32), cols)
    via_join = (
        range_join(ldf, rdf, on=["k"], left_ts="t",
                   lower_s=-60, upper_s=60, how="left")
        .groupBy("eid").agg(F.count("eid_r").alias("n"))
    )
    via_agg = range_agg(ldf, rdf, on=["k"], left_ts="t", left_id="eid",
                        lower_s=-60, upper_s=60)
    a = {r["eid"]: r["n"] for r in via_join.collect()}
    b = {r["eid"]: r["n_in_range"] for r in via_agg.collect()}
    assert a == b


def test_range_agg_zero_rows_in_range(spark):
    cols = [("t", LONG), ("eid", LONG), ("v", DBL)]
    out = range_agg(
        _mk(spark, [(0, 1, 0.0)], cols),
        _mk(spark, [(10**9, 2, 5.0)], cols),
        on=None, left_ts="t", left_id="eid", lower_s=-1, upper_s=1,
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n_in_range"] == 0


def test_rollup_chunked_spine_matches_and_negative_buckets(spark):
    """The two-level spine must produce exactly the same buckets as a
    flat sequence — including for pre-1970 (negative-index) data that
    trunc division would mis-chunk."""
    cols = [("t", LONG), ("v", DBL)]
    t_neg = -5 * 86_400 * US  # 5 days before the epoch
    rows = [(t_neg, 1.0), (t_neg + 3 * 3600 * US, 2.0), (0, 4.0)]
    out = time_bucket_rollup(
        _mk(spark, rows, cols), "t", bucket_s=3600,
        aggs={"n": F.count(F.lit(1))},
    )
    got = {r["bucket_start_s"]: r["n"] for r in out.collect()}
    lo, hi = -5 * 86_400, 0
    assert len(got) == (hi - lo) // 3600 + 1  # contiguous spine
    assert got[lo] == 1 and got[lo + 3 * 3600] == 1 and got[0] == 1
    assert sum(got.values()) == 3


def test_rollup_spine_generates_in_parallel(spark):
    """A wide span must not generate its spine on one task: the
    chunk-id explode repartitions before the bucket explode."""
    cols = [("t", LONG), ("v", DBL)]
    # 30-day span at 60 s buckets = 43200 spine rows, > 5 chunks
    rows = [(0, 1.0), (30 * 86_400 * US, 2.0)]
    df = time_bucket_rollup(_mk(spark, rows, cols), "t", bucket_s=60)
    assert df.count() == 30 * 1440 + 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the repartition between the two Generates is the parallelism gate
    assert plan.count("Generate") >= 2
    assert "hashpartitioning(__c" in plan


def test_asof_nearest_vs_bruteforce(spark):
    cols = [("k", T.StringType()), ("t", LONG), ("eid", LONG), ("v", DBL)]
    lrows = _rand_events(60, ["a", "b"], seed=41)
    rrows = _rand_events(60, ["a", "b"], seed=42)
    out = asof_join(
        _mk(spark, lrows, cols), _mk(spark, rrows, cols),
        on=["k"], left_ts="t", direction="nearest", tiebreak="eid",
        prefix="m_",
    )
    got = {(r["k"], r["t_us"], r["eid"]): (r["m_ts_us"], r["m_eid"])
           for r in out.collect()}
    assert len(got) == len(lrows)
    for k, t, eid, _ in lrows:
        cands = [(rt, rid) for rk, rt, rid, _ in rrows if rk == k]
        # nearest by |dt|; tie -> backward (dt >= 0); among equal ts
        # the largest tiebreak id wins
        best = min(cands, key=lambda c: (abs(c[0] - t), c[0] > t, -c[1]))
        assert got[(k, t, eid)] == (best[0], best[1]), eid


def test_asof_nearest_tie_goes_backward(spark):
    cols = [("k", T.StringType()), ("t", LONG), ("eid", LONG), ("v", DBL)]
    left = [("a", 100 * US, 1, 0.0)]
    right = [("a", 90 * US, 10, 1.0), ("a", 110 * US, 11, 2.0)]
    out = asof_join(
        _mk(spark, left, cols), _mk(spark, right, cols),
        on=["k"], left_ts="t", direction="nearest", tiebreak="eid",
    ).collect()[0]
    assert out["r_eid"] == 10  # equidistant -> backward, as pandas


def test_asof_nearest_tolerance_each_side(spark):
    cols = [("k", T.StringType()), ("t", LONG), ("eid", LONG), ("v", DBL)]
    left = [("a", 100 * US, 1, 0.0)]
    # backward candidate 50s away, forward candidate 5s away
    right = [("a", 50 * US, 10, 1.0), ("a", 105 * US, 11, 2.0)]
    near = asof_join(
        _mk(spark, left, cols), _mk(spark, right, cols),
        on=["k"], left_ts="t", direction="nearest", tiebreak="eid",
        tolerance_s=10,
    ).collect()[0]
    assert near["r_eid"] == 11  # backward is out of tolerance
    none = asof_join(
        _mk(spark, left, cols), _mk(spark, right, cols),
        on=["k"], left_ts="t", direction="nearest", tiebreak="eid",
        tolerance_s=1,
    ).collect()[0]
    assert none["r_eid"] is None and none["r_ts_us"] is None


def test_asof_nearest_single_exchange(spark):
    cols = [("k", T.StringType()), ("t", LONG), ("eid", LONG), ("v", DBL)]
    ldf = _mk(spark, _rand_events(10, ["a"], seed=5), cols)
    rdf = _mk(spark, _rand_events(10, ["a"], seed=6), cols)
    plan = (
        asof_join(ldf, rdf, on=["k"], left_ts="t", direction="nearest")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # one shuffle, two sorts


def test_range_join_left_preserves_duplicate_left_rows(spark):
    """LEFT JOIN semantics: exactly-duplicate left rows keep their
    multiplicity whether they match or not."""
    cols = [("t", LONG), ("v", DBL)]
    left = [(0, 1.0), (0, 1.0), (10**12, 2.0), (10**12, 2.0)]
    right = [(1 * US, 9.0)]
    out = range_join(
        _mk(spark, left, cols), _mk(spark, right, cols), on=None,
        left_ts="t", lower_s=0, upper_s=2, how="left",
    ).collect()
    matched = [r for r in out if r["ts_us_r"] is not None]
    unmatched = [r for r in out if r["ts_us_r"] is None]
    assert len(matched) == 2    # both duplicate rows at t=0 match
    assert len(unmatched) == 2  # both duplicate rows at t=1e12 survive


def test_asof_null_payload_of_matched_row_survives(spark):
    """ADVICE r7: the matched right row's NULL payload fields must come
    through as NULL — per-column last(ignorenulls) used to substitute
    the value from an OLDER right row. pandas merge_asof / DuckDB ASOF
    return the matched row verbatim, NULLs included."""
    cols = [("k", T.StringType()), ("t", LONG), ("eid", LONG), ("v", DBL)]
    left = [("a", 30 * US, 1, 0.0)]
    # matched row (ts=20) has v=NULL; older row (ts=10) has v=7.0
    right = [("a", 10 * US, 10, 7.0), ("a", 20 * US, 11, None)]
    for direction in ("backward", "nearest"):
        out = asof_join(
            _mk(spark, left, cols), _mk(spark, right, cols),
            on=["k"], left_ts="t", direction=direction, tiebreak="eid",
        ).collect()[0]
        assert out["r_ts_us"] == 20 * US, direction
        assert out["r_eid"] == 11, direction
        assert out["r_v"] is None, direction
    # forward mirror: matched row (ts=40) NULL, newer row (ts=50) 9.0
    right_f = [("a", 40 * US, 12, None), ("a", 50 * US, 13, 9.0)]
    fwd = asof_join(
        _mk(spark, left, cols), _mk(spark, right_f, cols),
        on=["k"], left_ts="t", direction="forward", tiebreak="eid",
    ).collect()[0]
    assert fwd["r_ts_us"] == 40 * US and fwd["r_eid"] == 12
    assert fwd["r_v"] is None


def test_rollup_negative_nonmultiple_buckets_floor(spark):
    """ADVICE r7: bucket ids must use FLOOR division — ts=-1800 s with
    3600 s buckets belongs to bucket_start −3600, not 0 (trunc-toward-
    zero used to collide it with the +1800 s row)."""
    cols = [("t", LONG), ("v", DBL)]
    rows = [(-1800 * US, 1.0), (1800 * US, 2.0)]
    out = time_bucket_rollup(
        _mk(spark, rows, cols), "t", bucket_s=3600,
        aggs={"n": F.count(F.lit(1))},
    )
    got = {r["bucket_start_s"]: r["n"] for r in out.collect()}
    assert got == {-3600: 1, 0: 1}


def test_range_join_density_guard(spark):
    """Opt-in guard: enumeration refused when estimated pairs/left-row
    exceed the bound, with range_agg named in the message; under the
    bound (or without the flag) behavior is unchanged."""
    import pytest

    cols = [("t", LONG), ("eid", LONG), ("v", DBL)]
    # 1000 right rows over 100s -> 10 rows/s; a +/-5s window ~ 100 pairs
    right = _mk(
        spark, [(i * US // 10, i, 1.0) for i in range(1000)], cols
    )
    left = _mk(spark, [(50 * US, 1, 0.0)], cols)
    with pytest.raises(ValueError, match="range_agg"):
        range_join(left, right, on=None, left_ts="t",
                   lower_s=-5, upper_s=5, max_avg_pairs_per_left=10)
    ok = range_join(left, right, on=None, left_ts="t",
                    lower_s=-5, upper_s=5, max_avg_pairs_per_left=500)
    assert ok.count() == 101  # [45s, 55s] inclusive at 10 rows/s
    # empty right side never trips the guard
    empty = range_join(left, right.limit(0), on=None, left_ts="t",
                       lower_s=-5, upper_s=5, max_avg_pairs_per_left=1)
    assert empty.count() == 0


def test_range_join_density_guard_is_key_aware(spark):
    """A keyed join only pairs within its key: the same 1000 right
    rows that refuse keyless (≈100 pairs/left) pass a bound of 5 when
    split across 100 keys (≈1 pair/left per key) — and a genuinely
    dense keyed workload still refuses."""
    import pytest

    kcols = [("k", T.StringType()), ("t", LONG), ("eid", LONG)]
    right = _mk(
        spark,
        [(f"u{i % 100}", i * US // 10, i) for i in range(1000)],
        kcols,
    )
    left = _mk(spark, [("u7", 50 * US, 1)], kcols)
    ok = range_join(left, right, on=["k"], left_ts="t",
                    lower_s=-5, upper_s=5, max_avg_pairs_per_left=5)
    assert ok.count() >= 1  # plan built, guard passed
    # all rows under ONE key: per-key density == keyless density
    hot = right.withColumn("k", F.lit("u0"))
    with pytest.raises(ValueError, match="per-key"):
        range_join(left.withColumn("k", F.lit("u0")), hot, on=["k"],
                   left_ts="t", lower_s=-5, upper_s=5,
                   max_avg_pairs_per_left=5)
    # r8 review: a zero-extent key (singleton / one shared timestamp)
    # can pair with at most its n rows — the guard must clamp, not
    # report span/1us phantom millions
    sparse = _mk(spark, [(f"u{i}", 42 * US, i) for i in range(50)]
                 + [("hot", j * US, 100 + j) for j in range(50)], kcols)
    ok2 = range_join(_mk(spark, [("u7", 42 * US, 1)], kcols), sparse,
                     on=["k"], left_ts="t", lower_s=-5, upper_s=5,
                     max_avg_pairs_per_left=30)
    assert ok2.count() == 1  # singleton keys estimate <= 1, not 1e7


def test_asof_rejects_empty_keys(spark):
    """A keyless as-of would single-partition the window sort — the
    operator refuses instead of silently bottlenecking."""
    cols = [("k", T.StringType()), ("t", LONG), ("eid", LONG), ("v", DBL)]
    df = _mk(spark, _rand_events(4, ["a"], seed=1), cols)
    import pytest
    with pytest.raises(ValueError, match="single-partition"):
        asof_join(df, df, on=[], left_ts="t")
    with pytest.raises(ValueError, match="single-partition"):
        asof_join(df, df, on=[], left_ts="t", direction="nearest")
