"""Bounded-batch probe pruning (impuls_spark/llm/probe.py) and the
key-clustered index layout that makes it bite (VERDICT r11 #2)."""

from __future__ import annotations

import contextlib
import glob
import io

import pytest
from pyspark.sql import functions as F

from impuls_spark.llm import probe
from impuls_spark.llm.dedup import DedupIndex
from impuls_spark.llm.probe import pushdown_key_filter


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(spark, lo, hi):
    # doc-unique tokens: cross-document band collisions would make the
    # novel/near split depend on minhash luck instead of membership
    return spark.createDataFrame(
        [(i, f"document number {i} with words " + " ".join(
            f"w{i}x{j}" for j in range(10)))
         for i in range(lo, hi)],
        "doc_id long, text string",
    )


def test_pushdown_filter_equals_semi_join(spark, tmp_path):
    index = spark.createDataFrame(
        [(str(i), f"p{i}") for i in range(100)], "k string, payload string"
    )
    batch = spark.createDataFrame(
        [(str(i),) for i in (3, 5, 5, 97, 200)] + [(None,)], "k string"
    )
    got = pushdown_key_filter(index, "k", batch)
    want = index.join(F.broadcast(batch.distinct()), "k", "left_semi")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_pushdown_filter_empty_batch_and_cap(spark):
    index = spark.createDataFrame(
        [("a", 1), ("m", 2), ("z", 3)], "k string, v int"
    )
    empty = spark.createDataFrame([], "k string")
    assert pushdown_key_filter(index, "k", empty).count() == 0
    # above the cap the filter degrades to the batch's [min, max] key
    # span (r13, VERDICT r12 #2's over-cap fallback): still a SUPERSET
    # of the batch's rows — callers' semi-joins stay the exact
    # membership step — but always pushable and never a driver-side
    # 100k-literal collect
    old = probe.PROBE_PUSHDOWN_MAX
    probe.PROBE_PUSHDOWN_MAX = 2
    try:
        big = spark.createDataFrame(
            [(k,) for k in ("b", "c", "d", "e", "n")], "k string"
        )
        got = pushdown_key_filter(index, "k", big)
        # span is [b, n]: keeps "m" (inside), prunes "a" and "z"
        assert sorted(r["k"] for r in got.collect()) == ["m"]
    finally:
        probe.PROBE_PUSHDOWN_MAX = old


def test_probe_scan_carries_pushed_in_filter(spark, tmp_path):
    """The micro-batch classify's hashes scan must carry the batch
    keys as a parquet PushedFilters In predicate — that is the whole
    mechanism by which a grown index stops costing O(index) per
    epoch."""
    path = str(tmp_path / "idx")
    DedupIndex.build(_docs(spark, 0, 60), path)
    idx = DedupIndex.load(spark, path)
    status = idx.classify(_docs(spark, 55, 65), broadcast_new=True)
    plan = _plan_of(status)
    assert "PushedFilters: [In(__h" in plan, plan
    assert "PushedFilters: [In(key" in plan, plan
    # and the verdicts are unchanged vs the plain join mode
    plain = idx.classify(_docs(spark, 55, 65), broadcast_new=False)
    assert sorted(map(tuple, status.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_built_artifacts_are_key_sorted(spark, tmp_path):
    """build writes hashes/bands range-partitioned and key-sorted:
    every parquet file's key column is non-decreasing, and file ranges
    are disjoint (repartitionByRange), so row-group min/max stats can
    prune probes."""
    path = str(tmp_path / "idx")
    DedupIndex.build(_docs(spark, 0, 120), path)
    ranges = []
    for f in glob.glob(f"{path}/hashes/*.parquet"):
        vals = [r["__h"] for r in spark.read.parquet(f).collect()]
        if not vals:
            continue
        assert vals == sorted(vals), f
        ranges.append((vals[0], vals[-1]))
    ranges.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi <= b_lo  # disjoint file ranges


def test_ingest_roundtrip_with_pushdown_and_compact_cluster(
    spark, tmp_path
):
    """ingest(broadcast_new=True) on the clustered layout: statuses
    match a fresh classify, appended docs classify 'exact' afterwards,
    and a compact keeps files key-sorted."""
    path = str(tmp_path / "idx")
    DedupIndex.build(_docs(spark, 0, 40), path)
    idx = DedupIndex.load(spark, path)
    st = idx.ingest(_docs(spark, 35, 50), broadcast_new=True)
    got = {r["doc_id"]: r["status"] for r in st.collect()}
    assert all(got[i] == "exact" for i in range(35, 40))
    assert all(got[i] == "novel" for i in range(40, 50))
    # the appended docs are now members
    again = idx.classify(_docs(spark, 40, 50), broadcast_new=True)
    assert {r["status"] for r in again.collect()} == {"exact"}
    idx.compact()
    for f in glob.glob(f"{path}/hashes/*.parquet"):
        vals = [r["__h"] for r in spark.read.parquet(f).collect()]
        assert vals == sorted(vals)
    final = idx.classify(_docs(spark, 40, 50), broadcast_new=True)
    assert {r["status"] for r in final.collect()} == {"exact"}
