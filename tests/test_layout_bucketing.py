"""Bucketing layout test: two tables bucketed on the same key join with
NO exchange (the co-location strategy `plans/layout.py` prescribes for
stop_times ⋈ trips at cluster scale)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from impuls_spark.plans import bucket_for_joins


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, feed, tmp_path):
    warehouse_db = "impuls_test_buckets"
    bucket_for_joins(feed, n_buckets=4, database=warehouse_db,
                     path=str(tmp_path / "tables"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        st = spark.table(f"{warehouse_db}.stop_times")
        trips = spark.table(f"{warehouse_db}.trips")
        joined = st.join(trips, "trip_id").groupBy("route_id").count()
        import re

        plan = _plan_of(joined)
        assert "SortMergeJoin" in plan
        # bucketed co-location: the ONLY exchange is the final groupBy's
        # (an unbucketed join would add one per join input -> 3 total)
        n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_exchanges == 1, plan
        # result correctness against the raw feed
        expect = (
            feed["stop_times"].join(feed["trips"], "trip_id")
            .groupBy("route_id").count()
        )
        assert sorted(joined.collect()) == sorted(expect.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP DATABASE IF EXISTS {warehouse_db} CASCADE")
