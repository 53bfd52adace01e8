"""Tests: salted join, layout helpers, typed entity edge, INSERT rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from impuls_spark.entities import as_entities, entity_class, from_entities
from impuls_spark.operators import ExecuteSQL
from impuls_spark.plans import repartition_feed, salted_join, scale_session_conf
from impuls_spark.task import TaskRuntime


def test_salted_join_matches_plain_join(spark):
    large = spark.range(0, 10000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k long, name string")
    plain = large.join(small, "k").groupBy("name").agg(F.count("*").alias("n"))
    salted = salted_join(large, small, "k", n_salts=8).groupBy("name").agg(
        F.count("*").alias("n")
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_left_join_keeps_unmatched(spark):
    large = spark.createDataFrame([(1, "x"), (9, "y")], "k long, v string")
    small = spark.createDataFrame([(1, "a")], "k long, name string")
    out = salted_join(large, small, "k", n_salts=4, how="left").collect()
    assert len(out) == 2
    assert {r["v"] for r in out} == {"x", "y"}


def test_repartition_feed(feed):
    out = repartition_feed(feed, 8)
    assert out["stop_times"].rdd.getNumPartitions() == 8
    # dimensions untouched
    assert out["agencies"] is feed["agencies"]


def test_scale_session_conf(spark):
    scale_session_conf(spark, 4)
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_entity_roundtrip(spark, feed):
    stops = as_entities(feed["stops"].orderBy("stop_id").limit(3), "stops")
    assert stops[0].stop_id == "wkd00"
    assert stops[0].name == "Warszawa Srodmiescie WKD"
    assert isinstance(stops[0].lat, float)
    with pytest.raises(dataclasses_error()):
        stops[0].name = "nope"  # frozen

    df = from_entities(spark, "stops", stops)
    assert df.count() == 3
    # names+types match (nullability differs: CSV-sourced frames are
    # all-nullable; the canonical spec declares required columns)
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in feed["stops"].schema.fields
    ]


def dataclasses_error():
    import dataclasses

    return dataclasses.FrozenInstanceError


def test_entity_class_names():
    assert entity_class("stop_times").__name__ == "StopTime"
    assert entity_class("agencies").__name__ == "Agency"
    assert entity_class("calendar_exceptions").__name__ == "CalendarException"


def test_insert_select_rewrite(spark, feed):
    rt = TaskRuntime(spark)
    out = ExecuteSQL(statement=(
        "INSERT INTO agencies (agency_id, name, url, timezone) "
        "SELECT 'x' || agency_id, name, url, timezone FROM agencies"
    )).transform(feed, rt)
    assert out["agencies"].count() == 2
    ids = {r[0] for r in out["agencies"].select("agency_id").collect()}
    assert ids == {"0", "x0"}


def test_insert_or_ignore_rewrite(spark, feed):
    rt = TaskRuntime(spark)
    out = ExecuteSQL(statement=(
        "INSERT OR IGNORE INTO agencies (agency_id, name, url, timezone) "
        "SELECT agency_id, name, url, timezone FROM agencies"
    )).transform(feed, rt)
    assert out["agencies"].count() == 1  # duplicate PK skipped


def test_insert_values_rewrite(spark, feed):
    rt = TaskRuntime(spark)
    out = ExecuteSQL(statement=(
        "INSERT INTO agencies (agency_id, name, url, timezone) "
        "VALUES ('v1', 'Via Values', 'u', 'UTC')"
    )).transform(feed, rt)
    rows = {r["agency_id"]: r for r in out["agencies"].collect()}
    assert rows["v1"]["name"] == "Via Values"


def test_update_ignores_unknown_pks(spark, feed):
    """FeedDataset.update is the reference update_many analog
    (db.py:435-441): UPDATE with an unknown PK matches nothing."""
    rows = spark.createDataFrame(
        [("0", "Renamed Agency", "u2", "UTC"),
         ("ghost", "Should Not Appear", "u3", "UTC")],
        "agency_id string, name string, url string, timezone string",
    )
    out = feed.update("agencies", rows)
    got = {r["agency_id"]: r["name"] for r in out["agencies"].collect()}
    assert got["0"] == "Renamed Agency"
    assert "ghost" not in got
    assert out["agencies"].count() == feed["agencies"].count()


def test_upsert_inserts_unknown_pks(spark, feed):
    rows = spark.createDataFrame(
        [("0", "Renamed Agency", "u2", "UTC"),
         ("new", "Brand New", "u3", "UTC")],
        "agency_id string, name string, url string, timezone string",
    )
    out = feed.upsert("agencies", rows)
    got = {r["agency_id"]: r["name"] for r in out["agencies"].collect()}
    assert got["0"] == "Renamed Agency"
    assert got["new"] == "Brand New"
