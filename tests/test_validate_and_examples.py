"""Tests: feed validate() operator + the reference-shaped example pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from impuls_spark.operators import AddEntity
from impuls_spark.task import TaskRuntime
from impuls_spark.validate import validate


@pytest.fixture()
def rt(spark):
    return TaskRuntime(spark)


def test_validate_clean_feed(feed):
    assert validate(feed).count() == 0


def test_validate_catches_violations(feed, rt):
    # bad route type, dangling agency FK, duplicate stop PK
    bad = AddEntity("routes", {
        "route_id": "BAD", "agency_id": "ghost", "short_name": "B",
        "long_name": "Bad", "type": 99,
    }).transform(feed, rt)
    dup = bad.insert("stops", bad["stops"].limit(1))
    report = {(r["table_name"], r["constraint"]): r["n_violations"]
              for r in validate(dup).collect()}
    assert report[("routes", "check:type_in_enum")] == 1
    assert report[("routes", "fk:agency_id->agencies")] == 1
    assert report[("stops", "pk:unique")] == 1
    # the bad route also orphans trips? no trips reference BAD, so no more
    assert ("trips", "fk:route_id->routes") not in report


def test_example_pipeline(spark, feed):
    from examples.krakow_like import build_pipeline

    out = build_pipeline().run(spark, feed)

    # trips with no boardable stop (pickup_type=1 everywhere, k%13==0)
    # are gone and their stop_times cascaded
    assert out["trips"].count() < feed["trips"].count()
    st_trips = out["stop_times"].select("trip_id").distinct()
    dangling = st_trips.join(out["trips"].select("trip_id"), "trip_id", "left_anti")
    assert dangling.count() == 0

    # block ids dropped
    assert out["trips"].filter(F.col("block_id").isNotNull()).count() == 0

    # route long names regenerated as "first — last"
    ln = out["routes"].filter(F.col("route_id") == "A1").collect()[0]["long_name"]
    assert " — " in ln

    # no duplicate-name stop groups remain without a station parent
    from impuls_spark.validate import validate as v

    assert v(out).count() == 0
