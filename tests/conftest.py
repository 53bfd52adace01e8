from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    session = (
        SparkSession.builder.master("local[4]")
        .appName("impuls_spark_tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


@pytest.fixture(scope="session")
def gtfs_dir(tmp_path_factory):
    """Deterministic WKD-shaped GTFS feed as a directory of .txt files."""
    from tests.fixtures.make_feed import write_feed

    target = tmp_path_factory.mktemp("feed") / "wkd"
    return write_feed(str(target))


@pytest.fixture(scope="session")
def feed(spark, gtfs_dir):
    from impuls_spark.sources import load_gtfs

    return load_gtfs(spark, gtfs_dir)
