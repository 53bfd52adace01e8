"""Feed snapshots as parquet directories.

Parity target: ``SaveDB`` / ``LoadDB`` (reference impuls/tasks/
save_db.py:11-22, load_db.py:9-25 — SQLite file backup). Ours is one
parquet dataset per table under a directory; this is also the
intermediate-feed format for MultiFile versioned caching (SURVEY §2.1 S5).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .. import schema as S
from ..feed import FeedDataset


def save_feed_parquet(feed: FeedDataset, target_dir: str) -> None:
    os.makedirs(target_dir, exist_ok=True)
    for name in S.TABLES:
        feed[name].write.mode("overwrite").parquet(os.path.join(target_dir, name))


def load_feed_parquet(spark: SparkSession, source_dir: str) -> FeedDataset:
    tables = {}
    for name, spec in S.TABLES.items():
        path = os.path.join(source_dir, name)
        if os.path.isdir(path):
            tables[name] = spark.read.schema(spec.schema).parquet(path)
    feed = FeedDataset.empty(spark)
    return feed.with_tables(tables)
