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
    # one write job per table, tables independent — overlap them
    # (optimization guide §2.6): the snapshot pays the slowest table's
    # write instead of the sum of 17 job tails
    from ..tools.concurrency import parallel_writes

    parallel_writes(*[
        lambda n=name: feed[n].write.mode("overwrite").parquet(
            os.path.join(target_dir, n))
        for name in S.TABLES
    ])


def load_feed_parquet(spark: SparkSession, source_dir: str) -> FeedDataset:
    tables = {}
    for name, spec in S.TABLES.items():
        path = os.path.join(source_dir, name)
        if os.path.isdir(path):
            tables[name] = spark.read.schema(spec.schema).parquet(path)
    feed = FeedDataset.empty(spark)
    return feed.with_tables(tables)
