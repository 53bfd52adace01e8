"""AddEntity — insert one constant row into a feed table.

Parity target: reference impuls/tasks/add_entity.py:8-18.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import functions as F

from .. import schema as S
from ..feed import FeedDataset
from ..task import BaseTask, TaskRuntime


class AddEntity(BaseTask):
    def __init__(self, table: str, row: Mapping[str, object]) -> None:
        if table not in S.TABLES:
            raise KeyError(table)
        self.table = table
        self.row = dict(row)

    @property
    def name(self) -> str:
        return f"AddEntity({self.table})"

    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        spec = S.TABLES[self.table]
        unknown = set(self.row) - {f.name for f in spec.schema.fields}
        if unknown:
            raise KeyError(f"unknown columns for {self.table}: {sorted(unknown)}")
        cols = [
            F.lit(self.row.get(f.name)).cast(f.dataType).alias(f.name)
            for f in spec.schema.fields
        ]
        one = runtime.spark.range(1).select(*cols)
        return feed.insert(self.table, one)
