"""Typed entity edge — Row <-> dataclass converters.

Parity target: the reference's typed ORM surface (impuls/db.py
typed_out_execute -> frozen dataclasses via DataclassSQLBuilder,
SURVEY §3.3). Bulk dataflow never materializes entities; these
converters exist only at the Python API edge for driver-side,
small-result ergonomics:

    stops = as_entities(feed["stops"].filter(...), "stops")
    stops[0].name
    feed = feed.upsert("stops", from_entities(spark, "stops", stops))

Dataclasses are generated from the canonical StructTypes, so the two
schemas can never drift.
"""

from __future__ import annotations

import dataclasses
import datetime
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession

from . import schema as S

_PY_TYPES = {
    "string": str,
    "int": int,
    "bigint": int,
    "double": float,
    "boolean": bool,
    "date": datetime.date,
    "map<string,string>": dict,
}


@lru_cache(maxsize=None)
def entity_class(table: str) -> type:
    """The frozen dataclass for one feed table (generated)."""
    spec = S.TABLES[table]
    fields = []
    for f in spec.schema.fields:
        py = _PY_TYPES.get(f.dataType.simpleString(), object)
        fields.append((f.name, py | None if f.nullable else py,
                       dataclasses.field(default=None) if f.nullable else
                       dataclasses.MISSING))
    # dataclass field ordering: non-default fields first
    fields.sort(key=lambda t: t[2] is not dataclasses.MISSING)
    cleaned = [
        (n, t) if d is dataclasses.MISSING else (n, t, d) for n, t, d in fields
    ]
    cls = dataclasses.make_dataclass(
        _camel(table), cleaned, frozen=True, slots=True
    )
    cls.__doc__ = f"Typed row of the '{table}' feed table."
    return cls


_CLASS_NAMES = {
    "agencies": "Agency",
    "attributions": "Attribution",
    "calendars": "Calendar",
    "calendar_exceptions": "CalendarException",
    "feed_info": "FeedInfo",
    "routes": "Route",
    "stops": "Stop",
    "fare_attributes": "FareAttribute",
    "fare_rules": "FareRule",
    "shapes": "Shape",
    "shape_points": "ShapePoint",
    "trips": "Trip",
    "stop_times": "StopTime",
    "frequencies": "Frequency",
    "transfers": "Transfer",
    "translations": "Translation",
    "extra_table_rows": "ExtraTableRow",
}


def _camel(table: str) -> str:
    return _CLASS_NAMES.get(
        table, "".join(p.capitalize() for p in table.split("_"))
    )


def as_entities(df: DataFrame, table: str) -> list:
    """Collect a (small!) DataFrame into typed frozen dataclasses.
    Driver-side by definition — never call on row-heavy tables."""
    cls = entity_class(table)
    names = [f.name for f in S.TABLES[table].schema.fields]
    return [cls(**{n: row[n] for n in names}) for row in df.collect()]


def from_entities(spark: SparkSession, table: str, entities: list) -> DataFrame:
    """Typed dataclasses -> DataFrame with the canonical schema."""
    spec = S.TABLES[table]
    rows = [
        tuple(getattr(e, f.name) for f in spec.schema.fields) for e in entities
    ]
    return spark.createDataFrame(rows, spec.schema)
