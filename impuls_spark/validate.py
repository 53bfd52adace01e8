"""Feed validation — CHECK-constraint and FK-integrity reporting.

The reference enforces CHECK constraints and foreign keys inside SQLite
(STRICT tables, §1.2 DDLs); a violating row fails the INSERT. In Spark
there is no storage engine to refuse rows, so validation is an explicit
operator (SURVEY §4.1 "custom-lite"): :func:`validate` evaluates every
declared constraint plus every FK edge and returns a violations
DataFrame ``(table_name, constraint, n_violations)`` — empty means the
feed would have loaded cleanly into the reference's schema.

Collect-don't-fail-fast (§2.5): all constraints are evaluated in one
pass; callers decide whether any violation is fatal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import schema as S
from .feed import FeedDataset

def _constraints() -> dict[str, list[tuple[str, Column]]]:
    """Per-table named validity predicates (True = row is valid),
    mirroring the reference DDL CHECKs (file:line cites in schema.py).
    Built lazily — Column construction needs an active SparkContext."""
    out: dict[str, list[tuple[str, Column]]] = {}

    def _c(table: str, name: str, valid: Column) -> None:
        out.setdefault(table, []).append((name, valid))

    _c("routes", "type_in_enum",
       F.col("type").isin(*[int(t) for t in S.RouteType]))
    _c("stops", "location_type_in_enum",
       F.col("location_type").isin(*[int(t) for t in S.LocationType]))
    _c("stops", "lat_in_range", F.col("lat").between(-90.0, 90.0))
    _c("stops", "lon_in_range", F.col("lon").between(-180.0, 180.0))
    _c("calendar_exceptions", "exception_type_in_enum",
       F.col("exception_type").isin(*[int(t) for t in S.ExceptionType]))
    _c("trips", "direction_in_enum",
       F.col("direction").isNull() | F.col("direction").isin(0, 1))
    _c("stop_times", "pickup_type_in_enum", F.col("pickup_type").isin(0, 1, 2, 3))
    _c("stop_times", "drop_off_type_in_enum", F.col("drop_off_type").isin(0, 1, 2, 3))
    _c("stop_times", "arrival_nonnegative", F.col("arrival_time") >= 0)
    _c("stop_times", "departure_after_arrival",
       F.col("departure_time") >= F.col("arrival_time"))
    _c("fare_attributes", "price_nonnegative", F.col("price") >= 0.0)
    _c("fare_attributes", "currency_is_3_chars", F.length("currency_type") == 3)
    _c("fare_attributes", "transfers_in_enum",
       F.col("transfers").isNull() | F.col("transfers").isin(0, 1, 2))
    _c("fare_attributes", "transfer_duration_positive",
       F.col("transfer_duration").isNull() | (F.col("transfer_duration") > 0))
    _c("transfers", "transfer_type_in_enum",
       F.col("transfer_type").isin(*[int(t) for t in S.TransferType]))
    _c("frequencies", "headway_positive", F.col("headway") > 0)
    _c("calendars", "date_range_ordered",
       F.col("end_date") >= F.col("start_date"))
    _c("feed_info", "singleton_id", F.col("feed_info_id") == "0")
    return out


def validate(feed: FeedDataset) -> DataFrame:
    """Violations per (table, constraint): CHECKs, PK uniqueness/nulls,
    FK dangling references. One lazy union of small aggregates."""
    spark = feed.spark
    parts: list[DataFrame] = []

    def emit(table: str, constraint: str, count_df: DataFrame) -> None:
        parts.append(
            count_df.select(
                F.lit(table).alias("table_name"),
                F.lit(constraint).alias("constraint"),
                F.col("n").alias("n_violations"),
            )
        )

    for table, checks in _constraints().items():
        df = feed[table]
        for name, valid in checks:
            bad = df.filter(~F.coalesce(valid, F.lit(False)))
            emit(table, f"check:{name}", bad.agg(F.count("*").alias("n")))

    for table, spec in S.TABLES.items():
        df = feed[table]
        pk = list(spec.pk)
        any_null = F.lit(False)
        for c in pk:
            any_null = any_null | F.col(c).isNull()
        null_pk = df.filter(any_null)
        emit(table, "pk:not_null", null_pk.agg(F.count("*").alias("n")))
        dupes = (
            df.groupBy(*pk).agg(F.count("*").alias("__c"))
            .filter(F.col("__c") > 1)
            .agg(F.coalesce(F.sum(F.col("__c") - 1), F.lit(0)).alias("n"))
        )
        emit(table, "pk:unique", dupes)

    for fk in S.FOREIGN_KEYS:
        child = feed[fk.child]
        parent_keys = feed[fk.parent].select(
            *[F.col(pc).alias(cc) for pc, cc in zip(fk.parent_cols, fk.child_cols)]
        ).distinct()
        non_null = child
        for cc in fk.child_cols:
            non_null = non_null.filter(F.col(cc).isNotNull())
        dangling = non_null.join(parent_keys, list(fk.child_cols), "left_anti")
        emit(
            fk.child,
            f"fk:{'.'.join(fk.child_cols)}->{fk.parent}",
            dangling.agg(F.count("*").alias("n")),
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("n_violations") > 0)
