"""GTFS scalar conversions as native column expressions.

The reference registers these as SQLite scalar functions implemented in
Rust (impuls/extern/db.rs:97-192). Here each is a pure Catalyst column
expression — JVM-side, codegen'd, no UDFs — so they inline into scans
and stay inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_gtfs_time(col: Column | str) -> Column:
    """``'HH:MM:SS'`` (or ``'H:MM:SS'``) -> integer seconds.

    GTFS times legitimately exceed 24:00:00 (``'25:01:08'`` -> 90068),
    so this is NOT a timestamp parse (reference: impuls/extern/db.rs:
    parse_gtfs_time; impuls/model/meta/utility_types.py:21-22).
    Returns NULL for NULL/empty/malformed input.
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, ":")
    ok = c.rlike(r"^\d+:[0-5]\d:[0-5]\d$")
    seconds = (
        parts.getItem(0).cast("int") * 3600
        + parts.getItem(1).cast("int") * 60
        + parts.getItem(2).cast("int")
    )
    return F.when(ok, seconds)


def format_gtfs_time(col: Column | str) -> Column:
    """Integer seconds -> ``'HH:MM:SS'``, hours may exceed 24
    (reference format string: impuls/extern/gtfs/schema.rs:294)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.format_string(
        "%02d:%02d:%02d",
        (c / 3600).cast("int"),
        ((c % 3600) / 60).cast("int"),
        (c % 60).cast("int"),
    )


def parse_gtfs_date(col: Column | str) -> Column:
    """``'YYYYMMDD'`` -> DateType (reference: impuls/extern/db.rs parse_gtfs_date)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c, "yyyyMMdd")


def format_gtfs_date(col: Column | str) -> Column:
    """DateType -> ``'YYYYMMDD'``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd")


def recode_gtfs_route_type(col: Column | str) -> Column:
    """Extended GTFS route types (100-1799) -> the 10 basic codes.

    Mirrors the recode table in the reference
    (impuls/extern/db.rs:168-187): hundreds-group mapping, e.g.
    100-199 rail, 200-299 + 700-899 bus, 900-999 tram, 1000 ferry,
    1300/1400 aerial/funicular; basic codes pass through.
    Unknown codes -> NULL (collect-don't-crash; reference raises).
    """
    c = F.col(col) if isinstance(col, str) else col
    i = c.cast("int")
    return (
        F.when(i.isin(0, 1, 2, 3, 4, 5, 6, 7, 11, 12), i)
        .when((i >= 100) & (i < 200), F.lit(2))  # railway service
        .when((i >= 200) & (i < 300), F.lit(3))  # coach service
        .when((i >= 400) & (i < 500), F.lit(1))  # urban railway -> metro
        .when((i >= 700) & (i < 800), F.lit(3))  # bus service
        .when(i == 800, F.lit(11))  # trolleybus
        .when((i >= 900) & (i < 1000), F.lit(0))  # tram service
        .when(i == 1000, F.lit(4))  # water transport
        .when(i == 1300, F.lit(6))  # aerial lift
        .when(i == 1400, F.lit(7))  # funicular
    )


def recode_wheelchair(col: Column | str) -> Column:
    """GTFS 0/1/2 accessibility -> three-state boolean NULL/True/False
    (reference recode: impuls/extern/gtfs/schema.rs:181-187)."""
    c = F.col(col) if isinstance(col, str) else col
    i = c.cast("int")
    return F.when(i == 1, F.lit(True)).when(i == 2, F.lit(False))


def wheelchair_to_gtfs(col: Column | str) -> Column:
    """Three-state boolean -> GTFS '0'/'1'/'2' text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit("0")).when(c, F.lit("1")).otherwise(F.lit("2"))
