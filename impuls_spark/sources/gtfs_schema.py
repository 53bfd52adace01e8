"""Declarative GTFS <-> internal column mapping.

The reference hand-writes this mapping as Rust per-table tables
(impuls/extern/gtfs/schema.rs:9-382). Here it is data: one
``GtfsFileSpec`` per .txt file, each column carrying a *kind* that
selects the parse (GTFS text -> typed) and format (typed -> GTFS text)
expression. Both directions are pure Catalyst expressions.

Special behaviors mirrored from the reference:

- ``agency_id`` / route ``agency_id`` fall back to ``'(missing)'``
  when absent (schema.rs:6).
- ``attribution_id`` / surrogate-PK tables default to the CSV line
  number (schema.rs:32; load.rs:507-526) — see ``line_number_pk``.
- shapes.txt / calendar_dates.txt imply parent ``shapes`` /
  ``calendars`` rows (table.rs:20-26, schema.rs:97-101,241-245).
- unknown columns go to the ``extra_fields`` map; unknown files to
  ``extra_table_rows`` (load_gtfs.py:31-88).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.gtfs import (
    format_gtfs_date,
    format_gtfs_time,
    parse_gtfs_date,
    parse_gtfs_time,
    recode_gtfs_route_type,
    recode_wheelchair,
    wheelchair_to_gtfs,
)

# column kinds: how a GTFS text cell becomes a typed value and back
KINDS = {
    "str": (
        lambda c: c,
        lambda c: F.coalesce(c, F.lit("")),
    ),
    "int": (
        lambda c: c.cast("int"),
        lambda c: F.coalesce(c.cast("string"), F.lit("")),
    ),
    "long": (
        lambda c: c.cast("long"),
        lambda c: F.coalesce(c.cast("string"), F.lit("")),
    ),
    "float": (
        lambda c: c.cast("double"),
        lambda c: F.coalesce(c.cast("string"), F.lit("")),
    ),
    "bool": (  # 0/1 flags
        lambda c: c.cast("int").cast("boolean"),
        lambda c: F.coalesce(c.cast("int").cast("string"), F.lit("")),
    ),
    "date": (
        parse_gtfs_date,
        lambda c: F.coalesce(format_gtfs_date(c), F.lit("")),
    ),
    "time": (
        parse_gtfs_time,
        lambda c: F.coalesce(format_gtfs_time(c), F.lit("")),
    ),
    "wheelchair": (  # GTFS 0/1/2 -> NULL/True/False
        recode_wheelchair,
        wheelchair_to_gtfs,
    ),
    "route_type": (
        recode_gtfs_route_type,
        lambda c: c.cast("string"),
    ),
}


@dataclass(frozen=True)
class Col:
    gtfs: str
    internal: str
    kind: str = "str"
    #: literal used when the column is absent from the file or the cell
    #: is NULL and the internal column is non-nullable
    default: object = None
    #: column is required in a valid feed (parse error surfaced if absent)
    required: bool = False

    def parse_expr(self, present: bool) -> Column:
        parse, _ = KINDS[self.kind]
        if not present:
            return F.lit(self.default).cast(_parse_type(self)).alias(self.internal)
        c = parse(F.col(self.gtfs))
        if self.default is not None:
            c = F.coalesce(c, F.lit(self.default).cast(_parse_type(self)))
        return c.alias(self.internal)

    def format_expr(self) -> Column:
        _, fmt = KINDS[self.kind]
        return fmt(F.col(self.internal)).alias(self.gtfs)


def _parse_type(col: Col) -> str:
    return {
        "str": "string",
        "int": "int",
        "long": "long",
        "float": "double",
        "bool": "boolean",
        "date": "date",
        "time": "int",
        "wheelchair": "boolean",
        "route_type": "int",
    }[col.kind]


@dataclass(frozen=True)
class GtfsFileSpec:
    file: str  # e.g. "routes.txt"
    table: str  # internal table name
    columns: tuple[Col, ...]
    #: internal column assigned 1-based CSV line number when the GTFS id
    #: column is absent (reference load.rs:507-526, schema.rs:32)
    line_number_pk: str | None = None
    #: (parent_table, parent_id_col): distinct FK values imply parent rows
    implied_parent: tuple[str, str] | None = None
    #: GTFS save: ORDER BY these internal cols when ensure_order
    order_by: tuple[str, ...] = ()
    required: bool = False


GTFS_FILES: tuple[GtfsFileSpec, ...] = (
    GtfsFileSpec(
        "agency.txt",
        "agencies",
        (
            Col("agency_id", "agency_id", default="(missing)"),
            Col("agency_name", "name", default="", required=True),
            Col("agency_url", "url", default=""),
            Col("agency_timezone", "timezone", default="", required=True),
            Col("agency_lang", "lang"),
            Col("agency_phone", "phone"),
            Col("agency_fare_url", "fare_url"),
        ),
        order_by=("agency_id",),
        required=True,
    ),
    GtfsFileSpec(
        "attributions.txt",
        "attributions",
        (
            Col("attribution_id", "attribution_id"),
            Col("organization_name", "organization_name", default=""),
            Col("is_producer", "is_producer", "bool", default=False),
            Col("is_operator", "is_operator", "bool", default=False),
            Col("is_authority", "is_authority", "bool", default=False),
            Col("is_data_source", "is_data_source", "bool", default=False),
            Col("attribution_url", "url"),
            Col("attribution_email", "email"),
            Col("attribution_phone", "phone"),
        ),
        line_number_pk="attribution_id",
        order_by=("attribution_id",),
    ),
    GtfsFileSpec(
        "calendar.txt",
        "calendars",
        (
            Col("service_id", "calendar_id", required=True),
            Col("monday", "monday", "bool", default=False),
            Col("tuesday", "tuesday", "bool", default=False),
            Col("wednesday", "wednesday", "bool", default=False),
            Col("thursday", "thursday", "bool", default=False),
            Col("friday", "friday", "bool", default=False),
            Col("saturday", "saturday", "bool", default=False),
            Col("sunday", "sunday", "bool", default=False),
            Col("start_date", "start_date", "date", default="1111-11-11"),
            Col("end_date", "end_date", "date", default="1111-11-11"),
            Col("calendar_desc", "desc"),
        ),
        order_by=("calendar_id",),
    ),
    GtfsFileSpec(
        "calendar_dates.txt",
        "calendar_exceptions",
        (
            Col("service_id", "calendar_id", required=True),
            Col("date", "date", "date", required=True),
            Col("exception_type", "exception_type", "int", required=True),
        ),
        implied_parent=("calendars", "calendar_id"),
        order_by=("calendar_id", "date"),
    ),
    GtfsFileSpec(
        "feed_info.txt",
        "feed_info",
        (
            # singleton row: id fixed to '0' (reference feed_info.py:46-57)
            Col("feed_info_id", "feed_info_id", default="0"),
            Col("feed_publisher_name", "publisher_name", default=""),
            Col("feed_publisher_url", "publisher_url", default=""),
            Col("feed_lang", "lang", default=""),
            Col("feed_version", "version"),
            Col("feed_contact_email", "contact_email"),
            Col("feed_contact_url", "contact_url"),
            Col("feed_start_date", "start_date", "date"),
            Col("feed_end_date", "end_date", "date"),
        ),
    ),
    GtfsFileSpec(
        "routes.txt",
        "routes",
        (
            Col("route_id", "route_id", required=True),
            Col("agency_id", "agency_id", default="(missing)"),
            Col("route_short_name", "short_name", default=""),
            Col("route_long_name", "long_name", default=""),
            Col("route_type", "type", "route_type", required=True),
            Col("route_color", "color"),
            Col("route_text_color", "text_color"),
            Col("route_sort_order", "sort_order", "int"),
        ),
        order_by=("route_id",),
        required=True,
    ),
    GtfsFileSpec(
        "stops.txt",
        "stops",
        (
            Col("stop_id", "stop_id", required=True),
            Col("stop_name", "name", default=""),
            Col("stop_lat", "lat", "float", default=0.0),
            Col("stop_lon", "lon", "float", default=0.0),
            Col("stop_code", "code"),
            Col("zone_id", "zone_id"),
            Col("location_type", "location_type", "int", default=0),
            Col("parent_station", "parent_station"),
            Col("wheelchair_boarding", "wheelchair_boarding", "wheelchair"),
            Col("platform_code", "platform_code"),
        ),
        order_by=("stop_id",),
        required=True,
    ),
    GtfsFileSpec(
        "fare_attributes.txt",
        "fare_attributes",
        (
            Col("fare_id", "fare_id", required=True),
            Col("price", "price", "float", default=0.0),
            Col("currency_type", "currency_type", default=""),
            Col("payment_method", "payment_method", "int", default=0),
            Col("transfers", "transfers", "int"),
            Col("agency_id", "agency_id", default="(missing)"),
            Col("transfer_duration", "transfer_duration", "int"),
        ),
        order_by=("fare_id",),
    ),
    GtfsFileSpec(
        "fare_rules.txt",
        "fare_rules",
        (
            Col("fare_rule_id", "fare_rule_id", "long"),
            Col("fare_id", "fare_id", required=True),
            Col("route_id", "route_id"),
            Col("origin_id", "origin_id"),
            Col("destination_id", "destination_id"),
            Col("contains_id", "contains_id"),
        ),
        line_number_pk="fare_rule_id",
        order_by=("fare_rule_id",),
    ),
    GtfsFileSpec(
        "shapes.txt",
        "shape_points",
        (
            Col("shape_id", "shape_id", required=True),
            Col("shape_pt_sequence", "sequence", "int", required=True),
            Col("shape_pt_lat", "lat", "float", default=0.0),
            Col("shape_pt_lon", "lon", "float", default=0.0),
            Col("shape_dist_traveled", "shape_dist_traveled", "float"),
        ),
        implied_parent=("shapes", "shape_id"),
        order_by=("shape_id", "sequence"),
    ),
    GtfsFileSpec(
        "trips.txt",
        "trips",
        (
            Col("trip_id", "trip_id", required=True),
            Col("route_id", "route_id", required=True),
            Col("service_id", "calendar_id", required=True),
            Col("trip_headsign", "headsign"),
            Col("trip_short_name", "short_name"),
            Col("direction_id", "direction", "int"),
            Col("block_id", "block_id"),
            Col("shape_id", "shape_id"),
            Col("wheelchair_accessible", "wheelchair_accessible", "wheelchair"),
            Col("bikes_allowed", "bikes_allowed", "wheelchair"),
            Col("exceptional", "exceptional", "bool"),
        ),
        order_by=("trip_id",),
        required=True,
    ),
    GtfsFileSpec(
        "stop_times.txt",
        "stop_times",
        (
            Col("trip_id", "trip_id", required=True),
            Col("stop_id", "stop_id", required=True),
            Col("stop_sequence", "stop_sequence", "int", required=True),
            Col("arrival_time", "arrival_time", "time", required=True),
            Col("departure_time", "departure_time", "time", required=True),
            Col("pickup_type", "pickup_type", "int", default=0),
            Col("drop_off_type", "drop_off_type", "int", default=0),
            Col("stop_headsign", "stop_headsign"),
            Col("shape_dist_traveled", "shape_dist_traveled", "float"),
            Col("original_stop_id", "original_stop_id"),
            Col("platform", "platform"),
        ),
        order_by=("trip_id", "stop_sequence"),
        required=True,
    ),
    GtfsFileSpec(
        "frequencies.txt",
        "frequencies",
        (
            Col("trip_id", "trip_id", required=True),
            Col("start_time", "start_time", "time", required=True),
            Col("end_time", "end_time", "time", required=True),
            Col("headway_secs", "headway", "int", required=True),
            Col("exact_times", "exact_times", "bool", default=False),
        ),
        order_by=("trip_id", "start_time"),
    ),
    GtfsFileSpec(
        "transfers.txt",
        "transfers",
        (
            Col("transfer_id", "transfer_id", "long"),
            Col("from_stop_id", "from_stop_id"),
            Col("to_stop_id", "to_stop_id"),
            Col("from_route_id", "from_route_id"),
            Col("to_route_id", "to_route_id"),
            Col("from_trip_id", "from_trip_id"),
            Col("to_trip_id", "to_trip_id"),
            Col("transfer_type", "transfer_type", "int", default=0),
            Col("min_transfer_time", "min_transfer_time", "int"),
        ),
        line_number_pk="transfer_id",
        order_by=("transfer_id",),
    ),
    GtfsFileSpec(
        "translations.txt",
        "translations",
        (
            Col("translation_id", "translation_id", "long"),
            Col("table_name", "table_name", default=""),
            Col("field_name", "field_name", default=""),
            Col("language", "language", default=""),
            Col("translation", "translation", default=""),
            Col("record_id", "record_id"),
            Col("record_sub_id", "record_sub_id"),
            Col("field_value", "field_value"),
        ),
        line_number_pk="translation_id",
        order_by=("translation_id",),
    ),
)

FILE_BY_NAME = {spec.file: spec for spec in GTFS_FILES}
SPEC_BY_TABLE = {spec.table: spec for spec in GTFS_FILES}
