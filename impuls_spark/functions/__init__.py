from .gtfs import (
    format_gtfs_date,
    format_gtfs_time,
    parse_gtfs_date,
    parse_gtfs_time,
    recode_gtfs_route_type,
    recode_wheelchair,
    wheelchair_to_gtfs,
)
from .geo import earth_distance_m, haversine_km, initial_bearing_deg

__all__ = [
    "parse_gtfs_time",
    "format_gtfs_time",
    "parse_gtfs_date",
    "format_gtfs_date",
    "recode_gtfs_route_type",
    "recode_wheelchair",
    "wheelchair_to_gtfs",
    "haversine_km",
    "earth_distance_m",
    "initial_bearing_deg",
]
