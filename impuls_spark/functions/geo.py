"""Geodesic helpers as native column expressions.

The reference implements haversine distance and initial bearing as
scalar Python functions (impuls/tools/geo.py:16-55). Here they are
Catalyst column expressions (radians/sin/cos/asin/atan2) — fully
codegen'd, usable inside joins at scale — plus scalar Python twins for
driver-side use.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km between two (lat, lon) columns."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def earth_distance_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Distance in meters (the reference's merge threshold is 10 m —
    impuls/tasks/merge.py:612-627)."""
    return haversine_km(lat1, lon1, lat2, lon2) * 1000.0


def initial_bearing_deg(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Initial bearing (forward azimuth) in degrees, [0, 360)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlon = F.radians(lon2 - lon1)
    x = F.sin(dlon) * F.cos(rlat2)
    y = F.cos(rlat1) * F.sin(rlat2) - F.sin(rlat1) * F.cos(rlat2) * F.cos(dlon)
    return (F.degrees(F.atan2(x, y)) + 360.0) % 360.0


def haversine_km_scalar(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Scalar twin for driver-side code (merge greedy pass)."""
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    a = (
        math.sin(dlat / 2) ** 2
        + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2)) * math.sin(dlon / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))
