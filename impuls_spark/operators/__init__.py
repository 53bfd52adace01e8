from .add_entity import AddEntity
from .assign_directions import AssignDirections
from .calendars import (
    ExtendCalendars,
    ExtendCalendarsFromPolishExceptions,
    NoServicesLeft,
    SimplifyCalendars,
    TruncateCalendars,
    active_days,
)
from .exec_sql import ExecuteSQL
from .generate_trip_headsign import GenerateTripHeadsign
from .merge import Merge
from .split_trip_legs import SplitTripLegs
from .modify_from_csv import ModifyFromCSV, ModifyRoutesFromCSV, ModifyStopsFromCSV
from .remove_unused_entities import RemoveUnusedEntities
from .temporal_join import (
    asof_join,
    range_agg,
    range_join,
    rolling_window_agg,
    time_bucket_rollup,
)

__all__ = [
    "AddEntity",
    "AssignDirections",
    "ExecuteSQL",
    "ExtendCalendars",
    "ExtendCalendarsFromPolishExceptions",
    "NoServicesLeft",
    "SimplifyCalendars",
    "TruncateCalendars",
    "active_days",
    "GenerateTripHeadsign",
    "Merge",
    "ModifyFromCSV",
    "SplitTripLegs",
    "ModifyRoutesFromCSV",
    "ModifyStopsFromCSV",
    "RemoveUnusedEntities",
    "asof_join",
    "range_agg",
    "range_join",
    "rolling_window_agg",
    "time_bucket_rollup",
]
