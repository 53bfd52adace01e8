from .add_entity import AddEntity
from .assign_directions import AssignDirections
from .exec_sql import ExecuteSQL
from .generate_trip_headsign import GenerateTripHeadsign
from .modify_from_csv import ModifyFromCSV, ModifyRoutesFromCSV, ModifyStopsFromCSV
from .remove_unused_entities import RemoveUnusedEntities

__all__ = [
    "AddEntity",
    "AssignDirections",
    "ExecuteSQL",
    "GenerateTripHeadsign",
    "ModifyFromCSV",
    "ModifyRoutesFromCSV",
    "ModifyStopsFromCSV",
    "RemoveUnusedEntities",
]
