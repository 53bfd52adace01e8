from .generate_trip_headsign import GenerateTripHeadsign

__all__ = ["GenerateTripHeadsign"]
