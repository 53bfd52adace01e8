from .sessions import sessionize_stream, windowed_event_counts

__all__ = ["sessionize_stream", "windowed_event_counts"]
