from .sessions import sessionize_stream, windowed_event_counts
from .stateful import running_threshold_alerts

__all__ = ["sessionize_stream", "windowed_event_counts",
           "running_threshold_alerts"]
