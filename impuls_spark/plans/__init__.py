from .skew import salted_join
from .layout import bucket_for_joins, repartition_feed, scale_session_conf

__all__ = ["salted_join", "bucket_for_joins", "repartition_feed",
           "scale_session_conf"]
