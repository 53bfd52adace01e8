from .skew import salted_join
from .layout import bucket_for_joins, repartition_feed, scale_session_conf
from .audit import (
    data_proportional_single_partitions,
    physical_plan,
    single_partition_stages,
)

__all__ = ["salted_join", "bucket_for_joins", "repartition_feed",
           "scale_session_conf", "physical_plan",
           "single_partition_stages",
           "data_proportional_single_partitions"]
