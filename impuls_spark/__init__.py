"""impuls_spark — a PySpark-native batch ETL engine for GTFS-shaped feeds.

A from-scratch, Spark-first re-expression of the capabilities of
MKuranowski/Impuls (the reference, a SQLite+Rust single-node framework):
the same 17-table relational model, the same operator inventory, plus
large-scale data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) — all as lazy DataFrame transformations
optimized by Catalyst.
"""

from .errors import DataError, ImpulsError, InputNotModified, MultipleDataErrors
from .feed import FeedDataset
from .pipeline import Pipeline
from .task import BaseTask, PipelineOptions, Task, TaskRuntime

__version__ = "0.1.0"

__all__ = [
    "FeedDataset",
    "Pipeline",
    "Task",
    "BaseTask",
    "TaskRuntime",
    "PipelineOptions",
    "DataError",
    "ImpulsError",
    "InputNotModified",
    "MultipleDataErrors",
    "__version__",
]
