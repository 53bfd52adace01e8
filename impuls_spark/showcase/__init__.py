"""Showcase queries — each SURVEY §2 operator pattern demonstrated on the
driver's synthetic TPC-H-ish tables, with a matching ANSI-SQL oracle.

The engine's real operators work on the 17-table GTFS feed (see
``impuls_spark.operators``); the correctness harness compares Spark
results against a DuckDB oracle on ``region nation customer supplier
part orders lineitem events documents embeddings`` — so every operator
pattern here is re-expressed over those tables with identical column
aliases on both sides.
"""

from .relational import RELATIONAL_QUERIES, RELATIONAL_ORACLES

QUERIES: dict = {}
ORACLES: dict = {}

QUERIES.update(RELATIONAL_QUERIES)
ORACLES.update(RELATIONAL_ORACLES)

from .llm import LLM_QUERIES, LLM_ORACLES
from .streaming import STREAMING_QUERIES, STREAMING_ORACLES

QUERIES.update(LLM_QUERIES)
ORACLES.update(LLM_ORACLES)
QUERIES.update(STREAMING_QUERIES)
ORACLES.update(STREAMING_ORACLES)

__all__ = ["QUERIES", "ORACLES"]
