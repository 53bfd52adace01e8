"""Showcase queries — each SURVEY §2 operator pattern demonstrated on the
driver's synthetic TPC-H-ish tables, with a matching ANSI-SQL oracle.

The engine's real operators work on the 17-table GTFS feed (see
``impuls_spark.operators``); the correctness harness compares Spark
results against a DuckDB oracle on ``region nation customer supplier
part orders lineitem events documents embeddings`` — so every operator
pattern here is re-expressed over those tables with identical column
aliases on both sides.

Group imports are deliberately unguarded: if any group fails to import,
the whole showcase import fails loudly instead of silently truncating
the registered query set (the r4 driver run recorded exactly the first
50 registered queries, so registration must be all-or-nothing and
ordered cheapest-first — a time-budgeted harness then cuts the fewest,
and the heavy dedup suite runs last).
"""

from .relational import RELATIONAL_QUERIES, RELATIONAL_ORACLES
from .llm import LLM_QUERIES, LLM_ORACLES
from .streaming import STREAMING_QUERIES, STREAMING_ORACLES

_ALL_QUERIES: dict = {}
_ALL_QUERIES.update(RELATIONAL_QUERIES)
_ALL_QUERIES.update(LLM_QUERIES)
_ALL_QUERIES.update(STREAMING_QUERIES)

_ALL_ORACLES: dict = {}
_ALL_ORACLES.update(RELATIONAL_ORACLES)
_ALL_ORACLES.update(LLM_ORACLES)
_ALL_ORACLES.update(STREAMING_ORACLES)

#: queries that dominate suite wall-clock (shingle/LSH/bigram machinery)
#: — registered LAST, in this order, so a wall-clock-budgeted harness
#: truncates the expensive tail rather than cheap untested queries.
#: d10/d18 lead because they warm the shared shingle cache that
#: d02/d26/d03 (and through d03, d14/d29) reuse.
_HEAVY_TAIL = [
    # moderate non-cache queries first (a wall-clock-budgeted harness
    # truncating the tail cuts the most expensive work last)
    "d32_repetition",
    "d33_ngram_novelty",
    "d37_kmeans",
    "d41_duplicate_spans",
    "d42_pq_codes",
    "d43_ivfpq_topk",
    "d10_fingerprints",
    "d18_decontaminate",
    "d02_ngram_jaccard",
    "d03_minhash_lsh",
    "d14_dup_clusters",
    "d29_split_contamination",
    "d35_incremental_dedup",
    "d04_simhash_neardup",
    "d24_bigram_lm",
    # d26 LAST: its intersection stages leave enough executor-memory
    # pressure that d03/d14 measured 30-40% slower right after it
    # (back-to-back ordering experiment, r5); everything it reuses
    # (the shingle cache) is already warm by this point
    "d26_containment",
]


def _rank(name: str):
    if name in _HEAVY_TAIL:
        return (3, format(_HEAVY_TAIL.index(name), "02d"))
    # relational first (sub-second), then streaming twins, then light llm
    return ({"q": 0, "s": 1}.get(name[0], 2), name)


QUERIES: dict = {
    name: _ALL_QUERIES[name] for name in sorted(_ALL_QUERIES, key=_rank)
}
ORACLES: dict = {
    name: _ALL_ORACLES[name] for name in QUERIES if name in _ALL_ORACLES
}

__all__ = ["QUERIES", "ORACLES"]
