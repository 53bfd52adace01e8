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
the registered query set.

Two orderings, two consumers:

* ``QUERIES`` (and therefore ``__spark_entry__.queries()``) is in
  **correctness-priority** order.  The driver records exactly the first
  50 registered queries per round (observed r4/r5), so registration
  order decides which queries get a driver-recorded correctness row.
  Since r6 the order is *derived automatically* from the committed
  ``CORRECTNESS_r*.json`` files (see :mod:`.ledger`): never-recorded
  queries first, then ascending last-recorded round (stalest first),
  ties broken cheapest-first so a wall-clock-budgeted harness cuts the
  least.  This bounds staleness: with 87 queries and a 50-row cap, no
  query's driver row ever ages more than 2 rounds.

* ``BENCH_ORDER`` is the **performance-tuned** order used by
  ``bench.py``: cheap relational first, the shared-cache-warming and
  memory-heavy dedup suite last (d10/d18 warm the shingle cache that
  d02/d26/d03 — and through d03, d14/d29 — reuse; d26 runs last because
  its intersection stages leave enough executor-memory pressure that
  d03/d14 measured 30–40% slower right after it in a back-to-back
  ordering experiment, r5).
"""

from .relational import RELATIONAL_QUERIES, RELATIONAL_ORACLES
from .llm import (
    LLM_QUERIES,
    LLM_ORACLES,
    SHARED_BUILD_GROUPS,
    SHARED_BUILDS,
)
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
#: — benched LAST, in this order (see module docstring).
_HEAVY_TAIL = [
    "d32_repetition",
    "d33_ngram_novelty",
    "d37_kmeans",
    "d56_semantic_dedup",  # r13: cells/assignment family contiguous
    # with its freshly prebuilt |D|xk routing (SHARED_BUILD_GROUPS
    # "ivf_cells"), same treatment the pair-graph family got in r10 —
    # out in the alphabetical block d56 rotated 3.2-8.3 s with in-suite
    # memory pressure rebuilding the assignment inside the query
    "d57_semdedup_centroid_far",
    "d41_duplicate_spans",
    "d42_pq_codes",
    "d43_ivfpq_topk",
    "d55_ivfpq_refined",  # reuses the PQ model d42/d43 built
    "d49_fixed_len_chunks",
    "d10_fingerprints",
    "d18_decontaminate",
    "d02_ngram_jaccard",
    "d03_minhash_lsh",
    "d14_dup_clusters",
    "d59_edit_linkage",  # r10: pair-graph family — keep it with the
    # freshly (re)built pairs; out in group 2 it paid a 52 s rebuild
    # when the sf1 suite's memory pressure evicted the prebuilt cache
    "d60_keep_best_cluster",  # r10: same family (clusters over pairs)
    "d29_split_contamination",
    "d35_incremental_dedup",
    "d04_simhash_neardup",
    "d24_bigram_lm",
    "d26_containment",
]


def _bench_rank(name: str):
    if name in _HEAVY_TAIL:
        return (3, format(_HEAVY_TAIL.index(name), "02d"))
    # relational first (sub-second), then streaming twins, then light llm
    return ({"q": 0, "s": 1}.get(name[0], 2), name)


from .ledger import load_hash_snapshot, load_ledger, query_fingerprint

#: query -> last round with a driver correctness row (absent = never).
LEDGER: dict = load_ledger()
#: query -> CURRENT source fingerprint (callable + oracle + one level of
#: named impuls_spark callees; see ledger.query_fingerprint).
FINGERPRINTS: dict = {
    n: query_fingerprint(f, _ALL_ORACLES.get(n))
    for n, f in _ALL_QUERIES.items()
}
_SNAPSHOT: dict = load_hash_snapshot()
#: queries whose source changed since their last driver row (VERDICT r6
#: item 2) — they outrank round-staleness so an edited query always
#: lands in the next 50-slot driver window.  Never-recorded queries have
#: no snapshot entry and land here too.
MODIFIED: set = {
    n for n in _ALL_QUERIES if _SNAPSHOT.get(n) != FINGERPRINTS[n]
}

def registration_order(ledger: dict, modified: set) -> list:
    """Registration order for a given ledger/modified-set: modified (or
    never-fingerprinted) first, then ascending last-recorded round,
    ties cheapest-first."""
    return sorted(
        _ALL_QUERIES,
        key=lambda n: (n not in modified, ledger.get(n, 0), _bench_rank(n)),
    )


_order = registration_order(LEDGER, MODIFIED)

QUERIES: dict = {name: _ALL_QUERIES[name] for name in _order}
ORACLES: dict = {
    name: _ALL_ORACLES[name] for name in QUERIES if name in _ALL_ORACLES
}
#: bench.py iterates in this order (perf-tuned, cache-warm-aware)
BENCH_ORDER: list = sorted(_ALL_QUERIES, key=_bench_rank)

__all__ = [
    "QUERIES", "ORACLES", "BENCH_ORDER", "SHARED_BUILDS",
    "SHARED_BUILD_GROUPS", "LEDGER", "FINGERPRINTS", "MODIFIED",
]
