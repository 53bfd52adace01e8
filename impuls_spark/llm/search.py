"""Full-text relevance ranking: BM25 scoring of a term query against a
document corpus.

Spark-first shape, chosen for determinism as much as speed:

- query terms are plan-time constants, so per-document term frequencies
  are ``size(filter(words, w -> w = t))`` column expressions — the text
  column is scanned once, map-side, no explode and no per-token
  shuffle;
- corpus statistics (N, avgdl, per-term document frequencies) are ONE
  conditional aggregate producing a single row, cross-joined back by
  broadcast — no ``.collect()``, the whole thing stays one lazy plan;
- the final score is a sum of per-term contributions written in FIXED
  term order. A ``groupBy().sum()`` over exploded tokens would add
  floats in nondeterministic partition order; an expression tree adds
  them identically on every engine, which is what lets a DuckDB oracle
  reproduce the hash bit-for-bit.

At 100 TB: one scan + one single-row aggregate + a broadcast join +
TakeOrdered(k) — no full sort, no wide shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_rank(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` documents for ``query_terms`` under BM25
    (Robertson/Sparck Jones; Lucene idf variant
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``).

    Returns (id, score) ordered by (score desc, id) — the id tiebreak
    makes the cut deterministic. Scores are rounded to 6 dp so engine
    float-formatting quirks can't flip the comparison hash.
    """
    if not query_terms:
        raise ValueError("bm25_rank needs at least one query term")
    terms = list(dict.fromkeys(query_terms))  # dedup, keep order

    words = F.split(F.col(text_col), " ")
    dl = F.size(words)

    # NB: the lambda must take exactly ONE parameter. PySpark dispatches
    # higher-order-function lambdas by arity, so a two-parameter callable
    # (e.g. a `t=t` default-arg capture) is treated as (element, index)
    # and the term binding is silently replaced by the BIGINT array index.
    def _tf(term: str):
        return F.size(F.filter(words, lambda w: w == F.lit(term)))

    tf = {t: _tf(t) for t in terms}

    # one-row corpus stats: N, avgdl, df per term
    stats = df.agg(
        F.count("*").alias("__n"),
        F.avg(dl).alias("__avgdl"),
        *[
            F.sum(F.when(tf[t] > 0, 1).otherwise(0)).alias(f"__df_{i}")
            for i, t in enumerate(terms)
        ],
    )

    scored = df.select(F.col(id_col), dl.alias("__dl"), *[
        tf[t].alias(f"__tf_{i}") for i, t in enumerate(terms)
    ]).crossJoin(F.broadcast(stats))

    n, avgdl = F.col("__n"), F.col("__avgdl")
    norm = 1 - b + b * F.col("__dl") / avgdl
    contribs = []
    for i in range(len(terms)):
        tf_i = F.col(f"__tf_{i}")
        idf = F.log(
            F.lit(1.0) + (n - F.col(f"__df_{i}") + 0.5) / (F.col(f"__df_{i}") + 0.5)
        )
        contribs.append(idf * tf_i * (k1 + 1) / (tf_i + k1 * norm))
    score = contribs[0]
    for c in contribs[1:]:  # fixed left-to-right order — see module doc
        score = score + c
    return (
        scored.select(F.col(id_col), F.round(score, 6).alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), id_col)
        .limit(top_k)
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """(token, doc_freq, total_tf, postings) — the posting-list build
    behind any full-text search/retrieval layer: for every token, how
    many documents contain it, its corpus-wide term count, and the
    sorted comma-joined document-id list.

    ``min_df`` drops hapax noise; ``max_df`` drops stop-tokens — the
    cap that bounds the longest posting list, because at web scale the
    list for "the" IS the corpus and belongs in no index (BM25 gives
    such terms ~zero idf anyway). With the cap the per-token state is
    bounded by ``max_df`` ids.

    Plan shape: tokenize in the scan stage (split + explode, no Python),
    one (token, id) hash aggregate for tf (map-side combined — repeated
    words collapse before the shuffle), one token-keyed aggregate for
    the index row. The postings string is built from ``collect_list``
    sorted per group; its memory is the group's own doc_freq, which
    ``max_df`` bounds. Nothing is collected to the driver and no global
    sort exists.
    """
    per = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(F.split(F.col(text_col), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("token", "__id")
        .agg(F.count("*").alias("__tf"))
    )
    idx = per.groupBy("token").agg(
        F.count("*").alias("doc_freq"),
        F.sum("__tf").alias("total_tf"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("__id")),
                lambda i: i.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )
    if min_df > 1:
        idx = idx.filter(F.col("doc_freq") >= min_df)
    if max_df is not None:
        idx = idx.filter(F.col("doc_freq") <= max_df)
    return idx
