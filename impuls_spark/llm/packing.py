"""Sequence packing: assign documents to fixed-token-budget training
sequences.

Pre-training dataloaders concatenate documents into fixed-length
sequences; doing the assignment in the engine (instead of the loader)
makes shards reproducible and lets the writer emit one file per packed
bin. This implements **contiguous packing** — documents are laid out in
a deterministic order and chopped into bins at the token budget — the
large-scale variant of greedy bin packing (used in practice because a
true first-fit is inherently sequential; contiguous packing is
order-stable, embarrassingly parallel across shards, and loses only the
tail of each bin).

Plan shape: one window cumsum per shard. The shard column bounds the
window partition, so at 100 TB each shard's ordering is independent —
no global sort, no single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs_with_tokens: DataFrame,
    token_budget: int = 2048,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(id, shard, bin_ix, offset, n_tokens) — contiguous packing of
    documents into ``token_budget``-sized bins per shard.

    Documents are ordered by ``id_col`` within each shard (stable and
    engine-independent); ``bin_ix`` is which packed sequence the
    document starts in, ``offset`` its starting token position within
    that bin. A document longer than the budget still gets a bin (it
    will be truncated/split by the loader — flagged via
    ``overflow``)."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    start = (cum - F.col(tokens_col)).cast("long")
    return docs_with_tokens.select(
        F.col(id_col),
        F.col(shard_col).alias("shard"),
        F.floor(start / F.lit(token_budget)).cast("long").alias("bin_ix"),
        (start % F.lit(token_budget)).cast("long").alias("offset"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        (
            (start % F.lit(token_budget)) + F.col(tokens_col)
            > F.lit(token_budget)
        ).alias("overflow"),
    )
