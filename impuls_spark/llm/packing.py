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


def chunk_token_stream(
    docs_with_tokens: DataFrame,
    seq_len: int = 2048,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(shard, seq_ix, n_tokens, text) — materialize the GPT-style
    training stream: per shard, concatenate documents in deterministic
    ``id_col`` order and re-cut the token stream into fixed
    ``seq_len``-token rows, crossing document boundaries (every row
    except each shard's last is exactly ``seq_len`` tokens).

    :func:`pack_sequences` assigns documents to bins without splitting
    them; this operator is the other standard layout — the one actual
    causal-LM pre-training uses, where a sequence may begin mid-document
    and attention masks/EOS tokens handle the seams downstream.

    Plan shape: one per-shard window cumsum over DOCUMENT counts (rows =
    documents) computes each document's global token offset; then
    posexplode gives every token its global position, and the row id is
    pure arithmetic (``pos // seq_len``) — no second window, no global
    sort. The reassembly groupBy carries one row per token, the honest
    cost of materializing training rows; it shuffles on (shard, seq_ix),
    which is uniform by construction (every key holds exactly seq_len
    tokens), so no skew is possible regardless of document-length skew.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.size(F.col(tokens_col))
    # the offset window MUST be its own projection: a window expression
    # sharing a select with a generator is evaluated AFTER the explode
    # (the analyzer extracts the generator first), which would re-run
    # the cumsum over token rows instead of document rows
    with_start = docs_with_tokens.select(
        F.col(shard_col).alias("shard"),
        F.col(tokens_col).alias("__toks"),
        (F.sum(n).over(w) - n).cast("long").alias("__start"),
    )
    positioned = with_start.select(
        "shard",
        "__start",
        F.posexplode(F.col("__toks")).alias("__pos", "__tok"),
    ).select(
        "shard",
        "__tok",
        (F.col("__start") + F.col("__pos")).alias("__gpos"),
    )
    return (
        positioned.groupBy(
            "shard",
            F.floor(F.col("__gpos") / F.lit(seq_len)).cast("long").alias("seq_ix"),
        )
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__gpos", "__tok"))
                    ),
                    lambda s: s["__tok"],
                ),
                " ",
            ).alias("text"),
        )
    )
