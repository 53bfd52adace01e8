"""BPE tokenizer training and application at corpus scale.

The scale split follows how production tokenizers are actually trained
(SentencePiece/GPT-2 BPE): the corpus-sized work — reducing N tokens of
text to a word-frequency table — is distributed; the merge-loop itself
runs driver-side over that (vocabulary-sized, explicitly capped) table,
because 50k sequential merge decisions over a dict that fits in memory
is not a distributed problem; and applying the learned merges back to
the corpus is distributed again as an Arrow-batched ``mapInPandas``.
One shuffle to train (the word count), zero shuffles to encode.

:func:`impuls_spark.llm.text.bpe_pair_counts` is the fully-distributed
single-iteration twin (oracle-gated as d46) — use it to score merge
candidates without collecting anything; this module is the loop.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: end-of-word sentinel appended to every word before merging, so a
#: subword at a word end is a different symbol than mid-word (the GPT-2
#: convention, expressed suffix-side). A printable char outside the
#: corpus alphabet keeps everything debuggable.
EOW = "▁"


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    max_word_forms: int | None = 1_000_000,
) -> DataFrame:
    """(word, freq) — the distributed half of tokenizer training: the
    corpus collapses to its vocabulary in one map-side-combined hash
    aggregate. ``max_word_forms`` caps what the driver will be asked to
    hold via TakeOrdered (freq desc, word asc — total order): dropping
    the frequency tail barely moves merge decisions (classic Zipf
    argument) but bounds driver memory by contract, not by luck."""
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    freq = words.groupBy("word").agg(F.count("*").alias("freq"))
    if max_word_forms is not None:
        freq = freq.orderBy(F.desc("freq"), "word").limit(max_word_forms)
    return freq


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_word_forms: int | None = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a corpus; returns the ordered
    merge list (the whole trained model — apply with
    :func:`bpe_encode`).

    Ties are broken deterministically (highest count, then
    lexicographically smallest pair), so the same corpus always yields
    the same tokenizer on any engine or cluster size.
    """
    vocab = {
        r["word"]: r["freq"]
        for r in word_frequencies(df, text_col, max_word_forms).collect()
    }
    return train_from_frequencies(vocab, n_merges)


def train_from_frequencies(
    vocab: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """The driver-side merge loop over a collected word-frequency table
    (pure Python — property-tested directly). O(n_merges ×
    affected-words) via a pair→words index: only words containing the
    merged pair are revisited per iteration."""
    # symbol sequences per word form (EOW-terminated), plus pair stats
    seqs: dict[str, list[str]] = {
        w: [*w, EOW] for w in vocab
    }
    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[str]] = {}
    for w, syms in seqs.items():
        f = vocab[w]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            pair_words.setdefault((a, b), set()).add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        for w in list(pair_words.get(best, ())):
            f = vocab[w]
            old = seqs[w]
            # retract this word's pair contributions, rewrite, re-add
            for a, b in zip(old, old[1:]):
                pair_counts[(a, b)] -= f
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(w)
                    if not ws:
                        del pair_words[(a, b)]
            new: list[str] = []
            i = 0
            while i < len(old):
                if i + 1 < len(old) and (old[i], old[i + 1]) == best:
                    new.append(merged)
                    i += 2
                else:
                    new.append(old[i])
                    i += 1
            seqs[w] = new
            for a, b in zip(new, new[1:]):
                pair_counts[(a, b)] += f
                pair_words.setdefault((a, b), set()).add(w)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = [*word, EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """(id, bpe_tokens, n_bpe_tokens) — apply a trained merge list to a
    corpus. Arrow-batched ``mapInPandas`` with a per-batch encoded-word
    memo (Zipf again: a batch of documents re-encodes the same frequent
    words constantly, so the memo turns per-token work into per-distinct
    -word work). The merge list rides the closure — a trained tokenizer
    is a few hundred KB, broadcast once per executor, never joined.
    Zero shuffles: encode is a pure scan-stage map at any corpus size.
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    schema = f"{id_col} long, {out_col} array<string>, n_bpe_tokens int"

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            out_tokens = []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        memo[w] = enc
                    toks.extend(enc)
                out_tokens.append(toks)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: out_tokens,
                    "n_bpe_tokens": [len(t) for t in out_tokens],
                }
            )

    return df.select(id_col, text_col).mapInPandas(encode, schema)
