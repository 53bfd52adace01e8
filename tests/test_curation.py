"""Unit tests for corpus-curation operators (decontamination, PII,
quality rules, URL dedup) on hand-built frames with known answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from impuls_spark.llm.curation import (
    canonical_url,
    decontaminate,
    pii_scan,
    quality_rules,
    url_dedup,
)


@pytest.fixture(scope="module")
def train(spark):
    rows = [
        # shares the full eval sentence -> many 3-gram overlaps
        (1, "what is the capital of france paris is the capital of france"),
        (2, "totally unrelated text about spark partitions and shuffles here"),
        # shares exactly one 3-gram ("the capital of") -> below threshold
        (3, "discussing the capital of a company balance sheet today"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def eval_df(spark):
    return spark.createDataFrame(
        [(100, "what is the capital of france")], ["doc_id", "text"]
    )


def test_decontaminate_flags_overlapping_doc(train, eval_df):
    out = decontaminate(train, eval_df, min_overlap=3).collect()
    assert {r["doc_id"] for r in out} == {1}
    # eval doc has 4 distinct 3-grams, all present in doc 1
    assert out[0]["n_overlap"] == 4


def test_decontaminate_threshold_excludes_single_hit(train, eval_df):
    out = decontaminate(train, eval_df, min_overlap=1).collect()
    assert {r["doc_id"] for r in out} == {1, 3}


def test_pii_scan_counts_and_redacts(spark):
    df = spark.createDataFrame(
        [
            (1, "reach me at jan.kowalski+x@mail.example.com or +48-601-234-567"),
            (2, "server 192.168.0.17 answered, backup 10.0.0.1 did not"),
            (3, "no pii in this sentence at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) == (1, 1, 0)
    assert (out[2]["n_emails"], out[2]["n_phones"], out[2]["n_ips"]) == (0, 0, 2)
    assert (out[3]["n_emails"], out[3]["n_phones"], out[3]["n_ips"]) == (0, 0, 0)
    assert "[EMAIL]" in out[1]["redacted"] and "[PHONE]" in out[1]["redacted"]
    assert "jan.kowalski" not in out[1]["redacted"]
    assert out[2]["redacted"].count("[IP]") == 2
    assert out[3]["redacted"] == "no pii in this sentence at all"


def test_quality_rules_verdicts(spark):
    good = "the quick brown fox jumps over the lazy dog and then runs far away to the hills " * 2
    loop = "spam " * 60  # one word type repeated -> unique_word_frac ~1/60
    short = "way too short"
    df = spark.createDataFrame(
        [(1, good.strip()), (2, loop.strip()), (3, short)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in quality_rules(df).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False  # fails unique-word floor
    assert out[2]["unique_word_frac"] < 0.1
    assert out[2]["repeated_2gram_frac"] > 0.95
    assert out[3]["keep"] is False  # fails min_words
    assert out[3]["n_words"] == 3


def test_canonical_url_normalization(spark):
    urls = [
        (1, "https://WWW.Example.com/a/b/?utm_source=x&id=7&ref=z#frag"),
        (2, "http://example.com/a/b?id=7"),
        (3, "example.com/a/b/?fbclid=abc&id=7"),
        (4, "https://example.com/a/b?id=8"),
    ]
    df = spark.createDataFrame(urls, ["doc_id", "url"])
    got = {
        r["doc_id"]: r["c"]
        for r in df.select("doc_id", canonical_url("url").alias("c")).collect()
    }
    # 1-3 collapse to the same page; 4 differs by a meaningful param
    assert got[1] == got[2] == got[3] == "example.com/a/b?id=7"
    assert got[4] == "example.com/a/b?id=8"


def test_url_dedup_keeps_lowest_id_and_best_quality(spark):
    df = spark.createDataFrame(
        [
            (5, "https://example.com/p?utm_source=a", 10),
            (2, "http://www.example.com/p", 30),
            (9, "example.com/p/", 20),
            (7, "example.com/q", 5),
        ],
        ["doc_id", "url", "quality"],
    )
    out = {
        r["canonical_url"]: r
        for r in url_dedup(df, quality_col="quality").collect()
    }
    assert out["example.com/p"]["canonical_id"] == 2
    assert out["example.com/p"]["n_dupes"] == 2
    assert out["example.com/p"]["best_quality"] == 30
    assert out["example.com/q"]["n_dupes"] == 0


# -- adversarial edges ------------------------------------------------------

def test_quality_rules_degenerate_docs(spark):
    """Empty / single-word / all-symbol / repeated-word docs hit every
    try_divide + coalesce guard; pin against DuckDB running the oracle
    expressions (with the same zero-denominator guards made explicit)."""
    import duckdb
    import pandas as pd

    rows = [
        (1, ""),                        # n_chars=0: symbol_frac 0/0
        (2, "word"),                    # single word: no 2-grams
        (3, "!!! ### $$$ %%%"),         # all symbols
        (4, "a a a a a a"),             # one type: uniq_frac floor
        (5, " "),                       # lone separator: two empty words
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in quality_rules(
            spark.createDataFrame(pdf), min_words=1
        ).collect()
    }

    con = duckdb.connect()
    con.register("docs", pdf)
    oracle = con.sql("""
      WITH w AS (
        SELECT doc_id, text, string_split(text, ' ') AS words,
               len(text) AS n_chars FROM docs
      ),
      g AS (
        SELECT *, list_transform(range(1, len(words)),
                                 i -> words[i] || ' ' || words[i+1]) AS grams
        FROM w
      )
      SELECT doc_id,
             len(words) AS n_words,
             round((n_chars - (len(words) - 1)) / len(words)::double, 6)
               AS mean_word_len,
             round(len(list_distinct(words)) / len(words)::double, 6)
               AS unique_word_frac,
             CASE WHEN len(grams) = 0 THEN 0.0
                  ELSE round(1.0 - len(list_distinct(grams)) / len(grams)::double, 6)
             END AS repeated_2gram_frac,
             CASE WHEN n_chars = 0 THEN 0.0
                  ELSE round((n_chars - len(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))
                             / n_chars::double, 6)
             END AS symbol_frac
      FROM g ORDER BY doc_id
    """).fetchall()

    for doc_id, n_words, mean_wl, uniq, rep2, sym in oracle:
        got = out[doc_id]
        assert got.n_words == n_words, doc_id
        assert got.mean_word_len == pytest.approx(mean_wl), doc_id
        assert got.unique_word_frac == pytest.approx(uniq), doc_id
        assert got.repeated_2gram_frac == pytest.approx(rep2), doc_id
        assert got.symbol_frac == pytest.approx(sym), doc_id
    # the all-symbol doc fails symbol_frac, the repeated doc fails
    # uniqueness, the empty doc fails mean_word_len
    assert not out[3].keep and not out[4].keep and not out[1].keep


def test_canonical_url_tracking_only_query(spark):
    """A URL whose query is ONLY tracking params must collapse to the
    bare path — empty query string, no dangling '?' or '&'."""
    cases = [
        ("https://WWW.Example.com/page/?utm_source=a&fbclid=b#frag",
         "example.com/page"),
        ("http://example.com/?utm_campaign=x", "example.com"),
        ("https://example.com/a?b=1&utm_medium=m&a=2", "example.com/a?a=2&b=1"),
        ("example.com/plain", "example.com/plain"),
        ("https://example.com/", "example.com"),
    ]
    df = spark.createDataFrame(cases, ["url", "expected"])
    bad = df.select(canonical_url("url").alias("got"), "expected").filter(
        F.col("got") != F.col("expected")
    )
    assert bad.count() == 0, bad.collect()


def test_url_dedup_all_tracking_variants_collapse(spark):
    """Many captures of one page differing only in tracking params and
    fragment -> a single group keeping min id / best quality."""
    rows = [
        (10, "https://www.example.com/p?utm_source=a", 5),
        (11, "https://example.com/p?utm_source=b#x", 9),
        (12, "HTTP://EXAMPLE.COM/p", 7),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "q"])
    out = url_dedup(df, quality_col="q").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.canonical_url, r.canonical_id, r.n_dupes, r.best_quality) == (
        "example.com/p", 10, 2, 9)


def test_decontaminate_zero_overlap(train, spark):
    """An eval set sharing no n-gram with the corpus flags nothing; an
    empty eval set likewise (the broadcast set is empty, not an error)."""
    clean_eval = spark.createDataFrame(
        [(200, "zebra quokka wombat axolotl capybara lemur")],
        ["doc_id", "text"],
    )
    assert decontaminate(train, clean_eval, min_overlap=1).count() == 0

    empty_eval = spark.createDataFrame([], "doc_id long, text string")
    assert decontaminate(train, empty_eval, min_overlap=1).count() == 0


# -- encoding quality (d40) -------------------------------------------------

def test_encoding_quality_hand_computed(spark):
    from impuls_spark.llm import encoding_quality

    rows = [
        (1, "perfectly clean ascii text"),
        (2, "lossy \ufffd decode \ufffd here"),          # 2 replacement
        (3, "caf\u00c3\u00a9 and \u00e2\u20ac\u0153quoted\u00e2\u20ac\u009d"),  # 3 mojibake
        (4, "ctl\x01\x02chars"),                         # 2 control
        (5, "tab\tand\nnewline are fine"),               # NOT control hits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in encoding_quality(df).collect()}
    assert (out[1]["n_replacement"], out[1]["n_control"],
            out[1]["n_mojibake"], out[1]["enc_score"]) == (0, 0, 0, 1.0)
    assert out[2]["n_replacement"] == 2
    assert out[3]["n_mojibake"] == 3
    assert out[4]["n_control"] == 2
    assert out[5]["n_control"] == 0 and out[5]["enc_score"] == 1.0
    assert out[2]["enc_score"] < 1.0 and out[4]["enc_score"] < 1.0


# -- corpus snapshot diff (d44) ---------------------------------------------

def test_snapshot_diff_all_four_statuses(spark):
    from impuls_spark.llm import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_segment_dedup_keep_first(spark):
    """Dolma-style keep-first: a repeated block survives only at its
    corpus-minimal (doc_id, block_ix); in-doc repeats are cut too;
    unique blocks are untouched."""
    import hashlib

    from impuls_spark.llm import segment_dedup_keep_first

    a = "w1 w2 w3 w4 u1 u2 u3 u4"              # blocks: B, U
    b = "w1 w2 w3 w4 v1 v2 v3 v4"              # repeats B -> cut
    c = "x1 x2 x3 x4 x1 x2 x3 x4"              # in-doc repeat of X
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           segment_dedup_keep_first(df, block_words=4).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert (out[1]["n_blocks"], out[1]["n_removed"]) == (2, 0)
    assert out[1]["clean_hash"] == md5(a)
    assert (out[2]["n_blocks"], out[2]["n_removed"]) == (2, 1)
    assert out[2]["clean_hash"] == md5("v1 v2 v3 v4")
    assert (out[3]["n_blocks"], out[3]["n_removed"]) == (2, 1)
    assert out[3]["clean_hash"] == md5("x1 x2 x3 x4")


def test_block_dedup_keeps_null_and_empty_docs(spark):
    """r8 review: NULL-text / empty documents must appear in the
    per-document report as (0, 0, md5('')) instead of silently
    vanishing through the posexplode — for both block-dedup flavors."""
    import hashlib

    from impuls_spark.llm import block_dedup, segment_dedup_keep_first

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    empty_hash = hashlib.md5(b"").hexdigest()
    for fn in (
        lambda d: block_dedup(d, block_words=4, max_df=0),
        lambda d: segment_dedup_keep_first(d, block_words=4),
    ):
        out = {r["doc_id"]: r for r in fn(df).collect()}
        assert set(out) == {1, 2, 3}, fn
        assert (out[2]["n_blocks"], out[2]["n_removed"]) == (0, 0)
        assert out[2]["clean_hash"] == empty_hash
        # "" splits to one empty word -> one (deduplicable) block
        assert out[3]["n_blocks"] == 1
