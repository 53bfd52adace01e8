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
