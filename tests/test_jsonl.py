"""JSONL source/sink: schema-first read, corrupt-line quarantine,
compression, shard targeting (impuls_spark/sources/jsonl.py)."""

from __future__ import annotations

import glob
import gzip
import json

from pyspark.sql import types as T

from impuls_spark.sources import read_jsonl, write_jsonl

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def test_roundtrip_gzip_shards(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    out = str(tmp_path / "corpus")
    write_jsonl(df, out, compression="gzip", target_shards=3)
    shards = glob.glob(out + "/part-*.json.gz")
    assert len(shards) == 3
    # shards are real gzip JSONL
    with gzip.open(shards[0], "rt") as fh:
        json.loads(next(fh))

    good, quar = read_jsonl(spark, out, SCHEMA)
    assert good.count() == 100
    assert quar.count() == 0
    assert sorted(r["doc_id"] for r in good.collect()) == list(range(100))


def test_quarantine_catches_corrupt_lines(spark, tmp_path):
    out = tmp_path / "corpus"
    out.mkdir()
    (out / "a.json").write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "not json at all\n"
        '{"doc_id": 2, "text": "also ok"}\n'
        '{"doc_id": "type-mismatch", "text": "bad id"}\n'
        "\n"  # blank lines are skipped, not quarantined
        '{"truncated": \n'
    )
    good, quar = read_jsonl(spark, str(out), SCHEMA)
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    lines = sorted(r["line"] for r in quar.collect())
    assert len(lines) == 3
    assert "not json at all" in lines


def test_good_path_aggregates_survive_pruning(spark, tmp_path):
    """count()/agg() prune every data column — the SPARK-21610 trap the
    text+from_json design exists to avoid."""
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    out = str(tmp_path / "corpus")
    write_jsonl(df, out, compression=None)
    good, quar = read_jsonl(spark, out, SCHEMA)
    assert good.count() == 1  # raises IllegalArgumentException pre-fix
    assert quar.count() == 0


def test_missing_fields_are_null_not_corrupt(spark, tmp_path):
    """JSONL rows legitimately omit optional fields; a missing key is
    NULL (matching the GTFS empty-cell convention), never quarantine."""
    out = tmp_path / "corpus"
    out.mkdir()
    (out / "a.json").write_text('{"doc_id": 5}\n')
    good, quar = read_jsonl(spark, str(out), SCHEMA)
    row = good.collect()[0]
    assert (row["doc_id"], row["text"]) == (5, None)
    assert quar.count() == 0
