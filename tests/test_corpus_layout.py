"""Hive-partitioned corpus layout: pruning, file counts, within-file
order (impuls_spark/sources/corpus.py)."""

from __future__ import annotations

import contextlib
import glob
import io

from pyspark.sql import functions as F

from impuls_spark.sources import read_corpus, write_corpus


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(spark):
    rows = [(i, f"doc number {i}", ["en", "de", "fr"][i % 3]) for i in range(90)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_roundtrip_and_partition_dirs(spark, tmp_path):
    out = str(tmp_path / "corpus")
    write_corpus(_docs(spark), out, partition_by=["lang"])
    assert sorted(
        p.rsplit("=", 1)[1] for p in glob.glob(out + "/lang=*")
    ) == ["de", "en", "fr"]
    # one shard per partition by default
    for d in glob.glob(out + "/lang=*"):
        assert len(glob.glob(d + "/*.parquet")) == 1
    back = read_corpus(spark, out)
    assert back.count() == 90
    assert set(back.columns) == {"doc_id", "text", "lang"}


def test_partition_pruning_reaches_the_scan(spark, tmp_path):
    out = str(tmp_path / "corpus")
    write_corpus(_docs(spark), out, partition_by=["lang"])
    df = read_corpus(spark, out, lang="en")
    assert df.count() == 30
    plan = _plan_of(df)
    assert "PartitionFilters" in plan and "lang" in plan
    # the equality filter must be in PartitionFilters, not a post-scan
    # Filter over all partitions
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("en" in ln for ln in pf), plan


def test_target_shards_bounds_files(spark, tmp_path):
    out = str(tmp_path / "corpus")
    write_corpus(_docs(spark), out, partition_by=["lang"], target_shards=3)
    for d in glob.glob(out + "/lang=*"):
        assert 1 <= len(glob.glob(d + "/*.parquet")) <= 3


def test_sort_within_files(spark, tmp_path):
    out = str(tmp_path / "corpus")
    write_corpus(_docs(spark), out, partition_by=["lang"], sort_by=["doc_id"])
    shard = glob.glob(out + "/lang=en/*.parquet")[0]
    ids = [r["doc_id"] for r in spark.read.parquet(shard).collect()]
    assert ids == sorted(ids)


def test_sort_survives_multi_shard_writer(spark, tmp_path):
    """Regression: with target_shards > 1, shard groups hash-colliding
    into one task must still produce a single sorted run per file (the
    dynamic-partition writer re-sorts by partition columns UNSTABLY, so
    the incoming order has to lead with them and exclude the salt)."""
    out = str(tmp_path / "corpus")
    rows = [(i, f"doc {i}", ["en", "de"][i % 2]) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    write_corpus(df, out, partition_by=["lang"], sort_by=["doc_id"],
                 target_shards=4)
    for shard in glob.glob(out + "/lang=*/*.parquet"):
        ids = [r["doc_id"] for r in spark.read.parquet(shard).collect()]
        assert ids == sorted(ids), shard


# ---------------------------------------------------------------------------
# Deterministic training shards (write_training_shards / shard_manifest)
# ---------------------------------------------------------------------------


def test_training_shards_roundtrip_and_manifest(spark, tmp_path):
    from impuls_spark.llm.sampling import shard_manifest
    from impuls_spark.sources.corpus import (
        read_training_shards,
        write_training_shards,
    )

    df = _docs(spark)
    out = str(tmp_path / "shards")
    write_training_shards(df, out, n_shards=16)
    back = read_training_shards(spark, out)
    assert back.count() == 90
    # written partition counts agree with the manifest's bookkeeping
    man = {r["shard"]: r["n_docs"]
           for r in shard_manifest(df, n_shards=16).collect()}
    got = {r["shard"]: r["count"]
           for r in back.groupBy("shard").count().collect()}
    assert got == man
    # pruning a single shard reaches the scan as a partition filter
    one = read_training_shards(spark, out, shard=sorted(man)[0])
    assert "PartitionFilters: [isnotnull(shard" in _plan_of(one)


def test_training_shards_files_are_sorted_runs(spark, tmp_path):
    from impuls_spark.sources.corpus import write_training_shards

    rows = [(i, f"doc {i}") for i in range(800)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "shards")
    write_training_shards(df, out, n_shards=16, files_per_shard=3)
    for f in glob.glob(out + "/shard=*/*.parquet"):
        keys = [r["shuffle_key"] for r in spark.read.parquet(f).collect()]
        assert keys == sorted(keys), f


def test_training_shards_append_interleaves(spark, tmp_path):
    """An appended batch lands by the same hash law — same shard
    membership as writing everything at once."""
    from impuls_spark.sources.corpus import (
        read_training_shards,
        write_training_shards,
    )

    rows = [(i, f"doc {i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out1 = str(tmp_path / "once")
    write_training_shards(df, out1, n_shards=16)
    out2 = str(tmp_path / "twice")
    write_training_shards(df.filter(F.col("doc_id") < 100), out2, n_shards=16)
    write_training_shards(
        df.filter(F.col("doc_id") >= 100), out2, n_shards=16, mode="append"
    )
    a = {(r["doc_id"], r["shard"])
         for r in read_training_shards(spark, out1).collect()}
    b = {(r["doc_id"], r["shard"])
         for r in read_training_shards(spark, out2).collect()}
    assert a == b
