"""Round-12 takedown hardening: the multi-level partition-delete walk,
the streaming-layout guard on remove_from_corpus, partition-key
separator escaping, and fence-under-marker ordering
(impuls_spark/streaming/compact.py, sources/corpus.py,
llm/similarity.py)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from impuls_spark.sources.corpus import read_corpus, remove_from_corpus, write_corpus
from impuls_spark.streaming.compact import (
    _delete_leaf_partitions,
    _HadoopFS,
    compact_marker_path,
    hive_partition_key,
    split_partition_key,
)


def _mkleaf(root, *parts):
    d = os.path.join(root, *parts)
    os.makedirs(d)
    with open(os.path.join(d, "part-0.parquet"), "w") as f:
        f.write("x")
    return d


def test_delete_leaf_keeps_surviving_sibling_under_victim_prefix(
    spark, tmp_path
):
    """The ADVICE r11 data-loss shape: >=3 partition levels, a victim
    leaf sharing an ancestor with a surviving sibling — the ancestor
    must NOT be deleted (the inverted walk condition deleted all of
    a=x including the survivor)."""
    root = str(tmp_path / "t")
    _mkleaf(root, "a=x", "b=y", "c=z1")
    keep = _mkleaf(root, "a=x", "b=y", "c=z2")
    fs = _HadoopFS(spark, root)
    deleted = _delete_leaf_partitions(
        fs, root, ["a", "b", "c"], {("x", "y", "z1")}
    )
    assert deleted == 1
    assert os.path.exists(keep)
    assert not os.path.exists(os.path.join(root, "a=x", "b=y", "c=z1"))


def test_delete_leaf_folds_up_emptied_parents(spark, tmp_path):
    """A victim subtree with no survivors folds up: no empty a=/b=
    shells left for _epoch_dirs-style listings to trip over."""
    root = str(tmp_path / "t")
    _mkleaf(root, "a=w", "b=v", "c=u")
    keep = _mkleaf(root, "a=x", "b=y", "c=z")
    fs = _HadoopFS(spark, root)
    deleted = _delete_leaf_partitions(
        fs, root, ["a", "b", "c"], {("w", "v", "u")}
    )
    assert deleted == 1
    assert not os.path.exists(os.path.join(root, "a=w"))
    assert os.path.exists(keep)
    assert os.path.exists(root)  # depth-0 root never folds


def test_delete_leaf_mixed_parent_survives_and_prunes(spark, tmp_path):
    """Victim and survivor under the same parent: leaf goes, parent
    stays; an unrelated subtree is never listed (walk prunes on the
    victim prefix) and stays intact."""
    root = str(tmp_path / "t")
    _mkleaf(root, "a=x", "b=y", "c=z1")
    _mkleaf(root, "a=x", "b=q", "c=r")
    other = _mkleaf(root, "a=o", "b=o", "c=o")
    fs = _HadoopFS(spark, root)
    deleted = _delete_leaf_partitions(
        fs, root, ["a", "b", "c"], {("x", "y", "z1")}
    )
    assert deleted == 1
    # b=y emptied -> folds; b=q sibling keeps a=x alive
    assert not os.path.exists(os.path.join(root, "a=x", "b=y"))
    assert os.path.exists(os.path.join(root, "a=x", "b=q", "c=r"))
    assert os.path.exists(other)


def _epoch_corpus(spark, path):
    rows = [(i, f"doc {i}", ["en", "de"][i % 2], i % 3) for i in range(30)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, __epoch int"
    )
    df.write.partitionBy("__epoch", "lang").parquet(path)


def test_remove_from_corpus_refuses_streaming_epoch_layout(spark, tmp_path):
    """VERDICT r11 #1 repro: an __epoch-partitioned streaming corpus
    must RAISE (pointing at takedown_stream_corpus), leave the layout
    byte-untouched, and leave no marker behind — not report success
    while writing a conflicting batch layout beside the epoch dirs."""
    path = str(tmp_path / "corpus")
    _epoch_corpus(spark, path)
    before = sorted(glob.glob(path + "/**", recursive=True))
    with pytest.raises(ValueError, match="takedown_stream_corpus"):
        remove_from_corpus(spark, path, [1, 2, 3])
    assert sorted(glob.glob(path + "/**", recursive=True)) == before
    assert not os.path.exists(compact_marker_path(path))
    # the removed ids are still there — nothing pretended to succeed
    assert (
        spark.read.parquet(path).filter(F.col("doc_id").isin(1, 2, 3)).count()
        == 3
    )


def test_remove_from_corpus_three_level_partitioning(spark, tmp_path):
    """End-to-end through the fixed walk: 3 partition levels, one
    combo fully emptied while a sibling combo under the same ancestor
    survives."""
    path = str(tmp_path / "corpus")
    rows = [
        (i, f"doc {i}", "en", "web", "a" if i < 5 else "b")
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, src string, grp string"
    )
    write_corpus(df, path, partition_by=["lang", "src", "grp"])
    stats = remove_from_corpus(
        spark, path, list(range(5)),
        partition_by=("lang", "src", "grp"),
    )
    assert stats["partitions_deleted"] == 1
    back = read_corpus(spark, path)
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(5, 10))
    assert not os.path.exists(path + "/lang=en/src=web/grp=a")
    assert os.path.exists(path + "/lang=en/src=web/grp=b")


def test_partition_key_roundtrip_with_separator_in_value(spark):
    """hive_partition_key escapes the separator (and the escape char)
    inside values, so split_partition_key recovers the exact raw
    strings — no arity shift, no combo collision."""
    evil = ["a\x1fb", "\x1f", "\x1e1", "\x1e0\x1f", "plain", None]
    df = spark.createDataFrame(
        [(v, "x") for v in evil], "p string, q string"
    )
    got = [
        split_partition_key(r["k"], ["p", "q"])
        for r in df.select(
            hive_partition_key(["p", "q"]).alias("k")
        ).collect()
    ]
    want = [
        (v if v is not None else "__HIVE_DEFAULT_PARTITION__", "x")
        for v in evil
    ]
    assert sorted(got, key=str) == sorted(want, key=str)
    # distinct combos stay distinct through the key ("a\x1fb","x") vs
    # ("a","b\x1fx")-style collisions are impossible
    df2 = spark.createDataFrame(
        [("a\x1fb", "x"), ("a", "b\x1fx")], "p string, q string"
    )
    keys = {
        r["k"] for r in df2.select(
            hive_partition_key(["p", "q"]).alias("k")
        ).collect()
    }
    assert len(keys) == 2


def test_split_partition_key_wrong_arity_fails_fast():
    with pytest.raises(ValueError, match="splits to"):
        split_partition_key("only-one-field", ["p", "q"])


def test_takedown_deletes_partition_with_separator_in_value(spark, tmp_path):
    """A partition VALUE containing the key separator: the emptied
    directory is still matched and deleted (pre-fix the wrong-arity
    split never matched, so stale removed rows kept serving)."""
    path = str(tmp_path / "corpus")
    rows = [(i, f"doc {i}", "en\x1fus" if i < 3 else "de") for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    write_corpus(df, path, partition_by=["lang"])
    stats = remove_from_corpus(spark, path, [0, 1, 2])
    assert stats["partitions_affected"] == 1
    assert stats["partitions_deleted"] == 1
    back = read_corpus(spark, path)
    assert back.count() == 6
    assert back.filter(F.col("lang") != "de").count() == 0
