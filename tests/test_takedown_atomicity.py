"""Round-13 takedown atomicity (VERDICT r12 items 3/4, ADVICE r12):
one root lease spans takedown_stream_vectors' absorb -> purge chain
(sub-steps borrow it via _lease threading), and both streaming
takedowns re-verify the landed sidecar/epoch state UNDER the
still-held marker before reporting success — a batch that was
mid-write when the takedown started can never make it report success
while re-ingested copies of removed rows survive."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from impuls_spark.llm.similarity import AnnIndex
from impuls_spark.streaming import stream_epochs, takedown_stream_vectors
from impuls_spark.streaming.compact import (
    _acquire_compact_marker,
    _HadoopFS,
    compact_marker_path,
)

from .test_ann_streaming import _build_saved, _emb, _run_ingest


def _streamed_index(spark, tmp_path):
    path, day0, anchors = _build_saved(spark, tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _emb(spark, 20, 25).write.parquet(str(src / "b1"))
    _emb(spark, 25, 30).write.parquet(str(src / "b2"))
    _run_ingest(spark, src, path, ckpt)
    assert stream_epochs(spark, path) == [0, 1]
    return path, day0, anchors, ckpt


def test_vector_takedown_one_lease_spans_absorb_to_purge(
    spark, tmp_path, monkeypatch
):
    """Between the absorb and the purge the root marker is STILL HELD
    (pre-r13 each step took and dropped its own lease, so an ingest
    batch racing the gap killed the takedown half-done): a concurrent
    marker acquisition in the gap is refused as ALIVE even under
    force, and the completed run releases the marker clean."""
    path, day0, anchors, ckpt = _streamed_index(spark, tmp_path)
    real_remove = AnnIndex.remove
    seen = {}

    def spying_remove(spark_, p, ids, **kw):
        seen["marker_in_gap"] = os.path.exists(compact_marker_path(p))
        with pytest.raises(RuntimeError, match="ALIVE"):
            _acquire_compact_marker(
                _HadoopFS(spark_, p), p, 3600.0, force=True
            )
        seen["borrowed_lease"] = kw.get("_lease") is not None
        return real_remove(spark_, p, ids, **kw)

    monkeypatch.setattr(AnnIndex, "remove", staticmethod(spying_remove))
    report = takedown_stream_vectors(spark, path, [5, 22], checkpoint=ckpt)
    assert seen == {"marker_in_gap": True, "borrowed_lease": True}
    assert report["removed"]["cells"]["rows_after"] == 28
    assert not os.path.exists(compact_marker_path(path))
    got = {
        r["vec_id"] for r in spark.read.parquet(f"{path}/cells").collect()
    }
    assert got == set(range(30)) - {5, 22}


def test_vector_takedown_mid_chain_crash_leaves_one_marker_then_converges(
    spark, tmp_path, monkeypatch
):
    """A failure between absorb and purge leaves exactly ONE
    force-retryable root marker (absorb mutated, so release would let
    readers resume on an un-purged index); loads fail fast until a
    force=True re-run converges the whole chain."""
    path, day0, anchors, ckpt = _streamed_index(spark, tmp_path)

    def exploding_remove(spark_, p, ids, **kw):
        raise RuntimeError("boom between absorb and purge")

    monkeypatch.setattr(AnnIndex, "remove", staticmethod(exploding_remove))
    with pytest.raises(RuntimeError, match="boom"):
        takedown_stream_vectors(spark, path, [5, 22], checkpoint=ckpt)
    root = compact_marker_path(path)
    assert os.path.exists(root)  # abandoned, not released
    with pytest.raises(RuntimeError, match="_COMPACTING"):
        AnnIndex.load(spark, path, day0)

    # recovery: heartbeat provably dead -> force re-run converges
    monkeypatch.undo()
    old = time.time() - 120
    os.utime(root, (old, old))
    report = takedown_stream_vectors(
        spark, path, [5, 22], checkpoint=ckpt, force=True
    )
    assert not os.path.exists(root)
    assert stream_epochs(spark, path) == []
    for name in ("cells", "pq_codes"):
        got = {
            r["vec_id"]
            for r in spark.read.parquet(f"{path}/{name}").collect()
        }
        assert got == set(range(30)) - {5, 22}, name
    assert report["removed"]["cells"]["rows_after"] == 28


def test_vector_takedown_detects_mid_write_epoch_at_close(
    spark, tmp_path, monkeypatch
):
    """ADVICE r12: an ingest batch already mid-write when the takedown
    started lands its stream epoch AFTER the purge but does not move
    the commit watermark until its commit file is written — the old
    watermark-only closing check passed. The close now re-checks the
    sidecar dirs themselves and fails loud, leaving the marker."""
    path, day0, anchors, ckpt = _streamed_index(spark, tmp_path)
    from impuls_spark.llm.similarity import ivf_assign

    real_remove = AnnIndex.remove

    def landing_remove(spark_, p, ids, **kw):
        out = real_remove(spark_, p, ids, **kw)
        # the mid-write batch's epoch lands now, carrying a removed id
        ivf_assign(_emb(spark_, 22, 24), anchors).write.parquet(
            f"{p}/stream/cells/__epoch=9"
        )
        return out

    monkeypatch.setattr(AnnIndex, "remove", staticmethod(landing_remove))
    with pytest.raises(RuntimeError, match="landed during takedown"):
        takedown_stream_vectors(spark, path, [5, 22], checkpoint=ckpt)
    # marker stays: the index may carry re-ingested removed vectors
    assert os.path.exists(compact_marker_path(path))


def test_vector_takedown_pure_refusal_releases_marker(spark, tmp_path):
    """A refusal before any mutation (cells-only crashed epoch trips
    absorb's parity fence) releases the chain's marker CLEAN — the
    single-lease protocol must not turn refusals into stale markers."""
    import shutil

    path, day0, anchors, ckpt = _streamed_index(spark, tmp_path)
    shutil.rmtree(f"{path}/stream/pq_codes/__epoch=1")
    with pytest.raises(RuntimeError, match="cells-only epoch"):
        takedown_stream_vectors(spark, path, [5], checkpoint=ckpt)
    assert not os.path.exists(compact_marker_path(path))


def test_corpus_takedown_detects_mid_write_epoch_at_close(
    spark, tmp_path, monkeypatch
):
    """The corpus twin (VERDICT r12 item 4): takedown_stream_corpus
    already spans one lease pair over its whole chain, but its closing
    check compared only watermarks — an epoch landed by a mid-write
    batch (commit file not yet written) escaped the rewrite AND the
    index rebuild yet the takedown reported success. The close now
    compares landed epoch DIRS and works without a checkpoint too."""
    from impuls_spark.llm.dedup import DedupIndex
    from impuls_spark.streaming import ingest_with_dedup
    from impuls_spark.streaming.ingest import takedown_stream_corpus

    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string"
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta", "en"),
         (2, "one two three four five six seven", "en")], schema
    ).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(
        spark.createDataFrame([], schema).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(src) + "/*")
    q = ingest_with_dedup(stream, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    assert spark.read.parquet(out).count() == 2

    real_build = DedupIndex.build.__func__

    def landing_build(cls, corpus_df, path_, **kw):
        res = real_build(cls, corpus_df, path_, **kw)
        # the mid-write batch's epoch lands after the rebuild read
        spark.createDataFrame(
            [(2, "one two three four five six seven")],
            "doc_id long, text string",
        ).write.parquet(f"{out}/__epoch=99/lang=en")
        return res

    monkeypatch.setattr(DedupIndex, "build", classmethod(landing_build))
    with pytest.raises(RuntimeError, match="landed during takedown"):
        takedown_stream_corpus(spark, out, [2], assume_stopped=True)
    # both markers stay: corpus and index may not cover the late epoch
    assert os.path.exists(compact_marker_path(out))
    assert os.path.exists(compact_marker_path(f"{out}/_index"))
