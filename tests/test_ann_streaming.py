"""Streaming vector ingest for a saved AnnIndex
(impuls_spark/streaming/ann_ingest.py): epoch-idempotent routing,
the stream serving view, the absorb fold, and the maintenance fence.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from impuls_spark.llm import AnnIndex
from impuls_spark.llm.similarity import ivf_assign, pq_encode
from impuls_spark.streaming import absorb_stream, ingest_vectors, stream_epochs

DIM = 64


def _emb(spark, lo, hi):
    return (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
    )


def _build_saved(spark, tmp_path, n_day0=20):
    day0 = _emb(spark, 0, n_day0)
    anchors = _emb(spark, 0, 4)
    path = str(tmp_path / "idx")
    AnnIndex.build(day0, anchors, dim=DIM, m=4, pq_k=4).save(path)
    return path, day0, anchors


def _run_ingest(spark, src, path, ckpt):
    schema = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*")
    )
    q = ingest_vectors(stream, path, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)


def test_ingest_vectors_routes_and_dedups_across_restart(spark, tmp_path):
    """Two streamed batches land epoch-partitioned assignments that
    match the batch kernels bit for bit; a restart whose source
    re-delivers batch 1 verbatim (at-least-once) skips those ids and
    lands only the genuinely new batch."""
    path, day0, anchors = _build_saved(spark, tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    _emb(spark, 20, 25).write.parquet(str(src / "b1"))
    _emb(spark, 25, 30).write.parquet(str(src / "b2"))
    _run_ingest(spark, src, path, ckpt)

    assert stream_epochs(spark, path) == [0, 1]
    streamed = _emb(spark, 20, 30)
    got_cells = (
        spark.read.parquet(f"{path}/stream/cells")
        .select("vec_id", "anchor_id")
    )
    want_cells = ivf_assign(streamed, anchors)
    assert sorted(map(tuple, got_cells.collect())) == sorted(
        map(tuple, want_cells.collect())
    )
    books = spark.read.parquet(f"{path}/pq_codebooks")
    want_codes = pq_encode(streamed, books, DIM, 4)
    got_codes = spark.read.parquet(f"{path}/stream/pq_codes").drop("__epoch")
    assert sorted(map(tuple, got_codes.select(*want_codes.columns).collect())) \
        == sorted(map(tuple, want_codes.collect()))

    # at-least-once restart: b1 re-delivered verbatim + a new batch
    _emb(spark, 20, 25).write.parquet(str(src / "b1_redelivered"))
    _emb(spark, 30, 33).write.parquet(str(src / "b3"))
    _run_ingest(spark, src, path, ckpt)
    ids = sorted(
        r["vec_id"]
        for r in spark.read.parquet(f"{path}/stream/cells")
        .select("vec_id").collect()
    )
    assert ids == list(range(20, 33))  # no duplicate from the re-delivery

    # the stream view serves day0 + streamed vectors as one index
    view = AnnIndex.from_stream_index(
        spark, path, day0.unionByName(_emb(spark, 20, 33))
    )
    probe = _emb(spark, 30, 31)
    hits = {
        r["neighbor_id"] for r in view.topk_refined(probe, k=3).collect()
    }
    # self-matches are excluded by design; streamed vectors must be
    # candidates — without the stream sidecars every hit would be <20
    assert hits & set(range(20, 33)), hits


def test_absorb_stream_yields_flat_index_equal_to_batch_append(
    spark, tmp_path
):
    """absorb_stream folds the epochs into the flat artifacts; the
    result is indistinguishable from having routed the same vectors
    through the batch kernels directly, and maintenance works again."""
    path, day0, anchors = _build_saved(spark, tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    _emb(spark, 20, 28).write.parquet(str(src / "b1"))
    _run_ingest(spark, src, path, str(tmp_path / "ckpt"))

    stats = absorb_stream(spark, path)
    assert stats["epochs"] == [0]
    assert stats["cells"] == 8 and stats["pq_codes"] == 8
    assert stream_epochs(spark, path) == []
    assert not os.path.exists(f"{path}/stream")

    full = day0.unionByName(_emb(spark, 20, 28))
    got = spark.read.parquet(f"{path}/cells")
    want = ivf_assign(full, anchors)
    assert sorted(map(tuple, got.select(*want.columns).collect())) == \
        sorted(map(tuple, want.collect()))
    books = spark.read.parquet(f"{path}/pq_codebooks")
    want_codes = pq_encode(full, books, DIM, 4)
    got_codes = spark.read.parquet(f"{path}/pq_codes")
    assert sorted(
        map(tuple, got_codes.select(*want_codes.columns).collect())
    ) == sorted(map(tuple, want_codes.collect()))

    # content maintenance is legal again: remove a streamed vector
    AnnIndex.remove(spark, path, [21])
    left = {
        r["vec_id"]
        for r in spark.read.parquet(f"{path}/cells").collect()
    }
    assert 21 not in left and 20 in left


def test_content_maintenance_refused_until_absorbed(spark, tmp_path):
    """append(path=)/remove/retrain(path=) fail fast while un-absorbed
    stream epochs exist — a retrain would swap anchors under the
    stream rows' assignments, a remove would purge only half the
    serving surface."""
    path, day0, anchors = _build_saved(spark, tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    _emb(spark, 20, 24).write.parquet(str(src / "b1"))
    _run_ingest(spark, src, path, str(tmp_path / "ckpt"))

    from impuls_spark.streaming.compact import compact_marker_path

    idx = AnnIndex.load(spark, path, day0)
    marker = compact_marker_path(path)
    with pytest.raises(RuntimeError, match="un-absorbed"):
        idx.append(_emb(spark, 40, 42), path=path)
    # the fence runs UNDER the root marker (ADVICE r11) — a refusal
    # must RELEASE it, not leave the index fail-fasting forever
    assert not os.path.exists(marker)
    with pytest.raises(RuntimeError, match="un-absorbed"):
        AnnIndex.remove(spark, path, [20])
    assert not os.path.exists(marker)
    with pytest.raises(RuntimeError, match="un-absorbed"):
        idx.retrain(path=path)
    assert not os.path.exists(marker)
    # the file-level compact stays allowed: it never changes rows
    AnnIndex.compact(spark, path)
    absorb_stream(spark, path)
    AnnIndex.remove(spark, path, [20])  # legal now


def test_append_holds_root_marker_and_releases_on_success(spark, tmp_path):
    """append(path=) now runs under the root marker: a live foreign
    marker refuses the append (instead of racing the rewrite), and a
    successful append releases its own marker so readers proceed."""
    from impuls_spark.streaming.compact import compact_marker_path

    path, day0, anchors = _build_saved(spark, tmp_path)
    idx = AnnIndex.load(spark, path, day0)
    marker = compact_marker_path(path)
    open(marker, "w").close()  # a live (fresh-heartbeat) foreign run
    with pytest.raises(RuntimeError, match="ALIVE"):
        idx.append(_emb(spark, 20, 22), path=path)
    os.remove(marker)
    out = idx.append(_emb(spark, 20, 22), path=path)
    assert not os.path.exists(marker)
    assert out.cells.count() == 22


def test_absorb_crash_fail_fasts_then_forced_rerun_converges(
    spark, tmp_path
):
    """A crash between the cells fold and the pq_codes fold leaves the
    ROOT marker: loads, stream views, and ingest batches fail fast on
    the half-absorbed index; a force=True re-run (after the heartbeat
    is provably dead) converges to the same artifacts as a clean
    absorb."""
    from impuls_spark.streaming.compact import compact_marker_path

    path, day0, anchors = _build_saved(spark, tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    _emb(spark, 20, 26).write.parquet(str(src / "b1"))
    _run_ingest(spark, src, path, str(tmp_path / "ckpt"))

    # wedge the SECOND artifact's fold: a live-looking per-dir marker
    inner = compact_marker_path(f"{path}/pq_codes")
    open(inner, "w").close()
    with pytest.raises(RuntimeError, match="ALIVE"):
        absorb_stream(spark, path)
    root = compact_marker_path(path)
    assert os.path.exists(root)  # abandoned: readers must fail fast
    with pytest.raises(RuntimeError, match="_COMPACTING"):
        AnnIndex.load(spark, path, day0)
    with pytest.raises(RuntimeError, match="_COMPACTING"):
        AnnIndex.from_stream_index(spark, path, day0)

    # dead-heartbeat recovery: backdate both markers past the liveness
    # floor, remove the injected wedge, force the re-run
    os.remove(inner)
    old = time.time() - 120
    os.utime(root, (old, old))
    stats = absorb_stream(spark, path, force=True)
    assert stats["cells"] in (0, 6)  # first fold may have completed
    assert stats["pq_codes"] == 6
    assert not os.path.exists(root)

    full = day0.unionByName(_emb(spark, 20, 26))
    want = ivf_assign(full, anchors)
    got = spark.read.parquet(f"{path}/cells")
    assert sorted(map(tuple, got.select(*want.columns).collect())) == \
        sorted(map(tuple, want.collect()))
    got_ids = {
        r["vec_id"]
        for r in spark.read.parquet(f"{path}/pq_codes").collect()
    }
    assert got_ids == set(range(0, 20)) | set(range(20, 26))


def test_stream_parity_guard_catches_crashed_epoch(spark, tmp_path):
    """A crash between an epoch's cells write and its pq_codes write
    leaves the sidecars disagreeing on epochs; absorb and the serving
    view refuse (a cells row with no code silently vanishes from the
    ADC rerank), and an ingest restart repairs it."""
    import shutil

    path, day0, anchors = _build_saved(spark, tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _emb(spark, 20, 24).write.parquet(str(src / "b1"))
    _emb(spark, 24, 28).write.parquet(str(src / "b2"))
    _run_ingest(spark, src, path, ckpt)

    # simulate the crashed epoch: epoch 1's codes never landed
    shutil.rmtree(f"{path}/stream/pq_codes/__epoch=1")
    with pytest.raises(RuntimeError, match="cells-only epoch"):
        absorb_stream(spark, path)
    with pytest.raises(RuntimeError, match="cells-only epoch"):
        AnnIndex.from_stream_index(spark, path, day0)
    # bounding a live read BELOW the crashed epoch is still legal
    view = AnnIndex.from_stream_index(spark, path, day0, upto_epoch=0)
    assert view.cells.count() == 20 + 4

    # the repair is an ingest restart: epoch 1 was never committed in
    # this simulation, so replay it by hand the way a restart would
    # (re-run the same source through a FRESH checkpoint after
    # clearing the half-written epoch)
    shutil.rmtree(f"{path}/stream/cells/__epoch=1")
    _run_ingest(spark, src, path, str(tmp_path / "ckpt2"))
    stats = absorb_stream(spark, path)
    assert stats["cells"] == 8 and stats["pq_codes"] == 8


def test_takedown_stream_vectors_mid_stream(spark, tmp_path):
    """The composed streaming-vector takedown: with un-absorbed stream
    epochs on disk, one watermark-proved run absorbs the sidecars and
    purges the removed ids from the flat artifacts — absent from flat
    AND stream layouts afterwards, and a restarted ingest re-accepts
    ONLY the removed (now legitimately novel) ids."""
    from impuls_spark.streaming import takedown_stream_vectors

    path, day0, anchors = _build_saved(spark, tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _emb(spark, 20, 25).write.parquet(str(src / "b1"))
    _emb(spark, 25, 30).write.parquet(str(src / "b2"))
    _run_ingest(spark, src, path, ckpt)
    assert stream_epochs(spark, path) == [0, 1]

    # ids span the flat day-0 set (5) and both streamed epochs (22, 27)
    report = takedown_stream_vectors(spark, path, [5, 22, 27],
                                     checkpoint=ckpt)
    assert report["epoch_watermark"] == 1
    assert report["removed"]["cells"]["rows_after"] == 27
    want = set(range(0, 30)) - {5, 22, 27}
    for name in ("cells", "pq_codes"):
        got = {
            r["vec_id"]
            for r in spark.read.parquet(f"{path}/{name}").collect()
        }
        assert got == want, name
    # the stream layout holds NO copy: sidecars absorbed and deleted
    assert stream_epochs(spark, path) == []
    assert not os.path.exists(f"{path}/stream")
    # no marker left behind — serving resumes
    from impuls_spark.streaming.compact import compact_marker_path

    assert not os.path.exists(compact_marker_path(path))

    # restart over the SAME source with a fresh checkpoint: the replay
    # id-dedups against the purged flat layout, so exactly the removed
    # streamed ids land again (takedown = re-ingestable)
    _run_ingest(spark, src, path, str(tmp_path / "ckpt2"))
    relanded = {
        r["vec_id"]
        for r in spark.read.parquet(f"{path}/stream/cells").collect()
    }
    assert relanded == {22, 27}


def test_takedown_stream_vectors_refuses_active_query(spark, tmp_path):
    """An epoch landed above the checkpoint watermark (in-flight or
    crashed-mid-epoch ingest) refuses the takedown; so does omitting
    both checkpoint and assume_stopped."""
    from impuls_spark.streaming import takedown_stream_vectors

    path, day0, anchors = _build_saved(spark, tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _emb(spark, 20, 24).write.parquet(str(src / "b1"))
    _run_ingest(spark, src, path, ckpt)

    with pytest.raises(ValueError, match="assume_stopped"):
        takedown_stream_vectors(spark, path, [20])

    # simulate an in-flight epoch above the watermark
    extra = _emb(spark, 40, 42)
    extra_dir = f"{path}/stream/cells/__epoch=9"
    from impuls_spark.llm.similarity import ivf_assign

    ivf_assign(extra, anchors).write.parquet(extra_dir)
    with pytest.raises(RuntimeError, match="ACTIVE"):
        takedown_stream_vectors(spark, path, [20], checkpoint=ckpt)


def test_continuous_corpus_example_end_to_end(spark, tmp_path):
    """The composed streaming story (examples/continuous_corpus): doc
    ingest dedups across overlapping batches, the accepted documents'
    embeddings stream onto the ANN index, both accreted views serve,
    and the composed compliance takedown (takedown_stream_corpus +
    takedown_stream_vectors) scrubs both estates with a clean
    absence audit."""
    from examples.continuous_corpus import run

    batches = [
        [(i, f"document body {i} " + " ".join(
            f"w{i}x{j}" for j in range(8)), "en") for i in range(10)],
        # batch 2 overlaps [8, 10): the re-crawl must not re-land
        [(i, f"document body {i} " + " ".join(
            f"w{i}x{j}" for j in range(8)), "en") for i in range(8, 16)],
    ]
    ev = run(spark, str(tmp_path / "cc"), batches)
    assert ev["corpus_rows"] == 16  # 10 + 6 novel (2 re-crawls dropped)
    assert ev["recrawl_status"] == ["exact"]  # known text classifies
    assert ev["ann_hits"] == 3
    ct = ev["corpus_takedown"]["corpus"]
    assert ct["rows_before"] - ct["rows_after"] == 1  # exactly the victim
    assert ev["vector_takedown"]["absorbed"]["cells"] == 16 - 4
    assert ev["audit"]["ann_stream_epochs_left"] == 0
    assert ev["victim_gone"] and ev["survivors"] == 15
