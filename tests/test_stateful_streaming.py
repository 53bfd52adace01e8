"""Custom stateful operator tests: batch semantics + a live streaming
query through applyInPandasWithState."""

from __future__ import annotations

from pyspark.sql import functions as F

from impuls_spark.streaming import running_threshold_alerts


def _events_df(spark):
    rows = [
        # user 1: values 60, 60 -> crosses 100 at second event;
        # then 90 -> total 210, crosses 200
        (1, "2024-01-01 10:00:00", 60.0),
        (2, "2024-01-01 10:00:30", 10.0),
        (1, "2024-01-01 10:01:00", 60.0),
        (1, "2024-01-01 10:02:00", 90.0),
        # user 2 never reaches 100
        (2, "2024-01-01 10:03:00", 20.0),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_threshold_alerts_batch(spark):
    out = running_threshold_alerts(_events_df(spark), threshold=100.0).collect()
    alerts = sorted((r["user_id"], r["alert_ix"], r["total"]) for r in out)
    assert alerts == [(1, 1, 120.0), (1, 2, 210.0)]


def test_threshold_alerts_negative_dip(spark):
    """A cumsum that dips below 0 then recovers into [0, threshold) must
    NOT emit a spurious alert_ix=0 — batch twin matches the streaming
    `sent` counter, which starts at 0 and never decreases."""
    rows = [
        (1, "2024-01-01 10:00:00", -300.0),
        (1, "2024-01-01 10:01:00", 400.0),   # cum 100: inside [0, 500)
        (1, "2024-01-01 10:02:00", 600.0),   # cum 700: crosses 500 once
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = running_threshold_alerts(df, threshold=500.0).collect()
    alerts = sorted((r["user_id"], r["alert_ix"], r["total"]) for r in out)
    assert alerts == [(1, 1, 700.0)]


def test_threshold_alerts_ties_use_rows_frame(spark):
    """Duplicate (ts, event_id) order keys: ROWS frame sums row-by-row;
    the default RANGE frame would lump peers and over-count crossings."""
    rows = [
        (1, "2024-01-01 10:00:00", 60.0),
        (1, "2024-01-01 10:00:00", 60.0),  # tie on ts
        (1, "2024-01-01 10:00:00", 60.0),  # tie on ts
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = running_threshold_alerts(df, threshold=100.0).collect()
    # row-based cumsum: 60, 120, 180 -> exactly one crossing of 100
    assert [(r["user_id"], r["alert_ix"], r["total"]) for r in out] == [(1, 1, 120.0)]


def test_threshold_alerts_requires_order_column(spark):
    import pytest

    df = spark.createDataFrame([(1, 50.0)], "user_id long, value double")
    with pytest.raises(ValueError, match="ts.*event_id|event order"):
        running_threshold_alerts(df, threshold=100.0)


def test_threshold_alerts_streaming(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    df = _events_df(spark)
    df.write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(df.schema).parquet(str(src))
    alerts = running_threshold_alerts(stream, threshold=100.0)
    q = (alerts.writeStream.outputMode("append").format("memory")
         .queryName("alerts_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM alerts_out").collect()
    got = sorted((r["user_id"], r["alert_ix"], r["total"]) for r in rows)
    # one micro-batch contains all events; per-key arrival order within
    # the batch follows the file -> totals match the batch twin
    assert got == [(1, 1, 120.0), (1, 2, 210.0)]


def test_dedup_stream_batch_parity(spark):
    from impuls_spark.streaming import dedup_stream, dedup_stream_within_watermark

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "aaa"), (2, "2024-01-01 10:01:00", "bbb"),
         (3, "2024-01-01 10:02:00", "aaa"), (4, "2024-01-01 10:03:00", "aaa")],
        "event_id long, ts string, text string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = dedup_stream(df).collect()
    assert len(out) == 2
    assert {r.content_hash for r in out} == {
        r.content_hash for r in dedup_stream_within_watermark(df).collect()
    }
    # explicit key columns skip the content hash
    assert len(dedup_stream(df, key_cols=["text"]).columns) == 3


def test_dedup_stream_within_watermark_runs(spark, tmp_path):
    """Drive the watermarked dedup on a real stream: duplicates split
    across micro-batches are still dropped (state carries over)."""
    from impuls_spark.streaming import dedup_stream_within_watermark

    src = tmp_path / "dedup_in"
    src.mkdir()
    schema = "event_id long, ts timestamp, text string"
    b1 = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "doc-a"), (2, "2024-01-01 10:01:00", "doc-b")],
        "event_id long, ts string, text string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b2 = spark.createDataFrame(
        [(3, "2024-01-01 10:02:00", "doc-a"), (4, "2024-01-01 10:03:00", "doc-c")],
        "event_id long, ts string, text string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b1.write.parquet(str(src / "f1"))
    b2.write.parquet(str(src / "f2"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*"))
    out = dedup_stream_within_watermark(stream, watermark="1 hour")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("dedup_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT text FROM dedup_out").collect()
    texts = sorted(r.text for r in rows)
    assert texts == ["doc-a", "doc-b", "doc-c"]  # second doc-a dropped


# -- stream-static enrichment ----------------------------------------------

def _enrich_inputs(spark):
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:01:00", 10.0),
            (1, "2024-01-01 10:05:00", 20.0),
            (2, "2024-01-01 10:02:00", 5.0),
            (99, "2024-01-01 10:20:00", 7.0),  # no dimension row
        ],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    dim = spark.createDataFrame(
        [(1, "A"), (2, "B")], "user_id long, segment string"
    )
    return ev, dim


def test_enriched_window_stats_batch(spark):
    from impuls_spark.streaming import enriched_window_stats

    ev, dim = _enrich_inputs(spark)
    out = enriched_window_stats(ev, dim, on="user_id", attrs=["segment"])
    rows = {(str(r["window_start"]), r["segment"]): (r["n"], r["total_value"])
            for r in out.collect()}
    assert rows == {
        ("2024-01-01 10:00:00", "A"): (2, 30.0),
        ("2024-01-01 10:00:00", "B"): (1, 5.0),
        # unmatched stream rows keep NULL attrs, never dropped
        ("2024-01-01 10:15:00", None): (1, 7.0),
    }


def test_enriched_window_stats_broadcasts_dim(spark):
    import contextlib
    import io

    from impuls_spark.streaming import enriched_window_stats

    ev, dim = _enrich_inputs(spark)
    out = enriched_window_stats(ev, dim, on="user_id", attrs=["segment"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan


def test_enriched_window_stats_streaming(spark, tmp_path):
    from impuls_spark.streaming import enriched_window_stats

    ev, dim = _enrich_inputs(spark)
    src = tmp_path / "enrich_src"
    ev.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    out = enriched_window_stats(stream, dim, on="user_id", attrs=["segment"])
    q = (out.writeStream.outputMode("complete").format("memory")
         .queryName("enrich_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {(str(r["window_start"]), r["segment"]): (r["n"], r["total_value"])
            for r in spark.sql("SELECT * FROM enrich_out").collect()}
    assert rows == {
        ("2024-01-01 10:00:00", "A"): (2, 30.0),
        ("2024-01-01 10:00:00", "B"): (1, 5.0),
        ("2024-01-01 10:15:00", None): (1, 7.0),
    }


# -- stream-stream interval join -------------------------------------------

def _attribution_inputs(spark):
    purchases = spark.createDataFrame(
        [
            (1, 100, "2024-01-01 10:30:00"),
            (1, 101, "2024-01-01 12:00:00"),  # no click within 30 min
            (2, 102, "2024-01-01 10:10:00"),
        ],
        "user_id long, event_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = spark.createDataFrame(
        [
            (1, 900, "2024-01-01 10:05:00"),   # 25 min before purchase 100
            (1, 901, "2024-01-01 10:29:00"),   # 1 min before purchase 100
            (1, 902, "2024-01-01 13:00:00"),   # AFTER every purchase
            (2, 903, "2024-01-01 10:10:00"),   # same instant as purchase 102
            (3, 904, "2024-01-01 10:00:00"),   # other user
        ],
        "user_id long, click_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return purchases, clicks


def test_interval_join_batch(spark):
    from impuls_spark.streaming import interval_join

    purchases, clicks = _attribution_inputs(spark)
    out = interval_join(purchases, clicks, on="user_id",
                        max_delay="30 minutes")
    got = sorted((r["event_id"], r["r_click_id"]) for r in out.collect())
    # purchase 100 <- clicks 900+901; purchase 101 unmatched (inner);
    # purchase 102 <- click 903 (boundary: same instant included)
    assert got == [(100, 900), (100, 901), (102, 903)]


def test_interval_join_streaming(spark, tmp_path):
    """Live stream-stream join: both sides watermarked, state bounded
    by the interval condition."""
    from impuls_spark.streaming import interval_join

    purchases, clicks = _attribution_inputs(spark)
    psrc, csrc = tmp_path / "p_src", tmp_path / "c_src"
    purchases.write.mode("overwrite").parquet(str(psrc))
    clicks.write.mode("overwrite").parquet(str(csrc))
    pstream = spark.readStream.schema(purchases.schema).parquet(str(psrc))
    cstream = spark.readStream.schema(clicks.schema).parquet(str(csrc))
    out = interval_join(pstream, cstream, on="user_id",
                        max_delay="30 minutes")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("attrib_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted((r["event_id"], r["r_click_id"])
                 for r in spark.sql("SELECT * FROM attrib_out").collect())
    assert got == [(100, 900), (100, 901), (102, 903)]


# -- streaming corpus sink --------------------------------------------------

def test_stream_to_corpus_sink(spark, tmp_path):
    """Micro-batches append into the hive-partitioned layout; the batch
    reader sees the full streamed corpus with pruning intact."""
    import glob

    from impuls_spark.sources import read_corpus
    from impuls_spark.streaming import stream_to_corpus

    docs = spark.createDataFrame(
        [(i, f"doc {i}", ["en", "de"][i % 2]) for i in range(40)],
        "doc_id long, text string, lang string",
    )
    src = tmp_path / "src"
    docs.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    out, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    q = stream_to_corpus(stream, out, ckpt, partition_by=["lang"])
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(
        p.rsplit("=", 1)[1] for p in glob.glob(out + "/lang=*")
    ) == ["de", "en"]
    back = read_corpus(spark, out)
    assert back.count() == 40
    assert read_corpus(spark, out, lang="en").count() == 20


def test_stream_to_corpus_idempotent_epoch_replay(spark, tmp_path):
    """VERDICT r5 item 8: replaying an epoch must not duplicate rows.
    The idempotent writer lands each batch under an __epoch partition
    with dynamic overwrite, so calling it twice with the same epoch_id
    (exactly what foreachBatch does after a crash-before-commit
    restart) replaces the epoch's directories instead of appending."""
    from impuls_spark.sources import read_corpus
    from impuls_spark.streaming import make_corpus_batch_writer

    docs = spark.createDataFrame(
        [(i, f"doc {i}", ["en", "de"][i % 2]) for i in range(20)],
        "doc_id long, text string, lang string",
    )
    out = str(tmp_path / "corpus")
    write = make_corpus_batch_writer(out, partition_by=["lang"],
                                     idempotent=True)
    write(docs, 0)
    write(docs, 0)  # replayed epoch
    back = read_corpus(spark, out)
    assert back.count() == 20
    assert "__epoch" not in back.columns
    assert back.select("doc_id").distinct().count() == 20
    # a NEW epoch still appends (overwrite is per-partition, not root)
    more = spark.createDataFrame(
        [(100 + i, f"late {i}", "en") for i in range(5)],
        "doc_id long, text string, lang string",
    )
    write(more, 1)
    assert read_corpus(spark, out).count() == 25
    # while the non-idempotent append mode documents at-least-once:
    out2 = str(tmp_path / "corpus2")
    append = make_corpus_batch_writer(out2, partition_by=["lang"])
    append(docs, 0)
    append(docs, 0)
    assert read_corpus(spark, out2).count() == 40


def test_stream_to_corpus_idempotent_end_to_end_restart(spark, tmp_path):
    """Genuine epoch replay through Structured Streaming: delete the
    last commit marker from the checkpoint and restart the query —
    Spark re-runs that epoch's foreachBatch, and the corpus must hold
    exactly one copy of every row."""
    import os

    from impuls_spark.sources import read_corpus
    from impuls_spark.streaming import stream_to_corpus

    docs = spark.createDataFrame(
        [(i, f"doc {i}", ["en", "de"][i % 2]) for i in range(30)],
        "doc_id long, text string, lang string",
    )
    src = tmp_path / "src"
    docs.write.mode("overwrite").parquet(str(src))
    out, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(docs.schema).parquet(str(src))
        q = stream_to_corpus(stream, out, ckpt, partition_by=["lang"],
                             idempotent=True)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)  # fully release the checkpoint

    run()
    assert read_corpus(spark, out).count() == 30
    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt, "commits"))
        if not f.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):  # local-FS checksum sidecar
        os.remove(crc)
    run()  # restart: the uncommitted epoch is replayed
    back = read_corpus(spark, out)
    assert back.count() == 30
    assert back.select("doc_id").distinct().count() == 30


def test_dedup_stream_vs_corpus(spark, tmp_path):
    """Stream rows whose content the accepted corpus already holds are
    dropped by a stream-static anti join; fresh content passes."""
    from impuls_spark.streaming import dedup_stream_vs_corpus

    corpus_hashes = spark.createDataFrame(
        [("seen before",)], "text string"
    ).select(F.md5("text").alias("content_hash"))
    batch = spark.createDataFrame(
        [(1, "seen before"), (2, "brand new"), (3, "seen before")],
        "doc_id long, text string",
    )
    # batch twin
    out = dedup_stream_vs_corpus(batch, corpus_hashes)
    assert [r["doc_id"] for r in out.collect()] == [2]

    # live stream
    src = tmp_path / "vs_corpus_src"
    batch.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    q = (dedup_stream_vs_corpus(stream, corpus_hashes)
         .writeStream.outputMode("append").format("memory")
         .queryName("vs_corpus_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT doc_id FROM vs_corpus_out").collect()
    assert [r["doc_id"] for r in rows] == [2]


def test_stream_quota_batch_twin(spark):
    from impuls_spark.streaming import stream_quota

    rows = [(u, 100 + i, f"2024-01-01 10:{i:02d}:00")
            for u in (1, 2) for i in range(6)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = stream_quota(df, n=2, window="5 minutes").collect()
    # per user: window 10:00 holds minutes 00-04 (5 events, capped at
    # 2) and window 10:05 holds minute 05 (1 event, kept) -> 3 each
    assert len(out) == 6
    per = {}
    for r in out:
        per.setdefault((r["window_start"], r["user_id"]), []).append(r["event_id"])
    assert all(len(v) <= 2 for v in per.values())
    # deterministic under repartitioning
    again = stream_quota(df.repartition(7), n=2, window="5 minutes").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_stream_quota_streaming_matches_batch(spark, tmp_path):
    from impuls_spark.streaming import stream_quota

    rows = [(u, 100 + i, f"2024-01-01 10:0{i}:00")
            for u in (1, 2) for i in range(5)]
    rows.append((1, 999, "2024-01-01 10:30:00"))  # watermark pusher
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src = tmp_path / "quota_src"
    df.write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        stream_quota(stream, n=2, window="5 minutes", watermark="1 minute")
        .writeStream.outputMode("append").format("memory")
        .queryName("quota_out").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["window_start"], r["user_id"], r["event_id"])
        for r in spark.sql("SELECT * FROM quota_out").collect()
    )
    # the 10:00 window closed (watermark 10:29 > 10:05); the 10:30
    # window is still open, so exactly the closed window's winners —
    # the batch twin on the same rows restricted to that window
    want = sorted(
        (r["window_start"], r["user_id"], r["event_id"])
        for r in stream_quota(df, n=2, window="5 minutes").collect()
        if r["window_start"] == "2024-01-01 10:00:00"
    )
    assert got == want and len(want) == 4


def test_stream_quota_duplicate_ids_count_once(spark, tmp_path):
    """ADVICE r5: duplicate event ids in a (key, window) — the
    at-least-once replay case — must count ONCE toward the quota on
    both sides; two copies of one event must not displace a distinct
    one."""
    from impuls_spark.streaming import stream_quota

    base = [(1, 100 + i, f"2024-01-01 10:0{i}:00") for i in range(4)]
    # replay event 100 twice more
    dup = base + [(1, 100, "2024-01-01 10:00:30"),
                  (1, 100, "2024-01-01 10:00:45"),
                  (1, 999, "2024-01-01 10:30:00")]  # watermark pusher
    df = spark.createDataFrame(
        dup, "user_id long, event_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    batch = sorted(
        r["event_id"]
        for r in stream_quota(df, n=3, window="5 minutes").collect()
        if r["window_start"] == "2024-01-01 10:00:00"
    )
    # 4 distinct events, quota 3: exactly 3 DISTINCT ids kept
    assert len(batch) == len(set(batch)) == 3

    src = tmp_path / "quota_dup_src"
    df.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        stream_quota(stream, n=3, window="5 minutes", watermark="1 minute")
        .writeStream.outputMode("append").format("memory")
        .queryName("quota_dup_out").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        r["event_id"]
        for r in spark.sql("SELECT * FROM quota_dup_out").collect()
    )
    assert got == batch


def test_stream_quota_non_utc_session(spark, tmp_path):
    """ADVICE r5: the event-time timeout must not depend on the session
    timezone.  East of UTC the old rendered-key epoch landed 9 h before
    the watermark and threw; the __wsec column carries the true epoch."""
    from impuls_spark.streaming import stream_quota

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        rows = [(1, 100 + i, f"2024-01-01 10:0{i}:00") for i in range(4)]
        rows.append((1, 999, "2024-01-01 10:30:00"))
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        src = tmp_path / "quota_tz_src"
        df.write.mode("overwrite").parquet(str(src))
        stream = spark.readStream.schema(df.schema).parquet(str(src))
        q = (
            stream_quota(stream, n=2, window="5 minutes",
                         watermark="1 minute")
            .writeStream.outputMode("append").format("memory")
            .queryName("quota_tz_out").start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            (r["window_start"], r["event_id"])
            for r in spark.sql("SELECT * FROM quota_tz_out").collect()
        )
        want = sorted(
            (r["window_start"], r["event_id"])
            for r in stream_quota(df, n=2, window="5 minutes").collect()
            if r["window_start"] == "2024-01-01 10:00:00"
        )
        assert got == want and len(want) == 2
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_stream_quota_window_unit_errors(spark):
    """ADVICE r5: unsupported duration units fail with a descriptive
    message, not a bare KeyError."""
    import pytest

    from impuls_spark.streaming import stream_quota

    df = spark.createDataFrame([], "user_id long, event_id long, ts timestamp")
    with pytest.raises(ValueError, match="'1 week'.*seconds"):
        stream_quota(df, window="1 week")
    with pytest.raises(ValueError, match="unsupported window duration"):
        stream_quota(df, window="soon")


def test_dedup_index_view_over_stream_sidecars(spark, tmp_path):
    """DedupIndex.from_stream_index: a BATCH job classifies candidates
    against a streaming corpus's live index sidecars — verdicts match
    incremental_dedup against the accepted corpus — and the view is
    strictly read-only (ingest/compact raise). Before any epoch lands,
    the view classifies everything novel instead of raising."""
    from impuls_spark.llm import DedupIndex, incremental_dedup
    from impuls_spark.streaming import ingest_with_dedup

    src = tmp_path / "ingest_src"
    src.mkdir()
    out, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string"
    probe = spark.createDataFrame(
        [(900, "alpha beta gamma delta epsilon zeta eta theta"),   # exact
         (901, "alpha beta gamma delta epsilon zeta eta theta x"),  # near
         (902, "completely different probe nine ten eleven twelve")],
        "doc_id long, text string",
    )

    # pre-stream: sidecars absent -> all novel, no raise
    view = DedupIndex.from_stream_index(spark, out)
    pre = {r["doc_id"]: r["status"] for r in view.classify(probe).collect()}
    assert pre == {900: "novel", 901: "novel", 902: "novel"}

    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta", "en"),
         (2, "one two three four five six seven eight", "en")],
        schema,
    )
    b1.write.mode("overwrite").parquet(str(src / "b1"))
    stream = spark.readStream.schema(
        spark.createDataFrame([], schema).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(src) + "/*")
    q = ingest_with_dedup(stream, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)

    got = {r["doc_id"]: r["status"] for r in view.classify(probe).collect()}
    corpus = spark.read.parquet(out).select("doc_id", "text")
    want = {r["doc_id"]: r["status"]
            for r in incremental_dedup(probe, corpus).collect()}
    assert got == want == {900: "exact", 901: "near", 902: "novel"}

    import pytest
    with pytest.raises(ValueError, match="read-only"):
        view.ingest(probe)
    with pytest.raises(ValueError, match="read-only"):
        view.compact()


def test_stream_sidecar_manifest_validates_banding(spark, tmp_path):
    """VERDICT r9 item 2: ingest_with_dedup writes the DedupIndex.build
    manifest row under {corpus}/_index/manifest; from_stream_index
    validates explicit kwargs against it (a silent mismatch would
    degrade recall with no error anywhere), and a RESTART of the ingest
    query with different banding parameters fails at start instead of
    splitting the index across incompatible bandings."""
    import json

    import pytest

    from impuls_spark.llm import DedupIndex
    from impuls_spark.streaming import ingest_with_dedup

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    out, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string"
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta", "en")], schema
    ).write.mode("overwrite").parquet(str(src_dir / "b1"))
    stream = spark.readStream.schema(
        spark.createDataFrame([], schema).schema
    ).parquet(str(src_dir) + "/*")
    q = ingest_with_dedup(stream, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)

    # the manifest row is byte-compatible with DedupIndex.build's
    meta = json.loads(spark.read.parquet(
        f"{out}/_index/manifest").collect()[0]["manifest"])
    assert meta == {"text_col": "text", "id_col": "doc_id",
                    "n_hashes": 6, "band_size": 2, "shingle_n": 3}

    # view without kwargs adopts the manifest; matching kwargs pass;
    # a mismatch raises instead of silently missing near-duplicates
    assert DedupIndex.from_stream_index(spark, out).meta == meta
    DedupIndex.from_stream_index(spark, out, n_hashes=6)
    with pytest.raises(ValueError, match="manifest"):
        DedupIndex.from_stream_index(spark, out, n_hashes=4)

    # restarting the ingest query with different banding fails at start
    with pytest.raises(ValueError, match="incompatible bandings"):
        ingest_with_dedup(stream, out, ckpt, band_size=3, n_hashes=6)
    # same parameters restart fine (no duplicate query started: the
    # ValueError path never reaches .start())
    q2 = ingest_with_dedup(stream, out, ckpt)
    q2.stop()
    q2.awaitTermination(30)


def test_ingest_with_dedup_end_to_end(spark, tmp_path):
    """Continuous classify-and-ingest: batch 1 seeds the corpus; batch 2
    re-crawls (exact), lightly edits (near) and adds fresh docs — only
    the fresh ones land; a genuine epoch replay (deleted commit marker)
    leaves counts unchanged; the maintained index tables match the
    accepted corpus."""
    import os

    from impuls_spark.streaming import ingest_with_dedup

    src = tmp_path / "ingest_src"
    src.mkdir()
    out, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string"

    def run():
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).option("maxFilesPerTrigger", 1).parquet(str(src) + "/*")
        q = ingest_with_dedup(stream, out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)

    base = "alpha beta gamma delta epsilon zeta eta theta"
    b1 = spark.createDataFrame(
        [(1, base, "en"),
         (2, "one two three four five six seven eight", "en"),
         (2000, base, "en")],  # in-batch exact dup of 1 -> dropped
        schema,
    )
    b1.write.mode("overwrite").parquet(str(src / "b1"))
    run()
    accepted = spark.read.parquet(out)
    got1 = sorted(r["doc_id"] for r in accepted.collect())
    # docs 1 and 2000 share one text: exactly one of them lands (within
    # one epoch the smaller id wins; split across epochs, the earlier
    # arrival wins - both are the operator's first-arrival contract)
    assert len(got1) == 2 and 2 in got1
    winner = (set(got1) - {2}).pop()
    assert winner in (1, 2000)

    b2 = spark.createDataFrame(
        [(10, base, "en"),                       # exact re-crawl of 1
         (11, base + " appended", "en"),         # near dup of 1
         (12, "totally fresh words nine ten eleven twelve", "en")],
        schema,
    )
    b2.write.mode("overwrite").parquet(str(src / "b2"))
    run()
    accepted = spark.read.parquet(out)
    got = sorted(r["doc_id"] for r in accepted.collect())
    assert got == sorted([winner, 2, 12]), got

    # the hash index covers exactly the accepted texts
    hashes = spark.read.parquet(out + "/_index/hashes")
    assert hashes.select("__h").distinct().count() == 3

    # genuine replay of the last epoch: no duplicates, no shrinkage
    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt, "commits"))
        if not f.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run()
    accepted = spark.read.parquet(out)
    assert sorted(r["doc_id"] for r in accepted.collect()) == sorted(
        [winner, 2, 12])
    assert spark.read.parquet(out + "/_index/hashes") \
        .select("__h").distinct().count() == 3

    # at-least-once replay INSIDE one micro-batch: the same (id, text)
    # row delivered twice must land exactly once (ADVICE r6 —
    # dropDuplicates on id after the first-id-wins semi-join)
    b3 = spark.createDataFrame(
        [(30, "thirteen fourteen fifteen sixteen seventeen", "en"),
         (30, "thirteen fourteen fifteen sixteen seventeen", "en")],
        schema,
    )
    b3.write.mode("overwrite").parquet(str(src / "b3"))
    run()
    accepted = spark.read.parquet(out)
    assert accepted.filter(accepted.doc_id == 30).count() == 1


def test_ingest_read_or_empty_raises_on_corrupt_index(spark, tmp_path):
    """Only a MISSING index path maps to the empty frame; a corrupt
    index must fail the batch loudly instead of silently classifying
    everything as novel (ADVICE r6, ingest.py)."""
    import pytest

    from impuls_spark.streaming.ingest import HASH_SCHEMA, _read_or_empty

    missing = str(tmp_path / "nope")
    df = _read_or_empty(spark, missing, HASH_SCHEMA, 0)
    assert df.count() == 0 and df.columns == ["__h"]

    corrupt = tmp_path / "corrupt"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(Exception) as ei:
        _read_or_empty(spark, str(corrupt), HASH_SCHEMA, 0).collect()
    assert "PATH_NOT_FOUND" not in str(ei.value)


def test_ingest_survives_empty_first_epoch(spark, tmp_path):
    """r8 flake root-cause: an EMPTY first micro-batch (crawl lull, or
    a zero-row part file ordered first) lands index directories with
    no parquet files; the next batch's index read must see an empty
    index — not die on UNABLE_TO_INFER_SCHEMA and wedge ingest
    permanently."""
    from impuls_spark.streaming import ingest_with_dedup

    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string"

    def run():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src) + "/*"))
        q = ingest_with_dedup(stream, out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)

    # batch 0: a zero-row (schema-only) parquet file
    spark.createDataFrame([], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "b0"))
    run()
    # batch 1 must classify against the (empty) index and land its docs
    spark.createDataFrame(
        [(1, "first real words one two three", "en")], schema
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    run()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1]
    # and a third batch classifies against batch 1's index correctly
    spark.createDataFrame(
        [(2, "first real words one two three", "en"),   # exact dup
         (3, "completely different text four five", "en")], schema
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b2"))
    run()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 3]


def test_progress_log_listener(spark, tmp_path):
    """attach_progress_log captures per-batch progress as JSONL:
    lifecycle markers plus one progress record per micro-batch with
    the row count; detach stops the flow."""
    import time

    from impuls_spark.streaming import (
        attach_progress_log,
        detach_progress_log,
        read_progress_log,
    )

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    log = str(tmp_path / "progress.jsonl")
    schema = "doc_id long, text string, lang string"
    spark.createDataFrame(
        [(1, "hello world", "en"), (2, "bonjour monde", "fr")], schema
    ).coalesce(1).write.parquet(str(src / "b0"))

    listener = attach_progress_log(spark, log)
    try:
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).parquet(str(src) + "/*")
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)
        # listener callbacks are async; give the bus a moment
        deadline = time.monotonic() + 20
        while time.monotonic() < deadline:
            recs = read_progress_log(log)
            kinds = {r["event"] for r in recs}
            if {"started", "progress", "terminated"} <= kinds:
                break
            time.sleep(0.5)
        recs = read_progress_log(log)
        kinds = [r["event"] for r in recs]
        assert "started" in kinds and "terminated" in kinds
        progress = [r for r in recs if r["event"] == "progress"]
        assert progress, f"no progress rows in {kinds}"
        assert sum(r["num_input_rows"] for r in progress) == 2
        assert all("duration_ms" in r for r in progress)
    finally:
        detach_progress_log(spark, listener)


def test_stream_kmv_partials_and_merge_on_read(spark, tmp_path):
    """Streaming KMV sidecar: per-batch partials land under __epoch
    partitions; the merged read-side estimate equals kmv_distinct over
    everything streamed — exactly, per the merge property."""
    from impuls_spark.llm import kmv_distinct
    from impuls_spark.streaming import read_kmv_partials, stream_kmv_partials

    docs = spark.createDataFrame(
        [(i, f"doc {i % 70}", ["en", "de"][i % 2]) for i in range(200)],
        "doc_id long, text string, lang string",
    )
    src = tmp_path / "src"
    # several files so the stream sees multiple micro-batches
    docs.repartition(4).write.mode("overwrite").parquet(str(src))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out, ckpt = str(tmp_path / "sk"), str(tmp_path / "ckpt")
    q = stream_kmv_partials(stream, out, ckpt, "text", ["lang"], k=16)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    import glob

    epochs = glob.glob(out + "/__epoch=*")
    assert len(epochs) >= 2  # genuinely incremental partials

    got = {
        r["lang"]: (r["n_kept"], r["kth_hash"], r["est_ndv"])
        for r in read_kmv_partials(spark, out, ["lang"], k=16).collect()
    }
    want = {
        r["lang"]: (r["n_kept"], r["kth_hash"], r["est_ndv"])
        for r in kmv_distinct(docs, "text", ["lang"], k=16).collect()
    }
    assert got == want


def test_read_kmv_partials_before_first_epoch_and_after_empty_epoch(
    spark, tmp_path
):
    """The dashboard read path must tolerate the two states schema
    inference chokes on (ADVICE r8, same class as ingest._read_or_empty):
    no sidecar directory at all (PATH_NOT_FOUND), and a directory whose
    only landed epoch wrote zero rows (just _SUCCESS —
    UNABLE_TO_INFER_SCHEMA). Both read as zero groups."""
    from impuls_spark.streaming import make_kmv_batch_writer, read_kmv_partials

    out = str(tmp_path / "sk")
    # 1. nothing landed yet
    assert read_kmv_partials(spark, out, ["lang"], k=8).collect() == []

    # 2. first epoch is an EMPTY micro-batch (crawl lull): dynamic
    # overwrite leaves a directory with no parquet files
    writer = make_kmv_batch_writer(out, "text", ["lang"], k=8)
    empty = spark.createDataFrame([], "doc_id long, text string, lang string")
    writer(empty, 0)
    assert read_kmv_partials(spark, out, ["lang"], k=8).collect() == []

    # and a real epoch afterwards reads normally
    b1 = spark.createDataFrame(
        [(i, f"x{i}", "en") for i in range(5)],
        "doc_id long, text string, lang string",
    )
    writer(b1, 1)
    rows = read_kmv_partials(spark, out, ["lang"], k=8).collect()
    assert [(r["lang"], r["est_ndv"]) for r in rows] == [("en", 5)]


def test_kmv_batch_writer_replay_is_idempotent(spark, tmp_path):
    """Replaying an epoch (foreachBatch after crash-before-commit)
    rewrites its partial wholesale; and even a duplicated PARTIAL would
    not shift the estimate, because merging is idempotent on the k-min
    set."""
    from impuls_spark.streaming import make_kmv_batch_writer, read_kmv_partials

    out = str(tmp_path / "sk")
    writer = make_kmv_batch_writer(out, "text", ["lang"], k=8)
    b0 = spark.createDataFrame(
        [(i, f"x{i}", "en") for i in range(30)],
        "doc_id long, text string, lang string",
    )
    b1 = spark.createDataFrame(
        [(i, f"x{i + 15}", "en") for i in range(30)],  # overlaps b0
        "doc_id long, text string, lang string",
    )
    writer(b0, 0)
    writer(b1, 1)
    before = read_kmv_partials(spark, out, ["lang"], k=8).collect()
    writer(b1, 1)  # replay epoch 1
    after = read_kmv_partials(spark, out, ["lang"], k=8).collect()
    assert [r.asDict() for r in before] == [r.asDict() for r in after]
    import glob

    assert len(glob.glob(out + "/__epoch=1/*.parquet")) == 1


def test_takedown_stream_corpus_end_to_end(spark, tmp_path):
    """VERDICT r10 item 4: the streaming-corpus takedown operator —
    stopped-query proof via the checkpoint watermark, partition-pruned
    corpus filter (emptied partitions deleted), and a flat
    track_ids=True index rebuild whose classifications match a fresh
    build over the retained corpus; the next takedown is a cheap
    remove() on the view handle, and a streaming restart over the flat
    layout is refused instead of silently reading an empty index."""
    import os

    import pytest

    from impuls_spark.llm import DedupIndex
    from impuls_spark.streaming import ingest_with_dedup
    from impuls_spark.streaming.ingest import takedown_stream_corpus

    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string"
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta", "en"),
         (2, "one two three four five six seven", "en")], schema
    ).write.mode("overwrite").parquet(str(src / "b1"))
    spark.createDataFrame(
        [(3, "neuf dix onze douze treize quatorze", "fr"),
         (4, "unique english words eight nine ten", "en")], schema
    ).write.mode("overwrite").parquet(str(src / "b2"))
    stream = spark.readStream.schema(
        spark.createDataFrame([], schema).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(src) + "/*")
    q = ingest_with_dedup(stream, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    assert spark.read.parquet(out).count() == 4

    # stopped-query proof is mandatory
    with pytest.raises(ValueError, match="assume_stopped"):
        takedown_stream_corpus(spark, out, [2])

    fr_dirs = [d for d in os.listdir(out) if d.startswith("__epoch")]
    assert fr_dirs
    stats = takedown_stream_corpus(spark, out, [2, 3, 777],
                                   checkpoint=ckpt)
    assert stats["index"] == {"rebuilt": True, "track_ids": True}
    assert stats["corpus"]["rows_before"] - stats["corpus"]["rows_after"] == 2

    left = spark.read.parquet(out)
    assert sorted(r["doc_id"] for r in left.collect()) == [1, 4]
    # doc 3 was the only row of its (epoch, lang=fr) partition: the
    # emptied directory is gone, not just empty
    assert stats["corpus"]["partitions_deleted"] >= 1
    assert not [
        p for p, _, _ in os.walk(out) if p.endswith("lang=fr")
    ]

    # classify-parity with a fresh tracked build over the retained rows
    probe = spark.createDataFrame(
        [(900, "alpha beta gamma delta epsilon zeta", "en"),   # kept 1
         (901, "one two three four five six seven", "en"),     # removed 2
         (902, "neuf dix onze douze treize quatorze", "fr"),   # removed 3
         (903, "totally new words eleven twelve thirteen", "en")],
        schema,
    )
    view = DedupIndex.from_stream_index(spark, out)
    fresh = DedupIndex.build(
        left.select("doc_id", "text", "lang"),
        str(tmp_path / "fresh_idx"), track_ids=True,
    )
    got = {r["doc_id"]: r["status"] for r in view.classify(probe).collect()}
    want = {r["doc_id"]: r["status"]
            for r in fresh.classify(probe).collect()}
    assert got == want
    assert got[900] == "exact" and got[901] == "novel"
    assert got[902] == "novel" and got[903] == "novel"

    # the rebuilt index is a full read-write handle: the NEXT takedown
    # is a cheap remove()
    view.remove([1])
    got2 = {r["doc_id"]: r["status"]
            for r in view.classify(probe).collect()}
    assert got2[900] == "novel"

    # restarting streaming ingest over the flat layout is refused
    with pytest.raises(ValueError, match="flat batch DedupIndex"):
        ingest_with_dedup(stream, out, ckpt)


def test_takedown_stream_corpus_refuses_inflight_epoch(spark, tmp_path):
    """A landed __epoch directory above the checkpoint's commit
    watermark means the ingest query is active (or will replay):
    takedown refuses."""
    import os

    import pytest

    from impuls_spark.streaming import ingest_with_dedup
    from impuls_spark.streaming.ingest import takedown_stream_corpus

    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string"
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta", "en")], schema
    ).write.mode("overwrite").parquet(str(src / "b1"))
    stream = spark.readStream.schema(
        spark.createDataFrame([], schema).schema
    ).parquet(str(src) + "/*")
    q = ingest_with_dedup(stream, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)

    # simulate an in-flight epoch: drop the last commit marker so the
    # landed __epoch=0 sits above the watermark
    commits = sorted(os.listdir(f"{ckpt}/commits"))
    os.remove(f"{ckpt}/commits/{commits[-1]}")
    with pytest.raises(RuntimeError, match="ACTIVE|appears"):
        takedown_stream_corpus(spark, out, [1], checkpoint=ckpt)


def test_ingest_manifest_rechoice_allowed_while_index_empty(
    spark, tmp_path
):
    """ADVICE r10: a manifest pinned by a start that never ingested
    anything (e.g. .start() failed on a bad source) does not wedge the
    corpus — new parameters may be chosen while the index sidecars are
    still empty, and the manifest follows; once rows exist the
    mismatch still raises."""
    import json

    import pytest

    from impuls_spark.streaming import ingest_with_dedup

    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string"

    # a prior start pinned n_hashes=4 but never ingested a row
    stale = {"text_col": "text", "id_col": "doc_id", "n_hashes": 4,
             "band_size": 2, "shingle_n": 3}
    spark.createDataFrame(
        [(json.dumps(stale),)], "manifest string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/_index/manifest")

    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta", "en")], schema
    ).write.mode("overwrite").parquet(str(src / "b1"))
    stream = spark.readStream.schema(
        spark.createDataFrame([], schema).schema
    ).parquet(str(src) + "/*")
    q = ingest_with_dedup(stream, out, ckpt)  # defaults: n_hashes=6
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    meta = json.loads(spark.read.parquet(
        f"{out}/_index/manifest").collect()[0]["manifest"])
    assert meta["n_hashes"] == 6  # re-chosen, manifest follows

    # now rows exist: a different banding is refused at start
    with pytest.raises(ValueError, match="incompatible bandings"):
        ingest_with_dedup(stream, out, ckpt, n_hashes=4)


def test_takedown_then_restore_then_resume_streaming(spark, tmp_path):
    """The full streaming takedown ROUND TRIP: ingest → takedown →
    restore_stream_index_layout → RESTART the ingest query. The
    restored __epoch=-1 state classifies like the retained corpus: a
    re-crawl of surviving content is skipped (exact), the removed
    content is re-acceptable (lands again), and fresh docs land."""
    from impuls_spark.llm import DedupIndex
    from impuls_spark.streaming import (
        ingest_with_dedup,
        restore_stream_index_layout,
        takedown_stream_corpus,
    )

    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string"

    def run_ingest():
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).option("maxFilesPerTrigger", 1).parquet(str(src) + "/*")
        q = ingest_with_dedup(stream, out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)

    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta", "en"),
         (2, "one two three four five six seven", "en")], schema
    ).write.mode("overwrite").parquet(str(src / "b1"))
    run_ingest()

    takedown_stream_corpus(spark, out, [2], checkpoint=ckpt)
    counts = restore_stream_index_layout(spark, out)
    assert counts["hashes"] == 1 and counts["bands"] > 0

    # the restored view is a read-only epoch handle again
    view = DedupIndex.from_stream_index(spark, out)
    assert view._epoched

    # resume the SAME checkpoint with batch 2: survivor re-crawl
    # (skip), removed-content re-crawl (re-accept), fresh doc (accept)
    spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta", "en"),
         (11, "one two three four five six seven", "en"),
         (12, "fresh words eight nine ten eleven", "en")], schema
    ).write.mode("overwrite").parquet(str(src / "b2"))
    run_ingest()

    got = sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    )
    assert got == [1, 11, 12]


def test_restore_stream_index_layout_force_recovery(spark, tmp_path):
    """restore_stream_index_layout honors the same marker-recovery
    contract as every other maintenance entry point: a stale (crashed)
    marker inside the stale_after_sec grace refuses without force and
    is swept under force=True, after which the sidecars are back in
    epoch form (__epoch=-1 state partition)."""
    import os
    import time

    import pytest

    from impuls_spark.llm import DedupIndex
    from impuls_spark.streaming import restore_stream_index_layout
    from impuls_spark.streaming.compact import compact_marker_path

    corpus = tmp_path / "corpus"
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(corpus))
    # a takedown leaves exactly this: a flat tracked batch index
    DedupIndex.build(docs, str(corpus / "_index"), track_ids=True)

    marker = compact_marker_path(str(corpus / "_index"))
    open(marker, "w").close()
    old = time.time() - 120  # heartbeat stopped: crashed, inside grace
    os.utime(marker, (old, old))

    with pytest.raises(RuntimeError, match="another compaction holds"):
        restore_stream_index_layout(spark, str(corpus))
    counts = restore_stream_index_layout(spark, str(corpus), force=True)
    assert counts["hashes"] == 1 and counts["bands"] > 0
    assert not os.path.exists(marker)
    view = DedupIndex.from_stream_index(spark, str(corpus))
    assert view._epoched
