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
