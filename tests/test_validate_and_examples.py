"""Tests: feed validate() operator + the reference-shaped example pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from impuls_spark.operators import AddEntity
from impuls_spark.task import TaskRuntime
from impuls_spark.validate import validate


@pytest.fixture()
def rt(spark):
    return TaskRuntime(spark)


def test_validate_clean_feed(feed):
    assert validate(feed).count() == 0


def test_validate_catches_violations(feed, rt):
    # bad route type, dangling agency FK, duplicate stop PK
    bad = AddEntity("routes", {
        "route_id": "BAD", "agency_id": "ghost", "short_name": "B",
        "long_name": "Bad", "type": 99,
    }).transform(feed, rt)
    dup = bad.insert("stops", bad["stops"].limit(1))
    report = {(r["table_name"], r["constraint"]): r["n_violations"]
              for r in validate(dup).collect()}
    assert report[("routes", "check:type_in_enum")] == 1
    assert report[("routes", "fk:agency_id->agencies")] == 1
    assert report[("stops", "pk:unique")] == 1
    # the bad route also orphans trips? no trips reference BAD, so no more
    assert ("trips", "fk:route_id->routes") not in report


def test_example_pipeline(spark, feed):
    from examples.krakow_like import build_pipeline

    out = build_pipeline().run(spark, feed)

    # trips with no boardable stop (pickup_type=1 everywhere, k%13==0)
    # are gone and their stop_times cascaded
    assert out["trips"].count() < feed["trips"].count()
    st_trips = out["stop_times"].select("trip_id").distinct()
    dangling = st_trips.join(out["trips"].select("trip_id"), "trip_id", "left_anti")
    assert dangling.count() == 0

    # block ids dropped
    assert out["trips"].filter(F.col("block_id").isNotNull()).count() == 0

    # route long names regenerated as "first — last"
    ln = out["routes"].filter(F.col("route_id") == "A1").collect()[0]["long_name"]
    assert " — " in ln

    # no duplicate-name stop groups remain without a station parent
    from impuls_spark.validate import validate as v

    assert v(out).count() == 0


def test_takedown_pipeline_compliance_example(spark, tmp_path):
    """VERDICT r10 item 1 done-bar: after the composed takedown, the
    removed text is absent from EVERY artifact (corpus, both dedup
    artifacts, both ANN artifacts, training shards), untouched shards
    are byte-identical, and the audit passes; survivors still serve."""
    import glob
    import hashlib
    import os

    from examples.takedown_pipeline import (
        build_estate,
        takedown,
        verify_takedown,
    )
    from impuls_spark.llm.embed import embed_texts

    out = str(tmp_path / "estate")
    docs = spark.createDataFrame(
        [(i, f"document body {i} " + " ".join(
            f"w{i}x{j}" for j in range(10)),
          ["en", "de", "fr"][i % 3])
         for i in range(36)],
        "doc_id long, text string, lang string",
    )
    emb = embed_texts(docs, dim=16).select(
        F.col("doc_id").alias("vec_id"), "embedding")
    est = build_estate(spark, out, docs, emb, dim=16)
    assert est == {"corpus_rows": 36, "shard_rows": 36}

    gone = [3, 7, 11]
    # record untouched-shard bytes (ids hash to a known shard set)
    import hashlib as _h

    affected = {
        _h.md5(f"shard:{i}".encode()).hexdigest()[:1] for i in gone
    }
    untouched = {}
    for f in glob.glob(f"{out}/shards/shard=*/*.parquet"):
        if f.split("shard=")[1][0] not in affected:
            with open(f, "rb") as fh:
                untouched[f] = hashlib.md5(fh.read()).hexdigest()
    assert untouched

    removed_texts = [r["text"] for r in docs.filter(
        F.col("doc_id").isin(gone)).collect()]
    takedown(spark, out, gone)
    audit = verify_takedown(spark, out, gone, removed_texts)
    assert audit["removed_text_status"] == ["novel"]
    assert all(v == 0 for k, v in audit.items() if k.endswith("_hits"))
    for f, digest in untouched.items():
        with open(f, "rb") as fh:
            assert hashlib.md5(fh.read()).hexdigest() == digest, f

    # survivors: still classified exact, still served by the ANN index
    from impuls_spark.llm import AnnIndex, DedupIndex

    keep_probe = docs.filter(F.col("doc_id").isin([1, 2]))
    idx = DedupIndex.load(spark, f"{out}/dedup_idx")
    assert {r["status"] for r in idx.classify(keep_probe).collect()} == {
        "exact"
    }
    survivors = emb.filter(~F.col("vec_id").isin(gone))
    anchors = emb.orderBy("vec_id").limit(4)
    hits = AnnIndex.load(spark, f"{out}/ann_idx", survivors, anchors).topk(
        survivors.limit(2), k=3)
    got = {r["neighbor_id"] for r in hits.collect()}
    assert got and not (set(gone) & got)

    # idempotent re-run converges with nothing left to do
    rep2 = takedown(spark, out, gone)
    assert rep2["corpus"]["rows_before"] == rep2["corpus"]["rows_after"]
