"""Recall@k floors for the ANN estate (VERDICT r13 item 4).

The IVF/IVF-PQ oracles prove determinism; these tests pin QUALITY —
recall@10 vs exact brute force — with floors set from the r14
measurement (scripts/ann_recall.py, RECALL.json) minus a safety margin.
Everything here is deterministic (fixed anchors, deterministic k-means)
so a floor breach is a code regression, never noise. The marquee
regression: AnnIndex.topk on a non-default-m index silently searched
with m=4 query slicing against m=8 codebooks (recall 0.30 -> 0.015,
every value-hash oracle green) — caught by this instrument r14, pinned
by test_annindex_topk_matches_direct_ivfpq below.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from impuls_spark.llm import similarity as sim

SF = "/root/testdata/sf0.01"
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .persist()
    )


@pytest.fixture(scope="module")
def exact(spark, emb):
    df = sim.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=K
    ).persist()
    df.count()
    return df


def _recall(approx, exact) -> float:
    return sim.recall_at_k(approx, exact, k=K).collect()[0]["mean_recall"]


def test_recall_at_k_identity_and_disjoint(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 10, 1)],
        "query_id int, neighbor_id int, rank int",
    )
    row = sim.recall_at_k(a, a, k=2).collect()[0]
    assert row["n_queries"] == 2 and row["mean_recall"] == 1.0
    b = a.select("query_id", (F.col("neighbor_id") + 100).alias(
        "neighbor_id"), "rank")
    assert sim.recall_at_k(b, a, k=2).collect()[0]["mean_recall"] == 0.0
    # rank filter: rows past k on the approx side don't count
    c = a.withColumn("rank", F.col("rank") + 10)
    assert sim.recall_at_k(c, a, k=2).collect()[0]["mean_recall"] == 0.0


def test_ivf_recall_floors_and_nprobe_monotonicity(spark, emb, exact):
    """d12's configuration at k=10: measured 0.495 / 0.755 at sf0.01
    (RECALL.json r14); floors carry ~0.1 margin."""
    anchors = emb.filter(F.col("vec_id") < 4)
    queries = emb.filter(F.col("vec_id") < 20)
    r1 = _recall(sim.ivf_topk(emb, queries, anchors, k=K, n_probe=1),
                 exact)
    r2 = _recall(sim.ivf_topk(emb, queries, anchors, k=K, n_probe=2),
                 exact)
    assert r1 >= 0.35 and r2 >= 0.60
    assert r2 >= r1  # monotone in n_probe (superset candidate pool)


def test_refined_never_below_plain_ivfpq(spark, emb, exact):
    """d43/d55's configuration: the refine pool is a superset of the
    plain top-k and exact distances rank it perfectly within the pool,
    so refined recall can never fall below plain at equal k. Measured
    0.155 / 0.285 at sf0.01 (RECALL.json r14)."""
    anchors = emb.filter(F.col("vec_id") < 4)
    queries = emb.filter(F.col("vec_id") < 20)
    model = sim.pq_train(emb, 64, 4, 4, 2)
    plain = _recall(
        sim.ivfpq_topk(emb, queries, anchors, dim=64, k=K, n_probe=2,
                       model=model), exact)
    refined = _recall(
        sim.ivfpq_topk_refined(emb, queries, anchors, dim=64, k=K,
                               rerank=3, n_probe=2, model=model), exact)
    assert plain >= 0.10
    assert refined >= plain
    assert refined >= 0.20


def test_annindex_topk_matches_direct_ivfpq(spark, emb, exact):
    """The r14 m-derivation regression: an AnnIndex built with
    NON-DEFAULT m/pq_k must search exactly like the direct ivfpq call
    given the same model — the subspace count comes from the model's
    code columns, never from the m parameter's default."""
    anchors = emb.filter(F.col("vec_id") < 4)
    queries = emb.filter(F.col("vec_id") < 20)
    idx = sim.AnnIndex.build(emb, anchors, dim=64, m=8, pq_k=16)
    got = idx.topk(queries, k=K, n_probe=2)
    want = sim.ivfpq_topk(
        emb, queries, anchors, dim=64, k=K, n_probe=2, m=8, pq_k=16,
        model=idx.model, cells=idx.cells)
    assert (
        sorted(map(tuple, got.select("query_id", "neighbor_id").collect()))
        == sorted(map(tuple,
                      want.select("query_id", "neighbor_id").collect()))
    )
    assert _recall(got, exact) >= 0.25  # measured 0.30 (r14)


def test_lifecycle_recall_floors(spark, emb):
    """Index lifecycle quality (build -> append -> retrain) at the
    instrument's m=8/pq_k=16 configuration: measured 0.315 / 0.225 /
    0.28 at sf0.01 (RECALL.json r14). A collapse in any state —
    mis-routed appends, a retrain that re-encodes against the wrong
    quantizer — lands far below these floors."""
    anchors = emb.filter(F.col("vec_id") < 4)
    day0 = emb.filter(F.col("vec_id") % 2 == 0)
    day1 = emb.filter(F.col("vec_id") % 2 == 1)
    q0 = day0.filter(F.col("vec_id") < 40)
    queries = emb.filter(F.col("vec_id") < 20)

    idx = sim.AnnIndex.build(day0, anchors, dim=64, m=8, pq_k=16)
    pre = sim.brute_force_topk(day0, q0, k=K).persist()
    pre.count()
    assert _recall(idx.topk(q0, k=K, n_probe=2), pre) >= 0.20
    pre.unpersist()

    exact_full = sim.brute_force_topk(emb, queries, k=K).persist()
    exact_full.count()
    appended = idx.append(day1)
    assert _recall(appended.topk(queries, k=K, n_probe=2),
                   exact_full) >= 0.15
    assert _recall(appended.retrain().topk(queries, k=K, n_probe=2),
                   exact_full) >= 0.18
    exact_full.unpersist()


def test_ann_capacity_law(spark):
    """The capacity law's shape invariants plus Python/Catalyst
    lock-step: ann_capacity (driver-side ints) and
    ann_capacity_columns (the d75 in-plan expressions) must agree at
    every size — a drift would let the oracle-gated d75 plan diverge
    from the plan build_auto actually applies."""
    ns = sorted({1, 2, 4, 5, 16, 17, 100, 255, 256, 257, 500, 999,
                 1000, 2000, 4095, 4096, 20000, 65535, 65536, 10**6,
                 10**8, 10**9, 10**12,
                 *(int(1.7 ** i) for i in range(1, 52))})
    df = spark.createDataFrame([(n,) for n in ns], "n bigint")
    cols = sim.ann_capacity_columns(F.col("n"), 64)
    rows = {
        r["n"]: r
        for r in df.select(
            "n", *[v.alias(k) for k, v in cols.items()]).collect()
    }
    prev = None
    for n in ns:
        c = sim.ann_capacity(n, 64)
        r = rows[n]
        assert (r["n_cells"], r["n_probe"], r["m"], r["pq_k"]) == (
            c.n_cells, c.n_probe, c.m, c.pq_k), f"twin drift at n={n}"
        # shape: divisibility, power-of-two codebooks, bounded cells
        assert 64 % c.m == 0 and c.pq_k & (c.pq_k - 1) == 0
        assert 4 <= c.pq_k <= 256 or n < 4
        assert c.n_cells <= n and c.n_probe <= c.n_cells
        # the collision bound that motivated the law: code space holds
        # margin*n whenever the clamps allow it (any corpus up to the
        # 256^16 ceiling; pq_k <= n keeps tiny corpora honest)
        if c.pq_k < min(256, 1 << (n.bit_length() - 1)):
            assert c.code_space >= 16 * n
        # monotone: capacity never shrinks as the corpus grows
        if prev is not None:
            assert c.n_cells >= prev.n_cells
            assert c.code_space >= prev.code_space
        prev = c


def test_build_auto_beats_fixed_capacity(spark, emb, exact):
    """The r14 scale finding, pinned: a capacity-built index (trained
    anchors + corpus-sized codebooks) must beat the fixed m=4/pq_k=4
    configuration it replaced — measured 0.155 fixed vs ~0.69 auto
    refined at sf0.01 (and 0.01 vs ~0.55 at 20k vectors, where fixed
    capacity collapses entirely)."""
    queries = emb.filter(F.col("vec_id") < 20)
    anchors4 = emb.filter(F.col("vec_id") < 4)
    fixed = _recall(
        sim.ivfpq_topk(emb, queries, anchors4, dim=64, k=K, n_probe=2),
        exact)
    idx = sim.AnnIndex.build_auto(emb, dim=64)
    assert idx.capacity is not None and idx.capacity.n == 500
    auto = _recall(idx.topk(queries, k=K), exact)
    refined = _recall(idx.topk_refined(queries, k=K, rerank=8), exact)
    assert auto >= fixed
    assert refined >= max(auto, 2 * fixed, 0.5)


def test_retrain_capacity_auto_rescales(spark, emb):
    """retrain(capacity='auto') re-derives the WHOLE configuration
    from the accreted corpus: grow a 125-vector index 4x and the
    retrained handle must carry the larger plan (more cells, fresh n)
    and keep searching correctly under its own defaults."""
    small = emb.filter(F.col("vec_id") < 125)
    idx = sim.AnnIndex.build_auto(small, dim=64)
    assert idx.capacity.n == 125
    grown = idx.append(emb.filter(F.col("vec_id") >= 125))
    # append carries the stale plan unchanged (documented drift)
    assert grown.capacity.n == 125
    re = grown.retrain(capacity="auto")
    want = sim.ann_capacity(500, 64)
    assert re.capacity == want
    assert re.anchors.count() == want.n_cells
    # fresh-plan codebooks really are the retrained model's shape
    codes, books = re.model
    m = sum(1 for c in codes.columns if c.startswith("code_"))
    assert m == want.m
    got_k = books.select("__cid").distinct().count()
    assert got_k == want.pq_k
    truth = sim.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10),
                                 k=K).persist()
    truth.count()
    assert _recall(re.topk(emb.filter(F.col("vec_id") < 10), k=K),
                   truth) >= 0.2
    truth.unpersist()
