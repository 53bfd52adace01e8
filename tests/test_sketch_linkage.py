"""Unit tests for the KMV distinct sketch, edit-distance linkage
verification, and keep-best cluster curation (d58-d60). Tiny
hand-built frames pin exact semantics; the oracle harness covers the
same operators at scale."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from impuls_spark.llm import (
    edit_verified_pairs,
    keep_best_per_cluster,
    kmv_distinct,
)

_HASH_SPACE = float(16**15)


def _h(salt: str, value: str) -> int:
    return int(hashlib.md5(f"{salt}:{value}".encode()).hexdigest()[:15], 16)


class TestKmvDistinct:
    def test_exact_below_k(self, spark):
        df = spark.createDataFrame(
            [("a", f"v{i}") for i in range(5)] + [("a", "v0")],
            ["g", "v"],
        )
        row = kmv_distinct(df, "v", ["g"], k=64).collect()[0]
        assert row.n_kept == 5  # the duplicate v0 collapses
        assert row.est_ndv == 5  # exact path below k

    def test_estimator_matches_formula(self, spark):
        vals = [f"item-{i}" for i in range(500)]
        df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
        k = 16
        row = kmv_distinct(df, "v", ["g"], k=k, salt="s").collect()[0]
        hashes = sorted(_h("s", v) for v in vals)
        kth = hashes[k - 1]
        assert row.n_kept == k
        assert row.kth_hash == kth
        assert row.est_ndv == int((k - 1) * _HASH_SPACE / kth)
        # the estimate should be in the right ballpark for 500 values
        assert 250 <= row.est_ndv <= 1000

    def test_mergeable_sketch_boundary(self, spark):
        """The k smallest of a union == k smallest over the union of
        each part's k smallest — the property that makes the sketch
        combinable across partitions/files/days."""
        vals = [f"x{i}" for i in range(200)]
        a = spark.createDataFrame([("g", v) for v in vals[:100]], ["g", "v"])
        b = spark.createDataFrame([("g", v) for v in vals[100:]], ["g", "v"])
        u = a.unionByName(b)
        k = 8
        direct = kmv_distinct(u, "v", ["g"], k=k).collect()[0]
        pa = [r.kth_hash for r in kmv_distinct(a, "v", ["g"], k=k).collect()]
        # merged boundary from the parts' retained hash sets
        ha = sorted(_h("kmv", v) for v in vals[:100])[:k]
        hb = sorted(_h("kmv", v) for v in vals[100:])[:k]
        merged_kth = sorted(ha + hb)[k - 1]
        assert direct.kth_hash == merged_kth
        assert pa[0] == ha[k - 1]

    def test_salt_buckets_do_not_change_result(self, spark):
        df = spark.createDataFrame(
            [("g", f"w{i}") for i in range(300)], ["g", "v"]
        )
        r1 = kmv_distinct(df, "v", ["g"], k=32, salt_buckets=1).collect()[0]
        r2 = kmv_distinct(df, "v", ["g"], k=32, salt_buckets=64).collect()[0]
        assert (r1.kth_hash, r1.est_ndv) == (r2.kth_hash, r2.est_ndv)

    def test_k_validation(self, spark):
        df = spark.createDataFrame([("g", "v")], ["g", "v"])
        with pytest.raises(ValueError):
            kmv_distinct(df, "v", ["g"], k=1)


class TestKmvSketchMerge:
    """VERDICT r7 item 6: the persistable sketch state + merge.
    merge(sketch(A), sketch(B)) must equal sketch(A ∪ B) exactly —
    same retained hashes, not just a close estimate."""

    def _parts(self, spark, n=300, groups=("g1", "g2")):
        rows = [(groups[i % len(groups)], f"val-{i}") for i in range(n)]
        df = spark.createDataFrame(rows, ["g", "v"])
        return (
            df.filter(F.length("v") % 2 == 0),
            df.filter(F.length("v") % 2 == 1),
            df,
        )

    def test_merge_equals_whole(self, spark):
        from impuls_spark.llm import kmv_merge, kmv_sketch

        a, b, whole = self._parts(spark)
        k = 12
        merged = kmv_merge(
            [kmv_sketch(p, "v", ["g"], k=k) for p in (a, b)], ["g"], k=k
        )
        direct = kmv_sketch(whole, "v", ["g"], k=k)
        got = {r["g"]: r["kmv_hashes"] for r in merged.collect()}
        want = {r["g"]: r["kmv_hashes"] for r in direct.collect()}
        assert got == want

    def test_merge_dedups_shared_values(self, spark):
        """A value present in BOTH parts must count once (same hash,
        deduped in the merge)."""
        from impuls_spark.llm import kmv_estimate, kmv_merge, kmv_sketch

        a = spark.createDataFrame(
            [("g", f"v{i}") for i in range(6)], ["g", "v"]
        )
        b = spark.createDataFrame(
            [("g", f"v{i}") for i in range(3, 9)], ["g", "v"]
        )
        merged = kmv_merge(
            [kmv_sketch(p, "v", ["g"], k=64) for p in (a, b)], ["g"], k=64
        )
        row = kmv_estimate(merged, ["g"], k=64).collect()[0]
        assert row.n_kept == 9 and row.est_ndv == 9  # v0..v8

    def test_estimate_of_sketch_equals_distinct(self, spark):
        from impuls_spark.llm import kmv_estimate, kmv_sketch

        _, _, whole = self._parts(spark, n=400)
        k = 16
        via_sketch = {
            r["g"]: (r.n_kept, r.kth_hash, r.est_ndv)
            for r in kmv_estimate(
                kmv_sketch(whole, "v", ["g"], k=k), ["g"], k=k
            ).collect()
        }
        direct = {
            r["g"]: (r.n_kept, r.kth_hash, r.est_ndv)
            for r in kmv_distinct(whole, "v", ["g"], k=k).collect()
        }
        assert via_sketch == direct

    def test_jaccard_exact_below_k(self, spark):
        """Both groups under k distinct values: the sketches ARE the
        sets, so the estimate is the exact Jaccard."""
        from impuls_spark.llm import kmv_jaccard, kmv_sketch

        rows = (
            [("a", f"v{i}") for i in range(10)]          # a: v0..v9
            + [("b", f"v{i}") for i in range(5, 20)]     # b: v5..v19
            + [("c", "zz")]                              # c: disjoint
        )
        df = spark.createDataFrame(rows, ["g", "v"])
        sk = kmv_sketch(df, "v", ["g"], k=64)
        out = {
            (r["g_a"], r["g_b"]): (r["n_common"], r["n_union_min"],
                                   r["jaccard_est"])
            for r in kmv_jaccard(sk, ["g"], k=64).collect()
        }
        assert out[("a", "b")] == (5, 20, 0.25)   # |{v5..v9}| / |{v0..v19}|
        assert out[("a", "c")] == (0, 11, 0.0)
        assert out[("b", "c")] == (0, 16, 0.0)
        assert len(out) == 3  # unordered pairs once

    def test_jaccard_estimator_brute_force(self, spark):
        """Above k the estimate is the intersection-mark count over the
        union's k minima — recomputed here from raw hashes."""
        from impuls_spark.llm import kmv_jaccard, kmv_sketch

        va = [f"x{i}" for i in range(300)]
        vb = [f"x{i}" for i in range(150, 450)]
        df = spark.createDataFrame(
            [("a", v) for v in va] + [("b", v) for v in vb], ["g", "v"]
        )
        k = 24
        got = kmv_jaccard(
            kmv_sketch(df, "v", ["g"], k=k), ["g"], k=k
        ).collect()[0]
        ha = sorted(_h("kmv", v) for v in set(va))[:k]
        hb = sorted(_h("kmv", v) for v in set(vb))[:k]
        union_min = sorted(set(ha) | set(hb))[:k]
        n_common = sum(1 for h in union_min if h in set(ha) and h in set(hb))
        assert got["n_common"] == n_common
        assert got["n_union_min"] == k
        assert got["jaccard_est"] == n_common / k
        # sanity: true Jaccard is 150/450 = 1/3; estimate in ballpark
        assert 0.1 <= got["jaccard_est"] <= 0.6

    def test_estimator_accuracy_vs_ground_truth(self, spark):
        """VERDICT r8 item 8: the DuckDB oracle proves engine parity,
        not statistical validity (it re-implements the same formula).
        Here est_ndv is checked against TRUE cardinalities: 20 groups
        of 5000 distinct values each at k=64 must estimate within the
        published KMV relative-error envelope (stderr ~ 1/sqrt(k-2) ~
        0.127): every group within 4 sigma, and the mean |rel err|
        under 2/sqrt(k) — md5 draws are fixed, so this is a
        deterministic regression pin of estimator health."""
        import math

        k, n_true, n_groups = 64, 5000, 20
        rows = [
            (f"g{g}", f"g{g}:v{i}")
            for g in range(n_groups) for i in range(n_true)
        ]
        df = spark.createDataFrame(rows, ["g", "v"])
        got = kmv_distinct(df, "v", ["g"], k=k).collect()
        assert len(got) == n_groups
        rel = [abs(r["est_ndv"] - n_true) / n_true for r in got]
        sigma = 1.0 / math.sqrt(k - 2)
        assert max(rel) <= 4 * sigma, (max(rel), 4 * sigma)
        assert sum(rel) / len(rel) <= 2 / math.sqrt(k)

    def test_jaccard_accuracy_vs_ground_truth(self, spark):
        """kmv_jaccard against TRUE Jaccard on constructed overlaps:
        three pairs with J = 1/3, 3/5 and 0 (disjoint), k=64; each
        estimate within 2/sqrt(k) = 0.25 of truth (and the disjoint
        pair exactly 0 — disjoint sets cannot share union minima)."""
        import math

        from impuls_spark.llm import kmv_jaccard, kmv_sketch

        k = 64
        # a/b: |∩|=300, |∪|=900 -> J=1/3 ; a/c: |∩|=600, |∪|=1000 -> 0.6
        va = [f"x{i}" for i in range(600)]
        vb = [f"x{i}" for i in range(300, 900)]   # 300..599 shared with a
        vc = [f"x{i}" for i in range(400)] + [f"y{i}" for i in range(200)]
        vd = [f"z{i}" for i in range(500)]        # disjoint from all
        df = spark.createDataFrame(
            [("a", v) for v in va] + [("b", v) for v in vb]
            + [("c", v) for v in vc] + [("d", v) for v in vd],
            ["g", "v"],
        )
        est = {
            (r["g_a"], r["g_b"]): r["jaccard_est"]
            for r in kmv_jaccard(
                kmv_sketch(df, "v", ["g"], k=k), ["g"], k=k
            ).collect()
        }
        tol = 2 / math.sqrt(k)
        truth = {
            ("a", "b"): 300 / 900,
            ("a", "c"): len(set(va) & set(vc)) / len(set(va) | set(vc)),
            ("a", "d"): 0.0, ("b", "d"): 0.0, ("c", "d"): 0.0,
        }
        for pair, j_true in truth.items():
            assert abs(est[pair] - j_true) <= tol, (pair, est[pair], j_true)
        assert est[("a", "d")] == est[("b", "d")] == est[("c", "d")] == 0.0

    def test_merge_is_associative_and_idempotent(self, spark):
        from impuls_spark.llm import kmv_merge, kmv_sketch

        a, b, whole = self._parts(spark, n=200)
        k = 8
        sa, sb = (kmv_sketch(p, "v", ["g"], k=k) for p in (a, b))
        ab = kmv_merge([sa, sb], ["g"], k=k)
        again = kmv_merge([ab, sb], ["g"], k=k)  # remerging b: no-op
        assert {tuple(r["kmv_hashes"]) for r in ab.collect()} == {
            tuple(r["kmv_hashes"]) for r in again.collect()
        }
        with pytest.raises(ValueError):
            kmv_merge([], ["g"], k=k)


class TestEditVerifiedPairs:
    def test_verifies_and_rejects(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "the quick brown fox jumps over the lazy cat"),
                (3, "completely unrelated content that shares nothing"),
            ],
            ["doc_id", "text"],
        )
        pairs = spark.createDataFrame(
            [(1, 2), (1, 3)], ["id_a", "id_b"]
        )
        out = {r.id_b: r for r in edit_verified_pairs(
            pairs, docs, min_sim=0.8
        ).collect()}
        assert set(out) == {2}  # (1,3) fails verification
        assert out[2].edit_dist == 3  # dog -> cat
        assert out[2].edit_sim == round(1 - 3 / 43, 6)

    def test_left_rows_only_candidates(self, spark):
        """Only candidate pairs are scored — no pair invention."""
        docs = spark.createDataFrame(
            [(1, "aaaa"), (2, "aaaa"), (3, "aaab")],
            ["doc_id", "text"],
        )
        pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
        out = edit_verified_pairs(pairs, docs, min_sim=0.5).collect()
        assert [(r.id_a, r.id_b, r.edit_dist) for r in out] == [(1, 2, 0)]

    def test_empty_text_guard(self, spark):
        docs = spark.createDataFrame(
            [(1, ""), (2, "")], ["doc_id", "text"]
        )
        pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
        out = edit_verified_pairs(pairs, docs, min_sim=0.9).collect()
        assert len(out) == 1 and out[0].edit_sim == 1.0


class TestKeepBestPerCluster:
    def test_picks_best_quality_with_id_tiebreak(self, spark):
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)],
            ["doc_id", "cluster_id"],
        )
        scored = spark.createDataFrame(
            [(1, 0.5), (2, 0.9), (3, 0.9), (7, 0.2), (9, 0.2)],
            ["doc_id", "quality_score"],
        )
        out = {r.cluster_id: r for r in keep_best_per_cluster(
            clusters, scored
        ).collect()}
        assert out[1].kept_id == 2  # best score, smallest id wins the tie
        assert out[1].kept_score == 0.9 and out[1].n_members == 3
        assert out[7].kept_id == 7 and out[7].n_members == 2

    def test_plan_has_no_window(self, spark):
        clusters = spark.createDataFrame([(1, 1)], ["doc_id", "cluster_id"])
        scored = spark.createDataFrame([(1, 0.5)], ["doc_id", "quality_score"])
        plan = keep_best_per_cluster(clusters, scored)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan


class TestNormalizeScores:
    def test_zscore_and_degenerate_group(self, spark):
        from impuls_spark.llm import normalize_scores

        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0),
             (4, "b", 5.0), (5, "b", 5.0)],
            ["doc_id", "g", "score"],
        )
        out = {r.doc_id: r.score_norm for r in
               normalize_scores(df, "score", ["g"]).collect()}
        assert out[1] == -1.0 and out[2] == 0.0 and out[3] == 1.0
        # zero-variance group -> 0.0, not null/error
        assert out[4] == 0.0 and out[5] == 0.0

    def test_minmax(self, spark):
        from impuls_spark.llm import normalize_scores

        df = spark.createDataFrame(
            [(1, "a", 2.0), (2, "a", 4.0), (3, "a", 6.0)],
            ["doc_id", "g", "score"],
        )
        out = {r.doc_id: r.score_norm for r in
               normalize_scores(df, "score", ["g"], method="minmax").collect()}
        assert out == {1: 0.0, 2: 0.5, 3: 1.0}

    def test_bad_method(self, spark):
        from impuls_spark.llm import normalize_scores

        df = spark.createDataFrame([(1, "a", 1.0)], ["doc_id", "g", "score"])
        with pytest.raises(ValueError):
            normalize_scores(df, "score", ["g"], method="rank")


class TestQuantileFilter:
    def test_keeps_top_share_per_group(self, spark):
        from impuls_spark.llm import quantile_filter

        rows = [(i, "a", float(i)) for i in range(1, 11)]
        rows += [(100 + i, "b", float(-i)) for i in range(1, 5)]
        df = spark.createDataFrame(rows, ["doc_id", "g", "score"])
        out = quantile_filter(df, "score", ["g"], q=0.5)
        got = sorted((r.doc_id, r.threshold) for r in out.collect())
        # group a: median 5.5 -> keep 6..10; group b: median -2.5 -> keep -1,-2
        assert [d for d, _ in got] == [6, 7, 8, 9, 10, 101, 102]
        assert got[0][1] == 5.5

    def test_keep_below(self, spark):
        from impuls_spark.llm import quantile_filter

        df = spark.createDataFrame(
            [(i, "a", float(i)) for i in range(1, 5)], ["doc_id", "g", "score"]
        )
        out = quantile_filter(df, "score", ["g"], q=0.5, keep="below")
        assert sorted(r.doc_id for r in out.collect()) == [1, 2]
