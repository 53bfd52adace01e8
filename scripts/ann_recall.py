"""Recall@k instrument for the ANN estate (VERDICT r13 item 4).

The IVF/IVF-PQ oracles prove DETERMINISM (the DuckDB twin re-implements
the same routing) and the toy pytest proves monotonicity in n_probe;
nothing tracked recall-vs-brute-force at the scale-curve sfs across
lifecycle states — the quality axis a training-data pipeline actually
cares about, and one that can degrade silently while every value hash
still matches. This measures recall@10 against
``brute_force_topk`` (impuls_spark/llm/similarity.py) for:

- the graded search configurations: d12's IVF (4 anchors; n_probe 1
  and 2), d43's IVF-PQ asymmetric search, d55's exact-refined IVF-PQ —
  same anchors/queries laws as the showcase queries, k raised to 10;
- the index LIFECYCLE states a serving pipeline walks: post-build,
  post-append, post-retrain (each vs brute force over its own corpus),
  plus drifted-append/retrain twins (d70's +5.0 shift) as tracked-only
  rows. The instrument already paid for itself while being built: its
  first run exposed the AnnIndex.topk m-derivation bug (an index built
  with non-default m searched with m=4 query slicing — post_build
  recall 0.30 -> 0.015 with every value-hash oracle green), fixed in
  ivfpq_topk the same round.

Writes RECALL.json: {"k": 10, "dirs": {dir: {row: {"n_queries": n,
"mean_recall": r}}}}. Floors + the structural invariants (n_probe
monotonicity, refined >= plain, index==direct equivalence) are
asserted in tests/test_ann_recall.py so regressions fail in pytest.

Run: python scripts/ann_recall.py [--dirs a,b,...] [--k 10] [--out ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

DEFAULT_DIRS = [
    "/root/testdata/sf0.1",
    os.path.join(REPO, ".scale/sf0.1g"),
    os.path.join(REPO, ".scale/sf1"),
]


def measure_dir(spark, sf_dir: str, k: int) -> dict:
    from impuls_spark.llm import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    anchors = emb.filter(F.col("vec_id") < 4)
    queries = emb.filter(F.col("vec_id") < 20)
    exact = sim.brute_force_topk(emb, queries, k=k).persist()
    exact.count()

    def recall(approx) -> dict:
        t0 = time.time()
        row = sim.recall_at_k(approx, exact, k=k).collect()[0]
        return {
            "n_queries": row["n_queries"],
            "mean_recall": row["mean_recall"],
            "sec": round(time.time() - t0, 2),
        }

    out = {
        # d12's config (k raised to 10): coarse-quantizer routing only
        "ivf_np1": recall(sim.ivf_topk(emb, queries, anchors, k=k,
                                       n_probe=1)),
        "ivf_np2": recall(sim.ivf_topk(emb, queries, anchors, k=k,
                                       n_probe=2)),
        # d43: asymmetric-distance IVF-PQ
        "ivfpq_np2": recall(sim.ivfpq_topk(emb, queries, anchors, dim=64,
                                           k=k, n_probe=2)),
        # d55: PQ retrieve (k*rerank) + exact re-rank
        "ivfpq_refined": recall(sim.ivfpq_topk_refined(
            emb, queries, anchors, dim=64, k=k, rerank=3, n_probe=2)),
    }

    # the r14 capacity law (similarity.ann_capacity / build_auto):
    # trained Lloyd anchors + corpus-sized codebooks + scaled n_probe,
    # searched under the plan's own defaults — the configuration the
    # fixed-capacity rows above exist to indict. The plan itself rides
    # along (leading "_" = not a recall row).
    idx_auto = sim.AnnIndex.build_auto(emb, dim=64)
    out["_capacity_plan"] = dict(idx_auto.capacity._asdict())
    out["ivfpq_auto"] = recall(idx_auto.topk(queries, k=k))
    out["ivfpq_auto_refined"] = recall(idx_auto.topk_refined(queries, k=k))
    exact.unpersist()

    # lifecycle: build on the even half (richer m=8/pq_k=16 codebook so
    # the recall levels sit well off the floor and a regression is
    # visible), append the odd half, retrain — each state vs brute
    # force over ITS OWN corpus. These rows are the instrument's point:
    # e.g. the r14 m-derivation bug (AnnIndex.topk searching an m=8
    # model with m=4 query slicing) showed here as post_build 0.30 ->
    # 0.015 while every value-hash oracle stayed green.
    day0 = emb.filter(F.col("vec_id") % 2 == 0)
    day1 = emb.filter(F.col("vec_id") % 2 == 1)
    q0 = day0.filter(F.col("vec_id") < 40)

    def lrecall(approx, truth) -> dict:
        row = sim.recall_at_k(approx, truth, k=k).collect()[0]
        return {"n_queries": row["n_queries"],
                "mean_recall": row["mean_recall"]}

    idx = sim.AnnIndex.build(day0, anchors, dim=64, m=8, pq_k=16)
    pre = sim.brute_force_topk(day0, q0, k=k).persist()
    pre.count()
    out["lifecycle_post_build"] = lrecall(
        idx.topk(q0, k=k, n_probe=2), pre)
    pre.unpersist()

    exact_full = sim.brute_force_topk(emb, queries, k=k).persist()
    exact_full.count()
    appended = idx.append(day1)
    out["lifecycle_post_append"] = lrecall(
        appended.topk(queries, k=k, n_probe=2), exact_full)
    retrained = appended.retrain()
    out["lifecycle_post_retrain"] = lrecall(
        retrained.topk(queries, k=k, n_probe=2), exact_full)

    # the capacity lifecycle: build_auto on day0, append day1 (plan
    # carried stale — documented drift), retrain(capacity="auto")
    # re-derives the whole configuration from the doubled corpus
    idxa = sim.AnnIndex.build_auto(day0, dim=64)
    pre_a = sim.brute_force_topk(day0, q0, k=k).persist()
    pre_a.count()
    out["lifecycle_auto_post_build"] = lrecall(idxa.topk(q0, k=k), pre_a)
    pre_a.unpersist()
    ap_a = idxa.append(day1)
    out["lifecycle_auto_post_append"] = lrecall(
        ap_a.topk(queries, k=k), exact_full)
    rt_a = ap_a.retrain(capacity="auto")
    out["lifecycle_auto_post_retrain"] = lrecall(
        rt_a.topk(queries, k=k), exact_full)
    out["lifecycle_auto_post_retrain_refined"] = lrecall(
        rt_a.topk_refined(queries, k=k), exact_full)
    exact_full.unpersist()

    # drift rows (d70's +5.0 shift on the appended half), measured on
    # UNDRIFTED queries vs union truth — TRACKED, not floor-asserted:
    # the synthetic embeddings are near-orthogonal with no cluster
    # structure, so the stale-codebook aliasing pathology these rows
    # would catch on real embeddings barely moves them here (measured
    # r14: 0.315 -> 0.315 -> 0.27); they exist so a future distribution
    # change or quantizer bug has somewhere to show up.
    drifted = day1.select(
        "vec_id",
        F.transform("embedding", lambda x: x + F.lit(5.0)).alias(
            "embedding"),
    )
    union_d = day0.unionByName(drifted)
    exact_d = sim.brute_force_topk(union_d, q0, k=k).persist()
    exact_d.count()
    ap_d = idx.append(drifted)
    out["lifecycle_post_append_drift"] = lrecall(
        ap_d.topk(q0, k=k, n_probe=2), exact_d)
    out["lifecycle_post_retrain_drift"] = lrecall(
        ap_d.retrain().topk(q0, k=k, n_probe=2), exact_d)
    exact_d.unpersist()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", default=",".join(DEFAULT_DIRS))
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(REPO, "RECALL.json"))
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = {"k": args.k, "dirs": {}}
    for d in [s for s in args.dirs.split(",") if s.strip()]:
        t0 = time.time()
        out["dirs"][d] = measure_dir(spark, d, args.k)
        print(f"# {d}: {round(time.time() - t0, 1)}s "
              f"{json.dumps(out['dirs'][d])}", file=sys.stderr)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
