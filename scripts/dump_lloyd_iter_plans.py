"""Capture the PER-ITERATION physical plans of the eager Lloyd loops
(kmeans_fit / pq_train) — the loops run eagerly during query
construction, so the declared query's final ``explain`` cannot show
the iteration shape that r15 changed (fused min_by assignment, point
persist). Monkeypatching ``DataFrame.localCheckpoint`` records each
checkpointed frame's formatted plan right before materialization —
works unmodified on any revision, so the same script dumps the before
(worktree at the prior commit) and after (HEAD) evidence.

Usage: python scripts/dump_lloyd_iter_plans.py <tag> [out_dir]
Writes <out_dir>/d37_kmeans_iter<N>_<tag>.txt and
       <out_dir>/d42_pq_iter<N>_<tag>.txt
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1]
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dump_lloyd_iter_plans")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Spark 4 dispatches pyspark.sql.DataFrame to the concrete
    # classic/connect class — patch the class the session actually
    # instantiates, or the override is shadowed by the subclass method
    target_cls = type(spark.range(1))
    captured: list[str] = []
    orig = target_cls.localCheckpoint

    def recording(self, eager=True):
        buf = io.StringIO()
        with redirect_stdout(buf):
            self.explain("formatted")
        captured.append(buf.getvalue())
        return orig(self, eager)

    target_cls.localCheckpoint = recording
    try:
        from impuls_spark.llm import similarity

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

        captured.clear()
        similarity.kmeans_fit(emb, k=8, n_iter=3)
        for i, plan in enumerate(captured):
            p = os.path.join(out_dir, f"d37_kmeans_iter{i}_{tag}.txt")
            with open(p, "w") as fh:
                fh.write(plan)
            print(f"wrote {p}")

        captured.clear()
        similarity.pq_train(emb, dim=64, m=4, k=4, n_iter=2)
        for i, plan in enumerate(captured):
            p = os.path.join(out_dir, f"d42_pq_iter{i}_{tag}.txt")
            with open(p, "w") as fh:
                fh.write(plan)
            print(f"wrote {p}")
    finally:
        target_cls.localCheckpoint = orig
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
