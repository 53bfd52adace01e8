"""ANN index lifecycle: build once, persist, serve many — the shape a
production similarity service actually runs, composed from
``impuls_spark.llm.similarity``:

1. **build** — IVF cell routing (coarse quantizer) + PQ codes and
   codebooks (:class:`AnnIndex.build`): one Lloyd loop over all PQ
   subspaces, |D| x k routing, all DataFrame-native;
2. **save** — the artifacts land as parquet under ``--index`` with a
   manifest (dim, column names, with_pq), so any later session — or
   another cluster — reloads them instead of re-training
   (:meth:`AnnIndex.save` / :meth:`AnnIndex.load`);
3. **serve** — the loaded handle answers three query families off the
   SAME routing computation (``persist()`` pins it): approximate
   top-k (ADC scoring, never raw candidate vectors), exact-re-ranked
   top-k (FAISS refine shape), and SemDeDup semantic dedup in both
   keep policies (min-id and the paper's centroid-far).

At 100 TB the division of labor matters: build is the expensive,
once-per-corpus job; serve touches m-byte PQ codes and broadcast
ADC tables only. This example runs the whole cycle at sf0.001.

Run:

    python -m examples.ann_serving --in /root/testdata/sf0.001 \\
        --index /tmp/ann_index [--k 3] [--dim 64]
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from impuls_spark.llm.similarity import AnnIndex


def build_and_save(spark: SparkSession, in_dir: str, index_dir: str,
                   dim: int = 64) -> AnnIndex:
    emb = spark.read.parquet(os.path.join(in_dir, "embeddings.parquet"))
    anchors = emb.filter(F.col("vec_id") < 4)
    return AnnIndex.build(emb, anchors, dim=dim).save(index_dir)


def serve(spark: SparkSession, in_dir: str, index_dir: str,
          k: int = 3) -> dict:
    emb = spark.read.parquet(os.path.join(in_dir, "embeddings.parquet"))
    anchors = emb.filter(F.col("vec_id") < 4)
    queries = emb.filter(F.col("vec_id") < 6)

    idx = AnnIndex.load(spark, index_dir, emb, anchors).persist()
    try:
        approx = idx.topk(queries, k=k)
        exact = idx.topk_refined(queries, k=k, rerank=3)
        dedup_id = idx.semantic_dedup(threshold=0.35)
        dedup_far = idx.semantic_dedup(threshold=0.35, keep="centroid_far")
        return {
            "n_vectors": emb.count(),
            "approx_rows": approx.count(),
            "refined_rows": exact.count(),
            "dups_min_id": dedup_id.filter(
                F.col("dup_of").isNotNull()).count(),
            "dups_centroid_far": dedup_far.filter(
                F.col("dup_of").isNotNull()).count(),
        }
    finally:
        idx.unpersist()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_dir", default="/root/testdata/sf0.001")
    ap.add_argument("--index", default="/tmp/ann_index")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_and_save(spark, args.in_dir, args.index, dim=args.dim)
    stats = serve(spark, args.in_dir, args.index, k=args.k)
    print(stats)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
