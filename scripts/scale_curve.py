"""Empirical scaling slope for the heavy dedup/ANN tail (VERDICT r5
item 2).

For each given data dir (same generator law, different scale — see
``gen_scale.py``), runs the heavy-tail queries in one Spark session,
PASSES times over, and keeps the per-query minimum of the non-first
passes (pass 1 absorbs JVM/codegen/broadcast warmup, which at sf0.1
otherwise dominates and flattens the slope). Prints one JSON line:

    {"dirs": [...], "queries": {q: {dir: sec}}, "slope": {q: ratio}}

``slope`` is t(last dir) / t(first dir) — at a 10x row factor, a
~linear operator lands near 10, sub-linear below.

Usage: python scripts/scale_curve.py DIR1 DIR2 [--passes 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "d10_fingerprints", "d18_decontaminate",  # shingle-cache warmers
    "d32_repetition", "d36_block_dedup", "d41_duplicate_spans",
    "d37_kmeans", "d42_pq_codes", "d43_ivfpq_topk",
    "d55_ivfpq_refined", "d56_semantic_dedup",
    "d57_semdedup_centroid_far",  # r7: shares d56's cells + k-scaling
    "d58_kmv_distinct", "d59_edit_linkage", "d60_keep_best_cluster",
    "q27_asof_enrich", "q28_time_bucket_rollup", "q29_range_count",
    "q30_rolling_features", "q31_range_agg", "q32_asof_nearest",
    "s08_sliding_counts", "d61_score_normalize", "d62_quantile_filter",
    "d02_ngram_jaccard", "d03_minhash_lsh", "d14_dup_clusters",
    "d35_incremental_dedup",
    # r8 members: sketch merge/jaccard + the streaming-sketch twin +
    # the reshaped q17/d52 rank paths
    "d63_kmv_merge", "d64_kmv_jaccard", "s09_stream_kmv",
    "q17_line_number_ids", "d52_training_order",
    # r9 members: the r8 additions that missed the curve (d65 resize,
    # d66 keep-first block dedup) + the persisted dedup-index chain
    "d65_media_resize", "d66_segment_dedup_first",
    "d67_dedup_index_ingest", "d68_ann_index_append",
    # r10 members: the takedown + retrain chains
    "d69_dedup_index_takedown", "d70_ann_index_retrain",
    # r11 members: the shard/corpus takedown chains (cost law: affected
    # partitions x rewrite, never a corpus pass — the slope is the proof)
    "d71_shard_takedown", "d72_corpus_takedown",
    # r11 late addition: streaming ANN ingest's batch twin (cost law:
    # |batch| x k broadcast assignment + one column-pruned anti-join)
    "s10_ann_stream_ingest",
    # r12 member: the composed streaming-vector takedown (cost law:
    # absorb = one keyed fold over flat+epochs; purge = broadcast
    # anti-join; both write-job-bound, never an extra corpus pass)
    "d73_vector_stream_takedown",
    # r13 member: the over-cap backfill classify (cost law: clone the
    # pristine index + classify = multi-span-pruned scan + broadcast
    # semi-joins over a 3x|corpus| batch — linear in corpus, never
    # pairwise; the batch exceeds PROBE_PUSHDOWN_MAX at every sf, so
    # the slope is the r14 chunked-span path's evidence)
    "d74_backfill_span_classify",
    "d26_containment",  # d26 last (mem shadow)
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--queries", default=None,
                    help="comma-separated HEAVY subset (new/changed "
                         "members), order preserved from HEAVY")
    args = ap.parse_args()
    if args.queries:
        want = {s.strip() for s in args.queries.split(",") if s.strip()}
        unknown = want - set(HEAVY)
        if unknown:
            print(f"# not in HEAVY, ignored: {sorted(unknown)}",
                  file=sys.stderr)
        HEAVY[:] = [q for q in HEAVY if q in want]

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()

    def reset_session_caches() -> None:
        # the showcase shares persisted frames (shingles, PQ model,
        # overlap parts) across queries within a session; clearing them
        # between passes makes every pass behave like a fresh bench run
        # instead of timing cache reads on passes 2+
        from impuls_spark.showcase import llm as showcase_llm

        cache = showcase_llm._session_cache(spark)
        for v in cache.values():
            for df in (v if isinstance(v, tuple) else (v,)):
                try:
                    df.unpersist()
                except Exception:
                    pass
        cache.clear()

    times: dict[str, dict[str, float]] = {q: {} for q in HEAVY}
    for d in args.dirs:
        for p in range(args.passes):
            reset_session_caches()
            for q in HEAVY:
                t0 = time.time()
                qs[q](spark, d).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                if p > 0:  # pass 1 is warmup
                    times[q][d] = round(min(times[q].get(d, 1e9), dt), 3)
                print(f"# pass {p + 1} {os.path.basename(d)} {q} "
                      f"{dt:.2f}s", file=sys.stderr)

    first, last = args.dirs[0], args.dirs[-1]
    slope = {
        q: round(times[q][last] / times[q][first], 2)
        for q in HEAVY if times[q].get(first, 0) > 0
    }
    out = {"dirs": args.dirs, "passes": args.passes,
           "queries": times, "slope": slope}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
