"""Continuous corpus ingest with dedup — the full write path of a
crawled training corpus, composed from pieces this package already
oracle-gates:

- per micro-batch, arriving documents are classified against the
  ACCEPTED corpus with :func:`impuls_spark.llm.incremental_dedup`
  (``exact`` / ``near`` / ``novel`` — semi-joins against maintained
  hash and MinHash-band index tables, never a rescan of accepted
  text), after an in-batch exact dedup (first id wins);
- only ``novel`` documents land, through the idempotent epoch-
  partitioned corpus writer (:mod:`.sinks`), so a replayed epoch
  re-classifies against the same index state and overwrites its own
  output — no duplicates under at-least-once delivery;
- the index tables themselves live as epoch-partitioned parquet
  sidecars under ``<corpus>/_index/{hashes,bands}`` and are updated
  with the same dynamic-overwrite trick, so index maintenance is
  exactly-once too, and the next batch (or the next run) reads them
  back without restarting anything.

At scale this is the shape d35's docstring promises: the corpus side
of every membership test is a maintained table (~32 B/doc hashes,
n_bands rows/doc band keys), the classification is semi-join-only
(a viral band bucket costs k rows, not k²), and the foreachBatch
boundary is what lets the whole thing stay BATCH semantics per epoch —
no stream-stream joins, no unbounded streaming state.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm.dedup import (
    BAND_SCHEMA,
    HASH_SCHEMA,
    _band_keys,
    incremental_dedup,
    minhash_signatures,
)
from ..sources.corpus import write_corpus
from .sinks import EPOCH_COL


def _read_or_empty(
    spark: SparkSession, path: str, schema: str, current_epoch: int
) -> DataFrame:
    """Read an index sidecar, EXCLUDING the current epoch's partition:
    on a crash-replay the epoch's own partial index writes are already
    on disk, and classifying the replayed batch against them would mark
    its documents 'exact' and shrink the epoch's output — the replay
    must see exactly the pre-epoch index state.

    Only missing-or-empty index state maps to an empty frame. Any
    OTHER read failure — corrupt files, permissions, filesystem
    errors — fails the batch loudly: silently classifying against an
    empty index would mark everything 'novel' and permanently land
    duplicates in the corpus (ADVICE r6).

    The read passes an EXPLICIT schema (r8 flake root-cause): an index
    tree whose only landed epoch is EMPTY — a crawl lull, or an
    all-duplicate first micro-batch, which dynamic overwrite records
    as a directory with no parquet files — makes schema INFERENCE
    throw UNABLE_TO_INFER_SCHEMA on every subsequent batch, wedging
    ingest permanently. With the schema supplied, empty trees read as
    empty frames, and genuinely corrupt files still fail the batch
    loudly when the scan executes."""
    full = f"{schema}, {EPOCH_COL} int"
    try:
        df = spark.read.schema(full).parquet(path)
    except AnalysisException as exc:
        cond = ""
        for attr in ("getCondition", "getErrorClass"):
            try:
                cond = getattr(exc, attr)() or ""
                break
            except Exception:
                continue
        if "PATH_NOT_FOUND" in cond or "Path does not exist" in str(exc):
            return spark.createDataFrame([], schema)
        raise
    return df.filter(F.col(EPOCH_COL) != current_epoch).drop(EPOCH_COL)


def _read_manifest(spark: SparkSession, path: str) -> "dict | None":
    """The banding-parameter manifest row at ``path``, or None when no
    manifest has been written (pre-r10 corpora; first start)."""
    import json

    try:
        rows = spark.read.schema("manifest string").parquet(path).collect()
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return None
        raise
    if not rows:
        return None
    return json.loads(rows[0]["manifest"])


def ingest_with_dedup(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 6,
    band_size: int = 2,
    shingle_n: int = 3,
    partition_by=("lang",),
    compact_every: "int | None" = None,
    compact_target_shards: int = 1,
):
    """Start the classify-and-ingest query; returns the StreamingQuery.

    Accepted (novel) documents land under ``path`` (epoch-partitioned,
    idempotent); the hash/band index tables under ``path/_index``.
    Batch-twin note: one epoch of this sink IS
    ``incremental_dedup(batch, ...)`` followed by the corpus write —
    the classification semantics are oracle-gated as d35.

    ``compact_every=N`` folds the accumulated epoch directories (and
    the index sidecars) every N epochs via
    :func:`impuls_spark.streaming.compact.compact_corpus`, bounding
    the small-file growth of a long-running ingest. Only epochs
    STRICTLY BELOW the current one are folded — the current epoch is
    the one that can replay after a crash, and a replay rewrites its
    ``__epoch`` directory wholesale; every earlier epoch has a commit
    marker by the time this batch runs, so folding them is safe.
    """
    hashes_path = f"{path}/_index/hashes"
    bands_path = f"{path}/_index/bands"

    # Pin the banding parameters in the SAME manifest row
    # ``DedupIndex.build`` writes (VERDICT r9 item 2): batch consumers
    # (``DedupIndex.from_stream_index``) validate against it instead of
    # trusting caller-supplied kwargs, and a RESTART of this query with
    # different parameters fails here instead of silently splitting the
    # index across two incompatible bandings (old bands never collide
    # with new signatures — recall degrades with no error anywhere).
    meta = {
        "text_col": text_col, "id_col": id_col, "n_hashes": n_hashes,
        "band_size": band_size, "shingle_n": shingle_n,
    }
    spark = stream.sparkSession
    manifest_path = f"{path}/_index/manifest"
    existing = _read_manifest(spark, manifest_path)
    if existing is None:
        import json

        spark.createDataFrame(
            [(json.dumps(meta),)], "manifest string"
        ).coalesce(1).write.mode("overwrite").parquet(manifest_path)
    elif existing != meta:
        raise ValueError(
            f"index sidecars at {path}/_index were built with "
            f"{existing}; restarting ingest with {meta} would split "
            "the index across incompatible bandings — pass the "
            "original parameters, or rebuild the corpus index"
        )

    def _ingest(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        # in-batch exact dedup (first id wins), then classify vs corpus
        w_first = batch.groupBy(F.md5(F.col(text_col)).alias("__h")).agg(
            F.min(id_col).alias(id_col)
        )
        # the semi-join collapses distinct ids sharing a text; the
        # dropDuplicates collapses replayed rows sharing an id (at-
        # least-once delivery can repeat a row INSIDE one micro-batch,
        # and both copies would otherwise pass the semi-join; ADVICE r6)
        uniq = batch.join(
            w_first.select(id_col), id_col, "left_semi"
        ).dropDuplicates([id_col])
        corpus_hashes = _read_or_empty(
            spark, hashes_path, HASH_SCHEMA, int(epoch_id))
        corpus_bands = _read_or_empty(
            spark, bands_path, BAND_SCHEMA, int(epoch_id))
        status = incremental_dedup(
            uniq, corpus_df=None, text_col=text_col, id_col=id_col,
            n_hashes=n_hashes, band_size=band_size, shingle_n=shingle_n,
            corpus_hashes=corpus_hashes, corpus_bands=corpus_bands,
        )
        novel = uniq.join(
            status.filter(F.col("status") == "novel").select(id_col),
            id_col, "left_semi",
        ).localCheckpoint(eager=True)  # classify ONCE; feeds 3 writes

        write_corpus(
            novel.withColumn(EPOCH_COL, F.lit(int(epoch_id))), path,
            partition_by=(EPOCH_COL, *partition_by), sort_by=(id_col,),
            mode="overwrite", dynamic_overwrite=True,
        )
        new_hashes = novel.select(
            F.md5(F.col(text_col)).alias("__h")
        ).distinct().withColumn(EPOCH_COL, F.lit(int(epoch_id)))
        new_bands = (
            _band_keys(
                minhash_signatures(novel, text_col, id_col, n_hashes,
                                   shingle_n),
                id_col, n_hashes, band_size,
            )
            .select("band", "key").distinct()
            .withColumn(EPOCH_COL, F.lit(int(epoch_id)))
        )
        for df, p in ((new_hashes, hashes_path), (new_bands, bands_path)):
            (
                df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(EPOCH_COL)
                .parquet(p)
            )

        if (
            compact_every
            and epoch_id > 0
            and int(epoch_id) % int(compact_every) == 0
        ):
            from .compact import compact_corpus

            compact_corpus(
                spark, path, int(epoch_id) - 1, id_col=id_col,
                partition_by=partition_by, sort_by=(id_col,),
                target_shards=compact_target_shards,
            )

    return (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .start()
    )
