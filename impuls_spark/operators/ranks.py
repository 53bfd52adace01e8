"""Distributed global row numbering — ``row_number() OVER (ORDER BY
...)`` without the single-partition exchange.

A bare global-ordered window plans as ``Exchange SinglePartition`` — a
driver-style bottleneck when the input is row-scale (Merge's unioned
transfers/translations/extra_table_rows; translations alone is
records x languages). The reference only needs deterministic
AUTOINCREMENT-like ids (impuls/model/transfer.py:58-79,
impuls/tasks/merge.py:457-458,517-518,536-537), so the rank itself is
the contract — not the single-threaded plan.

``distributed_row_number`` computes the identical 1-based rank fully in
parallel (the SplitTripLegs offset pattern, generalized):

1. bucket each row by its numeric id's position inside the per-group
   [min, max] span — a DETERMINISTIC, order-preserving function of the
   data (an earlier range-repartition + ``spark_partition_id`` design
   was rejected: Spark re-draws the range sampler per physical subtree,
   so the count pass and the rank pass could disagree near boundaries);
2. ``row_number`` within each (group, bucket) — a partitioned window,
   the single full-data shuffle in the plan;
3. add each bucket's exclusive running total of row counts. The count
   frame has at most groups x ``buckets`` rows — O(config), not
   O(data) — and its prefix sum is HIERARCHICAL
   (:func:`exclusive_prefix_sum`: within-block windows over
   config-bounded partitions + a theta-join over block totals only),
   so the plan contains no data-proportional ``Exchange
   SinglePartition`` and no all-pairs join at any ``buckets`` setting.

Balance: buckets split the id VALUE span evenly, so they are uniform
exactly when ids are near-dense — which AUTOINCREMENT-like surrogate
ids are by construction (``span="group"``); ``span="global"`` string
keys bucket on the 7 bytes AFTER the dataset-wide common prefix, so
agency-/URL-prefixed id spaces stay spread. Residual clustering
degrades toward fewer effective buckets (never wrong, just less
parallel). NULL leading keys rank first (ascending NULLS FIRST).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BKT = "__drn_bkt"
_LO = "__drn_lo"
_W = "__drn_w"
_N = "__drn_n"
_N2 = "__drn_n2"
_K = "__drn_k"
_K2 = "__drn_k2"
_OFF = "__drn_off"

DEFAULT_BUCKETS = 1024


_INTEGRAL_TYPES = ("tinyint", "smallint", "int", "bigint")


def _leading_projection(df: DataFrame, col: str):
    """Order-preserving LONG projection of an integral / date /
    timestamp leading column (strings go through the span-aware hex
    path in :func:`_global_span_row_number`).

    Anything else — double/float/decimal (cast truncates, and ANSI
    mode hard-errors out of long range), boolean, binary, complex —
    raises a descriptive error instead of failing deep in analysis
    with a raw cast message (ADVICE r8)."""
    dtype = dict(df.dtypes)[col]
    if dtype.startswith("timestamp"):
        # cast(ts as long) truncates toward zero (non-monotone across
        # the epoch); unix_micros floors exactly. _ntz columns need the
        # tz-typed cast first (session TZ applies, a constant shift —
        # still order-preserving).
        return F.unix_micros(F.col(col).cast("timestamp"))
    if dtype == "date":
        # days since 1970-01-01; exact and order-preserving.
        return F.unix_date(F.col(col)).cast("long")
    if dtype in _INTEGRAL_TYPES:
        return F.col(col).cast("long")
    raise ValueError(
        f"distributed_row_number: leading order column {col!r} has type "
        f"{dtype}; supported leading types are integral "
        f"({', '.join(_INTEGRAL_TYPES)}), date, timestamp, and (for "
        "span='global') string. Project fractional/decimal keys onto an "
        "integral or string column first."
    )


def _hex_window_long(hex_col, start) -> "F.Column":
    """The 7 bytes of a hex-encoded byte string from (1-based, even)
    position ``start``, read big-endian as a long (left-justified
    zero-padded — 14 hex chars = 56 bits, exact in a long). ``hex()``
    is an order ISOMORPHISM on UTF-8 byte strings (per-nibble chars
    0-9A-F sort like their values, prefixes sort first), so comparing
    these windows compares the strings themselves."""
    return F.conv(
        F.rpad(hex_col.substr(start, F.lit(14)), 14, "0"), 16, 10
    ).cast("long")


def _common_hex_prefix_len(lo, hi) -> "F.Column":
    """Length (even — whole bytes) of the common prefix of two hex
    strings. Every member of a lexicographically ordered set shares
    the common prefix of the set's MIN and MAX (a member diverging
    inside that prefix would sort outside [min, max]), so the 7-byte
    window AFTER it is where keys actually differ — this keeps the
    bucket projection discriminating when every key carries the same
    agency/URL prefix, where a fixed first-7-bytes window would
    collapse all rows into one bucket (r8 fix; prefixed surrogate ids
    are the NORM for this function's callers)."""
    eq = F.zip_with(
        F.split(lo, ""), F.split(hi, ""),
        lambda a, b: F.when(a.eqNullSafe(b), 1).otherwise(0),
    )
    pos = F.array_position(eq, 0)  # first mismatch; 0 = no mismatch
    plen = F.when(pos > 0, pos - 1).otherwise(
        F.least(F.length(lo), F.length(hi))
    )
    return (plen - F.pmod(plen, F.lit(2))).cast("int")


def distributed_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str,
    buckets: int = DEFAULT_BUCKETS,
    span: str = "group",
) -> DataFrame:
    """1-based dense global rank of ``df`` rows under ``ORDER BY
    order_cols``, written to ``out_col`` (long), with no
    data-proportional single-partition stage.

    ``span`` picks how rows are bucketed:

    * ``"group"`` (default): ``order_cols`` must end in a NON-NULL
      NUMERIC column unique within each prefix group (the surrogate-pk
      shape); buckets split each group's [min, max] id span. Requires
      the distinct-prefix frame to be DIMENSION-sized (it is
      broadcast) — Merge's per-feed ``__ix`` shape.
    * ``"global"``: ONE global [min, max] span over an order-preserving
      numeric projection of the LEADING order column (strings: the 7
      bytes AFTER the dataset-wide common prefix, hex-windowed — see
      :func:`_global_span_row_number`; timestamps: ``unix_micros``);
      the remaining order columns only break ties inside a bucket.
      NULL leading keys rank first. Use when
      the leading key is ROW-scale (e.g. per-trip ids) so a per-group
      span frame would not be broadcastable: the span is a one-row
      scalar reduce and the count frame stays O(buckets) regardless of
      key cardinality. Correctness: the bucket id is monotone in the
      leading key, so cross-bucket order is the offset order and
      within-bucket order is the explicit sort — together the exact
      lexicographic rank.

    ``out_col`` may shadow one of the order columns (the rank is
    computed before the overwrite)."""
    if span == "global":
        return _global_span_row_number(df, list(order_cols), out_col, buckets)
    if span != "group":
        raise ValueError(f"span must be group|global, got {span!r}")
    *group_cols, id_col = order_cols

    # per-group id span -> per-row bucket, floor((id - lo) / width)
    # with width = ceil(span / buckets), guaranteeing 0 <= bkt < buckets
    span = df.groupBy(*group_cols).agg(
        F.min(id_col).cast("long").alias(_LO),
        F.ceil(
            (F.max(id_col).cast("long") - F.min(id_col).cast("long") + 1)
            / F.lit(buckets)
        ).alias(_W),
    )
    if group_cols:
        stamped = df.join(F.broadcast(span), list(group_cols))
    else:
        # bare total order (e.g. file line numbering): the span is one
        # global row, attached with an explicit broadcast cross join
        stamped = df.crossJoin(F.broadcast(span))
    stamped = stamped.withColumn(
        _BKT,
        F.floor((F.col(id_col).cast("long") - F.col(_LO)) / F.col(_W)),
    )

    key_cols = [*group_cols, _BKT]
    counts = stamped.groupBy(*key_cols).agg(F.count("*").alias(_N))
    # exclusive prefix sum over the <=groups x buckets count frame —
    # hierarchical (bounded windows + block-total theta-join), so there
    # is no Exchange SinglePartition anywhere AND no O(rows²) join
    offsets = exclusive_prefix_sum(
        counts, group_cols, _BKT, _N, _OFF
    ).select(*key_cols, _OFF)

    w_in = Window.partitionBy(*key_cols).orderBy(id_col)
    return (
        stamped.join(F.broadcast(offsets), key_cols)
        .withColumn(
            out_col,
            (F.row_number().over(w_in) + F.col(_OFF)).cast("long"),
        )
        .drop(_BKT, _LO, _W, _OFF)
    )


def exclusive_prefix_sum(
    counts: DataFrame,
    partition_cols: Sequence[str],
    key_col: str,
    val_col: str,
    out_col: str,
    block: int = 4096,
) -> DataFrame:
    """Exclusive running total of ``val_col`` under the total order
    (``partition_cols`` lexicographic, then numeric ``key_col``), with
    NO data-proportional single-partition stage and NO quadratic join
    (r8 review: the earlier all-pairs broadcast theta-join was
    O(rows²) — 4.3e9 comparisons at a 65 536-row count frame).

    Two levels: a window partitioned by (partitions, key-block) — at
    most ``block`` rows per partition, bounded by CONFIG — computes the
    within-block prefix; block totals (rows/``block`` of them) pay the
    theta-join, now quadratic only in the block count. Keys may be
    negative (pmod floor)."""
    partition_cols = list(partition_cols)
    sb = "__eps_sb"
    kb = (
        (F.col(key_col) - F.pmod(F.col(key_col), F.lit(block)))
        / F.lit(block)
    ).cast("long")
    with_sb = counts.withColumn(sb, kb)
    w_in = (
        Window.partitionBy(*partition_cols, sb)
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum(val_col).over(w_in), F.lit(0))

    tot_key = [*partition_cols, sb]
    totals = with_sb.groupBy(*tot_key).agg(F.sum(val_col).alias("__eps_t"))
    prior = totals.select(
        F.struct(*tot_key).alias(_K2), F.col("__eps_t").alias("__eps_pt")
    )
    block_off = (
        totals.withColumn(_K, F.struct(*tot_key))
        .join(F.broadcast(prior), F.col(_K2) < F.col(_K), "left")
        .groupBy(*tot_key)
        .agg(F.coalesce(F.sum("__eps_pt"), F.lit(0)).alias("__eps_bo"))
    )
    return (
        with_sb.join(F.broadcast(block_off), tot_key)
        .withColumn(out_col, (within + F.col("__eps_bo")).cast("long"))
        .drop(sb, "__eps_bo")
    )


def _bucket_or_null_sentinel(proj):
    """Bucket id from a leading-key projection; NULL keys land in the
    sentinel bucket −1, which sorts before every real bucket — matching
    SQL ascending NULLS FIRST (r8 review: a NULL projection used to
    make the bucket NULL, and the inner equi-join on the bucket then
    silently DROPPED those rows from the rank output).

    Arithmetic runs in DOUBLE space: full-range 64-bit leading keys
    (hash-derived ids spanning ±2^63) overflow ``max - min`` in long —
    an ANSI ARITHMETIC_OVERFLOW on Spark 4, silent wraparound before.
    Double rounding is monotone non-decreasing, so buckets stay
    order-consistent and deterministic; precision loss only blurs
    bucket BOUNDARIES (balance), never ordering."""
    return F.when(proj.isNull(), F.lit(-1).cast("long")).otherwise(
        F.floor((proj.cast("double") - F.col(_LO)) / F.col(_W)).cast("long")
    )


def _global_span_row_number(
    df: DataFrame, order_cols: list, out_col: str, buckets: int
) -> DataFrame:
    """``span="global"`` body: one scalar-reduce span over the leading
    column's projection, then the same count / broadcast-prefix /
    within-bucket-window machinery as the group path. The only
    single-partition exchange in this plan is the one-row span reduce
    (bounded by the partition count, not the data). NULL leading keys
    rank FIRST (ascending NULLS FIRST) via a sentinel bucket.

    String leading keys project through a 7-byte hex window placed
    AFTER the dataset-wide common prefix (computed on the same span
    row from min/max — see :func:`_common_hex_prefix_len`); the
    window's min/max are derived from the span's own min/max by
    monotonicity, so one scan suffices."""
    lead = order_cols[0]
    if dict(df.dtypes)[lead] == "string":
        h = F.hex(F.col(lead))
        span = df.agg(F.min(h).alias("__los"), F.max(h).alias("__his"))
        span = span.select(
            _common_hex_prefix_len(F.col("__los"), F.col("__his"))
            .alias("__plen"),
            "__los", "__his",
        )
        start = F.col("__plen") + 1
        lo_d = _hex_window_long(F.col("__los"), start).cast("double")
        hi_d = _hex_window_long(F.col("__his"), start).cast("double")
        span = span.select(
            "__plen",
            lo_d.alias(_LO),
            F.greatest(
                (hi_d - lo_d + 1) / F.lit(buckets), F.lit(1.0)
            ).alias(_W),
        )
        stamped = df.crossJoin(F.broadcast(span))
        proj = _hex_window_long(h, F.col("__plen") + 1)
        stamped = stamped.withColumn(
            _BKT, _bucket_or_null_sentinel(proj)
        ).drop("__plen")
    else:
        proj = _leading_projection(df, lead)
        # span math in double: long-range keys overflow max-min (see
        # _bucket_or_null_sentinel)
        proj_d = proj.cast("double")
        span = df.agg(
            F.min(proj_d).alias(_LO),
            F.greatest(
                (F.max(proj_d) - F.min(proj_d) + 1) / F.lit(buckets),
                F.lit(1.0),
            ).alias(_W),
        )
        stamped = df.crossJoin(F.broadcast(span)).withColumn(
            _BKT, _bucket_or_null_sentinel(proj)
        )
    counts = stamped.groupBy(_BKT).agg(F.count("*").alias(_N))
    offsets = exclusive_prefix_sum(counts, [], _BKT, _N, _OFF).select(
        _BKT, _OFF
    )
    w_in = Window.partitionBy(_BKT).orderBy(*order_cols)
    return (
        stamped.join(F.broadcast(offsets), [_BKT])
        .withColumn(
            out_col,
            (F.row_number().over(w_in) + F.col(_OFF)).cast("long"),
        )
        .drop(_BKT, _LO, _W, _OFF)
    )
