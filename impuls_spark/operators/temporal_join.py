"""Time-aware joins and rollups the DataFrame API has no verb for.

Four operators a telemetry/feed pipeline reaches for constantly, each
built so the physical plan is ONE keyed shuffle — never a range
explosion, never a cartesian:

* :func:`asof_join` — point-in-time enrichment ("the most recent right
  row at or before each left row"). The classic implementations are a
  per-key sorted merge (pandas ``merge_asof``) or an O(L×R) theta join;
  neither survives Spark at scale. Here both sides are tagged, unioned,
  and swept with ONE ``last(..., ignorenulls=True)`` window partitioned
  on the join keys — the matched right row rides forward to every left
  row in pure whole-stage-codegen, so cost is one shuffle + one
  per-key sort, identical to any keyed window.
* :func:`range_join` — pair left rows with right rows whose timestamp
  falls in ``[left + lower, left + upper]``. A raw BETWEEN predicate
  plans as BroadcastNestedLoopJoin (quadratic). Bucketing both sides to
  cells at least as wide as the window turns it into an equi-join on
  the cell id with ≤2 candidate cells per left row — candidate volume
  is 2·|L| + |R|, and the exact predicate filters inside the join.
* :func:`time_bucket_rollup` — hypertable-style fixed-width bucket
  aggregation with gap filling. The spine of all buckets is generated
  from a one-row min/max aggregate via ``sequence`` + ``explode`` (no
  driver collect), cross-joined with the (broadcast, dimension-sized)
  key frame, then left-joined to the real aggregate.
* :func:`rolling_window_agg` — per-row trailing event-time aggregates
  ("events in the last hour per user") via one keyed RANGE-frame
  window; the frame slides with each row instead of bucketing.

All timestamps are normalized to epoch microseconds (``unix_micros``)
so arithmetic, tolerances, and engine-portable oracles share one unit.

Reference parity: the reference engine has no temporal-join surface —
these are additions for the large-scale telemetry/training-data side
(SURVEY §2's "beyond-reference" charter), named after the pandas /
TimescaleDB operators they re-express.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "range_agg",
    "range_join",
    "rolling_window_agg",
    "time_bucket_rollup",
]


def _ts_us(df: DataFrame, name: str) -> Column:
    """Epoch microseconds of ``df[name]``: timestamps via unix_micros,
    integer columns pass through UNCHANGED (they are already epoch
    micros — a long cast to timestamp would be read as seconds)."""
    dtype = dict(df.dtypes)[name]
    if dtype in ("bigint", "int", "long", "integer"):
        return F.col(name).cast("long")
    return F.unix_micros(F.col(name).cast("timestamp"))


def _idiv(col: Column, n: int) -> Column:
    """Exact FLOOR division for longs. ``(c / n).cast`` goes through a
    double whose rounding can flip the bucket on exact multiples (an
    engine-visible off-by-one vs SQL ``//``); subtracting the modulus
    first keeps every step exact. ``pmod`` (not ``%``) keeps the
    modulus non-negative, so negative inputs floor like SQL ``//``
    instead of truncating toward zero — a pre-1970 timestamp that is
    not an exact bucket multiple must land in the PRECEDING bucket."""
    return ((col - F.pmod(col, F.lit(n))) / F.lit(n)).cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    *,
    direction: str = "backward",
    tolerance_s: float | None = None,
    tiebreak: str | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Enrich each left row with the nearest right row at-or-before
    (``direction="backward"``), at-or-after (``"forward"``), or on
    either side (``"nearest"`` — ties go backward, as in pandas) of
    its timestamp, per join key — ``pandas.merge_asof`` / DuckDB
    ``ASOF JOIN`` semantics, with optional ``tolerance_s`` bounding
    the gap (for ``nearest``, the absolute gap).

    Output: every left column unchanged, plus every right non-key
    column under ``prefix`` (null when no match / outside tolerance),
    plus ``{prefix}ts_us`` — the matched right timestamp in epoch
    microseconds. Left rows are never dropped.

    Among several right rows sharing one timestamp the largest
    ``tiebreak`` value wins (pass a unique column for a total,
    engine-portable order; without one the pick among exact ties is
    nondeterministic, as in pandas).

    Plan shape: tag right=0 / left=1, union with null-padded columns,
    ONE window ``last(ignorenulls) OVER (PARTITION BY keys ORDER BY
    ts, side, tie)`` — a single hash shuffle on the join keys and a
    per-key sort. No range explosion: cost is the same as
    sessionization over the unioned stream, and skew is bounded by the
    per-key row count exactly like any keyed window. ``nearest`` runs
    the same union through TWO window passes (ascending for the
    backward candidate, descending for the forward one) over one hash
    exchange — two per-key sorts, still no join.
    """
    if not list(on):
        # an empty key set would plan the window as Exchange
        # SinglePartition — the whole dataset through one task. For a
        # keyless alignment, bucket time into cells and range_join /
        # range_agg instead, or pass a coarse synthetic key.
        raise ValueError(
            "asof_join requires at least one join key; a keyless as-of "
            "would single-partition the sort. Use range_join/range_agg "
            "over time cells for keyless alignment."
        )
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, left_ts, right_ts,
            tolerance_s=tolerance_s, tiebreak=tiebreak, prefix=prefix,
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    right_ts = right_ts or left_ts
    on = list(on)
    sign = 1 if direction == "backward" else -1

    carry = [c for c in right.columns if c not in on and c != right_ts]
    out_names = {c: f"{prefix}{c}" for c in carry}
    rtypes = dict(right.dtypes)

    # right rows: keys + ts + carried payload; left payload null-padded
    lcols = [c for c in left.columns if c not in on]
    ltypes = dict(left.dtypes)
    r_side = right.select(
        *on,
        (_ts_us(right, right_ts) * sign).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        *[F.col(c).alias(out_names[c]) for c in carry],
    )
    l_side = left.select(
        *on,
        (_ts_us(left, left_ts) * sign).alias("__t"),
        F.lit(1).alias("__side"),
        *lcols,
        *[F.lit(None).cast(rtypes[c]).alias(out_names[c]) for c in carry],
    )
    # tie column: only right rows carry it; coalesce(-1) keeps the sort
    # total under each engine's differing NULL placement
    tie = (
        F.coalesce(F.col(out_names[tiebreak]).cast("long"), F.lit(-1))
        if tiebreak is not None
        else F.lit(0)
    )
    u = r_side.unionByName(l_side).withColumn("__tie", tie)

    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the ENTIRE matched right row as one struct through ONE
    # last(ignorenulls) — per-column last() would skip a NULL payload
    # field of the matched row and substitute a stale value from an
    # older right row (pandas/DuckDB return the matched row's NULL)
    payload = F.struct(
        F.col("__t").alias("__rt"),
        *[F.col(out_names[c]).alias(out_names[c]) for c in carry],
    )
    filled = u.withColumn(
        "__p",
        F.last(
            F.when(F.col("__side") == 0, payload), ignorenulls=True
        ).over(w),
    )

    out = filled.filter(F.col("__side") == 1)
    mt = F.col("__p").getField("__rt")
    in_tol = mt.isNotNull()
    if tolerance_s is not None:
        in_tol = in_tol & (
            (F.col("__t") - mt) <= int(tolerance_s * 1_000_000)
        )
    ts_us = F.when(in_tol, mt * sign).alias(f"{prefix}ts_us")
    return out.select(
        *on,
        (F.col("__t") * sign).alias(f"{left_ts}_us"),
        *lcols,
        ts_us,
        *[
            F.when(in_tol, F.col("__p").getField(out_names[c])).alias(
                out_names[c]
            )
            for c in carry
        ],
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str | None,
    *,
    tolerance_s: float | None,
    tiebreak: str | None,
    prefix: str,
) -> DataFrame:
    """``direction="nearest"``: the backward and forward candidates come
    from two window passes over ONE tagged union (ascending and
    descending per-key sorts on the same hash exchange); the closer
    candidate wins, exact-distance ties go backward (pandas), and
    ``tolerance_s`` disqualifies each candidate independently before
    the pick."""
    right_ts = right_ts or left_ts
    on = list(on)
    carry = [c for c in right.columns if c not in on and c != right_ts]
    out_names = {c: f"{prefix}{c}" for c in carry}
    rtypes = dict(right.dtypes)
    lcols = [c for c in left.columns if c not in on]
    ltypes = dict(left.dtypes)
    r_side = right.select(
        *on,
        _ts_us(right, right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        *[F.col(c).alias(out_names[c]) for c in carry],
    )
    l_side = left.select(
        *on,
        _ts_us(left, left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *lcols,
        *[F.lit(None).cast(rtypes[c]).alias(out_names[c]) for c in carry],
    )
    tie = (
        F.coalesce(F.col(out_names[tiebreak]).cast("long"), F.lit(-1))
        if tiebreak is not None
        else F.lit(0)
    )
    u = r_side.unionByName(l_side).withColumn("__tie", tie)

    frame = (Window.unboundedPreceding, Window.currentRow)
    wb = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(*frame)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").desc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(*frame)
    )
    is_r = F.col("__side") == 0
    # matched-row struct carry (see asof_join): the whole candidate
    # right row travels as one value, so its NULL payload fields stay
    # NULL instead of being back-filled from an older row
    payload = F.struct(
        F.col("__t").alias("__rt"),
        *[F.col(out_names[c]).alias(out_names[c]) for c in carry],
    )
    filled = u.withColumn(
        "__bp", F.last(F.when(is_r, payload), ignorenulls=True).over(wb)
    ).withColumn(
        "__fp", F.last(F.when(is_r, payload), ignorenulls=True).over(wf)
    )

    out = filled.filter(F.col("__side") == 1)
    bt = F.col("__bp").getField("__rt")
    ft = F.col("__fp").getField("__rt")
    bdt = F.col("__t") - bt
    fdt = ft - F.col("__t")
    b_ok = bt.isNotNull()
    f_ok = ft.isNotNull()
    if tolerance_s is not None:
        tol = int(tolerance_s * 1_000_000)
        b_ok = b_ok & (bdt <= tol)
        f_ok = f_ok & (fdt <= tol)
    choose_b = b_ok & (~f_ok | (bdt <= fdt))
    pick = lambda b, f: F.when(choose_b, b).when(f_ok, f)  # noqa: E731
    return out.select(
        *on,
        F.col("__t").alias(f"{left_ts}_us"),
        *lcols,
        pick(bt, ft).alias(f"{prefix}ts_us"),
        *[
            pick(
                F.col("__bp").getField(out_names[c]),
                F.col("__fp").getField(out_names[c]),
            ).alias(out_names[c])
            for c in carry
        ],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | None,
    left_ts: str = "ts",
    right_ts: str | None = None,
    *,
    lower_s: float,
    upper_s: float,
    how: str = "inner",
    max_avg_pairs_per_left: float | None = None,
) -> DataFrame:
    """Pair each left row with every right row whose timestamp lies in
    ``[left_ts + lower_s, left_ts + upper_s]`` (inclusive), optionally
    also matching equi-keys ``on`` — an interval/range join.

    Output: left columns + ``{left_ts}_us`` + right non-key columns
    suffixed ``_r`` (+ ``ts_us_r``). ``how="left"`` keeps unmatched
    left rows with null right columns.

    Plan shape: both sides bucket to time cells exactly as wide as the
    window span, so a matching pair is never more than one cell apart —
    each left row expands to its (≤2 distinct) candidate cells and the
    join is a plain equi-join on ``(keys, cell)`` with the exact range
    predicate evaluated inside. Candidate volume is 2·|L| + |R| rather
    than |L|·|R|; time-bucketing spreads even a keyless join across the
    cluster, and AQE's skew split handles a hot cell.

    **Density guard** (VERDICT r7 item 3): the OUTPUT is still a pair
    enumeration — |L| · density · window rows — so densifying the
    corpus 10× in a fixed span grows the result ~100×, silently. Pass
    ``max_avg_pairs_per_left`` to bound it: a cheap pre-pass estimates
    expected pairs per left row — keyless as ``|R| · span / (right time
    extent)``, keyed as the n-weighted mean of the PER-KEY densities
    (a left row only pairs within its own key) — and raises
    ``ValueError`` above the bound, pointing counting/summing callers
    at :func:`range_agg`, whose cost does NOT carry the pair volume.
    The guard is opt-in and an ESTIMATE (uniform-rate-within-key
    assumption; a left-side distribution wildly unlike the right's can
    beat it) — it catches the order-of-magnitude mistakes, not exact
    output metering.
    """
    if upper_s < lower_s:
        raise ValueError("upper_s must be >= lower_s")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if max_avg_pairs_per_left is not None:
        _guard_pair_density(
            right, list(on or []), right_ts or left_ts, lower_s, upper_s,
            max_avg_pairs_per_left,
        )
    right_ts = right_ts or left_ts
    on = list(on or [])
    lo = int(lower_s * 1_000_000)
    hi = int(upper_s * 1_000_000)
    # a zero-width window still needs a 1-us-wide cell
    cell = max(hi - lo, 1)

    lcols = [c for c in left.columns if c not in on]
    rcarry = [c for c in right.columns if c not in on and c != right_ts]

    l_base = left.select(
        *on, _ts_us(left, left_ts).alias("__lt"), *lcols
    )
    l_pre = l_base.withColumn(
        "__cell",
        F.explode(
            F.array_distinct(
                F.array(
                    _idiv(F.col("__lt") + lo, cell),
                    _idiv(F.col("__lt") + hi, cell),
                )
            )
        ),
    )
    r_pre = right.select(
        *on,
        _ts_us(right, right_ts).alias("__rt"),
        _idiv(_ts_us(right, right_ts), cell).alias("__cell"),
        *[F.col(c).alias(f"{c}_r") for c in rcarry],
    )
    cond = (F.col("__rt") >= F.col("__lt") + lo) & (
        F.col("__rt") <= F.col("__lt") + hi
    )
    joined = l_pre.join(r_pre, on + ["__cell"], "inner").filter(cond)
    sel = [
        *on,
        F.col("__lt").alias(f"{left_ts}_us"),
        *lcols,
        F.col("__rt").alias("ts_us_r"),
        *[f"{c}_r" for c in rcarry],
    ]
    if how == "inner":
        return joined.select(*sel)
    # left outer: matched pairs ∪ anti-joined left rows, null right
    # side. Exactly-duplicate left rows keep their multiplicity on
    # BOTH branches: matched pairs replicate through the join itself,
    # and the unmatched branch groups value-identical rows with a
    # count, anti-joins once, then explodes the count back — a LEFT
    # JOIN never collapses duplicates.
    matched = joined.select(*sel)
    keys = on + [f"{left_ts}_us"] + lcols
    lefts = (
        l_base.select(*on, F.col("__lt").alias(f"{left_ts}_us"), *lcols)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__m"))
    )
    rtypes = dict(r_pre.dtypes)
    missing = (
        lefts.join(
            matched.select(*keys).dropDuplicates(), keys, "left_anti"
        )
        .withColumn("__dup", F.explode(F.sequence(F.lit(1), F.col("__m"))))
        .select(
            *keys,
            F.lit(None).cast("long").alias("ts_us_r"),
            *[
                F.lit(None).cast(rtypes[f"{c}_r"]).alias(f"{c}_r")
                for c in rcarry
            ],
        )
    )
    return matched.unionByName(missing)


def _guard_pair_density(
    right: DataFrame,
    on: list,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    max_avg: float,
) -> None:
    """Estimate expected pairs per left row under a uniform-rate model
    and refuse enumeration above ``max_avg``. Keyless: one scalar
    aggregate — density = |R| · span / extent. Keyed: a left row only
    pairs WITHIN its key, so the estimate is the per-key density
    ``n_k · span / extent_k``, averaged weighted by ``n_k`` (a left row
    is assumed to land in a key proportionally to its right-side mass —
    the r8 review showed the keyless formula overstates keyed workloads
    by the key-cardinality factor and spuriously refuses them). One
    keyed aggregate + one scalar reduce; only runs when opted in."""
    span_us = max(int((upper_s - lower_s) * 1_000_000), 1)
    t = _ts_us(right, right_ts)
    # density is clamped at n: a left row can never pair with more
    # rows than the key (or corpus) HAS — without the clamp a
    # zero-extent key (singleton, or all rows on one timestamp) divides
    # by the 1-us floor and reports millions of phantom pairs (r8
    # review, confirmed by execution)
    if on:
        per_key = right.groupBy(*on).agg(
            F.count(F.lit(1)).alias("n"),
            F.min(t).alias("lo"),
            F.max(t).alias("hi"),
        )
        dens = F.least(
            F.col("n").cast("double"),
            F.col("n") * F.lit(span_us)
            / F.greatest(F.col("hi") - F.col("lo"), F.lit(1)),
        )
        row = per_key.agg(
            F.sum("n").alias("n"),
            (F.sum(F.col("n") * dens) / F.sum("n")).alias("est"),
        ).collect()[0]
        scope = f"per-key over {len(on)} join key(s)"
    else:
        n = F.count(F.lit(1))
        row = right.agg(
            n.alias("n"),
            F.least(
                n.cast("double"),
                n * F.lit(span_us)
                / F.greatest(F.max(t) - F.min(t), F.lit(1)),
            ).alias("est"),
        ).collect()[0]
        scope = "keyless"
    if not row["n"]:
        return
    est = float(row["est"])
    if est > max_avg:
        raise ValueError(
            f"range_join density guard: ~{est:.1f} expected pairs per "
            f"left row ({scope}, {row['n']} right rows, "
            f"{span_us / 1_000_000:.0f}s window) exceeds "
            f"max_avg_pairs_per_left={max_avg}. The output pair volume "
            "scales with density x window; if you only need counts/sums "
            "in range, use range_agg (identical semantics, no pair "
            "enumeration), or raise the bound explicitly."
        )


def time_bucket_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    *,
    bucket_s: int,
    keys: Sequence[str] = (),
    aggs: Mapping[str, Column] | None = None,
    gap_fill: bool = True,
) -> DataFrame:
    """Hypertable-style rollup: aggregate into fixed ``bucket_s``-second
    epoch-aligned buckets per key, optionally gap-filled so every
    (key, bucket) cell in the observed global span is present —
    downstream window/lag math over the series never has to reason
    about missing rows.

    ``aggs`` maps output name -> aggregate Column (default
    ``{"n_events": count(*)}``); gap-filled cells take the aggregate's
    zero (count/sum → 0). Output: keys + ``bucket_start_s`` (epoch
    seconds, bigint) + one column per aggregate.

    Plan shape: one partial-agg-friendly groupBy on (keys, bucket).
    The gap spine comes from a ONE-ROW global min/max aggregate — no
    driver collect — exploded in TWO levels: first into
    ``spine_chunk``-bucket chunk ids (span/chunk rows, generated on
    one task but 8192× fewer than the buckets), then, after a
    repartition spreads the chunks across the cluster, into the
    buckets themselves — so a year of 1-second buckets (31M spine
    rows) generates in parallel instead of on the single task a naive
    ``sequence(lo, hi)`` explode would use. The spine cross-joins the
    broadcast distinct-key frame (dimension-sized by definition: it's
    a grouping key) and left-joins the real aggregate; nothing is
    quadratic and the only full-data pass is the aggregate itself.
    """
    keys = list(keys)
    aggs = dict(aggs) if aggs else {"n_events": F.count(F.lit(1))}
    spine_chunk = 8192
    bucket = _idiv(_ts_us(df, ts_col), bucket_s * 1_000_000)
    base = df.withColumn("__bix", bucket)
    rolled = base.groupBy(*keys, "__bix").agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    if not gap_fill:
        return rolled.select(
            *keys,
            (F.col("__bix") * bucket_s).alias("bucket_start_s"),
            *aggs,
        )
    span = base.agg(
        F.min("__bix").alias("__lo"), F.max("__bix").alias("__hi")
    )
    chunks = span.select(
        "__lo",
        "__hi",
        F.explode(
            F.sequence(
                _idiv(F.col("__lo"), spine_chunk),
                _idiv(F.col("__hi"), spine_chunk),
            )
        ).alias("__c"),
    ).repartition("__c")
    spine = chunks.select(
        F.explode(
            F.sequence(
                F.greatest(F.col("__lo"), F.col("__c") * spine_chunk),
                F.least(
                    F.col("__hi"), (F.col("__c") + 1) * spine_chunk - 1
                ),
            )
        ).alias("__bix")
    )
    if keys:
        dims = base.select(*keys).dropDuplicates()
        spine = spine.crossJoin(F.broadcast(dims))
    otypes = dict(rolled.dtypes)
    filled = spine.join(rolled, keys + ["__bix"], "left").select(
        *keys,
        (F.col("__bix") * bucket_s).alias("bucket_start_s"),
        *[
            F.coalesce(F.col(n), F.lit(0).cast(otypes[n])).alias(n)
            for n in aggs
        ],
    )
    return filled


def rolling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    *,
    key_col: str,
    window_s: float,
    aggs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Trailing event-time aggregates: for EACH row, aggregate the
    rows of the same key whose timestamp lies in
    ``[ts − window_s, ts]`` (inclusive) — the "events in the last
    hour per user" feature every behavioral / rate-limit pipeline
    computes. Unlike :func:`time_bucket_rollup` the window slides
    with every row, so there is no bucket-boundary truncation.

    ``aggs`` maps output name -> aggregate Column evaluated over the
    trailing range frame (default ``{"n_window": count(*)}``).
    Output: every input column plus ``{ts_col}_us`` and the named
    aggregates.

    Plan shape: ONE window with a RANGE frame over epoch
    microseconds, partitioned on the key — a single hash shuffle and
    per-key sort, identical in cost to any keyed window; the range
    frame is evaluated by a sliding two-pointer pass inside the
    partition, never a self-join. Skew is bounded by per-key row
    count; there is no time-cell explosion because the frame slides
    instead of bucketing.
    """
    aggs = dict(aggs) if aggs else {"n_window": F.count(F.lit(1))}
    lo = -int(window_s * 1_000_000)
    out = df.withColumn("__t", _ts_us(df, ts_col))
    w = (
        Window.partitionBy(key_col)
        .orderBy("__t")
        .rangeBetween(lo, Window.currentRow)
    )
    cols = [c for c in df.columns]
    return out.select(
        *cols,
        F.col("__t").alias(f"{ts_col}_us"),
        *[c.over(w).alias(n) for n, c in aggs.items()],
    )


def range_agg(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | None,
    left_ts: str = "ts",
    right_ts: str | None = None,
    *,
    left_id: str,
    lower_s: float,
    upper_s: float,
    sums: Mapping[str, Column] | None = None,
    subcells: int = 16,
) -> DataFrame:
    """Summable aggregates of right rows in ``[left+lower, left+upper]``
    per left row — the COUNTING twin of :func:`range_join`, for when
    the caller wants "how many / how much nearby", not the pairs.

    ``sums`` maps output name -> a per-right-row expression combined
    by summation (default ``{"n_in_range": lit(1)}``); every left row
    appears, zeros when nothing is in range.

    Why not count over :func:`range_join`: enumeration cost is
    |L| · density · window — densify the corpus 10× in a fixed time
    span and the intermediate pair volume grows 100×. Here the window
    is split into ``subcells``; right rows pre-aggregate per subcell
    ONCE (map-side combinable), each left row equi-joins the ≤
    ``subcells`` fully-contained subcell PARTIALS plus row-scans only
    the two boundary subcells. Candidate volume per left row falls
    from ``density · window`` to ``subcells + 2 · density · window /
    subcells`` — minimized near ``subcells ≈ sqrt(density · window)``,
    and every join stays a keyed equi-join (no nested loop, no
    skew-prone single cell).

    Exactness: full subcells ``s ∈ [floor((t+lo)/w)+1,
    floor((t+hi)/w)−1]`` satisfy ``s·w > t+lo − 1`` and ``(s+1)·w ≤
    t+hi + 1`` by construction, the two boundary subcells are scanned
    with the exact predicate, and the two sets are disjoint — no
    double counting, bit-identical to the enumeration path.
    """
    if upper_s < lower_s:
        raise ValueError("upper_s must be >= lower_s")
    if subcells < 2:
        raise ValueError(f"subcells must be >= 2, got {subcells}")
    right_ts = right_ts or left_ts
    on = list(on or [])
    sums = dict(sums) if sums else {"n_in_range": F.lit(1)}
    lo = int(lower_s * 1_000_000)
    hi = int(upper_s * 1_000_000)
    w = max((hi - lo) // subcells, 1)

    vnames = [f"__v_{n}" for n in sums]
    r = right.select(
        *on,
        _ts_us(right, right_ts).alias("__rt"),
        *[c.alias(v) for v, c in zip(vnames, sums.values())],
    ).withColumn("__cell", _idiv(F.col("__rt"), w))
    cells = r.groupBy(*on, "__cell").agg(
        *[F.sum(v).alias(v) for v in vnames]
    )

    l = left.select(
        left_id, *on, _ts_us(left, left_ts).alias("__lt")
    )
    bl = _idiv(F.col("__lt") + lo, w)
    bh = _idiv(F.col("__lt") + hi, w)
    l = l.withColumn("__bl", bl).withColumn("__bh", bh)

    full = (
        l.withColumn(
            "__s",
            F.explode(
                F.when(
                    F.col("__bh") - 1 >= F.col("__bl") + 1,
                    F.sequence(F.col("__bl") + 1, F.col("__bh") - 1),
                ).otherwise(F.array().cast("array<long>"))
            ),
        )
        .join(cells.withColumnRenamed("__cell", "__s"), on + ["__s"], "inner")
        .groupBy(left_id)
        .agg(*[F.sum(v).alias(f"__f_{v}") for v in vnames])
    )
    boundary = (
        l.withColumn(
            "__s",
            F.explode(
                F.array_distinct(F.array(F.col("__bl"), F.col("__bh")))
            ),
        )
        .join(r.withColumnRenamed("__cell", "__s"), on + ["__s"], "inner")
        .filter(
            (F.col("__rt") >= F.col("__lt") + lo)
            & (F.col("__rt") <= F.col("__lt") + hi)
        )
        .groupBy(left_id)
        .agg(*[F.sum(v).alias(f"__b_{v}") for v in vnames])
    )
    out = (
        l.select(left_id, *on, F.col("__lt").alias(f"{left_ts}_us"))
        .join(full, left_id, "left")
        .join(boundary, left_id, "left")
    )
    zero = F.lit(0)
    return out.select(
        left_id,
        *on,
        f"{left_ts}_us",
        *[
            (
                F.coalesce(F.col(f"__f_{v}"), zero)
                + F.coalesce(F.col(f"__b_{v}"), zero)
            ).alias(n)
            for n, v in zip(sums, vnames)
        ],
    )
