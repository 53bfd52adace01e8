"""Deterministic corpus sampling for training-data mixtures.

Random sampling is the wrong tool for dataset curation at scale: it is
irreproducible across runs/engines and unstable under repartitioning.
These operators derive the keep/drop decision from a content hash
(md5), so a sample is (a) reproducible bit-for-bit, (b) independent of
partitioning and execution order, (c) a pure narrow filter — no
shuffle, fully pushed into the scan stage, and (d) engine-portable
(the DuckDB oracle reproduces it exactly).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F

#: number of leading md5 hex digits compared against the rate threshold
_HEX_DIGITS = 8
_HEX_SPACE = 16 ** _HEX_DIGITS


def rate_to_hex_threshold(rate: float) -> str:
    """Map a sampling rate in [0, 1] to the md5-prefix threshold: a row
    is kept iff its first 8 md5 hex digits compare below the threshold
    (fixed-width lowercase hex compares lexicographically == numerically,
    in any engine)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def _bucket(key: Column, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))),
        1,
        _HEX_DIGITS,
    )


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows by hashed key.

    The same (key, salt) always lands on the same side of the cut, so
    re-runs, engine swaps, and incremental appends sample consistently;
    distinct salts give independent samples (e.g. train/val splits:
    disjointness via complementary predicates on one salt)."""
    return df.filter(_bucket(F.col(key_col), salt) < rate_to_hex_threshold(rate))


def hash_stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-data *mixture*
    primitive (downsample the dominant language/source, keep the tail).

    ``rates`` maps stratum value -> keep fraction; strata not listed use
    ``default_rate``. The stratum participates in the hash, so the same
    key drawn in two strata makes independent decisions. Plan shape: the
    rate lookup is a broadcast of a literal map and the cut is a scalar
    predicate — a single narrow filter over the scan, no shuffle, no
    sort, nothing driver-side; at 100 TB this runs at scan speed.
    """
    thr = F.lit(rate_to_hex_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(rate_to_hex_threshold(rate))
        ).otherwise(thr)
    bucket = _bucket(
        F.concat_ws("|", F.col(strata_col), F.col(key_col).cast("string")),
        salt,
    )
    return df.filter(bucket < thr)


def hash_split(
    df: DataFrame,
    weights: "Mapping[str, float] | None" = None,
    key_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Label every row with a deterministic train/valid/test split.

    ``weights`` maps split name -> fraction (must sum to ≤ 1; any
    remainder joins the LAST split, so the partition is exhaustive).
    The assignment hashes (salt, key): stable across runs, engines,
    partitionings, and incremental appends — a re-crawled document
    lands in the same split forever, which is what keeps eval sets
    uncontaminated as the corpus grows. Distinct salts give
    independent partitions.

    .. warning:: the assignment depends on the **insertion order** of
       ``weights`` (splits claim cumulative hash ranges in iteration
       order), not just its values: ``{"train": .9, "test": .1}`` and
       ``{"test": .1, "train": .9}`` label rows differently. Pass the
       same ordered mapping everywhere a split must agree — or better,
       label once and hand the labeled frame downstream (see
       :func:`impuls_spark.llm.curation.cross_split_contamination`'s
       ``labels`` parameter).

    Plan shape: a CASE over one md5 prefix — scan-stage, zero
    shuffles; at 100 TB this costs what reading the key column costs.
    """
    if weights is None:
        weights = {"train": 0.9, "valid": 0.05, "test": 0.05}
    weights = dict(weights)
    if not weights:
        raise ValueError("hash_split needs at least one split")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) > 1 + 1e-9:
        raise ValueError(f"split weights must be ≥0 and sum to ≤1: {weights}")
    names = list(weights)
    bucket = _bucket(F.col(key_col), salt)
    # CASE over cumulative thresholds; first match wins, remainder
    # (rounding slack or weights summing below 1) joins the last split
    case = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < F.lit(rate_to_hex_threshold(cum))
        case = F.when(cond, name) if case is None else case.when(cond, name)
    expr = case.otherwise(names[-1]) if case is not None else F.lit(names[-1])
    return df.withColumn(out_col, expr)


def select_by_budget(
    df: DataFrame,
    budget: int,
    weight_col: str,
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "budget",
) -> DataFrame:
    """Keep a deterministic ~``budget`` of ``weight_col`` (tokens,
    chars, bytes) per stratum — "give me 10 B tokens per domain", the
    corpus-sizing primitive.

    Rows are ranked inside each stratum by hashed key (so the kept
    prefix is an unbiased sample, stable across runs and engines) and
    kept while the running total stays ≤ budget; the first row of a
    stratum is always kept so a single over-budget document can't empty
    its stratum. Plan shape: one window cumsum per stratum — the same
    per-shard pattern as sequence packing; strata partition the sort,
    so no global order is ever materialized. For strata too large to
    sort (a single crawl source holding 40% of a 100 TB corpus funnels
    that stratum through one sort partition here), use
    :func:`select_by_budget_threshold` — the two-pass hash-threshold
    form that never sorts rows; this operator implements the exact
    row-granular form.
    """
    from pyspark.sql import Window

    order = Window.partitionBy(strata_col).orderBy(
        _bucket(F.col(key_col), salt), key_col
    )
    running = F.sum(F.col(weight_col)).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # first-of-stratum guard must be positional (row_number == 1), not
    # the arithmetic `cum == weight`: with zero-weight rows (empty docs)
    # every prefix row of weight 0 would satisfy the arithmetic form and
    # a later over-budget row could masquerade as the stratum head
    return (
        df.withColumn("__cum", running)
        .withColumn("__rn", F.row_number().over(order))
        .filter((F.col("__cum") <= budget) | (F.col("__rn") == 1))
        .drop("__cum", "__rn")
    )


def select_by_budget_threshold(
    df: DataFrame,
    budget: int,
    weight_col: str,
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "budget",
    prefix_digits: int = 3,
) -> DataFrame:
    """Two-pass hash-threshold budget selection — the scale path of
    :func:`select_by_budget` for strata too large to window-sort.

    Rows never pass through an ordered window. Pass 1 histograms each
    stratum's weight by the first ``prefix_digits`` hex digits of the
    row hash (16^3 = 4096 buckets by default) and keeps the longest
    bucket prefix whose cumulative weight stays ≤ ``budget`` (the first
    non-empty bucket is always kept, mirroring the exact form's
    stratum-head guard); pass 2 keeps rows whose (stratum, bucket) is
    in that kept set. Because rows hash uniformly into buckets, the
    kept set is an unbiased deterministic sample — the same guarantee
    as the exact form — with selection granularity of one bucket
    (~1/4096 of the stratum) instead of one row.

    Plan shape: pass 1 is one hash aggregation on (stratum, bucket)
    with map-side partial aggregation — cardinality strata × 4096, so
    the ordered cutoff window runs over a dimension-sized table; pass 2
    is a broadcast semi-join, i.e. a scan-stage filter over the fact
    table. A stratum holding 90% of a 100 TB corpus adds zero skew:
    its rows spread over 4096 buckets in pass 1 and never sort.

    Deterministic and engine-portable (md5-prefix buckets, no sketch),
    so a DuckDB oracle reproduces it bit-for-bit.
    """
    from pyspark.sql import Window

    if not 1 <= prefix_digits <= _HEX_DIGITS:
        raise ValueError(f"prefix_digits must be in [1, {_HEX_DIGITS}]")
    bucket = F.substring(_bucket(F.col(key_col), salt), 1, prefix_digits)
    with_bucket = df.withColumn("__b", bucket)
    per_bucket = with_bucket.groupBy(strata_col, "__b").agg(
        F.sum(F.col(weight_col)).alias("__w")
    )
    order = Window.partitionBy(strata_col).orderBy("__b")
    cum = F.sum("__w").over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept_buckets = (
        per_bucket.withColumn("__cum", cum)
        .withColumn("__rn", F.row_number().over(order))
        .filter((F.col("__cum") <= budget) | (F.col("__rn") == 1))
        .select(strata_col, "__b")
    )
    return (
        with_bucket.join(
            F.broadcast(kept_buckets), [strata_col, "__b"], "left_semi"
        )
        .drop("__b")
    )


def mixture_rates(
    df: DataFrame,
    alpha: float = 0.3,
    target_rows: int | None = None,
    strata_col: str = "source",
) -> DataFrame:
    """(stratum, n_rows, p, rate) — temperature-flattened sampling
    mixture over strata (the multilingual/multi-domain rebalance of
    T5/mT5: ``p_s ∝ n_s^alpha``, alpha<1 upweights the tail).

    ``rate`` is the per-stratum keep fraction that realizes the mixture
    at ``target_rows`` total (capped at 1; default target is the corpus
    size). The output is dimension-sized (one row per stratum) — feed
    it to :func:`hash_stratified_sample` to materialize the draw. One
    aggregation plus a one-row total broadcast; nothing driver-side.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    counts = df.groupBy(strata_col).agg(F.count("*").alias("n_rows"))
    totals = counts.agg(
        F.sum(F.pow(F.col("n_rows"), F.lit(alpha))).alias("__z"),
        F.sum("n_rows").alias("__total"),
    )
    tgt = (
        F.lit(target_rows) if target_rows is not None else F.col("__total")
    )
    p = F.pow(F.col("n_rows"), F.lit(alpha)) / F.col("__z")
    return counts.crossJoin(F.broadcast(totals)).select(
        strata_col,
        "n_rows",
        F.round(p, 6).alias("p"),
        F.round(F.least(F.lit(1.0), tgt * p / F.col("n_rows")), 6).alias("rate"),
    )


def weighted_sample(
    df: DataFrame,
    rate: float,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "weighted",
    mean_weight: float | None = None,
) -> DataFrame:
    """Deterministic importance sampling: a row is kept iff its hash
    uniform falls below ``rate × w / E[w]`` (clamped at 1) — the
    expected kept fraction stays ~``rate`` while each row's keep
    probability scales with its weight. The reweighting primitive
    behind quality-proportional selection (DoReMi-style mixtures,
    score-proportional curation) realized as a scan-stage filter:
    same-key decisions are stable across runs, engines, and appends,
    like every hash sampler in this module.

    ``mean_weight`` injects a precomputed corpus statistic; otherwise
    one tiny aggregate is broadcast. Per-row thresholds are compared in
    the same 8-hex-digit space as :func:`hash_sample` (the clamped rate
    rendered as a zero-padded hex string), so no float/hex conversion
    ambiguity exists between engines; rows with ``clamp >= 1`` skip the
    comparison entirely (a 9-digit threshold would not fit the digit
    budget).
    """
    w = F.col(weight_col).cast("double")
    if mean_weight is None:
        stats = df.agg(F.avg(w).alias("__mw"))
        base = df.crossJoin(F.broadcast(stats))
        mean = F.col("__mw")
    else:
        base = df
        mean = F.lit(float(mean_weight))
    clamp = F.least(F.lit(1.0), F.lit(rate) * w / mean)
    thr = F.lower(
        F.lpad(F.hex((clamp * F.lit(4294967296.0)).cast("bigint")), 8, "0")
    )
    keep = (clamp >= 1.0) | (_bucket(F.col(key_col), salt) < thr)
    out = base.filter(keep)
    return out.drop("__mw") if mean_weight is None else out


#: hex-prefix widths whose shard counts keep the md5-prefix assignment
#: exactly equal-width (16^k shards per k leading hex digits)
_SHARD_DIGITS = {16: 1, 256: 2, 4096: 3}


def shard_assignment(
    key: Column, n_shards: int = 256, salt: str = "shard"
) -> Column:
    """Deterministic training-shard id for a row: the first
    ``log16(n_shards)`` hex digits of md5(salt:key). Equal-width
    buckets of the same engine-portable hash space every sampler in
    this module uses — so the shard fan-out is reproducible across
    runs, engines, partitionings, and appends, and a given document
    always lands in the same output shard. ``n_shards`` is restricted
    to powers of 16 (16/256/4096) so the prefix IS the shard id: no
    hex→int conversion, no modulo bias, byte-identical in any engine
    with md5 and substring.
    """
    if n_shards not in _SHARD_DIGITS:
        raise ValueError(
            f"n_shards must be one of {sorted(_SHARD_DIGITS)}, got {n_shards}"
        )
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))),
        1,
        _SHARD_DIGITS[n_shards],
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int = 256,
    key_col: str = "doc_id",
    weight_col: "str | None" = None,
    salt: str = "shard",
) -> DataFrame:
    """(shard, n_docs[, n_weight], min_id, max_id) — the manifest of a
    deterministic shuffled-shard write: per shard, how many documents
    land in it, their total weight (token/byte budget) when
    ``weight_col`` is given, and the id range it spans (the
    completeness check: every id interval accounted for).

    This is the bookkeeping half of the training-data shard writer:
    ``df.withColumn("shard", shard_assignment(...)).write
    .partitionBy("shard")`` produces the data files; the manifest is
    what the loader checks for balance (no shard over the budget) and
    completeness. Plan shape: one scan-stage hash projection and one
    hash aggregate on the shard id — 16^k result rows, map-side
    combined, no sort, no window; at 100 TB it costs one pass over the
    key and weight columns. Every aggregate buffer is fixed-width
    (count/sum/min/max over longs) ON PURPOSE: a string-buffered
    aggregate such as ``min_by(id, digest)`` demotes the whole
    aggregation to SortAggregate (per-partition sort before both the
    partial and final passes) — measured on this exact query shape.
    """
    if n_shards not in _SHARD_DIGITS:
        raise ValueError(
            f"n_shards must be one of {sorted(_SHARD_DIGITS)}, got {n_shards}"
        )
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string")))
    rows = df.select(
        F.col(key_col).alias("__id"),
        F.substring(h, 1, _SHARD_DIGITS[n_shards]).alias("shard"),
        *([F.col(weight_col).alias("__w")] if weight_col else []),
    )
    aggs = [
        F.count("*").alias("n_docs"),
        *([F.sum("__w").alias("n_weight")] if weight_col else []),
        F.min("__id").alias("min_id"),
        F.max("__id").alias("max_id"),
    ]
    return rows.groupBy("shard").agg(*aggs)


def training_order(
    df: DataFrame,
    key_col: str = "doc_id",
    salt: str = "order",
    prefix_digits: int = 2,
) -> DataFrame:
    """(key, position) — a deterministic global permutation of the
    corpus: position ``i`` is the rank of ``md5(salt:key)`` over all
    rows. This is the training-order shuffle every epoch needs —
    reproducible across runs, engines, and partitionings (re-salt for a
    new epoch), unlike ``ORDER BY rand()``.

    A naive ``row_number() OVER (ORDER BY hash)`` funnels the whole
    corpus through ONE task's sort. Instead the total order is
    decomposed by the hash's own prefix: rows bucket on the first
    ``prefix_digits`` hex digits (lexicographic bucket order == global
    hash order, because the bucket is a prefix of the very string being
    ranked); per-bucket row counts — 16^prefix_digits tiny rows — turn
    into exclusive start offsets via a broadcast theta-join prefix sum
    (the ``operators.ranks`` pattern — r8 replaced an ordered window
    over the count table so the WHOLE plan is single-partition-free,
    not just the row-scale part), and each bucket ranks only its own
    rows with a *partitioned* window. Same decomposition as the
    transfer-id fix in ``SplitTripLegs``: global enumeration without a
    global sort. At 100 TB, 4 prefix digits give 65 536 sort groups of
    ~1.5 GB each.
    """
    from pyspark.sql import Window

    from ..operators.ranks import exclusive_prefix_sum

    if not 1 <= prefix_digits <= 15:
        # 15 hex digits = 60 bits, the widest prefix whose numeric
        # value (the block-prefix-sum key since r8) is exact in a
        # long; 16^15 buckets is already absurd over-splitting
        raise ValueError(
            f"prefix_digits must be in [1, 15], got {prefix_digits}"
        )
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string")))
    rows = df.select(F.col(key_col), h.alias("__h"))
    rows = rows.withColumn("__b", F.substring(F.col("__h"), 1, prefix_digits))
    counts = rows.groupBy("__b").agg(F.count("*").alias("__cnt"))
    # hex prefix -> its numeric value: same ordering (md5 is lowercase
    # 0-9a-f; conv is order-faithful), numeric enables the hierarchical
    # block prefix sum (r8: the all-pairs theta-join here was quadratic
    # in 16^prefix_digits — 4.3e9 comparisons at the documented k=4)
    counts = counts.withColumn(
        "__bn", F.conv(F.col("__b"), 16, 10).cast("long")
    )
    offsets = exclusive_prefix_sum(
        counts, [], "__bn", "__cnt", "__off"
    ).select("__b", "__off")
    rn = F.row_number().over(
        Window.partitionBy("__b").orderBy("__h", key_col)
    )
    return (
        rows.join(F.broadcast(offsets), "__b")
        .select(
            F.col(key_col),
            (F.col("__off") + rn - 1).cast("bigint").alias("position"),
        )
    )


def cap_per_group(
    df: DataFrame,
    n: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Keep at most ``n`` rows per group, chosen deterministically by
    hash rank — the per-domain quota every crawl-curation pipeline
    applies so a single host cannot dominate the corpus. The kept set
    is a uniform *sample* of the group (hash order is unrelated to any
    data order), stable across runs/engines/appends-within-the-kept-set
    like the rest of this module.

    Exact form: one window partitioned by group (the group's rows sort
    together; the corpus never globally sorts). A group holding 40% of
    a 100 TB corpus would funnel through one sort partition here — for
    that regime use :func:`cap_per_group_threshold`, the two-pass
    hash-threshold form that never sorts rows (exactly as
    :func:`select_by_budget_threshold` does for weight budgets); this
    operator is the row-exact form for the realistic many-domains case
    where every group fits a partition.
    """
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(
            _bucket(F.col(key_col), salt), key_col
        )
    )
    return (
        df.withColumn("__rn", rn).filter(F.col("__rn") <= n).drop("__rn")
    )


def cap_per_group_threshold(
    df: DataFrame,
    n: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """The two-pass hash-threshold form of :func:`cap_per_group`, for
    groups too large to window-sort (one domain holding 40% of a
    100 TB corpus): pass 1 is a per-group count aggregate; pass 2
    keeps rows whose hash prefix falls below the group's rate
    threshold ``n / count`` — a scan-stage filter after a keyed join,
    no sort anywhere. Kept size is ≈ ``n`` per oversized group
    (binomial spread ~√n; the exact-``n`` guarantee is what the
    window form buys), groups at or under the cap keep every row.
    Deterministic and engine-portable like every sampler here: the
    same (key, salt) survives any re-run, engine, or partitioning.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("__c"))
    rate = F.lit(float(n)) / F.col("__c")
    # rate < 1 in the branch that uses it, so the product fits 8 hex
    # digits; groups at/under the cap take the keep-all branch instead
    thr = F.lower(
        F.lpad(
            F.hex(F.floor(rate * F.lit(float(_HEX_SPACE))).cast("bigint")),
            _HEX_DIGITS, "0",
        )
    )
    keep = (F.col("__c") <= n) | (_bucket(F.col(key_col), salt) < thr)
    return df.join(counts, group_col).filter(keep).drop("__c")
