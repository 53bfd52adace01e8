"""Deterministic, mergeable cardinality sketches.

At corpus scale, "how many distinct documents does each source
contribute" is a sketch problem: the exact answer needs a shuffle of
every distinct value, while an estimate within a few percent needs a
bounded summary per group. The standard engines reach for
HyperLogLog, but HLL implementations differ across engines (register
widths, bias tables), so an HLL answer can never be checked against
an independent SQL oracle bit-for-bit.

KMV (k-minimum-values, Bar-Yossef et al. 2002) has none of that
ambiguity: hash every value to a uniform integer, keep the ``k``
smallest distinct hashes per group, and estimate the cardinality as
``(k-1) / normalized k-th minimum``. Every step — md5, integer
compare, one IEEE division — is engine-exact, so the whole sketch is
oracle-checkable while keeping the mergeability that matters at
100 TB: the k smallest of a union is computable from the k smallest
of each part, so partial sketches combine associatively across
partitions, files, or days.

Reference parity: the reference engine has no sketch surface — this
is a beyond-reference addition for the training-data-pipeline side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "kmv_distinct",
    "kmv_estimate",
    "kmv_jaccard",
    "kmv_merge",
    "kmv_sketch",
]

#: hex digits of md5 used as the hash value: 15 digits = 60 bits,
#: exact in both a Spark long and an IEEE double (the estimator
#: divides doubles, so the hash space must be float-exact)
_HEX_DIGITS = 15
_HASH_SPACE = float(16**_HEX_DIGITS)  # 2^60, exactly representable


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    *,
    k: int = 64,
    salt: str = "kmv",
    salt_buckets: int = 32,
) -> DataFrame:
    """Per-group distinct-count estimate via a k-minimum-values sketch.

    Output, one row per group: ``n_kept`` (min(k, ndv) hashes
    retained), ``kth_hash`` (the largest retained hash — the sketch's
    merge boundary), and ``est_ndv`` — exact when the group holds
    fewer than ``k`` distinct values, else the KMV estimator
    ``floor((k-1) · 2^60 / kth_hash)``.

    Plan shape: one map-side-combinable dedup on (group, hash), then
    the two-stage bounded top-k the repo uses everywhere a per-group
    rank must survive mega-groups: stage 1 ranks inside
    ``salt_buckets`` hash-salted sub-groups (partitions bounded by the
    group's share of one bucket), stage 2 ranks the ≤ ``buckets · k``
    survivors per group — no group ever sorts more than that, so a
    billion-row source costs the same window as a thousand-row one.
    Estimator arithmetic is IEEE-exact in both engines: ``(k-1)·2^60``
    is a float-exact product (power-of-two mantissa), and a single
    correctly-rounded division feeds ``floor``.
    """
    group_cols = list(group_cols)
    topk = _topk_hashes(df, value_col, group_cols, k, salt, salt_buckets)
    agg = topk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("__h").alias("kth_hash"),
    )
    return _with_estimate(agg, group_cols, k)


def _topk_hashes(
    df: DataFrame,
    value_col: str,
    group_cols: list,
    k: int,
    salt: str,
    salt_buckets: int,
) -> DataFrame:
    """The shared sketch kernel: per-group k smallest distinct value
    hashes as rows (group cols + ``__h``), via the two-stage bounded
    top-k (see :func:`kmv_distinct`'s plan-shape docstring)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h_hex = F.md5(
        F.concat_ws(":", F.lit(salt), F.col(value_col).cast("string"))
    )
    h = F.conv(F.substring(h_hex, 1, _HEX_DIGITS), 16, 10).cast("long")

    distinct = df.select(*group_cols, h.alias("__h")).dropDuplicates(
        group_cols + ["__h"]
    )
    staged = distinct.withColumn(
        "__sb", F.pmod(F.col("__h"), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy(*group_cols, "__sb").orderBy("__h")
    survivors = (
        staged.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__sb")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        survivors.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _with_estimate(agg: DataFrame, group_cols: list, k: int) -> DataFrame:
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        * F.lit(_HASH_SPACE)
        / F.greatest(F.col("kth_hash"), F.lit(1)).cast("double")
    )
    return agg.select(
        *group_cols,
        "n_kept",
        "kth_hash",
        F.floor(est).cast("long").alias("est_ndv"),
    )


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    *,
    k: int = 64,
    salt: str = "kmv",
    salt_buckets: int = 32,
) -> DataFrame:
    """The PERSISTABLE sketch state: one row per group with
    ``kmv_hashes`` — the ascending array of the ≤ k smallest distinct
    value hashes. This is the per-partition / per-day partial a
    continuously-ingesting corpus stores next to each shard; combine
    partials with :func:`kmv_merge`, read numbers off with
    :func:`kmv_estimate`. Same two-stage bounded top-k plan as
    :func:`kmv_distinct` (no group ever sorts more than
    ``salt_buckets · k`` rows), with a final k-bounded
    ``sort_array(collect_list(...))``."""
    group_cols = list(group_cols)
    topk = _topk_hashes(df, value_col, group_cols, k, salt, salt_buckets)
    return topk.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("__h")).alias("kmv_hashes")
    )


def kmv_merge(
    sketches: Sequence[DataFrame],
    group_cols: Sequence[str],
    *,
    k: int = 64,
) -> DataFrame:
    """Combine partial sketches: the k smallest of a union are
    computable from the k smallest of each part, so
    ``kmv_merge([kmv_sketch(A), kmv_sketch(B)])`` equals
    ``kmv_sketch(A ∪ B)`` EXACTLY (same hashes, not just a close
    estimate) — the property that lets per-day / per-shard partials
    roll up without ever rereading the data.

    Plan shape: union the (group, array) frames — each contributes ≤ k
    hashes per group — explode, dedup (the same value in two parts
    hashes identically), and one per-group window keeps the k
    smallest. Per-group row count is bounded by ``parts · k``, so the
    window partition never sees corpus-scale data regardless of the
    underlying cardinalities."""
    if not sketches:
        raise ValueError("kmv_merge needs at least one sketch frame")
    group_cols = list(group_cols)
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    exploded = u.select(
        *group_cols, F.explode("kmv_hashes").alias("__h")
    ).dropDuplicates(group_cols + ["__h"])
    w = Window.partitionBy(*group_cols).orderBy("__h")
    topk = (
        exploded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
    )
    return topk.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("__h")).alias("kmv_hashes")
    )


def kmv_jaccard(
    sketch: DataFrame,
    group_cols: Sequence[str],
    *,
    k: int = 64,
) -> DataFrame:
    """Pairwise Jaccard similarity ESTIMATES between every pair of
    groups, from their KMV sketches alone (Bar-Yossef et al.; the
    Beyer et al. 2007 multi-set extension): for groups A and B, take
    the k smallest hashes of the UNION of the two retained sets —
    computable exactly from the sketches, per the merge property —
    and count how many of them appear in BOTH sketches. That count
    over k estimates |A∩B| / |A∪B|, because the union's k minima are
    a uniform sample of A∪B and membership in both sketches marks the
    sampled element as an intersection element.

    Output: one row per unordered group pair — the leading group
    columns suffixed ``_a`` / ``_b``, ``n_common`` (intersection marks
    among the union's k minima), ``n_union_min`` (min(k, |union
    hashes|)), and ``jaccard_est = n_common / n_union_min``. Exact
    when both groups hold < k distinct values (the sketches ARE the
    sets).

    Plan shape: sketches are one row per group (dimension-sized by
    construction), so the pair enumeration is a broadcast self-join of
    a tiny frame; the per-pair union/top-k/membership runs as array
    expressions inside the join projection — no shuffle beyond the
    sketch computation itself, no explode."""
    group_cols = list(group_cols)
    a = sketch.select(
        *[F.col(c).alias(f"{c}_a") for c in group_cols],
        F.col("kmv_hashes").alias("__ha"),
    )
    b = sketch.select(
        *[F.col(c).alias(f"{c}_b") for c in group_cols],
        F.col("kmv_hashes").alias("__hb"),
    )
    # unordered pairs once: strict lexicographic order on the group key
    key_a = F.struct(*[F.col(f"{c}_a") for c in group_cols])
    key_b = F.struct(*[F.col(f"{c}_b") for c in group_cols])
    pairs = a.join(F.broadcast(b), key_a < key_b)
    union_min = F.slice(
        F.array_sort(F.array_union(F.col("__ha"), F.col("__hb"))), 1, k
    )
    common = F.size(
        F.filter(
            union_min,
            lambda h: F.array_contains(F.col("__ha"), h)
            & F.array_contains(F.col("__hb"), h),
        )
    )
    return pairs.select(
        *[f"{c}_a" for c in group_cols],
        *[f"{c}_b" for c in group_cols],
        common.alias("n_common"),
        F.size(union_min).alias("n_union_min"),
        (common.cast("double") / F.greatest(F.size(union_min), F.lit(1)))
        .alias("jaccard_est"),
    )


def kmv_estimate(
    sketch: DataFrame, group_cols: Sequence[str], *, k: int = 64
) -> DataFrame:
    """Read the estimate off a sketch frame: same output columns as
    :func:`kmv_distinct` (``n_kept``, ``kth_hash``, ``est_ndv``), so
    ``kmv_estimate(kmv_sketch(df)) == kmv_distinct(df)`` row for row."""
    group_cols = list(group_cols)
    agg = sketch.select(
        *group_cols,
        F.size("kmv_hashes").alias("n_kept"),
        F.array_max("kmv_hashes").alias("kth_hash"),
    )
    return _with_estimate(agg, group_cols, k)
