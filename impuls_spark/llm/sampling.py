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
