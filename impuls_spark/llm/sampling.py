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
