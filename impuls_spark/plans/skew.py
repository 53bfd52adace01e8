"""Skew mitigation: salted joins.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin.enabled``)
covers sort-merge joins automatically; :func:`salted_join` is the
explicit variant for when AQE can't help (e.g. aggregations feeding the
join, or hot keys known a priori — a mega-hub stop_id in stop_times, a
viral document's shingle).

Mechanics: the skewed (large) side gets a random salt in [0, n); the
small side is exploded n× with every salt value; the join key becomes
(key, salt). Each hot key's rows now spread over n partitions instead
of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``large ⋈ small`` on column ``on`` with ``n_salts``-way salt
    spreading of the large side. ``small`` is replicated ``n_salts``×
    (keep it dimension-sized)."""
    salted_large = large.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_large.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")
