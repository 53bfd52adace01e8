"""Record linkage: blocked candidate generation + exact verification.

Production entity resolution never compares all pairs — it generates
candidates with a cheap blocking scheme (here: the MinHash-LSH band
machinery already powering the dedup family), then verifies each
candidate with an expensive exact measure. This module is the verify
stage: edit-distance confirmation of candidate pairs.

``edit_verified_pairs`` takes ANY (id_a, id_b) candidate frame —
LSH bands, simhash chunks, embedding buckets — so the blocking
recall/cost trade-off stays in the caller's hands, and the verify
cost is strictly |candidates| · O(len²) rather than |corpus|².

Reference parity: the reference engine's closest analog is Merge's
content-hash + geo candidate matching (exact equality only); fuzzy
string verification is a beyond-reference addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["edit_verified_pairs"]


def edit_verified_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sim: float = 0.8,
) -> DataFrame:
    """Confirm candidate pairs by normalized edit similarity.

    For each candidate ``(id_a, id_b)``, computes the Levenshtein
    distance between the two texts and keeps pairs with
    ``1 − dist / max(len_a, len_b) ≥ min_sim``. Output:
    ``(id_a, id_b, edit_dist, edit_sim)`` with ``edit_sim`` rounded
    to 6 places. Pairs whose text is NULL on either side drop (their
    similarity is undefined, and a null never satisfies the filter).

    Plan shape: two id-keyed joins fetch the texts (row-level equi
    joins — the candidate frame is the small side after blocking, and
    AQE broadcasts it when it fits); the joined frame is then
    REPARTITIONED on the pair key before the Levenshtein projection.
    That shuffle looks redundant — the rows are already assembled —
    but it is what guarantees the expensive stage's parallelism: when
    the candidate side broadcasts, the measure stage inherits the
    STREAMED side's partitioning, and a corpus that fits one parquet
    split runs every Levenshtein in a single task (measured 48 s vs
    4 s for 46k pairs of ~300-char texts, r10). The shuffle moves
    only the surviving pairs' texts — O(candidates) bytes against the
    measure's O(candidates x len^2) work, vanishing at every scale.
    The Levenshtein itself is the JVM built-in, one evaluation per
    candidate. Similarity is integer-division-exact: dist and lengths
    are ints, one correctly-rounded double division per pair.
    """
    t = docs.select(F.col(id_col), F.col(text_col))
    a = t.select(
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("__ta"),
    )
    b = t.select(
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("__tb"),
    )
    # EXPLICIT partition count: a bare repartition(cols) is itself
    # AQE-coalesced back to one partition on these tiny byte sizes —
    # the number is the point, not the hashing
    n_parts = pairs.sparkSession.sparkContext.defaultParallelism
    j = (
        pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
        .repartition(n_parts, F.col("id_a"), F.col("id_b"))
    )
    dist = F.levenshtein("__ta", "__tb")
    sim = F.lit(1.0) - dist / F.greatest(
        F.length("__ta"), F.length("__tb"), F.lit(1)
    )
    # The similarity threshold must NOT be a pushable predicate:
    # Catalyst rewrites a plain filter in terms of the underlying
    # expression and sinks it THROUGH the repartition into the join
    # condition itself — putting the Levenshtein back into the
    # single-split join stage the repartition exists to escape
    # (observed in the optimized plan: `Join Inner, ((1.0 - lev...)
    # >= 0.8 AND ...)`). Adding a value-neutral non-deterministic
    # term (0 * rand, fixed seed) pins the filter above the exchange;
    # output values are bit-identical.
    guard = F.lit(0.0) * F.rand(seed=0)
    return (
        j.select(
            "id_a",
            "id_b",
            dist.alias("edit_dist"),
            F.round(sim, 6).alias("edit_sim"),
            (sim + guard).alias("__sim"),
        )
        .filter(F.col("__sim") >= min_sim)
        .drop("__sim")
    )
