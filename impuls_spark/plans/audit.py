"""Physical-plan red-flag classification.

Shared by ``scripts/plan_audit.py`` and the plan-assertion tests so
every surface applies the SAME adjudication:

* An ``Exchange SinglePartition`` is a red flag ONLY when it is
  data-proportional — a global Sort / unpartitioned Window funneling
  the row stream through one task. The final merge of a keyless
  (scalar) aggregate also plans as ``Exchange SinglePartition``, but
  its input is one row per upstream partition (the partial aggregate
  already reduced), bounded by the partition count, not the data — the
  same class as a broadcast one-row cross join. The classifier keys on
  the exchange's child node: a partial ``*Aggregate(keys=[]`` child
  means scalar reduce, anything else is flagged.

r8 note: the r7 audit regexed ``Exchange SinglePartition`` against
``explain("formatted")`` output, where the node name and its arguments
print on SEPARATE lines — the check could never fire. Classification
now runs on ``executedPlan().toString()``, where the argument list is
inline.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "single_partition_stages",
    "data_proportional_single_partitions",
]

# HashAggregate prints "keys=[...]", SortAggregate prints "key=[...]"
_SCALAR_REDUCE_CHILD = re.compile(
    r"(Hash|Sort|ObjectHash)Aggregate\(keys?=\[\]"
)


def physical_plan(df: DataFrame) -> str:
    """The executed-plan tree as text (argument lists inline, unlike
    ``explain("formatted")``)."""
    return df._jdf.queryExecution().executedPlan().toString()


def single_partition_stages(plan: str) -> list[tuple[str, bool]]:
    """Every ``Exchange SinglePartition`` in the plan text, paired with
    whether it is a benign scalar reduce (child is a keyless partial
    aggregate)."""
    lines = plan.splitlines()
    found: list[tuple[str, bool]] = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        if "ReusedExchange" in line:
            # a LEAF that embeds the reused exchange's description —
            # it has no child line of its own, and the original
            # Exchange node is classified where it is defined
            continue
        child = next(
            (l for l in lines[i + 1:] if l.strip("+-: *(")), ""
        )
        found.append((line.strip(), bool(_SCALAR_REDUCE_CHILD.search(child))))
    return found


def data_proportional_single_partitions(plan: str) -> list[str]:
    """The offending stages: single-partition exchanges whose input is
    NOT a scalar reduce — i.e. row-scale data forced through one task
    (global Sort, unpartitioned Window). Empty list = plan is clean."""
    return [line for line, scalar in single_partition_stages(plan) if not scalar]
