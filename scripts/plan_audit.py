"""Plan-quality audit: for every showcase query, inspect the physical
plan and report the operators that matter at scale — scan pushdown,
join strategies, exchange (shuffle) counts, codegen coverage, and
red flags (cartesian products, unpartitioned windows).

Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    flags_total = 0
    for name, fn in e.queries().items():
        try:
            import contextlib
            import io

            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as ex:
            print(f"{name}: PLAN ERROR {ex}")
            flags_total += 1
            continue

        n_exchange = len(re.findall(r"\bExchange\b", plan))
        n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        n_bnlj = len(re.findall(r"BroadcastNestedLoopJoin", plan))
        n_cart = len(re.findall(r"CartesianProduct", plan))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed_any = any(p.strip() for p in pushed)
        n_pyudf = len(re.findall(r"(BatchEvalPython|ArrowEvalPython)", plan))
        n_pandas = len(re.findall(r"(FlatMapGroupsInPandas|MapInPandas)", plan))
        global_win = len(re.findall(r"Window.*SinglePartition|Exchange SinglePartition", plan))

        flags = []
        if n_cart:
            flags.append(f"CARTESIAN x{n_cart}")
        if n_pyudf:
            flags.append(f"ROW_PYTHON_UDF x{n_pyudf}")
        if global_win:
            # promoted to a red flag in r7: every registered query
            # measured 0 after the Merge renumbering work, so any
            # appearance is a regression
            flags.append(f"SINGLE_PARTITION x{global_win}")
        if flags:
            flags_total += 1

        print(
            f"{name:28s} exch={n_exchange:2d} bhj={n_bhj} smj={n_smj} "
            f"bnlj={n_bnlj} pandas={n_pandas} single_part_exch={global_win} "
            f"pushed={'y' if pushed_any else '-'} {' '.join(flags)}"
        )
    print(f"\nqueries with red flags: {flags_total}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
