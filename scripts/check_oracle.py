"""Local approximation of the driver's correctness harness.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, sorted column
names, and an order-insensitive value hash. Usage:

    python scripts/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    body = df.to_csv(index=False, float_format="%.6f").encode()
    return hashlib.sha256(body).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("oracle_check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows-only {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        a, b = norm(sdf), norm(ddf)
        problems = []
        if len(a) != len(b):
            problems.append(f"rows {len(a)} vs {len(b)}")
        if list(a.columns) != list(b.columns):
            problems.append(f"cols {list(a.columns)} vs {list(b.columns)}")
        elif value_hash(a) != value_hash(b):
            problems.append("value hash mismatch")
            diff = a.compare(b) if len(a) == len(b) else None
            if diff is not None and not diff.empty:
                problems.append(f"first diffs:\n{diff.head(5)}")
        if problems:
            print(f"FAIL {name}: {'; '.join(str(p) for p in problems)}")
            failed.append(name)
        else:
            print(f"ok   {name}: {len(a)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{n_run - len(failed)}/{n_run} matched ({len(qs)} registered)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
