"""ExecuteSQL — run one arbitrary SQL statement against the feed.

Parity target: reference impuls/tasks/exec_sql.py:7-17, where tasks are
raw SQLite statements (heavily UPDATE/DELETE-shaped in the example
pipelines). Spark SQL has no UPDATE/DELETE over DataFrames, so this
operator carries a tiny rewrite layer (SURVEY §4.2.1):

- ``UPDATE t SET c1=e1, c2=e2 WHERE p``  ->
  ``t.withColumn(c1, when(p, e1).otherwise(c1))...`` (all SET
  expressions evaluated against the pre-update row, like SQL)
- ``DELETE FROM t WHERE p``              ->  ``t.filter(~p)``
- anything else (SELECT/INSERT INTO ... SELECT) runs via ``spark.sql``
  against temp views named exactly like the 17 tables.

SQLite-only scalar functions used by reference pipelines are
registered as Spark UDFs by :func:`register_udfs` (``unicode_casefold``,
``re_sub``) — kept off hot paths.
"""

from __future__ import annotations

import re
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..errors import DataError
from ..feed import FeedDataset
from ..task import BaseTask, TaskRuntime

#: Temp views are SESSION-global, so two pipelines running on driver
#: threads (MultiFile parallel intermediates) would clobber each other's
#: table views. ``spark.sql`` analyzes eagerly — the view subtree is
#: substituted into the plan at call time — so holding this lock only
#: for the register-views + parse window makes concurrent ExecuteSQL
#: safe without per-thread view renaming.
#:
#: CLASSIC-MODE ASSUMPTION: eager analysis holds for classic PySpark
#: (the JVM analyzer resolves the view subtree inside ``spark.sql``).
#: Under Spark Connect, analysis is deferred to execution, so the lock
#: would no longer pin which view snapshot a statement sees — porting
#: to Connect requires per-thread suffixed views
#: (``feed.register_views(suffix)`` exists for this) plus rewriting
#: table names in the statement before submission.
_SQL_VIEW_LOCK = threading.Lock()


def _sql_over_views(feed: FeedDataset, spark: SparkSession, statement: str) -> DataFrame:
    with _SQL_VIEW_LOCK:
        feed.register_views()
        return spark.sql(statement)

_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<table>\w+)\s+SET\s+(?P<sets>.*?)(?:\s+WHERE\s+(?P<where>.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<table>\w+)(?:\s+WHERE\s+(?P<where>.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(?P<ignore>OR\s+IGNORE\s+)?INTO\s+(?P<table>\w+)\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?(?P<body>(SELECT|VALUES)\s+.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _split_set_clauses(sets: str) -> list[tuple[str, str]]:
    """Split ``a = e1, b = e2`` on top-level commas (not inside parens
    or quotes)."""
    parts: list[str] = []
    depth = 0
    quote: str | None = None
    cur = []
    for ch in sets:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    out = []
    for p in parts:
        col, _, expr = p.partition("=")
        out.append((col.strip().strip('"'), expr.strip()))
    return out


def apply_update(df: DataFrame, sets: str, where: str | None) -> DataFrame:
    """Rewrite an UPDATE over ``df``. All SET right-hand sides see the
    *pre-update* row (SQL semantics), so expressions are computed into
    temporaries first, then swapped in."""
    pred = F.expr(where) if where else F.lit(True)
    assignments = _split_set_clauses(sets)
    tmp_names = []
    for i, (col, expr) in enumerate(assignments):
        tmp = f"__set_{i}"
        tmp_names.append((tmp, col))
        df = df.withColumn(tmp, F.when(pred, F.expr(expr)).otherwise(F.col(col)))
    for tmp, col in tmp_names:
        df = df.withColumn(col, F.col(tmp)).drop(tmp)
    return df


def apply_delete(df: DataFrame, where: str | None) -> DataFrame:
    if not where:
        return df.filter(F.lit(False))
    pred = F.expr(where)
    # SQL DELETE keeps rows where the predicate is NULL; ~NULL is NULL
    # which filter() drops — coalesce to keep them
    return df.filter(~F.coalesce(pred, F.lit(False)))


def _strip_qualifier(text: str, table: str) -> str:
    """Remove ``table.`` qualifiers outside string literals. A plain
    ``re.sub`` would also rewrite occurrences INSIDE quoted strings
    (``replace(name, 'stops.', '')`` must keep its literal)."""
    out: list[str] = []
    quote: str | None = None
    i, n, tlen = 0, len(text), len(table)
    while i < n:
        ch = text[i]
        if quote:
            out.append(ch)
            if ch == quote:
                # SQL escapes quotes by doubling; '' stays inside the literal
                if i + 1 < n and text[i + 1] == quote:
                    out.append(text[i + 1])
                    i += 1
                else:
                    quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
            out.append(ch)
            i += 1
            continue
        if (
            text[i : i + tlen].lower() == table.lower()
            and i + tlen < n
            and text[i + tlen] == "."
            and (i == 0 or not (text[i - 1].isalnum() or text[i - 1] in "_."))
        ):
            i += tlen + 1  # drop "table."
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def register_udfs(spark: SparkSession) -> None:
    """Register the reference's custom SQLite scalar functions
    (impuls/db.py:211-215: unicode_lower/upper/casefold/title, re_sub)
    as Spark UDFs for ExecuteSQL parity. Python-side by design — these
    mirror CPython's exact Unicode tables (Spark's builtin lower/upper
    differ on e.g. Turkish dotted-I and titlecasing), and reference
    pipelines use them on dimension-sized name columns."""
    if getattr(spark, "_impuls_udfs_registered", False):
        return

    def _wrap(fn):
        return lambda s: fn(s) if s is not None else None

    def re_sub(pattern: str | None, repl: str | None, s: str | None) -> str | None:
        if pattern is None or repl is None or s is None:
            return None
        return re.sub(pattern, repl, s)

    spark.udf.register("unicode_lower", _wrap(str.lower), "string")
    spark.udf.register("unicode_upper", _wrap(str.upper), "string")
    spark.udf.register("unicode_casefold", _wrap(str.casefold), "string")
    spark.udf.register("unicode_title", _wrap(str.title), "string")
    spark.udf.register("re_sub", re_sub, "string")
    spark._impuls_udfs_registered = True  # type: ignore[attr-defined]


class ExecuteSQL(BaseTask):
    """Run ``statement``. ``table`` names the table replaced by the
    statement's result for UPDATE/DELETE; SELECT-shaped statements can
    also replace a table when ``table`` is given (INSERT ... SELECT
    becomes union via plain SQL on views otherwise)."""

    def __init__(self, table: str | None = None, statement: str = "") -> None:
        self.table = table
        self.statement = statement

    @property
    def name(self) -> str:
        return f"ExecuteSQL({self.statement[:40]!r})"

    def transform(self, feed: FeedDataset, runtime: TaskRuntime) -> FeedDataset:
        register_udfs(runtime.spark)
        m = _UPDATE_RE.match(self.statement)
        if m:
            # reference statements often table-qualify columns
            # (``UPDATE routes SET ... WHERE routes.type = 3``); strip
            # the qualifier — the expressions run against that one table
            table = m["table"]
            sets = _strip_qualifier(m["sets"], table)
            where = _strip_qualifier(m["where"], table) if m["where"] else None
            df = apply_update(feed[table], sets, where)
            return feed.with_table(table, df)
        m = _DELETE_RE.match(self.statement)
        if m:
            # SQLite runs with PRAGMA foreign_keys=1 and every reference
            # FK is ON DELETE CASCADE (impuls/db.py:210, model/*.py), so
            # a raw DELETE prunes dependents too — e.g. radom's
            # RetainKnownCalendars drops the trips of removed day types
            table = m["table"]
            where = _strip_qualifier(m["where"], table) if m["where"] else None
            return feed.cascade_delete(table, apply_delete(feed[table], where))
        m = _INSERT_RE.match(self.statement)
        if m:
            # INSERT [OR IGNORE] INTO t [(cols)] SELECT ... | VALUES ...
            # -> union (OR IGNORE: drop rows whose PK already exists,
            # matching SQLite's conflict-skip)
            table = m["table"]
            body = m["body"]
            if body.upper().startswith("VALUES"):
                body = f"SELECT * FROM ({body})"
            rows = _sql_over_views(feed, runtime.spark, body)
            if m["cols"]:
                names = [c.strip().strip('"') for c in m["cols"].split(",")]
                unknown = set(names) - set(feed[table].columns)
                if unknown:
                    # silent NULL-fill would mask typos (e.g. GTFS
                    # 'route_type' vs internal 'type')
                    raise DataError(
                        f"INSERT INTO {table}: unknown columns {sorted(unknown)}; "
                        f"table columns are {feed[table].columns}"
                    )
                rows = rows.toDF(*names)
            else:
                rows = rows.toDF(*feed[table].columns[: len(rows.columns)])
            base = feed[table]
            for f_ in base.schema.fields:
                if f_.name in rows.columns:
                    rows = rows.withColumn(f_.name, F.col(f_.name).cast(f_.dataType))
            if m["ignore"]:
                from .. import schema as S

                pk = list(S.TABLES[table].pk)
                rows = rows.join(base.select(*pk), pk, "left_anti")
            return feed.insert(table, rows)
        result = _sql_over_views(feed, runtime.spark, self.statement)
        if self.table is not None:
            return feed.with_table(self.table, result)
        return feed
