"""JSONL corpus source/sink — the interchange format LLM training
pipelines actually ship (one JSON object per line, gzip-compressed
shards).

Beyond-reference surface (the reference engine reads GTFS/MDB only;
SURVEY §2.1). Design rules for 100 TB:

- **Never infer schema.** Schema inference is a full extra pass over
  the data; both readers require an explicit ``StructType`` (with a
  documents-table default).
- **Corrupt lines are data, not exceptions.** Web-scale JSONL always
  contains truncated shards and invalid UTF-8; ``read_jsonl`` reads
  PERMISSIVE with a corrupt-record capture column so callers split the
  good rows from a quarantine frame instead of failing the job (or
  silently dropping lines, which skews dedup statistics downstream).
- **Compression comes from the file extension.** Spark's text codecs
  handle ``.gz``/``.bz2``/``.zst`` transparently on read; the writer
  takes an explicit codec. Note gzip shards are NOT splittable — one
  task per shard regardless of size, so writers should keep shards
  ≤ ~1 GB (``target_shards`` below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: default schema: the documents table (TESTDATA.md)
DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

_CORRUPT = "__corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL path (file, directory, or glob; compressed ok).

    Returns ``(good, quarantine)``: ``good`` has exactly ``schema``'s
    columns; ``quarantine`` is ``(line,)`` — the raw text of every line
    Spark could not parse against the schema, for audit/repair. Both
    are lazy views of ONE read (the quarantine filter prunes to the
    corrupt column, so the good-path scan doesn't pay for it).
    """
    # text source + from_json, NOT spark.read.json: the json file
    # source refuses any query whose referenced set reduces to the
    # corrupt-record column alone (SPARK-21610) — which includes
    # ``good.count()`` after column pruning — so corrupt-capture
    # through it is a trap for downstream aggregates. from_json has no
    # such restriction and costs the same single parse per line.
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    parsed = F.from_json(
        F.col("value"), read_schema,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
    )
    base = (
        spark.read.text(path)
        .filter(F.trim(F.col("value")) != "")  # json readers skip blanks
        .select(F.col("value"), parsed.alias("__p"))
    )
    good = base.filter(F.col(f"__p.{_CORRUPT}").isNull()).select(
        *[F.col(f"__p.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = (
        base.filter(F.col(f"__p.{_CORRUPT}").isNotNull())
        .select(F.col("value").alias("line"))
    )
    return good, quarantine


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    target_shards: int | None = None,
) -> None:
    """Write ``df`` as JSONL shards under ``path``.

    ``target_shards`` repartitions before the write — set it so each
    (compressed) shard lands well under ~1 GB, since gzip shards are
    read by a single task each. ``None`` keeps the incoming
    partitioning (right when the upstream stage already sized its
    partitions).
    """
    out = df.repartition(target_shards) if target_shards else df
    writer = out.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
