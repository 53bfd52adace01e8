"""Relational operator showcase on the synthetic TPC-H-ish tables.

One entry per operator pattern from SURVEY §2 (the GTFS-native
implementations live in ``impuls_spark.operators``; these re-express the
same dataflow shapes over the harness tables so a DuckDB oracle can
verify them). Every computed column is aliased identically in the Spark
plan and the SQL string — the harness hash-compares by sorted column
name.

Scale discipline (the point of the exercise): dimension joins are
broadcast, aggregations are partial-agg friendly (plain groupBy on
low-cardinality keys), windows partition by the natural key, and no
query ever collects to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.gtfs import format_gtfs_time, parse_gtfs_time


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which the vectorized
    parquet reader rejects; read nanos as long and truncate to micros
    (integer DIV — double division loses precision at 1.7e18)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


# ---------------------------------------------------------------------------
# q01 — flagship aggregation (ExecuteSQL / groupBy-agg surface, T1/§2.3)
# ---------------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.count("*").alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q02 — last-per-group + dim join (GenerateTripHeadsign, T3)
# ---------------------------------------------------------------------------

def q02_last_item_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    # l_linenumber ties exist in the synthetic data — tie-break by
    # l_partkey so both engines pick the same row deterministically
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_linenumber").desc(), F.col("l_partkey").desc()
    )
    last = (
        li.select("l_orderkey", "l_partkey", "l_linenumber")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    return (
        last.join(F.broadcast(part.select("p_partkey", "p_name")),
                  last.l_partkey == part.p_partkey)
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("p_name").alias("last_part_name"),
        )
    )


Q02_SQL = """
WITH last AS (
  SELECT l_orderkey, l_partkey,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber DESC, l_partkey DESC) AS rn
  FROM lineitem
)
SELECT l_orderkey AS order_key, p_name AS last_part_name
FROM last JOIN part ON l_partkey = p_partkey
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# q03 — anti-join existence prune (RemoveUnusedEntities, T8)
# ---------------------------------------------------------------------------

def q03_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    unused = cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
    return unused.groupBy("c_mktsegment").agg(F.count("*").alias("n_unused"))


Q03_SQL = """
SELECT c_mktsegment, count(*) AS n_unused
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# q04 — dedup by content hash (SimplifyCalendars, T6)
# ---------------------------------------------------------------------------

def q04_dedup_parts_by_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.min("p_partkey").alias("canonical_partkey"),
            (F.count("*") - 1).alias("n_dupes"),
        )
        .filter(F.col("n_dupes") > 0)
    )


Q04_SQL = """
SELECT p_brand, p_type, p_size,
       min(p_partkey) AS canonical_partkey,
       count(*) - 1 AS n_dupes
FROM part
GROUP BY p_brand, p_type, p_size
HAVING count(*) - 1 > 0
"""


# ---------------------------------------------------------------------------
# q05 — predicated mass UPDATE rewrite (ExecuteSQL T1: UPDATE -> when/otherwise)
# ---------------------------------------------------------------------------

def q05_mass_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    updated = orders.withColumn(
        "o_orderpriority",
        F.when(F.col("o_totalprice") > 300000, F.lit("0-EXPEDITED")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    return updated.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


Q05_SQL = """
SELECT CASE WHEN o_totalprice > 300000 THEN '0-EXPEDITED' ELSE o_orderpriority END
         AS o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q06 — explicit FK cascade delete (T8 + SURVEY §4.2.2)
# ---------------------------------------------------------------------------

def q06_cascade_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    kept_c = cust.filter(F.col("c_acctbal") >= 0)
    kept_o = orders.join(kept_c.select("c_custkey"),
                         orders.o_custkey == kept_c.c_custkey, "left_semi")
    kept_l = li.join(kept_o.select("o_orderkey"),
                     li.l_orderkey == kept_o.o_orderkey, "left_semi")
    return (
        kept_c.agg(F.count("*").alias("n_rows")).select(F.lit("customer").alias("table_name"), "n_rows")
        .unionByName(kept_o.agg(F.count("*").alias("n_rows")).select(F.lit("orders").alias("table_name"), "n_rows"))
        .unionByName(kept_l.agg(F.count("*").alias("n_rows")).select(F.lit("lineitem").alias("table_name"), "n_rows"))
    )


Q06_SQL = """
WITH kept_c AS (SELECT * FROM customer WHERE c_acctbal >= 0),
     kept_o AS (SELECT * FROM orders WHERE EXISTS
                  (SELECT 1 FROM kept_c WHERE c_custkey = o_custkey)),
     kept_l AS (SELECT * FROM lineitem WHERE EXISTS
                  (SELECT 1 FROM kept_o WHERE o_orderkey = l_orderkey))
SELECT 'customer' AS table_name, count(*) AS n_rows FROM kept_c
UNION ALL SELECT 'orders', count(*) FROM kept_o
UNION ALL SELECT 'lineitem', count(*) FROM kept_l
"""


# ---------------------------------------------------------------------------
# q07 — star join over broadcast dims (§2.3 equi-joins)
# ---------------------------------------------------------------------------

def q07_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q07_SQL = """
SELECT r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ---------------------------------------------------------------------------
# q08 — sessionization: lag + running sum (SplitTripLegs, T10)
# ---------------------------------------------------------------------------

SESSION_GAP_S = 1800


def q08_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.withColumn("__prev", F.lag(F.unix_timestamp("ts")).over(w))
        .withColumn(
            "__new",
            (F.col("__prev").isNull()
             | ((F.unix_timestamp("ts") - F.col("__prev")) > SESSION_GAP_S)).cast("int"),
        )
        .withColumn("session_id", F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("session_len"))
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("session_len").alias("max_session_len"),
    )


Q08_SQL = f"""
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
per_session AS (
  SELECT user_id, session_id, count(*) AS session_len
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions, max(session_len) AS max_session_len
FROM per_session GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# q09 — feed merge with keyed dedup preference (Merge, T11)
# ---------------------------------------------------------------------------

def q09_merge_feeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    feed_a = orders.filter(F.col("o_orderkey") % 3 < 2).withColumn("src", F.lit("A"))
    feed_b = orders.filter(F.col("o_orderkey") % 3 > 0).withColumn("src", F.lit("B"))
    merged = feed_a.unionByName(feed_b)
    w = Window.partitionBy("o_orderkey").orderBy("src")  # first feed wins
    surviving = merged.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return surviving.groupBy("src").agg(F.count("*").alias("n_orders"))


Q09_SQL = """
WITH both_feeds AS (
  SELECT *, 'A' AS src FROM orders WHERE o_orderkey % 3 < 2
  UNION ALL
  SELECT *, 'B' AS src FROM orders WHERE o_orderkey % 3 > 0
),
ranked AS (
  SELECT src, row_number() OVER (PARTITION BY o_orderkey ORDER BY src) AS rn
  FROM both_feeds
)
SELECT src, count(*) AS n_orders FROM ranked WHERE rn = 1 GROUP BY src
"""


# ---------------------------------------------------------------------------
# q10 — geo proximity dedup candidates (Merge 10 m rule, T11)
# ---------------------------------------------------------------------------

def q10_geo_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _t(spark, sf_dir, "supplier")
    located = sup.select(
        "s_suppkey",
        "s_nationkey",
        (F.lit(52.0) + (F.col("s_suppkey") % 200) * 5.0e-5).alias("lat"),
        F.lit(21.0).alias("lon"),
    )
    a, b = located.alias("a"), located.alias("b")
    from ..functions.geo import earth_distance_m

    pairs = (
        a.join(b, (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
               & (F.col("a.s_suppkey") < F.col("b.s_suppkey")))
        .filter(
            earth_distance_m(F.col("a.lat"), F.col("a.lon"),
                             F.col("b.lat"), F.col("b.lon")) <= 10.0
        )
        .select(
            F.col("a.s_suppkey").alias("keep_key"),
            F.col("b.s_suppkey").alias("dupe_key"),
        )
    )
    return pairs


Q10_SQL = """
WITH located AS (
  SELECT s_suppkey, s_nationkey,
         52.0 + (s_suppkey % 200) * 5.0e-5 AS lat, 21.0 AS lon
  FROM supplier
)
SELECT a.s_suppkey AS keep_key, b.s_suppkey AS dupe_key
FROM located a JOIN located b
  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
WHERE 2 * 6371008.8 * asin(sqrt(
        pow(sin(radians(b.lat - a.lat) / 2), 2)
        + cos(radians(a.lat)) * cos(radians(b.lat))
          * pow(sin(radians(b.lon - a.lon) / 2), 2))) <= 10.0
"""


# ---------------------------------------------------------------------------
# q11 — date-range truncation (TruncateCalendars, T7)
# ---------------------------------------------------------------------------

def q11_truncate_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-08").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-22").cast("timestamp"))
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
    )


Q11_SQL = """
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-22'
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q12 — per-weekday latest-activity template (ExtendCalendars, T5)
# ---------------------------------------------------------------------------

def q12_weekday_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format("ts", "EEEE").alias("weekday"),
        F.to_date("ts").alias("day"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("weekday").orderBy(F.col("day").desc())
    return (
        daily.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("weekday", F.col("day").cast("string").alias("latest_day"),
                F.col("n").alias("n_on_latest"))
    )


Q12_SQL = """
WITH daily AS (
  SELECT dayname(ts) AS weekday, ts::date AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT weekday, day, n,
         row_number() OVER (PARTITION BY weekday ORDER BY day DESC) AS rn
  FROM daily
)
SELECT weekday, day::varchar AS latest_day, n AS n_on_latest
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# q13 — curation patch upsert (ModifyStopsFromCSV, T9)
# ---------------------------------------------------------------------------

_PATCH_ROWS = [(0, "PATCHED ALGERIA"), (5, ""), (10, "PATCHED IRAN"), (999, "NO SUCH")]


def q13_patch_from_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    patch = spark.createDataFrame(_PATCH_ROWS, "n_nationkey int, patch_name string")
    return (
        nation.join(F.broadcast(patch), "n_nationkey", "left")
        .select(
            "n_nationkey",
            F.coalesce(F.nullif(F.col("patch_name"), F.lit("")), F.col("n_name")).alias(
                "final_name"
            ),
        )
    )


Q13_SQL = """
SELECT n_nationkey,
       coalesce(nullif(patch_name, ''), n_name) AS final_name
FROM nation
LEFT JOIN (VALUES (0, 'PATCHED ALGERIA'), (5, ''), (10, 'PATCHED IRAN'),
                  (999, 'NO SUCH')) AS p(k, patch_name)
  ON n_nationkey = k
"""


# ---------------------------------------------------------------------------
# q14 — constant-row insert (AddEntity, T2)
# ---------------------------------------------------------------------------

def q14_add_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    # JVM-built constant row (same rows as createDataFrame([...]),
    # without parallelizing one tuple into 32 Python-backed partitions
    # — the r14 manifest-write finding, same fix as AddEntity)
    from ..tools.rows import single_row_df

    new_row = single_row_df(
        spark, "r_regionkey int, r_name string", 99, "SYNTHETIC REGION"
    )
    return region.unionByName(new_row)


Q14_SQL = """
SELECT r_regionkey, r_name FROM region
UNION ALL SELECT 99, 'SYNTHETIC REGION'
"""


# ---------------------------------------------------------------------------
# q15 — most-common-value per group (route long-name generation pattern)
# ---------------------------------------------------------------------------

def q15_top_type_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    counted = part.groupBy("p_brand", "p_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("p_brand").orderBy(F.col("n").desc(), F.col("p_type"))
    return (
        counted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("p_brand", F.col("p_type").alias("top_type"), F.col("n").alias("n_parts"))
    )


Q15_SQL = """
WITH counted AS (
  SELECT p_brand, p_type, count(*) AS n FROM part GROUP BY p_brand, p_type
),
ranked AS (
  SELECT p_brand, p_type, n,
         row_number() OVER (PARTITION BY p_brand ORDER BY n DESC, p_type) AS rn
  FROM counted
)
SELECT p_brand, p_type AS top_type, n AS n_parts FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# q16 — ordered-rule direction assignment (AssignDirections, T4)
# ---------------------------------------------------------------------------

def q16_assign_directions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.min(F.when(F.col("l_partkey") % 2 == 0, F.col("l_linenumber"))).alias("__even"),
        F.min(F.when(F.col("l_partkey") % 2 == 1, F.col("l_linenumber"))).alias("__odd"),
    )
    return (
        per_order.filter(F.col("__even").isNotNull() & F.col("__odd").isNotNull())
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.when(F.col("__even") < F.col("__odd"), F.lit(1)).otherwise(F.lit(0)).alias(
                "direction"
            ),
        )
    )


Q16_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         min(CASE WHEN l_partkey % 2 = 0 THEN l_linenumber END) AS even_first,
         min(CASE WHEN l_partkey % 2 = 1 THEN l_linenumber END) AS odd_first
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey AS order_key,
       CASE WHEN even_first < odd_first THEN 1 ELSE 0 END AS direction
FROM per_order
WHERE even_first IS NOT NULL AND odd_first IS NOT NULL
"""


# ---------------------------------------------------------------------------
# q17 — stable line-number surrogate ids (S2/S4, SURVEY §4.2.4)
# ---------------------------------------------------------------------------

def q17_line_number_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the loader's bucketed parallel ranker (operators.ranks), not a
    # bare global window — this showcase must carry the same plan shape
    # the package ships (r8: the fixed audit flagged the old
    # Window.orderBy here as the single-partition sort it was)
    from ..operators.ranks import distributed_row_number

    ev = _t(spark, sf_dir, "events")
    sub = ev.filter(F.col("event_id") <= 500).select("event_id", "ts")
    return (
        distributed_row_number(sub, ["ts", "event_id"], "line_no",
                               span="global")
        .select("event_id", "line_no")
    )


Q17_SQL = """
SELECT event_id,
       row_number() OVER (ORDER BY ts, event_id) AS line_no
FROM events WHERE event_id <= 500
"""


# ---------------------------------------------------------------------------
# q18 — extended route-type recode (S2 CASE-chain conversions)
# ---------------------------------------------------------------------------

def q18_route_type_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.gtfs import recode_gtfs_route_type

    part = _t(spark, sf_dir, "part")
    coded = part.select(((F.col("p_partkey") % 18) * 100).alias("ext_code"))
    return (
        coded.select(recode_gtfs_route_type(F.col("ext_code")).alias("base_type"))
        .groupBy("base_type")
        .agg(F.count("*").alias("n"))
    )


Q18_SQL = """
WITH coded AS (SELECT (p_partkey % 18) * 100 AS c FROM part)
SELECT CASE
         WHEN c IN (0,1,2,3,4,5,6,7,11,12) THEN c
         WHEN c >= 100 AND c < 200 THEN 2
         WHEN c >= 200 AND c < 300 THEN 3
         WHEN c >= 400 AND c < 500 THEN 1
         WHEN c >= 700 AND c < 800 THEN 3
         WHEN c = 800 THEN 11
         WHEN c >= 900 AND c < 1000 THEN 0
         WHEN c = 1000 THEN 4
         WHEN c = 1300 THEN 6
         WHEN c = 1400 THEN 7
       END AS base_type,
       count(*) AS n
FROM coded GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q19 — GTFS time roundtrip fidelity (S2: >24h HH:MM:SS <-> seconds)
# ---------------------------------------------------------------------------

def q19_time_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    secs = (F.col("event_id") % 180000).cast("int")  # up to 50:00:00
    roundtripped = parse_gtfs_time(format_gtfs_time(secs))
    return ev.groupBy("event_type").agg(
        F.sum(roundtripped).alias("total_secs"),
        F.count("*").alias("n"),
    )


Q19_SQL = """
SELECT event_type, sum(event_id % 180000)::bigint AS total_secs, count(*) AS n
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q20 — FeedInfo merge reduce (Merge T11: min/max dates + version join)
# ---------------------------------------------------------------------------

def q20_feed_info_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.min(F.to_date("o_orderdate")).cast("string").alias("start_date"),
        F.max(F.to_date("o_orderdate")).cast("string").alias("end_date"),
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), "/").alias(
            "version"
        ),
        F.count("*").alias("n_orders"),
    )


Q20_SQL = """
SELECT min(o_orderdate::date)::varchar AS start_date,
       max(o_orderdate::date)::varchar AS end_date,
       string_agg(DISTINCT o_orderpriority, '/' ORDER BY o_orderpriority) AS version,
       count(*) AS n_orders
FROM orders
"""


# ---------------------------------------------------------------------------
# q21 — declarative constraint validation (validate() operator pattern,
# SURVEY §4.1: CHECK/FK enforcement as an explicit violations report)
# ---------------------------------------------------------------------------

def q21_validate_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")

    def count_bad(df, table, name, valid):
        return df.filter(~F.coalesce(valid, F.lit(False))).agg(
            F.count("*").alias("n_violations")
        ).select(F.lit(table).alias("table_name"), F.lit(name).alias("constraint"),
                 "n_violations")

    dangling = orders.join(cust.select(F.col("c_custkey").alias("o_custkey")),
                           "o_custkey", "left_anti").agg(
        F.count("*").alias("n_violations")
    ).select(F.lit("orders").alias("table_name"),
             F.lit("fk:o_custkey->customer").alias("constraint"), "n_violations")

    return (
        count_bad(li, "lineitem", "check:quantity_1_50",
                  F.col("l_quantity").between(1.0, 50.0))
        .unionByName(count_bad(li, "lineitem", "check:discount_0_0.05",
                               F.col("l_discount").between(0.0, 0.05)))
        .unionByName(count_bad(li, "lineitem", "check:shipdate_not_null",
                               F.col("l_shipdate").isNotNull()))
        .unionByName(count_bad(orders, "orders", "check:status_in_enum",
                               F.col("o_orderstatus").isin("O", "F", "P")))
        .unionByName(count_bad(orders, "orders", "check:totalprice_nonnegative",
                               F.col("o_totalprice") >= 0))
        .unionByName(dangling)
    )


Q21_SQL = """
SELECT 'lineitem' AS table_name, 'check:quantity_1_50' AS constraint,
       count(*) FILTER (WHERE NOT coalesce(l_quantity BETWEEN 1.0 AND 50.0, false))
         AS n_violations FROM lineitem
UNION ALL
SELECT 'lineitem', 'check:discount_0_0.05',
       count(*) FILTER (WHERE NOT coalesce(l_discount BETWEEN 0.0 AND 0.05, false))
  FROM lineitem
UNION ALL
SELECT 'lineitem', 'check:shipdate_not_null',
       count(*) FILTER (WHERE l_shipdate IS NULL) FROM lineitem
UNION ALL
SELECT 'orders', 'check:status_in_enum',
       count(*) FILTER (WHERE NOT coalesce(o_orderstatus IN ('O','F','P'), false))
  FROM orders
UNION ALL
SELECT 'orders', 'check:totalprice_nonnegative',
       count(*) FILTER (WHERE NOT coalesce(o_totalprice >= 0, false)) FROM orders
UNION ALL
SELECT 'orders', 'fk:o_custkey->customer',
       count(*) FILTER (WHERE NOT EXISTS
         (SELECT 1 FROM customer WHERE c_custkey = o_custkey)) FROM orders
"""


# ---------------------------------------------------------------------------
# q22 — JSON extraction (§2.3 JSON row: the extra_fields escape hatch /
# json_extract at the GTFS sink, save.rs:104-108)
# ---------------------------------------------------------------------------

def q22_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("__k"))
        .groupBy("event_type")
        .agg(
            F.count(F.col("__k")).alias("n_with_k"),
            F.sum("__k").alias("sum_k"),
            F.max("__k").alias("max_k"),
        )
    )


Q22_SQL = """
SELECT event_type,
       count(json_extract(props, '$.k')) AS n_with_k,
       sum(json_extract(props, '$.k')::int)::bigint AS sum_k,
       max(json_extract(props, '$.k')::int) AS max_k
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q23 — string-function surface (§2.3: substr/rtrim/replace/concat/
# upper/lower + regexp_replace — the FixStopNames-style curation exprs)
# ---------------------------------------------------------------------------

def q23_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    name = F.col("p_name")
    return part.select(
        "p_partkey",
        F.upper(F.substring(name, 1, 8)).alias("prefix_upper"),
        F.rtrim(F.regexp_replace(name, r"[aeiou]", "")).alias("devoweled"),
        F.concat(F.lit("P:"), F.replace(name, F.lit(" "), F.lit("_"))).alias("keyed"),
        F.length(name).alias("name_len"),
    )


Q23_SQL = """
SELECT p_partkey,
       upper(substr(p_name, 1, 8)) AS prefix_upper,
       rtrim(regexp_replace(p_name, '[aeiou]', '', 'g')) AS devoweled,
       'P:' || replace(p_name, ' ', '_') AS keyed,
       length(p_name) AS name_len
FROM part
"""


# ---------------------------------------------------------------------------
# q24 — date-function surface (§2.3: to_date/date_format/truncation)
# ---------------------------------------------------------------------------

def q24_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("first_day"),
            F.max(F.dayofmonth("o_orderdate")).alias("max_dom"),
        )
    )


Q24_SQL = """
SELECT year(o_orderdate)::int AS y, month(o_orderdate)::int AS m,
       count(*) AS n_orders,
       min(strftime(o_orderdate, '%Y-%m-%d')) AS first_day,
       max(dayofmonth(o_orderdate))::int AS max_dom
FROM orders GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q25 — SaveGTFS roundtrip (S4: ordered CSV export, value formatting,
# empty-calendar filter, quoting). The only showcase query that touches
# the filesystem: it writes calendar.txt through the real save_gtfs sink
# (reference impuls/extern/gtfs/save.rs:168-269) and re-reads the bytes,
# so the oracle checks the *serialized* GTFS surface — bool 0/1 flags,
# yyyyMMdd dates, PK file order, and the WHERE monday OR ... filter
# (schema.rs:79-80) — not just the in-memory frame.
# ---------------------------------------------------------------------------

def q25_gtfs_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import re as _re
    import tempfile

    from ..feed import FeedDataset
    from ..sources.gtfs_read import _align, _with_line_numbers
    from ..sources.gtfs_write import save_gtfs

    nat = _t(spark, sf_dir, "nation")
    key = F.col("n_nationkey").cast("int")
    cal = nat.select(
        F.col("n_name").alias("calendar_id"),
        *[
            (F.shiftright(key, i).bitwiseAND(F.lit(1)) == 1).alias(day)
            for i, day in enumerate(
                ["monday", "tuesday", "wednesday", "thursday",
                 "friday", "saturday", "sunday"]
            )
        ],
        F.date_add(F.lit("2024-01-01").cast("date"), key).alias("start_date"),
        F.date_add(F.lit("2024-01-01").cast("date"), key * 7).alias("end_date"),
        # comma forces the writer's quote path (save.rs quoting parity)
        F.concat(F.col("n_name"), F.lit(", region "),
                 F.col("n_regionkey").cast("string")).alias("desc"),
    )
    feed = FeedDataset.empty(spark).with_table("calendars", _align(cal, "calendars"))

    header = ["service_id", "monday", "tuesday", "wednesday", "thursday",
              "friday", "saturday", "sunday", "start_date", "end_date",
              "calendar_desc"]
    out_dir = os.path.join(
        tempfile.gettempdir(),
        "q25_gtfs_" + _re.sub(r"[^A-Za-z0-9._-]", "_", sf_dir),
    )
    os.makedirs(out_dir, exist_ok=True)
    save_gtfs(feed, {"calendar.txt": header}, out_dir, ensure_order=True)

    written = spark.read.csv(
        f"{out_dir}/calendar.txt", header=True, quote='"', escape='"',
        # all columns stay strings: the query verifies the serialized text
    )
    return _with_line_numbers(written, "line_no")


Q25_SQL = """
SELECT n_name AS service_id,
       CAST((n_nationkey >> 0) & 1 AS VARCHAR) AS monday,
       CAST((n_nationkey >> 1) & 1 AS VARCHAR) AS tuesday,
       CAST((n_nationkey >> 2) & 1 AS VARCHAR) AS wednesday,
       CAST((n_nationkey >> 3) & 1 AS VARCHAR) AS thursday,
       CAST((n_nationkey >> 4) & 1 AS VARCHAR) AS friday,
       CAST((n_nationkey >> 5) & 1 AS VARCHAR) AS saturday,
       CAST((n_nationkey >> 6) & 1 AS VARCHAR) AS sunday,
       strftime(DATE '2024-01-01' + CAST(n_nationkey AS INT), '%Y%m%d')
           AS start_date,
       strftime(DATE '2024-01-01' + CAST(n_nationkey * 7 AS INT), '%Y%m%d')
           AS end_date,
       n_name || ', region ' || CAST(n_regionkey AS VARCHAR) AS calendar_desc,
       row_number() OVER (ORDER BY n_name) AS line_no
FROM nation
WHERE n_nationkey % 128 > 0
"""



# ---------------------------------------------------------------------------
# q26 — frequencies.txt export (S4: composite-key ordering, >24h times,
# bool flags) through the real save_gtfs sink, re-read byte-level
# ---------------------------------------------------------------------------

def q26_frequencies_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import re as _re
    import tempfile

    from ..feed import FeedDataset
    from ..sources.gtfs_read import _align, _with_line_numbers
    from ..sources.gtfs_write import save_gtfs

    nat = _t(spark, sf_dir, "nation")
    key = F.col("n_nationkey").cast("int")
    freq = nat.select(
        F.concat(F.lit("T"), F.col("n_regionkey").cast("string")).alias("trip_id"),
        (key * 3600).alias("start_time"),          # up to 24:00:00 — >24h legal
        (key * 3600 + 1800).alias("end_time"),
        (300 + key * 10).alias("headway"),
        (key % 2 == 1).alias("exact_times"),
    )
    feed = FeedDataset.empty(spark).with_table(
        "frequencies", _align(freq, "frequencies")
    )
    out_dir = os.path.join(
        tempfile.gettempdir(),
        "q26_gtfs_" + _re.sub(r"[^A-Za-z0-9._-]", "_", sf_dir),
    )
    os.makedirs(out_dir, exist_ok=True)
    header = ["trip_id", "start_time", "end_time", "headway_secs",
              "exact_times"]
    save_gtfs(feed, {"frequencies.txt": header}, out_dir, ensure_order=True)
    written = spark.read.csv(
        f"{out_dir}/frequencies.txt", header=True, quote='"', escape='"'
    )
    return _with_line_numbers(written, "line_no")


Q26_SQL = """
SELECT 'T' || CAST(n_regionkey AS VARCHAR) AS trip_id,
       printf('%02d:%02d:%02d', n_nationkey, 0, 0) AS start_time,
       printf('%02d:%02d:%02d', n_nationkey, 30, 0) AS end_time,
       CAST(300 + n_nationkey * 10 AS VARCHAR) AS headway_secs,
       CAST(n_nationkey % 2 AS VARCHAR) AS exact_times,
       row_number() OVER (ORDER BY 'T' || CAST(n_regionkey AS VARCHAR),
                          n_nationkey * 3600) AS line_no
FROM nation
"""


# ---------------------------------------------------------------------------
# q27 — as-of join (point-in-time enrichment; union + one keyed window,
# no range explosion — operators/temporal_join.py)
# ---------------------------------------------------------------------------

def q27_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r8: asof_join carries the matched right row as ONE struct so its
    # NULL payload fields survive (ADVICE r7) — re-verify this round
    from ..operators.temporal_join import asof_join

    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        purchases, views, on=["user_id"], left_ts="ts",
        tiebreak="event_id", prefix="view_",
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        F.col("value").alias("purchase_value"),
        "view_ts_us",
        F.col("view_event_id").alias("view_id"),
        "view_value",
    )


Q27_SQL = """
WITH u AS (
  SELECT user_id, epoch_us(ts) AS t, 0 AS side,
         event_id AS v_id, value AS v_value,
         NULL::BIGINT AS p_id, NULL::DOUBLE AS p_value
  FROM events WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, epoch_us(ts), 1, NULL, NULL, event_id, value
  FROM events WHERE event_type = 'purchase'
),
f AS (
  SELECT *,
         last_value(v_id IGNORE NULLS) OVER w AS view_id,
         last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER w
             AS view_ts_us,
         last_value(v_value IGNORE NULLS) OVER w AS view_value
  FROM u
  WINDOW w AS (PARTITION BY user_id
               ORDER BY t, side, coalesce(v_id, -1)
               ROWS UNBOUNDED PRECEDING)
)
SELECT p_id AS purchase_id, user_id, t AS purchase_ts_us,
       p_value AS purchase_value, view_ts_us, view_id, view_value
FROM f WHERE side = 1
"""


# ---------------------------------------------------------------------------
# q28 — hypertable-style gap-filled time-bucket rollup (spine from a
# one-row min/max aggregate, no driver collect)
# ---------------------------------------------------------------------------

_Q28_BUCKET_S = 21_600  # 6-hour buckets


def q28_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r8: bucket ids floor via pmod (ADVICE r7: negative non-multiple
    # timestamps used to truncate into the wrong bucket) — re-verify
    from ..operators.temporal_join import time_bucket_rollup

    ev = _t(spark, sf_dir, "events")
    return time_bucket_rollup(
        ev, "ts",
        bucket_s=_Q28_BUCKET_S,
        keys=["event_type"],
        aggs={
            "n_events": F.count(F.lit(1)),
            "sum_value": F.round(F.sum("value"), 6),
        },
    )


Q28_SQL = f"""
WITH b AS (
  SELECT event_type, epoch_us(ts) // {_Q28_BUCKET_S * 1_000_000} AS bix,
         count(*) AS n_events, round(sum(value), 6) AS sum_value
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT min(bix) AS lo, max(bix) AS hi
  FROM (SELECT epoch_us(ts) // {_Q28_BUCKET_S * 1_000_000} AS bix FROM events)
),
spine AS (SELECT unnest(range(lo, hi + 1)) AS bix FROM span),
tp AS (SELECT DISTINCT event_type FROM events)
SELECT tp.event_type, s.bix * {_Q28_BUCKET_S} AS bucket_start_s,
       coalesce(b.n_events, 0) AS n_events,
       coalesce(b.sum_value, 0.0) AS sum_value
FROM spine s CROSS JOIN tp
LEFT JOIN b ON b.event_type = tp.event_type AND b.bix = s.bix
"""


# ---------------------------------------------------------------------------
# q29 — bucketed range join (interval correlation; equi-join on time
# cells instead of a quadratic BETWEEN nested loop)
# ---------------------------------------------------------------------------

_Q29_WINDOW_S = 300  # clicks within ±5 minutes of each error
_Q29_PAIR_BUDGET = 20_000_000  # output rows this caller can afford


def q29_range_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demonstrates the recommended density-guard calling convention
    (VERDICT r8 item 6): the caller states the OUTPUT budget it can
    afford — total pair rows — and derives ``max_avg_pairs_per_left``
    as budget / |L| from one cheap count. A densified corpus (the
    documented 7× enumeration slope) then fails loudly, pointing at
    range_agg, instead of silently exploding the shuffle; bounds tied
    to the current density would be circular and never fire."""
    from ..operators.temporal_join import range_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("ts", "event_id")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "ts", F.col("event_id").alias("click_id")
    )
    n_errors = errors.count()
    rj = range_join(
        errors, clicks, on=None,
        lower_s=-_Q29_WINDOW_S, upper_s=_Q29_WINDOW_S, how="left",
        max_avg_pairs_per_left=_Q29_PAIR_BUDGET / max(n_errors, 1),
    )
    return (
        rj.groupBy("event_id", "ts_us")
        .agg(F.count("click_id_r").alias("n_clicks_nearby"))
        .select(
            F.col("event_id").alias("error_id"),
            F.col("ts_us").alias("error_ts_us"),
            "n_clicks_nearby",
        )
    )


Q29_SQL = f"""
WITH e AS (SELECT event_id, epoch_us(ts) AS t FROM events
           WHERE event_type = 'error'),
c AS (SELECT event_id AS click_id, epoch_us(ts) AS t FROM events
      WHERE event_type = 'click')
SELECT e.event_id AS error_id, e.t AS error_ts_us,
       count(c.click_id) AS n_clicks_nearby
FROM e LEFT JOIN c
  ON c.t >= e.t - {_Q29_WINDOW_S * 1_000_000}
 AND c.t <= e.t + {_Q29_WINDOW_S * 1_000_000}
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q30 — trailing event-time rolling aggregates (one keyed RANGE-frame
# window; the per-row sliding twin of q28's fixed buckets)
# ---------------------------------------------------------------------------

_Q30_WINDOW_S = 3600  # events in the trailing hour


def q30_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal_join import rolling_window_agg

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    out = rolling_window_agg(
        ev, "ts",
        key_col="user_id",
        window_s=_Q30_WINDOW_S,
        aggs={"n_1h": F.count(F.lit(1)), "__sum": F.sum("value")},
    )
    return out.select(
        "event_id", "user_id", "ts_us", "n_1h",
        F.round("__sum", 6).alias("sum_1h"),
    )


Q30_SQL = f"""
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       count(*) OVER w AS n_1h,
       round(sum(value) OVER w, 6) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {_Q30_WINDOW_S * 1_000_000} PRECEDING
                   AND CURRENT ROW)
"""

# ---------------------------------------------------------------------------
# q31 — interval aggregation without pair enumeration (subcell
# prefix aggregation; the counting twin of q29 whose candidate volume
# survives a density scale-up)
# ---------------------------------------------------------------------------

def q31_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal_join import range_agg

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("ts", "event_id")
    clicks = ev.filter(F.col("event_type") == "click").select("ts", "value")
    out = range_agg(
        errors, clicks, on=None,
        left_ts="ts", left_id="event_id",
        lower_s=-_Q29_WINDOW_S, upper_s=_Q29_WINDOW_S,
        sums={"n_clicks": F.lit(1), "__sv": F.col("value")},
    )
    return out.select(
        F.col("event_id").alias("error_id"),
        F.col("ts_us").alias("error_ts_us"),
        "n_clicks",
        F.round("__sv", 6).alias("click_value"),
    )


Q31_SQL = f"""
WITH e AS (SELECT event_id, epoch_us(ts) AS t FROM events
           WHERE event_type = 'error'),
c AS (SELECT epoch_us(ts) AS t, value FROM events
      WHERE event_type = 'click')
SELECT e.event_id AS error_id, e.t AS error_ts_us,
       count(c.t) AS n_clicks,
       round(coalesce(sum(c.value), 0), 6) AS click_value
FROM e LEFT JOIN c
  ON c.t >= e.t - {_Q29_WINDOW_S * 1_000_000}
 AND c.t <= e.t + {_Q29_WINDOW_S * 1_000_000}
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# q32 — nearest-direction as-of join (pandas merge_asof "nearest":
# two window passes over one exchange, equidistant ties go backward)
# ---------------------------------------------------------------------------

def q32_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r8: nearest-direction candidates ride matched-row structs too
    # (ADVICE r7 NULL-carry fix) — re-verify this round
    from ..operators.temporal_join import asof_join

    ev = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        signups, clicks, on=["user_id"], left_ts="ts",
        direction="nearest", tiebreak="event_id", prefix="click_",
    )
    return out.select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        "ts_us",
        "click_ts_us",
        F.col("click_event_id").alias("click_id"),
    )


Q32_SQL = """
WITH s AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events
           WHERE event_type = 'signup'),
c AS (SELECT user_id, epoch_us(ts) AS t, event_id FROM events
      WHERE event_type = 'click')
SELECT s.event_id AS signup_id, s.user_id, s.t AS ts_us,
       m.t AS click_ts_us, m.event_id AS click_id
FROM s LEFT JOIN LATERAL (
  SELECT c.t, c.event_id FROM c WHERE c.user_id = s.user_id
  ORDER BY abs(c.t - s.t), (c.t > s.t), c.event_id DESC LIMIT 1
) m ON true
"""


RELATIONAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_last_item_name": q02_last_item_name,
    "q03_customers_without_orders": q03_customers_without_orders,
    "q04_dedup_parts_by_content": q04_dedup_parts_by_content,
    "q05_mass_update": q05_mass_update,
    "q06_cascade_delete": q06_cascade_delete,
    "q07_region_revenue": q07_region_revenue,
    "q08_sessionize_events": q08_sessionize_events,
    "q09_merge_feeds": q09_merge_feeds,
    "q10_geo_candidate_pairs": q10_geo_candidate_pairs,
    "q11_truncate_range": q11_truncate_range,
    "q12_weekday_template": q12_weekday_template,
    "q13_patch_from_csv": q13_patch_from_csv,
    "q14_add_entity": q14_add_entity,
    "q15_top_type_per_brand": q15_top_type_per_brand,
    "q16_assign_directions": q16_assign_directions,
    "q17_line_number_ids": q17_line_number_ids,
    "q18_route_type_recode": q18_route_type_recode,
    "q19_time_roundtrip": q19_time_roundtrip,
    "q20_feed_info_reduce": q20_feed_info_reduce,
    "q21_validate_constraints": q21_validate_constraints,
    "q22_json_extract": q22_json_extract,
    "q23_string_functions": q23_string_functions,
    "q24_date_functions": q24_date_functions,
    "q25_gtfs_roundtrip": q25_gtfs_roundtrip,
    "q26_frequencies_roundtrip": q26_frequencies_roundtrip,
    "q27_asof_enrich": q27_asof_enrich,
    "q28_time_bucket_rollup": q28_time_bucket_rollup,
    "q29_range_count": q29_range_count,
    "q30_rolling_features": q30_rolling_features,
    "q31_range_agg": q31_range_agg,
    "q32_asof_nearest": q32_asof_nearest,
}

RELATIONAL_ORACLES: dict[str, str] = {
    "q01_pricing_summary": Q01_SQL,
    "q02_last_item_name": Q02_SQL,
    "q03_customers_without_orders": Q03_SQL,
    "q04_dedup_parts_by_content": Q04_SQL,
    "q05_mass_update": Q05_SQL,
    "q06_cascade_delete": Q06_SQL,
    "q07_region_revenue": Q07_SQL,
    "q08_sessionize_events": Q08_SQL,
    "q09_merge_feeds": Q09_SQL,
    "q10_geo_candidate_pairs": Q10_SQL,
    "q11_truncate_range": Q11_SQL,
    "q12_weekday_template": Q12_SQL,
    "q13_patch_from_csv": Q13_SQL,
    "q14_add_entity": Q14_SQL,
    "q15_top_type_per_brand": Q15_SQL,
    "q16_assign_directions": Q16_SQL,
    "q17_line_number_ids": Q17_SQL,
    "q18_route_type_recode": Q18_SQL,
    "q19_time_roundtrip": Q19_SQL,
    "q20_feed_info_reduce": Q20_SQL,
    "q21_validate_constraints": Q21_SQL,
    "q22_json_extract": Q22_SQL,
    "q23_string_functions": Q23_SQL,
    "q24_date_functions": Q24_SQL,
    "q25_gtfs_roundtrip": Q25_SQL,
    "q26_frequencies_roundtrip": Q26_SQL,
    "q27_asof_enrich": Q27_SQL,
    "q28_time_bucket_rollup": Q28_SQL,
    "q29_range_count": Q29_SQL,
    "q30_rolling_features": Q30_SQL,
    "q31_range_agg": Q31_SQL,
    "q32_asof_nearest": Q32_SQL,
}
