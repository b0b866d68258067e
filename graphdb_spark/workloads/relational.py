"""Relational workload: scans, filters, joins, aggregates, windows,
set ops, scalar functions — SURVEY.md §2.2/2.3/2.4/2.5/2.6/2.7.

These exercise the capabilities the reference only *declares*
(queries_examples.txt aggregates/ORDER BY/LIMIT; sql_parser.rs parses
but never executes SQL) — here they run for real on Spark, expressed
DataFrame-first so Catalyst pushes filters/prunes columns.

Scale notes: every query below is shuffle-minimal — aggregations are
partial-agg friendly (no distinct-on-string explosions), joins follow
the star schema so AQE broadcasts the dimension side, and top-k is
TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphdb_spark.sources.tpch import load_tables

# Float discipline (learned the hard way — the sf0.01 oracle diff):
# double→decimal(·,10) casts and decimal→double casts can differ by
# 1 ULP between engines. So: cast source columns to LOW-scale decimals
# (unambiguous for 2-decimal money data), do exact decimal arithmetic,
# ROUND the exact decimal result, and only then cast to double — a
# small-unscaled decimal→double conversion is correctly rounded in
# both engines.

D2 = "decimal(12,2)"  # prices, balances, quantities
D4 = "decimal(4,2)"  # discounts, taxes (≤ 9.99)


def dec2(col):
    return col.cast(D2)


def dec4(col):
    return col.cast(D4)


def _dsum(dec_expr, alias):
    """Order-independent exact decimal sum, rounded then doubled."""
    return F.round(F.sum(dec_expr), 2).cast("double").alias(alias)


def _davg(dec_expr, alias):
    """avg = round(exact sum, 2)::double / count — IEEE division of
    identical operands is identical."""
    return (
        F.round(F.sum(dec_expr), 2).cast("double") / F.count(F.lit(1))
    ).alias(alias)


# ---------------------------------------------------------------- queries


def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan + filter + groupBy aggregate (map-side
    partial agg; filter pushed to parquet)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    disc = dec2(F.col("l_extendedprice")) * (1 - dec4(F.col("l_discount")))
    charge = disc * (1 + dec4(F.col("l_tax")))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(dec2(F.col("l_quantity")), "sum_qty"),
            _dsum(dec2(F.col("l_extendedprice")), "sum_base_price"),
            _dsum(disc, "sum_disc_price"),
            _dsum(charge, "sum_charge"),
            _davg(dec2(F.col("l_quantity")), "avg_qty"),
            _davg(dec2(F.col("l_extendedprice")), "avg_price"),
            _davg(dec4(F.col("l_discount")), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_DISC = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
_CHARGE = f"{_DISC} * (1 + CAST(l_tax AS DECIMAL(4,2)))"

Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM({_DISC}), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM({_CHARGE}), 2) AS DOUBLE) AS sum_charge,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) / COUNT(*) AS avg_disc,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_topk(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + top-k (broadcast customer
    via AQE; TakeOrderedAndProject for the limit)."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            _dsum(
                dec2(F.col("l_extendedprice")) * (1 - dec4(F.col("l_discount"))),
                "revenue",
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey,
  CAST(ROUND(SUM({_DISC}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 6-way star join, dims broadcast."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            _dsum(
                dec2(F.col("l_extendedprice")) * (1 - dec4(F.col("l_discount"))),
                "revenue",
            )
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = f"""
SELECT n_name,
  CAST(ROUND(SUM({_DISC}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def top_customers(spark, sf_dir):
    """Top-k aggregate (queries_examples.txt:120-123 grouped count +
    ORDER BY DESC + LIMIT shape)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            _dsum(dec2(F.col("o_totalprice")), "total_spent"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .orderBy(F.desc("total_spent"), F.asc("o_custkey"))
        .limit(10)
    )


TOP_CUSTOMERS_SQL = """
SELECT o_custkey,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_spent,
  CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders GROUP BY o_custkey
ORDER BY total_spent DESC, o_custkey ASC LIMIT 10
"""


def distinct_agg(spark, sf_dir):
    """Distinct aggregation + conditional count (SURVEY §2.4 row:
    'free in Spark, expose through our SQL surface')."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("distinct_customers"),
            F.count(F.lit(1)).alias("orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("long")
            .alias("finished"),
        )
        .orderBy("o_orderpriority")
    )


DISTINCT_AGG_SQL = """
SELECT o_orderpriority,
  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS distinct_customers,
  CAST(COUNT(*) AS BIGINT) AS orders,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def window_top_order_per_segment(spark, sf_dir):
    """Ranking window function (SURVEY §2.5 extension row):
    highest-value order per market segment."""
    t = load_tables(spark, sf_dir)
    joined = t["orders"].join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_mktsegment",
            F.col("rn").cast("int").alias("rn"),
            "o_orderkey",
            "o_totalprice",
        )
        .orderBy("c_mktsegment", "rn")
    )


WINDOW_TOP_SQL = """
SELECT c_mktsegment, CAST(rn AS INT) AS rn, o_orderkey, o_totalprice FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rn <= 3 ORDER BY c_mktsegment, rn
"""


def window_running_total(spark, sf_dir):
    """Analytic window: per-customer running order total + lag
    (row-frame prefix sums, deterministic via orderkey tiebreak)."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(dec2(F.col("o_totalprice"))).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            2,
        )
        .cast("double")
        .alias("running_total"),
        F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)).alias("prev_price"),
    ).orderBy("o_custkey", "o_orderkey")


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
    AS running_total,
  COALESCE(LAG(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey), 0.0) AS prev_price
FROM orders WHERE o_custkey < 50
ORDER BY o_custkey, o_orderkey
"""


def set_ops(spark, sf_dir):
    """union / intersect / except (SURVEY §2.6 — absent in reference,
    free in Spark): nations having customers vs suppliers."""
    t = load_tables(spark, sf_dir)
    cn = t["customer"].select(F.col("c_nationkey").alias("nationkey")).distinct()
    sn = t["supplier"].select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = cn.intersect(sn).withColumn("relation", F.lit("both"))
    cust_only = cn.exceptAll(sn).withColumn("relation", F.lit("customer_only"))
    supp_only = sn.exceptAll(cn).withColumn("relation", F.lit("supplier_only"))
    return both.unionByName(cust_only).unionByName(supp_only).orderBy(
        "relation", "nationkey"
    )


SET_OPS_SQL = """
WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, 'both' AS relation FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
UNION ALL
SELECT nationkey, 'customer_only' AS relation FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
UNION ALL
SELECT nationkey, 'supplier_only' AS relation FROM (SELECT nationkey FROM sn EXCEPT SELECT nationkey FROM cn)
ORDER BY relation, nationkey
"""


def rollup_orders(spark, sf_dir):
    """ROLLUP grouping sets (SURVEY §2.4 'grouping sets/cube/rollup')."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def string_funcs(spark, sf_dir):
    """Scalar string surface (SURVEY §2.7: toLower, CONTAINS, regex
    =~ '(?i)...', queries_examples.txt:106,180-183)."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.lower(F.col("p_type")).contains("brass"))
        .filter(F.col("p_name").rlike("(?i)^[a-m]"))
        .select(
            "p_partkey",
            F.lower("p_name").alias("name_lower"),
            F.upper("p_brand").alias("brand_upper"),
            F.length("p_type").cast("int").alias("type_len"),
            F.substring("p_type", 1, 6).alias("type_prefix"),
        )
        .orderBy("p_partkey")
    )


STRING_FUNCS_SQL = """
SELECT p_partkey, LOWER(p_name) AS name_lower, UPPER(p_brand) AS brand_upper,
  CAST(LENGTH(p_type) AS INT) AS type_len, SUBSTRING(p_type, 1, 6) AS type_prefix
FROM part
WHERE CONTAINS(LOWER(p_type), 'brass') AND regexp_matches(p_name, '(?i)^[a-m]')
ORDER BY p_partkey
"""


def date_funcs(spark, sf_dir):
    """Date/time scalar surface (timestamp()/date() of SURVEY §2.7):
    orders per month with date arithmetic."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
            "o_totalprice",
        )
        .groupBy("month", "yr", "mo")
        .agg(
            F.count(F.lit(1)).alias("orders"),
            _dsum(dec2(F.col("o_totalprice")), "volume"),
        )
        .orderBy("month")
    )


DATE_FUNCS_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
  CAST(COUNT(*) AS BIGINT) AS orders,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS volume
FROM orders GROUP BY 1, 2, 3 ORDER BY month
"""


def json_funcs(spark, sf_dir):
    """JSON scalar surface (reference Json layer, models/src/json.rs):
    extract typed values from the events.props JSON strings."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


JSON_FUNCS_SQL = """
SELECT event_type,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
  CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
FROM events GROUP BY event_type ORDER BY event_type
"""


def anti_semi_join(spark, sf_dir):
    """Semi/anti joins (the reference's implicit FK-style joins,
    rdb/datastore.rs:272-281): customers with no orders + count of
    customers with orders, as one labeled output."""
    t = load_tables(spark, sf_dir)
    orders_keys = t["orders"].select("o_custkey")
    with_orders = t["customer"].join(
        orders_keys, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    )
    without = t["customer"].join(
        orders_keys, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return (
        with_orders.select(F.lit("with_orders").alias("bucket"))
        .unionByName(without.select(F.lit("no_orders").alias("bucket")))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


ANTI_SEMI_SQL = """
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT 'with_orders' AS bucket FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
  UNION ALL
  SELECT 'no_orders' AS bucket FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
) GROUP BY bucket ORDER BY bucket
"""


def cube_counts(spark, sf_dir):
    """CUBE grouping sets (SURVEY §2.4 'grouping sets/cube/rollup')."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum(dec2(F.col("l_quantity")), "qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


CUBE_SQL = """
SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def approx_distinct_sketch(spark, sf_dir):
    """HyperLogLog sketch surface (approx_count_distinct) — engines
    implement different HLL variants, so this is a rows-only check
    (no oracle); the exact twin `distinct_agg` is oracle-checked."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                / F.col("exact_parts"),
                4,
            ),
        )
        .orderBy("l_returnflag")
    )


def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS semi-join + grouped count."""
    t = load_tables(spark, sf_dir)
    late = t["lineitem"].filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit("1994-01-01"))
            & (F.col("o_orderdate") < F.lit("1995-01-01"))
        )
        .join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure filter + sum — the pushdown showcase."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(
                dec2(F.col("l_extendedprice")) * dec4(F.col("l_discount")),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


Q6_SQL = """
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q12_shipmode(spark, sf_dir):
    """TPC-H Q12 shape: join + conditional (CASE) aggregation by
    priority class."""
    t = load_tables(spark, sf_dir)
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "N")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).cast("long").alias("high_line_count"),
            F.sum(1 - high).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_returnflag = 'N'
GROUP BY l_linestatus ORDER BY l_linestatus
"""


QUERIES = {
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q12_shipmode": (q12_shipmode, Q12_SQL),
    "cube_counts": (cube_counts, CUBE_SQL),
    "approx_distinct_sketch": (approx_distinct_sketch, None),
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_topk": (q3_shipping_topk, Q3_SQL),
    "q5_region_revenue": (q5_region_revenue, Q5_SQL),
    "top_customers": (top_customers, TOP_CUSTOMERS_SQL),
    "distinct_agg": (distinct_agg, DISTINCT_AGG_SQL),
    "window_top_order_per_segment": (window_top_order_per_segment, WINDOW_TOP_SQL),
    "window_running_total": (window_running_total, WINDOW_RUNNING_SQL),
    "set_ops": (set_ops, SET_OPS_SQL),
    "rollup_orders": (rollup_orders, ROLLUP_SQL),
    "string_funcs": (string_funcs, STRING_FUNCS_SQL),
    "date_funcs": (date_funcs, DATE_FUNCS_SQL),
    "json_funcs": (json_funcs, JSON_FUNCS_SQL),
    "anti_semi_join": (anti_semi_join, ANTI_SEMI_SQL),
}
