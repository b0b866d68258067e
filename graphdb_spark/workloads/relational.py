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
    """TPC-H Q5 shape: 6-way star join — FILTER-EARLY order. The naive
    left-deep chain runs the one unavoidable big join
    (lineitem ⋈ orders, SMJ at scale) over EVERY order and only then
    prunes to the ASIA region through the dim broadcasts; Catalyst
    cannot reorder across it without CBO stats. Here the selective
    side collapses first: region→nation→customer broadcasts shrink
    orders ~5x BEFORE the fact join, so the SMJ shuffles the filtered
    orders and the dims that already applied drop out of the
    downstream plan — the right shape at any scale and measured
    faster at sf10 where the query is data-bound, identical output."""
    t = load_tables(spark, sf_dir)
    asia_cust = (
        t["customer"]
        .join(F.broadcast(t["nation"]),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    # asia_cust broadcasts exactly like the old left-deep plan
    # broadcast the full customer dim (same scale contract, 1/5 the
    # rows). The pruned orders side is then INFORMED-broadcast into
    # the fact join (traversal's _maybe_broadcast pattern: one exact
    # count of the materialized side, broadcast while provably small,
    # keyed SMJ beyond the cap) — at bench SFs lineitem is never
    # shuffled at all; at 100 TB the count says no and the SMJ over
    # the 5x-pruned orders is the correct scalable plan.
    from graphdb_spark.operators.traversal import _maybe_broadcast

    asia_orders = (
        t["orders"]
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nationkey", "n_name")
        .localCheckpoint(eager=True)
    )
    n_asia = asia_orders.count()
    return (
        t["lineitem"]
        .join(_maybe_broadcast(asia_orders, n_asia),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
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
    """HyperLogLog sketch surface (approx_count_distinct). Engines
    implement different HLL variants, so the sketch VALUE can't be
    oracle-matched — instead the output carries the exact
    COUNT(DISTINCT) plus ``within_bound`` = (|approx-exact|/exact <=
    0.05, vs the requested rsd of 0.02), and the DuckDB twin emits the
    exact count with a constant 1: the hash match then asserts both
    the exact count AND that Spark's sketch landed inside its
    documented error bound."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                / F.col("exact_parts")
                <= 0.05
            )
            .cast("bigint")
            .alias("within_bound"),
        )
        .orderBy("l_returnflag")
    )


APPROX_DISTINCT_SQL = """
SELECT l_returnflag,
  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
  CAST(1 AS BIGINT) AS within_bound
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def quantile_sketch(spark, sf_dir):
    """Exact + sketched quantiles per return flag. Spark's exact
    ``percentile`` and DuckDB's ``quantile_cont`` share the
    rank = p*(n-1) linear-interpolation definition and match
    bit-for-bit on the same doubles (verified at sf0.01), so p50/p90
    hash-match directly; the approx_percentile (t-digest-class) sketch
    can't be replayed cross-engine, so — like approx_distinct_sketch —
    it ships as a ``p90_within_1pct`` bound flag the oracle emits as
    a constant 1. At 100 TB the exact percentile's total sort is the
    expensive path and the sketch is the one you'd actually run; the
    gate certifies the sketch lands within its documented error."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.5)).alias("qty_p50"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("price_p90"),
            F.percentile_approx(
                "l_extendedprice", F.lit(0.9), F.lit(10_000)
            ).alias("approx_p90"),
        )
        .select(
            "l_returnflag",
            "qty_p50",
            "price_p90",
            (
                F.abs(F.col("approx_p90") - F.col("price_p90"))
                / F.col("price_p90")
                <= 0.01
            )
            .cast("bigint")
            .alias("p90_within_1pct"),
        )
        .orderBy("l_returnflag")
    )


QUANTILE_SKETCH_SQL = """
SELECT l_returnflag,
  quantile_cont(l_quantity, 0.5) AS qty_p50,
  quantile_cont(l_extendedprice, 0.9) AS price_p90,
  CAST(1 AS BIGINT) AS p90_within_1pct
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


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


def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: supplier-nation x customer-nation trade volume
    by year (two independent nation lookups via lineitem's suppkey and
    the order's custkey — both dimension joins broadcast under AQE)."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31"))
    )
    df = (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        df.groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            _dsum(
                dec2(F.col("l_extendedprice")) * (1 - dec4(F.col("l_discount"))),
                "revenue",
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
  CAST(ROUND(SUM({_DISC}), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                       AND TIMESTAMP '1996-12-31 00:00:00'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1993-10-01"))
        & (F.col("o_orderdate") < F.lit("1994-01-01"))
    )
    return (
        t["lineitem"].filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(
            _dsum(
                dec2(F.col("l_extendedprice")) * (1 - dec4(F.col("l_discount"))),
                "revenue",
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal,
  CAST(ROUND(SUM({_DISC}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1993-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1994-01-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal
ORDER BY revenue DESC, c_custkey ASC LIMIT 20
"""


def q13_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: customer order-count distribution — left join
    keeping zero-order customers, two-level aggregation."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue ratio — conditional aggregation
    over a fact-dimension join, single-row result."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01"))
        & (F.col("l_shipdate") < F.lit("1995-10-01"))
    )
    disc = dec2(F.col("l_extendedprice")) * (1 - dec4(F.col("l_discount")))
    promo = F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.round(F.sum(promo), 2).cast("double")
                / F.round(F.sum(disc), 2).cast("double")
            ).alias("promo_revenue")
        )
    )


Q14_SQL = f"""
SELECT 100.0
  * CAST(ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_DISC}
                        ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE)
  / CAST(ROUND(SUM({_DISC}), 2) AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
"""


def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: top supplier by quarterly revenue — grouped
    revenue view + max-revenue scalar (kept distributed via a
    broadcast-joined 1-row max, no collect)."""
    t = load_tables(spark, sf_dir)
    revs = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            _dsum(
                dec2(F.col("l_extendedprice")) * (1 - dec4(F.col("l_discount"))),
                "total_revenue",
            )
        )
    )
    mx = revs.agg(F.max("total_revenue").alias("__mx"))
    return (
        revs.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
        .join(t["supplier"], F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(ROUND(SUM({_DISC}), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery — lineitems below
    20% of their part's average quantity. The avg compare is done in
    exact decimals (qty*5*n < sum_qty ⟺ qty < 0.2*avg) so both
    engines agree bit-for-bit."""
    t = load_tables(spark, sf_dir)
    brand_parts = t["part"].filter(F.col("p_brand") == "Brand#13").select(
        "p_partkey"
    )
    li = t["lineitem"].join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(dec2(F.col("l_quantity"))).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    small = li.join(F.broadcast(per_part), F.col("l_partkey") == F.col("pk")).filter(
        dec2(F.col("l_quantity")) * 5 * F.col("cnt") < F.col("sum_qty")
    )
    return small.agg(
        (F.round(F.sum(dec2(F.col("l_extendedprice"))), 2).cast("double") / 7.0)
        .alias("avg_yearly")
    )


Q17_SQL = """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13'
), per_part AS (
  SELECT l_partkey AS pk,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
         COUNT(*) AS cnt
  FROM li GROUP BY 1
)
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)
       / 7.0 AS avg_yearly
FROM li JOIN per_part ON l_partkey = pk
WHERE CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt < sum_qty
"""


def q18_large_volume(spark, sf_dir):
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery — orders
    whose total quantity exceeds a threshold, with customer detail."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"].groupBy("l_orderkey")
        .agg(F.sum(dec2(F.col("l_quantity"))).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
        .select(
            F.col("l_orderkey").alias("big_ok"),
            F.round(F.col("sum_qty"), 2).cast("double").alias("total_qty"),
        )
    )
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("big_ok"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_totalprice, total_qty
FROM orders
JOIN (
  SELECT l_orderkey AS big_ok,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
           AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250
) ON o_orderkey = big_ok
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    ranges (the OR-of-ANDs pushdown test)."""
    t = load_tables(spark, sf_dir)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size").between(1, 5))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            _dsum(
                dec2(F.col("l_extendedprice")) * (1 - dec4(F.col("l_discount"))),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


Q19_SQL = f"""
SELECT CAST(ROUND(SUM({_DISC}), 2) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q22_global_sales(spark, sf_dir):
    """TPC-H Q22 shape: anti-join (customers with no orders) above the
    average positive balance, grouped by nation. The avg compare is
    exact-decimal (bal*n > sum ⟺ bal > avg) for cross-engine
    determinism."""
    t = load_tables(spark, sf_dir)
    pos = t["customer"].filter(F.col("c_acctbal") > 0.0)
    stats = pos.agg(
        F.sum(dec2(F.col("c_acctbal"))).alias("sum_bal"),
        F.count(F.lit(1)).alias("n_bal"),
    )
    rich = (
        t["customer"]
        .join(F.broadcast(stats))
        .filter(dec2(F.col("c_acctbal")) * F.col("n_bal") > F.col("sum_bal"))
    )
    no_orders = rich.join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return (
        no_orders.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(dec2(F.col("c_acctbal")), "totacctbal"),
        )
        .orderBy("c_nationkey")
    )


Q22_SQL = """
WITH stats AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS sum_bal, COUNT(*) AS n_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
FROM customer, stats
WHERE CAST(c_acctbal AS DECIMAL(12,2)) * n_bal > sum_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey ORDER BY c_nationkey
"""


# ------------------------------------------------------- deep TPC-H set
# The testdata has no partsupp table, so q2/q11/q16/q20 cannot be
# replicated verbatim; q8/q9/q21-shaped below keep the STRUCTURAL
# pattern of the originals (market-share ratio over a 7-table join,
# profit by nation/year, EXISTS+NOT-EXISTS self-joins) and the
# q2/q16/q20-shaped ones re-root the partsupp patterns on the
# lineitem-derived supplier↔part relation. Same operator shapes —
# correlated scalar subqueries, anti/semi joins, count-distinct over a
# multi-join — on the tables that exist.


def q8_market_share(spark, sf_dir):
    """TPC-H Q8: national market share — share of NATION_1 suppliers in
    AMERICA customers' ECONOMY-part order volume per year. 7-table
    star join: AQE broadcasts every dim side; the ratio uses the
    identical round-then-divide discipline on both engines."""
    t = load_tables(spark, sf_dir)
    vol = dec2(F.col("l_extendedprice")) * (1 - dec4(F.col("l_discount")))
    nat_c = t["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    nat_s = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    america = t["region"].filter(F.col("r_name") == "AMERICA")
    df = (
        t["lineitem"]
        .join(t["part"].filter(F.col("p_type") == "ECONOMY"),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat_s, F.col("s_nationkey") == F.col("s_nkey"))
        .join(t["orders"].filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01"))
            & (F.col("o_orderdate") <= F.lit("1996-12-31"))),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(nat_c, F.col("c_nationkey") == F.col("c_nkey"))
        .join(america, F.col("c_rkey") == F.col("r_regionkey"))
    )
    num = F.round(
        F.sum(F.when(F.col("supp_nation") == "NATION_1", vol)
              .otherwise(F.lit(0).cast(D2))), 2
    ).cast("double")
    den = F.round(F.sum(vol), 2).cast("double")
    return (
        df.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((num / den).alias("mkt_share"))
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
       CAST(ROUND(SUM(CASE WHEN n2.n_name = 'NATION_1' THEN {_DISC}
                           ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE)
         / CAST(ROUND(SUM({_DISC}), 2) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_type = 'ECONOMY'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                      AND TIMESTAMP '1996-12-31 00:00:00'
GROUP BY 1 ORDER BY 1
"""


def q9_profit(spark, sf_dir):
    """TPC-H Q9 shape (sans ps_supplycost — no partsupp table): profit
    of 'red%' parts by supplier nation and order year."""
    t = load_tables(spark, sf_dir)
    vol = dec2(F.col("l_extendedprice")) * (1 - dec4(F.col("l_discount")))
    return (
        t["lineitem"]
        .join(t["part"].filter(F.col("p_name").startswith("red")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(_dsum(vol, "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
       CAST(ROUND(SUM({_DISC}), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_name LIKE 'red%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
GROUP BY 1, 2 ORDER BY 1, 2 DESC
"""


def q21_waiting_orders(spark, sf_dir):
    """TPC-H Q21 shape (testdata lacks commit/receipt dates, so the
    "late" predicate becomes returnflag='R'): suppliers with a returned
    lineitem on a finished multi-supplier order where NO other supplier
    of that order also returned — the original's EXISTS + NOT EXISTS
    self-join pair, expressed as semi/anti joins (no correlated
    re-scan; each is one shuffle on l_orderkey)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_returnflag")
    fo = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(fo, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(F.col("l_orderkey").alias("e_okey"),
                   F.col("l_suppkey").alias("e_skey"))
    exists = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("e_okey"))
        & (F.col("l_suppkey") != F.col("e_skey")),
        "left_semi",
    )
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("x_okey"),
                F.col("l_suppkey").alias("x_skey"))
    )
    waiting = exists.join(
        l3,
        (F.col("l_orderkey") == F.col("x_okey"))
        & (F.col("l_suppkey") != F.col("x_skey")),
        "left_anti",
    )
    return (
        waiting.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


Q21_SQL = """
WITH l1 AS (
  SELECT l_orderkey, l_suppkey FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
  WHERE l_returnflag = 'R'
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


def q2_min_supplier(spark, sf_dir):
    """TPC-H Q2 shape (partsupp's min-supplycost subquery re-rooted on
    the lineitem-derived supplier↔part relation): for each Brand#33
    part, the supplier(s) with the minimum account balance among those
    who shipped it — correlated-scalar-subquery pattern as a grouped
    min joined back on equality (exact double, no arithmetic)."""
    t = load_tables(spark, sf_dir)
    rel = (
        t["lineitem"]
        .join(t["part"].filter(F.col("p_brand") == "Brand#33"),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
        .distinct()
    )
    min_bal = rel.groupBy(F.col("p_partkey").alias("mp_key")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        rel.join(min_bal,
                 (F.col("p_partkey") == F.col("mp_key"))
                 & (F.col("s_acctbal") == F.col("min_bal")))
        .select("p_partkey", "p_name", "s_name",
                F.col("s_acctbal").alias("acctbal"))
        .orderBy("p_partkey", "s_name")
    )


Q2_SQL = """
WITH rel AS (
  SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, s_acctbal
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey AND p_brand = 'Brand#33'
  JOIN supplier ON l_suppkey = s_suppkey
)
SELECT p_partkey, p_name, s_name, s_acctbal AS acctbal
FROM rel r
WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM rel r2
                   WHERE r2.p_partkey = r.p_partkey)
ORDER BY p_partkey, s_name
"""


def q16_supplier_counts(spark, sf_dir):
    """TPC-H Q16 shape (partsupp → lineitem-derived relation):
    suppliers per (brand, type, size) for non-Brand#13, non-MEDIUM
    parts of selected sizes, excluding negative-balance suppliers
    (the original's NOT-IN complaint-supplier subquery, as an
    anti-join). COUNT(DISTINCT) over a pre-deduped pair relation."""
    t = load_tables(spark, sf_dir)
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").startswith("MEDIUM"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    )
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    rel = (
        t["lineitem"].select("l_partkey", "l_suppkey").distinct()
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        rel.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) li
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_excess_share(spark, sf_dir):
    """TPC-H Q20 shape (availability → shipped-quantity share):
    suppliers providing >20% of the 1995 shipped quantity of some
    'red%' part — the original's correlated half-year-quantity
    threshold as a grouped-total join. Quantities are exact decimals;
    the 0.2 threshold multiplies a decimal by a literal identically on
    both engines."""
    t = load_tables(spark, sf_dir)
    red95 = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= F.lit("1995-01-01"))
                & (F.col("l_shipdate") < F.lit("1996-01-01")))
        .join(t["part"].filter(F.col("p_name").startswith("red")),
              F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    pair = red95.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec2(F.col("l_quantity"))).alias("pair_qty")
    )
    total = red95.groupBy(F.col("l_partkey").alias("t_pkey")).agg(
        F.sum(dec2(F.col("l_quantity"))).alias("part_qty")
    )
    hits = pair.join(
        total,
        (F.col("l_partkey") == F.col("t_pkey"))
        & (F.col("pair_qty") > F.col("part_qty") * F.lit(0.2).cast(D4)),
    )
    return (
        hits.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name").distinct()
        .orderBy("s_suppkey")
    )


Q20_SQL = """
WITH red95 AS (
  SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
  WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
),
pair AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS pair_qty
  FROM red95 GROUP BY 1, 2
),
total AS (
  SELECT l_partkey AS t_pkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS part_qty
  FROM red95 GROUP BY 1
)
SELECT DISTINCT s_suppkey, s_name
FROM pair
JOIN total ON l_partkey = t_pkey
          AND pair_qty > part_qty * CAST(0.2 AS DECIMAL(4,2))
JOIN supplier ON l_suppkey = s_suppkey
ORDER BY s_suppkey
"""


def item_cooccur_topk(spark, sf_dir):
    """Item-item co-occurrence similarity (the collaborative-filtering
    candidate shape): part pairs sharing orders, Jaccard over their
    order sets, top 15 by co-count. Same discipline as the dedup
    shingle joins — pairs meet ONLY through a shared order (equi-join
    on the order key), never all-pairs; at 100 TB the pair count is
    bounded by sum(basket_size^2), the classic market-basket bound."""
    li = (
        load_tables(spark, sf_dir)["lineitem"]
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    sizes = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_ord"))
    a, b = li.alias("a"), li.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).alias("co"))
    )
    sa = sizes.select(F.col("l_partkey").alias("pa"), F.col("n_ord").alias("na"))
    sb = sizes.select(F.col("l_partkey").alias("pb"), F.col("n_ord").alias("nb"))
    return (
        co.join(sa, "pa")
        .join(sb, "pb")
        .withColumn(
            "jaccard",
            F.round(
                F.col("co").cast("double")
                / (F.col("na") + F.col("nb") - F.col("co")),
                6,
            ),
        )
        .filter(F.col("co") >= 2)
        .select("pa", "pb", "co", "jaccard")
        .orderBy(F.desc("co"), F.desc("jaccard"), "pa", "pb")
        .limit(15)
    )


ITEM_COOCCUR_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sizes AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_ord FROM li GROUP BY 1),
co AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(COUNT(*) AS BIGINT) AS co
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT pa, pb, co,
  ROUND(CAST(co AS DOUBLE) / (sa.n_ord + sb.n_ord - co), 6) AS jaccard
FROM co
JOIN sizes sa ON sa.l_partkey = pa
JOIN sizes sb ON sb.l_partkey = pb
WHERE co >= 2
ORDER BY co DESC, jaccard DESC, pa, pb LIMIT 15
"""


QUERIES = {
    "q7_nation_volume": (q7_nation_volume, Q7_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q13_order_distribution": (q13_order_distribution, Q13_SQL),
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q17_small_qty_revenue": (q17_small_qty_revenue, Q17_SQL),
    "q18_large_volume": (q18_large_volume, Q18_SQL),
    "q19_disjunctive_revenue": (q19_disjunctive_revenue, Q19_SQL),
    "q22_global_sales": (q22_global_sales, Q22_SQL),
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q12_shipmode": (q12_shipmode, Q12_SQL),
    "cube_counts": (cube_counts, CUBE_SQL),
    "approx_distinct_sketch": (approx_distinct_sketch, APPROX_DISTINCT_SQL),
    "quantile_sketch": (quantile_sketch, QUANTILE_SKETCH_SQL),
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
    "item_cooccur_topk": (item_cooccur_topk, ITEM_COOCCUR_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_profit": (q9_profit, Q9_SQL),
    "q21_waiting_orders": (q21_waiting_orders, Q21_SQL),
    "q2_min_supplier": (q2_min_supplier, Q2_SQL),
    "q16_supplier_counts": (q16_supplier_counts, Q16_SQL),
    "q20_excess_share": (q20_excess_share, Q20_SQL),
}


def q11_important_value(spark, sf_dir):
    """TPC-H Q11 shape: grouped HAVING against a GLOBAL scalar
    aggregate — parts whose total line value exceeds a fixed fraction
    of the corpus-wide total (Q11's partsupp value re-rooted on
    lineitem; the TESTDATA has no partsupp table). Q11's literal
    fraction is 0.0001/SF — scale-dependent by design — so the shape
    is pinned scale-invariantly: parts above 1.2x the MEAN part value
    (value*n_parts*5 > total*6, exact decimals — ~top 15% of the
    synthetic distribution at every SF). The global (total, n)
    is a one-row aggregate broadcast into the HAVING — the same plan
    Q11 needs at 100 TB: two passes over the grouped values, no
    re-scan of the fact table, no correlated per-group subquery.

    All arithmetic in exact DECIMAL until the final cast so the
    fraction compare is bit-identical on both engines."""
    t = load_tables(spark, sf_dir)
    per_part = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(dec2(F.col("l_extendedprice"))
                   * (F.lit(1).cast("decimal(12,2)")
                      - dec2(F.col("l_discount")))).alias("value_dec"))
    )
    total = per_part.agg(
        F.sum("value_dec").alias("total_dec"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        # HAVING value > 1.2 * (total / n_parts) — kept in exact decimals
        .filter(F.col("value_dec") * F.col("n_parts") * 5
                > F.col("total_dec") * 6)
        .select(
            "p_partkey",
            F.round(F.col("value_dec"), 2).cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey AS p_partkey,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
      AS value_dec
  FROM lineitem GROUP BY 1
), total AS (
  SELECT SUM(value_dec) AS total_dec, CAST(COUNT(*) AS BIGINT) AS n_parts
  FROM per_part)
SELECT p_partkey, CAST(ROUND(value_dec, 2) AS DOUBLE) AS value
FROM per_part, total
WHERE value_dec * n_parts * 5 > total_dec * 6
ORDER BY value DESC, p_partkey
"""

QUERIES["q11_important_value"] = (q11_important_value, Q11_SQL)


# ------------------------------------------------ value histogram

HIST_BINS = 20


def value_histogram(spark, sf_dir):
    """Equi-width histogram of l_extendedprice (the data-profiling
    primitive behind optimizer statistics and drift monitors): global
    min/max in one scalar aggregate, 20 bins, per-bin count and price
    mass. Bin edges are exact doubles both engines derive from the
    same values, so assignment is bit-identical; per-bin sums fold as
    decimal for order independence.

    Scale shape: two passes over the column (scalar agg, then one
    partial-aggregated groupBy on the bin id) — the same shape a
    100 TB profiler uses; the 2-row stats table rides along as a
    broadcast."""
    li = load_tables(spark, sf_dir)["lineitem"]
    stats = li.agg(
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
    )
    x = F.col("l_extendedprice")
    width = (F.col("mx") - F.col("mn")) / HIST_BINS
    bin_ = F.least(
        F.floor((x - F.col("mn")) / width).cast("int"),
        F.lit(HIST_BINS - 1),
    )
    return (
        li.crossJoin(F.broadcast(stats))
        .select(
            bin_.alias("bin"),
            F.col("mn"),
            F.col("mx"),
            x.alias("price"),
        )
        .groupBy("bin", "mn", "mx")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum(F.round(F.col("price"), 6).cast("decimal(18,6)")), 6
            ).cast("double").alias("price_sum"),
        )
        .select(
            "bin",
            F.round(F.col("mn") + F.col("bin") * (F.col("mx") - F.col("mn"))
                    / HIST_BINS, 6).alias("lo"),
            "n",
            "price_sum",
        )
        .orderBy("bin")
    )


VALUE_HISTOGRAM_SQL = f"""
WITH stats AS (
  SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
  FROM lineitem
), binned AS (
  SELECT LEAST(CAST(FLOOR((l_extendedprice - mn)
                          / ((mx - mn) / {HIST_BINS})) AS INT),
               {HIST_BINS - 1}) AS bin,
         mn, mx, l_extendedprice AS price
  FROM lineitem, stats
)
SELECT bin,
  ROUND(mn + bin * (mx - mn) / {HIST_BINS}, 6) AS lo,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(ROUND(SUM(CAST(ROUND(price, 6) AS DECIMAL(18,6))), 6) AS DOUBLE)
    AS price_sum
FROM binned GROUP BY bin, mn, mx ORDER BY bin
"""


QUERIES["value_histogram"] = (value_histogram, VALUE_HISTOGRAM_SQL)


# ----------------------------------------- distribution windows

def window_analytics(spark, sf_dir):
    """Distribution window functions (percent_rank / cume_dist /
    nth_value) — the remaining analytic-window family beyond ranking
    and frames: each segment's top-5 orders annotated with their
    within-segment price percentile, cumulative share, and the
    segment's 2nd-highest order key.

    Scale: one keyed window (partitioned by segment) — the percentile
    functions need the partition's full sort but never a global one;
    doubles are rank ratios of exact integers, bit-identical
    cross-engine."""
    t = load_tables(spark, sf_dir)
    joined = t["orders"].join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        joined.select(
            "c_mktsegment", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.nth_value("o_orderkey", 2).over(
                w.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)
            ).alias("second_key"),
        )
        .filter(F.col("rn") <= 5)
        .select(
            "c_mktsegment", F.col("rn").cast("int").alias("rn"),
            "o_orderkey", "pct_rank", "cume", "second_key",
        )
        .orderBy("c_mktsegment", "rn")
    )


WINDOW_ANALYTICS_SQL = """
SELECT c_mktsegment, CAST(rn AS INT) AS rn, o_orderkey, pct_rank, cume,
       second_key
FROM (
  SELECT c_mktsegment, o_orderkey,
    ROW_NUMBER() OVER w AS rn,
    ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
    ROUND(CUME_DIST() OVER w, 6) AS cume,
    NTH_VALUE(o_orderkey, 2) OVER
      (PARTITION BY c_mktsegment
       ORDER BY o_totalprice DESC, o_orderkey ASC
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
  FROM orders JOIN customer ON o_custkey = c_custkey
  WINDOW w AS (PARTITION BY c_mktsegment
               ORDER BY o_totalprice DESC, o_orderkey ASC)
) WHERE rn <= 5 ORDER BY c_mktsegment, rn
"""

QUERIES["window_analytics"] = (window_analytics, WINDOW_ANALYTICS_SQL)


# ----------------------------------------- explicit grouping sets

def grouping_sets_report(spark, sf_dir):
    """GROUP BY GROUPING SETS with grouping_id — the explicit-sets
    variant beyond cube/rollup (a cube is all 2^n sets; real report
    tables pick exactly the levels they publish). Decimal quantity
    sums; gid disambiguates (flag, NULL-as-value) from the flag-level
    subtotal row."""
    t = load_tables(spark, sf_dir)
    t["lineitem"].createOrReplaceTempView("gs_li_tmp")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS qty
        FROM gs_li_tmp
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        ORDER BY gid, l_returnflag, l_linestatus
    """)


GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT)
         AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, l_returnflag, l_linestatus
"""

QUERIES["grouping_sets_report"] = (grouping_sets_report, GROUPING_SETS_SQL)


# ----------------------------------------- data-quality audit

def dq_checks(spark, sf_dir):
    """Deequ-style data-quality report: one row per constraint with
    its violation count — null keys, duplicate primary keys, orphan
    foreign keys (anti-join), out-of-range values, and cross-column
    date-order violations. The curation counterpart of filter_funnel
    for RELATIONAL inputs: run it on every ingest batch, alert on any
    nonzero delta.

    Scale: each check is one scan-level aggregate (conditional sums)
    or one anti-join; nothing quadratic, nothing collected."""
    t = load_tables(spark, sf_dir)
    o, li, c = t["orders"], t["lineitem"], t["customer"]

    def one(chk, df):
        return df.select(F.lit(chk).alias("chk"),
                         F.col("v").cast("bigint").alias("violations"))

    rows = [
        one("orders_null_custkey",
            o.agg(F.sum(F.when(F.col("o_custkey").isNull(), 1)
                        .otherwise(0)).alias("v"))),
        one("orders_dup_orderkey",
            o.agg((F.count(F.lit(1))
                   - F.countDistinct("o_orderkey")).alias("v"))),
        one("lineitem_orphan_orderkey",
            li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti")
            .agg(F.count(F.lit(1)).alias("v"))),
        one("orders_orphan_custkey",
            o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti")
            .agg(F.count(F.lit(1)).alias("v"))),
        one("lineitem_qty_range",
            li.agg(F.sum(F.when((F.col("l_quantity") <= 0)
                                | (F.col("l_quantity") > 50), 1)
                         .otherwise(0)).alias("v"))),
        one("lineitem_ship_before_order",
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .agg(F.sum(F.when(F.col("l_shipdate")
                              < F.col("o_orderdate"), 1)
                       .otherwise(0)).alias("v"))),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("chk")


DQ_CHECKS_SQL = """
SELECT chk, CAST(v AS BIGINT) AS violations FROM (
  SELECT 'orders_null_custkey' AS chk,
         SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v
  FROM orders
  UNION ALL
  SELECT 'orders_dup_orderkey',
         COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
  UNION ALL
  SELECT 'lineitem_orphan_orderkey', COUNT(*) FROM lineitem
  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
  UNION ALL
  SELECT 'orders_orphan_custkey', COUNT(*) FROM orders
  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
  UNION ALL
  SELECT 'lineitem_qty_range',
         SUM(CASE WHEN l_quantity <= 0 OR l_quantity > 50
                  THEN 1 ELSE 0 END) FROM lineitem
  UNION ALL
  SELECT 'lineitem_ship_before_order',
         SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
) ORDER BY chk
"""

QUERIES["dq_checks"] = (dq_checks, DQ_CHECKS_SQL)


# ----------------------------------------- numeric profile / correlation

_PROFILE_COLS = [
    ("qty", "l_quantity"),
    ("price", "l_extendedprice"),
    ("disc", "l_discount"),
    ("tax", "l_tax"),
]


def numeric_profile(spark, sf_dir):
    """Pairwise Pearson correlation matrix over the lineitem numeric
    columns (data profiling / feature-drift monitoring), one row per
    column pair. Engines' native corr() accumulates incrementally and
    is NOT bit-stable cross-engine — instead every moment (Sx, Sxx,
    Sxy) is an EXACT decimal sum of 2-dp inputs, and the Pearson
    formula runs once per pair on identical doubles (the
    assortativity trick on relational columns).

    Scale: ONE scan-level aggregate computes all 14 moments
    map-side-partial; the 6 pair rows are projections of that single
    row — no per-pair passes."""
    li = load_tables(spark, sf_dir)["lineitem"]
    dec = {k: F.col(c).cast("decimal(18,2)") for k, c in _PROFILE_COLS}
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for k in dec:
        aggs.append(F.sum(dec[k]).alias(f"s_{k}"))
        aggs.append(F.sum(dec[k] * dec[k]).alias(f"ss_{k}"))
    pairs = [(a, b) for i, (a, _) in enumerate(_PROFILE_COLS)
             for b, _ in _PROFILE_COLS[i + 1:]]
    for a, b in pairs:
        aggs.append(F.sum(dec[a] * dec[b]).alias(f"sp_{a}_{b}"))
    mom = li.agg(*aggs)

    def corr_expr(a, b):
        n = F.col("n").cast("double")
        sx, sy = (F.col(f"s_{a}").cast("double"),
                  F.col(f"s_{b}").cast("double"))
        sxx, syy = (F.col(f"ss_{a}").cast("double"),
                    F.col(f"ss_{b}").cast("double"))
        sxy = F.col(f"sp_{a}_{b}").cast("double")
        return F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)), 6
        )

    out = None
    for a, b in pairs:
        row = mom.select(
            F.lit(a).alias("x"), F.lit(b).alias("y"), "n",
            F.round(F.col(f"s_{a}").cast("double") / F.col("n"), 6)
            .alias("mean_x"),
            F.round(F.col(f"s_{b}").cast("double") / F.col("n"), 6)
            .alias("mean_y"),
            corr_expr(a, b).alias("corr"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("x", "y")


def _numeric_profile_sql() -> str:
    dec = {k: f"CAST({c} AS DECIMAL(18,2))" for k, c in _PROFILE_COLS}
    moments = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for k, e in dec.items():
        moments.append(f"SUM({e}) AS s_{k}")
        moments.append(f"SUM({e} * {e}) AS ss_{k}")
    pairs = [(a, b) for i, (a, _) in enumerate(_PROFILE_COLS)
             for b, _ in _PROFILE_COLS[i + 1:]]
    for a, b in pairs:
        moments.append(f"SUM({dec[a]} * {dec[b]}) AS sp_{a}_{b}")
    sel = []
    for a, b in pairs:
        corr = (
            f"ROUND((CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            f" / (SQRT(CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
            f" * SQRT(CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)"
            f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))), 6)"
        )
        sel.append(
            f"SELECT '{a}' AS x, '{b}' AS y, n,"
            f" ROUND(CAST(s_{a} AS DOUBLE) / n, 6) AS mean_x,"
            f" ROUND(CAST(s_{b} AS DOUBLE) / n, 6) AS mean_y,"
            f" {corr} AS corr FROM mom"
        )
    union = "\nUNION ALL\n".join(sel)
    return f"""
WITH mom AS MATERIALIZED (
  SELECT
    {", ".join(moments)}
  FROM lineitem
)
{union}
ORDER BY x, y
"""


QUERIES["numeric_profile"] = (numeric_profile, _numeric_profile_sql())
