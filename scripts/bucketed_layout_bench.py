"""Bucketed-layout demonstration (VERDICT r6 item 4) — bench-only.

SCALE.md claims "layout does the indexing": tables bucketed on their
join key let repeated fact joins skip the shuffle entirely (bucket
join — zero Exchange). partitioning.py proves the zero-Exchange plan
in a unit test; this script measures what that is WORTH on the
relational heads' fact join at sf10 (60M lineitem ⋈ 15M orders on
orderkey), on the same data the scale bench uses.

Three measurements, best-of-N each:
1. plain parquet join   — both sides shuffle on the key (the default)
2. bucketed-table join  — both sides pre-bucketed on the key: the
   join plans with ZERO Exchange (asserted from the physical plan)
3. the one-time bucketing write cost (the honest denominator: layout
   pays off only across repeated joins)

The join body is the q5/q3 fact-join shape: orders ⋈ lineitem on
orderkey, grouped aggregate over the joined rows. Dimension pruning
(region/nation broadcasts) is deliberately absent — it's orthogonal
to layout and would mask the shuffle being measured.

Usage: python scripts/bucketed_layout_bench.py [sf_dir] [buckets]
       (defaults /tmp/sf10synth, 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNS = 2


def fact_join(orders, lineitem, F):
    """q5-shaped fact join + grouped aggregate (no dimension side)."""
    return (
        orders.select("o_orderkey", "o_orderpriority")
        .join(
            lineitem.select(
                "l_orderkey",
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .alias("rev"),
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.sum("rev").alias("revenue"), F.count(F.lit(1)).alias("n"))
    )


def timed(label, fn, reps=RUNS):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"# {label:40s} {best:7.2f}s  -> {n}", file=sys.stderr, flush=True)
    return best


def main(sf_dir: str = "/tmp/sf10synth", buckets: int = 32) -> int:
    from pyspark.sql import functions as F

    from graphdb_spark.partitioning import write_bucketed
    from graphdb_spark.session import build_spark

    buckets = int(buckets)
    spark = build_spark("bucketed_layout")
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    plain = timed(
        "plain parquet fact join",
        lambda: fact_join(orders, lineitem, F).count(),
    )
    plan_txt = fact_join(orders, lineitem, F)._jdf.queryExecution() \
        .executedPlan().toString()
    plain_exchanges = plan_txt.count("Exchange")

    t0 = time.perf_counter()
    write_bucketed(orders, "ord_bucketed", "o_orderkey", buckets)
    write_bucketed(lineitem, "li_bucketed", "l_orderkey", buckets)
    write_cost = time.perf_counter() - t0
    print(f"# one-time bucketing write: {write_cost:.2f}s",
          file=sys.stderr, flush=True)

    ob = spark.table("ord_bucketed")
    lb = spark.table("li_bucketed")
    bucketed = timed(
        "bucketed-table fact join",
        lambda: fact_join(ob, lb, F).count(),
    )
    bplan = fact_join(ob, lb, F)._jdf.queryExecution() \
        .executedPlan().toString()
    # the join itself must be exchange-free; the grouped agg above it
    # still exchanges on its own (different) key
    bucketed_exchanges = bplan.count("Exchange")

    payload = {
        "metric": "bucketed_layout_fact_join",
        "unit": "sec",
        "sf_dir": sf_dir,
        "buckets": buckets,
        "plain_join_sec": round(plain, 3),
        "bucketed_join_sec": round(bucketed, 3),
        "speedup": round(plain / bucketed, 2),
        "one_time_bucketing_write_sec": round(write_cost, 3),
        "break_even_joins": (
            round(write_cost / (plain - bucketed), 1)
            if plain > bucketed else None
        ),
        "plain_plan_exchanges": plain_exchanges,
        "bucketed_plan_exchanges": bucketed_exchanges,
        "runs_per_query": RUNS,
    }
    print(json.dumps(payload))
    for t in ("ord_bucketed", "li_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
