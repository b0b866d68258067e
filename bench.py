"""Benchmark runner (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], print ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall-clock seconds over the headline set (1 warm-up of
the graph build + timed runs; each query timed once — the driver
compares across rounds at fixed data/config).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_topk",
    "q5_region_revenue",
    "top_customers",
    "window_top_order_per_segment",
    # graph traversals
    "g_one_hop",
    "g_two_hop_count",
    "g_degree_topk",
    # temporal
    "temporal_replay",
    "sessionize",
    # training-data ops
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_stats",
    "ann_bruteforce_topk",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from graphdb_spark.session import build_spark

    spark = build_spark("graphdb_spark_bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    # warm-up: materialize the graph cache + JIT (not timed)
    from graphdb_spark.workloads.graph import graph_session

    g = graph_session(spark, sf_dir)
    g.vertex_count(), g.edge_count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()  # force full execution
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "spark_version": spark.version,
                "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
