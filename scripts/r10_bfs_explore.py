"""BFS phase-1 hop-shape A/B at sf0.1: the shipped hop is
filter(isin) -> distinct -> limit(cap+1) -> collect (one exchange +
CollectLimit's incremental jobs per hop). Variants:
  B: single-row collect_set aggregate (one tiny shuffle, fewer jobs)
  C: no distinct, driver-side dedupe (no exchange; limit still bounds)
Plus end-to-end g_bfs_reachability timing for context.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graphdb_spark.session import build_spark
from graphdb_spark.workloads.graph import graph_session
from graphdb_spark.operators.traversal import ISIN_FRONTIER_MAX


def timeit(label, thunk, n=5):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        thunk()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"# {label}: {best:.3f}s", file=sys.stderr)
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_spark("bfs_explore", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    g = graph_session(spark, sf_dir)
    g.vertex_count(), g.edge_count()
    print(f"# max_branch(out) = {g.max_branch('out')}", file=sys.stderr)

    step = g.edges_for("out").select(
        F.col("src").alias("from"), F.col("dst").alias("to"))

    # hop 1 frontier
    f1 = ["c_1"]
    rows1 = (step.filter(F.col("from").isin(f1)).select("to")
             .distinct().collect())
    f2 = sorted(r[0] for r in rows1)
    print(f"# hop1 -> {len(f2)} ids", file=sys.stderr)

    cap = ISIN_FRONTIER_MAX

    def hop_shipped(fr):
        return (step.filter(F.col("from").isin(fr)).select("to")
                .distinct().limit(cap + 1).collect())

    def hop_cset(fr):
        row = (step.filter(F.col("from").isin(fr))
               .agg(F.slice(F.sort_array(F.collect_set("to")), 1, cap + 1)
                    .alias("ids")).collect())
        return row[0]["ids"]

    def hop_nodistinct(fr):
        rows = (step.filter(F.col("from").isin(fr)).select("to")
                .limit(cap + 1).collect())
        return {r[0] for r in rows}

    for label, fn in [("shipped distinct+limit", hop_shipped),
                      ("collect_set 1-row agg", hop_cset),
                      ("no distinct, driver dedupe", hop_nodistinct)]:
        timeit(f"hop1 {label}", lambda fn=fn: fn(f1))
        timeit(f"hop2 {label}", lambda fn=fn: fn(f2))

    from graphdb_spark.workloads.graph import g_bfs_reachability

    def full():
        g_bfs_reachability(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
    timeit("g_bfs_reachability end-to-end", full)
    spark.stop()


if __name__ == "__main__":
    main()
