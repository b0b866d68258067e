"""A/B: incremental layout maintenance (append overlay) vs full
REINDEX at sf1 — VERDICT r9 item 2's measured 'done' criterion.

Scenario: a resident graph with the dual bucketed adjacency adopted,
then a bulk load adds ~1% new edges. Compare:

- ``append``: append_state folds the delta into the layout tables
  (O(delta) write + fingerprint fold; layout stays adopted)
- ``reindex``: the old path — mutation drops the layout, a full
  three-table ensure_bucketed_layout rewrite restores it
- hop latency after each: the 2-hop count head over (a) the pristine
  layout, (b) the appended layout (multi-file buckets), (c) plain
  cached frames (what hops fall back to between mutation and REINDEX)

Usage: python scripts/layout_delta_bench.py [sf_dir]
Prints one JSON line; record the numbers in NOTES.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graphdb_spark.algebra import Q  # noqa: E402
from graphdb_spark.session import GraphSession, build_spark  # noqa: E402
from graphdb_spark.sources.tpch import tpch_graph  # noqa: E402
from graphdb_spark import partitioning as P  # noqa: E402


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def two_hop(g):
    q = (
        Q.vertices_with_property_value("mktsegment", "BUILDING")
        .outbound(t="PLACED").inbound().outbound(t="CONTAINS").inbound()
        .count()
    )
    return g.get(q)[-1].count


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_spark("layout_delta_bench", master=f"local[{cpus}]",
                        shuffle_partitions=int(cpus))
    v, e = tpch_graph(spark, sf_dir)
    n_edges = e.count()
    # ~1% delta: synthetic new orders hanging off existing customers
    n_delta = max(1, n_edges // 100)
    delta_e = (
        e.limit(n_delta)
        .select(
            "src", "relationship",
            F.concat(F.lit("newdst_"), F.monotonically_increasing_id())
            .alias("dst"),
            "properties",
        )
        .localCheckpoint()
    )
    delta_v = (
        delta_e.select(F.col("dst").alias("id"), F.lit("order").alias("label"),
                       F.create_map().cast("map<string,string>")
                       .alias("properties"))
        .localCheckpoint()
    )

    out = {"sf_dir": sf_dir, "edges": n_edges, "delta_edges": n_delta}
    name = "ldb_adj"
    P.drop_adjacency(spark, name)
    g = GraphSession(spark, v, e, assume_integrity=True)
    out["initial_write_sec"], _ = timed(
        lambda: g.ensure_bucketed_layout(name, 32, cache=True))
    out["hop_pristine_sec"], _ = timed(lambda: two_hop(g))
    out["hop_pristine_sec2"], _ = timed(lambda: two_hop(g))

    # A: append overlay — layout survives, O(delta) maintenance
    out["append_sec"], _ = timed(
        lambda: g.append_state(vertices=delta_v, edges=delta_e))
    assert g._e_by_key, "layout must stay adopted through the append"
    out["hop_appended_sec"], hop_n = timed(lambda: two_hop(g))
    out["hop_appended_sec2"], _ = timed(lambda: two_hop(g))
    out["hop_rows"] = hop_n

    # B: the old path — mutation drops the layout (hops on plain
    # frames), then a full REINDEX restores it
    g2 = GraphSession(spark, v, e, assume_integrity=True)
    g2.set_state(vertices=v.unionByName(delta_v).cache(),
                 edges=e.unionByName(delta_e).cache())
    out["hop_plain_sec"], plain_n = timed(lambda: two_hop(g2))
    out["hop_plain_sec2"], _ = timed(lambda: two_hop(g2))
    assert plain_n == hop_n, (plain_n, hop_n)
    P.drop_adjacency(spark, name + "_b")
    out["full_reindex_sec"], _ = timed(
        lambda: g2.ensure_bucketed_layout(name + "_b", 32, cache=True))
    out["hop_reindexed_sec"], re_n = timed(lambda: two_hop(g2))
    assert re_n == hop_n, (re_n, hop_n)

    # C: compaction cost (restores one-file-per-bucket on A's layout)
    out["compact_sec"], _ = timed(lambda: g.compact_layout())
    out["hop_compacted_sec"], c_n = timed(lambda: two_hop(g))
    assert c_n == hop_n, (c_n, hop_n)

    P.drop_adjacency(spark, name)
    P.drop_adjacency(spark, name + "_b")
    print(json.dumps({k: round(val, 3) if isinstance(val, float) else val
                      for k, val in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
