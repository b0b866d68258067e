"""Adversarial-skew stress (r5 VERDICT item 5) — bench-only, non-gate.

Every skew defense in the engine (adamic_adar's hub cap, informed
broadcast, pinned explosion stages, AQE skew join) was plan-asserted
but never stress-MEASURED. This script salts two classic hot keys into
the sf0.1 data and records before/after wall time:

1. HUB DST: one synthetic part shared by 50k orders (~1000x the p95
   dst degree) appended to the CONTAINS edge set -> adamic_adar. The
   max_degree cap must prune the hub during candidate prep, so wall
   time should be ~flat.

2. HOT LSH BAND: 5,000 near-identical docs (same text, distinct ids)
   appended to documents -> minhash LSH candidates + near-dup
   clustering. All 5k land in the same 4 band buckets, so an uncapped
   bucket self-join owes 12.5M pairs from ONE key — the stress is
   whether the engine's bucket handling keeps that bounded.

3. VECTOR CLONE ATTACK (r6 VERDICT: cosine_neardup_pairs failed
   silently at sf10, whose synth set IS a 100-way clone attack):
   5,000 copies of one embedding appended -> cosine_neardup_pairs
   uncapped vs bucket_cap=200. Every clone shares every band bucket,
   so uncapped owes 12.5M scored pairs from one key; the cap must
   star-link them (4,999 pairs) and stay ~flat.

4. BUCKETED LAYOUT UNDER HUB SKEW (r7 VERDICT item 7): bucketing
   edges by dst sends a hub dst's 50k rows to ONE bucket file/scan
   task — the concentration a skewed bucket key can cause. Measured:
   groupBy(dst) degree (bucketed elides the exchange; the hub bucket
   is just a fatter scan task) and adamic_adar reading dst-bucketed
   edges (the cap prunes the hub during candidate prep exactly as on
   plain parquet). Both should stay ~flat hub vs no-hub.

Usage: python scripts/skew_stress.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

HUB_DEGREE = 50_000
HOT_DOCS = 5_000


def timed(label, fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        n = fn().count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:44s} {best:7.2f}s  rows={n}", flush=True)
    return best


def main(sf_dir: str = "/root/testdata/sf0.1") -> int:
    from graphdb_spark.operators.analytics import adamic_adar
    from graphdb_spark.operators.dedup import (
        minhash_lsh_candidates,
        near_dup_clusters,
    )
    from graphdb_spark.session import build_spark
    from graphdb_spark.sources.tpch import load_tables

    spark = build_spark("skew_stress")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- 1. hub destination into the CONTAINS edges ----------------
    li = load_tables(spark, sf_dir)["lineitem"]
    edges = li.select(
        F.col("l_orderkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    hub = spark.range(HUB_DEGREE).select(
        (F.col("id") + 10_000_000).alias("src"),
        F.lit(99_999_999).cast("long").alias("dst"),
    )
    base_aa = timed(
        "adamic_adar baseline",
        lambda: adamic_adar(edges, max_degree=1000, top_k=20),
    )
    skew_aa = timed(
        f"adamic_adar + hub dst (deg {HUB_DEGREE})",
        lambda: adamic_adar(edges.unionByName(hub), max_degree=1000,
                            top_k=20),
    )

    # ---- 2. hot LSH band: 5k near-identical docs --------------------
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    one = docs.orderBy("doc_id").limit(1)
    clones = (
        spark.range(HOT_DOCS)
        .crossJoin(F.broadcast(one.select("text")))
        .select((F.col("id") + 5_000_000).alias("doc_id"), "text")
    )
    salted = docs.unionByName(clones)
    base_lsh = timed(
        "minhash_lsh_candidates baseline",
        lambda: minhash_lsh_candidates(docs),
    )
    skew_lsh = timed(
        f"minhash_lsh_candidates + {HOT_DOCS} clones (uncapped)",
        lambda: minhash_lsh_candidates(salted),
    )
    cap_lsh = timed(
        f"minhash_lsh_candidates + clones, bucket_cap=200",
        lambda: minhash_lsh_candidates(salted, bucket_cap=200),
    )
    base_cc = timed(
        "near_dup_clusters baseline (cap default)",
        lambda: near_dup_clusters(docs),
    )
    skew_cc = timed(
        f"near_dup_clusters + {HOT_DOCS} clones (cap default)",
        lambda: near_dup_clusters(salted),
    )

    # ---- 3. vector clone attack: cosine_neardup_pairs ---------------
    from graphdb_spark.operators.similarity import cosine_neardup_pairs

    emb = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", "embedding"
    )
    vone = emb.orderBy("vec_id").limit(1)
    vclones = (
        spark.range(HOT_DOCS)
        .crossJoin(F.broadcast(vone.select("embedding")))
        .select((F.col("id") + 5_000_000).alias("vec_id"), "embedding")
    )
    vsalted = emb.unionByName(vclones)
    base_vec = timed(
        "cosine_neardup baseline (cap=200)",
        lambda: cosine_neardup_pairs(emb, bucket_cap=200),
    )
    skew_vec = timed(
        f"cosine_neardup + {HOT_DOCS} clones (uncapped)",
        lambda: cosine_neardup_pairs(vsalted),
    )
    cap_vec = timed(
        f"cosine_neardup + clones, bucket_cap=200",
        lambda: cosine_neardup_pairs(vsalted, bucket_cap=200),
    )

    # ---- 4. bucketed layout under hub skew (r7 VERDICT item 7) ------
    from graphdb_spark.partitioning import write_bucketed

    write_bucketed(edges, "skew_e_in", "dst", 32)
    write_bucketed(edges.unionByName(hub), "skew_e_in_hub", "dst", 32)
    eb, eb_hub = spark.table("skew_e_in"), spark.table("skew_e_in_hub")
    base_deg_b = timed(
        "degree groupBy(dst) dst-bucketed, no hub",
        lambda: eb.groupBy("dst").agg(F.count(F.lit(1)).alias("d")),
    )
    hub_deg_b = timed(
        "degree groupBy(dst) dst-bucketed + hub",
        lambda: eb_hub.groupBy("dst").agg(F.count(F.lit(1)).alias("d")),
    )
    base_aa_b = timed(
        "adamic_adar dst-bucketed, no hub",
        lambda: adamic_adar(eb, max_degree=1000, top_k=20),
    )
    hub_aa_b = timed(
        "adamic_adar dst-bucketed + hub",
        lambda: adamic_adar(eb_hub, max_degree=1000, top_k=20),
    )
    for t in ("skew_e_in", "skew_e_in_hub"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    print(
        f"\nsummary: adamic {base_aa:.2f}->{skew_aa:.2f}s "
        f"({skew_aa / base_aa:.2f}x), lsh uncapped {base_lsh:.2f}->"
        f"{skew_lsh:.2f}s ({skew_lsh / base_lsh:.2f}x), lsh capped "
        f"{cap_lsh:.2f}s ({cap_lsh / base_lsh:.2f}x), cluster "
        f"{base_cc:.2f}->{skew_cc:.2f}s ({skew_cc / base_cc:.2f}x), "
        f"vec uncapped {base_vec:.2f}->{skew_vec:.2f}s "
        f"({skew_vec / base_vec:.2f}x), vec capped {cap_vec:.2f}s "
        f"({cap_vec / base_vec:.2f}x), bucketed degree "
        f"{base_deg_b:.2f}->{hub_deg_b:.2f}s "
        f"({hub_deg_b / base_deg_b:.2f}x), bucketed adamic "
        f"{base_aa_b:.2f}->{hub_aa_b:.2f}s "
        f"({hub_aa_b / base_aa_b:.2f}x)"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
