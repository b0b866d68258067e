"""sf1 (10x sf0.1) parity spot-check — VERDICT r1 item 9.

Runs the 15 TPC-H shapes + the dedup pipeline (+ the new
embedding-cosine near-dup) on the synthesized sf1 dataset
(scripts/make_sf1.py), Spark vs DuckDB on the same parquet, using the
exact compare (row count + schema + canonicalized values) from the
local gate replica. Proves the cross-engine exactness tricks
(decimal-exact sums, portable hash, sequential-double dot products)
hold at another 10x.

Usage: python scripts/sf1_parity.py [sf_dir]   (default /tmp/sf1synth)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

TPCH = (
    "q1_pricing_summary q3_shipping_topk q4_order_priority "
    "q5_region_revenue q6_forecast_revenue q7_nation_volume "
    "q10_returned_items q12_shipmode q13_order_distribution "
    "q14_promo_revenue q15_top_supplier q17_small_qty_revenue "
    "q18_large_volume q19_disjunctive_revenue q22_global_sales"
).split()
DEDUP = (
    "dedup_exact dedup_minhash_lsh dedup_simhash dedup_simhash_pairs "
    "dedup_ngram_jaccard dedup_cluster_canonical emb_cosine_neardup "
    "dedup_lev_verified"
).split()
# r3s3: temporal + training-pipeline families at 10x — the epoch-ms
# arithmetic, window/session logic, and the rollup decomposition must
# stay bit-exact as data grows, not just the sums and hashes.
TEMPORAL = (
    "temporal_replay time_window_agg asof_last_click sessionize "
    "range_join_attrib rollup_gauges temporal_diff"
).split()
PIPELINE = (
    "boilerplate_chunks pii_redaction seq_packing contamination_overlap "
    "gopher_quality repetition_stats unigram_rarity filter_funnel "
    "domain_cap url_host_stats"
).split()
# session-3 batch 2: iterative analytics + basket/heavy-hitter shapes
EXTRA = "g_ppr_top g_hits_top item_cooccur_topk top_ngrams".split()
# round 4: span dedup + the newly-gated surfaces (Cypher DML script,
# SQL function registry, audio fingerprint dedup) and the changed
# traversal paths at 10x
R4 = (
    "dedup_substring_spans cypher_dml_final cypher_dml_edges "
    "cypher_dml_checks sql_registry_funcs media_audio_dedup "
    "g_bfs_reachability g_closeness_seeds cypher_grouped_count"
).split()
# round 5: search/link-prediction/decay/mixing/global-HAVING shapes —
# log-based scoring and decimal-decayed sums must stay exact at 10x
R5 = (
    "text_bm25_topk g_adamic_adar decayed_user_value quality_mix_bins "
    "q11_important_value"
).split()
# round-5 session-2: chunking/DSIR/recall/jaccard — explode-slice
# fingerprints, smoothed log-ratios, set intersections, and the
# shared one-shuffle pair prep at 10x
R5B = (
    "doc_chunking dsir_importance ann_recall_eval g_jaccard_links"
).split()
# round-5 session-3: bigram-LM NLL sums, posting-list tf-idf dots,
# quantization RMSE folds, per-stratum split cuts, format checksums —
# every new decimal/ln/floor exactness trick re-proven at 10x
R5C = (
    "lm_bigram_score tfidf_cosine_pairs emb_quantize_error "
    "stratified_splits format_roundtrip anomaly_hours "
    "g_walk_pairs value_histogram interarrival_gaps"
).split()
# g_modularity is EXCLUDED at sf1 (was in this list): its DuckDB twin
# unrolls the LPA iterations as recursive CTEs and spills >80 GB of
# temp at sf1 — it exhausted the container disk twice (IOException:
# no space left, r5s4 log). The Spark side completes fine; parity is
# proven at sf0.01 (gate) and the operator invariants in
# tests/test_analytics.py. Same reasoning as the triangle family
# below: the ORACLE is the single-node bottleneck, not the engine.
# round-5 session-4: SCD2 epoch-ms interval chains, dense-spine
# LOCF carry, shard manifests' order checksums at 10x. The triangle
# family (g_edge_support/clustering/triangle) is EXCLUDED here on
# purpose: its DuckDB twin is a naive string-keyed wedge join that
# needs ~25 min at sf1 (16.6 s at sf0.1, superlinear) — parity for
# those is proven at sf0.01 (gate) and sf0.1 (local run), plus the
# sum(support) == sum(triangles) cross-operator invariant.
R5D = "scd2_intervals gapfill_locf corpus_shards".split()
# round-5 session-4 batch 2: streaming joins/state/sessions at 10x
# (true engine paths), incremental-dedup store probe, distribution
# windows, grouping sets, DQ report, exact-moment correlations.
# g_ktruss joins the triangle family's documented exclusion (its
# 6-layer materialized oracle on the 12M-edge sf1 graph is the same
# disk-exhausting shape as g_modularity's unrolled LPA).
R5E = (
    "stream_interval_join stream_user_state stream_session_windows "
    "emb_dim_stats dedup_incremental window_analytics "
    "grouping_sets_report dq_checks numeric_profile"
).split()
# the change-log folds (batch twin + TRUE foreachBatch replay) at 10x
R5F = ("stream_fold_degrees stream_apply_changelog "
        "dedup_funnel").split()


def check_modularity_arithmetic(spark, con, sf_dir: str) -> list[str]:
    """Closes the one hole in the sf1 ledger (r5 VERDICT item 3):
    g_modularity's full oracle re-derives LPA as an unrolled closure
    and spills >80 GB at sf1. Instead: materialize the Spark LPA
    labels once, then verify the modularity ARITHMETIC (degrees,
    internal edges, contributions, Q) with a pure-aggregation DuckDB
    twin over that assignment — LPA label exactness itself stays
    proven by the full unrolled oracle at sf0.01 (gate)."""
    import tempfile

    from pyspark.sql import functions as F
    from test_oracle_parity import compare

    from graphdb_spark import workloads
    from graphdb_spark.operators.analytics import label_propagation
    from graphdb_spark.workloads.graph import (
        _modularity_arith_sql,
        graph_session,
    )

    g = graph_session(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="gs_sf1_lpa_") + "/labels"
    (label_propagation(g.edges, max_iter=2)
     .select(F.col("id").alias("vid"), F.col("community").alias("comm"))
     .write.mode("overwrite").parquet(out))
    sdf = workloads.all_unpacked_queries()["g_modularity"](spark, sf_dir)
    return compare(sdf, con.sql(_modularity_arith_sql(f"{out}/*.parquet")))


def main(sf_dir: str = "/tmp/sf1synth") -> int:
    from test_oracle_parity import TABLES, compare

    from graphdb_spark import workloads
    from graphdb_spark.session import build_spark

    spark = build_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = workloads.all_unpacked_queries()
    oracles = workloads.all_unpacked_oracles()
    failures = {}
    for name in (TPCH + DEDUP + TEMPORAL + PIPELINE + EXTRA + R4 + R5
                 + R5B + R5C + R5D + R5E + R5F):
        t0 = time.time()
        try:
            problems = compare(qs[name](spark, sf_dir), con.sql(oracles[name]))
        except Exception as e:  # noqa: BLE001
            problems = [f"exception: {type(e).__name__}: {e}"]
        dt = time.time() - t0
        status = "OK" if not problems else "FAIL"
        print(f"{name:28s} {status:4s} {dt:7.2f}s"
              + ("" if not problems else f"  {problems}"))
        if problems:
            failures[name] = problems
    # g_modularity: arithmetic-only twin over materialized LPA labels
    # (the full unrolled oracle spills >80 GB at sf1 — see the
    # exclusion note above and check_modularity_arithmetic)
    t0 = time.time()
    try:
        problems = check_modularity_arithmetic(spark, con, sf_dir)
    except Exception as e:  # noqa: BLE001
        problems = [f"exception: {type(e).__name__}: {e}"]
    dt = time.time() - t0
    print(f"{'g_modularity(arith)':28s} {'OK' if not problems else 'FAIL':4s}"
          f" {dt:7.2f}s" + ("" if not problems else f"  {problems}"))
    if problems:
        failures["g_modularity(arith)"] = problems
    spark.stop()
    total = len(TPCH + DEDUP + TEMPORAL + PIPELINE + EXTRA + R4 + R5
                + R5B + R5C + R5D + R5E + R5F) + 1
    print(f"\n{total - len(failures)}/{total} parity"
          f" at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
