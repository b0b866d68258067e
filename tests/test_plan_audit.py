"""Physical-plan audits: the scale properties we claim must be visible
in `.explain()` output — filters pushed to parquet scans, column
pruning, broadcast joins on traversal hops, whole-stage codegen on the
text operators."""

import pytest


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    """q1's shipdate filter must appear as a parquet PushedFilters
    entry, and the scan must prune to the referenced columns only."""
    from graphdb_spark.workloads.relational import q1_pricing_summary

    df = q1_pricing_summary(spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: l_comment-free schema (only referenced columns)
    scan_line = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_line, plan
    assert "l_orderkey" not in scan_line[0]  # unused column pruned


def test_point_lookup_pushdown(spark, sf_dir):
    """SpecificVertex point lookups push id predicates into the scan
    (replaces the reference's KV point-get, rdb/datastore.rs:72-80)."""
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = cust.filter(F.col("c_custkey") == 42).select("c_name")
    plan = plan_of(df)
    assert "PushedFilters" in plan and "EqualTo(c_custkey,42)" in plan


def test_traversal_uses_broadcast_joins(spark, sf_dir):
    """Every hop of the 2-hop pipe traversal must be a broadcast hash
    semi-join at this scale — no sort-merge exchanges."""
    from graphdb_spark.algebra import Q
    from graphdb_spark.workloads.graph import graph_session

    g = graph_session(spark, sf_dir)
    q = (
        Q.vertices_with_property_value("mktsegment", "BUILDING")
        .outbound(t="PLACED")
        .inbound()
    )
    plan = plan_of(g.df(q))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the DEEP chain too: pre-r3 the later hops planned SortMergeJoins
    # (static planner can't size a derived frontier; AQE can't re-plan
    # across cached scans) — the exact-count probe broadcast must hold
    # for every hop of the 2-hop part traversal as well
    deep = q.outbound(t="CONTAINS").inbound()
    plan2 = plan_of(g.df(deep))
    assert "SortMergeJoin" not in plan2


def test_text_ops_stay_jvm_side(spark, sf_dir):
    """Text analysis must be pure Catalyst expressions: no Python
    evaluation nodes (BatchEvalPython/ArrowEvalPython), scan pruned to
    the two referenced columns. (Higher-order functions like
    aggregate/transform run JVM-interpreted rather than codegen'd —
    still two orders of magnitude from row-at-a-time Python.)"""
    from graphdb_spark.workloads.text import text_stats

    plan = plan_of(text_stats(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "PythonUDF" not in plan
    scan = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "struct<doc_id:bigint,text:string>" in scan


def test_dedup_has_no_cross_join(spark, sf_dir):
    """LSH candidate generation must never produce a cartesian
    product."""
    from graphdb_spark.workloads.text import dedup_minhash_lsh

    plan = plan_of(dedup_minhash_lsh(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cypher_where_prunes_via_filters(spark, sf_dir):
    """Cypher WHERE lowers to Catalyst Filter nodes over the scan (the
    reference full-scans then filters in app code)."""
    from graphdb_spark.workloads.graph import graph_session

    g = graph_session(spark, sf_dir)
    df = g.cypher(
        "MATCH (c:customer) WHERE c.acctbal > 9000 RETURN c.name AS name"
    )
    opt = optimized_of(df)
    assert "Filter" in opt
    # label filter + property filter both present pre-shuffle
    assert "customer" in opt


def test_q7_broadcasts_dimensions(spark, sf_dir):
    """Q7's nation/supplier lookups must be broadcast joins; only the
    lineitem-orders-customer fact joins may shuffle."""
    from graphdb_spark.workloads.relational import q7_nation_volume

    plan = plan_of(q7_nation_volume(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # shipdate range filter pushed into the fact scan
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_q19_disjunction_pushdown(spark, sf_dir):
    """OR-of-ANDs: at minimum the joint Or predicate must reach the
    part scan (brand/size), and the join must broadcast the part side."""
    from graphdb_spark.workloads.relational import q19_disjunctive_revenue

    plan = plan_of(q19_disjunctive_revenue(spark, sf_dir))
    assert "Or(" in plan or "Or (" in plan  # pushed disjunction
    assert "BroadcastHashJoin" in plan


def test_ivf_assignment_is_broadcast(spark, sf_dir):
    """IVF: the N x n_cells scoring must broadcast the centroid side —
    never shuffle the full embedding table against 16 rows."""
    from graphdb_spark.workloads.embeddings import ann_ivf_topk

    plan = plan_of(ann_ivf_topk(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_label_propagation_no_cartesian(spark, sf_dir):
    """LPA's vote join is an equi-join on the neighbor id — a cartesian
    in the plan means the join key was lost."""
    from graphdb_spark.operators.analytics import label_propagation
    from graphdb_spark.workloads.graph import graph_session

    g = graph_session(spark, sf_dir)
    plan = plan_of(label_propagation(g.edges, max_iter=1))
    assert "CartesianProduct" not in plan


def test_quality_rules_zero_shuffle(spark, sf_dir):
    """gopher_quality must be a pure scan: no Exchange, no
    BatchEvalPython — it's the operator we claim runs at parquet scan
    speed on 100 TB."""
    from graphdb_spark.workloads.pipeline import gopher_quality

    plan = plan_of(gopher_quality(spark, sf_dir))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_funnel_single_aggregate_exchange(spark, sf_dir):
    """filter_funnel adds exactly one aggregation shuffle over the
    6-stage explode (plus AQE reads); no joins at all."""
    from graphdb_spark.workloads.pipeline import filter_funnel

    plan = plan_of(filter_funnel(spark, sf_dir))
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_repetition_no_cartesian(spark, sf_dir):
    from graphdb_spark.workloads.pipeline import repetition_stats

    plan = plan_of(repetition_stats(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_unigram_rarity_broadcasts_vocab(spark, sf_dir):
    """The vocabulary side of the frequency join is tiny relative to
    the exploded token stream — at gate SFs it must come back as a
    broadcast join, never a cartesian."""
    from graphdb_spark.workloads.pipeline import unigram_rarity

    df = unigram_rarity(spark, sf_dir)
    df.count()  # let AQE finalize
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_weighted_sssp_no_sort_merge_per_round(spark, sf_dir):
    """Each relaxation round joins the (tiny, exactly-counted) frontier
    against the edge table — the informed-broadcast pattern must hold
    here like it does for bfs: no CartesianProduct anywhere, and the
    frontier joins resolve to broadcast hash joins at this scale."""
    from graphdb_spark.workloads.admin_gate import g_weighted_sssp

    df = g_weighted_sssp(spark, sf_dir)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan


def test_rollup_single_exchange_per_level(spark, sf_dir):
    """Each rollup level is one partial-aggregated hash exchange; the
    daily merge must read the hourly aggregate, not raw events (two
    HashAggregate pairs, no extra joins or windows)."""
    from graphdb_spark.workloads.temporal import rollup_gauges

    plan = plan_of(rollup_gauges(spark, sf_dir))
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "Window" not in plan  # gauges are aggregates, not windows
    # partial_ min_by/max_by prove map-side combine on both levels
    assert plan.count("partial_min_by") >= 2 or plan.count("partial_minby") >= 2, plan


def test_lev_verify_cost_bounded_by_candidates(spark, sf_dir):
    """The Levenshtein verify stage must join texts back per-candidate
    (hash joins) — never an all-pairs product."""
    from graphdb_spark.workloads.text import dedup_lev_verified

    plan = plan_of(dedup_lev_verified(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan  # JVM expression, not a Python UDF
    assert "BatchEvalPython" not in plan


def test_domain_cap_one_window_exchange(spark, sf_dir):
    """Per-source cap: one hash exchange on source for the window +
    the final aggregate; no joins."""
    from graphdb_spark.workloads.pipeline import domain_cap

    plan = plan_of(domain_cap(spark, sf_dir))
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Window") == 1


def test_item_cooccur_joins_through_order_key(spark, sf_dir):
    """Market-basket pair generation must meet through the shared
    order equi-join — no cartesian or nested-loop pair explosion."""
    from graphdb_spark.workloads.relational import item_cooccur_topk

    plan = plan_of(item_cooccur_topk(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts


def test_top_ngrams_partial_agg_topk(spark, sf_dir):
    """Heavy hitters: map-side partial count + 20-row ordered take."""
    from graphdb_spark.workloads.text import top_ngrams

    plan = plan_of(top_ngrams(spark, sf_dir))
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_bounded_bfs_fully_reduced_result_plan(spark, sf_dir):
    """The branch-bounded BFS runs its hops as IN-predicate scans
    (frontier pushdown) and assembles the result driver-side, so the
    RESULT plan must be a local relation — no join, no exchange, no
    rescan of the edge relation when the caller's action runs."""
    from graphdb_spark.workloads.graph import graph_session

    g = graph_session(spark, sf_dir)
    df = g.bfs("c_1", max_depth=2, direction="out")
    plan = plan_of(df)
    assert "SortMergeJoin" not in plan and "Exchange" not in plan
    assert "FileScan" not in plan and "InMemoryTableScan" not in plan


def test_substring_dup_plan_no_cartesian_partial_agg(spark, sf_dir):
    """Span-dedup must meet windows only through the hash equi-join
    (never all-pairs) and pre-aggregate map-side before the shuffle."""
    from graphdb_spark.workloads.text import dedup_substring_spans

    df = dedup_substring_spans(spark, sf_dir)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan or "HashAggregate" in plan


def test_bm25_no_explode_no_python(spark, sf_dir):
    """BM25 must stay codegen'd: tf via higher-order array filters (no
    Generate/explode of the token stream), no Python execution, and
    the corpus stats joined back by BROADCAST (a scalar row)."""
    from graphdb_spark.workloads.text import text_bm25_topk

    df = text_bm25_topk(spark, sf_dir)
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate" not in plan  # no token explode anywhere
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_adamic_adar_pairs_meet_through_dst(spark, sf_dir):
    """Pair generation must be the dst equi-join (deg-squared bound),
    never a cartesian/nested-loop pair join."""
    from graphdb_spark.workloads.graph import g_adamic_adar

    plan = plan_of(g_adamic_adar(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "dst" in plan  # join keyed on the shared destination


def test_decayed_value_single_keyed_exchange(spark, sf_dir):
    """The decayed aggregate must shuffle ONLY on user_id (plus the
    scalar now-row broadcast): same exchange profile as a plain sum."""
    from graphdb_spark.workloads.temporal import decayed_user_value

    plan = plan_of(decayed_user_value(spark, sf_dir))
    ex = [l for l in plan.splitlines()
          if "Exchange hashpartitioning" in l]
    assert all("user_id" in l for l in ex), ex
    assert "BatchEvalPython" not in plan


def test_doc_chunking_zero_shuffle(spark, sf_dir):
    """Chunking is per-doc work: tokenize + sequence + explode + slice
    in one codegen'd scan — the ONLY exchange allowed is the explicit
    input spread (round-robin), never a hash/aggregate shuffle, and no
    Python evaluation."""
    from graphdb_spark.workloads.pipeline import doc_chunking

    df = doc_chunking(spark, sf_dir)
    # strip the deterministic output ORDER BY (presentation, not
    # computation — the driver melts and sorts anyway)
    plan = plan_of(df.limit(10**9))
    assert "Exchange hashpartitioning" not in plan
    assert "EvalPython" not in plan


def test_dsir_weight_join_is_broadcast(spark, sf_dir):
    """The 256-row bucket-weight table must come back as a broadcast
    join; the only hash exchanges are on doc/bucket keys (the one
    explode aggregate and its derivatives) — no cartesian, no Python."""
    from graphdb_spark.workloads.pipeline import dsir_importance

    plan = plan_of(dsir_importance(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_adamic_prep_single_edge_exchange(spark, sf_dir):
    """The one-shuffle candidate prep: in the FINAL adaptive plan the
    edge set is hash-exchanged on dst exactly once — the self-join's
    second side must be a ReusedExchange of the same stage (dedup +
    degree + weight all happen inside those partitions, so both sides
    canonicalize identically) — and the only other hash exchange is
    the pair aggregate on (src_a, src_b)."""
    from graphdb_spark.workloads.graph import g_adamic_adar

    df = g_adamic_adar(spark, sf_dir)
    df.collect()  # finalize the adaptive plan
    plan = plan_of(df).split("== Initial Plan ==")[0]
    ex = [l for l in plan.splitlines()
          if "Exchange hashpartitioning" in l]
    dst_ex = [l for l in ex
              if "dst" in l and "ReusedExchange" not in l]
    # r9: the pair aggregate exchanges the PACKED long key (pk =
    # src_a<<32 | src_b); (src_a, src_b) is the >2^31-source fallback
    pair_ex = [l for l in ex
               if "pk#" in l or ("src_a" in l and "src_b" in l)]
    assert len(dst_ex) == 1, dst_ex
    assert len(pair_ex) == 1, pair_ex
    # this dataset's sources are 31-bit orderkeys, so the pair key
    # MUST be the packed long — an (src_a, src_b) exchange here means
    # the packability probe regressed and pairs shuffle double-wide
    assert "pk#" in pair_ex[0], pair_ex
    assert any("ReusedExchange" in l and "dst" in l
               for l in plan.splitlines()), plan


def test_ann_recall_no_python_no_cartesian_beyond_probe(spark, sf_dir):
    """Recall eval composes three audited plans; the only cross joins
    allowed are the labeled brute-force probe and the IVF centroid
    assignment (both broadcast, |queries| x N and N x n_cells); no
    Python evaluation anywhere."""
    from graphdb_spark.workloads.embeddings import ann_recall_eval

    plan = plan_of(ann_recall_eval(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan  # crossJoins are broadcast


def test_lm_bigram_model_join_is_broadcast(spark, sf_dir):
    """The bigram-LM weight table is bounded by the bucket space
    (256x1024), so it must come back as a broadcast join; no
    cartesian, no Python evaluation anywhere in the scoring plan.
    The r8 rewrite additionally removed the corpus-sized exchange:
    the old plan pinned a full-width (doc_id, b1, b12) repartition —
    its hashpartitioning signature must never reappear (remaining
    exchanges are the partial-agg-bounded model and per-doc ones)."""
    from graphdb_spark.workloads.pipeline import lm_bigram_score

    plan = plan_of(lm_bigram_score(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    # no exchange keyed on the full (doc_id, b1, b12) triple — match
    # ANY key order (r8 ADVICE: a regressed exchange keyed (b1, b12,
    # doc_id) must fail this too, not just the one historical order)
    import re
    for clause in re.findall(r"hashpartitioning\([^)]*\)", plan):
        assert not (
            "doc_id#" in clause
            and ("b1#" in clause or "b12#" in clause)
        ), f"corpus-wide gram exchange reappeared: {clause}"


def test_tfidf_pairs_meet_through_terms(spark, sf_dir):
    """tf-idf pair similarity must generate candidates ONLY through
    the posting-list equi-join on the term key — no cartesian product
    — and stay JVM-side."""
    from graphdb_spark.workloads.text import tfidf_cosine_pairs

    plan = plan_of(tfidf_cosine_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_emb_quantize_single_exchange(spark, sf_dir):
    """Quantization error is per-row higher-order-function arithmetic:
    the ONLY shuffle is the final per-label aggregate; zero Python."""
    from graphdb_spark.workloads.embeddings import emb_quantize_error

    plan = plan_of(emb_quantize_error(spark, sf_dir))
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(ex) == 1, ex
    assert "EvalPython" not in plan


def test_stratified_splits_window_is_per_stratum(spark, sf_dir):
    """The split ranking must run as a per-lang partitioned window —
    never a single-partition global sort — and stay JVM-side. (The
    final ORDER BY presentation sort is stripped via limit, as in the
    chunking audit.)"""
    from graphdb_spark.workloads.pipeline import stratified_splits

    plan = plan_of(stratified_splits(spark, sf_dir).limit(10**9))
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan
    assert "EvalPython" not in plan


def test_modularity_no_cartesian(spark, sf_dir):
    """Modularity composes the audited LPA plan with keyed aggregates;
    the only nested-loop join allowed is the broadcast of the 1-row
    Q-total — never a CartesianProduct — and no Python."""
    from graphdb_spark.workloads.graph import g_modularity

    plan = plan_of(g_modularity(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_anomaly_window_over_hourly_grain(spark, sf_dir):
    """The z-score window must run over the (tiny) hourly aggregate,
    partitioned by event_type — never a single-partition sort, never
    a window over raw events (the hourly hash aggregate must sit
    below the window in the plan)."""
    from graphdb_spark.workloads.temporal import anomaly_hours

    plan = plan_of(anomaly_hours(spark, sf_dir).limit(10**9))
    assert "Exchange SinglePartition" not in plan
    assert "EvalPython" not in plan
    assert plan.index("Window") < plan.index("HashAggregate")


def test_walk_pairs_keyed_by_walk(spark, sf_dir):
    """Skip-gram pair generation must self-join walks only on the
    walk_id key (constant fan-out per walk) — no cartesian, no
    Python."""
    from graphdb_spark.workloads.graph import g_walk_pairs

    plan = plan_of(g_walk_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_value_histogram_single_bin_exchange(spark, sf_dir):
    """The histogram's only shuffle is the bin aggregate; the 1-row
    min/max stats ride along as a broadcast."""
    from graphdb_spark.workloads.relational import value_histogram

    plan = plan_of(value_histogram(spark, sf_dir))
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(ex) == 1, ex
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_interarrival_windows_per_user(spark, sf_dir):
    """Both windows (lag over events, rank over gaps) must stay
    partitioned by user_id — never a single-partition sort."""
    from graphdb_spark.workloads.temporal import interarrival_gaps

    plan = plan_of(interarrival_gaps(spark, sf_dir).limit(10**9))
    assert "Exchange SinglePartition" not in plan
    assert "EvalPython" not in plan


def test_scd2_single_entity_exchange(spark, sf_dir):
    """Both SCD2 windows (change-detect lag, interval lead) key on
    user_id, so the plan has exactly ONE hash exchange on the entity
    key — change detection and interval build run inside the same
    partitioning; never a single-partition sort."""
    from graphdb_spark.workloads.temporal import scd2_intervals

    plan = plan_of(scd2_intervals(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan
    assert "EvalPython" not in plan


def test_gapfill_spine_never_collected(spark, sf_dir):
    """The gap-fill spine is generated distributed (the only
    single-partition exchange is the 1-row min/max scalar), the LOCF
    window is keyed per event_type, and no cartesian product appears
    (the spine cross is a broadcast of the 1-row bounds)."""
    from graphdb_spark.workloads.temporal import gapfill_locf

    plan = plan_of(gapfill_locf(spark, sf_dir))
    assert plan.count("Exchange SinglePartition") == 1  # scalar bounds only
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    # LOCF window partitioned by event_type, not global
    win = [l for l in plan.splitlines()
           if "Window" in l and "locf" in l.lower()]
    assert any("event_type" in l for l in win), plan[:2000]


def test_corpus_shards_single_shard_exchange(spark, sf_dir):
    """The position window and the manifest groupBy both key on
    shard, so the whole shard-writer plan is ONE hash exchange —
    the property that keeps a 100 TB re-shard a single shuffle."""
    from graphdb_spark.workloads.pipeline import corpus_shards

    plan = plan_of(corpus_shards(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan
    assert "EvalPython" not in plan


def test_edge_support_no_cartesian(spark, sf_dir):
    """k-truss support meets pairs only through the shared-endpoint
    equi-join (wedges) and the closing-edge equi-join — no cartesian
    product, no Python in the plan."""
    from graphdb_spark.workloads.graph import g_edge_support

    plan = plan_of(g_edge_support(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_emb_dim_stats_single_exchange_no_python(spark, sf_dir):
    """The per-dimension explode aggregates map-side to 64 partials
    before ONE hash exchange; posexplode is a JVM generator, never
    Python."""
    from graphdb_spark.workloads.embeddings import emb_dim_stats

    plan = plan_of(emb_dim_stats(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "EvalPython" not in plan
    assert "Generate" in plan  # the JVM-side posexplode
