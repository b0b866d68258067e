"""sf10 scale-subset bench — the 100x-from-sf0.1 scaling proof.

Runs the scale-critical headliners on a 100-replica synth set
(scripts/make_sf1.py <dir> 100: ~60M lineitem rows, 500k docs, 200k
embeddings — same disjoint-key construction as the sf1 set, so FK
joins and within-replica dedup structure hold) and records Spark wall
time per query, plus DuckDB twins for an affordable subset. The point
is the SHAPE of the scaling curve sf0.1 -> sf1 -> sf10: operators
whose plans amortize fixed cost should grow sublinearly in the 10x
step; anything superlinear is a scale bug.

Usage: python scripts/sf10_scale_bench.py [sf10_dir]
       (default /tmp/sf10synth; build it first with
        python scripts/make_sf1.py /tmp/sf10synth 100)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# sf10 on one JVM wants a real heap: the adamic pair exchange alone
# is ~25 GB and the graph cache ~8 GB; 16g (the sf0.1 default) sat on
# the GC cliff and OOM'd once the r7 run added more cached state.
# Must be set before the JVM launches (build_spark reads it).
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")

# r10 (VERDICT r9 item 5): ALL 31 bench headliners, each with a
# watchdogged DuckDB twin — the sf0.1/sf1 "weak" set is a job-floor
# artifact and the strongest answer to "weak at 100x?" is measuring
# every head at 100x.
SPARK_QUERIES = [
    # relational core
    "q1_pricing_summary",      # full-scan agg over 60M rows
    "q3_shipping_topk",
    "q5_region_revenue",       # multi-join
    "top_customers",
    "window_top_order_per_segment",
    # graph (resident session, bucketed layout adopted)
    "g_point_lookup",
    "g_one_hop",
    "g_two_hop_count",
    "g_degree_topk",
    "g_bfs_reachability",      # iterative frontier
    "cypher_grouped_count",
    "g_adamic_adar",           # ~900M-pair explosion at sf10
    # temporal / streaming views
    "temporal_replay",
    "sessionize",
    "rollup_gauges",
    "decayed_user_value",
    "scd2_intervals",
    "gapfill_locf",
    # training-data ops
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_cluster_canonical", # fixpoint CC
    "tfidf_cosine_pairs",      # posting-list self-join
    "text_stats",
    "gopher_quality",
    "repetition_stats",
    "ann_bruteforce_topk",     # labeled exact baseline
    "text_bm25_topk",
    "lm_bigram_score",
    "emb_quantize_error",
    "emb_cosine_neardup",      # banded vector LSH
    "corpus_shards",
]
# every headliner gets a twin; infeasible ones are watchdogged and
# recorded with reasons, never silently dropped
ORACLE_QUERIES = list(SPARK_QUERIES)
RUNS = 2
# contention-proofing (VERDICT r9 item 3): the r9 artifact published
# burst numbers for sub-10s heads (q5 23.9s in-artifact vs 4.7s
# off-harness on unchanged code). Fast queries get a third run — the
# cost is seconds; the probability of ALL runs landing in a
# contention burst drops superlinearly.
EXTRA_RUN_UNDER_S = 10.0
MAX_RUNS = 3
# per-twin wall budget: a DuckDB twin that spills past this is
# recorded as infeasible-with-reason, not silently dropped.
# Env-overridable for one-off raised-watchdog runs (VERDICT r8 item 4:
# get a real number for the cluster-canonical twin).
DUCK_TIMEOUT_S = int(os.environ.get("SPARK_GRAFT_DUCK_TIMEOUT", "900"))


def main(sf_dir: str = "/tmp/sf10synth") -> int:
    import duckdb

    from graphdb_spark import workloads
    from graphdb_spark.session import build_spark

    spark = build_spark("sf10_scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = workloads.all_unpacked_queries()
    # Resident-graph setup, SEPARATELY timed (r9: the layout is the
    # default for resident graphs — graph_session adopts the dual
    # bucketed adjacency at cache time; the one-time write/attach cost
    # is reported as its own line item, not hidden in a query's run 1).
    layout_sec = None
    try:
        from graphdb_spark.workloads.graph import graph_session

        t0 = time.perf_counter()
        g = graph_session(spark, sf_dir)
        g.vertex_count(), g.edge_count()
        layout_sec = round(time.perf_counter() - t0, 3)
        print(f"# graph cache + layout adoption: {layout_sec:.1f}s "
              f"(bucketed={bool(g._e_by_key)})", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        print(f"# layout adoption FAILED: {exc}", file=sys.stderr)
    timings: dict[str, float | None] = {}
    # "no silent nulls" (VERDICT r6 item 2): every null in the payload
    # MUST carry its reason here
    errors: dict[str, str] = {}
    spark_runs: dict[str, list[float]] = {}
    for name in SPARK_QUERIES:
        # keep every COMPLETED measurement even when a later run
        # throws (the duck loop below has had this since ADVICE r7;
        # a transient failure on run 3 of a fast query must not null
        # two valid runs out of the artifact)
        times: list[float] = []
        n = None
        try:
            while len(times) < RUNS or (
                len(times) < MAX_RUNS and min(times) < EXTRA_RUN_UNDER_S
            ):
                t0 = time.perf_counter()
                n = qs[name](spark, sf_dir).count()
                times.append(round(time.perf_counter() - t0, 3))
        except Exception as exc:  # noqa: BLE001
            errors[f"spark:{name}"] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# spark {name}: run {len(times) + 1} FAILED {exc}",
                  file=sys.stderr)
        if times:
            spark_runs[name] = times
            timings[name] = min(times)
            print(f"# spark {name}: {min(times):.2f}s rows={n} "
                  f"runs={times}", file=sys.stderr)
        else:
            timings[name] = None
    spark.stop()

    oracles = workloads.all_unpacked_oracles()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    duck: dict[str, float | None] = {}
    import threading

    duck_runs: dict[str, list[float]] = {}
    for name in ORACLE_QUERIES:
        best = None
        times: list[float] = []
        run_errs: list[str] = []
        while (
            (len(times) + len(run_errs)) < RUNS
            or (len(times) + len(run_errs) < MAX_RUNS
                and times and min(times) < EXTRA_RUN_UNDER_S)
        ):
            # a watchdog-interrupted twin will not finish on retry
            # either — don't burn another DUCK_TIMEOUT_S on it
            if any("INTERRUPT" in e.upper() for e in run_errs):
                break
            # duckdb has no statement timeout; interrupt from a
            # watchdog so one spilling twin can't eat the run. The
            # done-flag closes the completion race (ADVICE r7): once
            # the statement finishes, a late-firing timer must NOT
            # interrupt the next statement on the shared connection.
            done = threading.Event()

            def _watchdog(done=done):
                if not done.is_set():
                    con.interrupt()

            timer = threading.Timer(DUCK_TIMEOUT_S, _watchdog)
            timer.start()
            t0 = time.perf_counter()
            try:
                con.sql(oracles[name]).fetchall()
                done.set()
                dt = time.perf_counter() - t0
                times.append(round(dt, 3))
                best = dt if best is None else min(best, dt)
            except Exception as exc:  # noqa: BLE001
                done.set()
                run_errs.append(f"{type(exc).__name__}: {exc}"[:200])
            finally:
                timer.cancel()
        duck_runs[name] = times
        if best is not None:
            # a single interrupted/failed run no longer discards a
            # completed run's timing (ADVICE r7): keep the best
            # completed measurement, note the failures separately
            duck[name] = round(best, 3)
            if run_errs:
                errors[f"duckdb:{name}"] = (
                    "partial (best completed run kept): "
                    + "; ".join(run_errs)
                )[:500]
            print(f"# duckdb {name}: {best:.2f}s"
                  + (" (partial)" if run_errs else ""), file=sys.stderr)
        else:
            duck[name] = None
            errors[f"duckdb:{name}"] = "; ".join(run_errs)[:500]
            print(f"# duckdb {name}: FAILED {run_errs}", file=sys.stderr)

    shared = [n for n in ORACLE_QUERIES
              if timings.get(n) and duck.get(n)]
    payload = {
        "metric": "sf10_scale_subset_wall_clock",
        "value": round(sum(v for v in timings.values() if v), 3),
        "unit": "sec",
        "queries": timings,
        "duckdb_oracle_queries": duck,
        "duckdb_oracle_total": round(
            sum(v for v in duck.values() if v), 3
        ),
        "shared_subset_spark": round(sum(timings[n] for n in shared), 3),
        "shared_subset_duckdb": round(sum(duck[n] for n in shared), 3),
        "sf": 10,
        "runs_per_query": RUNS,
        "extra_run_under_s": EXTRA_RUN_UNDER_S,
        # every completed run, so next-round comparisons can judge
        # spread (the r9 contention-burst lesson) without a re-run
        "spark_runs": spark_runs,
        "duckdb_runs": duck_runs,
        # one-time resident-graph setup (graph cache + bucketed
        # adjacency adoption) — paid once per resident session, the
        # reference's always-on index trade (rdb/managers.rs:233-240)
        "layout_adoption_sec": layout_sec,
        "duckdb_timeout_s": DUCK_TIMEOUT_S,
        # reason for every null above — empty when fully green
        "errors": errors,
    }
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
