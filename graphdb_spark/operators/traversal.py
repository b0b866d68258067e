"""Iterative graph traversals: BFS, shortest path, variable-length
expansion — SURVEY.md §2.3 / §7.2 M6, the one genuinely hard operator
family on Spark.

Reference parity:
- ``bfs`` fixes the reference's broken BFS (traversal.rs:31-36 follows
  edge_type parsed as a UUID, so it never matches; ours follows actual
  edges, optional type filter, bounded by max_depth like
  Graph::bfs(start, max_depth), traversal.rs:10-47).
- ``shortest_path`` / ``var_length_expand`` implement the *declared*
  surface (queries_examples.txt:109-118: shortestPath((a)-[*..5]-(b)),
  -[:KNOWS*1..3]-).

Scale design (the §7.3 hard-parts list):
- frontier DataFrame per depth, joined against the edge table — each
  hop is one equi-join shuffle; small frontiers broadcast via AQE;
- visited-set anti-join prevents revisits (cycle safety + no
  exponential blowup);
- ``localCheckpoint()`` every CHECKPOINT_EVERY hops truncates lineage
  (driver-side loop, the §7.3 lineage-blowup mitigation);
- early exit when the frontier empties or (shortest_path) the target
  is reached.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, functions as F

from graphdb_spark.datamodel import local_df

CHECKPOINT_EVERY = 3


@contextmanager
def _no_aqe(spark):
    """Iterative frontier loops make their own probe-informed broadcast
    decisions and their shuffles are frontier-sized, so AQE has nothing
    left to improve — but its per-stage query-stage materialization
    turns every per-hop probe into 2-4 jobs, multiplying the fixed
    scheduler cost that dominates these loops at bench SFs (measured:
    BFS −12%, near-dup clustering −20% wall with AQE off at sf0.1;
    plan shapes identical). Scoped to the loop and restored on exit;
    the caller's final action still plans under the session's AQE.

    Re-entrant: nested scopes (e.g. near_dup_clusters falling back to
    connected_components_large mid-loop) restore the ORIGINAL session
    value only when the outermost scope exits — a naive save/restore
    would capture the inner scope's "false" as the value to put back
    and disable AQE for the rest of the session. The depth counter is
    not a cross-thread lock: spark.conf is session-global, so
    concurrent queries on other threads of the same session lose AQE
    for the duration regardless (documented single-writer assumption;
    all engine entry points run driver-side single-threaded)."""
    key = "spark.sql.adaptive.enabled"
    depth = getattr(spark, "_gs_no_aqe_depth", 0)
    if depth == 0:
        spark._gs_no_aqe_orig = spark.conf.get(key)
        spark.conf.set(key, "false")
    spark._gs_no_aqe_depth = depth + 1
    try:
        yield
    finally:
        spark._gs_no_aqe_depth -= 1
        if spark._gs_no_aqe_depth == 0:
            spark.conf.set(key, spark._gs_no_aqe_orig)

# Frontiers/visited sets live in localCheckpoint RDDs, which carry NO
# size statistics — Spark assumes worst-case size and plans a
# SortMergeJoin that SHUFFLES THE FULL EDGE TABLE every hop (measured:
# 10× the broadcast plan at sf0.1). We know the exact frontier count
# from the per-hop probe job, so hint broadcast while it's provably
# small and fall back to the shuffle join only when it genuinely grows
# past what an executor should hold (the AQE decision, made with
# better information).
BROADCAST_MAX_ROWS = 2_000_000

# ~1M narrow rows per partition keeps partitions in the tens-of-MB
# range; checkpointed frontiers inherit the shuffle partition count
# (localCheckpoint bypasses AQE coalescing), so a 10-row frontier
# would otherwise occupy 32 near-empty partitions and every broadcast
# build / rescan would pay 32 task launches for nothing.
ROWS_PER_PARTITION = 1_000_000


def _maybe_broadcast(df: DataFrame, rows: int) -> DataFrame:
    return F.broadcast(df) if rows <= BROADCAST_MAX_ROWS else df


def _rightsize(df: DataFrame, rows: int) -> DataFrame:
    """Coalesce a just-materialized (checkpointed) DataFrame to a
    partition count matching its MEASURED size — a narrow op over the
    cached blocks, no shuffle, no job."""
    cur = df.rdd.getNumPartitions()
    want = max(1, min(cur, rows // ROWS_PER_PARTITION + 1))
    return df.coalesce(want) if want < cur else df


def _edges_step(edges: DataFrame, t: str | None, direction: str,
                edges_in: DataFrame | None = None) -> DataFrame:
    """(from, to) pairs for one hop. direction: out | in | both.

    ``edges_in``: same rows as ``edges`` but stored dst-keyed (the
    reversed copy of partitioning.write_adjacency). When a bucketed
    layout is adopted, callers pass the dst copy so the ``in``
    orientation reads the table bucket-sorted on its own hop key —
    frontier `IN (...)` pushdown then prunes sorted row groups and
    non-broadcast hops skip the edge-side exchange. Caller contract:
    edges_in must hold the SAME edge rows (it is the same relation,
    different physical order); absent, both halves read ``edges``."""
    rev = edges_in if edges_in is not None else edges
    if t is not None:
        edges = edges.filter(F.col("relationship") == t)
        rev = rev.filter(F.col("relationship") == t)
    out = edges.select(F.col("src").alias("from"), F.col("dst").alias("to"))
    inn = rev.select(F.col("dst").alias("from"), F.col("src").alias("to"))
    if direction == "out":
        return out
    if direction == "in":
        return inn
    return out.unionByName(inn)


#: frontier-as-predicate bound: while |frontier| × max_branch fits,
#: each hop compiles to `from IN (<ids>)` — a predicate the scan can
#: USE (cached-batch min/max pruning locally; parquet row-group /
#: partition pruning + PushedFilters on a cluster), instead of a
#: broadcast-join probe that must stream the ENTIRE edge relation
#: (measured at sf10: 75M cached rows/hop = ~20 s warm for depth-2 vs
#: 1.3 s with pushdown). The per-hop collect is bounded by this cap by
#: construction — the loop PRE-checks the branch bound before
#: collecting, and hands off to the distributed loop when it outgrows.
ISIN_FRONTIER_MAX = 4096


def bfs(edges: DataFrame, start_id: str, max_depth: int = 5,
        t: str | None = None, direction: str = "out",
        max_branch: int | None = None,
        hops_per_round: int = 1,
        frontier_pushdown: bool = True,
        edges_in: DataFrame | None = None) -> DataFrame:
    """Breadth-first reachability: (id, depth) for every vertex within
    max_depth hops of start_id, depth = first (minimal) hop count.

    Two-phase plan (r7 — replaces the r5 one-action unrolled path,
    which still streamed the FULL edge relation through every hop's
    broadcast probe: 20 s warm at sf10 for a 47-vertex result):

    Phase 1, frontier predicate pushdown — while |frontier| ×
    ``max_branch`` provably fits ISIN_FRONTIER_MAX, each hop compiles
    to ``from IN (<ids>)``: a predicate the scan can USE (cached-batch
    min/max pruning locally, PushedFilters / row-group pruning on a
    real cluster), one job per hop, visited/depth bookkeeping driver-
    side over ≤cap ids (the collect is bounded BEFORE it runs, by the
    branch bound, AND defensively capped with limit(cap+1) — a wrong
    caller-supplied max_branch degrades to the distributed loop
    instead of an unbounded driver collect). This is semi-join reduction, the same trick a SQL
    engine's runtime filter plays — measured 15× at sf10 (19.9 s →
    1.3 s warm depth-2).

    Phase 2, the 100 TB-safe distributed loop — entered the moment the
    bound outgrows the cap (or when no ``max_branch`` is known):
    per-hop equi-join with probe-informed broadcast, visited anti-join,
    checkpointed frontiers. State carries over from phase 1.

    ``hops_per_round=2`` fuses two phase-2 hops into each probe round
    (the intra-round hop's broadcast decision uses the n_frontier ×
    max_branch BOUND instead of an exact count, so it needs
    ``max_branch``). Measured (NOTES r7): wins only marginally on
    shallow traversals at sf1 and LOSES at sf10 — the per-hop cost is
    the edge-relation scan, not the probe job — so the default stays 1.

    ``frontier_pushdown=False`` disables phase 1 (tests use it to
    exercise the distributed loop at unit scale). ``edges_in``: the
    dst-keyed copy for the ``in`` half of both-direction hops (see
    :func:`_edges_step`)."""
    spark = edges.sparkSession
    step = _edges_step(edges, t, direction, edges_in)
    visited_local: dict[str, int] = {start_id: 0}
    frontier_ids = [start_id]
    depth = 1
    if frontier_pushdown and max_branch is not None and max_branch > 0:
        while (
            depth <= max_depth
            and len(frontier_ids) * max_branch <= ISIN_FRONTIER_MAX
        ):
            rows = (
                step.filter(F.col("from").isin(frontier_ids))
                .select("to")
                .distinct()
                .limit(ISIN_FRONTIER_MAX + 1)
                .collect()
            )
            if len(rows) > ISIN_FRONTIER_MAX:
                # the caller-supplied max_branch was an underestimate:
                # the "provably bounded" collect wasn't. The limit
                # turns that contract violation into a graceful
                # degrade — discard the partial hop and hand the
                # CURRENT frontier to the distributed loop (ADVICE r7)
                # instead of risking an unbounded driver collect.
                break
            nxt = sorted(r[0] for r in rows if r[0] not in visited_local)
            if not nxt:
                frontier_ids = []
                break
            for v in nxt:
                visited_local[v] = depth
            frontier_ids = nxt
            depth += 1
        if depth > max_depth or not frontier_ids:
            return local_df(
                spark, sorted(visited_local.items()),
                "id string, depth int",
            )
    visited = local_df(
        spark, sorted(visited_local.items()), "id string, depth int"
    )
    frontier = local_df(
        spark,
        [(i, visited_local[i]) for i in frontier_ids],
        "id string, depth int",
    )
    n_frontier, n_visited = len(frontier_ids), len(visited_local)
    fuse2 = hops_per_round == 2 and max_branch is not None and max_branch > 0
    with _no_aqe(spark):
        while depth <= max_depth:
            nxt = (
                step.join(
                    _maybe_broadcast(
                        frontier.select(F.col("id").alias("from")), n_frontier
                    ),
                    "from",
                    "inner",
                )
                .select(F.col("to").alias("id"))
                .distinct()
                .join(
                    _maybe_broadcast(visited.select("id"), n_visited),
                    "id",
                    "left_anti",
                )
                .withColumn("depth", F.lit(depth))
            )
            if fuse2 and depth + 1 <= max_depth:
                # fused second hop: frontier bound stands in for the
                # exact count Spark doesn't have yet (conservative —
                # a too-big bound only forgoes the broadcast hint)
                bound1 = n_frontier * max_branch
                nxt2 = (
                    step.join(
                        _maybe_broadcast(
                            nxt.select(F.col("id").alias("from")), bound1
                        ),
                        "from",
                        "inner",
                    )
                    .select(F.col("to").alias("id"))
                    .distinct()
                    .join(
                        _maybe_broadcast(visited.select("id"), n_visited),
                        "id",
                        "left_anti",
                    )
                    .join(
                        _maybe_broadcast(nxt.select("id"), bound1),
                        "id",
                        "left_anti",
                    )
                    .withColumn("depth", F.lit(depth + 1))
                )
                nxt = nxt.unionByName(nxt2)
                depth += 1
            if depth == max_depth:
                # terminal hop/round: nothing iterates after it, so the
                # probe job (whose only consumers are the NEXT round's
                # broadcast decision and early exit) is pure overhead —
                # leave it lazy and let the caller's action compute it
                visited = visited.unionByName(nxt)
                break
            # lazy checkpoint + count: ONE job both materializes the
            # round's layers (consumed twice more: visited union, next
            # round's join) and answers the emptiness probe — an eager
            # checkpoint plus a separate isEmpty() would be two jobs
            nxt = nxt.localCheckpoint(eager=False)
            n_new = nxt.count()
            if n_new == 0:
                break
            nxt = _rightsize(nxt, n_new)
            visited = visited.unionByName(nxt)
            n_visited += n_new
            # next round expands only the round's DEEPEST layer
            frontier = (
                nxt.filter(F.col("depth") == depth) if fuse2 else nxt
            )
            # upper bound when fused (the deepest layer is a subset of
            # the round's rows); exact when not
            n_frontier = n_new
            depth += 1
    return visited


def shortest_path(edges: DataFrame, src_id: str, dst_id: str,
                  max_depth: int = 5, t: str | None = None,
                  direction: str = "both",
                  edges_in: DataFrame | None = None) -> list[str] | None:
    """One shortest path (list of vertex ids) or None — the declared
    shortestPath((a)-[*..5]-(b)) (queries_examples.txt:109-113).
    Frontier carries a path array; visited anti-join keeps every vertex
    at its minimal depth, so the first arrival at dst is shortest.
    Deterministic: ties resolved by the lexicographically smallest
    path (min over array<string> comparison)."""
    spark = edges.sparkSession
    step = _edges_step(edges, t, direction, edges_in)
    frontier = local_df(
        spark, [(src_id, [src_id])], "id string, path array<string>"
    )
    visited = frontier.select("id")
    n_frontier, n_visited = 1, 1
    if src_id == dst_id:
        return [src_id]
    for depth in range(1, max_depth + 1):
        expanded = (
            step.join(
                _maybe_broadcast(
                    frontier.withColumnRenamed("id", "from"), n_frontier
                ),
                "from",
                "inner",
            )
            .select(
                F.col("to").alias("id"),
                F.concat(F.col("path"), F.array(F.col("to"))).alias("path"),
            )
            .join(_maybe_broadcast(visited, n_visited), "id", "left_anti")
            .groupBy("id")
            .agg(F.min("path").alias("path"))
            .localCheckpoint(eager=False)
        )
        hit = expanded.filter(F.col("id") == dst_id).select("path").collect()
        if hit:
            return list(hit[0][0])
        n_frontier = expanded.count()  # cheap: checkpoint materialized
        if n_frontier == 0:
            return None
        visited = visited.unionByName(expanded.select("id")).distinct()
        n_visited += n_frontier
        frontier = expanded
    return None


def var_length_expand(edges: DataFrame, start_ids: DataFrame,
                      min_hops: int = 1, max_hops: int = 3,
                      t: str | None = None, direction: str = "out",
                      edges_in: DataFrame | None = None) -> DataFrame:
    """Variable-length expansion -[:T*min..max]-> : (start_id, id,
    hops) for every vertex reachable in min..max hops (minimal hop
    count per (start, end), matching path-existence semantics without
    path multiplicity explosion).

    min_hops > 1 routes through :func:`var_length_paths` (exact
    relationship-isomorphic enumeration) and dedups to the minimal
    in-window hop count: the minimal-hop BFS below would DROP an
    endpoint that is also reachable in fewer than min_hops hops
    (diamond a->b, a->x->b with [*2..3] must still return b)."""
    if min_hops > 1:
        return (
            var_length_paths(edges, start_ids, min_hops, max_hops, t,
                             direction, edges_in)
            .groupBy("start_id", "id")
            .agg(F.min("hops").alias("hops"))
        )
    step = _edges_step(edges, t, direction, edges_in)
    frontier = start_ids.select(
        F.col(start_ids.columns[0]).alias("start_id")
    ).withColumn("id", F.col("start_id")).withColumn("hops", F.lit(0))
    frontier = frontier.localCheckpoint(eager=False)
    n_frontier = frontier.count()
    visited = frontier.select("start_id", "id", "hops")
    n_visited = n_frontier
    for depth in range(1, max_hops + 1):
        nxt = (
            step.join(
                _maybe_broadcast(
                    frontier.select("start_id", F.col("id").alias("from")),
                    n_frontier,
                ),
                "from",
                "inner",
            )
            .select("start_id", F.col("to").alias("id"))
            .distinct()
            .join(
                _maybe_broadcast(
                    visited.select("start_id", "id"), n_visited
                ),
                ["start_id", "id"],
                "left_anti",
            )
            .withColumn("hops", F.lit(depth))
        )
        nxt = nxt.localCheckpoint(eager=False)  # 1 job: materialize+probe
        n_frontier = nxt.count()
        if n_frontier == 0:
            break
        nxt = _rightsize(nxt, n_frontier)
        visited = visited.unionByName(nxt)
        n_visited += n_frontier
        frontier = nxt
    return visited.filter(
        (F.col("hops") >= min_hops) & (F.col("hops") <= max_hops)
    )


def connected_components_small(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Label-propagation connected components (undirected): (id,
    component) with component = min vertex id in the component.
    Iterative min-propagation — converges in O(diameter) joins; for
    100 TB graphs swap in the large-star/small-star variant."""
    sym = _edges_step(edges, None, "both")
    labels = (
        sym.select(F.col("from").alias("id"))
        .unionByName(sym.select(F.col("to").alias("id")))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for i in range(max_iter):
        prop = (
            sym.join(labels.withColumnRenamed("id", "from"), "from")
            .groupBy(F.col("to").alias("id"))
            .agg(F.min("component").alias("neighbor_min"))
        )
        new_labels = (
            labels.join(prop, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("neighbor_min", F.col("component"))
                ).alias("component"),
            )
        )
        if (i + 1) % CHECKPOINT_EVERY == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .isEmpty()
        )
        labels = new_labels
        if changed:
            break
    return labels

def var_length_paths(edges: DataFrame, start_ids: DataFrame,
                     min_hops: int = 1, max_hops: int = 3,
                     t: str | None = None,
                     direction: str = "out",
                     edges_in: DataFrame | None = None) -> DataFrame:
    """Path-REIFYING variable-length expansion: one row per distinct
    relationship-path of min..max hops — (start_id, id, path
    array<string> of vertex ids, rels array<string> of relationship
    types, hops).

    Cypher relationship-isomorphism: an edge (triple) may not repeat
    within one path; vertices may. Row count is the true path
    multiplicity — use :func:`var_length_expand` when only
    reachability matters (no multiplicity explosion). Scale note: the
    frontier is a shuffle-join per hop, bounded by max_hops; path
    arrays are bounded (max_hops+1 ids), so row width stays small.
    Reference analogue: the declared traversal surface
    (queries_examples.txt var-length patterns)."""
    rev = edges_in if edges_in is not None else edges
    if t is not None:
        edges = edges.filter(F.col("relationship") == t)
        rev = rev.filter(F.col("relationship") == t)
    key = F.concat_ws("\x00", "src", "relationship", "dst")
    out = edges.select(
        F.col("src").alias("from"), F.col("dst").alias("to"),
        F.col("relationship").alias("rel"), key.alias("ekey"),
    )
    inn = rev.select(
        F.col("dst").alias("from"), F.col("src").alias("to"),
        F.col("relationship").alias("rel"), key.alias("ekey"),
    )
    step = (
        out if direction == "out"
        else inn if direction == "in"
        else out.unionByName(inn)
    )
    empty_arr = F.array().cast("array<string>")
    frontier = (
        start_ids.select(F.col(start_ids.columns[0]).alias("start_id"))
        .distinct()
        .select(
            "start_id",
            F.col("start_id").alias("id"),
            F.array("start_id").alias("path"),
            empty_arr.alias("rels"),
            empty_arr.alias("ekeys"),
        )
    )
    frontier = frontier.localCheckpoint(eager=False)
    n_frontier = frontier.count()
    results: list[DataFrame] = []
    for depth in range(1, max_hops + 1):
        frontier = (
            step.join(
                _maybe_broadcast(
                    frontier.withColumnRenamed("id", "from"), n_frontier
                ),
                "from",
                "inner",
            )
            # no edge reuse within a path
            .filter(~F.arrays_overlap(F.col("ekeys"), F.array(F.col("ekey"))))
            .select(
                "start_id",
                F.col("to").alias("id"),
                F.concat("path", F.array(F.col("to"))).alias("path"),
                F.concat("rels", F.array(F.col("rel"))).alias("rels"),
                F.concat("ekeys", F.array(F.col("ekey"))).alias("ekeys"),
            )
            .localCheckpoint(eager=False)  # 1 job: materialize+probe
        )
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        frontier = _rightsize(frontier, n_frontier)
        if depth >= min_hops:
            results.append(frontier.withColumn("hops", F.lit(depth)))
    spark = edges.sparkSession
    schema = ("start_id string, id string, path array<string>, "
              "rels array<string>, hops int")
    if not results:
        return local_df(spark, [], schema)
    res = results[0]
    for r in results[1:]:
        res = res.unionByName(r)
    return res.select("start_id", "id", "path", "rels", "hops")


def all_shortest_paths(edges: DataFrame, src_id: str, dst_id: str,
                       max_depth: int = 5, t: str | None = None,
                       direction: str = "both",
                       edges_in: DataFrame | None = None) -> DataFrame:
    """ALL shortest paths src→dst: one row per path — (path
    array<string> of vertex ids, rels array<string> of relationship
    types, hops int). Declared surface: allShortestPaths(...)
    (queries_examples.txt shortest-path family).

    Level-synchronous BFS that keeps EVERY arrival at a node's minimal
    depth (so parallel shortest routes survive) while pruning nodes
    reached at earlier depths — polynomial frontier growth, unlike
    blind path enumeration. Same per-hop shuffle-join + eager
    localCheckpoint shape as bfs()."""
    spark = edges.sparkSession
    rev = edges_in if edges_in is not None else edges
    if t is not None:
        edges = edges.filter(F.col("relationship") == t)
        rev = rev.filter(F.col("relationship") == t)
    out = edges.select(F.col("src").alias("from"), F.col("dst").alias("to"),
                       F.col("relationship").alias("rel"))
    inn = rev.select(F.col("dst").alias("from"), F.col("src").alias("to"),
                     F.col("relationship").alias("rel"))
    step = (
        out if direction == "out"
        else inn if direction == "in"
        else out.unionByName(inn)
    )
    empty_schema = "path array<string>, rels array<string>, hops int"
    if src_id == dst_id:
        return local_df(spark, [([src_id], [], 0)], empty_schema)
    frontier = local_df(
        spark, [(src_id, [src_id], [])],
        "id string, path array<string>, rels array<string>",
    )
    visited = frontier.select("id")
    n_frontier, n_visited = 1, 1
    for depth in range(1, max_depth + 1):
        expanded = (
            step.join(
                _maybe_broadcast(
                    frontier.withColumnRenamed("id", "from"), n_frontier
                ),
                "from",
                "inner",
            )
            .select(
                F.col("to").alias("id"),
                F.concat("path", F.array(F.col("to"))).alias("path"),
                F.concat("rels", F.array(F.col("rel"))).alias("rels"),
            )
            .join(_maybe_broadcast(visited, n_visited), "id", "left_anti")
            .localCheckpoint(eager=False)
        )
        n_frontier = expanded.count()
        hits = expanded.filter(F.col("id") == dst_id)
        if not hits.isEmpty():  # cheap: checkpoint materialized
            return hits.select("path", "rels", F.lit(depth).alias("hops"))
        if n_frontier == 0:
            break
        visited = (
            visited.unionByName(expanded.select("id"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        n_visited += n_frontier
        frontier = expanded
    return local_df(spark, [], empty_schema)


def connected_components_large(edges: DataFrame, max_iter: int = 30) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond"): converges in
    O(log n) rounds regardless of graph DIAMETER — the 100 TB path
    where min-label propagation (connected_components_small, O(diameter)
    rounds) degrades on chain-like graphs. (id, component) with
    component = min vertex id (lexicographic, same order as the small
    variant).

    Each round: per-node min over neighbors (one grouped agg) + two
    conditional edge rewrites + dedup — all equi-shuffles on vertex id,
    no broadcast requirement, frontier-free (no driver-side growth)."""
    pairs = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def min_nbr(p):
        return (
            p.groupBy("u").agg(F.min("v").alias("mv"))
            .select("u", F.least("u", "mv").alias("m"))
        )

    def sym(p):
        return (
            p.unionByName(p.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    with _no_aqe(edges.sparkSession):
        for _ in range(max_iter):
            mins = min_nbr(pairs)
            # large-star: hook every larger neighbor to u's min
            large = (
                pairs.filter(F.col("v") > F.col("u"))
                .join(mins, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
            ls = sym(large.unionByName(mins.select("u", F.col("m").alias("v"))))
            mins2 = min_nbr(ls)
            # small-star: hook every smaller-or-equal neighbor to the min
            small = (
                ls.filter(F.col("v") < F.col("u"))
                .join(mins2, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
            new_pairs = sym(
                small.unionByName(mins2.select("u", F.col("m").alias("v")))
            ).localCheckpoint(eager=True)
            converged = (
                new_pairs.exceptAll(pairs).isEmpty()
                and pairs.exceptAll(new_pairs).isEmpty()
            )
            pairs = new_pairs
            if converged:
                break
    return min_nbr(pairs).select(
        F.col("u").alias("id"), F.col("m").alias("component")
    )


def weighted_sssp(edges: DataFrame, src_id: str, weight_col: str = "w",
                  max_hops: int = 4, t: str | None = None,
                  direction: str = "out") -> DataFrame:
    """Hop-bounded weighted single-source shortest paths (Bellman-Ford
    relaxation): (id, dist) where dist is the minimal total weight over
    paths of at most ``max_hops`` edges from ``src_id``. Beyond the
    reference (its graphs are unweighted); the declared var-length /
    shortestPath surface generalized to weighted edges.

    Weights should be integral (bigint) — exact min/sum arithmetic,
    replayable as K unrolled relaxation CTEs in SQL.

    Scale shape: each iteration is one keyed join (frontier × edges,
    frontier broadcast while provably small — the informed-broadcast
    pattern, see BROADCAST_MAX_ROWS), one min-combine groupBy, and one
    improvement anti-check against the running dist table; frontier
    and dist table localCheckpoint per iteration to bound lineage.
    Only vertices whose distance improved propagate — the frontier
    shrinks as the relaxation converges, like bfs()."""
    spark = edges.sparkSession
    e = edges if t is None else edges.filter(F.col("relationship") == t)
    fwd = e.select(
        F.col("src").alias("u"), F.col("dst").alias("v"),
        F.col(weight_col).alias("w"),
    )
    rev = e.select(
        F.col("dst").alias("u"), F.col("src").alias("v"),
        F.col(weight_col).alias("w"),
    )
    step = {"out": fwd, "in": rev}.get(direction, fwd.unionByName(rev))
    dists = local_df(spark, [(src_id, 0)], "id string, dist bigint")
    frontier = dists
    n_frontier, n_dists = 1, 1
    with _no_aqe(spark):
        for hop in range(1, max_hops + 1):
            cand = (
                step.join(
                    _maybe_broadcast(
                        frontier.withColumnRenamed("id", "u"), n_frontier
                    ),
                    "u",
                )
                .select(F.col("v").alias("id"), (F.col("dist") + F.col("w")).alias("dist"))
                .groupBy("id")
                .agg(F.min("dist").alias("dist"))
            )
            improved = cand.join(
                _maybe_broadcast(
                    dists.withColumnRenamed("dist", "old"), n_dists
                ),
                "id",
                "left",
            ).filter(
                F.col("old").isNull() | (F.col("dist") < F.col("old"))
            ).select("id", "dist")
            if hop == max_hops:
                # terminal relaxation — no probe consumer; stay lazy
                dists = (
                    dists.unionByName(improved)
                    .groupBy("id")
                    .agg(F.min("dist").alias("dist"))
                )
                break
            improved = improved.localCheckpoint(eager=False)
            n_frontier = improved.count()
            if n_frontier == 0:
                break
            improved = _rightsize(improved, n_frontier)
            dists = (
                dists.unionByName(improved)
                .groupBy("id")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=False)
            )
            # exact count not needed — new ids <= improved rows, so this
            # upper bound is safe for the broadcast decision and saves one
            # job per round
            n_dists += n_frontier
            frontier = improved
    return dists


def multi_source_bfs(edges: DataFrame, start_ids: list[str],
                     max_depth: int = 5, t: str | None = None,
                     direction: str = "out",
                     edges_in: DataFrame | None = None) -> DataFrame:
    """(seed, id, depth): minimal hop count from EACH seed, computed in
    ONE iterative job with the frontier keyed on (seed, id) — running
    k separate :func:`bfs` calls would pay the per-hop probe/checkpoint
    job overhead k times over the same edge table. The per-hop plan is
    bfs's (informed-broadcast frontier join, anti-join visited, lazy
    checkpoint + count probe); state is k× larger, which the broadcast
    cap already accounts for in rows."""
    spark = edges.sparkSession
    step = _edges_step(edges, t, direction, edges_in)
    # dedupe seeds (order-preserving): a repeated seed id would emit
    # duplicate (seed, seed, 0) rows and double-count every frontier
    start_ids = list(dict.fromkeys(start_ids))
    visited = local_df(
        spark, [(s, s, 0) for s in start_ids],
        "seed string, id string, depth int",
    )
    frontier = visited
    n_frontier = n_visited = len(start_ids)
    with _no_aqe(spark):
        for depth in range(1, max_depth + 1):
            nxt = (
                step.join(
                    _maybe_broadcast(
                        frontier.select("seed", F.col("id").alias("from")),
                        n_frontier,
                    ),
                    "from",
                    "inner",
                )
                .select("seed", F.col("to").alias("id"))
                .distinct()
                .join(
                    _maybe_broadcast(visited.select("seed", "id"), n_visited),
                    ["seed", "id"],
                    "left_anti",
                )
                .withColumn("depth", F.lit(depth))
            )
            if depth == max_depth:
                # terminal hop — no consumer of the probe; stay lazy
                visited = visited.unionByName(nxt)
                break
            nxt = nxt.localCheckpoint(eager=False)
            n_frontier = nxt.count()
            if n_frontier == 0:
                break
            nxt = _rightsize(nxt, n_frontier)
            visited = visited.unionByName(nxt)
            n_visited += n_frontier
            frontier = nxt
    return visited


def closeness_seeds(edges: DataFrame, start_ids: list[str],
                    max_depth: int = 4, t: str | None = None,
                    direction: str = "out",
                    edges_in: DataFrame | None = None) -> DataFrame:
    """Bounded closeness centrality for a seed set: per seed, over the
    vertices reached within max_depth, the reach count, total and mean
    distance (depth-bounded closeness — the unbounded variant needs a
    full APSP, which is not a 100 TB operation). One multi-source BFS
    + one aggregate."""
    reach = multi_source_bfs(edges, start_ids, max_depth, t, direction,
                             edges_in)
    return (
        reach.filter(F.col("depth") > 0)
        .groupBy("seed")
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            F.sum("depth").cast("bigint").alias("total_depth"),
            F.round(F.avg("depth"), 6).alias("mean_depth"),
        )
    )
