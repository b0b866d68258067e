"""Partitioning / skew utilities — the 100 TB toolkit.

The reference never faces these problems (single-node KV); on a
1000-executor cluster they decide whether a plan finishes:

- ``salted_join``: explicit salt for joins whose key distribution is
  too skewed even for AQE's skew-join splitting (a hot vertex with
  10^8 edges). The small side is replicated salt-ways; the big side
  gets a random-but-deterministic salt per row.
- ``write_bucketed`` / ``read_bucketed``: co-located joins via bucket
  tables — repeated joins on the same key (the edges table joined on
  src every traversal) skip their shuffle entirely.
- ``degree_stats`` / ``hot_keys``: measure graph skew so the caller
  can pick salting factors from data, not guesswork.
- ``repartition_by_key``: hash-distribute with a sane partition count
  derived from AQE advisory sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def degree_stats(edges: DataFrame, key: str = "src") -> dict:
    """Degree distribution summary for skew diagnosis."""
    deg = edges.groupBy(key).agg(F.count(F.lit(1)).alias("degree"))
    row = deg.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("degree").alias("max_degree"),
        F.avg("degree").alias("avg_degree"),
        F.expr("percentile_approx(degree, 0.99)").alias("p99_degree"),
    ).collect()[0]
    return {
        "n_keys": row["n_keys"],
        "max_degree": row["max_degree"],
        "avg_degree": float(row["avg_degree"]),
        "p99_degree": row["p99_degree"],
        "skew_ratio": float(row["max_degree"]) / max(float(row["avg_degree"]), 1e-9),
    }


def hot_keys(edges: DataFrame, key: str = "src", threshold: int = 1000) -> DataFrame:
    """Keys whose degree exceeds threshold — candidates for salting."""
    return (
        edges.groupBy(key)
        .agg(F.count(F.lit(1)).alias("degree"))
        .filter(F.col("degree") > threshold)
    )


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Join with explicit key salting.

    big gets a deterministic pseudo-random salt per row (hash of all
    columns mod salt — no Date/rand, so plans stay reproducible);
    small is exploded salt-ways. Correct for 1:N joins where ``small``
    has unique keys (the dimension side); result columns = big ∪
    (small minus key).
    """
    salt_col = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt))
    big_s = big.withColumn("__salt", salt_col)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def repartition_by_key(df: DataFrame, key: str,
                       target_rows_per_partition: int = 1_000_000) -> DataFrame:
    """Hash-distribute by key with a partition count sized from an
    (approximate) row count — the knob that keeps shuffle partitions
    within executor memory at any SF."""
    n = df.count()
    parts = max(1, n // target_rows_per_partition)
    default_par = df.sparkSession.sparkContext.defaultParallelism
    parts = max(parts, min(default_par, 32))
    return df.repartition(int(parts), key)


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 32,
                   sort_by: str | None = None):
    """Persist as a bucketed table: joins/aggregations on ``key``
    between tables bucketed the same way skip their shuffle (Spark
    bucket join). This is how the vertices/edges tables should be laid
    out at 100 TB (bucket edges by src, vertices by id)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def read_bucketed(spark, table: str) -> DataFrame:
    return spark.table(table)


def write_adjacency(vertices: DataFrame, edges: DataFrame, name: str,
                    buckets: int = 32, fp_v: dict | None = None,
                    fp_e: dict | None = None) -> dict:
    """Dual bucketed adjacency layout — the Spark twin of the
    reference's forward + reversed edge indexes
    (lib/src/rdb/managers.rs:233-240: EdgeRangeManager bucketed by
    outbound id, EdgeRangeManager::new_reversed by inbound id) and its
    id-keyed vertex store.

    Three bucketed, bucket-sorted tables:

    - ``{name}_v``      vertices bucketed+sorted by ``id``
    - ``{name}_e_out``  edges bucketed+sorted by ``src`` (forward)
    - ``{name}_e_in``   edges bucketed+sorted by ``dst`` (reversed)

    What this buys at scale: a traversal hop is ``edges ⋈ frontier``
    on src (OUT) or dst (IN). Over plain parquet a non-broadcast hop
    exchanges BOTH sides; over this layout the edge relation's scan
    already satisfies the join's required distribution, so only the
    frontier (ids, one column) moves — exchanges per hop drop 2→1 and
    the multi-TB side never reshuffles. ``groupBy(src)`` degree
    aggregates likewise plan with no exchange at all. The write cost
    is paid once; break-even is a handful of joins (measured 3.4 at
    sf10, BENCH_sf10_bucketed.json).

    Each table is repartitioned to exactly ``buckets`` partitions on
    its bucket key before the write so every bucket is ONE file —
    required for the scan to report the sortBy order (multi-file
    buckets force a per-partition re-sort) and for one-task-per-bucket
    reads. Storing edges twice doubles storage — the same trade the
    reference makes with its two edge-range column families.
    """
    specs = {
        f"{name}_v": (vertices, "id"),
        f"{name}_e_out": (edges, "src"),
        f"{name}_e_in": (edges, "dst"),
    }
    for table, (df, key) in specs.items():
        write_adjacency_table(df, table, key, buckets)
    # stamp the bucket count + content fingerprints next to the files:
    # attach_adjacency refuses to re-register without a matching spec
    # (a declared-but-wrong bucket count would make the planner elide
    # exchanges that ARE needed → silently dropped join matches), and
    # ensure_bucketed_layout compares the fingerprints against the
    # session's frames (row counts alone miss count-preserving
    # mutations — VERDICT r9 item 1). Callers that already HOLD the
    # frames' fingerprints (a compaction — content unchanged by
    # construction; a REINDEX whose ensure just computed them for the
    # staleness compare) pass them through; recomputing would be one
    # full scan per relation of pure waste at 100 TB.
    write_layout_meta(
        vertices.sparkSession,
        name,
        {
            "buckets": buckets,
            "v": fp_v or content_fingerprint(vertices),
            "e": fp_e or content_fingerprint(edges),
        },
    )
    return {t: k for t, (_, k) in specs.items()}


#: sidecar written into the {name}_v table directory at layout-write
#: time. Underscore-prefixed, so Spark's FileIndex ignores it when
#: scanning the parquet files; it travels with the files across
#: catalog loss / dir copies, which is exactly the lifetime the guard
#: needs (the catalog forgets, the files and their meta survive).
LAYOUT_META_FILE = "_layout_meta.json"


def content_fingerprint(df: DataFrame) -> dict:
    """Order-independent content fingerprint of a frame: row count +
    bit-XOR of per-row xxhash64 over EVERY column + the exact integer
    SUM of the same hashes. This is the layout stale-guard (VERDICT
    r9 item 1): row counts alone cannot see a count-preserving
    mutation (set_properties / update_vertex upsert values without
    changing cardinality), so attaching layout tables on a count
    match could silently serve pre-mutation data. XOR and SUM are
    both commutative, so the fingerprint is independent of
    partitioning and row order — and both fold forward in O(delta)
    under appends. The SUM term exists because XOR alone has a
    structural collision class: any PAIR of identical rows cancels
    (h ^ h = 0), so e.g. {A, A, B} and {B, C, C} share count AND
    XOR while holding different content; their hash sums differ
    unless the colliding rows hash equal. SUM is computed in
    DECIMAL(38,0) (exact; a bigint sum would hit ANSI overflow at
    scale) and carried as a string in the JSON sidecar. Map columns
    are normalized to sorted-entry JSON because Spark (correctly)
    refuses hash() over MapType and raw map json is
    entry-order-sensitive. One scan + a 1-row aggregate — the same
    cost class as the count() guard it replaces, strictly more
    information."""
    from pyspark.sql.types import MapType

    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, MapType):
            c = F.to_json(F.array_sort(F.map_entries(c)))
        cols.append(c)
    row = (
        df.select(F.xxhash64(*cols).alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(h)").alias("x"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
        )
        .collect()[0]
    )
    return {
        "n": row["n"],
        "x": int(row["x"]) if row["x"] is not None else 0,
        "s": str(int(row["s"])) if row["s"] is not None else "0",
    }


def append_pressure(meta: dict | None) -> dict:
    """Per-relation append counters from a layout sidecar, normalizing
    the legacy scalar form (one global counter) to {"v": n, "e": n}.
    The single source of truth for the normalization rule — consumed
    by append_adjacency (increment), GraphSession._reindex (per-
    relation reset) and compact_layout (pressure-driven targets)."""
    ap = (meta or {}).get("appends") or {}
    if isinstance(ap, int):
        return {"v": ap, "e": ap}
    return dict(ap)


def invalidate_layout_meta(spark, name: str):
    """Remove the sidecar so the layout can NEVER attach until a fresh
    spec is stamped — the guard rail around any multi-step swap whose
    intermediate states must not be trusted (a partially swapped
    generation behind a valid-looking sidecar would attach and serve
    mixed tables)."""
    import os

    try:
        os.remove(layout_meta_path(spark, name))
    except OSError:
        pass


def layout_meta_path(spark, name: str) -> str:
    import os

    return os.path.join(
        adjacency_table_location(spark, f"{name}_v"), LAYOUT_META_FILE
    )


def write_layout_meta(spark, name: str, meta: dict):
    import json

    with open(layout_meta_path(spark, name), "w") as fh:
        json.dump(meta, fh)


def read_layout_meta(spark, name: str) -> dict | None:
    """The {buckets, v, e} spec write_adjacency stamped next to the
    files, or None when absent (pre-meta layouts, partial writes) —
    callers treat None as not-trustworthy and rewrite."""
    import json
    import os

    p = layout_meta_path(spark, name)
    if not os.path.isfile(p):
        return None
    try:
        with open(p) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def write_adjacency_table(df: DataFrame, table: str, key: str,
                          buckets: int):
    """One bucketed, bucket-sorted relation of the adjacency layout:
    repartitioned to exactly ``buckets`` partitions on the bucket key
    so every bucket is ONE file (one-task-per-bucket reads + the scan
    reports the sortBy order).

    autoBucketedScan is disabled for the write: when ``df`` itself
    reads a bucketed table (compaction / REINDEX reading the previous
    layout generation), the planner elides the repartition against the
    scan's claimed hash partitioning while the scan still packs files
    by SIZE — tasks then hold mixed buckets and the rewrite emits
    multi-file buckets, defeating the compaction (measured: 5 files
    for 4 buckets). A plain file scan makes the repartition real and
    the output exactly one file per non-empty bucket."""
    spark = df.sparkSession
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try:
        (
            df.repartition(buckets, F.col(key))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(buckets, key)
            .sortBy(key)
            .saveAsTable(table)
        )
    finally:
        spark.conf.set(conf, old)


def append_adjacency(spark, name: str, buckets: int,
                     vertices: DataFrame | None = None,
                     edges: DataFrame | None = None) -> dict:
    """LSM-style layout append — the incremental half of the
    reference's per-write index maintenance (rdb/managers.rs:233-260:
    forward + reversed indexes are updated WITH every write, never
    rebuilt). New rows are appended into the existing bucketed tables
    (Spark appends extra files per bucket: hash DISTRIBUTION — the
    layout's exchange-elision contract — is preserved; the per-bucket
    one-file sort degrades until compaction, costing at most a local
    sort, never an exchange) and the stamped content fingerprint is
    folded forward in O(delta): counts add, XOR accumulates —
    appending never rescans the base. Returns the updated meta (its
    ``appends`` counter is the caller's compaction trigger).

    NOT atomic across the three tables (plain parquet appends have no
    transaction): a failure mid-append leaves extra rows visible in
    the already-appended tables until the next ensure detects the
    fingerprint mismatch (meta is written LAST, so it always describes
    at most what was fully appended) and REINDEXes. The transactional
    alternative at production scale is the Delta-backed store
    (sources/delta_store.py), where the append is one commit."""
    meta = read_layout_meta(spark, name)
    if meta is None or meta.get("buckets") != buckets:
        raise ValueError(
            f"layout {name!r} has no matching spec to append into"
        )
    for k in ("v", "e"):
        entry = meta.get(k)
        if not isinstance(entry, dict) or "s" not in entry:
            # missing/truncated relation entry, or a pre-sum-term
            # sidecar: folding forward would stamp a fingerprint that
            # does not cover the base rows, poisoning every later
            # compare. MUST be rejected BEFORE any file append — the
            # caller's fallback re-unions the delta, so rows
            # half-appended here would be served twice. (An absent
            # key hitting _fold AFTER the appends would be exactly
            # that bug as a KeyError.)
            raise ValueError(
                f"layout {name!r} spec is unusable for appends "
                f"(relation {k!r} entry missing or pre-sum-term)"
            )

    def _append(df, table, key):
        # small deltas: one task, at most one new file per non-empty
        # bucket (an un-coalesced append writes files per task x
        # bucket — file explosion)
        (
            df.coalesce(1)
            .write.mode("append")
            .format("parquet")
            .bucketBy(buckets, key)
            .sortBy(key)
            .saveAsTable(table)
        )

    def _fold(entry, fp):
        return {
            "n": entry["n"] + fp["n"],
            "x": entry["x"] ^ fp["x"],
            "s": str(int(entry["s"]) + int(fp["s"])),
        }

    # Pin the deltas ONCE: fingerprint + e_out append + e_in append
    # evaluate the frame up to three times, and a non-deterministic
    # delta (limit/sample/monotonically_increasing_id lineage) would
    # otherwise stamp a fingerprint that never matches the appended
    # rows — or worse, diverge the two edge copies.
    if vertices is not None:
        vertices = vertices.localCheckpoint(eager=True)
    if edges is not None:
        edges = edges.localCheckpoint(eager=True)

    # Snapshot each table dir so a mid-append failure (the three
    # appends are not one transaction) can ROLL BACK to the
    # pre-append file set: without it, e_out succeeding while e_in
    # fails leaves the forward and reversed copies disagreeing — and
    # the session frames read these very tables, so the next REINDEX
    # would launder the phantom rows into canonical state.
    import os as _os
    import shutil as _shutil

    tables = [f"{name}_v", f"{name}_e_out", f"{name}_e_in"]
    pre = {}
    for t in tables:
        loc = adjacency_table_location(spark, t)
        pre[t] = (loc, set(_os.listdir(loc)) if _os.path.isdir(loc)
                  else set())
    try:
        if vertices is not None:
            fp = content_fingerprint(vertices)
            _append(vertices, f"{name}_v", "id")
            meta["v"] = _fold(meta["v"], fp)
        if edges is not None:
            fp = content_fingerprint(edges)
            _append(edges, f"{name}_e_out", "src")
            _append(edges, f"{name}_e_in", "dst")
            meta["e"] = _fold(meta["e"], fp)
    except BaseException:
        for t, (loc, had) in pre.items():
            try:
                for f in set(_os.listdir(loc)) - had:
                    p = _os.path.join(loc, f)
                    if _os.path.isdir(p):
                        _shutil.rmtree(p, ignore_errors=True)
                    else:
                        _os.remove(p)
                spark.catalog.refreshTable(t)
            except OSError:
                pass  # best-effort; meta stays unwritten → REINDEX
        raise
    # PER-RELATION append pressure (r10): compaction rewrites only
    # relations that actually accumulated files — at 100 TB an
    # edge-only ingest stream must never force the pristine (and
    # comparably huge) vertex table through a rewrite.
    ap = append_pressure(meta)
    if vertices is not None:
        ap["v"] = ap.get("v", 0) + 1
    if edges is not None:
        ap["e"] = ap.get("e", 0) + 1
    meta["appends"] = ap
    write_layout_meta(spark, name, meta)
    for sfx in ("_v", "_e_out", "_e_in"):
        # drop any cached scan + stale file listing: a cached plan
        # keyed on the same table would silently serve the
        # pre-append snapshot
        spark.catalog.refreshTable(f"{name}{sfx}")
    return meta


def adjacency_table_location(spark, table: str) -> str:
    """Filesystem path a write_adjacency table lives at (warehouse
    dir + table name — matching saveAsTable's managed-table layout)."""
    import os
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    return os.path.join(wh.path or str(wh), table)


def attach_adjacency(spark, name: str, buckets: int = 32) -> bool:
    """Re-register ``write_adjacency`` tables from an EARLIER process
    over their existing warehouse files. Spark's default in-memory
    catalog forgets table metadata at process exit while the bucketed
    parquet files survive; declaring an external table with the same
    CLUSTERED BY / SORTED BY / bucket count over that location restores
    the full bucketed-scan contract (verified: the re-attached scan
    reports ``Bucketed: true`` and a groupBy on the bucket key plans
    zero exchanges). Returns True when all three tables are available
    (already in the catalog or re-registered), False when any file set
    is missing — callers then fall back to writing.

    The declared metadata is TRUSTED by the planner — registering
    files written with a different bucket count would make bucketed
    joins silently drop matches — so the declaration is verified
    against the spec ``write_adjacency`` stamped next to the files
    (``LAYOUT_META_FILE``): no meta, or meta with a different bucket
    count, returns False and callers rewrite."""
    import os

    meta = read_layout_meta(spark, name)
    if meta is None or meta.get("buckets") != buckets:
        return False
    specs = {f"{name}_v": "id", f"{name}_e_out": "src", f"{name}_e_in": "dst"}
    for table, key in specs.items():
        if spark.catalog.tableExists(table):
            continue
        loc = adjacency_table_location(spark, table)
        if not os.path.isdir(loc) or not any(
            f.endswith(".parquet") for f in os.listdir(loc)
        ):
            return False
        sch = spark.read.parquet(loc).schema
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in sch.fields
        )
        spark.sql(
            f"CREATE TABLE `{table}` ({cols}) USING parquet "
            f"CLUSTERED BY (`{key}`) SORTED BY (`{key}`) "
            f"INTO {buckets} BUCKETS LOCATION '{loc}'"
        )
    return True


def gc_stale_stages(spark, name: str, max_age_s: int = 3600):
    """Remove abandoned staging generations of ``name`` (a crashed
    REINDEX leaves its ``{name}__stage*`` tables behind). Age-gated:
    a LIVE concurrent writer's staging dir is at most minutes old, so
    only stages untouched for ``max_age_s`` are collected — deleting
    a peer's in-flight stage would corrupt its swap."""
    import glob
    import os
    import time

    pattern = adjacency_table_location(spark, f"{name}__stage*")
    now = time.time()
    # age-gate on the NEWEST dir of each staging generation: a live
    # REINDEX writes _v first and the (much larger) edge tables after,
    # so the _v dir alone can look hours old while the writer is still
    # mid-flight — collecting on per-dir age would gut it (the dirs
    # share one prefix; only the whole generation going quiet for
    # max_age_s means the writer is dead).
    newest: dict[str, float] = {}
    for loc in glob.glob(pattern):
        try:
            mt = os.path.getmtime(loc)
        except OSError:
            continue
        base = os.path.basename(loc)
        for sfx in ("_v", "_e_out", "_e_in"):
            if base.endswith(sfx):
                p = base[: -len(sfx)]
                newest[p] = max(newest.get(p, 0.0), mt)
    for p, mt in newest.items():
        if now - mt >= max_age_s:
            drop_adjacency(spark, p)


def drop_adjacency(spark, name: str):
    """Drop the three layout tables AND their files (DROP TABLE on an
    externally re-attached table keeps files; a later overwrite-write
    must start clean)."""
    import shutil

    for table in (f"{name}_v", f"{name}_e_out", f"{name}_e_in"):
        loc = adjacency_table_location(spark, table)
        spark.sql(f"DROP TABLE IF EXISTS `{table}`")
        shutil.rmtree(loc, ignore_errors=True)


def load_adjacency(spark, name: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(vertices, edges_by_src, edges_by_dst) from ``write_adjacency``
    tables. The two edge frames hold identical rows; pick by join key."""
    return (
        spark.table(f"{name}_v"),
        spark.table(f"{name}_e_out"),
        spark.table(f"{name}_e_in"),
    )


def write_partitioned(df: DataFrame, path: str, *cols: str):
    """Persist hive-style directory-partitioned parquet
    (``path/col=value/...``). At 100 TB this is the first line of
    defense: a filter on a partition column prunes entire directories
    BEFORE any IO is scheduled (visible as ``PartitionFilters`` on the
    scan node), which no row-group statistic can match. Partition by
    low-cardinality, always-filtered columns (date, event_type,
    source); never by high-cardinality keys (small-file explosion)."""
    df.write.mode("overwrite").partitionBy(*cols).parquet(path)


def read_partitioned(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)
