"""GraphSession — the engine's state holder and public facade.

Replaces the reference's Database facade + daemon plumbing
(lib/src/memory/datastore_old.rs:45-201 Database; the ZMQ daemon pools,
WAL replication, and storage-backend zoo of SURVEY.md §2.11 collapse
into a SparkSession + two DataFrames persisted as Parquet).

State model: the session holds the *current* vertices/edges/kv
DataFrames. Mutations (operators/mutations.py) produce new DataFrames;
the session swaps them in and re-registers temp views — read-your-writes
without mutable storage. Persistence = `save()` to parquet
(at production scale: Delta, where MERGE/OPTIMIZE apply).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from graphdb_spark import algebra as A
from graphdb_spark.datamodel import (
    EDGE_SCHEMA,
    VERTEX_SCHEMA,
    empty_edges,
    empty_vertices,
    local_df,
)
from graphdb_spark.translator import NotIndexedError, QueryOutput, Translator


def build_spark(app_name: str = "graphdb_spark", master: str | None = None,
                shuffle_partitions: int | None = None) -> SparkSession:
    """Opinionated SparkSession for this engine.

    AQE on (runtime broadcast/skew handling), UTC session timezone
    (determinism for the DuckDB oracle), Arrow enabled for the
    pandas-UDF operators."""
    import os

    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        b = b.master(f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    # local-mode driver == the whole "cluster": the 1g default heap
    # GC-thrashes (GCLocker retry crashes) on >SF0.1 shuffles; only
    # effective before the JVM launches, so set it here, not per-query
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    return (
        b.config("spark.driver.memory", driver_mem)
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # size-based coalescing: without this AQE keeps ~defaultParallelism
        # partitions even for kB-sized shuffles — hundreds of no-op tasks
        # per small query; with it, partition count follows data volume
        # (the behavior you want at every scale; Spark docs recommend it)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 64 MB dimension tables are comfortably broadcastable on any
        # sane executor; the 10 MB default forces shuffle joins for
        # mid-size vertex/dim tables that fit in memory many times over
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata's events.ts is parquet TIMESTAMP(NANOS) which
        # Spark rejects by default; read as long, normalized in sources.tpch
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


from graphdb_spark.partitioning import append_pressure as _append_pressure


class GraphSession:
    """Two-DataFrame property graph + KV store + query surfaces."""

    #: REINDEX staging-name sequence: combined with the pid it makes
    #: every staging generation unique across sessions AND processes,
    #: so concurrent REINDEXes of the same layout name over a shared
    #: warehouse can never write into each other's staging dirs.
    _STAGE_SEQ = 0

    def __init__(self, spark: SparkSession, vertices: DataFrame | None = None,
                 edges: DataFrame | None = None, strict_indexing: bool = False,
                 assume_integrity: bool | None = None):
        self.spark = spark
        self._v = vertices if vertices is not None else empty_vertices(spark)
        self._e = edges if edges is not None else empty_edges(spark)
        # referential-integrity knowledge: True when every edge endpoint
        # provably exists (validated ingest, FK-derived construction, an
        # empty graph). The Cypher planner uses it to elide the
        # existence join for anonymous unconstrained endpoint nodes —
        # `MATCH (c)-[r:T]->()` — which is otherwise a full
        # edges x vertices shuffle that returns every row. bulk_insert
        # (validation-skipping, may leave dangling edges) clears it.
        # Default: True only when BOTH tables start empty (trivially
        # consistent), else False — a directly-constructed arbitrary
        # pair is unknown.
        if assume_integrity is None:
            assume_integrity = vertices is None and edges is None
        self.integrity_validated = assume_integrity
        self._kv = local_df(spark, [], "key string, value string")
        # index_property registry: we never *need* indexes (scans + pushdown
        # replace them) but keep the API + a strict conformance mode in which
        # unindexed property queries raise like the reference
        # (rdb/datastore.rs:82-100, tests/indexing.rs:32-48).
        self.strict_indexing = strict_indexing
        self._indexed: set[str] = set()
        self._mutation_count = 0
        self._e_by_key: dict = {}  # use_bucketed_layout fills this
        # monotonically bumped by every GRAPH-state (vertices/edges)
        # swap; ensure_bucketed_layout records the version a layout was
        # written/validated at, so a re-ensure on an unmutated session
        # skips the content check entirely while ANY graph mutation —
        # including count-preserving property upserts — forces it
        # (VERDICT r9 item 1). KV-only swaps deliberately do NOT bump
        # it: the layout describes vertices/edges, which a KV write
        # cannot drift.
        self._state_version = 0
        self._layout_valid: dict = {}  # name -> (state_version, buckets)
        # currently adopted layout (None when on plain frames) —
        # append_state/compact_layout maintain it incrementally
        self._layout_name: str | None = None
        self._layout_buckets = 0
        self._layout_cached = False
        self._layout_shared = False
        self._register_views()

    # ------------------------------------------------------------ state

    @property
    def vertices(self) -> DataFrame:
        return self._v

    @property
    def edges(self) -> DataFrame:
        return self._e

    @property
    def kv(self) -> DataFrame:
        return self._kv

    def _register_views(self):
        self._v.createOrReplaceTempView("vertices")
        self._e.createOrReplaceTempView("edges")

    def set_state(self, vertices: DataFrame | None = None,
                  edges: DataFrame | None = None,
                  kv: DataFrame | None = None):
        """Swap in new state after a mutation (read-your-writes).

        Integrity note: ``integrity_validated`` is PRESERVED across
        swaps because every official mutation path (operators/
        mutations except bulk_insert, the Cypher DML executor, the
        streaming fold) endpoint-validates what it writes; bulk_insert
        clears the flag itself. A caller swapping in arbitrary
        unvalidated edges directly must clear ``integrity_validated``
        or anonymous-endpoint Cypher matches may assume too much.

        Every few swaps the new state is localCheckpointed (lazily):
        without periodic cuts, chained mutations build an ever-deeper
        union/join lineage and every later query re-evaluates the whole
        mutation history — the SURVEY §7.3 'mutations on immutable
        data' hazard. Checkpointing EVERY swap would instead copy the
        full table per mutation (a bulk append of 10k rows re-
        materializing 10^8 resident rows); every 3rd keeps lineage
        depth bounded at the cost of re-running ≤2 cheap deltas. At
        production scale the same role is played by the Delta commit.
        """
        self._mutation_count += 1
        cut = self._mutation_count % 3 == 0

        def _cp(df):
            return df.localCheckpoint(eager=False) if cut else df

        if vertices is not None:
            self._v = _cp(vertices)
        if edges is not None:
            self._e = _cp(edges)
        if kv is not None:
            self._kv = _cp(kv)
        if vertices is not None or edges is not None:
            self._state_version += 1
            # graph state changed in place: drop memos derived from the
            # old state (the translator's materialized frontiers would
            # be STALE DATA, the executor's label counts a stale
            # broadcast decision)
            self._frontier_cache = {}
            self._label_count_cache = None
            self._branch_cache = {}
            self._cypher_plan_cache = {}
            # a graph mutation invalidates any adopted bucketed layout:
            # the written tables describe the PREVIOUS state. The
            # canonical _v/_e frames (just swapped) stay correct; hops
            # simply lose the exchange-elision until
            # use_bucketed_layout() is re-run. (Row-ADD mutations
            # should go through append_state instead — it maintains
            # the layout WITH the write.) A KV-ONLY swap skips all of
            # this: vertices/edges are bit-identical, so the layout,
            # the graph memos, and the plan cache (cached Cypher plans
            # are MATCH reads over the v/e views; Cypher KV reads go
            # through kv_retrieve, a per-call collect that is never
            # plan-cached) all remain valid — a kv_insert must not
            # cost the session its exchange-elision contract.
            self._e_by_key = {}
            self._layout_name = None
            self._register_views()
        return self

    def use_bucketed_layout(self, name: str = "graph_adj",
                            buckets: int = 32, write: bool = True,
                            cache: bool = False,
                            shared: bool = False) -> "GraphSession":
        """Adopt the dual bucketed adjacency layout
        (``partitioning.write_adjacency``): vertices bucketed by id,
        edges stored twice — bucketed by src (forward) and by dst
        (reversed) — the Spark twin of the reference's forward +
        reversed edge indexes (rdb/managers.rs:233-240).

        After adoption, every traversal hop joins the copy bucketed on
        its own key, so non-broadcast hops exchange only the frontier
        (the edge relation's scan satisfies the join's required
        distribution), and ``groupBy(src)`` degree aggregates plan
        with zero exchange. ``write=False`` re-attaches tables a prior
        call (or another session) already wrote. ``cache=True``
        additionally caches the three frames — cached bucketed scans
        keep their output partitioning because build_spark pins
        canChangeCachedPlanOutputPartitioning=false semantics (Spark
        default).

        Layout is an *optimization contract*, not state: mutations via
        set_state invalidate it (hops fall back to the canonical
        frames) — re-run after bulk loads, like a REINDEX."""
        from graphdb_spark import partitioning as P

        if write:
            P.write_adjacency(self._v, self._e, name, buckets)
            self._layout_valid[name] = (self._state_version, buckets)
        v, e_out, e_in = P.load_adjacency(self.spark, name)
        if cache:
            v, e_out, e_in = v.cache(), e_out.cache(), e_in.cache()
        self._v = v
        self._e = e_out  # canonical scan order: forward copy
        self._e_by_key = {"src": e_out, "dst": e_in}
        self._layout_name = name
        self._layout_buckets = buckets
        self._layout_cached = cache
        # session-OWNED by default (mutations may maintain the tables
        # in place via append_state); shared=True marks a cross-
        # process cache of immutable dataset state that must never
        # absorb this session's mutations (see append_state). A flag,
        # not a post-hoc attribute: re-adoption re-states ownership.
        self._layout_shared = shared
        # frames changed identity: derived memos are stale
        self._frontier_cache = {}
        self._label_count_cache = None
        self._branch_cache = {}
        self._cypher_plan_cache = {}
        self._register_views()
        return self

    def ensure_bucketed_layout(self, name: str = "graph_adj",
                               buckets: int = 32,
                               cache: bool = False,
                               assume_immutable: bool = False,
                               shared: bool = False,
                               ) -> "GraphSession":
        """Adopt the dual bucketed adjacency, REUSING tables a prior
        process already wrote under ``name`` when they still describe
        this exact state — otherwise (re)write them. This is the
        default-adoption entry point: the reference ALWAYS maintains
        its forward + reversed edge indexes (rdb/managers.rs:233-240);
        for a resident graph the one-time write amortizes in ~10-20
        hop queries at sf10 (BENCH_sf10_bucketed.json). Callers that
        key ``name`` to an immutable dataset (workloads.graph.
        graph_session keys it to the sf_dir's file signature) get
        cross-process reuse for free.

        Stale-table guard (three tiers, cheapest first): (1) this
        session already wrote/validated ``name`` at its CURRENT
        ``_state_version`` and the tables are still cataloged — attach
        with no scans; (2) otherwise compare order-independent content
        fingerprints of the session frames against the spec stamped
        next to the files at write time (``partitioning.
        content_fingerprint`` — count + bit-XOR of row xxhash64 over
        every column). Row counts alone are NOT enough: a
        count-preserving mutation (update_vertex / set_properties
        upserting values, mutations.py:66,162) would pass a count
        guard and silently re-attach — and, because adoption replaces
        the session's canonical frames, silently REVERT — the
        pre-mutation state. The reference cannot hit this class of
        bug: its indexes update transactionally with every write
        (rdb/managers.rs:233-260); the fingerprint is our equivalent
        invariant. (3) Mismatch → staged rewrite of ONLY the stale
        relations (per-relation fingerprints): a vertex-property bulk
        upsert rewrites one vertex table, not the two — much larger —
        edge tables (partial REINDEX; VERDICT r9 item 2).

        ``assume_immutable=True`` (for callers whose ``name`` embeds
        the dataset's identity, like graph_session's file-signature
        keys) downgrades tier 2 to metadata-only row counts — but ONLY
        while this session is unmutated; any mutation re-arms the full
        fingerprint compare."""
        from graphdb_spark import partitioning as P

        spark = self.spark
        tables = [f"{name}_v", f"{name}_e_out", f"{name}_e_in"]
        if self._layout_valid.get(name) == (
            self._state_version, buckets,
        ) and all(
            spark.catalog.tableExists(t) for t in tables
        ):
            return self.use_bucketed_layout(
                name, buckets, write=False, cache=cache, shared=shared
            )
        try:
            # same-process catalog hit, or cross-process re-attach over
            # the surviving warehouse files (P.attach_adjacency) —
            # refuses on bucket-count mismatch vs the files' spec
            attach = P.attach_adjacency(spark, name, buckets)
        except Exception:  # noqa: BLE001 — any attach failure → write
            attach = False
        stale, fp_v, fp_e = {"v", "e"}, None, None
        if attach:
            meta = P.read_layout_meta(spark, name)
            if meta is None or meta.get("buckets") != buckets:
                pass  # no trustworthy spec: full rewrite
            elif (
                assume_immutable
                and self._state_version == 0
                and (meta.get("v") or {}).get("n") == self._v.count()
                and (meta.get("e") or {}).get("n") == self._e.count()
            ):
                # caller keys ``name`` to the dataset's identity (e.g.
                # graph_session embeds the source files' signature) and
                # this session is UNMUTATED — content cannot have
                # drifted from what the name pins, so metadata-only
                # row counts suffice. Any mutation (state_version > 0)
                # voids the shortcut: mutated sessions ALWAYS pay the
                # fingerprint compare — the r9 latent-bug flow.
                stale = set()
            else:
                fp_v = P.content_fingerprint(self._v)
                fp_e = P.content_fingerprint(self._e)
                stale = set()
                if meta.get("v") != fp_v:
                    stale.add("v")
                if meta.get("e") != fp_e:
                    stale.add("e")
        if stale:
            self._reindex(name, buckets, stale, fp_v=fp_v, fp_e=fp_e)
        self._layout_valid[name] = (self._state_version, buckets)
        return self.use_bucketed_layout(
            name, buckets, write=False, cache=cache, shared=shared
        )

    def _reindex(self, name: str, buckets: int, stale: set,
                 fp_v: dict | None = None, fp_e: dict | None = None):
        """STAGED rewrite of the stale layout relations + swap, never
        an in-place overwrite: after a mutation the session's frames
        may themselves read the old layout tables (layout-frame +
        delta lineage), and overwrite-saveAsTable deletes the files it
        is about to read from. Writing a staging generation first
        keeps the sources consistent; the swap is metadata + a dir
        rename. A crash between drop and rename just loses (part of)
        the layout — the next ensure detects the missing table and
        writes fresh (REINDEX semantics). ``stale`` picks the
        relations: {"v"} rewrites one table, {"e"} the two edge
        copies, both the full three-table REINDEX.

        Concurrency: staging names are PER-PROCESS unique (pid +
        sequence), so two drivers REINDEXing the same ``name`` over a
        shared warehouse can never write into each other's staging
        dirs — the swap is last-writer-wins per table, and a loser
        whose rename fails because the winner's tables landed first
        ACCEPTS the winner's layout iff its stamped fingerprints match
        this session's state (always true for signature-keyed names,
        where the name pins the content). Readers racing a swap can
        fail transiently (non-transactional FS rename) and recover at
        the next ensure; abandoned stages from crashed processes are
        age-gated garbage-collected."""
        import os
        import shutil

        from graphdb_spark import partitioning as P

        spark = self.spark
        GraphSession._STAGE_SEQ += 1
        stage = f"{name}__stage{os.getpid():x}_{GraphSession._STAGE_SEQ}"
        P.gc_stale_stages(spark, name)
        P.drop_adjacency(spark, stage)
        if stale == {"v", "e"}:
            # full REINDEX: write_adjacency stamps fresh meta into the
            # staged _v dir; the renames carry it into place
            # pass any fingerprints the caller already holds (ensure's
            # staleness compare computed them; compaction's content is
            # unchanged by construction) — write_adjacency stamps them
            # instead of paying one recompute scan per relation
            P.write_adjacency(self._v, self._e, stage, buckets,
                              fp_v=fp_v, fp_e=fp_e)
            renamed = 0
            try:
                P.drop_adjacency(spark, name)
                for sfx in ("_v", "_e_out", "_e_in"):
                    spark.sql(
                        f"ALTER TABLE `{stage}{sfx}` RENAME TO `{name}{sfx}`"
                    )
                    renamed += 1
            except Exception:
                if renamed == 0:
                    # lost a concurrent swap race cleanly: a peer's
                    # complete generation landed between our drop and
                    # first rename. Accept it ONLY when its spec
                    # describes exactly this session's state (compare
                    # against our own staged meta — write_adjacency
                    # just computed those fingerprints, no rescans);
                    # anything else re-raises (ensure's caller falls
                    # back / rewrites — never silent wrong data).
                    meta = P.read_layout_meta(spark, name)
                    want = P.read_layout_meta(spark, stage) or {}
                    fpv = fp_v or want.get("v")
                    fpe = fp_e or want.get("e")
                    if (
                        meta is not None
                        and fpv is not None
                        and fpe is not None
                        and meta.get("buckets") == buckets
                        and meta.get("v") == fpv
                        and meta.get("e") == fpe
                        and P.attach_adjacency(spark, name, buckets)
                    ):
                        P.drop_adjacency(spark, stage)
                        return
                else:
                    # mid-swap failure: a PARTIAL generation must not
                    # survive behind a valid-looking sidecar (the _v
                    # rename carries our meta; a later ensure would
                    # trust it over mixed files). Drop what landed —
                    # the next ensure finds no spec and rewrites.
                    P.drop_adjacency(spark, name)
                raise
            return
        # partial REINDEX: preserve the fresh relation's tables and
        # fingerprint, swap only the stale one
        old_meta = P.read_layout_meta(spark, name) or {}
        specs = {
            "v": [("_v", self._v, "id")],
            "e": [("_e_out", self._e, "src"), ("_e_in", self._e, "dst")],
        }
        todo = [t for k in sorted(stale) for t in specs[k]]
        for sfx, df, key in todo:
            P.write_adjacency_table(df, f"{stage}{sfx}", key, buckets)
        # the swap is multi-step and non-transactional: kill the
        # sidecar FIRST so no intermediate state can ever attach — a
        # crash between the _e_out and _e_in swaps would otherwise
        # leave mixed-generation edge copies behind a still-matching
        # spec (out-hops and in-hops silently disagreeing); with the
        # meta gone, the next ensure finds no trustworthy spec and
        # rewrites fully
        P.invalidate_layout_meta(spark, name)
        for sfx, _, _ in todo:
            loc = P.adjacency_table_location(spark, f"{name}{sfx}")
            spark.sql(f"DROP TABLE IF EXISTS `{name}{sfx}`")
            shutil.rmtree(loc, ignore_errors=True)
            spark.sql(f"ALTER TABLE `{stage}{sfx}` RENAME TO `{name}{sfx}`")
        P.write_layout_meta(spark, name, {
            "buckets": buckets,
            "v": (fp_v or P.content_fingerprint(self._v))
            if "v" in stale else old_meta.get("v"),
            "e": (fp_e or P.content_fingerprint(self._e))
            if "e" in stale else old_meta.get("e"),
            # a rewrite compacts what it touches; appended files may
            # survive on the untouched relation, so keep its pressure
            "appends": {
                k: 0 if k in stale else _append_pressure(old_meta).get(k, 0)
                for k in ("v", "e")
            },
        })

    #: compaction (per-relation rewrite) triggers after this many
    #: layout appends on any one relation
    #: (multi-file buckets keep hash distribution — the exchange-
    #: elision contract — but each append adds a file per non-empty
    #: bucket; past this point the one-file-per-bucket sort contract
    #: is worth restoring). The reference's analogue is the LSM
    #: memtable flush -> SST compaction cycle its RocksDB backend
    #: runs continuously.
    LAYOUT_COMPACT_APPENDS = 16

    def append_state(self, vertices: DataFrame | None = None,
                     edges: DataFrame | None = None) -> "GraphSession":
        """Row-ADD mutation (create_vertex / bulk_insert): when a
        bucketed layout is adopted, the new rows are APPENDED into the
        layout tables and the stamped fingerprint folds forward in
        O(delta) (``partitioning.append_adjacency``) — the layout
        survives the write with NO REINDEX, closing the reference's
        per-write index-maintenance gap (rdb/managers.rs:233-260)
        incrementally instead of by full rebuild. Hash distribution is
        preserved, so hops keep their exchange elision over the
        appended state; per-bucket sort degrades to multi-file until
        compaction (auto past LAYOUT_COMPACT_APPENDS appends). Without
        an adopted layout this is plain union + set_state.

        Ownership rule: the in-place append only runs on a layout this
        session OWNS. A SHARED adoption (``_layout_shared`` — e.g.
        graph_session's signature-keyed default layout, a cache of
        IMMUTABLE dataset state reused across processes) must never
        absorb one session's mutations: the rows would pollute every
        later reader's re-attach (the fingerprint guard would catch it
        and force them all to rewrite). Mutating a shared adoption
        falls back to plain union + set_state — the session simply
        divorces the layout, exactly like any other mutation."""
        name = self._layout_name
        if name is None or getattr(self, "_layout_shared", False):
            v = (self._v.unionByName(vertices)
                 if vertices is not None else None)
            e = self._e.unionByName(edges) if edges is not None else None
            return self.set_state(vertices=v, edges=e)
        from graphdb_spark import partitioning as P

        try:
            meta = P.append_adjacency(self.spark, name,
                                      self._layout_buckets,
                                      vertices=vertices, edges=edges)
        except Exception as exc:
            # Two classes, one recovery. ValueError = unusable sidecar
            # spec (bucket mismatch / pre-sum-term / truncated entry),
            # rejected before any file touched. Anything else = a
            # failed append, which append_adjacency ROLLED BACK to the
            # pre-append file set (its three appends are not one
            # transaction; without the rollback a half-appended delta
            # would diverge the forward/reversed copies and the next
            # REINDEX — sourced from these very tables — would launder
            # the phantom rows into canonical state). Either way the
            # tables hold exactly the pre-append rows, so the plain
            # union + set_state divorce is correct, same as any other
            # mutation; the next ensure REINDEXes with a fresh spec.
            if not isinstance(exc, ValueError):
                import sys

                print(
                    f"# append_state: layout append failed ({exc!r});"
                    " rolled back, divorcing layout",
                    file=sys.stderr,
                )
            # re-resolve the base tables FRESH: the session's existing
            # frame objects pinned their relation (and file listing)
            # at an earlier analysis, and an append+rollback cycle
            # leaves such pinned listings pointing at deleted files —
            # refreshTable fixes the catalog, not already-analyzed
            # DataFrames (measured: the stale object throws
            # FAILED_READ_FILE.FILE_NOT_EXIST; a fresh spark.table
            # resolves clean)
            v0, e0, _e_in = P.load_adjacency(self.spark, name)
            v = v0.unionByName(vertices) if vertices is not None else v0
            e = e0.unionByName(edges) if edges is not None else e0
            return self.set_state(vertices=v, edges=e)
        # it IS a mutation: version bumps and derived memos drop, but
        # the layout was maintained WITH the write, so re-adopt it
        self._mutation_count += 1
        self._state_version += 1
        cache = self._layout_cached
        g = self.use_bucketed_layout(name, self._layout_buckets,
                                     write=False, cache=cache,
                                     shared=self._layout_shared)
        self._layout_valid[name] = (self._state_version,
                                    self._layout_buckets)
        pressure = _append_pressure(meta)
        if pressure and max(pressure.values()) >= self.LAYOUT_COMPACT_APPENDS:
            g = g.compact_layout()
        return g

    def compact_layout(self) -> "GraphSession":
        """Restore one-file-per-bucket on the adopted layout (the
        compaction half of append_state's LSM cycle) via the staged
        REINDEX — PER RELATION: only relations that actually
        accumulated append files are rewritten, so an edge-only ingest
        stream never forces the pristine (and comparably huge) vertex
        table through a rewrite at compaction time. Compaction does
        not change content, so the already-folded fingerprints are
        passed through instead of being recomputed (saves a full scan
        per relation). No-op on plain frames or a pressure-free
        layout."""
        from graphdb_spark import partitioning as P

        name = self._layout_name
        if name is None:
            return self
        buckets, cache = self._layout_buckets, self._layout_cached
        meta = P.read_layout_meta(self.spark, name)
        pressure = _append_pressure(meta)
        stale = {k for k, n in pressure.items() if n}
        if meta is None:
            stale = {"v", "e"}  # no trustworthy spec: restore fully
        elif not stale:
            return self  # every bucket is already one file
        self._reindex(name, buckets, stale,
                      fp_v=(meta or {}).get("v"),
                      fp_e=(meta or {}).get("e"))
        self._layout_valid[name] = (self._state_version, buckets)
        return self.use_bucketed_layout(name, buckets, write=False,
                                        cache=cache,
                                        shared=self._layout_shared)

    def edges_for(self, direction: str) -> DataFrame:
        """Direction-appropriate edge frame: the copy bucketed on the
        hop key when a layout is adopted ('out' joins on src, 'in' on
        dst), else the canonical frame. 'both' has no single hop key —
        callers pass ``edges_for('out')`` plus ``reversed_edges()`` so
        each orientation half reads its own-key copy."""
        by_key = getattr(self, "_e_by_key", None) or {}
        key = {"out": "src", "in": "dst"}.get(direction)
        return by_key.get(key, self._e)

    def reversed_edges(self) -> DataFrame | None:
        """The dst-keyed copy when adopted (for both-direction hops'
        ``edges_in``), else None (callers fall back to the single
        frame)."""
        by_key = getattr(self, "_e_by_key", None) or {}
        return by_key.get("dst")

    # ------------------------------------------------------------ ingest

    @classmethod
    def load(cls, spark: SparkSession, vertices_path: str, edges_path: str,
             fmt: str = "parquet", **kw) -> "GraphSession":
        """Load a persisted graph. Dedup enforces edge identity
        (src, relationship, dst) (inmemory_storage.rs:16) and endpoint
        validation mirrors create_edge's FK check
        (rdb/datastore.rs:272-281) via semi-joins. ``fmt='tlog'``
        reads transaction-logged tables (sources/tlog.py) written by
        ``save(fmt='tlog')``."""
        if fmt == "parquet":
            v = spark.read.parquet(vertices_path)
            e = spark.read.parquet(edges_path)
        else:
            from graphdb_spark.sources import delta_store as DS

            v = DS.load_table(spark, vertices_path, fmt)
            e = DS.load_table(spark, edges_path, fmt)
        return cls.from_dataframes(spark, v, e, **kw)

    @classmethod
    def from_dataframes(cls, spark: SparkSession, vertices: DataFrame,
                        edges: DataFrame, validate: bool = True,
                        **kw) -> "GraphSession":
        v = vertices.dropDuplicates(["id"])
        e = edges.dropDuplicates(["src", "relationship", "dst"])
        if validate:
            ids = v.select("id")
            e = (
                e.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .select("src", "relationship", "dst", *[
                    c for c in e.columns if c not in ("src", "relationship", "dst")
                ])
            )
        kw.setdefault("assume_integrity", validate)
        return cls(spark, v, e, **kw)

    def save(self, vertices_path: str, edges_path: str,
             mode: str = "overwrite", fmt: str = "parquet"):
        """Persist. Snapshot export/import equivalent
        (lib/src/durability/snapshot.rs:33-62) — parquet instead of
        JSON. ``fmt='tlog'`` (or 'delta' when installed) writes
        through the transactional store instead: versioned commits,
        so a later ``delta_store.load_table_version`` can time-travel
        the graph."""
        if fmt == "parquet":
            self._v.write.mode(mode).parquet(vertices_path)
            self._e.write.mode(mode).parquet(edges_path)
            return
        from graphdb_spark.sources import delta_store as DS

        DS.save_table(self._v, vertices_path, fmt, mode)
        DS.save_table(self._e, edges_path, fmt, mode)

    # ------------------------------------------------------------ queries

    def get(self, q: A.Query) -> list[QueryOutput]:
        """Pipe-algebra entry point (Database::get / Transaction::get)."""
        return self._translator().run(q)

    def df(self, q: A.Query) -> DataFrame:
        return self._translator().df(q)

    def _translator(self) -> Translator:
        # frontier memo persists across queries on this immutable state
        # (set_state returns a NEW session, so mutations invalidate it)
        if not hasattr(self, "_frontier_cache"):
            self._frontier_cache = {}
        return Translator(
            self._v, self._e,
            strict_indexing=self.strict_indexing, indexed=self._indexed,
            hot_endpoints=getattr(self, "_hot_endpoints", None),
            frontier_cache=self._frontier_cache,
            edges_by_key=getattr(self, "_e_by_key", None),
        )

    def enable_skew_salting(self, threshold: int = 1000):
        """Profile edge-endpoint skew (partitioning.hot_keys) and make
        every subsequent pipe hop split super-node keys onto a
        broadcast path (translator skew-aware hop). The hot-key lists
        are tiny by definition (few keys exceed the threshold) and are
        materialized once per call; re-call after heavy mutation."""
        from graphdb_spark.partitioning import hot_keys

        self._hot_endpoints = {}
        for key in ("src", "dst"):
            hk = (
                hot_keys(self._e, key, threshold)
                .select(F.col(key).alias("id"))
                .localCheckpoint(eager=True)
            )
            if hk.count() > 0:
                self._hot_endpoints[key] = hk
        return self

    def sql(self, query: str) -> DataFrame:
        """SQL passthrough over the registered views (SURVEY.md §7 M5)."""
        return self.spark.sql(query)

    #: plan-cache capacity; read paths repeat heavily (dashboards,
    #: bench best-of-N), DML never caches, so a small LRU suffices
    CYPHER_PLAN_CACHE_MAX = 128

    def cypher(self, query: str):
        """Cypher subset entry point (lazy import to keep core light).

        Read statements (those that produce a DataFrame) are PLAN-
        CACHED per query text on this immutable state — the standard
        engine plan cache: a repeated MATCH…RETURN skips tokenize/
        parse/bind entirely and goes straight to execution. Mutations
        and KV ops are never cached (they have side effects and return
        summaries), and set_state drops the cache wholesale, so a
        cached plan can never read stale state (its lazy DataFrame
        references the exact vertices/edges snapshots it was planned
        against)."""
        import re

        from graphdb_spark.cypher.executor import execute_cypher

        if not hasattr(self, "_cypher_plan_cache"):
            self._cypher_plan_cache = {}
        # a DataFrame result is NOT sufficient for cacheability:
        # `MERGE … RETURN n.x` returns a DataFrame AND mutates. Only
        # statements free of DML keywords cache; a false positive
        # (keyword inside a string literal) merely skips the cache —
        # never a stale read
        cacheable = not re.search(
            r"\b(CREATE|MERGE|DELETE|REMOVE|SET)\b", query.upper()
        )
        if cacheable:
            hit = self._cypher_plan_cache.pop(query, None)
            if hit is not None:
                # true LRU: re-insert on hit so dict order = recency
                # and eviction below drops the least-recently-USED
                # entry, not the least-recently-inserted
                self._cypher_plan_cache[query] = hit
                return hit
        out = execute_cypher(self, query)
        if cacheable and isinstance(out, DataFrame):
            if len(self._cypher_plan_cache) >= self.CYPHER_PLAN_CACHE_MAX:
                # drop the oldest entry (dict preserves insert order)
                self._cypher_plan_cache.pop(
                    next(iter(self._cypher_plan_cache))
                )
            self._cypher_plan_cache[query] = out
        return out

    def execute(self, query: str):
        """Language-detecting entry point — the QueryExecEngine
        equivalent (reference query_exec_engine.rs:18-28 +
        query_parser.rs:33-51 detection). Cypher executes via the
        Cypher pipeline; SQL via spark.sql over the registered views
        (where the reference returns 'not implemented' for SQL,
        query_exec_engine.rs:38-44, we run it)."""
        from graphdb_spark.cypher.parser import is_cypher

        q = query.strip()
        if is_cypher(q):
            return self.cypher(q)
        head = q.split(None, 1)[0].upper() if q else ""
        if head in ("SELECT", "WITH", "VALUES", "TABLE", "SHOW", "DESCRIBE"):
            return self.sql(q)
        if head in ("QUERY", "MUTATION", "SUBSCRIPTION") or q.startswith("{"):
            # GraphQL front-end: detected like the reference
            # (query_parser.rs:33-51 tries a GraphQL parse) and, like
            # the reference, parse-only — the REST path returns a mock
            # (rest_api/src/lib.rs:274-284). We return the structured
            # detection result instead of executing.
            return {"language": "graphql", "status": "parse_only",
                    "query": q}
        raise ValueError(f"cannot detect query language for: {q[:60]!r}")

    # ------------------------------------------------------------ analytics

    def max_branch(self, direction: str = "out") -> int:
        """Max per-vertex branching factor in the followed direction —
        the static bound that lets bfs() prove a short traversal's
        frontiers stay broadcastable and compile to ONE lazy plan (no
        per-hop probe jobs). One aggregate job per direction per state;
        memoized on this immutable session state (like the frontier
        cache) and invalidated by set_state."""
        from pyspark.sql import functions as F  # noqa: PLC0415

        if not hasattr(self, "_branch_cache"):
            self._branch_cache = {}
        hit = self._branch_cache.get(direction)
        if hit is not None:
            return hit
        e = self._e
        if direction == "out":
            keyed = e.select(F.col("src").alias("k"))
        elif direction == "in":
            keyed = e.select(F.col("dst").alias("k"))
        else:
            keyed = e.select(F.col("src").alias("k")).unionByName(
                e.select(F.col("dst").alias("k"))
            )
        row = keyed.groupBy("k").count().agg(F.max("count")).collect()
        n = int(row[0][0] or 0)
        self._branch_cache[direction] = n
        return n

    def bfs(self, start_id: str, max_depth: int = 5, t: str | None = None,
            direction: str = "out"):
        from graphdb_spark.operators.traversal import bfs

        # directed traversals read the copy bucketed+sorted on their
        # hop key when a layout is adopted: phase-1's `src IN (...)`
        # pushdown then prunes sorted row groups, and phase-2's
        # non-broadcast hops skip the edge-side exchange; both-
        # direction hops read EACH orientation from its own-key copy
        return bfs(self.edges_for(direction), start_id, max_depth, t,
                   direction, max_branch=self.max_branch(direction),
                   edges_in=self.reversed_edges())

    def shortest_path(self, src_id: str, dst_id: str, max_depth: int = 5,
                      t: str | None = None, direction: str = "both"):
        from graphdb_spark.operators.traversal import shortest_path

        return shortest_path(self.edges_for(direction), src_id, dst_id,
                             max_depth, t, direction,
                             edges_in=self.reversed_edges())

    def degrees(self):
        from graphdb_spark.operators.analytics import degrees

        return degrees(self._e)

    def pagerank(self, iterations: int = 10, damping: float = 0.85):
        from graphdb_spark.operators.analytics import pagerank

        return pagerank(self._e, iterations, damping)

    def triangle_count(self):
        from graphdb_spark.operators.analytics import triangle_count

        return triangle_count(self._e)

    def connected_components(self, max_iter: int = 20, algorithm: str = "small"):
        """'small' = min-label propagation (O(diameter) rounds);
        'large' = large-star/small-star (O(log n) rounds, the
        100 TB / high-diameter path)."""
        if algorithm == "large":
            from graphdb_spark.operators.traversal import (
                connected_components_large,
            )

            return connected_components_large(self._e, max_iter)
        from graphdb_spark.operators.traversal import connected_components_small

        return connected_components_small(self._e, max_iter)

    def find(self, motif: str):
        """GraphFrames-style motif finding."""
        from graphdb_spark.operators.analytics import motif_find

        return motif_find(self, motif)

    def aggregate_messages(self, agg, msg_to_dst=None, msg_to_src=None):
        """GraphFrames aggregateMessages over the triplet view."""
        from graphdb_spark.operators.analytics import aggregate_messages

        return aggregate_messages(
            self._v, self._e, agg, msg_to_dst=msg_to_dst, msg_to_src=msg_to_src
        )

    def label_propagation(self, max_iter: int = 5):
        from graphdb_spark.operators.analytics import label_propagation

        return label_propagation(self._e, max_iter)

    # ------------------------------------------------------------ counts

    def vertex_count(self) -> int:
        """rdb/datastore.rs:57-60"""
        return self._v.count()

    def edge_count(self) -> int:
        """rdb/datastore.rs:102-105"""
        return self._e.count()

    # ------------------------------------------------------------ indexing

    def index_property(self, name: str):
        """Declare + 'backfill' an index (rdb/datastore.rs:312-340).
        Spark scans + pushdown make this a registry entry only."""
        self._indexed.add(name)
        return self

    def is_indexed(self, name: str) -> bool:
        return name in self._indexed

    # ------------------------------------------------------------ KV store

    def kv_insert(self, key: str, value: str):
        """storage_engine.rs:1233-1239 insert; last-writer-wins."""
        new = local_df(self.spark, [(key, value)], "key string, value string")
        merged = self._kv.filter(F.col("key") != key).unionByName(new)
        return self.set_state(kv=merged)

    def kv_retrieve(self, key: str) -> str | None:
        rows = self._kv.filter(F.col("key") == key).select("value").collect()
        return rows[0][0] if rows else None

    def kv_delete(self, key: str):
        return self.set_state(kv=self._kv.filter(F.col("key") != key))

    def kv_flush(self):
        """flush is a commit no-op on immutable state."""
        return self

    def clear_data(self):
        """inmemory_storage.rs:88-96"""
        return self.set_state(
            vertices=empty_vertices(self.spark),
            edges=empty_edges(self.spark),
            kv=local_df(self.spark, [], "key string, value string"),
        )


__all__ = ["GraphSession", "build_spark", "NotIndexedError"]
