"""Streaming graph updates: a change-log stream folded into live
GraphSession state.

The reference applies mutations one ZMQ command at a time through a WAL
leader (sled_storage_daemon_pool.rs:1351-1461). The Spark-native shape
is a *micro-batched change-log*: a streaming DataFrame of graph changes
consumed with ``foreachBatch``; each batch is folded into the session's
vertices/edges with last-writer-wins semantics, cascade deletes, and
endpoint validation — the same semantics as operators/mutations.py, but
amortized over a batch instead of per-command.

Change schema (a streaming superset of operators/temporal.ChangeLog):

    timestamp timestamp, kind string ('vertex'|'edge'),
    op string ('upsert'|'delete'),
    id string, label string,                -- vertex fields
    src string, relationship string, dst string,  -- edge identity
    properties map<string,string>

Scale notes: each fold is two window-dedups (batch side only — the
batch is small relative to state), two anti-joins and a union per
entity kind; state lineage is cut by GraphSession.set_state
(localCheckpoint). State itself stays distributed — nothing collects to
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

CHANGE_SCHEMA = (
    "timestamp timestamp, kind string, op string, id string, label string, "
    "src string, relationship string, dst string, "
    "properties map<string,string>"
)


def fold_changes(g, batch: DataFrame) -> None:
    """Fold one (batch) DataFrame of changes into the session state.

    Last-writer-wins inside the batch (per vertex id / edge triple,
    latest timestamp counts); vertex deletes cascade to incident edges
    in both directions (rdb/managers.rs:119-159 semantics); edge
    upserts are endpoint-validated against the post-upsert vertex set
    (rdb/datastore.rs:272-281)."""
    batch = batch.localCheckpoint(eager=True)  # consumed many times below

    vw = Window.partitionBy("id").orderBy(F.desc("timestamp"))
    v_latest = (
        batch.filter(F.col("kind") == "vertex")
        .withColumn("__rn", F.row_number().over(vw))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    v_upserts = v_latest.filter(F.col("op") != "delete").select(
        "id", "label",
        F.coalesce("properties", F.create_map().cast(
            "map<string,string>")).alias("properties"),
    )
    v_deletes = v_latest.filter(F.col("op") == "delete").select("id")

    ew = Window.partitionBy("src", "relationship", "dst").orderBy(
        F.desc("timestamp")
    )
    e_latest = (
        batch.filter(F.col("kind") == "edge")
        .withColumn("__rn", F.row_number().over(ew))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    e_upserts = e_latest.filter(F.col("op") != "delete").select(
        "src", "relationship", "dst",
        F.coalesce("properties", F.create_map().cast(
            "map<string,string>")).alias("properties"),
    )
    e_deletes = e_latest.filter(F.col("op") == "delete").select(
        "src", "relationship", "dst"
    )

    new_v = (
        g.vertices
        .join(v_upserts.select("id"), "id", "left_anti")
        .join(v_deletes, "id", "left_anti")
        .unionByName(v_upserts)
    )
    # endpoint validation against the post-upsert vertex set
    vids = new_v.select("id")
    e_valid = (
        e_upserts
        .join(vids.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(vids.withColumnRenamed("id", "dst"), "dst", "left_semi")
    )
    new_e = (
        g.edges
        .join(e_valid.select("src", "relationship", "dst"),
              ["src", "relationship", "dst"], "left_anti")
        .join(e_deletes, ["src", "relationship", "dst"], "left_anti")
        .unionByName(e_valid)
    )
    # cascade: removing a vertex removes incident edges, both directions
    new_e = (
        new_e
        .join(v_deletes.withColumnRenamed("id", "src"), "src", "left_anti")
        .join(v_deletes.withColumnRenamed("id", "dst"), "dst", "left_anti")
    )
    g.set_state(new_v, new_e)


def fold_appends(g, batch: DataFrame, validate: bool = True) -> None:
    """Insert-only fold — the APPEND path of the streaming ingest
    story, for the dominant 100 TB stream shape (event edges arrive,
    entities are never rewritten). Routes through
    ``GraphSession.append_state``: on a session-OWNED bucketed layout
    the rows are APPENDED into the layout tables with the stamped
    fingerprint folded forward in O(delta)
    (``partitioning.append_adjacency``) and compaction auto-triggers
    past the threshold — the reference's per-write index maintenance
    (rdb/managers.rs:233-260) as a streaming micro-batch, with NO
    per-batch REINDEX. :func:`fold_changes`, by contrast, supports
    upserts/deletes and must divorce any layout every batch (its swap
    rewrites state wholesale).

    Contract (same as :func:`incremental_degree_view`): the stream
    carries only ``op='upsert'`` rows for NEW entities — a clean CDC
    insert feed. In-batch duplicates are dropped; CROSS-batch replays
    are NOT detected (that would cost a full anti-join against state
    per batch — dedupe replay-prone sources upstream with
    ``dropDuplicatesWithinWatermark``). A batch carrying deletes
    raises loudly instead of silently appending them as rows.

    ``validate=True`` drops edges whose endpoints exist in neither
    current state nor this batch's vertex adds — the semi-join probes
    the vertex relation on its bucket key (id), so an adopted layout
    serves it with zero state-side exchange. ``validate=False`` skips
    the check and clears ``integrity_validated`` (bulk_insert
    semantics: dangling edges possible)."""
    batch = batch.localCheckpoint(eager=True)  # consumed several times
    if not batch.filter(F.col("op") == "delete").isEmpty():
        raise ValueError(
            "fold_appends is insert-only; route streams carrying "
            "deletes/upserts through fold_changes"
        )
    empty_map = F.create_map().cast("map<string,string>")
    v_new = (
        batch.filter(F.col("kind") == "vertex")
        .select("id", "label",
                F.coalesce("properties", empty_map).alias("properties"))
        .dropDuplicates(["id"])
    )
    e_new = (
        batch.filter(F.col("kind") == "edge")
        .select("src", "relationship", "dst",
                F.coalesce("properties", empty_map).alias("properties"))
        .dropDuplicates(["src", "relationship", "dst"])
    )
    if validate:
        vids = g.vertices.select("id").unionByName(v_new.select("id"))
        e_new = (
            e_new
            .join(vids.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(vids.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "relationship", "dst", "properties")
        )
    # pass None for an empty side: appending zero rows would still
    # bump that relation's append-pressure counter (and eventually
    # force a pointless compaction of a pristine table); the probes
    # are local scans over the checkpointed batch. A fully empty
    # micro-batch is a no-op — no state-version bump, no meta write.
    v_arg = None if v_new.isEmpty() else v_new
    e_arg = None if e_new.isEmpty() else e_new
    if v_arg is None and e_arg is None:
        return
    g.append_state(vertices=v_arg, edges=e_arg)
    if not validate:
        g.integrity_validated = False


def apply_append_stream(g, adds: DataFrame, checkpoint_dir: str,
                        available_now: bool = True, validate: bool = True,
                        on_update=None):
    """Attach an insert-only CDC stream to the session: every
    micro-batch appends via :func:`fold_appends` — layout-maintaining
    ingest (see that contract). ``on_update(g, batch_id)`` runs after
    each fold, as in :func:`apply_change_stream`."""
    if not adds.isStreaming:
        raise ValueError("adds must be a streaming DataFrame; "
                         "use fold_appends() for batch")

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        fold_appends(g, batch_df, validate=validate)
        if on_update is not None:
            on_update(g, _batch_id)

    writer = (
        adds.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def apply_change_stream(g, changes: DataFrame, checkpoint_dir: str,
                        available_now: bool = True, on_update=None):
    """Attach a streaming change-log to the session: every micro-batch
    is folded into the graph state via :func:`fold_changes`.

    ``on_update(g, batch_id)``, if given, runs after each fold —
    the hook for continuous derived views (refresh degree counts,
    re-run a registered traversal, write a downstream sink) over the
    just-updated state.

    With ``available_now=True`` the query drains all currently
    available input and stops (test/replay mode); otherwise it runs
    continuously. Returns the StreamingQuery."""
    if not changes.isStreaming:
        raise ValueError("changes must be a streaming DataFrame; "
                         "use fold_changes() for batch")

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        fold_changes(g, batch_df)
        if on_update is not None:
            on_update(g, _batch_id)

    writer = (
        changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def change_stream_from_files(spark, path: str, fmt: str = "parquet",
                             max_files_per_trigger: int | None = None
                             ) -> DataFrame:
    """File-source change stream in CHANGE_SCHEMA (exactly-once file
    discovery; pair with apply_change_stream).

    ``max_files_per_trigger`` bounds each micro-batch; 1 replays a
    directory of single-file batches in file order — the deterministic
    multi-batch harness stream_apply_changelog relies on."""
    reader = spark.readStream.format(fmt).schema(CHANGE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return reader.load(path)


def continuous_query_view(g, changes: DataFrame, checkpoint_dir: str,
                          query_fn, sink_dir: str,
                          available_now: bool = True):
    """Streaming-native traversal: a registered query (pipe algebra,
    Cypher, or any fn(GraphSession) -> DataFrame) re-evaluated over the
    freshly-folded state after EVERY micro-batch, its snapshot
    published to ``sink_dir`` (parquet overwrite — readers always see a
    complete consistent view).

    Micro-batch recompute is the honest Spark shape for arbitrary
    traversals (a BFS result is not incrementally maintainable in
    general — one edge can re-route the whole frontier); the recompute
    runs distributed against the updated state, amortized per batch,
    and Catalyst re-optimizes with fresh sizes each time. For the
    aggregations that ARE delta-maintainable, use
    :func:`incremental_degree_view` — no recompute at all."""
    def on_update(g2, _batch_id):
        query_fn(g2).write.mode("overwrite").parquet(sink_dir)

    return apply_change_stream(
        g, changes, checkpoint_dir, available_now, on_update
    )


def incremental_degree_view(changes: DataFrame,
                            dedup_within: str | None = None) -> DataFrame:
    """Delta-maintained per-vertex degrees over the edge change-log —
    a genuinely streaming-native stateful operator (no graph fold, no
    recompute): each edge add contributes +1 / delete −1 to its
    endpoints' out/in degree; a streaming groupBy keeps the running
    totals (update output mode; state is O(V), partitioned by id).

    Assumes a clean CDC stream (each edge add/delete event appears
    once — the contract of a change-log source). Pass ``dedup_within``
    (e.g. ``"10 minutes"``) to defensively drop source replays with
    WATERMARK-BOUNDED state (dropDuplicatesWithinWatermark) — an
    unbounded dropDuplicates would grow state O(events), which is the
    exact anti-pattern this module avoids."""
    e = changes.filter(F.col("kind") == "edge")
    if dedup_within is not None:
        e = e.withWatermark("timestamp", dedup_within)
        e = e.dropDuplicatesWithinWatermark(
            ["src", "relationship", "dst", "op", "timestamp"]
        )
    sign = F.when(F.col("op") == "delete", F.lit(-1)).otherwise(F.lit(1))
    src = e.select(
        F.col("src").alias("id"),
        sign.alias("out_delta"),
        F.lit(0).alias("in_delta"),
    )
    dst = e.select(
        F.col("dst").alias("id"),
        F.lit(0).alias("out_delta"),
        sign.alias("in_delta"),
    )
    return (
        src.unionByName(dst)
        .groupBy("id")
        .agg(
            F.sum("out_delta").alias("out_degree"),
            F.sum("in_delta").alias("in_degree"),
        )
    )
