"""Durable graph persistence with MERGE-based mutation.

SURVEY §1.3/§2.8 map the reference's in-place KV updates
(rdb/datastore.rs:342-362 set_properties; inmemory_storage.rs:144-148
update upsert) to Delta Lake ``MERGE INTO`` at production scale. This
module provides that path when ``delta-spark`` is importable, and an
explicit parquet read-merge-overwrite fallback when it is not (this
container has no delta package — see SCALE.md "Durability").

Semantics are identical in all modes (upsert by key; last writer
wins); the difference is operational:

- Delta: transactional commit, concurrent-writer safety, time travel,
  file-level data skipping on merge. The mode for 100 TB.
- ``tlog`` (sources/tlog.py): the same four properties on PLAIN
  parquet via this engine's own commit log — atomic versioned
  commits, optimistic concurrency, file-granular copy-on-write MERGE
  with footer-stats skipping, and working ``versionAsOf`` time
  travel. The default durable mode when delta-spark is absent (this
  container), and the engine's answer to the reference's WAL
  (lib/src/durability/wal.rs:37-108).
- Parquet fallback: single-writer only, no history, rewrites the
  table per merge (read + join-upsert + overwrite). Correct and
  tested, but the per-merge cost is O(table), not O(delta) — kept
  for plain-directory interop (the files stay readable by any
  parquet tool with no log to honor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def _fmt(fmt: str) -> str:
    if fmt == "auto":
        return "delta" if delta_available() else "parquet"
    return fmt


def save_table(df: DataFrame, path: str, fmt: str = "auto",
               mode: str = "overwrite") -> str:
    """Write a vertices/edges table; returns the format used."""
    f = _fmt(fmt)
    if f == "tlog":
        from graphdb_spark.sources import tlog  # noqa: PLC0415

        if mode == "append":
            tlog.append(df, path)
        else:
            tlog.overwrite(df, path)
        return f
    df.write.mode(mode).format(f).save(path)
    return f


def load_table(spark, path: str, fmt: str = "auto") -> DataFrame:
    f = _fmt(fmt)
    if f == "tlog":
        from graphdb_spark.sources import tlog  # noqa: PLC0415

        return tlog.read(spark, path)
    return spark.read.format(f).load(path)


def merge_table(spark, path: str, updates: DataFrame, keys: list[str],
                fmt: str = "auto") -> str:
    """Upsert ``updates`` into the table at ``path`` by ``keys``
    (update on match, insert on miss) — the MERGE INTO that
    update_vertex / set_properties compile to at scale.

    Delta mode: a real transactional ``DeltaTable.merge``. tlog mode:
    file-granular copy-on-write merge through the engine's own commit
    log (O(touched files), concurrent-writer safe). Parquet mode:
    join-based upsert + atomic-ish overwrite (single writer).
    Returns the format used."""
    f = _fmt(fmt)
    if f == "tlog":
        from graphdb_spark.sources import tlog

        tlog.merge(spark, path, updates, keys)
        return f
    if f == "delta":
        from delta.tables import DeltaTable

        cond = " AND ".join(f"t.{k} = u.{k}" for k in keys)
        (
            DeltaTable.forPath(spark, path)
            .alias("t")
            .merge(updates.alias("u"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return f
    current = spark.read.format("parquet").load(path)
    merged = (
        current.join(updates.select(*keys), keys, "left_anti")
        .unionByName(updates.select(*current.columns))
        # break lineage from the files about to be overwritten — Spark
        # cannot overwrite a path it is concurrently reading from
        .localCheckpoint(eager=True)
    )
    merged.write.mode("overwrite").format("parquet").save(path)
    return f


def save_graph(g, vertices_path: str, edges_path: str,
               fmt: str = "auto") -> str:
    f = save_table(g.vertices, vertices_path, fmt)
    save_table(g.edges, edges_path, fmt)
    return f


def merge_vertex_updates(spark, vertices_path: str, updates: DataFrame,
                         fmt: str = "auto") -> str:
    """update_vertex / set_properties as persistent MERGE by id."""
    return merge_table(spark, vertices_path, updates, ["id"], fmt)


def merge_edge_updates(spark, edges_path: str, updates: DataFrame,
                       fmt: str = "auto") -> str:
    """Edge identity is the triple (inmemory_storage.rs:16)."""
    return merge_table(
        spark, edges_path, updates, ["src", "relationship", "dst"], fmt
    )


def delete_from_table(spark, path: str, keys_df: DataFrame,
                      keys: list[str], fmt: str = "auto") -> str:
    """Keyed delete (delete_vertex / DETACH DELETE's persistent twin)."""
    f = _fmt(fmt)
    if f == "tlog":
        from graphdb_spark.sources import tlog

        tlog.delete(spark, path, keys_df, keys)
        return f
    if f == "delta":
        from delta.tables import DeltaTable

        # anti-join rewrite via merge-delete
        cond = " AND ".join(f"t.{k} = u.{k}" for k in keys)
        (
            DeltaTable.forPath(spark, path)
            .alias("t")
            .merge(keys_df.alias("u"), cond)
            .whenMatchedDelete()
            .execute()
        )
        return f
    current = spark.read.format("parquet").load(path)
    kept = current.join(
        keys_df.select(*keys), keys, "left_anti"
    ).localCheckpoint(eager=True)
    kept.write.mode("overwrite").format("parquet").save(path)
    return f


__all__ = [
    "delta_available",
    "save_table",
    "load_table",
    "merge_table",
    "save_graph",
    "merge_vertex_updates",
    "merge_edge_updates",
    "delete_from_table",
]


def load_table_version(spark, path: str, version: int,
                       fmt: str = "auto") -> DataFrame:
    """Time travel: read the table AS OF a past commit version.

    Delta mode: the transaction log serves any retained version
    (``versionAsOf``). tlog mode: same, from the engine's own commit
    log (sources/tlog.py). Plain-parquet mode has no log — callers
    get an explicit error instead of silently-wrong data; the
    emulated history path there is parquet *snapshots* (sources.
    readers snapshot_export/import + operators.temporal replay),
    which the temporal_diff gate entry verifies."""
    f = _fmt(fmt)
    if f == "tlog":
        from graphdb_spark.sources import tlog

        return tlog.read(spark, path, version=version)
    if f != "delta":
        raise RuntimeError(
            "time travel requires delta-spark or fmt='tlog' (plain "
            "parquet keeps no version history; use snapshot_export "
            "per version)"
        )
    return (
        spark.read.format("delta").option("versionAsOf", version).load(path)
    )
