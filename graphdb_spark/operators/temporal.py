"""Temporal graph / time-travel — SURVEY.md §2.9, reference
lib/src/graph_evolution/.

- ``ChangeLog``: append-only change records (change_tracker.rs:5-26)
  as a DataFrame; ``replay(T)`` materializes the graph state at T
  (change_tracker.rs:28-44) via last-writer-wins window dedup.
- ``TimeWindow``: interval membership filter (time_window.rs:4-17).
- ``as_of_edges``: interval-validity filter for edges carrying
  start_time / end_time (graph_evolution/models.rs:11-12).

Scale: replay is one shuffle on the entity key + a row_number — the
canonical CDC-compaction plan; Delta CDF would feed the same shape.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from graphdb_spark.datamodel import local_df


@dataclass(frozen=True)
class TimeWindow:
    """time_window.rs:4-17"""

    start: str
    end: str

    def contains(self, col):
        return (col >= F.lit(self.start)) & (col < F.lit(self.end))

    def filter(self, df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
        return df.filter(self.contains(F.col(ts_col)))


class ChangeLog:
    """Append-only change log over nodes and edges.

    Schema: timestamp, kind ('node'|'edge'), entity_id, src, dst,
    properties, op ('upsert'|'delete').
    """

    def __init__(self, changes: DataFrame):
        self.changes = changes

    @classmethod
    def from_rows(cls, spark, rows: list[tuple]) -> "ChangeLog":
        df = local_df(
            spark,
            rows,
            "timestamp timestamp, kind string, entity_id string, "
            "src string, dst string, "
            "properties map<string,string>, op string",
        )
        return cls(df)

    def append(self, other: DataFrame) -> "ChangeLog":
        return ChangeLog(self.changes.unionByName(other))

    def replay(self, t) -> tuple[DataFrame, DataFrame]:
        """Materialize (nodes, edges) state at time T: keep each
        entity's latest change with timestamp <= T; drop deletes.
        (change_tracker.rs:28-44 + last-writer-wins.)"""
        upto = self.changes.filter(F.col("timestamp") <= F.lit(t))
        w = Window.partitionBy("kind", "entity_id").orderBy(F.desc("timestamp"))
        latest = (
            upto.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .filter(F.col("op") != "delete")
            .drop("rn")
        )
        nodes = latest.filter(F.col("kind") == "node").select(
            F.col("entity_id").alias("id"), "timestamp", "properties"
        )
        edges = latest.filter(F.col("kind") == "edge").select(
            F.col("entity_id").alias("id"), "src", "dst", "timestamp", "properties"
        )
        return nodes, edges

    def between(self, window: TimeWindow) -> DataFrame:
        """Changes inside a TimeWindow (time_window.rs semantics)."""
        return window.filter(self.changes, "timestamp")


def as_of_edges(edges: DataFrame, t, start_col: str = "start_time",
                end_col: str = "end_time") -> DataFrame:
    """Edges valid at time T: start <= T AND (end IS NULL OR end > T)
    (graph_evolution/models.rs:11-12 interval validity)."""
    return edges.filter(
        (F.col(start_col) <= F.lit(t))
        & (F.col(end_col).isNull() | (F.col(end_col) > F.lit(t)))
    )


def range_join(points: DataFrame, intervals: DataFrame,
               point_ms: str = "ts_ms", start_ms: str = "start_ms",
               end_ms: str = "end_ms", keys: tuple = (),
               bin_width_ms: int = 600_000) -> DataFrame:
    """Interval-containment join — every (point, interval) pair with
    ``start_ms <= point_ms < end_ms`` (and equal ``keys``) — WITHOUT
    the nested-loop plan Spark produces for a naive theta-join.

    Both sides are mapped to fixed-width time bins: an interval
    explodes to every bin it covers, a point lands in exactly one bin,
    and the join becomes an equi-join on (*keys, bin) plus the exact
    containment filter. Each qualifying pair meets in exactly one bin
    (the point's), so no dedup pass is needed.

    Scale: the naive BETWEEN join is O(|points| x |intervals|) per key
    (BroadcastNestedLoopJoin — dies at 100 TB); this plans one hash
    shuffle on (*keys, bin) with interval replication bounded by
    ceil(interval_len / bin_width) + 1. Pick bin_width near the median
    interval length: shorter bins replicate intervals more, longer
    bins put more non-matching pairs through the post-filter.
    Timestamps are epoch-millis BIGINTs — exact arithmetic, exact
    SQL replay.

    Column names from both inputs survive into the output; disambiguate
    before calling if they collide (only the join keys may be shared).
    """
    # integer `div`, never double `/`: a double quotient can round up
    # across the bin boundary for near-multiple timestamps
    W = int(bin_width_ms)
    p = points.withColumn("__bin", F.expr(f"{point_ms} div {W}"))
    # guard BEFORE the explode: for a corrupt/reversed interval
    # (end <= start) F.sequence would silently generate a DESCENDING
    # bin series — no wrong matches (the containment filter drops
    # them) but one bad row could fan out to millions of bins; an
    # empty/invalid interval must produce zero bins, zero work
    i = intervals.filter(F.col(end_ms) > F.col(start_ms)).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.expr(f"{start_ms} div {W}"),
                F.expr(f"({end_ms} - 1) div {W}"),
            )
        ),
    )
    on = [*keys, "__bin"]
    return (
        p.join(i, on=on, how="inner")
        .filter(
            (F.col(point_ms) >= F.col(start_ms))
            & (F.col(point_ms) < F.col(end_ms))
        )
        .drop("__bin")
    )


def time_bucket_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    bucket: str = "hour",
    order_col: str | None = None,
) -> DataFrame:
    """Hypertable-style time-bucket rollup (TimescaleDB continuous
    aggregates; beyond the reference — SURVEY §2.9 stretch): per
    (time_bucket, *keys) emit the six standard gauges

      n, value_sum, low, high, open, close

    ALL decomposable: besides the values, the output carries the order
    keys of open/close (``open_ord``/``close_ord``) so a coarser
    rollup can be produced FROM a finer one by :func:`rollup_merge`
    without revisiting raw rows — the continuous-aggregate hierarchy
    (raw -> hourly -> daily -> monthly) each level reading only the
    previous one.

    ``order_col`` breaks open/close ties deterministically; it must be
    totally ordered (default: millis + row id must be supplied by the
    caller). Scale: one hash-partitioned partial-aggregated groupBy on
    (bucket, *keys) — map-side combine keeps the shuffle at
    |groups| x 8 gauge columns regardless of raw row count.
    """
    ord_expr = F.col(order_col) if order_col else F.col(ts_col).cast("string")
    g = df.withColumn("__bucket", F.date_trunc(bucket, F.col(ts_col))).withColumn(
        "__ord", ord_expr
    )
    return g.groupBy("__bucket", *keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("value_sum"),
        F.min(value_col).alias("low"),
        F.max(value_col).alias("high"),
        F.min_by(value_col, F.col("__ord")).alias("open"),
        F.max_by(value_col, F.col("__ord")).alias("close"),
        F.min("__ord").alias("open_ord"),
        F.max("__ord").alias("close_ord"),
    ).withColumnRenamed("__bucket", "bucket")


def rollup_merge(
    rollup: DataFrame, keys: list[str], bucket: str = "day"
) -> DataFrame:
    """Re-aggregate a finer :func:`time_bucket_rollup` output into a
    coarser bucket, reading ONLY the rollup (never the raw table):
    n/value_sum add, low/high min/max, open/close follow their carried
    order keys via min_by/max_by. At 100 TB this is the difference
    between an O(raw) and an O(groups) daily job."""
    g = rollup.withColumn("__bucket", F.date_trunc(bucket, F.col("bucket")))
    return g.groupBy("__bucket", *keys).agg(
        F.sum("n").alias("n"),
        F.sum("value_sum").alias("value_sum"),
        F.min("low").alias("low"),
        F.max("high").alias("high"),
        F.min_by("open", F.col("open_ord")).alias("open"),
        F.max_by("close", F.col("close_ord")).alias("close"),
        F.min("open_ord").alias("open_ord"),
        F.max("close_ord").alias("close_ord"),
    ).withColumnRenamed("__bucket", "bucket")
