"""Streaming operators over the events schema.

Every function takes a DataFrame that may be streaming
(``spark.readStream``) or batch — the logical plan is identical, which
is how the tests verify semantics without a long-running query, plus a
true streaming smoke test via the rate source + memory sink.

Scale notes: watermarks bound state; windowed aggregates are
partial-agg friendly; dropDuplicatesWithinWatermark keeps the dedup
state windowed instead of unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def stream_events_from_files(spark, path: str, fmt: str = "parquet") -> DataFrame:
    """File-source event stream (exactly-once file discovery)."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENT_SCHEMA)
        .load(path)
    )


def windowed_counts(events: DataFrame, window: str = "10 minutes",
                    slide: str | None = None,
                    watermark: str = "30 minutes") -> DataFrame:
    """Tumbling (or sliding) window counts + sums per event_type with
    late-data handling via watermark."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    win = (
        F.window("ts", window) if slide is None else F.window("ts", window, slide)
    )
    return (
        src.groupBy(win.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def sessionized(events: DataFrame, gap: str = "30 minutes",
                watermark: str = "1 hour") -> DataFrame:
    """Session windows per user (gap-based, F.session_window) — the
    streaming twin of workloads.temporal.sessionize."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("events"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Exactly-once per event_id within the watermark horizon."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def clicks_to_purchases(events: DataFrame, horizon: str = "1 hour",
                        watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks within the preceding ``horizon`` (attribution shape).
    Watermarks on both sides bound the join state; the time-range
    predicate lets Spark evict expired rows."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}"))
    )
    return clicks.join(purchases, cond).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_ts",
        "click_value",
    )


def last_state_per_user(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user latest (ts, event_id,
    event_type, value). Streaming: applyInPandasWithState keeps one
    row of state per user; batch: equivalent window compaction.

    Ties on ts break by event_id in BOTH paths (the driver's sf1
    synthetic events contain 100k same-(user, ts) pairs — without the
    tiebreak the streaming answer would depend on pandas chunk
    order)."""
    out_schema = (
        "user_id bigint, last_ts timestamp, last_eid bigint, "
        "last_type string, last_value double"
    )
    if not events.isStreaming:
        from pyspark.sql.window import Window

        w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        return (
            events.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                F.col("ts").alias("last_ts"),
                F.col("event_id").alias("last_eid"),
                F.col("event_type").alias("last_type"),
                F.col("value").alias("last_value"),
            )
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    state_schema = (
        "last_ts timestamp, last_eid bigint, last_type string, "
        "last_value double"
    )

    def update(key, pdfs, state):
        import pandas as pd

        latest = None  # (ts, event_id, type, value)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            tail = pdf.iloc[-1]
            cand = (tail["ts"], int(tail["event_id"]),
                    tail["event_type"], float(tail["value"]))
            if latest is None or cand[:2] > latest[:2]:
                latest = cand
        if state.exists:
            prev = tuple(state.get)
            if latest is None or prev[:2] >= latest[:2]:
                latest = prev
        if latest is not None:
            state.update(latest)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "last_ts": [latest[0]],
                    "last_eid": [latest[1]],
                    "last_type": [latest[2]],
                    "last_value": [latest[3]],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
