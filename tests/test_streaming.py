"""Streaming tests: batch-mode semantic checks of the streaming plans
plus one true streaming run (file source → memory sink)."""

import datetime as dt

import pytest

from graphdb_spark.streaming import (
    dedup_stream,
    last_state_per_user,
    sessionized,
    stream_events_from_files,
    windowed_counts,
)


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def batch_events(spark):
    rows = [
        (1, ts("2024-01-01 00:01:00"), 10, "click", 1.0, "{}"),
        (2, ts("2024-01-01 00:04:00"), 10, "view", 2.0, "{}"),
        (3, ts("2024-01-01 00:12:00"), 10, "click", 3.0, "{}"),
        (4, ts("2024-01-01 00:02:00"), 20, "click", 4.0, "{}"),
        (4, ts("2024-01-01 00:02:00"), 20, "click", 4.0, "{}"),  # dup id
        (5, ts("2024-01-01 01:00:00"), 20, "purchase", 5.0, "{}"),
    ]
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )


def test_windowed_counts_batch(batch_events):
    got = {
        (r["window_start"].isoformat(), r["event_type"]): (r["n"], r["value_sum"])
        for r in windowed_counts(batch_events, "10 minutes").collect()
    }
    assert got[("2024-01-01T00:00:00", "click")] == (3, 9.0)  # 1.0+4.0+4.0
    assert got[("2024-01-01T00:10:00", "click")] == (1, 3.0)
    assert got[("2024-01-01T01:00:00", "purchase")] == (1, 5.0)


def test_sessionized_batch(batch_events):
    got = {
        (r["user_id"], r["session_start"].isoformat()): r["events"]
        for r in sessionized(batch_events, "30 minutes").collect()
    }
    # user 10: events at 00:01/00:04/00:12 chain into one session
    assert got[(10, "2024-01-01T00:01:00")] == 3
    # user 20: 00:02 and 01:00 are separate sessions
    assert got[(20, "2024-01-01T00:02:00")] == 2  # incl. duplicate row
    assert got[(20, "2024-01-01T01:00:00")] == 1


def test_dedup_batch(batch_events):
    assert dedup_stream(batch_events).count() == 5


def test_last_state_batch(batch_events):
    got = {
        r["user_id"]: (r["last_type"], r["last_value"])
        for r in last_state_per_user(batch_events).collect()
    }
    assert got == {10: ("click", 3.0), 20: ("purchase", 5.0)}


def test_true_streaming_file_source(spark, tmp_path, batch_events):
    """End-to-end micro-batch run: parquet file source → windowed agg →
    memory sink (availableNow, bounded)."""
    src = str(tmp_path / "events_in")
    batch_events.write.mode("overwrite").parquet(src)
    stream = stream_events_from_files(spark, src)
    assert stream.isStreaming
    agg = windowed_counts(stream, "10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("SELECT * FROM win_counts").collect()
    got = {(r["window_start"].isoformat(), r["event_type"]): r["n"] for r in out}
    assert got[("2024-01-01T00:00:00", "click")] == 3
    q.stop()


def test_streaming_stateful_last_state(spark, tmp_path, batch_events):
    """applyInPandasWithState end-to-end via availableNow micro-batch."""
    src = str(tmp_path / "events_state")
    batch_events.write.mode("overwrite").parquet(src)
    stream = stream_events_from_files(spark, src)
    out = last_state_per_user(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("last_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT user_id, last_type, last_value FROM last_state"
    ).collect()
    got = {r["user_id"]: (r["last_type"], r["last_value"]) for r in rows}
    assert got[10] == ("click", 3.0)
    assert got[20] == ("purchase", 5.0)
    q.stop()


def test_stream_stream_interval_join(spark, tmp_path, batch_events):
    """Clicks-to-purchases attribution join, batch semantics + true
    stream-stream run with watermarks."""
    from graphdb_spark.streaming.events import clicks_to_purchases

    # batch: user 20 clicked at 00:02, purchased at 01:00 -> within 1h
    got = clicks_to_purchases(batch_events).collect()
    assert len(got) == 2  # duplicate click row matches twice
    assert all(r["user_id"] == 20 for r in got)

    src = str(tmp_path / "events_ssj")
    batch_events.write.mode("overwrite").parquet(src)
    stream = stream_events_from_files(spark, src)
    out = clicks_to_purchases(stream)
    q = (
        out.writeStream.format("memory").queryName("ssj")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows_ = spark.sql("SELECT user_id, purchase_id FROM ssj").collect()
    assert len(rows_) == 2 and all(r["user_id"] == 20 for r in rows_)
    q.stop()
