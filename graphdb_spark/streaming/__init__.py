"""Structured Streaming extension — SURVEY.md §2.9 stretch surface.

The reference has no streaming operators (its 'streaming' is WAL
replication). This module adds the Spark-native stream processing a
large-scale pipeline needs, shaped around the driver's ``events``
table schema (event_id, ts, user_id, event_type, value, props):

- ``stream_events``: file/memory/rate source → typed event stream
- ``windowed_counts``: watermark + tumbling/sliding window aggregates
- ``sessionized``: session windows (F.session_window)
- ``dedup_stream``: dropDuplicatesWithinWatermark on event_id
- ``last_state_per_user``: stateful last-event compaction via
  applyInPandasWithState (custom stateful operator pattern)

All transformations are expressed on unbounded DataFrames, so the
exact same plan runs in batch mode (tests exercise both).
"""

from graphdb_spark.streaming.events import (
    dedup_stream,
    last_state_per_user,
    sessionized,
    stream_events_from_files,
    windowed_counts,
)

__all__ = [
    "stream_events_from_files",
    "windowed_counts",
    "sessionized",
    "dedup_stream",
    "last_state_per_user",
]
