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
- ``graph_updates``: a change-log stream folded into live graph state
  (foreachBatch micro-batch mutation — the streaming twin of the
  reference's WAL-replicated command loop)

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
from graphdb_spark.streaming.graph_updates import (
    CHANGE_SCHEMA,
    apply_change_stream,
    change_stream_from_files,
    fold_changes,
)

__all__ = [
    "stream_events_from_files",
    "windowed_counts",
    "sessionized",
    "dedup_stream",
    "last_state_per_user",
    "CHANGE_SCHEMA",
    "fold_changes",
    "apply_change_stream",
    "change_stream_from_files",
]
