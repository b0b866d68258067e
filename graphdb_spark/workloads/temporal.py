"""Temporal workload: the reference's graph_evolution semantics
(SURVEY.md §2.9) on the driver ``events`` table.

- replay-to-T = filter changes with timestamp <= T, materialize the
  latest state per entity (change_tracker.rs:28-44) — here a window
  last-writer-wins;
- TimeWindow.contains = ts BETWEEN (time_window.rs:4-17);
- interval-valid / as-of = latest value at or before a point in time.

Timestamps leave the queries as epoch milliseconds (BIGINT) so the
Spark(µs)/DuckDB(ns) representations can't skew the value hash.

Scale: last-writer-wins is one shuffle on the partition key + a
row_number — the canonical pattern for CDC compaction at any scale;
the as-of join is the union+window trick (no per-row lookups).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphdb_spark.sources.tpch import load_tables

T_CUT = "2024-01-15 00:00:00"


def temporal_replay(spark, sf_dir):
    """Replay changes up to T: latest event per user at T
    (change_tracker.rs:28-44 'replay ≤ T' + last-writer-wins)."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.filter(F.col("ts") <= F.lit(T_CUT))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.unix_millis("ts").alias("ts_ms"),
            "event_type",
            "value",
        )
        .orderBy("user_id")
    )


TEMPORAL_REPLAY_SQL = f"""
SELECT user_id, epoch_ms(ts) AS ts_ms, event_type, value FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts <= TIMESTAMP '{T_CUT}'
) WHERE rn = 1 ORDER BY user_id
"""


def time_window_agg(spark, sf_dir):
    """TimeWindow.contains (time_window.rs:4-17) + tumbling daily
    windows: per-day, per-type counts and sums inside a window."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-05 00:00:00"))
            & (F.col("ts") < F.lit("2024-01-12 00:00:00"))
        )
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("value_sum"),
        )
        .orderBy("day", "event_type")
    )


TIME_WINDOW_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS value_sum
FROM events
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
GROUP BY 1, 2 ORDER BY day, event_type
"""


def asof_last_click(spark, sf_dir):
    """As-of join via union+window (SURVEY §2.9 interval-valid edges /
    'value as of T'): for each purchase, the user's most recent click
    value at or before the purchase."""
    ev = load_tables(spark, sf_dir)["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.col("value").alias("click_value")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.col("value").alias("purchase_value")
    )
    unioned = clicks.withColumn("purchase_value", F.lit(None).cast("double")).unionByName(
        purchases.withColumn("click_value", F.lit(None).cast("double"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        unioned.withColumn(
            "last_click", F.last("click_value", ignorenulls=True).over(w)
        )
        .filter(F.col("purchase_value").isNotNull())
        .select(
            "user_id",
            F.unix_millis("ts").alias("purchase_ts_ms"),
            "purchase_value",
            "last_click",
        )
        .orderBy("user_id", "purchase_ts_ms")
    )


ASOF_SQL = """
SELECT user_id, epoch_ms(ts) AS purchase_ts_ms, purchase_value, last_click FROM (
  SELECT user_id, ts, purchase_value,
    LAST_VALUE(click_value IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
  FROM (
    SELECT user_id, ts, event_id, value AS click_value,
           CAST(NULL AS DOUBLE) AS purchase_value
    FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT user_id, ts, event_id, CAST(NULL AS DOUBLE), value
    FROM events WHERE event_type = 'purchase'
  )
) WHERE purchase_value IS NOT NULL
ORDER BY user_id, purchase_ts_ms
"""


def sessionize(spark, sf_dir):
    """Session windows (gap-based sessionization, the batch analogue of
    Structured Streaming session windows): 30-minute inactivity gap,
    per-user session stats. Pure windows — no UDF, scales as two
    shuffles on user_id."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_min = 30
    sessions = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | (
                    F.unix_millis("ts") - F.unix_millis("prev_ts")
                    > gap_min * 60 * 1000
                )
            ).cast("int"),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.unix_millis(F.min("ts")).alias("start_ms"),
            F.unix_millis(F.max("ts")).alias("end_ms"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("sessions"),
            F.max("events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > 1800000
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
), per_session AS (
  SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS events
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS sessions,
       CAST(MAX(events) AS BIGINT) AS max_session_events
FROM per_session GROUP BY user_id ORDER BY user_id
"""


def range_join_attrib(spark, sf_dir):
    """Attribution window as an interval-containment join
    (operators/temporal.range_join): each purchase opens a 1-hour
    look-back window; count and sum the user's clicks inside it.
    The binned equi-join replaces the BroadcastNestedLoopJoin a naive
    BETWEEN predicate would plan — the difference between a hash
    shuffle and an O(points x intervals) scan at 100 TB. Oracle: the
    same BETWEEN join written naively (DuckDB handles the small gate
    SFs fine)."""
    from graphdb_spark.operators.temporal import range_join  # noqa: PLC0415

    ev = load_tables(spark, sf_dir)["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.col("value").alias("click_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.unix_millis("ts") - 3_600_000).alias("start_ms"),
        F.unix_millis("ts").alias("end_ms"),
    )
    joined = range_join(
        clicks, purchases, keys=("user_id",), bin_width_ms=600_000
    )
    return (
        joined.groupBy("user_id", "purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.round(F.sum(F.col("click_value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("click_sum"),
        )
        .orderBy("user_id", "purchase_id")
    )


RANGE_JOIN_SQL = """
SELECT p.user_id, p.purchase_id,
       CAST(COUNT(*) AS BIGINT) AS n_clicks,
       CAST(ROUND(SUM(CAST(c.value AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS click_sum
FROM (
  SELECT user_id, event_id AS purchase_id,
         epoch_ms(ts) - 3600000 AS start_ms, epoch_ms(ts) AS end_ms
  FROM events WHERE event_type = 'purchase'
) p
JOIN (
  SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events
  WHERE event_type = 'click'
) c
ON c.user_id = p.user_id
AND c.ts_ms >= p.start_ms AND c.ts_ms < p.end_ms
GROUP BY p.user_id, p.purchase_id
ORDER BY p.user_id, p.purchase_id
"""


def rollup_gauges(spark, sf_dir):
    """Hypertable continuous-aggregate hierarchy (operators/temporal
    .time_bucket_rollup + rollup_merge; beyond the reference): raw
    events -> HOURLY rollup -> merged to DAILY gauges, the daily level
    computed ONLY from the hourly rollup (open/close follow carried
    order keys) — the oracle computes daily directly from raw rows, so
    a hash match proves the two-level decomposition is lossless."""
    from graphdb_spark.operators.temporal import rollup_merge, time_bucket_rollup

    ev = load_tables(spark, sf_dir)["events"]
    ev = ev.withColumn(
        "ord",
        F.concat(
            F.lpad(F.unix_millis(F.col("ts")).cast("string"), 13, "0"),
            F.lit("_"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ),
    )
    hourly = time_bucket_rollup(
        ev, "ts", ["event_type"], "value", bucket="hour", order_col="ord"
    )
    daily = rollup_merge(hourly, ["event_type"], bucket="day")
    return daily.select(
        F.date_format("bucket", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n",
        F.round(F.col("value_sum"), 2).cast("double").alias("value_sum"),
        "low",
        "high",
        "open",
        "close",
    ).orderBy("day", "event_type")


ROLLUP_SQL = """
WITH o AS (
  SELECT date_trunc('day', ts) AS day, event_type, value,
         lpad(CAST(epoch_ms(ts) AS VARCHAR), 13, '0') || '_' ||
         lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord
  FROM events
)
SELECT strftime(day, '%Y-%m-%d') AS day, event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS value_sum,
  MIN(value) AS low, MAX(value) AS high,
  arg_min(value, ord) AS open, arg_max(value, ord) AS close
FROM o GROUP BY 1, 2 ORDER BY day, event_type
"""


T_CUT2 = "2024-01-15 06:00:00"  # 6h after T_CUT: mixes changed+unchanged


def temporal_diff(spark, sf_dir):
    """Time-travel diff — graph-evolution state at T1 vs T2
    (change_tracker.rs replay semantics, twice): LWW state per user at
    each cut, full-outer-joined on the entity key, rows classified
    added / changed / unchanged (removed can't occur in an append-only
    log but the branch exists), with headcount + value drift per class.

    Scale: two windowed LWW compactions + one shuffle join on the
    entity key — the canonical CDC snapshot-diff plan; Delta CDF would
    feed the same shape without re-reading the full log."""
    ev = load_tables(spark, sf_dir)["events"]

    def state(t, suffix):
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        return (
            ev.filter(F.col("ts") <= F.lit(t))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                F.col("event_id").alias(f"eid{suffix}"),
                F.col("value").alias(f"val{suffix}"),
            )
        )

    j = state(T_CUT, "1").join(state(T_CUT2, "2"), "user_id", "full")
    classified = j.withColumn(
        "change",
        F.when(F.col("eid1").isNull(), F.lit("added"))
        .when(F.col("eid2").isNull(), F.lit("removed"))
        .when(F.col("eid1") == F.col("eid2"), F.lit("unchanged"))
        .otherwise(F.lit("changed")),
    )
    return (
        classified.groupBy("change")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(
                    (
                        F.coalesce("val2", F.lit(0.0))
                        - F.coalesce("val1", F.lit(0.0))
                    ).cast("decimal(12,2)")
                ),
                2,
            )
            .cast("double")
            .alias("value_delta"),
        )
        .orderBy("change")
    )


TEMPORAL_DIFF_SQL = f"""
WITH s1 AS (
  SELECT user_id, event_id AS eid1, value AS val1 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts <= TIMESTAMP '{T_CUT}'
  ) WHERE rn = 1
), s2 AS (
  SELECT user_id, event_id AS eid2, value AS val2 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts <= TIMESTAMP '{T_CUT2}'
  ) WHERE rn = 1
)
SELECT CASE WHEN eid1 IS NULL THEN 'added'
            WHEN eid2 IS NULL THEN 'removed'
            WHEN eid1 = eid2 THEN 'unchanged'
            ELSE 'changed' END AS change,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(ROUND(SUM(CAST(COALESCE(val2, 0.0) - COALESCE(val1, 0.0)
                      AS DECIMAL(12,2))), 2) AS DOUBLE) AS value_delta
FROM s1 FULL OUTER JOIN s2 USING (user_id)
GROUP BY 1 ORDER BY change
"""


FUNNEL_WINDOW_H = 12  # max hours between funnel steps (probed: 12 h
                      # yields 150/37/7 at sf0.01 — every stage drops)


def funnel_conversion(spark, sf_dir):
    """Ordered event funnel with per-step time bound: first view ->
    first click within 12 h of it -> first purchase within 12 h of
    that click; users surviving each stage.

    Scale: three groupBy-min aggregates chained by equi-joins on
    user_id — each stage's survivors shrink, so every join after the
    first carries only the funnel remainder; no window over the full
    event stream, no sequence UDF."""
    ev = load_tables(spark, sf_dir)["events"]
    step = F.expr(f"INTERVAL {FUNNEL_WINDOW_H} HOURS")

    def first_after(event_type, prev):
        e = ev.filter(F.col("event_type") == event_type)
        if prev is None:
            g = e
        else:
            g = e.join(prev, "user_id").filter(
                (F.col("ts") > F.col("t")) & (F.col("ts") <= F.col("t") + step)
            ).drop("t")
        return g.groupBy("user_id").agg(F.min("ts").alias("t"))

    v = first_after("view", None)
    c = first_after("click", v)
    p = first_after("purchase", c)
    rows = [
        v.agg(F.lit("1_view").alias("stage"), F.count(F.lit(1)).alias("users")),
        c.agg(F.lit("2_click").alias("stage"), F.count(F.lit(1)).alias("users")),
        p.agg(F.lit("3_purchase").alias("stage"), F.count(F.lit(1)).alias("users")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("stage")


FUNNEL_SQL = f"""
WITH v AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN v ON v.user_id = e.user_id
   AND e.ts > v.t AND e.ts <= v.t + INTERVAL {FUNNEL_WINDOW_H} HOUR
  WHERE e.event_type = 'click' GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN c ON c.user_id = e.user_id
   AND e.ts > c.t AND e.ts <= c.t + INTERVAL {FUNNEL_WINDOW_H} HOUR
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT stage, users FROM (
  SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS users FROM v
  UNION ALL
  SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
  UNION ALL
  SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
) ORDER BY stage
"""


def cohort_retention(spark, sf_dir):
    """Weekly cohort retention: cohort = week of the user's first
    signup; for offsets 0-3 weeks, distinct users of that cohort with
    ANY activity in cohort_week + offset.

    Scale: one aggregate for cohort assignment, one distinct on
    (user, week) — both shuffle on user_id; the retention join carries
    |users| x |active weeks| rows, bounded by the offset filter."""
    ev = load_tables(spark, sf_dir)["events"]
    first = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cw"))
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    return (
        activity.join(first, "user_id")
        .withColumn(
            "week_offset", F.expr("datediff(w, cw) div 7").cast("int")
        )
        .filter((F.col("week_offset") >= 0) & (F.col("week_offset") <= 3))
        .groupBy(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


COHORT_SQL = """
WITH first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cw FROM events
  WHERE event_type = 'signup' GROUP BY 1
), activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
)
SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
  CAST(date_diff('day', cw, w) // 7 AS INT) AS week_offset,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
FROM activity JOIN first USING (user_id)
WHERE date_diff('day', cw, w) // 7 BETWEEN 0 AND 3
GROUP BY 1, 2 ORDER BY cohort_week, week_offset
"""


def sliding_window_revenue(spark, sf_dir):
    """Hopping event-time windows (the Structured Streaming window
    primitive, here in batch): 7-day windows sliding 1 day over
    purchase revenue. Spark emits one row per non-empty window via
    F.window (each row lands in 7 windows, epoch-aligned daily);
    the oracle regenerates the same day-aligned window series and
    replays the containment join."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.window("ts", "7 days", "1 day").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("win_start"),
            "n",
            "value_sum",
        )
        .orderBy("win_start")
    )


SLIDING_WINDOW_SQL = """
WITH bounds AS (
  SELECT date_trunc('day', MIN(ts)) - INTERVAL 6 DAY AS lo,
         date_trunc('day', MAX(ts)) AS hi
  FROM events WHERE event_type = 'purchase'
), days AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM bounds
)
SELECT strftime(d, '%Y-%m-%d') AS win_start,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS value_sum
FROM days JOIN events
  ON event_type = 'purchase' AND ts >= d AND ts < d + INTERVAL 7 DAY
GROUP BY d ORDER BY win_start
"""


QUERIES = {
    "temporal_replay": (temporal_replay, TEMPORAL_REPLAY_SQL),
    "time_window_agg": (time_window_agg, TIME_WINDOW_SQL),
    "asof_last_click": (asof_last_click, ASOF_SQL),
    "sessionize": (sessionize, SESSIONIZE_SQL),
    "range_join_attrib": (range_join_attrib, RANGE_JOIN_SQL),
    "rollup_gauges": (rollup_gauges, ROLLUP_SQL),
    "temporal_diff": (temporal_diff, TEMPORAL_DIFF_SQL),
    "funnel_conversion": (funnel_conversion, FUNNEL_SQL),
    "cohort_retention": (cohort_retention, COHORT_SQL),
    "sliding_window_revenue": (sliding_window_revenue, SLIDING_WINDOW_SQL),
}


# ---- exponentially time-decayed aggregation ------------------------------

DECAY_HALF_LIFE_MS = 7 * 24 * 3_600_000  # 7 days


def decayed_user_value(spark, sf_dir):
    """Per-user exponentially time-decayed engagement value: each
    event's value weighted by 0.5^(age/half-life), age measured from
    the corpus max timestamp (the 'now' of the batch). The decayed sum
    is the standard freshness-weighted feature for recommendation /
    training-data recency mixing.

    Scale shape: one tiny max-ts aggregate broadcast back (scalar), the
    weight is a map-side codegen expression, then ONE keyed groupBy —
    identical shuffle profile to a plain per-user sum. Per-event
    contributions are rounded then summed as DECIMAL so the result is
    independent of partition summation order (doubles are not
    associative; decimals are)."""
    ev = load_tables(spark, sf_dir)["events"]
    now = ev.agg(F.max(F.unix_millis("ts")).alias("now_ms"))
    weighted = ev.select(
        "user_id",
        F.col("value"),
        F.unix_millis("ts").alias("ts_ms"),
    ).crossJoin(F.broadcast(now)).withColumn(
        "contrib",
        F.round(
            F.pow(
                F.lit(0.5),
                (F.col("now_ms") - F.col("ts_ms"))
                / F.lit(float(DECAY_HALF_LIFE_MS)),
            )
            * F.col("value"),
            6,
        ).cast("decimal(28,10)"),
    )
    return (
        weighted.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("raw_sum"),
            F.round(F.sum("contrib"), 6).cast("double").alias("decayed_sum"),
        )
        .orderBy("user_id")
    )


DECAYED_VALUE_SQL = f"""
WITH now AS (SELECT MAX(epoch_ms(ts)) AS now_ms FROM events)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS raw_sum,
  CAST(ROUND(SUM(CAST(ROUND(
    pow(0.5, (now_ms - epoch_ms(ts)) / {float(DECAY_HALF_LIFE_MS)}) * value,
  6) AS DECIMAL(28,10))), 6) AS DOUBLE) AS decayed_sum
FROM events, now
GROUP BY user_id ORDER BY user_id
"""

QUERIES["decayed_user_value"] = (decayed_user_value, DECAYED_VALUE_SQL)


# ------------------------------------------- hourly anomaly detection

ANOM_TRAIL = 24   # trailing window (hours), current hour excluded
ANOM_MIN_N = 12   # need >= 12 trailing hours before judging
ANOM_TOPK = 20


def anomaly_hours(spark, sf_dir):
    """Event-rate anomaly detection (the monitoring query a 100 TB
    event pipeline runs continuously): per event_type hourly counts,
    a trailing-24h baseline (mean/variance over the PRECEDING hours
    only — RANGE frame on the integer hour index, so gaps in the
    timeline shrink the baseline instead of silently sliding it),
    z-score of each hour vs its own past, top-20 |z|.

    Determinism: baseline sums are exact integers (counts and squared
    counts), so mean/variance/z are identical doubles cross-engine —
    no decimal folding needed. Scale: one keyed aggregate to hourly
    grain (tiny vs raw events), one per-type RANGE window over that
    grain; never a window over raw events."""
    ev = load_tables(spark, sf_dir)["events"]
    hourly = (
        ev.select(
            "event_type",
            (F.unix_millis(F.col("ts")) / F.lit(3600000))
            .cast("bigint").alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rangeBetween(-ANOM_TRAIL, -1)
    )
    base = hourly.select(
        "event_type", "hr", "n",
        F.count(F.lit(1)).over(w).alias("c"),
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("sq"),
    )
    mean = F.col("s").cast("double") / F.col("c")
    var = F.col("sq").cast("double") / F.col("c") - mean * mean
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    return (
        base.filter(F.col("c") >= ANOM_MIN_N)
        .select(
            "event_type",
            (F.col("hr") * 3600000).alias("hour_ms"),
            "n",
            F.round(mean, 6).alias("baseline_mean"),
            F.when(var > 0, F.round(z, 6)).alias("z"),
        )
        .filter(F.col("z").isNotNull())
        .orderBy(F.desc(F.abs(F.col("z"))), "event_type", "hour_ms")
        .limit(ANOM_TOPK)
    )


ANOMALY_HOURS_SQL = f"""
WITH hourly AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS hr,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), base AS (
  SELECT event_type, hr, n,
    COUNT(*) OVER w AS c, SUM(n) OVER w AS s, SUM(n * n) OVER w AS sq
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hr
               RANGE BETWEEN {ANOM_TRAIL} PRECEDING AND 1 PRECEDING)
), scored AS (
  SELECT event_type, hr * 3600000 AS hour_ms, n,
    ROUND(CAST(s AS DOUBLE) / c, 6) AS baseline_mean,
    CASE WHEN CAST(sq AS DOUBLE) / c
              - (CAST(s AS DOUBLE) / c) * (CAST(s AS DOUBLE) / c) > 0
      THEN ROUND((CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / c)
        / sqrt(CAST(sq AS DOUBLE) / c
               - (CAST(s AS DOUBLE) / c) * (CAST(s AS DOUBLE) / c)), 6)
    END AS z
  FROM base WHERE c >= {ANOM_MIN_N}
)
SELECT event_type, hour_ms, n, baseline_mean, z FROM scored
WHERE z IS NOT NULL
ORDER BY abs(z) DESC, event_type, hour_ms LIMIT {ANOM_TOPK}
"""

QUERIES["anomaly_hours"] = (anomaly_hours, ANOMALY_HOURS_SQL)


# --------------------------------------- inter-arrival distribution

GAP_TOPK = 20


def interarrival_gaps(spark, sf_dir):
    """Per-user inter-arrival-time distribution (capacity planning /
    bot detection): millisecond gaps between a user's consecutive
    events, with exact discrete percentiles — p50/p90 picked by
    explicit rank formula rank == ceil(p·n) over the sorted gaps, NOT
    an engine quantile function, so both engines select the same
    integer by construction. Top-20 busiest users.

    Scale shape: one per-user window (lag) over events, one per-user
    rank window over the (much smaller) gap set, one aggregate —
    every stage keyed by user_id, exact integers end to end."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            (F.unix_millis(F.col("ts"))
             - F.unix_millis(F.lag("ts").over(w))).alias("gap_ms"),
            F.col("event_id"),
        )
        .filter(F.col("gap_ms").isNotNull())
    )
    rw = Window.partitionBy("user_id").orderBy("gap_ms", "event_id")
    ranked = gaps.select(
        "user_id", "gap_ms",
        F.row_number().over(rw).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
    )
    agg = (
        ranked.groupBy("user_id", "n")
        .agg(
            F.max(F.when(F.col("rk") == F.ceil(F.col("n") * 0.5),
                         F.col("gap_ms"))).alias("p50_gap_ms"),
            F.max(F.when(F.col("rk") == F.ceil(F.col("n") * 0.9),
                         F.col("gap_ms"))).alias("p90_gap_ms"),
            F.max("gap_ms").alias("max_gap_ms"),
        )
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_gaps"),
            "p50_gap_ms", "p90_gap_ms", "max_gap_ms",
        )
    )
    return agg.orderBy(F.desc("n_gaps"), "user_id").limit(GAP_TOPK)


INTERARRIVAL_SQL = f"""
WITH gaps AS (
  SELECT user_id, event_id,
    epoch_ms(ts) - lag(epoch_ms(ts)) OVER
      (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
  FROM events
), ranked AS (
  SELECT user_id, gap_ms,
    row_number() OVER (PARTITION BY user_id ORDER BY gap_ms, event_id)
      AS rk,
    COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM gaps WHERE gap_ms IS NOT NULL
)
SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
  MAX(CASE WHEN rk = CEIL(n * 0.5) THEN gap_ms END) AS p50_gap_ms,
  MAX(CASE WHEN rk = CEIL(n * 0.9) THEN gap_ms END) AS p90_gap_ms,
  MAX(gap_ms) AS max_gap_ms
FROM ranked GROUP BY user_id, n
ORDER BY n_gaps DESC, user_id LIMIT {GAP_TOPK}
"""

QUERIES["interarrival_gaps"] = (interarrival_gaps, INTERARRIVAL_SQL)

# --------------------------------------------- SCD2 dimension build

SCD2_USER_MOD = 5  # deterministic user subset keeps the output bounded


def scd2_intervals(spark, sf_dir):
    """Type-2 slowly-changing-dimension build from the event change
    log (the warehouse-side dual of temporal_replay's LWW compaction):
    collapse each user's consecutive runs of the same event_type into
    versioned validity intervals [valid_from, valid_to), valid_to = -1
    for the open current row. This is how a CDC stream becomes an
    as-of-joinable dimension table.

    Scale shape: two windows, both partitioned by user_id (the change
    detection lag and the interval lead) — every stage keyed, nothing
    global; exact epoch-ms integers end to end. At 100 TB the change
    log is the big side and this plan is one shuffle on the entity key
    followed by narrow window passes inside those partitions."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (
        ev.filter(F.col("user_id") % SCD2_USER_MOD == 0)
        .select(
            "user_id", "event_type", "event_id",
            F.unix_millis(F.col("ts")).alias("ts_ms"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    return (
        runs.select(
            "user_id",
            F.row_number().over(w2).alias("version"),
            "event_type",
            F.col("ts_ms").alias("valid_from_ms"),
            F.coalesce(
                F.lead("ts_ms").over(w2), F.lit(-1).cast("bigint")
            ).alias("valid_to_ms"),
        )
        .withColumn(
            "is_current",
            F.when(F.col("valid_to_ms") == -1, F.lit(1))
            .otherwise(F.lit(0)).cast("bigint"),
        )
        .orderBy("user_id", "version")
    )


SCD2_SQL = f"""
WITH runs AS (
  SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms,
    lag(event_type) OVER
      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events WHERE user_id % {SCD2_USER_MOD} = 0
), changes AS (
  SELECT user_id, event_type, event_id, ts_ms FROM runs
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id,
  CAST(row_number() OVER
    (PARTITION BY user_id ORDER BY ts_ms, event_id) AS INT) AS version,
  event_type,
  ts_ms AS valid_from_ms,
  COALESCE(lead(ts_ms) OVER
    (PARTITION BY user_id ORDER BY ts_ms, event_id),
    CAST(-1 AS BIGINT)) AS valid_to_ms,
  CAST(CASE WHEN lead(ts_ms) OVER
    (PARTITION BY user_id ORDER BY ts_ms, event_id) IS NULL
    THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM changes
ORDER BY user_id, version
"""

QUERIES["scd2_intervals"] = (scd2_intervals, SCD2_SQL)


# -------------------------------------- gap-fill / resample + LOCF

HOUR_MS = 3600000


def gapfill_locf(spark, sf_dir):
    """Time-series resample: hourly event counts per event_type over a
    dense generated hour spine (missing hours become explicit zero
    rows), plus last-observation-carried-forward of the hourly value
    sum — the standard gap-fill before feeding a forecasting model.

    Scale shape: the spine is sequence()-exploded from ONE scalar
    min/max row crossed with the (tiny) distinct type set — never
    collected to the driver; the fill join is keyed (type, hour) and
    AQE broadcasts the spine side when small; the LOCF window is
    partitioned per event_type, so no global single-partition sort.
    Decimal sums keep the carried value bit-identical cross-engine."""
    ev = load_tables(spark, sf_dir)["events"]
    hourly = (
        ev.groupBy(
            "event_type",
            (F.floor(F.unix_millis(F.col("ts")) / HOUR_MS)
             * HOUR_MS).cast("bigint").alias("hour_ms"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double").alias("value_sum"),
        )
    )
    bounds = ev.agg(
        (F.floor(F.min(F.unix_millis(F.col("ts"))) / HOUR_MS)
         * HOUR_MS).cast("bigint").alias("lo"),
        (F.floor(F.max(F.unix_millis(F.col("ts"))) / HOUR_MS)
         * HOUR_MS).cast("bigint").alias("hi"),
    )
    spine_h = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(HOUR_MS))
        ).alias("hour_ms")
    )
    spine = ev.select("event_type").distinct().crossJoin(spine_h)
    w = Window.partitionBy("event_type").orderBy("hour_ms")
    return (
        spine.join(hourly, ["event_type", "hour_ms"], "left")
        .select(
            "event_type", "hour_ms",
            F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n"),
            F.last("value_sum", ignorenulls=True).over(w)
            .alias("locf_value"),
        )
        .orderBy("event_type", "hour_ms")
    )


GAPFILL_SQL = f"""
WITH hourly AS (
  SELECT event_type,
    CAST((epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} AS BIGINT) AS hour_ms,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
      AS value_sum
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT CAST((epoch_ms(MIN(ts)) // {HOUR_MS}) * {HOUR_MS} AS BIGINT) AS lo,
         CAST((epoch_ms(MAX(ts)) // {HOUR_MS}) * {HOUR_MS} AS BIGINT) AS hi
  FROM events
), spine AS (
  SELECT t.event_type, CAST(h.h AS BIGINT) AS hour_ms
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT UNNEST(generate_series(lo, hi, {HOUR_MS})) AS h FROM bounds
  ) h
)
SELECT s.event_type, s.hour_ms,
  CAST(COALESCE(hourly.n, 0) AS BIGINT) AS n,
  last_value(hourly.value_sum IGNORE NULLS) OVER
    (PARTITION BY s.event_type ORDER BY s.hour_ms
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
FROM spine s LEFT JOIN hourly
  ON s.event_type = hourly.event_type AND s.hour_ms = hourly.hour_ms
ORDER BY s.event_type, s.hour_ms
"""

QUERIES["gapfill_locf"] = (gapfill_locf, GAPFILL_SQL)
