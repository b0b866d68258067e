"""Temporal operator tests (reference graph_evolution semantics,
FIXTURES.md F4)."""

import datetime as dt

from pyspark.sql import functions as F

from graphdb_spark.operators.temporal import ChangeLog, TimeWindow, as_of_edges


def ts(s):
    return dt.datetime.fromisoformat(s)


def make_log(spark):
    rows = [
        (ts("2024-01-01 10:00:00"), "node", "n1", None, None, {"v": "1"}, "upsert"),
        (ts("2024-01-01 11:00:00"), "node", "n2", None, None, {"v": "1"}, "upsert"),
        (ts("2024-01-01 12:00:00"), "node", "n1", None, None, {"v": "2"}, "upsert"),
        (ts("2024-01-01 13:00:00"), "edge", "e1", "n1", "n2", {}, "upsert"),
        (ts("2024-01-01 14:00:00"), "node", "n2", None, None, None, "delete"),
    ]
    return ChangeLog.from_rows(spark, rows)


def test_replay_midpoint(spark):
    """replay(T) keeps latest state per entity at T
    (change_tracker.rs:28-44)."""
    log = make_log(spark)
    nodes, edges = log.replay("2024-01-01 12:30:00")
    got = {r["id"]: r["properties"]["v"] for r in nodes.collect()}
    assert got == {"n1": "2", "n2": "1"}  # n1 updated, n2 alive
    assert edges.count() == 0  # edge created later


def test_replay_after_delete(spark):
    log = make_log(spark)
    nodes, edges = log.replay("2024-01-01 15:00:00")
    assert {r["id"] for r in nodes.collect()} == {"n1"}  # n2 deleted
    assert {r["id"] for r in edges.collect()} == {"e1"}


def test_replay_before_everything(spark):
    nodes, edges = make_log(spark).replay("2023-12-31 00:00:00")
    assert nodes.count() == 0 and edges.count() == 0


def test_time_window(spark):
    """TimeWindow.contains (time_window.rs:4-17): [start, end)."""
    log = make_log(spark)
    w = TimeWindow("2024-01-01 11:00:00", "2024-01-01 13:00:00")
    inside = log.between(w)
    assert inside.count() == 2  # 11:00 node, 12:00 node; 13:00 excluded


def test_as_of_edges(spark):
    rows = [
        ("a", "b", ts("2024-01-01 00:00:00"), ts("2024-06-01 00:00:00")),
        ("b", "c", ts("2024-03-01 00:00:00"), None),
        ("c", "d", ts("2024-05-01 00:00:00"), ts("2024-05-02 00:00:00")),
    ]
    e = spark.createDataFrame(
        rows, "src string, dst string, start_time timestamp, end_time timestamp"
    )
    got = {
        (r["src"], r["dst"])
        for r in as_of_edges(e, "2024-04-01 00:00:00").collect()
    }
    assert got == {("a", "b"), ("b", "c")}


class TestRangeJoin:
    def _pair(self, spark):
        from graphdb_spark.datamodel import local_df

        points = local_df(
            spark,
            [(1, 100, 1.0), (1, 250, 2.0), (1, 999, 4.0), (2, 100, 8.0)],
            "user_id bigint, ts_ms bigint, v double",
        )
        intervals = local_df(
            spark,
            [(1, 100, 300, "w1"), (1, 400, 500, "w2"), (2, 0, 50, "w3")],
            "user_id bigint, start_ms bigint, end_ms bigint, win string",
        )
        return points, intervals

    def test_containment_exact(self, spark):
        from graphdb_spark.operators.temporal import range_join

        p, i = self._pair(spark)
        got = {
            (r.win, r.ts_ms)
            for r in range_join(p, i, keys=("user_id",), bin_width_ms=100).collect()
        }
        # w1=[100,300): contains 100 and 250; end exclusive; w2 empty;
        # w3 is user 2 but its point (ts 100) is outside [0,50)
        assert got == {("w1", 100), ("w1", 250)}

    def test_no_duplicate_pairs_across_bins(self, spark):
        # interval spans many bins; each qualifying point must appear once
        from graphdb_spark.datamodel import local_df
        from graphdb_spark.operators.temporal import range_join

        p = local_df(spark, [(1, 555, 1.0)], "k bigint, ts_ms bigint, v double")
        i = local_df(
            spark, [(1, 0, 10_000, "big")],
            "k bigint, start_ms bigint, end_ms bigint, win string",
        )
        rows = range_join(p, i, keys=("k",), bin_width_ms=10).collect()
        assert len(rows) == 1

    def test_plans_hash_join_not_nested_loop(self, spark):
        from graphdb_spark.operators.temporal import range_join

        p, i = self._pair(spark)
        plan = (
            range_join(p, i, keys=("user_id",), bin_width_ms=100)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestTimeBucketRollup:
    def _events(self, spark):
        from graphdb_spark.datamodel import local_df

        rows = [
            # (id, ts, type, value) — two hours of one day + one next-day
            (1, "2024-03-01 10:05:00", "a", 5.0),
            (2, "2024-03-01 10:45:00", "a", 1.0),
            (3, "2024-03-01 11:15:00", "a", 9.0),
            (4, "2024-03-01 11:20:00", "a", 2.0),
            (5, "2024-03-02 00:01:00", "a", 7.0),
            (6, "2024-03-01 10:30:00", "b", 3.0),
        ]
        df = local_df(
            spark, rows, "event_id bigint, ts_s string, event_type string, value double"
        )
        from pyspark.sql import functions as F

        return df.withColumn("ts", F.col("ts_s").cast("timestamp")).withColumn(
            "ord",
            F.concat(
                F.lpad(F.unix_millis(F.col("ts")).cast("string"), 13, "0"),
                F.lit("_"),
                F.lpad(F.col("event_id").cast("string"), 12, "0"),
            ),
        )

    def test_hourly_gauges(self, spark):
        from graphdb_spark.operators.temporal import time_bucket_rollup

        hourly = time_bucket_rollup(
            self._events(spark), "ts", ["event_type"], "value",
            bucket="hour", order_col="ord",
        )
        row = {
            (str(r.bucket), r.event_type): r for r in hourly.collect()
        }[("2024-03-01 10:00:00", "a")]
        assert (row.n, float(row.value_sum)) == (2, 6.0)
        assert (row.low, row.high, row.open, row.close) == (1.0, 5.0, 5.0, 1.0)

    def test_daily_merge_equals_direct_daily(self, spark):
        """The hierarchy must be lossless: daily-from-hourly ==
        daily-from-raw, gauge for gauge (open/close included)."""
        from graphdb_spark.operators.temporal import (
            rollup_merge,
            time_bucket_rollup,
        )

        ev = self._events(spark)
        hourly = time_bucket_rollup(
            ev, "ts", ["event_type"], "value", bucket="hour", order_col="ord"
        )
        via_hourly = rollup_merge(hourly, ["event_type"], bucket="day")
        direct = time_bucket_rollup(
            ev, "ts", ["event_type"], "value", bucket="day", order_col="ord"
        )
        key = lambda r: (str(r.bucket), r.event_type)  # noqa: E731
        a = {key(r): (r.n, float(r.value_sum), r.low, r.high, r.open, r.close)
             for r in via_hourly.collect()}
        b = {key(r): (r.n, float(r.value_sum), r.low, r.high, r.open, r.close)
             for r in direct.collect()}
        assert a == b
        assert a[("2024-03-01 00:00:00", "a")] == (4, 17.0, 1.0, 9.0, 5.0, 2.0)


class TestTemporalDiff:
    def test_classification(self, spark, monkeypatch):
        from graphdb_spark.workloads import temporal as WT

        rows = [
            # cuts: T1 = 2024-01-15 00:00, T2 = 2024-01-15 06:00
            # user 1: changed between cuts (new LWW winner after T1)
            (1, "2024-01-10 00:00:00", 1, "view", 10.0),
            (2, "2024-01-15 03:00:00", 1, "click", 25.0),
            # user 2: unchanged (nothing between the cuts)
            (3, "2024-01-12 00:00:00", 2, "view", 5.0),
            # user 3: added (first event inside (T1, T2])
            (4, "2024-01-15 02:00:00", 3, "signup", 7.0),
            # user 4: outside both cuts — must not appear at all
            (5, "2024-01-25 00:00:00", 4, "view", 99.0),
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id bigint, ts_s string, user_id bigint, "
            "event_type string, value double",
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        monkeypatch.setattr(WT, "load_tables", lambda s, d: {"events": ev})
        got = {r["change"]: (r["n"], r["value_delta"])
               for r in WT.temporal_diff(spark, "ignored").collect()}
        assert got == {
            "changed": (1, 15.0),    # 25 - 10
            "unchanged": (1, 0.0),
            "added": (1, 7.0),
        }


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts_s string, user_id bigint, "
        "event_type string, value double",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")


class TestFunnel:
    def test_step_windows_enforced(self, spark, monkeypatch):
        from graphdb_spark.workloads import temporal as WT

        rows = [
            # user 1: full funnel inside the 12 h windows
            (1, "2024-01-02 08:00:00", 1, "view", 0.0),
            (2, "2024-01-02 10:00:00", 1, "click", 0.0),
            (3, "2024-01-02 15:00:00", 1, "purchase", 0.0),
            # user 2: click too late (>12 h after first view)
            (4, "2024-01-02 08:00:00", 2, "view", 0.0),
            (5, "2024-01-03 08:00:01", 2, "click", 0.0),
            # user 3: click in window, purchase BEFORE the click
            (6, "2024-01-02 08:00:00", 3, "view", 0.0),
            (7, "2024-01-02 09:00:00", 3, "click", 0.0),
            (8, "2024-01-02 08:30:00", 3, "purchase", 0.0),
        ]
        monkeypatch.setattr(
            WT, "load_tables", lambda s, d: {"events": _events_df(spark, rows)}
        )
        got = {r["stage"]: r["users"]
               for r in WT.funnel_conversion(spark, "x").collect()}
        assert got == {"1_view": 3, "2_click": 2, "3_purchase": 1}


class TestCohortRetention:
    def test_offsets_and_cohorts(self, spark, monkeypatch):
        from graphdb_spark.workloads import temporal as WT

        rows = [
            # user 1: signs up week of Jan 1, active weeks 0 and 2
            (1, "2024-01-02 00:00:00", 1, "signup", 0.0),
            (2, "2024-01-16 00:00:00", 1, "view", 0.0),
            # user 2: signs up week of Jan 8, active weeks 0 and 1
            (3, "2024-01-09 00:00:00", 2, "signup", 0.0),
            (4, "2024-01-15 00:00:00", 2, "click", 0.0),
            # user 3: never signs up — excluded entirely
            (5, "2024-01-03 00:00:00", 3, "view", 0.0),
        ]
        monkeypatch.setattr(
            WT, "load_tables", lambda s, d: {"events": _events_df(spark, rows)}
        )
        got = {(r["cohort_week"], r["week_offset"]): r["active_users"]
               for r in WT.cohort_retention(spark, "x").collect()}
        assert got == {
            ("2024-01-01", 0): 1, ("2024-01-01", 2): 1,
            ("2024-01-08", 0): 1, ("2024-01-08", 1): 1,
        }


class TestRangeJoinInvalidIntervals:
    def test_reversed_interval_yields_no_bins(self, spark):
        """ADVICE r3: a corrupt interval (end <= start) must produce
        ZERO bins (zero work), not a descending F.sequence fan-out."""
        from graphdb_spark.datamodel import local_df
        from graphdb_spark.operators.temporal import range_join

        p = local_df(spark, [(1, 100, 1.0)], "k bigint, ts_ms bigint, v double")
        i = local_df(
            spark,
            # reversed by ~1e9 ms: naive sequence would explode ~1e5
            # descending bins; the guard must drop the row pre-explode
            [(1, 1_000_000_000, 0, "bad"), (1, 50, 200, "good")],
            "k bigint, start_ms bigint, end_ms bigint, win string",
        )
        rows = range_join(p, i, keys=("k",), bin_width_ms=10_000).collect()
        assert [r["win"] for r in rows] == ["good"]


def test_anomaly_hours_invariants(spark):
    """Anomalies sorted by |z| desc; baselines need >= 12 trailing
    hours so every mean is positive; z is finite."""
    import math

    from graphdb_spark.workloads.temporal import anomaly_hours

    rows = anomaly_hours(spark, "/root/testdata/sf0.001").collect()
    assert rows
    zs = [abs(r["z"]) for r in rows]
    assert zs == sorted(zs, reverse=True)
    for r in rows:
        assert r["baseline_mean"] > 0
        assert math.isfinite(r["z"])
        assert r["n"] >= 0


def test_interarrival_percentile_ordering(spark):
    """p50 <= p90 <= max for every user; gaps are non-negative."""
    from graphdb_spark.workloads.temporal import interarrival_gaps

    rows = interarrival_gaps(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r["p50_gap_ms"] <= r["p90_gap_ms"] <= r["max_gap_ms"]
        assert r["n_gaps"] >= 1


class TestScd2Intervals:
    def test_intervals_contiguous_and_single_current(self, spark):
        """Per user: version k's valid_to == version k+1's valid_from
        (half-open chain with no gaps), exactly one open interval, no
        two consecutive versions share an event_type."""
        from graphdb_spark.workloads.temporal import scd2_intervals

        rows = scd2_intervals(spark, "/root/testdata/sf0.001").collect()
        assert rows
        by_user = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(r)
        for uid, ivs in by_user.items():
            ivs.sort(key=lambda r: r["version"])
            assert [r["version"] for r in ivs] == list(range(1, len(ivs) + 1))
            assert sum(r["is_current"] for r in ivs) == 1
            assert ivs[-1]["valid_to_ms"] == -1 and ivs[-1]["is_current"] == 1
            for a, b in zip(ivs, ivs[1:]):
                assert a["valid_to_ms"] == b["valid_from_ms"]
                assert a["event_type"] != b["event_type"]
                assert a["valid_from_ms"] < a["valid_to_ms"]


class TestGapfillLocf:
    def test_dense_spine_and_carry_forward(self, spark):
        """Output is a DENSE (type x hour) grid; zero-filled hours have
        n=0; locf_value is non-null from each type's first observed
        hour onward and only changes on observed hours."""
        from graphdb_spark.workloads.temporal import gapfill_locf

        rows = gapfill_locf(spark, "/root/testdata/sf0.001").collect()
        assert rows
        by_type = {}
        for r in rows:
            by_type.setdefault(r["event_type"], []).append(r)
        n_hours = {t: len(v) for t, v in by_type.items()}
        assert len(set(n_hours.values())) == 1  # same spine for all
        for t, hs in by_type.items():
            hs.sort(key=lambda r: r["hour_ms"])
            for a, b in zip(hs, hs[1:]):
                assert b["hour_ms"] - a["hour_ms"] == 3600000  # dense
            seen = False
            last = None
            for r in hs:
                if r["n"] > 0:
                    seen = True
                    last = r["locf_value"]
                    assert last is not None
                elif seen:
                    assert r["locf_value"] == last  # carried forward
                else:
                    assert r["locf_value"] is None  # before first obs
