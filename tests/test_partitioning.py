"""Partitioning/skew utilities: correctness of salted joins, bucket
tables actually eliminating exchanges, degree diagnostics."""

import pytest

from pyspark.sql import functions as F

from graphdb_spark import partitioning as PT


@pytest.fixture()
def skewed(spark):
    # one hot key (k0 x 500) + uniform tail
    rows = [("k0", i) for i in range(500)] + [
        (f"k{i}", i) for i in range(1, 101)
    ]
    big = spark.createDataFrame(rows, "key string, payload int")
    small = spark.createDataFrame(
        [(f"k{i}", f"dim{i}") for i in range(0, 101)], "key string, dim string"
    )
    return big, small


def test_salted_join_matches_plain_join(skewed):
    big, small = skewed
    plain = big.join(small, "key").select("key", "payload", "dim")
    salted = PT.salted_join(big, small, "key", salt=4).select(
        "key", "payload", "dim"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_join(skewed):
    big, small = skewed
    big2 = big.unionByName(
        big.sparkSession.createDataFrame([("orphan", 1)], "key string, payload int")
    )
    plain = big2.join(small, "key", "left").select("key", "payload", "dim")
    salted = PT.salted_join(big2, small, "key", salt=4, how="left").select(
        "key", "payload", "dim"
    )
    assert sorted(map(tuple, plain.collect()), key=str) == sorted(
        map(tuple, salted.collect()), key=str
    )


def test_degree_stats_and_hot_keys(spark):
    edges = spark.createDataFrame(
        [("hub", "E", f"v{i}", {}) for i in range(50)]
        + [("a", "E", "b", {}), ("b", "E", "c", {})],
        "src string, relationship string, dst string, properties map<string,string>",
    )
    stats = PT.degree_stats(edges)
    assert stats["n_keys"] == 3
    assert stats["max_degree"] == 50
    assert stats["skew_ratio"] > 2
    hot = PT.hot_keys(edges, threshold=10).collect()
    assert [r["src"] for r in hot] == ["hub"]


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Bucketed tables joined on the bucket key must not shuffle —
    the co-located-join layout for the 100 TB edges table."""
    a = spark.range(0, 1000).withColumn("k", F.col("id") % 100)
    b = spark.range(0, 100).withColumn("k", F.col("id")).withColumn(
        "dim", F.col("id") * 2
    )
    PT.write_bucketed(a, "t_bucketed_a", "k", buckets=8)
    PT.write_bucketed(b.select("k", "dim"), "t_bucketed_b", "k", buckets=8)
    ta = PT.read_bucketed(spark, "t_bucketed_a")
    tb = PT.read_bucketed(spark, "t_bucketed_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert joined.count() == 1000
        # bucket join: no Exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_b")


def test_repartition_by_key(spark):
    df = spark.range(0, 10000).withColumn("k", F.col("id") % 7)
    out = PT.repartition_by_key(df, "k", target_rows_per_partition=100)
    assert out.count() == 10000
    assert out.rdd.getNumPartitions() >= 4


def test_skew_salted_hop_plan_and_results(spark):
    """VERDICT r1 item 7: with enable_skew_salting, a pipe hop over a
    super-node graph splits hot keys onto a broadcast semi-join while
    the cold tail keeps the shuffle join — and results are identical
    to the unsalted hop."""
    from graphdb_spark.algebra import Q
    from graphdb_spark.session import GraphSession

    hub_edges = [("hub", "E", f"t{i}") for i in range(5000)]
    tail_edges = [(f"s{i}", "E", f"t{i % 50}") for i in range(200)]
    e = spark.createDataFrame(
        [(s, r, d, {}) for s, r, d in hub_edges + tail_edges],
        "src string, relationship string, dst string, properties map<string,string>",
    )
    ids = {x for s, _r, d in hub_edges + tail_edges for x in (s, d)}
    v = spark.createDataFrame(
        [(i, "N", {}) for i in sorted(ids)],
        "id string, label string, properties map<string,string>",
    )
    g = GraphSession(spark, v, e)
    q = Q.vertices().outbound().inbound().count()
    plain = g.get(q)[-1].count

    g.enable_skew_salting(threshold=1000)
    assert set(getattr(g, "_hot_endpoints", {})) == {"src"}
    salted = g.get(q)[-1].count
    assert salted == plain

    hop_df = g.df(Q.vertices().outbound())
    plan = hop_df._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_partitioned_write_prunes_directories(spark, tmp_path):
    """A filter on the partition column must land in the scan's
    PartitionFilters (directory pruning before IO), and the partition
    column round-trips its values."""
    from pyspark.sql import functions as F

    from graphdb_spark.partitioning import read_partitioned, write_partitioned
    from graphdb_spark.sources.tpch import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.001")["events"]
    path = str(tmp_path / "ev_part")
    write_partitioned(ev, path, "event_type")

    back = read_partitioned(spark, path)
    one_type = ev.select("event_type").first()[0]
    q = back.filter(F.col("event_type") == one_type)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert f"event_type = {one_type}" in plan or "isnotnull(event_type" in plan
    want = ev.filter(F.col("event_type") == one_type).count()
    assert q.count() == want
