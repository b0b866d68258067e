"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet, compare row count, column names, and values
(order-insensitive, exact)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as m

    return m


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(val):
    if val is None:
        return "\x00NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        # collapse -0.0 and represent with full precision
        return repr(val + 0.0)
    if isinstance(val, (int,)):
        return repr(int(val))
    import datetime
    import decimal

    if isinstance(val, decimal.Decimal):
        return repr(float(val))
    if isinstance(val, datetime.datetime):
        return val.isoformat()
    if isinstance(val, datetime.date):
        return val.isoformat()
    return repr(val)


def _rows(df_pandas, cols):
    out = []
    for row in df_pandas[cols].itertuples(index=False):
        out.append(tuple(_canon(v) for v in row))
    return sorted(out)


def compare(spark_df, duck_rel) -> list[str]:
    problems = []
    sp = spark_df.toPandas()
    dp = duck_rel.df()
    scols, dcols = sorted(sp.columns), sorted(dp.columns)
    if scols != dcols:
        return [f"schema mismatch: spark={scols} duck={dcols}"]
    if len(sp) != len(dp):
        problems.append(f"row count: spark={len(sp)} duck={len(dp)}")
    srows, drows = _rows(sp, scols), _rows(dp, scols)
    if srows != drows:
        diff_s = [r for r in srows if r not in drows][:3]
        diff_d = [r for r in drows if r not in srows][:3]
        problems.append(
            f"values differ; spark-only={diff_s} duck-only={diff_d}"
        )
    return problems


def test_all_queries_match_oracle(spark, entry_mod, duck):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "no queries registered"
    failures = {}
    for name, fn in qs.items():
        sql = oracles.get(name)
        if sql is None:
            # rows-only check (non-SQL-expressible ops)
            n = fn(spark, SF_DIR).count()
            assert n >= 0
            continue
        try:
            sdf = fn(spark, SF_DIR)
            rel = duck.sql(sql)
            problems = compare(sdf, rel)
        except Exception as e:  # noqa: BLE001
            problems = [f"exception: {type(e).__name__}: {e}"]
        if problems:
            failures[name] = problems
    assert not failures, "\n".join(
        f"{k}: {v}" for k, v in failures.items()
    )


def test_all_unpacked_queries_match_oracle(spark, duck):
    """Every individual workload query (including suite constituents)
    against its own oracle — friendlier diffs than the packed gate."""
    from graphdb_spark import workloads

    qs = workloads.all_unpacked_queries()
    oracles = workloads.all_unpacked_oracles()
    assert len(qs) >= 76
    failures = {}
    for name, fn in qs.items():
        sql = oracles.get(name)
        if sql is None:
            assert fn(spark, SF_DIR).count() >= 0
            continue
        try:
            problems = compare(fn(spark, SF_DIR), duck.sql(sql))
        except Exception as e:  # noqa: BLE001
            problems = [f"exception: {type(e).__name__}: {e}"]
        if problems:
            failures[name] = problems
    assert not failures, "\n".join(
        f"{k}: {v}" for k, v in failures.items()
    )


def test_gate_covers_every_query_within_cap(entry_mod):
    """The driver gate evaluates ≤50 entries; every individual query
    must be verified by exactly one gate entry (itself or a suite)."""
    from graphdb_spark import workloads
    from graphdb_spark.workloads.gate import CONSTITUENTS

    gate = entry_mod.queries()
    assert len(gate) <= 50
    covered = [t for tags in CONSTITUENTS.values() for t in tags]
    assert sorted(covered) == sorted(set(covered)), "double-covered tag"
    missing = set(workloads.all_unpacked_queries()) - set(covered)
    assert not missing, f"queries not covered by any gate entry: {missing}"
    # every gate entry is oracle-backed — no rows-only rows left
    oracles = entry_mod.oracle_sql()
    assert set(gate) == set(oracles), (
        f"gate entries without oracle: {set(gate) - set(oracles)}"
    )


def test_entry_smoke(spark, entry_mod):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["id"]
