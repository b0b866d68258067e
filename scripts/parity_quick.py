"""Quick parity check for a subset of queries: Spark vs DuckDB oracle.

Usage: python scripts/parity_quick.py [sf_dir] [query ...]
Defaults: sf0.001, all gate entries whose name is given, else all.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v + 0.0)
    if isinstance(v, int):
        return repr(int(v))
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return repr(v)


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    from graphdb_spark.session import build_spark
    from graphdb_spark import workloads

    gate_q = workloads.all_queries()
    gate_o = workloads.all_oracles()
    unp_q = workloads.all_unpacked_queries()
    unp_o = workloads.all_unpacked_oracles()
    todo = names or list(gate_q)

    spark = build_spark("parity_quick")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name in todo:
        fn = gate_q.get(name) or unp_q.get(name)
        sql = gate_o.get(name) or unp_o.get(name)
        if fn is None:
            print(f"{name}: UNKNOWN")
            failures += 1
            continue
        try:
            sp = fn(spark, sf_dir).toPandas()
            dp = con.sql(sql).df() if sql else None
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        if dp is None:
            print(f"{name}: rows={len(sp)} (no oracle)")
            continue
        cols = sorted(sp.columns)
        if cols != sorted(dp.columns):
            print(f"{name}: SCHEMA spark={cols} duck={sorted(dp.columns)}")
            failures += 1
            continue
        srows = sorted(
            tuple(canon(v) for v in r) for r in sp[cols].itertuples(index=False)
        )
        drows = sorted(
            tuple(canon(v) for v in r) for r in dp[cols].itertuples(index=False)
        )
        if srows != drows:
            only_s = [r for r in srows if r not in drows][:2]
            only_d = [r for r in drows if r not in srows][:2]
            print(
                f"{name}: MISMATCH rows s={len(srows)} d={len(drows)} "
                f"only_spark={only_s} only_duck={only_d}"
            )
            failures += 1
        else:
            print(f"{name}: OK rows={len(srows)}")
    print(f"done, {failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
