"""Time every gate entry (the packed 50) at a given SF with the noop
sink, best-of-N — a coverage sweep to catch slow NON-headliner
operators the bench doesn't time."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(os.environ.get("RUNS", "3"))
    from graphdb_spark.session import build_spark
    from graphdb_spark import workloads

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_spark("gate_sweep", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    import glob
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass
    from graphdb_spark.workloads.graph import graph_session
    g = graph_session(spark, sf_dir)
    g.vertex_count(), g.edge_count()

    out = {}
    for name, fn in workloads.all_queries().items():
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        try:
            best = None
            for _ in range(runs):
                t0 = time.perf_counter()
                noop(fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 3)
            print(f"# {name}: {best:.3f}s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            out[name] = None
            print(f"# {name}: FAILED {exc}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": out,
                      "total": round(sum(v for v in out.values() if v), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
