"""A/B: stream_suite constituents with the session's 32 shuffle
partitions (32 state-store instances per stateful op per batch) vs a
scoped smaller width. Fresh checkpoints per run, so the width is free
to change per invocation."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphdb_spark.session import build_spark
from graphdb_spark.workloads import stream_views as SV


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("ROUNDS", "3"))
    spark = build_spark("stream_ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    names = ["stream_windowed_counts", "stream_dedup_counts",
             "stream_session_agg"]
    fns = {n: SV.QUERIES[n][0] for n in names if n in SV.QUERIES}
    print(f"# constituents: {list(fns)}", file=sys.stderr)

    key = "spark.sql.shuffle.partitions"
    best = {}
    for r in range(rounds):
        for width in (32, 8, 4):
            orig = spark.conf.get(key)
            spark.conf.set(key, str(width))
            try:
                for n, fn in fns.items():
                    t0 = time.perf_counter()
                    noop(fn(spark, sf_dir))
                    dt = time.perf_counter() - t0
                    k = (n, width)
                    if k not in best or dt < best[k]:
                        best[k] = dt
            finally:
                spark.conf.set(key, orig)
    for (n, w), t in sorted(best.items()):
        print(f"# {n} width={w}: {t:.3f}s", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
