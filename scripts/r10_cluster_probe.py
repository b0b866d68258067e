"""Probe dedup_cluster_canonical: wall (noop, best-of-N) + Spark job
count per execution (statusTracker over a unique job group) — used for
the r10 label-count-elimination A/B, driven alternately against the
pre-change tree via git stash.

Usage: python scripts/r10_cluster_probe.py [sf_dir] [runs]
Prints one JSON line {"min": s, "runs": [...], "jobs": n}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from graphdb_spark.session import build_spark
    from graphdb_spark.workloads.text import dedup_cluster_canonical

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_spark("cluster_probe", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    import glob
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    def one(tag: str) -> float:
        spark.sparkContext.setJobGroup(tag, tag)
        t0 = time.perf_counter()
        df = dedup_cluster_canonical(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobGroup(None, None)
        return dt

    one("warm")  # signature cache + JIT
    times = [one(f"run{i}") for i in range(runs)]
    tracker = spark.sparkContext.statusTracker()
    jobs = len(tracker.getJobIdsForGroup("run0"))
    print(json.dumps({"min": round(min(times), 3),
                      "runs": [round(t, 3) for t in times],
                      "jobs": jobs}))
    spark.stop()


if __name__ == "__main__":
    main()
