"""Piecewise profile of tfidf_cosine_pairs at sf0.1: time each stage
of the pipeline in isolation (noop sink) to find where the ~2.4-3 s
goes, then A/B candidate variants interleaved in one session.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graphdb_spark.session import build_spark
from graphdb_spark.operators import text as T
from graphdb_spark.workloads.text import _docs, TFIDF_DF_MIN, TFIDF_DF_MAX


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(label, thunk, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        thunk()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"# {label}: {best:.3f}s", file=sys.stderr)
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_spark("tfidf_explore", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    d = _docs(spark, sf_dir, spread=True)
    noop(d)  # warm page cache
    n_part = max(spark.sparkContext.defaultParallelism, 8)

    # stage 1: tokenize + shingle + explode + hash (map-side only)
    occ = (
        d.select("doc_id", T.tokens(F.lower(F.col("text"))).alias("__toks"))
        .select(
            "doc_id",
            F.explode(
                T.shingles_from_tokens(F.col("__toks"), distinct=False)
            ).alias("s"),
        )
        .select("doc_id", F.xxhash64(F.col("s")).alias("h"))
    )
    timeit("occurrences (map only)", lambda: noop(occ))

    # stage 2: + pinned repartition + tf agg
    tf = (occ.repartition(n_part, "doc_id", "h")
          .groupBy("doc_id", "h")
          .agg(F.count(F.lit(1)).cast("bigint").alias("tf")))
    timeit("tf agg (pinned repart)", lambda: noop(tf))

    # stage 2b: tf agg with NO explicit repartition (AQE decides)
    tf_nat = occ.groupBy("doc_id", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"))
    timeit("tf agg (natural groupBy)", lambda: noop(tf_nat))

    # stage 3: full query as shipped
    from graphdb_spark.workloads.text import tfidf_cosine_pairs
    timeit("full query (shipped)", lambda: noop(tfidf_cosine_pairs(spark, sf_dir)))

    spark.stop()


if __name__ == "__main__":
    main()
