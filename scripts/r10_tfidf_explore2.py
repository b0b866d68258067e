"""Pair-stage deep dive for tfidf_cosine_pairs: how many candidate
pairs exist at sf0.1, and what the pair exchange + aggregate cost,
vs a packed-single-long pair key variant (adamic trick)."""

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
    spark = build_spark("tfidf_explore2", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    d = _docs(spark, sf_dir, spread=True)
    noop(d)
    n_part = max(spark.sparkContext.defaultParallelism, 8)

    n_row = d.agg(F.count(F.lit(1)).alias("__n"))
    tf = (
        d.select("doc_id", T.tokens(F.lower(F.col("text"))).alias("__toks"))
        .select("doc_id", F.explode(
            T.shingles_from_tokens(F.col("__toks"), distinct=False)).alias("s"))
        .select("doc_id", F.xxhash64(F.col("s")).alias("h"))
        .repartition(n_part, "doc_id", "h")
        .groupBy("doc_id", "h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    tfh = tf.repartition(n_part, "h")
    df_tab = (
        tfh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df").between(TFIDF_DF_MIN, TFIDF_DF_MAX))
        .crossJoin(F.broadcast(n_row))
        .select("h", F.log((F.col("__n") + 1).cast("double")
                           / (F.col("df") + 1).cast("double")).alias("idf"))
    )
    post = tfh.join(F.broadcast(df_tab), "h").select(
        "h", "doc_id", (F.col("tf") * F.col("idf")).alias("w"))
    post = post.localCheckpoint(eager=False)
    print(f"# posting rows: {post.count()}", file=sys.stderr)

    a, b = post.alias("a"), post.hint("shuffle_hash").alias("b")
    raw_pairs = a.join(b, (F.col("a.h") == F.col("b.h"))
                       & (F.col("a.doc_id") < F.col("b.doc_id")))
    print(f"# raw pair rows: {raw_pairs.count()}", file=sys.stderr)

    pairs = (raw_pairs.select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
        F.round(F.col("a.w") * F.col("b.w"), 6)
        .cast("decimal(18,6)").alias("ww"))
        .repartition(n_part, "doc_a", "doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"),
             F.sum("ww").cast("double").alias("dot")))
    t_pair = timeit("pair join+exchange+agg (shipped shape)", lambda: noop(pairs))
    print(f"# distinct pairs: {pairs.count()}", file=sys.stderr)

    # variant: packed single-long pair key
    packed = (raw_pairs.select(
        (F.shiftleft(F.col("a.doc_id"), 32)
         .bitwiseOR(F.col("b.doc_id"))).alias("pk"),
        F.round(F.col("a.w") * F.col("b.w"), 6)
        .cast("decimal(18,6)").alias("ww"))
        .repartition(n_part, "pk")
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"),
             F.sum("ww").cast("double").alias("dot"))
        .select(F.shiftright("pk", 32).alias("doc_a"),
                F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)).alias("doc_b"),
                "n_shared", "dot"))
    t_packed = timeit("pair join+exchange+agg (packed pk)", lambda: noop(packed))

    # interleave to beat host noise
    t_pair2 = timeit("shipped again", lambda: noop(pairs))
    t_packed2 = timeit("packed again", lambda: noop(packed))
    print(f"# shipped best {min(t_pair, t_pair2):.3f} "
          f"packed best {min(t_packed, t_packed2):.3f}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
