"""Full tfidf_cosine_pairs with n_part as a parameter: interleaved
best-of-N over n_part in {4, 8, 16, 32, natural-AQE} at the session's
core count, to find the right shuffle width for the byte-light
CPU-stages and whether the pin beats AQE on Spark 4.1.2."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graphdb_spark.session import build_spark
from graphdb_spark.operators import text as T
from graphdb_spark.workloads.text import (_docs, TFIDF_DF_MIN, TFIDF_DF_MAX,
                                          TFIDF_TOPK)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def build(spark, sf_dir, n_part):
    """tfidf_cosine_pairs with parameterized pin; n_part=None => no
    explicit repartitions (AQE + natural groupBy everywhere)."""
    d = _docs(spark, sf_dir, spread=True)
    n_row = d.agg(F.count(F.lit(1)).alias("__n"))
    occ = (
        d.select("doc_id", T.tokens(F.lower(F.col("text"))).alias("__toks"))
        .select("doc_id", F.explode(
            T.shingles_from_tokens(F.col("__toks"), distinct=False)).alias("s"))
        .select("doc_id", F.xxhash64(F.col("s")).alias("h"))
    )
    if n_part:
        occ = occ.repartition(n_part, "doc_id", "h")
    tf = occ.groupBy("doc_id", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"))
    tfh = tf.repartition(n_part, "h") if n_part else tf
    df_tab = (
        tfh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df").between(TFIDF_DF_MIN, TFIDF_DF_MAX))
        .crossJoin(F.broadcast(n_row))
        .select("h", F.log((F.col("__n") + 1).cast("double")
                           / (F.col("df") + 1).cast("double")).alias("idf"))
    )
    post = tfh.join(F.broadcast(df_tab), "h").select(
        "h", "doc_id", (F.col("tf") * F.col("idf")).alias("w"))
    npost = post.repartition(n_part, "doc_id") if n_part else post
    norms = (
        npost.groupBy("doc_id")
        .agg(F.sqrt(F.sum(F.round(F.col("w") * F.col("w"), 6)
                          .cast("decimal(18,6)")).cast("double")).alias("nrm"))
    )
    a, b = post.alias("a"), post.hint("shuffle_hash").alias("b")
    rp = a.join(b, (F.col("a.h") == F.col("b.h"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
        F.round(F.col("a.w") * F.col("b.w"), 6)
        .cast("decimal(18,6)").alias("ww"))
    if n_part:
        rp = rp.repartition(n_part, "doc_a", "doc_b")
    pairs = rp.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shared"),
        F.sum("ww").cast("double").alias("dot"))
    na = F.broadcast(norms.select(F.col("doc_id").alias("doc_a"),
                                  F.col("nrm").alias("na")))
    nb = F.broadcast(norms.select(F.col("doc_id").alias("doc_b"),
                                  F.col("nrm").alias("nb")))
    return (pairs.join(na, "doc_a").join(nb, "doc_b")
            .select("doc_a", "doc_b", "n_shared",
                    F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
                    .alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), "doc_a", "doc_b").limit(TFIDF_TOPK))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("ROUNDS", "5"))
    spark = build_spark("tfidf_explore3", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    d = _docs(spark, sf_dir)
    noop(d)

    variants = {"pin4": 4, "pin8": 8, "pin16": 16,
                "pin32": 32, "natural": None}
    # sanity: all variants produce the identical result
    ref = sorted(map(tuple, build(spark, sf_dir, 32).collect()))
    for name, np_ in variants.items():
        got = sorted(map(tuple, build(spark, sf_dir, np_).collect()))
        assert got == ref, f"{name} differs!"
    print("# all variants result-identical", file=sys.stderr)

    best = {k: None for k in variants}
    for r in range(rounds):
        for name, np_ in variants.items():
            t0 = time.perf_counter()
            noop(build(spark, sf_dir, np_))
            dt = time.perf_counter() - t0
            if best[name] is None or dt < best[name]:
                best[name] = dt
    for name, t in best.items():
        print(f"# {name}: {t:.3f}s", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
