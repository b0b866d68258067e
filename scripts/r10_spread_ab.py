"""A/B the _docs spread width (map-side tokenize parallelism) for
lm_bigram_score and tfidf_cosine_pairs at local[32]: full cores vs the
byte-derived _text_width. Interleaved best-of-N."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphdb_spark.session import build_spark
from graphdb_spark.workloads import text as TW


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("ROUNDS", "5"))
    spark = build_spark("spread_ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    noop(TW._docs(spark, sf_dir))
    print(f"# _text_width = {TW._text_width(spark, sf_dir)}", file=sys.stderr)

    from graphdb_spark.workloads.pipeline import lm_bigram_score
    from graphdb_spark.workloads.text import tfidf_cosine_pairs

    orig_docs = TW._docs

    def docs_with_spread(width):
        def _d(spark, sf_dir, spread=False):
            d = orig_docs(spark, sf_dir, spread=False)
            if spread:
                d = d.repartition(width)
            return d
        return _d

    import graphdb_spark.workloads.pipeline as PW

    widths = [32, TW._text_width(spark, sf_dir), 8]
    best = {}
    for r in range(rounds):
        for w in widths:
            TW._docs = docs_with_spread(w)
            PW._docs = TW._docs
            for qname, fn in (("lm_bigram", lm_bigram_score),
                              ("tfidf", tfidf_cosine_pairs)):
                t0 = time.perf_counter()
                noop(fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                key = (qname, w)
                if key not in best or dt < best[key]:
                    best[key] = dt
    TW._docs = orig_docs
    PW._docs = orig_docs
    for (q, w), t in sorted(best.items()):
        print(f"# {q} spread={w}: {t:.3f}s", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
