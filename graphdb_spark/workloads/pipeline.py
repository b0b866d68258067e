"""Training-data pipeline workloads beyond per-doc dedup: passage
(paragraph)-level boilerplate removal, PII detection/redaction,
sequence packing for training batches, and benchmark-contamination
n-gram overlap. Each query has an exact DuckDB-oracle twin built from
the same constants (chunk size, regexes, token budget) so the two
sides cannot drift.

Scale design (100 TB of documents):
- boilerplate: one explode (x ~n_tokens/CHUNK_K rows), one groupBy on
  the 64-bit chunk hash, one join back. The boilerplate set (chunks
  seen in >= BOILER_MIN_DOCS docs) is tiny relative to the corpus —
  AQE broadcasts it; no all-pairs anywhere.
- PII: pure JVM regexp expressions inside whole-stage codegen — scan
  speed, zero shuffles.
- packing: cumulative sums partition by `source` shard, so the sort is
  per-shard (no global single-partition window, which would serialize
  at scale).
- contamination: corpus-side n-grams stream through a broadcast join
  against the (small) benchmark gram-hash set; one groupBy per doc.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from graphdb_spark.operators import text as T
from graphdb_spark.workloads.text import _H64, _TOKS, _docs

CHUNK_K = 8          # tokens per passage chunk (boilerplate unit)
BOILER_MIN_DOCS = 2  # chunk in >= N distinct docs => boilerplate
NGRAM_K = 8          # contamination n-gram width
SEQ_BUDGET = 512     # tokens per packed training sequence
BENCH_MOD = 10       # doc_id % BENCH_MOD == 0 => benchmark ("eval") doc

# DuckDB fragments (token array -> chunk / n-gram lists), built from
# the same constants as the Spark side.
_CHUNKS = (
    "list_transform(range(0, greatest(CAST(ceil(len({t}) / {k}.0) AS BIGINT), 1)), "
    "i -> array_to_string(list_slice({t}, i * {k} + 1, i * {k} + {k}), ' '))"
)
_NGRAMS = (
    "list_transform(range(1, len({t}) - {k} + 2), "
    "i -> array_to_string(list_slice({t}, i, i + {k} - 1), ' '))"
)


# ------------------------------------------------------- boilerplate


def boilerplate_chunks(spark, sf_dir):
    """Passage-level (CCNet-style) boilerplate detection: split each
    document into CHUNK_K-token chunks, hash, count distinct docs per
    chunk corpus-wide, and report per-document boilerplate stats for
    documents containing at least one repeated chunk.

    Plan: explode -> groupBy(hash) [1 shuffle] -> join back
    [boilerplate set broadcast by AQE] -> groupBy(doc) [1 shuffle]."""
    d = _docs(spark, sf_dir, spread=True)
    ch = d.select(
        "doc_id", F.explode(T.chunk_texts(F.col("text"), CHUNK_K)).alias("chunk")
    ).select("doc_id", T.h64(F.col("chunk")).alias("h"))
    boiler = (
        ch.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= BOILER_MIN_DOCS)
        .select("h")
    )
    per_doc = (
        ch.join(boiler.withColumn("__b", F.lit(1)), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.coalesce(F.col("__b"), F.lit(0))).alias("n_boiler"),
        )
        .filter(F.col("n_boiler") > 0)
        .select(
            "doc_id",
            F.col("n_chunks").cast("bigint").alias("n_chunks"),
            F.col("n_boiler").cast("bigint").alias("n_boiler"),
            F.round(
                F.col("n_boiler").cast("double") / F.col("n_chunks"), 6
            ).alias("boiler_ratio"),
        )
    )
    return per_doc


BOILERPLATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS.format(x="text")} AS t FROM documents
),
ch AS (
  SELECT doc_id, {_H64.format(x="chunk")} AS h
  FROM (
    SELECT doc_id, unnest({_CHUNKS.format(t="t", k=CHUNK_K)}) AS chunk
    FROM toks
  )
),
boiler AS (
  SELECT h FROM (SELECT h, count(DISTINCT doc_id) nd FROM ch GROUP BY h)
  WHERE nd >= {BOILER_MIN_DOCS}
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler,
       round(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS boiler_ratio
FROM ch LEFT JOIN boiler b USING (h)
GROUP BY doc_id
HAVING n_boiler > 0
"""


# --------------------------------------------------------------- PII


def _inject_pii(sid):
    """Deterministic synthetic PII derived from doc_id (the corpus is
    synthetic word-soup with no real PII; injection makes the
    detect/redact path verifiable end-to-end)."""
    email = F.concat(F.lit("user"), sid.cast("string"), F.lit("@example.com"))
    phone = F.when(
        sid % 3 == 0,
        F.concat(
            F.lit("555-"),
            F.lpad((sid % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((sid % 10000).cast("string"), 4, "0"),
        ),
    )
    ip = F.when(
        sid % 5 == 0,
        F.concat(
            F.lit("10.0."),
            (sid % 256).cast("string"),
            F.lit("."),
            ((sid * 7) % 256).cast("string"),
        ),
    )
    ssn = F.when(
        sid % 7 == 0,
        F.concat(
            F.lpad((sid % 900 + 100).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((sid % 90 + 10).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad((sid % 9000 + 1000).cast("string"), 4, "0"),
        ),
    )
    return email, phone, ip, ssn


def pii_redaction(spark, sf_dir):
    """PII detect + redact over the documents table (email / SSN /
    IPv4 / phone), all JVM-side regexp expressions (operators/text.py
    PII_PATTERNS — Java-regex/RE2-portable syntax only). Returns
    per-doc match counts and the fingerprint of the redacted text so
    the oracle verifies the exact redaction output, not just counts."""
    d = _docs(spark, sf_dir)
    email, phone, ip, ssn = _inject_pii(F.col("doc_id"))
    pii = d.select(
        "doc_id",
        F.concat_ws(" ", F.col("text"), email, phone, ip, ssn).alias("ptext"),
    )
    return pii.select(
        "doc_id",
        T.pii_count(F.col("ptext"), "email").alias("n_email"),
        T.pii_count(F.col("ptext"), "ssn").alias("n_ssn"),
        T.pii_count(F.col("ptext"), "ipv4").alias("n_ipv4"),
        T.pii_count(F.col("ptext"), "phone").alias("n_phone"),
        T.h64(T.redact_pii(F.col("ptext"))).alias("red_fp"),
    )


def _pii_sql() -> str:
    inject = """
SELECT doc_id, concat_ws(' ', text,
  'user' || CAST(doc_id AS VARCHAR) || '@example.com',
  CASE WHEN doc_id % 3 = 0 THEN
    '555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') END,
  CASE WHEN doc_id % 5 = 0 THEN
    '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
            || CAST((doc_id * 7) % 256 AS VARCHAR) END,
  CASE WHEN doc_id % 7 = 0 THEN
    lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0') || '-'
    || lpad(CAST(doc_id % 90 + 10 AS VARCHAR), 2, '0') || '-'
    || lpad(CAST(doc_id % 9000 + 1000 AS VARCHAR), 4, '0') END
) AS ptext FROM documents"""
    # DuckDB single-quoted strings keep backslashes literal, so the
    # Java-regex pattern strings pass through unchanged (RE2-safe
    # syntax only, enforced by PII_PATTERNS' charter).
    red = "ptext"
    for pat, token in T.PII_PATTERNS.values():
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    counts = [
        f"CAST(len(regexp_extract_all(ptext, '{pat}')) AS BIGINT) AS n_{name}"
        for name, (pat, _tok) in T.PII_PATTERNS.items()
    ]
    return f"""
WITH pii AS ({inject})
SELECT doc_id, {', '.join(counts)},
       {_H64.format(x=red)} AS red_fp
FROM pii
"""


# ----------------------------------------------------------- packing


def seq_packing(spark, sf_dir):
    """Sequence packing for training batches: greedy concat-and-chunk
    within each `source` shard — documents ordered by doc_id, running
    token total, each doc attributed to the SEQ_BUDGET-token sequence
    where it starts. Per-shard windows keep the sort distributed (no
    global ordering)."""
    d = _docs(spark, sf_dir)
    tok = d.select(
        "source", "doc_id", T.token_count(F.col("text")).alias("tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = tok.select(
        "source",
        "tok",
        F.floor((F.sum("tok").over(w) - F.col("tok")) / SEQ_BUDGET)
        .cast("bigint")
        .alias("bin"),
    )
    return (
        binned.groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("tok").cast("bigint").alias("bin_tokens"),
        )
    )


SEQ_PACKING_SQL = f"""
WITH tok AS (
  SELECT source, doc_id, CAST(len({_TOKS.format(x="text")}) AS BIGINT) AS tok
  FROM documents
),
binned AS (
  SELECT source, tok,
         CAST(floor((sum(tok) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - tok) / {SEQ_BUDGET}.0) AS BIGINT) AS bin
  FROM tok
)
SELECT source, bin, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS bin_tokens
FROM binned GROUP BY source, bin
"""


# ----------------------------------------------- contamination check


def contamination_overlap(spark, sf_dir):
    """Benchmark-contamination check: docs with doc_id % BENCH_MOD == 0
    act as the held-out eval set; every corpus doc is scored by the
    fraction of its distinct NGRAM_K-token n-grams that appear in any
    benchmark doc. The benchmark gram-hash set is broadcast (small by
    construction); the corpus side streams through it."""
    d = _docs(spark, sf_dir, spread=True).filter(
        T.token_count(F.col("text")) >= NGRAM_K
    )
    grams = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(T.ngram_texts(F.col("text"), NGRAM_K))
        ).alias("g"),
    ).select("doc_id", T.h64(F.col("g")).alias("h"))
    bench = (
        grams.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select("h")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    corpus = grams.filter(F.col("doc_id") % BENCH_MOD != 0)
    return (
        corpus.join(F.broadcast(bench), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_hit"),
        )
        .filter(F.col("n_hit") > 0)
        .select(
            "doc_id",
            "n_grams",
            "n_hit",
            F.round(
                F.col("n_hit").cast("double") / F.col("n_grams"), 6
            ).alias("contamination"),
        )
    )


CONTAMINATION_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS.format(x="text")} AS t FROM documents
  WHERE len({_TOKS.format(x="text")}) >= {NGRAM_K}
),
grams AS (
  SELECT doc_id, {_H64.format(x="g")} AS h
  FROM (
    SELECT doc_id,
           unnest(list_distinct({_NGRAMS.format(t="t", k=NGRAM_K)})) AS g
    FROM toks
  )
),
bench AS (
  SELECT DISTINCT h FROM grams WHERE doc_id % {BENCH_MOD} = 0
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hit,
       round(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS contamination
FROM (SELECT * FROM grams WHERE doc_id % {BENCH_MOD} != 0) c
LEFT JOIN bench b USING (h)
GROUP BY doc_id
HAVING n_hit > 0
"""


QUERIES = {
    "boilerplate_chunks": (boilerplate_chunks, BOILERPLATE_SQL),
    "pii_redaction": (pii_redaction, _pii_sql()),
    "seq_packing": (seq_packing, SEQ_PACKING_SQL),
    "contamination_overlap": (contamination_overlap, CONTAMINATION_SQL),
}
