"""Semantic unit tests for the training-data pipeline operators
(boilerplate chunk dedup, PII redaction, sequence packing,
contamination overlap). Cross-engine parity is covered separately by
test_oracle_parity (pipeline_suite); these tests pin the semantics on
hand-built fixtures where the expected output is computed by hand."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_spark.operators import text as T


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


@pytest.fixture()
def doc_table(spark, monkeypatch):
    """Route workloads' load_tables at a hand-built documents table
    (the real loader wants the full TPC-H directory)."""

    def _install(rows):
        df = spark.createDataFrame(
            rows,
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        )
        monkeypatch.setattr(
            "graphdb_spark.workloads.text.load_tables",
            lambda s, d: {"documents": df},
        )
        return df

    return _install


class TestChunking:
    def test_chunk_texts_exact(self, spark):
        df = spark.createDataFrame([("a b c d e f g h i j",)], "text string")
        row = _one(df.select(T.chunk_texts(F.col("text"), 4).alias("c")))
        assert row.c == ["a b c d", "e f g h", "i j"]

    def test_chunk_texts_short_doc_single_chunk(self, spark):
        df = spark.createDataFrame([("x y",)], "text string")
        row = _one(df.select(T.chunk_texts(F.col("text"), 8).alias("c")))
        assert row.c == ["x y"]

    def test_ngram_texts_stride_one(self, spark):
        df = spark.createDataFrame([("a b c d",)], "text string")
        row = _one(df.select(T.ngram_texts(F.col("text"), 3).alias("g")))
        assert row.g == ["a b c", "b c d"]


class TestPII:
    CASES = [
        ("mail bob.smith+x@corp.example.org now", "email", 1),
        ("no pii here at all", "email", 0),
        ("ssn 123-45-6789 leaked", "ssn", 1),
        ("host 192.168.001.1 up", "ipv4", 1),
        ("call 555-867-5309 today", "phone", 1),
        # 3-3-4 phone is NOT an SSN (3-2-4)
        ("call 555-867-5309 today", "ssn", 0),
        # SSN is not a phone
        ("ssn 123-45-6789 leaked", "phone", 0),
    ]

    @pytest.mark.parametrize("text,kind,n", CASES)
    def test_pii_count(self, spark, text, kind, n):
        df = spark.createDataFrame([(text,)], "text string")
        assert _one(df.select(T.pii_count(F.col("text"), kind).alias("n"))).n == n

    def test_redact_all_kinds(self, spark):
        s = (
            "write a@b.io or 555-123-4567, ssn 321-54-9876, ip 10.0.0.1 end"
        )
        df = spark.createDataFrame([(s,)], "text string")
        red = _one(df.select(T.redact_pii(F.col("text")).alias("r"))).r
        assert red == (
            "write <EMAIL> or <PHONE>, ssn <SSN>, ip <IP> end"
        )

    def test_redaction_idempotent(self, spark):
        df = spark.createDataFrame([("a@b.io 10.0.0.1",)], "text string")
        once = df.select(T.redact_pii(F.col("text")).alias("r"))
        twice = once.select(T.redact_pii(F.col("r")).alias("r"))
        assert _one(once).r == _one(twice).r


class TestBoilerplate:
    def test_repeated_chunk_flagged(self, spark, doc_table):
        # doc 1 and 2 share their first 8-token chunk; doc 3 is unique
        common = "w1 w2 w3 w4 w5 w6 w7 w8"
        doc_table([
            (1, common + " a1 a2 a3 a4 a5 a6 a7 a8", "en", "s", 0),
            (2, common + " b1 b2 b3 b4 b5 b6 b7 b8", "en", "s", 0),
            (3, "c1 c2 c3 c4 c5 c6 c7 c8 d1 d2 d3 d4 d5 d6 d7 d8", "en", "s", 0),
        ])
        from graphdb_spark.workloads.pipeline import boilerplate_chunks

        out = {
            r.doc_id: (r.n_chunks, r.n_boiler, r.boiler_ratio)
            for r in boilerplate_chunks(spark, "ignored").collect()
        }
        assert out == {1: (2, 1, 0.5), 2: (2, 1, 0.5)}  # doc 3 clean


class TestSeqPacking:
    def test_bins_respect_budget_and_shard(self, spark, doc_table):
        # 4 docs x 300 tokens in one source: budget 512 -> doc1 starts
        # at 0 (bin 0), doc2 at 300 (bin 0), doc3 at 600 (bin 1),
        # doc4 at 900 (bin 1)
        mk = lambda n: " ".join(f"t{i}" for i in range(n))  # noqa: E731
        doc_table([
            (i, mk(300), "en", "srcA", 0) for i in range(1, 5)
        ] + [(9, mk(10), "en", "srcB", 0)])
        from graphdb_spark.workloads.pipeline import seq_packing

        out = {
            (r.source, r.bin): (r.n_docs, r.bin_tokens)
            for r in seq_packing(spark, "ignored").collect()
        }
        assert out == {
            ("srcA", 0): (2, 600),
            ("srcA", 1): (2, 600),
            ("srcB", 0): (1, 10),
        }


class TestContamination:
    def test_duplicate_of_benchmark_scores_one(self, spark, doc_table):
        # doc 10 (benchmark: id % 10 == 0) and doc 11 are identical;
        # doc 12 shares nothing
        same = " ".join(f"w{i}" for i in range(12))
        doc_table([
            (10, same, "en", "s", 0),
            (11, same, "en", "s", 0),
            (12, " ".join(f"z{i}" for i in range(12)), "en", "s", 0),
        ])
        from graphdb_spark.workloads.pipeline import contamination_overlap

        rows = contamination_overlap(spark, "ignored").collect()
        assert len(rows) == 1
        r = rows[0]
        assert r.doc_id == 11 and r.n_hit == r.n_grams and r.contamination == 1.0

    def test_plan_stays_jvm_side(self, spark, sf_dir):
        # pipeline text ops must be whole-stage-codegen JVM expressions:
        # no BatchEvalPython anywhere in the plan
        from graphdb_spark.workloads.pipeline import (
            boilerplate_chunks,
            contamination_overlap,
            pii_redaction,
            seq_packing,
        )

        for fn in (boilerplate_chunks, pii_redaction, seq_packing,
                   contamination_overlap):
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            assert "BatchEvalPython" not in plan, fn.__name__


class TestGopherQuality:
    def test_signals_and_verdict(self, spark, doc_table):
        good = "the wind and rain that came from north said hello today " * 5
        short = "tiny doc with the and of"                       # 6 words
        symbols = ("the wind and rain that came from north said hello " * 5
                   + "### ... ### ... ### ... ### ...")          # symbol-heavy
        doc_table([
            (1, good.strip(), "en", "s", 0),
            (2, short, "en", "s", 0),
            (3, symbols.strip(), "en", "s", 0),
        ])
        from graphdb_spark.workloads.pipeline import gopher_quality

        out = {r.doc_id: r for r in gopher_quality(spark, "ignored").collect()}
        assert out[1].gopher_ok == 1
        assert out[1].n_words == 55 and out[1].stop_hits >= 2
        assert 3.0 <= out[1].mean_word_len <= 10.0
        assert out[2].gopher_ok == 0          # word count below 50
        assert out[3].gopher_ok == 0          # symbol ratio >= 0.1
        assert out[3].symbol_ratio >= 0.1

    def test_alpha_ratio_counts_lettered_words(self, spark, doc_table):
        doc_table([(1, "abc 123 a1 999", "en", "s", 0)])
        from graphdb_spark.workloads.pipeline import gopher_quality

        r = gopher_quality(spark, "ignored").collect()[0]
        assert r.alpha_ratio == 0.5  # abc, a1 of 4


class TestRepetition:
    def test_dup_and_top_fractions(self, spark, doc_table):
        # 2-grams of "a b a b a": [a b, b a, a b, b a] -> 4 grams,
        # 2 distinct, dup_ratio 0.5, top_frac 0.5
        doc_table([(1, "a b a b a", "en", "s", 0)])
        from graphdb_spark.workloads.pipeline import repetition_stats

        r = repetition_stats(spark, "ignored").collect()[0]
        assert (r.n_grams, r.n_distinct) == (4, 2)
        assert r.dup_ratio == 0.5 and r.top_frac == 0.5

    def test_short_docs_filtered(self, spark, doc_table):
        doc_table([(1, "one", "en", "s", 0)])
        from graphdb_spark.workloads.pipeline import repetition_stats

        assert repetition_stats(spark, "ignored").count() == 0


class TestUnigramRarity:
    def test_corpus_frequencies(self, spark, doc_table):
        # corpus: 'x' appears 3 times, 'y' twice, 'z' once
        doc_table([
            (1, "x x y", "en", "s", 0),
            (2, "x y z", "en", "s", 0),
        ])
        from graphdb_spark.workloads.pipeline import unigram_rarity

        out = {r.doc_id: r for r in unigram_rarity(spark, "ignored").collect()}
        assert out[1].sum_freq == 3 + 3 + 2 and out[1].min_freq == 2
        assert out[2].sum_freq == 3 + 2 + 1 and out[2].min_freq == 1
        assert out[2].avg_freq == 2.0


class TestFilterFunnel:
    def test_stage_survivors(self, spark, doc_table):
        good = "the wind and rain that came from north said hello today " * 5
        doc_table([
            (1, good.strip(), "en", "s", 0),   # survives all 5
            (2, "too short the and", "en", "s", 0),  # fails stage 1
        ])
        from graphdb_spark.workloads.pipeline import filter_funnel

        out = {r.stage: (r.n_docs, r.n_tokens)
               for r in filter_funnel(spark, "ignored").collect()}
        assert out["0_raw"] == (2, 59)
        assert out["1_word_count"] == (1, 55)
        assert out["5_stopwords"] == (1, 55)
        assert "2_mean_word_len" in out and out["2_mean_word_len"][0] == 1

    def test_new_ops_stay_jvm_side(self, spark, sf_dir):
        from graphdb_spark.workloads.pipeline import (
            filter_funnel,
            gopher_quality,
            repetition_stats,
            unigram_rarity,
        )

        for fn in (gopher_quality, repetition_stats, unigram_rarity,
                   filter_funnel):
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            assert "BatchEvalPython" not in plan, fn.__name__


class TestDomainCap:
    def test_caps_per_source(self, spark, doc_table, monkeypatch):
        from graphdb_spark.workloads import pipeline as P

        monkeypatch.setattr(P, "DOMAIN_CAP_K", 2)
        rows = [
            # srcA: 3 docs — cap 2 keeps the two longest
            (1, "x", "en", "srcA", 100),
            (2, "x", "en", "srcA", 300),
            (3, "x", "en", "srcA", 200),
            # srcB: 1 doc — under cap, all kept
            (4, "x", "en", "srcB", 50),
        ]
        doc_table(rows)
        got = {r["source"]: (r["n_docs"], r["n_kept"], r["kept_chars"])
               for r in P.domain_cap(spark, "ignored").collect()}
        assert got["srcA"] == (3, 2, 500)   # docs 2 (300) + 3 (200)
        assert got["srcB"] == (1, 1, 50)

    def test_rank_tie_breaks_on_doc_id(self, spark, doc_table, monkeypatch):
        from graphdb_spark.workloads import pipeline as P

        monkeypatch.setattr(P, "DOMAIN_CAP_K", 1)
        doc_table([
            (7, "x", "en", "s", 100),
            (5, "x", "en", "s", 100),   # same length: lower doc_id wins
        ])
        got = P.domain_cap(spark, "ignored").collect()[0]
        assert (got["n_kept"], got["kept_chars"]) == (1, 100)


class TestUrlOps:
    def test_extract_normalize_host(self, spark):
        from graphdb_spark.operators import text as T
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("see HTTPS://WWW.Foo.COM/A?x=1#f and http://bar.org:8080/b c",)],
            "t string",
        )
        row = df.select(
            T.extract_urls(F.col("t")).alias("urls")
        ).collect()[0]
        assert row["urls"] == [
            "HTTPS://WWW.Foo.COM/A?x=1#f", "http://bar.org:8080/b",
        ]
        got = (
            df.select(F.explode(T.extract_urls(F.col("t"))).alias("u"))
            .select(
                T.url_host(F.col("u")).alias("h"),
                T.normalize_url(F.col("u")).alias("n"),
            )
            .collect()
        )
        assert [(r["h"], r["n"]) for r in got] == [
            ("foo.com", "https://www.foo.com/a"),
            ("bar.org", "http://bar.org:8080/b"),
        ]


def test_bm25_primitives(spark):
    """term_freq / idf / weight semantics on a 3-doc corpus: the doc
    containing the RARE term outranks docs with only the common term,
    and tf saturates (k1 bound)."""
    import math

    from pyspark.sql import functions as F

    from graphdb_spark.operators import text as T

    d = spark.createDataFrame(
        [(1, "common rare common"), (2, "common common common common"),
         (3, "other words only")],
        "doc_id bigint, text string",
    )
    toks = T.tokens(F.lower(F.col("text")))
    tf = d.select(
        "doc_id",
        T.term_freq(toks, "common").alias("tf_c"),
        T.term_freq(toks, "rare").alias("tf_r"),
    )
    got = {r["doc_id"]: (r["tf_c"], r["tf_r"]) for r in tf.collect()}
    assert got == {1: (2, 1), 2: (4, 0), 3: (0, 0)}
    # idf: rare term (df=1 of 3) ≫ common term (df=2 of 3)
    row = d.agg(
        T.bm25_idf(F.lit(3), F.lit(1)).alias("idf_rare"),
        T.bm25_idf(F.lit(3), F.lit(2)).alias("idf_common"),
    ).collect()[0]
    assert row["idf_rare"] > row["idf_common"] > 0
    assert abs(row["idf_rare"] - math.log(1 + 2.5 / 1.5)) < 1e-12
    # saturation: doubling tf at equal dl less than doubles the weight
    w = d.agg(
        T.bm25_weight(F.lit(2), F.lit(10), F.lit(10.0)).alias("w2"),
        T.bm25_weight(F.lit(4), F.lit(10), F.lit(10.0)).alias("w4"),
    ).collect()[0]
    assert w["w2"] < w["w4"] < 2 * w["w2"]


class TestDocChunking:
    def test_chunks_cover_every_token_with_fixed_overlap(self, spark):
        """Invariants on a hand-built doc: chunk starts advance by the
        stride, every token index is covered, every chunk except
        possibly the last is full-size, and consecutive chunks overlap
        by exactly CHUNK_SIZE - CHUNK_STRIDE tokens."""
        from pyspark.sql import functions as F

        from graphdb_spark.workloads.pipeline import (
            CHUNK_SIZE, CHUNK_STRIDE,
        )
        from graphdb_spark.operators import text as T

        n_tokens = 200
        text = " ".join(f"t{i}" for i in range(n_tokens))
        d = spark.createDataFrame(
            [(1, text)], "doc_id bigint, text string"
        )
        base = d.select(
            "doc_id", T.tokens(F.lower(F.col("text"))).alias("toks")
        )
        starts = F.sequence(
            F.lit(1), F.greatest(F.size("toks"), F.lit(1)),
            F.lit(CHUNK_STRIDE),
        )
        ch = base.select(
            "doc_id", "toks", F.explode(starts).alias("start")
        )
        rows = ch.select(
            "start",
            F.slice(F.col("toks"), F.col("start"), CHUNK_SIZE).alias("c"),
        ).collect()
        rows.sort(key=lambda r: r["start"])
        # starts advance by the stride from 1
        assert [r["start"] for r in rows] == list(
            range(1, n_tokens + 1, CHUNK_STRIDE)
        )
        # full coverage; a chunk is full-size exactly when it fits
        covered = set()
        for r in rows:
            expect = min(CHUNK_SIZE, n_tokens - (r["start"] - 1))
            assert len(r["c"]) == expect
        for r in rows:
            covered.update(
                range(r["start"] - 1, r["start"] - 1 + len(r["c"]))
            )
        assert covered == set(range(n_tokens))
        # overlap between consecutive chunks
        for a, b in zip(rows, rows[1:]):
            overlap = (a["start"] + len(a["c"])) - b["start"]
            assert overlap == max(0, len(a["c"]) - CHUNK_STRIDE)

    def test_empty_doc_yields_one_empty_chunk(self, spark, sf_dir):
        from graphdb_spark.workloads.pipeline import doc_chunking

        out = doc_chunking(spark, sf_dir)
        assert out.filter("n_tok <= 0").count() == 0  # corpus non-empty


class TestDsirImportance:
    def test_target_docs_score_higher_on_separable_corpus(self, spark):
        """Target docs (doc_id % 10 == 0) written in vocabulary A and
        raw docs in vocabulary B: the LLR score must rank every target
        doc above every raw doc."""
        from graphdb_spark.workloads import pipeline as P
        from graphdb_spark.workloads.pipeline import dsir_importance
        import tempfile, os

        rows = []
        for i in range(40):
            if i % 10 == 0:
                rows.append((i, "alpha beta gamma alpha beta", "s"))
            else:
                rows.append((i, "delta epsilon zeta delta zeta", "s"))
        sf = tempfile.mkdtemp(prefix="dsir_t_")
        spark.createDataFrame(
            rows, "doc_id bigint, text string, source string"
        ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
        # load_tables eagerly reads every table in the dir — link the
        # rest from the small fixture SF
        for t in ("region nation customer supplier part orders "
                  "lineitem events embeddings").split():
            os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                       os.path.join(sf, f"{t}.parquet"))
        # load_tables memoizes per sf_dir; our minimal dir only has
        # documents, which is all _docs touches
        out = {r["doc_id"]: r["dsir_score"]
               for r in dsir_importance(spark, sf).collect()}
        targets = {k for k in out if k % 10 == 0}
        raws = set(out) - targets
        assert targets and raws
        assert min(out[k] for k in targets) > max(out[k] for k in raws)


def _mini_sf(spark, tmp_name, docs=None, embeddings=None):
    """Materialize a minimal sf_dir: the given tables as parquet, every
    other driver table symlinked from the sf0.001 fixture."""
    import os
    import tempfile

    sf = tempfile.mkdtemp(prefix=tmp_name)
    have = set()
    if docs is not None:
        spark.createDataFrame(
            docs, "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint"
        ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
        have.add("documents")
    if embeddings is not None:
        spark.createDataFrame(
            embeddings, "vec_id bigint, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(
            os.path.join(sf, "embeddings.parquet"))
        have.add("embeddings")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        if t not in have:
            os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                       os.path.join(sf, f"{t}.parquet"))
    return sf


class TestLmBigramScore:
    def test_gibberish_ranks_worst(self, spark):
        """One doc of unique never-repeated bigrams among many docs of
        one common phrase: the gibberish doc must get the highest
        average NLL (every corpus-frequent bigram is cheap; its
        singletons are maximally surprising)."""
        from graphdb_spark.workloads.pipeline import lm_bigram_score

        rows = [(i, "the cat sat on the mat", "en", "s", 0)
                for i in range(1, 30)]
        rows.append((0, "zq xv jk wm pl rt yb nc df gh", "en", "s", 0))
        sf = _mini_sf(spark, "lmbt_", docs=rows)
        out = lm_bigram_score(spark, sf).collect()
        assert out[0]["doc_id"] == 0
        assert out[0]["avg_nll"] > out[1]["avg_nll"]
        # common-phrase docs all share one identical score
        rest = {r["avg_nll"] for r in out[1:]}
        assert len(rest) == 1

    def test_scores_are_positive_and_bounded(self, spark, sf_dir):
        from graphdb_spark.workloads.pipeline import (
            LM_BIGRAM_BUCKETS, lm_bigram_score,
        )
        import math

        out = lm_bigram_score(spark, sf_dir).collect()
        assert len(out) == 50
        # -ln p in (0, ln(n1+V)]; the worst possible surprise is a
        # singleton bigram in the largest context
        cap = math.log(10**7 + LM_BIGRAM_BUCKETS)
        for r in out:
            assert 0.0 < r["avg_nll"] <= cap
            assert r["n_bigrams"] >= 1


class TestStratifiedSplits:
    def test_exact_cuts_per_stratum(self, spark, sf_dir):
        """Within every lang: counts reconstruct the ceil(0.8/0.9)
        boundaries exactly and fractions sum to 1."""
        import math

        from graphdb_spark.workloads.pipeline import stratified_splits

        rows = stratified_splits(spark, sf_dir).collect()
        by_lang = {}
        for r in rows:
            by_lang.setdefault(r["lang"], {})[r["split"]] = r["n"]
        for lang, ns in by_lang.items():
            tot = sum(ns.values())
            want_train = math.ceil(tot * 0.8)
            want_val = math.ceil(tot * 0.9) - want_train
            assert ns.get("train", 0) == want_train, lang
            assert ns.get("val", 0) == want_val, lang
            assert ns.get("test", 0) == tot - want_train - want_val, lang

    def test_assignment_is_deterministic(self, spark, sf_dir):
        from graphdb_spark.workloads.pipeline import stratified_splits

        a = stratified_splits(spark, sf_dir).collect()
        b = stratified_splits(spark, sf_dir).collect()
        assert a == b


class TestTfidfCosinePairs:
    def test_identical_docs_cos_one(self, spark):
        """Two byte-identical docs and one sharing nothing: the
        identical pair scores exactly 1.0 (after rounding) and is the
        only pair emitted (doc 3 shares no df>=2 shingle)."""
        from graphdb_spark.workloads.text import tfidf_cosine_pairs

        same = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [
            (1, same, "en", "s", 0),
            (2, same, "en", "s", 0),
            (3, "one two three four five six seven eight", "en", "s", 0),
        ]
        sf = _mini_sf(spark, "tfidf_t_", docs=rows)
        out = tfidf_cosine_pairs(spark, sf).collect()
        assert [(r["doc_a"], r["doc_b"]) for r in out] == [(1, 2)]
        assert out[0]["cos_sim"] == 1.0
        assert out[0]["n_shared"] == 6  # 8 tokens -> 6 3-shingles

    def test_scores_bounded_and_ordered(self, spark, sf_dir):
        from graphdb_spark.workloads.text import tfidf_cosine_pairs

        out = tfidf_cosine_pairs(spark, sf_dir).collect()
        assert len(out) == 50
        sims = [r["cos_sim"] for r in out]
        assert sims == sorted(sims, reverse=True)
        assert all(0.0 < s <= 1.000001 for s in sims)


class TestEmbQuantizeError:
    def test_exact_reconstruction_and_known_error(self, spark):
        """Vectors whose values sit exactly on the 8-bit grid must
        reconstruct losslessly (rmse 0); a vector with off-grid 0.5s
        has the hand-computed rmse sqrt(62*0.25/64)."""
        import math

        from graphdb_spark.workloads.embeddings import emb_quantize_error

        # label 1: exact 8-bit grid (mn=0, mx=255, s=1, all integers)
        exact = [float(x) for x in ([0, 255] + list(range(1, 63)))]
        const = [7.5] * 64
        off = [0.0, 255.0] + [0.5] * 62
        rows = [
            (1, exact, 1),
            (2, const, 2),
            (3, off, 3),
        ]
        sf = _mini_sf(spark, "quant_t_", embeddings=rows)
        out = {r["label"]: r for r in emb_quantize_error(spark, sf).collect()}
        assert out[1]["max_rmse"] == 0.0 and out[1]["avg_rmse"] == 0.0
        assert out[2]["max_rmse"] == 0.0 and out[2]["avg_range"] == 0.0
        want = round(math.sqrt(62 * 0.25 / 64), 6)
        assert out[3]["max_rmse"] == want
        assert out[3]["avg_range"] == 255.0

    def test_error_bounded_by_half_step(self, spark, sf_dir):
        """Quantization to the nearest of 256 levels can never err by
        more than half a step: rmse <= range/255/2 for every label
        (max_rmse vs the label's max range is a safe relaxation
        because rmse <= per-vector half-step <= max half-step)."""
        from graphdb_spark.workloads.embeddings import emb_quantize_error
        from graphdb_spark.workloads.embeddings import _emb
        from pyspark.sql import functions as F

        out = emb_quantize_error(spark, sf_dir).collect()
        rng = {
            r["label"]: r["mx"]
            for r in _emb(spark, sf_dir)
            .select(
                "label",
                (F.array_max("embedding").cast("double")
                 - F.array_min("embedding").cast("double")).alias("r"),
            )
            .groupBy("label").agg(F.max("r").alias("mx")).collect()
        }
        for r in out:
            assert r["max_rmse"] <= rng[r["label"]] / 255 / 2 + 1e-9


class TestCorpusShards:
    def test_shards_partition_the_corpus_deterministically(self, spark):
        """Shard manifests cover every doc exactly once, totals match
        the corpus, and a re-run reproduces the identical manifests
        (byte-deterministic ordering checksum)."""
        from pyspark.sql import functions as F

        from graphdb_spark.workloads.pipeline import N_SHARDS, corpus_shards
        from graphdb_spark.workloads.text import _docs

        sf = "/root/testdata/sf0.001"
        rows = corpus_shards(spark, sf).collect()
        assert [r["shard"] for r in rows] == sorted(
            r["shard"] for r in rows
        )
        assert set(r["shard"] for r in rows) <= set(range(N_SHARDS))
        n_total = _docs(spark, sf).count()
        assert sum(r["n_docs"] for r in rows) == n_total
        for r in rows:
            assert r["n_docs"] >= 1
            assert r["first_doc"] is not None and r["last_doc"] is not None
            if r["n_docs"] == 1:
                assert r["first_doc"] == r["last_doc"]
        # determinism: replay is bit-identical including the checksum
        again = corpus_shards(spark, sf).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


class TestEmbMmrSelection:
    def test_greedy_invariants(self, spark):
        """MMR invariants: K distinct picks from the pool (anchor
        excluded), first pick is the pure-relevance argmax (maxsim
        starts 0), mmr scores are non-increasing in rank IF rel were
        constant — instead check the defining greedy property: each
        pick's mmr >= every later pick's score AT ITS OWN round is not
        observable post-hoc, so verify score arithmetic and that
        sel_maxsim is 0 for rank 0 and within [0, 1e-9..1] bounds."""
        from graphdb_spark.workloads.embeddings import (
            MMR_K,
            MMR_LAMBDA,
            MMR_POOL,
            MMR_QUERY,
            emb_mmr_selection,
        )

        rows = emb_mmr_selection(spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == MMR_K
        ids = [r["vec_id"] for r in rows]
        assert len(set(ids)) == MMR_K
        assert MMR_QUERY not in ids
        assert all(v < MMR_POOL for v in ids)
        assert [r["rank"] for r in rows] == list(range(MMR_K))
        assert rows[0]["sel_maxsim"] == 0.0
        for r in rows:
            assert abs(
                MMR_LAMBDA * r["rel"]
                - (1 - MMR_LAMBDA) * r["sel_maxsim"]
                - r["mmr"]
            ) < 2e-6
            assert -1.0 <= r["sel_maxsim"] <= 1.0
        # diversity actually bites: at least one later pick has a
        # nonzero similarity penalty
        assert any(r["sel_maxsim"] > 0 for r in rows[1:])


class TestEmbMmrBatched:
    def test_batched_invariants_and_overlap(self, spark):
        """Batched MMR (SCALE.md's at-scale variant): same pool/K as
        the greedy loop but ceil(K/B) rounds of top-B picks. Checks
        the batched-specific invariants — every member of round 0's
        batch carries maxsim=0 (scored against the round-START state),
        in-batch rank order is (score desc, vec_id asc) — plus the
        score arithmetic shared with the greedy variant, and that the
        two selections substantially overlap (the approximation trades
        within-batch diversity, not wholesale selection quality)."""
        from graphdb_spark.workloads.embeddings import (
            MMR_BATCH,
            MMR_K,
            MMR_LAMBDA,
            MMR_POOL,
            MMR_QUERY,
            emb_mmr_batched,
            emb_mmr_selection,
        )

        rows = emb_mmr_batched(spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == MMR_K
        ids = [r["vec_id"] for r in rows]
        assert len(set(ids)) == MMR_K
        assert MMR_QUERY not in ids
        assert all(v < MMR_POOL for v in ids)
        assert [r["rank"] for r in rows] == list(range(MMR_K))
        # the whole first batch is scored against the empty selection
        first_batch = rows[:MMR_BATCH]
        assert all(r["sel_maxsim"] == 0.0 for r in first_batch)
        # first batch = pure-relevance top-B, so mmr (= lam*rel) is
        # non-increasing within it with the vec_id tiebreak
        for a, b in zip(first_batch, first_batch[1:]):
            assert (a["mmr"], -a["vec_id"]) >= (b["mmr"], -b["vec_id"])
        for r in rows:
            assert abs(
                MMR_LAMBDA * r["rel"]
                - (1 - MMR_LAMBDA) * r["sel_maxsim"]
                - r["mmr"]
            ) < 2e-6
        # later batches see the earlier picks' similarity penalty
        assert any(r["sel_maxsim"] > 0 for r in rows[MMR_BATCH:])
        greedy = emb_mmr_selection(spark, "/root/testdata/sf0.001").collect()
        overlap = len(set(ids) & {r["vec_id"] for r in greedy})
        # greedy's first pick is batched's first pick by construction;
        # demand substantial (not total) agreement beyond that
        assert rows[0]["vec_id"] == greedy[0]["vec_id"]
        assert overlap >= MMR_K // 2
