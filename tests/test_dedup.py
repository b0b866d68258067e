"""Dedup operator semantics on a corpus with KNOWN duplicates (the
driver documents are all-unique at small SF, so the oracle parity test
alone can't show the detectors actually fire)."""

import pytest

from graphdb_spark.operators import dedup as D
from graphdb_spark.operators import similarity as S
from pyspark.sql import functions as F

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the afternoon sun with great interest"
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact duplicate
        (3, "The quick brown fox JUMPS over the lazy dog while the cat "
            "watches from the warm windowsill in the afternoon sun with "
            "great interest!!"),  # normalized duplicate of 1
        (4, BASE.replace("afternoon", "morning")),  # near-dup (1 word)
        (5, "completely different text about spark dataframes and shuffle "
            "partitions running aggregate queries over columnar storage "
            "with adaptive execution enabled for skew handling"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup_groups(docs):
    got = {r["fp"]: (r["keeper_id"], r["n_dups"])
           for r in D.exact_dedup(docs).collect()}
    sizes = sorted(v[1] for v in got.values())
    assert sizes == [1, 1, 3]  # docs 1,2,3 share a normalized fingerprint
    trip = [v for v in got.values() if v[1] == 3][0]
    assert trip[0] == 1  # keeper = min doc_id


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 4) in pairs and pairs[(1, 4)] > 0.5  # one-word change
    assert not any(5 in p for p in pairs)  # unrelated doc untouched


def test_minhash_lsh_candidates(docs):
    got = {(r["doc_a"], r["doc_b"]): r["est_jaccard"]
           for r in D.minhash_lsh_candidates(docs).collect()}
    assert got[(1, 2)] == 1.0  # identical signatures
    assert (1, 4) in got and got[(1, 4)] >= 0.5
    assert not any(5 in p for p in got)


def test_simhash_near_pairs(docs):
    sig = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    assert sig[1] == sig[2]
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in D.simhash_near_pairs(docs, max_hamming=8).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 4) in pairs and pairs[(1, 4)] <= 8


def test_embedding_cosine_topk(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),   # near 0
        (2, [0.0, 1.0, 0.0, 0.0]),    # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),   # opposite of 0
    ]
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = [(r["rn"], r["neighbor_id"], r["cos_sim"])
           for r in S.cosine_topk(e, [0], k=3).orderBy("rn").collect()]
    assert [g[1] for g in got] == [1, 2, 3]  # ranked by similarity
    assert got[0][2] > 0.99 and got[1][2] == 0.0 and got[2][2] == -1.0


def test_lsh_bucket_recall_subset(spark):
    import random

    random.seed(7)
    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(50)]
    # plant a near-duplicate of vector 0
    rows.append((99, [x + 0.01 for x in rows[0][1]]))
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    brute = S.cosine_topk(e, [0], k=1).collect()
    assert brute[0]["neighbor_id"] == 99
    lsh = S.lsh_bucket_topk(e, [0], k=1, n_planes=4, dim=16).collect()
    # near-identical vectors share all sign buckets -> LSH must find it
    assert lsh and lsh[0]["neighbor_id"] == 99


def test_embedding_ivf_topk(spark, sf_dir):
    """IVF-cell ANN: structure is (query, rn, neighbor, cos); top-1
    within probed cells must agree with brute force whenever the true
    top-1 lives in a probed cell — sanity-check recall > 0 and exact
    scoring inside cells."""
    from graphdb_spark.operators.similarity import cosine_topk, ivf_topk
    from graphdb_spark.sources.tpch import load_tables

    e = load_tables(spark, sf_dir)["embeddings"]
    qids = [0, 1, 2]
    ivf = ivf_topk(e, qids, k=5, n_cells=16, n_probe=2)
    rows = ivf.collect()
    assert {r["query_id"] for r in rows} == set(qids)
    assert all(1 <= r["rn"] <= 5 for r in rows)
    # every IVF hit must carry the exact cosine score (subset of brute)
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in cosine_topk(e, qids, k=50).collect()
    }
    overlap = [
        r for r in rows if (r["query_id"], r["neighbor_id"]) in brute
    ]
    assert overlap, "IVF found nothing from the brute-force top-50"
    for r in overlap:
        assert abs(r["cos_sim"] - brute[(r["query_id"], r["neighbor_id"])]) < 1e-9


def test_near_dup_clusters(spark):
    """Three exact-ish duplicates + one unique doc: duplicates cluster
    under the min doc_id; the unique doc stays out."""
    from graphdb_spark.operators.dedup import near_dup_clusters

    txt = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, txt), (2, txt), (3, txt + " extra"),
         (9, "completely different content about spark clusters at scale")],
        "doc_id bigint, text string",
    )
    labels = {r["doc_id"]: r["canonical"]
              for r in near_dup_clusters(docs, min_est=0.2).collect()}
    assert labels[1] == labels[2] == 1
    assert labels.get(3, 1) == 1  # banding usually catches the near-dup
    assert 9 not in labels


def test_ivf_kmeans_centroids_recall(spark, sf_dir):
    """KMeans-centroid IVF (quality path) vs deterministic-centroid
    IVF (oracle path): same probe budget, recall@5 against brute force
    must not degrade — learned, balanced cells should match or beat
    arbitrary id<n_cells centroids."""
    from graphdb_spark.operators.similarity import cosine_topk, ivf_topk
    from graphdb_spark.sources.tpch import load_tables

    e = load_tables(spark, sf_dir)["embeddings"]
    # query ids well away from 0..n_cells: in deterministic mode those
    # ids ARE the centroids, and a query probing its own cell scores a
    # biased, trivially-high recall
    qids = [50, 150, 250, 350, 450]
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(e, qids, k=5).collect()
    }

    def recall(mode):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                e, qids, k=5, n_cells=8, n_probe=2, centroid_mode=mode
            ).collect()
        }
        return len(got & truth) / len(truth)

    r_det, r_km = recall("deterministic"), recall("kmeans")
    assert r_km >= r_det, f"kmeans recall {r_km} < deterministic {r_det}"
    assert r_km > 0.3, f"kmeans IVF recall suspiciously low: {r_km}"


def test_cosine_neardup_pairs(spark):
    """Embedding-cosine near-dup: planted near-duplicates land in the
    same LSH buckets and survive the exact-cosine threshold; orthogonal
    vectors never pair; output is (id_a < id_b, cos_sim)."""
    import random

    random.seed(11)
    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    rows.append((90, [x + 0.01 for x in rows[0][1]]))   # near-dup of 0
    rows.append((91, [x * 1.5 for x in rows[5][1]]))    # scaled dup of 5
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {(r["id_a"], r["id_b"]): r["cos_sim"]
           for r in S.cosine_neardup_pairs(
               e, threshold=0.95, n_bands=2, band_planes=4, dim=16
           ).collect()}
    assert (0, 90) in got and got[(0, 90)] > 0.99
    assert (5, 91) in got and got[(5, 91)] == 1.0   # scale-invariant
    assert all(a < b for a, b in got)
    assert all(v >= 0.95 for v in got.values())

    # an un-hit bucket_cap must be a no-op (exact semantics preserved)
    capped = {(r["id_a"], r["id_b"]): r["cos_sim"]
              for r in S.cosine_neardup_pairs(
                  e, threshold=0.95, n_bands=2, band_planes=4, dim=16,
                  bucket_cap=100
              ).collect()}
    assert capped == got


def test_cosine_neardup_bucket_cap_star_links(spark):
    """Clone attack (the sf10 failure mode, VERDICT r6): s identical
    vectors share every band bucket and owe s(s-1)/2 pairs uncapped.
    With bucket_cap < s the bucket must emit exactly s-1 STAR links
    (bucket-min -> member) — connectivity preserved, quadratic work
    gone — and clones still score cos_sim = 1.0."""
    import random

    random.seed(7)
    base = [random.uniform(-1, 1) for _ in range(16)]
    clones = [(i, base) for i in range(50)]
    # far-away singleton that must be unaffected by the cap
    other = [(900, [-x for x in base]), (901, [-x * 1.1 for x in base])]
    e = spark.createDataFrame(clones + other,
                              "vec_id bigint, embedding array<float>")
    capped = S.cosine_neardup_pairs(
        e, threshold=0.95, n_bands=2, band_planes=4, dim=16, bucket_cap=10
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in capped}
    # star fan: exactly min-id -> each other clone, nothing quadratic
    assert {(0, i) for i in range(1, 50)} <= pairs
    assert all(a == 0 for a, b in pairs if b < 900), \
        "capped clone bucket leaked a non-star pair"
    # negated pair lives in its own (small) bucket: exact all-pairs kept
    assert (900, 901) in pairs
    assert all(r["cos_sim"] == 1.0 for r in capped
               if r["id_a"] == 0)  # clones are exact dups
    # uncapped on the same data is quadratic: 50*49/2 clone pairs
    n_unc = S.cosine_neardup_pairs(
        e, threshold=0.95, n_bands=2, band_planes=4, dim=16
    ).count()
    assert n_unc == 50 * 49 // 2 + 1


def test_cosine_neardup_cap_warning(spark):
    """A firing bucket_cap must be observable (ADVICE r7) — same
    contract as near_dup_clusters: warn with over-cap bucket and
    star-pair counts; stay silent when the cap is unhit or the caller
    opted out with warn_on_cap=False."""
    import random
    import warnings

    random.seed(7)
    base = [random.uniform(-1, 1) for _ in range(16)]
    e = spark.createDataFrame([(i, base) for i in range(30)],
                              "vec_id bigint, embedding array<float>")

    def run(**kw):
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            S.cosine_neardup_pairs(
                e, threshold=0.95, n_bands=2, band_planes=4, dim=16, **kw
            ).count()
        return [str(x.message) for x in rec
                if "cosine_neardup_pairs" in str(x.message)]

    fired = run(bucket_cap=10)
    assert fired and "star links" in fired[0] and "bucket_cap=10" in fired[0]
    assert not run(bucket_cap=1000)          # cap present but unhit
    assert not run(bucket_cap=10, warn_on_cap=False)  # explicit opt-out
    assert not run()                          # no cap at all


def test_edit_verified_pairs_filters_candidates(docs, spark):
    """Verify stage must confirm true near-dups and drop candidates
    whose edit distance is too large despite shingle overlap."""
    cand = spark.createDataFrame(
        [(1, 2), (1, 4), (1, 5)], "doc_a bigint, doc_b bigint"
    )
    got = {(r["doc_a"], r["doc_b"]): (r["lev"], r["edit_sim"])
           for r in D.edit_verified_pairs(docs, cand, min_sim=0.9).collect()}
    assert got[(1, 2)] == (0, 1.0)          # exact dup: distance 0
    assert (1, 4) in got and got[(1, 4)][0] > 0   # near dup survives
    assert (1, 5) not in got                 # unrelated candidate dropped


def test_edit_verified_matches_python_levenshtein(docs, spark):
    """Spark's levenshtein must equal the textbook DP distance (this is
    what makes the DuckDB oracle twin legitimate)."""
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    cand = spark.createDataFrame([(1, 4)], "doc_a bigint, doc_b bigint")
    got = D.edit_verified_pairs(docs, cand, min_sim=0.0).collect()[0]
    assert got["lev"] == lev(rows[1], rows[4])


def test_edit_verified_empty_texts_score_one(spark):
    """Two empty texts are exact duplicates: the denominator floor
    (greatest(len_a, len_b, 1)) must make them edit_sim=1.0 instead of
    a 0/0 null that silently drops the pair (ADVICE r3)."""
    d = spark.createDataFrame([(1, ""), (2, "")], "doc_id bigint, text string")
    cand = spark.createDataFrame([(1, 2)], "doc_a bigint, doc_b bigint")
    got = D.edit_verified_pairs(d, cand, min_sim=0.9).collect()
    assert [(r["doc_a"], r["doc_b"], r["lev"], r["edit_sim"])
            for r in got] == [(1, 2, 0, 1.0)]


def test_near_dup_clusters_chain_falls_back_to_logn_cc(spark):
    """VERDICT r3 item 4: an adversarial linked chain (diameter >>
    fixpoint_budget) must not spin O(diameter) propagation rounds —
    after fixpoint_budget rounds the operator reroutes through the
    O(log n) large-star/small-star CC and still labels the whole chain
    with its min id."""
    n = 2000
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "doc_a bigint, doc_b bigint"
    ).repartition(8)
    docs = spark.createDataFrame([(0, "unused")], "doc_id bigint, text string")
    got = D.near_dup_clusters(docs, fixpoint_budget=4, pairs=chain)
    rows = got.collect()
    assert len(rows) == n
    assert {r["canonical"] for r in rows} == {1}
    assert {r["doc_id"] for r in rows} == set(range(1, n + 1))


def test_near_dup_clusters_shallow_keeps_fixpoint(spark):
    """A shallow duplicate group converges inside the budget — same
    output either way, but the fixpoint path (no fallback) handles it."""
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21)], "doc_a bigint, doc_b bigint"
    )
    docs = spark.createDataFrame([(0, "unused")], "doc_id bigint, text string")
    got = {r["doc_id"]: r["canonical"]
           for r in D.near_dup_clusters(docs, pairs=pairs).collect()}
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_substring_dup_stats_finds_lifted_paragraph(spark):
    """A long doc with one paragraph lifted verbatim from another must
    show duplicated windows exactly over the shared span — the signal
    whole-doc MinHash misses at low overall Jaccard."""
    shared = "this exact paragraph was copied verbatim between them! "
    a = ("unique opening text talks about storage engines for a while "
         + shared + "then document A continues on its own topic at length")
    b = ("completely different beginning with other words here today "
         + shared + "and document B also diverges after the lifted part")
    c = "a short standalone document with no copied content whatsoever"
    d = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r for r in
           D.substring_dup_stats(d, k=20, stride=1).collect()}
    assert got[1]["n_dup_windows"] > 0
    assert got[2]["n_dup_windows"] > 0
    assert got[3]["n_dup_windows"] == 0
    # the duplicated run ~= len(shared) - k + 1 windows on each side
    expect = len(shared) - 20 + 1
    assert abs(got[1]["n_dup_windows"] - expect) <= 2
    assert got[1]["dup_ratio"] > 0 and got[3]["dup_ratio"] == 0.0
    # doc shorter than k -> zero windows -> absent
    tiny = spark.createDataFrame([(9, "short")], "doc_id bigint, text string")
    assert D.substring_dup_stats(tiny, k=20).count() == 0


def test_substring_dup_stats_self_repeat_not_cross_doc(spark):
    """A doc repeating ITS OWN phrase is not cross-doc duplication:
    window hashes must be counted per DISTINCT doc."""
    t = "echo echo echo echo echo echo echo echo echo echo echo echo"
    d = spark.createDataFrame([(1, t)], "doc_id bigint, text string")
    rows = D.substring_dup_stats(d, k=10, stride=1).collect()
    assert rows[0]["n_dup_windows"] == 0


def test_semantic_dedup_deterministic_requires_dense_ids(spark):
    """Deterministic centroid mode derives centroids from vid < n_cells;
    sparse (non-0-based) ids would yield ZERO centroids and an empty
    crossJoin — every vector silently vanishing from a dedup operator.
    Must raise instead (ADVICE r4)."""
    import pytest

    rows = [(1000 + i, [float(i), 1.0, 0.0, 0.0]) for i in range(6)]
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="dense from 0"):
        S.semantic_dedup(e, n_cells=4, centroid_mode="deterministic")
    # kmeans mode handles arbitrary ids: every vector keeps a verdict
    out = S.semantic_dedup(e, n_cells=2, threshold=0.999,
                           centroid_mode="kmeans")
    assert out.count() == 6


def test_no_aqe_scope_is_reentrant(spark):
    """Nested _no_aqe scopes must restore the ORIGINAL session value on
    outermost exit — a naive save/restore captures the inner scope's
    'false' and disables AQE for the rest of the session (ADVICE r4)."""
    from graphdb_spark.operators.traversal import _no_aqe

    key = "spark.sql.adaptive.enabled"
    orig = spark.conf.get(key)
    spark.conf.set(key, "true")
    try:
        with _no_aqe(spark):
            assert spark.conf.get(key) == "false"
            with _no_aqe(spark):
                assert spark.conf.get(key) == "false"
            # inner exit must NOT restore yet (it captured 'false')
            assert spark.conf.get(key) == "false"
        assert spark.conf.get(key) == "true"
    finally:
        spark.conf.set(key, orig)


def test_incremental_lsh_matches_self_and_clean(spark):
    """A new doc byte-identical to a corpus doc must match it with
    est 1.0; a new doc sharing nothing must come back n_matches=0
    with NULL best columns; the store is never consulted for docs
    outside the batch."""
    from pyspark.sql import functions as F  # noqa: F401

    from graphdb_spark.operators.dedup import (
        incremental_lsh_matches,
        minhash_signatures,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "entirely different corpus text about spark partitions"),
         (3, "a third unrelated corpus document mentioning parquet")],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight"),
         (101, "zzz qqq www completely novel tokens xyzzy plugh")],
        "doc_id bigint, text string",
    )
    out = {r["new_id"]: r for r in incremental_lsh_matches(
        minhash_signatures(corpus), minhash_signatures(batch)
    ).collect()}
    assert set(out) == {100, 101}
    assert out[100]["n_matches"] >= 1
    assert out[100]["best_match"] == 1
    assert out[100]["best_est"] == 1.0
    assert out[101]["n_matches"] == 0
    assert out[101]["best_match"] is None and out[101]["best_est"] is None


def test_dedup_funnel_monotone_and_consistent(spark):
    """Stage counts/token masses are monotone non-increasing, stage-1
    equals the corpus, and the near-dup survivor count equals the
    number of self-canonical exact keepers computed directly."""
    from graphdb_spark.workloads.text import dedup_funnel

    sf = "/root/testdata/sf0.001"
    rows = {r["stage"]: r for r in dedup_funnel(spark, sf).collect()}
    assert list(rows) == ["1_input", "2_exact", "3_neardup"]
    n = [rows[s]["n_docs"] for s in rows]
    t = [rows[s]["n_tokens"] for s in rows]
    assert n[0] >= n[1] >= n[2] > 0
    assert t[0] >= t[1] >= t[2] > 0
    from graphdb_spark.sources.tpch import load_tables

    docs = load_tables(spark, sf)["documents"]
    assert rows["1_input"]["n_docs"] == docs.count()


def test_bucket_cap_star_links_preserve_clusters(spark):
    """Hot-bucket defense: with clones far above bucket_cap, capped
    candidates emit star links (s-1 rows through the bucket minimum,
    not s^2/2 all-pairs) and clustering yields the IDENTICAL
    assignment as the uncapped all-pairs run."""
    from pyspark.sql import functions as F

    from graphdb_spark.operators.dedup import (
        minhash_lsh_candidates,
        near_dup_clusters,
    )
    from graphdb_spark.sources.tpch import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"].select(
        "doc_id", "text"
    )
    one = docs.orderBy("doc_id").limit(1)
    clones = (
        spark.range(40)
        .crossJoin(F.broadcast(one.select("text")))
        .select((F.col("id") + 5_000_000).alias("doc_id"), "text")
    )
    salted = docs.unionByName(clones)
    uncapped = minhash_lsh_candidates(salted)
    capped = minhash_lsh_candidates(salted, bucket_cap=10)
    # the 41-doc clone bucket: uncapped owes 41*40/2 = 820 clone pairs,
    # capped owes exactly 40 star links from the bucket minimum
    base_id = one.first()["doc_id"]
    clone_ids = {base_id} | {5_000_000 + i for i in range(40)}
    cp = capped.filter(
        F.col("doc_a").isin(clone_ids) & F.col("doc_b").isin(clone_ids)
    )
    assert cp.count() == 40
    assert cp.filter(F.col("doc_a") != F.lit(base_id)).count() == 0
    up = uncapped.filter(
        F.col("doc_a").isin(clone_ids) & F.col("doc_b").isin(clone_ids)
    )
    assert up.count() == 41 * 40 // 2
    # clustering over star links = clustering over all-pairs, AND a
    # cap that actually fires must WARN (never silently approximate)
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        c_cap = {(r["doc_id"], r["canonical"])
                 for r in near_dup_clusters(salted, bucket_cap=10).collect()}
    assert any("star links" in str(w.message) for w in caught), \
        "over-cap bucket fired without a warning"
    with warnings.catch_warnings(record=True) as caught_none:
        warnings.simplefilter("always")
        c_all = {(r["doc_id"], r["canonical"])
                 for r in near_dup_clusters(salted, bucket_cap=None).collect()}
    assert not any("star links" in str(w.message) for w in caught_none)
    assert c_cap == c_all


def test_minhash_capped_flag_marks_star_only_pairs(spark):
    """mark_capped: pairs that exist only through an over-cap bucket's
    star links flag __capped=true; pairs also present in a small
    bucket stay false; with no cap the column is constant false."""
    from pyspark.sql import functions as F

    from graphdb_spark.operators.dedup import minhash_lsh_candidates
    from graphdb_spark.sources.tpch import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"].select(
        "doc_id", "text"
    )
    one = docs.orderBy("doc_id").limit(1)
    clones = (
        spark.range(20)
        .crossJoin(F.broadcast(one.select("text")))
        .select((F.col("id") + 5_000_000).alias("doc_id"), "text")
    )
    salted = docs.unionByName(clones)
    flagged = minhash_lsh_candidates(salted, bucket_cap=10,
                                     mark_capped=True)
    assert "__capped" in flagged.columns
    star = flagged.filter(F.col("__capped"))
    base_id = one.first()["doc_id"]
    # every clone star-links to the bucket minimum (= base_id, the
    # corpus min id); genuine corpus near-dups sharing the hot bucket
    # may add more star rows, but all must radiate from the minimum
    assert star.filter(F.col("doc_b") >= 5_000_000).count() == 20
    assert star.filter(F.col("doc_a") != F.lit(base_id)).count() == 0
    # uncapped: same call shape, constant-false flag
    unflagged = minhash_lsh_candidates(salted, mark_capped=True)
    assert unflagged.filter(F.col("__capped")).count() == 0


def test_shingles_from_tokens_equivalence(spark):
    """The materialized-token fast path produces exactly the same
    shingle arrays (distinct and with-multiplicity) as the
    convenience wrappers, including short/empty/multi-space docs."""
    from pyspark.sql import functions as F

    from graphdb_spark.operators.text import (
        shingles,
        shingles_all,
        shingles_from_tokens,
        tokens,
    )

    rows = [("a b c d e",), ("one two",), ("x",), ("  padded   doc  ",),
            ("r r r r r",)]
    df = spark.createDataFrame(rows, "text string")
    both = df.select(
        shingles(F.col("text")).alias("s_wrap"),
        shingles_all(F.col("text")).alias("sa_wrap"),
        tokens(F.lower(F.col("text"))).alias("__toks"),
    ).select(
        "s_wrap", "sa_wrap",
        shingles_from_tokens(F.col("__toks"), distinct=True).alias("s_fast"),
        shingles_from_tokens(F.col("__toks"), distinct=False).alias("sa_fast"),
    )
    for r in both.collect():
        assert r["s_wrap"] == r["s_fast"]
        assert r["sa_wrap"] == r["sa_fast"]
    # multiplicity really differs from the distinct set on repeats
    rep = both.collect()[-1]
    assert len(rep["sa_fast"]) == 3 and len(rep["s_fast"]) == 1
