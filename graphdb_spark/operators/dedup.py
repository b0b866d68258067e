"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Everything is expressed as DataFrame transformations over JVM built-ins
(explode/groupBy/join/window + the portable h64 hash) — no Python UDFs
— so each scales as a small number of shuffles:

- exact:        1 shuffle (groupBy fingerprint)
- ngram Jaccard: explode shingles → self-join on shingle → group pair
                 (the shingle join is the LSH-free exact baseline;
                 quadratic only within shingle buckets)
- MinHash+LSH:  explode shingles → per-doc signature (groupBy) →
                 band keys → self-join per band (candidate pruning
                 replaces the full cross join — the 100 TB path)
- SimHash:      explode token×bit → per-doc 32-bit signature →
                 band-bucket join on 8-bit bands → hamming filter
- embedding:    see operators/similarity.py

Determinism: minhash permutations are fixed (a_i, b_i) constants;
h64 is md5-based — the whole pipeline replays bit-identically in
DuckDB SQL (workloads/text.py carries the oracle twins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphdb_spark.operators.text import (
    MERSENNE,
    fingerprint,
    h64,
    shingles_from_tokens,
    tokens,
)

# fixed minhash permutation constants (deterministic across runs;
# odd multipliers, distinct offsets — standard (a*x+b) mod p family)
MINHASH_PERMS = [(2 * i + 1, 7919 * (i + 1)) for i in range(16)]
N_BANDS = 4
ROWS_PER_BAND = 4  # 16 = 4 bands × 4 rows


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on normalized-text fingerprint: one row per group,
    keeper = min id, with the duplicate count."""
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def _doc_shingles(docs: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    # tokens materialized in their own projection so the shingle
    # lambda reads a bound attribute — an inline split re-runs per
    # shingle position (see shingles_from_tokens, measured 7.4x)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.lower(F.col(text_col))).alias("__toks"),
    ).select(
        "doc_id",
        F.explode(
            shingles_from_tokens(F.col("__toks"), k, distinct=True)
        ).alias("shingle"),
    )


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard similarity via shingle-join: pairs with
    |A∩B| / |A∪B| >= threshold. The join on shingle means cost is
    sum over shingles of (docs-per-shingle)^2 — fine when shingles are
    discriminative; use minhash_lsh_candidates when they aren't.

    r10: the join keys on xxhash64(shingle) longs instead of the
    ~25-byte shingle strings (the tfidf posting trick): every keyed
    exchange and probe moves 8-byte keys, and the mapping is
    semantically a no-op for any injective-on-the-data hash — the
    DuckDB twin deliberately keys on the RAW strings so a 64-bit
    collision would surface as a value diff, not be baked into both
    sides."""
    sh = _doc_shingles(docs, text_col, id_col, k).select(
        "doc_id", F.xxhash64("shingle").alias("h")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.h") == F.col("b.h"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("shared")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "shared", "jaccard")
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Per-doc minhash signature: for each permutation i,
    min over shingles of (a_i * h64(shingle) + b_i) mod p."""
    sh = _doc_shingles(docs, text_col, id_col, k).withColumn(
        "h", h64(F.col("shingle"))
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MERSENNE)).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def band_buckets(sig: DataFrame) -> DataFrame:
    """(doc_id, band_key): explode the 16-slot signature into its 4
    banded bucket keys — the band id is baked into the key so buckets
    can't collide across bands. One shuffle-ready (key, doc) table is
    the shape that survives 100 TB: bucket equi-join only, never a
    cross join; and the table is exactly what a persisted LSH index
    stores."""
    band_keys = F.array(
        *[
            F.concat_ws(
                "_",
                F.lit(bi),
                *[F.col(f"mh{bi * ROWS_PER_BAND + r}")
                  for r in range(ROWS_PER_BAND)],
            )
            for bi in range(N_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(band_keys).alias("band_key"))


def incremental_lsh_matches(corpus_sig: DataFrame,
                            new_sig: DataFrame) -> DataFrame:
    """Incremental dedup against an existing corpus sketch store: for
    every NEW-batch doc, the corpus docs it LSH-collides with, scored
    by signature agreement. (new_id, n_matches, best_match, best_est)
    — n_matches = 0 rows mean clean-to-ingest.

    This is the PRODUCTION dedup topology at 100 TB: the corpus's
    minhash signatures/buckets are computed once and persisted
    (sketch-store, see minhash_lsh_candidates); each arriving batch
    computes only ITS signatures and probes the store — the corpus
    text is never re-read, the corpus side never re-hashed. The batch
    side of the bucket join broadcasts while provably small (informed
    by an exact count of the already-materialized signatures), so a
    daily increment probes the bucket table map-side with zero corpus
    shuffle; above the cap it degrades to the keyed equi-join."""
    from graphdb_spark.operators.traversal import _maybe_broadcast

    mh_cols = [f"mh{i}" for i in range(len(MINHASH_PERMS))]
    n_new = new_sig.count()
    nb = band_buckets(new_sig).withColumnRenamed("doc_id", "new_id")
    cb = band_buckets(corpus_sig).withColumnRenamed("doc_id", "corpus_id")
    cand = (
        _maybe_broadcast(nb, n_new * N_BANDS)
        .join(cb, "band_key")
        .select("new_id", "corpus_id")
        .dropDuplicates(["new_id", "corpus_id"])
    )
    sa = new_sig.select(
        F.col("doc_id").alias("new_id"),
        *[F.col(c).alias(f"a_{c}") for c in mh_cols],
    )
    sb = corpus_sig.select(
        F.col("doc_id").alias("corpus_id"),
        *[F.col(c).alias(f"b_{c}") for c in mh_cols],
    )
    agree = sum(
        F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), 1).otherwise(0)
        for c in mh_cols
    )
    scored = (
        cand.join(sa, "new_id")
        .join(sb, "corpus_id")
        .select(
            "new_id", "corpus_id",
            F.round(agree / F.lit(float(len(mh_cols))), 6).alias("est"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("new_id").orderBy(F.desc("est"), F.asc("corpus_id"))
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("new_id", F.col("corpus_id").alias("best_match"),
                F.col("est").alias("best_est"))
    )
    counts = scored.groupBy("new_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches")
    )
    return (
        new_sig.select(F.col("doc_id").alias("new_id"))
        .join(counts, "new_id", "left")
        .join(best, "new_id", "left")
        .na.fill({"n_matches": 0})
        .select("new_id", "n_matches", "best_match", "best_est")
    )


def minhash_lsh_candidates(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 3,
                           min_est: float = 0.0,
                           sig: DataFrame | None = None,
                           bucket_cap: int | None = None,
                           mark_capped: bool = False) -> DataFrame:
    """MinHash LSH: band the 16-slot signature into 4 bands of 4; any
    pair sharing a band key is a candidate; estimated similarity =
    fraction of agreeing signature slots. At scale the band join
    touches only colliding buckets (no cross join anywhere).

    ``sig``: optionally a precomputed signature table (the
    sketch-store pattern — real pipelines persist per-doc minhash
    signatures once and reuse them across dedup jobs); when absent the
    signatures are computed and materialized here (localCheckpoint,
    GC-reclaimed — a bare .cache() would pin executor storage until an
    explicit unpersist).

    ``bucket_cap``: hot-bucket skew defense. A bucket of s docs owes
    s(s-1)/2 pairs from ONE join key — 5,000 near-identical docs
    is 12.5M pairs in one task (measured 15.8x wall blow-up at
    sf0.1). Above the cap a bucket emits STAR links (bucket-min ->
    member, s-1 pairs) instead of all-pairs: connectivity through the
    bucket is preserved (what clustering consumes), while non-star
    pairs that only co-occur in capped buckets are not emitted — the
    standard oversized-bucket approximation, so the default None
    keeps exact all-pairs semantics (real corpus buckets top out at
    19 docs through sf1; the cap only exists for adversarial mass).

    ``mark_capped``: append a boolean ``__capped`` column — true iff
    the pair exists ONLY through star links of over-cap buckets (i.e.
    it is part of the approximation, not the exact candidate set).
    Callers that default a cap use it to WARN when the cap actually
    fired, so approximate output is never silently indistinguishable
    from exact (ADVICE r6)."""
    if sig is None:
        sig = minhash_signatures(docs, text_col, id_col, k).localCheckpoint(
            eager=False
        )
    mh_cols = [f"mh{i}" for i in range(len(MINHASH_PERMS))]
    buckets = band_buckets(sig)
    if bucket_cap is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("band_key")
        sized = buckets.select(
            "doc_id",
            "band_key",
            F.count(F.lit(1)).over(w).alias("__bsz"),
            F.min("doc_id").over(w).alias("__bmin"),
        )
        small = sized.filter(F.col("__bsz") <= bucket_cap).select(
            "doc_id", "band_key"
        )
        # star orientation is canonical: __bmin < doc_id by definition
        star = (
            sized.filter((F.col("__bsz") > bucket_cap)
                         & (F.col("doc_id") != F.col("__bmin")))
            .select(F.col("__bmin").alias("doc_a"),
                    F.col("doc_id").alias("doc_b"))
        )
        a, b = small.alias("a"), small.alias("b")
        allp = a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        if mark_capped:
            # min over {star=true, all-pairs=false}: a pair also seen
            # in a small bucket is exact, so only star-ONLY pairs flag.
            # Same pair-key shuffle as the dropDuplicates it replaces.
            pairs = (
                allp.withColumn("__capped", F.lit(False))
                .unionByName(star.withColumn("__capped", F.lit(True)))
                .groupBy("doc_a", "doc_b")
                .agg(F.min("__capped").alias("__capped"))
            )
        else:
            pairs = allp.unionByName(star).dropDuplicates(["doc_a", "doc_b"])
    else:
        a = buckets.alias("a")
        b = buckets.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .dropDuplicates(["doc_a", "doc_b"])
        )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(c).alias(f"a_{c}") for c in mh_cols],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(c).alias(f"b_{c}") for c in mh_cols],
    )
    matches = sum(
        F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), 1).otherwise(0) for c in mh_cols
    )
    out_cols = ["doc_a", "doc_b", "est_jaccard"]
    if mark_capped:
        if bucket_cap is None:
            pairs = pairs.withColumn("__capped", F.lit(False))
        out_cols.append("__capped")
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "est_jaccard",
            F.round(matches / F.lit(float(len(mh_cols))), 6),
        )
        .filter(F.col("est_jaccard") >= min_est)
        .select(*out_cols)
    )


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """Per-doc SimHash over token h64 hashes: bit j of the signature is
    1 iff sum over tokens of (+1/-1 for bit j of h64(token)) > 0.
    Expressed as explode(token) × explode(bit) → two groupBys —
    linear in corpus size."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).withColumn("h", h64(F.col("tok")))
    bit = tok.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
    ).withColumn(
        # shiftright/shiftleft builtins need a literal shift amount in
        # the Python API; use SQL expressions for column-valued shifts
        "sign",
        F.when(F.expr("(shiftright(h, j) & 1) = 1"), 1).otherwise(-1),
    )
    return (
        bit.groupBy("doc_id", "j")
        .agg(F.sum("sign").alias("s"))
        .withColumn("bitval", F.when(F.col("s") > 0, 1).otherwise(0))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.expr("shiftleft(cast(bitval AS bigint), j)")
            ).alias("simhash")
        )
    )


def simhash_near_pairs(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: bucket by 8-bit bands (pigeonhole — any
    pair within hamming<=3 of a 32-bit hash shares at least one of 4
    bands), then exact hamming via bit_count(xor)."""
    sig = simhash(docs, text_col, id_col)
    # one bucket join over exploded (band_no, 8-bit value) keys instead
    # of 4 self-joins (see minhash_lsh_candidates for the rationale)
    buckets = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        F.lit(b),
                        F.shiftright(F.col("simhash"), 8 * b).bitwiseAND(F.lit(255)),
                    )
                    for b in range(4)
                ]
            )
        ).alias("band_key"),
    )
    a_ = buckets.alias("a")
    b_ = buckets.alias("b")
    cands = a_.join(
        b_,
        (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.simhash").alias("sh_a"),
        F.col("b.simhash").alias("sh_b"),
    )
    return (
        cands.dropDuplicates(["doc_a", "doc_b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


#: hot-bucket cap for the CLUSTERING path: real corpus buckets top out
#: at 19 docs through sf1, so 200 is inert on non-adversarial data;
#: above it a bucket's members star-link to the bucket minimum
#: (connectivity preserved — what clustering consumes) instead of
#: exploding s^2/2 pairs in one task (measured 15x wall at sf0.1 with
#: 5k clones; 1.1x with the cap — scripts/skew_stress.py).
CLUSTER_BUCKET_CAP = 200


def near_dup_clusters(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 3,
                      min_est: float = 0.25,
                      max_iter: int = 20,
                      fixpoint_budget: int = 8,
                      sig: DataFrame | None = None,
                      pairs: DataFrame | None = None,
                      bucket_cap: int | None = CLUSTER_BUCKET_CAP) -> DataFrame:
    """Near-duplicate CLUSTERS: MinHash-LSH candidate pairs above
    ``min_est`` become edges; connected components via iterative min-id
    propagation; canonical doc = smallest doc_id in the cluster.
    Returns (doc_id, canonical) for every document that has at least
    one near-duplicate. This is the training-pipeline step after
    candidate generation: pick one representative per duplicate group.

    Iterates to the true fixpoint (converges in O(cluster diameter)
    shuffle joins — near-dup clusters are shallow), so the result is
    deterministic and replayable as a recursive SQL closure. Scale
    shape: candidate edges only (never all-pairs); each iteration is
    one equi-join + grouped min.

    Insurance against adversarial chains (VERDICT r3): if the fixpoint
    has not converged after ``fixpoint_budget`` rounds, the cluster
    diameter is pathological (e.g. a 10k-doc linked chain, where min-id
    propagation would need 10k rounds) — switch to the O(log n)
    large-star/small-star CC (traversal.connected_components_large)
    over the same candidate edges. Both algorithms label every
    component by its min vertex id, so the fallback is
    result-identical, just a different round complexity.

    ``bucket_cap`` (default CLUSTER_BUCKET_CAP): oversized LSH buckets
    star-link to the bucket minimum instead of emitting s^2/2 pairs —
    inert on real corpora (see the constant's note), and on adversarial
    clone mass it keeps the bucket connected through its minimum. The
    documented approximation: a member whose est to the bucket-min
    falls below ``min_est`` while its est to some OTHER member passes
    would lose that link — only possible when an over-cap bucket is
    heterogeneous, which contradicts how 200+ docs come to share an
    entire minhash band."""
    if pairs is None:
        pairs = minhash_lsh_candidates(docs, text_col, id_col, k,
                                       sig=sig,
                                       bucket_cap=bucket_cap,
                                       mark_capped=bucket_cap is not None
                                       ).filter(
            F.col("est_jaccard") >= min_est
        )
    from graphdb_spark.operators.traversal import _maybe_broadcast, _rightsize

    # ONE materialization job yields the pair count (sym = 2× it) AND,
    # when a cap is in force, how many pairs are star-link
    # approximations — so a defaulted cap that actually fires is
    # WARNED about instead of silently changing semantics (ADVICE r6).
    pairs = pairs.localCheckpoint(eager=False)
    if "__capped" in pairs.columns:
        stats = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("__capped").cast("long")).alias("nc"),
        ).first()
        n_pairs, n_capped = stats["n"], stats["nc"] or 0
        if n_capped:
            import warnings

            warnings.warn(
                f"near_dup_clusters: {n_capped} of {n_pairs} candidate "
                f"pairs come only from star links of LSH buckets over "
                f"bucket_cap={bucket_cap}; clusters through those "
                f"buckets are connectivity-preserving approximations "
                f"of the exact all-pairs result",
                stacklevel=2,
            )
        pairs = pairs.drop("__capped")
    else:
        n_pairs = pairs.count()
    sym = (
        pairs.select(F.col("doc_a").alias("id"), F.col("doc_b").alias("nbr"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("id"), F.col("doc_a").alias("nbr"))
        )
    )
    # labels/sym are checkpoint-RDD-backed (no size stats): Spark would
    # SMJ-shuffle both sides every iteration. Label tables are bounded
    # by the duplicate-doc count — broadcast them while provably small,
    # and right-size the checkpointed partitions to the measured counts
    # (same adaptive rules as operators.traversal).
    sym = _rightsize(sym, 2 * n_pairs)
    # iteration 0 fused into the init: label = min(id, min neighbor) —
    # one grouped agg instead of identity labels + a full join round
    labels = (
        sym.groupBy("id")
        .agg(F.least(F.col("id"), F.min("nbr")).alias("canonical"))
        .localCheckpoint(eager=False)
    )
    # r10: size by the 2*n_pairs BOUND instead of an exact count —
    # |labels| = |distinct ids| <= 2*n_pairs always (each pair carries
    # two ids). Tight for sparse near-dup graphs (~2x), loose for
    # dense cliques — where the only consequence is a forgone
    # broadcast hint and a coarser _rightsize estimate, never a wrong
    # result. The exact count was a full extra pass over the label
    # table at every scale; the lazy checkpoint still materializes
    # exactly once, at iteration 1's first use.
    n_labels = 2 * n_pairs
    labels = _rightsize(labels, n_labels)
    converged = False
    from graphdb_spark.operators.traversal import _no_aqe

    with _no_aqe(docs.sparkSession):
        for _ in range(min(max_iter, fixpoint_budget)):
            prop = (
                sym.join(
                    _maybe_broadcast(
                        labels.withColumnRenamed("id", "nbr"), n_labels
                    ),
                    "nbr",
                )
                .groupBy("id")
                .agg(F.min("canonical").alias("nmin"))
            )
            prop = _maybe_broadcast(prop, n_labels)  # ≤ one row per id
            # carry a changed flag (min-propagation only lowers labels),
            # so ONE lazy-checkpoint + count job both materializes the
            # iteration and answers convergence — the old eager
            # checkpoint + self-join diff + isEmpty was 2 jobs and an
            # extra shuffle
            nxt = F.least(
                F.col("canonical"), F.coalesce("nmin", F.col("canonical"))
            )
            new_labels = (
                labels.join(prop, "id", "left")
                .select(
                    "id",
                    nxt.alias("canonical"),
                    (nxt < F.col("canonical")).alias("__chg"),
                )
                .localCheckpoint(eager=False)
            )
            n_changed = new_labels.filter(F.col("__chg")).count()
            labels = _rightsize(new_labels, n_labels).drop("__chg")
            if n_changed == 0:
                converged = True
                break
    if not converged:
        from graphdb_spark.operators.traversal import (  # noqa: PLC0415
            connected_components_large,
        )

        comp = connected_components_large(
            pairs.select(F.col("doc_a").alias("src"),
                         F.col("doc_b").alias("dst")),
        )
        return comp.select(F.col("id").alias(id_col),
                           F.col("component").alias("canonical"))
    return labels.select(F.col("id").alias(id_col), "canonical")


def edit_verified_pairs(docs: DataFrame, candidates: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        min_sim: float = 0.9) -> DataFrame:
    """Candidate-generate -> exact-verify near-dup pattern (the shape
    every production dedup pipeline uses: a cheap recall stage feeds an
    expensive precision stage). ``candidates`` is any (doc_a, doc_b)
    pair source — LSH buckets, shingle joins, embedding bands; this
    stage joins the texts back and keeps pairs whose normalized edit
    similarity  1 - lev(a,b) / max(len(a), len(b))  >= ``min_sim``.

    Scale: Levenshtein is O(len_a * len_b) per pair — NEVER run it
    all-pairs; cost here is |candidates|, which the recall stage keeps
    near-linear. The two text joins are broadcast-or-shuffle hash
    joins on the id; texts never shuffle more than the candidate set.

    Cross-engine note: Spark's ``levenshtein``/``length`` count
    CHARACTERS while DuckDB's count BYTES, so ``edit_sim`` (and the
    min_sim cut) can diverge on non-ASCII text — exact oracle replay
    assumes ASCII (the testdata corpus is); pre-normalize text if
    feeding multibyte corpora through a byte-based twin.
    """
    ta = docs.select(F.col(id_col).alias("doc_a"),
                     F.col(text_col).alias("__ta"))
    tb = docs.select(F.col(id_col).alias("doc_b"),
                     F.col(text_col).alias("__tb"))
    return (
        candidates.select("doc_a", "doc_b")
        .join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("lev", F.levenshtein("__ta", "__tb").cast("bigint"))
        .withColumn(
            "edit_sim",
            F.round(
                F.lit(1.0)
                - F.col("lev")
                # greatest(..., 1): two empty texts would otherwise be
                # 0/0 -> null edit_sim and silently drop an exact-dup
                # pair; with the floor they score lev=0, edit_sim=1.0
                / F.greatest(
                    F.length("__ta"), F.length("__tb"), F.lit(1)
                ).cast("double"),
                6,
            ),
        )
        .filter(F.col("edit_sim") >= min_sim)
        .select("doc_a", "doc_b", "lev", "edit_sim")
    )


def substring_dup_stats(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 50,
                        stride: int = 1) -> DataFrame:
    """Cross-document EXACT-substring duplication (the Lee et al.
    "Deduplicating Training Data Makes Language Models Better" signal,
    char-granular): every k-char window (at ``stride``) is hashed; a
    window hash seen in >= 2 DISTINCT documents marks a duplicated
    span. Per document: window count, duplicated-window count, and the
    duplication ratio — the score a training pipeline cuts or trims on.
    Catches copied paragraphs that whole-doc MinHash misses (a long doc
    with one lifted paragraph has low Jaccard but a solid run of
    duplicated windows).

    Scale: the explode carries (h64, doc_id) only — 16 bytes/window,
    never the text; stride divides the blowup (stride=k/2 gives 2x
    coverage redundancy instead of k-x). Two keyed shuffles: hash ->
    distinct-doc count (map-side combinable), then one hash-keyed
    join back. No all-pairs anywhere; skew-safe because a window hash
    hot enough to skew IS the boilerplate being hunted and aggregates
    before the join. Exact replay: windows are substring() + the
    portable h64, both bit-identical in DuckDB."""
    from graphdb_spark.operators.text import h64

    # guard short texts: sequence(1, 0, +stride) raises in Spark — a
    # doc shorter than k chars has zero windows (and no output row)
    idx = F.when(
        F.length(text_col) >= k,
        F.sequence(
            F.lit(1), F.length(text_col) - F.lit(k) + 1, F.lit(stride)
        ),
    ).otherwise(F.expr("array()").cast("array<int>"))
    wins = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.transform(
                    idx, lambda i: F.col(text_col).substr(i, F.lit(k))
                )
            ).alias("win"),
        )
        .select("doc_id", h64(F.col("win")).alias("h"))
    )
    cross = (
        wins.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("h")
    )
    return (
        wins.join(cross.withColumn("__dup", F.lit(1)), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.coalesce("__dup", F.lit(0))).cast("bigint")
            .alias("n_dup_windows"),
        )
        .withColumn(
            "dup_ratio",
            F.round(
                F.col("n_dup_windows")
                / F.greatest(F.col("n_windows"), F.lit(1)).cast("double"),
                6,
            ),
        )
    )
