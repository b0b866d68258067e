"""Text-analysis operators for training-data pipelines (north-star
extras, SURVEY.md §7.2 M8): tokenization, quality scoring, language
ID, fingerprinting.

All pure `pyspark.sql.functions` column expressions — JVM-side, inside
whole-stage codegen, no Python UDFs — so they run at full scan speed on
100 TB of documents. Each returns a Column (composable into any plan).

The portable hash: ``h64(s)`` = first 8 hex chars of md5 → BIGINT.
md5 is bit-identical everywhere (Spark, DuckDB, Python), which is what
lets the DuckDB oracle replay dedup/fingerprint pipelines exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MERSENNE = 2147483647  # 2^31-1, modulus for minhash permutations

# small multilingual stopword lists for the lang-id heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "que", "pour"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ein", "für"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "他", "这", "中"],
}


def h64(col: Column) -> Column:
    """Portable 32-bit-in-a-64 hash: ('0x'+md5[:8])::bigint.
    Identical in DuckDB: ('0x' || substr(md5(x),1,8))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (array<string>)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


# BPE-ish pre-tokenization pattern (GPT-2 style, lookahead-free so it
# runs identically under Java regex and RE2/DuckDB): letter runs,
# digit runs, punctuation runs — each with optional leading space.
BPE_PATTERN = r" ?\p{L}+| ?\p{N}+| ?[^\p{L}\p{N}\s]+"


def bpe_token_count(text: Column) -> Column:
    """Approximate LLM token count via BPE-style pre-tokenization
    (regexp match count — JVM-side, no tokenizer library)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0))
    ).cast("bigint")


def char_count(text: Column) -> Column:
    return F.length(text).cast("bigint")


def avg_token_len(text: Column) -> Column:
    """Mean token length, rounded for cross-engine stability."""
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return F.round(total.cast("double") / F.size(toks), 6)


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    stripped = F.regexp_replace(text, r"[\p{L}\p{N}\s]", "")
    return F.round(
        F.length(stripped).cast("double") / F.greatest(F.length(text), F.lit(1)), 6
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    words = LANG_STOPWORDS[lang]
    toks = tokens(F.lower(text))
    hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
    # distinct-stopword coverage (array_intersect dedups) — stable and
    # cheap; a frequency-weighted variant would explode tokens instead.
    return F.round(hits.cast("double") / F.lit(len(words)), 6)


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band + low punct +
    stopword coverage (the usual pre-training quality gates)."""
    n = char_count(text)
    length_ok = F.when((n >= 200) & (n <= 50000), 1.0).otherwise(0.5)
    punct_ok = F.when(punct_ratio(text) < 0.1, 1.0).otherwise(0.3)
    stop_ok = F.when(stopword_ratio(text) > 0.2, 1.0).otherwise(0.6)
    return F.round((length_ok + punct_ok + stop_ok) / 3.0, 6)


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword-coverage score per language (n-gram-free heuristic
    lang-ID; deterministic, SQL-replayable)."""
    return {lang: stopword_ratio(text, lang) for lang in LANG_STOPWORDS}


def lang_id(text: Column) -> Column:
    """argmax over language scores; ties broken by language code order
    (alphabetical CASE chain — trivially replayable as SQL)."""
    scores = lang_scores(text)
    m = F.greatest(*scores.values())
    expr = None
    for lang in sorted(scores):
        cond = scores[lang] == m
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr


def fingerprint(text: Column) -> Column:
    """Document fingerprint: h64 of the normalized text (lowercase,
    punctuation stripped, whitespace collapsed) — rolling-hash-class
    dedup key, exact-replayable in SQL."""
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(text)), r"[^\p{L}\p{N}\s]", ""),
        r"\s+",
        " ",
    )
    return h64(norm)


def shingles_from_tokens(toks: Column, k: int = 3,
                         distinct: bool = True) -> Column:
    """k-word shingles (array<string>) from an ALREADY-MATERIALIZED
    token array column. PASS A BOUND ATTRIBUTE (a column projected in
    a prior select), not an inline split(...) expression: higher-order
    lambdas re-evaluate captured expressions PER ELEMENT, so an inline
    tokenizer runs once per shingle POSITION — measured 7.4x slower
    (4.5 s vs 0.6 s) through the tf explode at sf1. A separate select
    materializes the array once per row; CollapseProject leaves the
    boundary alone because the lambda references it k+1 times.

    try_element_at per position instead of slice: slice allocates a
    k-element array per shingle; direct indexing is ~30% faster
    through the tf explode (measured 2.44 s -> 1.72 s at sf0.1).
    concat_ws skips the NULLs try_element_at returns past the end, so
    short docs produce the same partial shingle as the slice form —
    plain element_at THROWS there under Spark 4's default ANSI mode
    (latent: the test corpora have no sub-k docs; caught by
    test_shingles_from_tokens_equivalence's 1-token row)."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.try_element_at(toks, i + j + 1)
                                     for j in range(k)]),
    )
    return F.array_distinct(sh) if distinct else sh


def shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles as array<string> (distinct). PERF HAZARD: this
    inlines the tokenizer inside the shingle lambda, re-running it per
    position — fine for one-off expressions, but hot paths must
    materialize tokens in a prior select and use shingles_from_tokens
    (see its docstring for the measured 7.4x)."""
    return shingles_from_tokens(tokens(F.lower(text)), k, distinct=True)


def shingles_all(text: Column, k: int = 3) -> Column:
    """k-word shingles WITH multiplicity (array<string>) — the term
    stream for tf-weighted models (tf-idf), where `shingles`' distinct
    set feeds set-similarity (Jaccard/MinHash). Same perf hazard as
    `shingles`: hot paths should materialize tokens first and call
    shingles_from_tokens(toks, k, distinct=False)."""
    return shingles_from_tokens(tokens(F.lower(text)), k, distinct=False)


def chunk_texts(text: Column, k: int = 8) -> Column:
    """Non-overlapping k-token chunks as array<string> — the
    "paragraph" unit for line/passage-level dedup (CCNet-style
    boilerplate removal). Pure array expressions: no explode, no
    shuffle, until the caller chooses to explode for the corpus-wide
    frequency count. The trailing partial chunk is kept (slice
    truncates past the end on both engines)."""
    toks = tokens(text)
    n_chunks = F.ceil(F.size(toks) / F.lit(k)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i * k + 1, k)),
    )


def ngram_texts(text: Column, k: int = 8) -> Column:
    """Sliding k-token n-grams (stride 1, NOT distinct) — the
    contamination-check unit. Caller must filter token_count >= k;
    shorter docs would yield one truncated gram."""
    toks = tokens(text)
    return F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )


# ---- Gopher-style document quality rules ---------------------------
# Published Gopher (Rae et al. 2021) repetition/quality bounds; the
# rules that need line structure (bullet/ellipsis line ratios) are
# collapsed into the symbol ratio since the corpus is line-free.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_RATIO = 0.80
GOPHER_MIN_STOP_HITS = 2

#: hash marks and ellipses per word — Gopher's symbol-to-word signal.
SYMBOL_PATTERN = r"#|\.\.\."


def symbol_word_ratio(text: Column) -> Column:
    """Symbol-to-word ratio: (# + ellipsis occurrences) / word count."""
    n_sym = F.size(F.regexp_extract_all(text, F.lit(SYMBOL_PATTERN), F.lit(0)))
    return F.round(
        n_sym.cast("double") / F.greatest(token_count(text), F.lit(1)), 6
    )


def alpha_word_ratio(text: Column) -> Column:
    """Fraction of words containing at least one letter (any script)."""
    toks = tokens(text)
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike(r"\p{L}")))
    return F.round(
        n_alpha.cast("double") / F.greatest(F.size(toks), F.lit(1)), 6
    )


def stopword_hits(text: Column, lang: str = "en") -> Column:
    """How many distinct stopwords of `lang` the document contains
    (presence count, not frequency — array_intersect dedups)."""
    toks = tokens(F.lower(text))
    lits = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.array_intersect(toks, lits)).cast("bigint")


def gopher_pass(
    n_words: Column,
    mean_len: Column,
    sym_ratio: Column,
    alpha_ratio: Column,
    stop_hits: Column,
) -> Column:
    """All five Gopher rules as one 0/1 flag (from precomputed
    signal columns so callers can report both signals and verdict)."""
    ok = (
        (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS)
        & (mean_len >= GOPHER_MIN_MEAN_LEN)
        & (mean_len <= GOPHER_MAX_MEAN_LEN)
        & (sym_ratio < GOPHER_MAX_SYMBOL_RATIO)
        & (alpha_ratio > GOPHER_MIN_ALPHA_RATIO)
        & (stop_hits >= GOPHER_MIN_STOP_HITS)
    )
    return F.when(ok, 1).otherwise(0).cast("bigint")


# ---- PII detection / redaction -------------------------------------
# Patterns restricted to syntax with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): literal classes, bounded repeats,
# \d and ASCII \b only — no lookarounds, no backrefs.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # name -> (pattern, replacement token); order matters for
    # redaction (SSN before phone: both are digit-dash shapes)
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
}


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII pattern (JVM regexp_extract_all)."""
    pat, _ = PII_PATTERNS[kind]
    return F.size(
        F.regexp_extract_all(text, F.lit(pat), F.lit(0))
    ).cast("bigint")


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its type token, applying the
    patterns in PII_PATTERNS order (deterministic; the DuckDB twin
    chains regexp_replace(..., 'g') in the same order)."""
    out = text
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


# URL handling (C4/RefinedWeb-style URL filtering). RE2-portable
# syntax only, like PII_PATTERNS, so the DuckDB oracle replays the
# identical patterns.
URL_RE = r"(?i)https?://[^\s]+"
_URL_HOST_RE = r"(?i)https?://([^/:?#\s]+)"


def extract_urls(text: Column) -> Column:
    """All http(s) URLs in the text, in order (JVM regexp — codegen)."""
    # idx=0 (whole match): Spark's default group index is 1, which
    # errors on a group-less pattern; DuckDB's default is already 0
    return F.regexp_extract_all(text, F.lit(URL_RE), 0)


def url_host(url: Column) -> Column:
    """Lowercased host with any leading ``www.`` stripped — the
    grouping key for per-domain caps, blocklists, and crawl stats."""
    return F.regexp_replace(
        F.lower(F.regexp_extract(url, _URL_HOST_RE, 1)), r"^www\.", ""
    )


def normalize_url(url: Column) -> Column:
    """Canonical form for URL-level dedup: query string and fragment
    dropped, lowercased. (Full RFC 3986 normalization needs a parser;
    this is the deterministic subset both engines replay exactly.)"""
    return F.lower(F.regexp_replace(url, r"[?#].*", ""))


# BM25 (Okapi) full-text relevance — the classic inverted-index
# ranking function, computed WITHOUT materializing an inverted index:
# per-document term frequencies come from higher-order array functions
# over the token array (map-side, zero shuffle, stays in codegen), so
# the only shuffles in a BM25 top-k are two scalar aggregates (corpus
# size + per-term document frequencies, both a handful of rows) and
# the final TakeOrdered. At 100 TB this is one scan + broadcast-sized
# stats — the inverted index the reference would build is replaced by
# Parquet predicate pushdown + the array filter.
BM25_K1 = 1.2
BM25_B = 0.75


def term_freq(toks: Column, term: str) -> Column:
    """Occurrences of ``term`` in the token array (JVM higher-order
    filter — no explode, no shuffle)."""
    return F.size(F.filter(toks, lambda t: t == F.lit(term))).cast("bigint")


def bm25_idf(n_docs: Column, df: Column) -> Column:
    """Robertson/Sparck-Jones idf with the Lucene +1 smoothing (always
    positive, even for terms in more than half the corpus)."""
    return F.log(
        F.lit(1.0)
        + (n_docs.cast("double") - df + F.lit(0.5)) / (df + F.lit(0.5))
    )


def bm25_weight(tf: Column, dl: Column, avgdl: Column,
                k1: float = BM25_K1, b: float = BM25_B) -> Column:
    """Per-term BM25 saturation weight tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))."""
    tfd = tf.cast("double")
    return (tfd * (k1 + 1.0)) / (
        tfd + k1 * (1.0 - b + b * dl.cast("double") / avgdl)
    )
