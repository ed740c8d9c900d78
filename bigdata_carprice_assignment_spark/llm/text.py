"""Text-analysis operators for large-scale training-data pipelines
(driver north star: language-ID, quality scoring, token counting,
document fingerprinting).

All pure Column expressions (WholeStageCodegen, no Python in the hot
path): at 100 TB these run as a single narrow projection over the
documents scan with columns pruned to (id, text).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal per-language stopword lists for the n-gram/stopword-hit
# language heuristic. Deliberately tiny (the heuristic must be cheap and
# deterministic); real pipelines would swap in fastText & co. outside
# this repo's dependency budget.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "for", "with", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "nicht"],
}
ENGLISH_STOPWORDS = STOPWORDS["en"]


def bind_once(expr: Column, fn) -> Column:
    """Evaluate ``expr`` exactly once per row and pass the VALUE to
    ``fn`` as a lambda variable.

    Why: referencing a Column expression inside a higher-order-function
    lambda inlines the whole expression tree into the lambda body, which
    the interpreter then re-evaluates on EVERY lambda call — e.g. a
    token-array expression (two regexes + split) referenced from a
    per-gram ``transform`` lambda re-tokenizes the document once per
    gram (measured 3× the entire MinHash pipeline cost). Wrapping the
    expression as the single element of a ``transform`` input array
    binds its evaluated value to the lambda variable, so inner lambdas
    reference a computed array, not the expression tree."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization (empty string → empty array, not [''])."""
    c = F.col(col) if isinstance(col, str) else col
    return bind_once(
        F.trim(c),
        lambda trimmed: F.when(
            trimmed == "", F.array().cast("array<string>")
        ).otherwise(F.split(trimmed, r"\s+")),
    )


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: str | Column) -> Column:
    """Sub-word-ish token count: splits on word/number/punctuation
    boundaries (a BPE-like upper bound on whitespace tokens) — the cheap
    proxy pipelines use for budget estimates before real tokenization."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0)
    return F.size(pieces)


def _count_in(tok: Column, words: list[str]) -> Column:
    wordlist = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tok, lambda t: F.array_contains(wordlist, F.lower(t))))


def quality_features(col: str | Column) -> dict[str, Column]:
    """Quality-scoring components: length, token stats, punctuation /
    digit / uppercase / stopword ratios (null-safe; empty text → 0s)."""
    c = F.col(col) if isinstance(col, str) else col
    tok = tokens(c)
    n_chars = F.length(c)
    n_tokens = F.size(tok)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / safe_tokens)
        .otherwise(F.lit(0.0)),
        "punct_ratio": F.regexp_count(c, F.lit(r"[^\w\s]")) / safe_chars,
        "digit_ratio": F.regexp_count(c, F.lit(r"[0-9]")) / safe_chars,
        "upper_ratio": F.regexp_count(c, F.lit(r"[A-Z]")) / safe_chars,
        "stopword_ratio": _count_in(tok, ENGLISH_STOPWORDS) / safe_tokens,
    }


def quality_score(col: str | Column) -> Column:
    """Scalar quality score in [0,1]: rewards stopword presence and sane
    length, penalizes punctuation/digit noise — the standard cheap-filter
    shape (cf. C4/Gopher-style heuristics, re-derived with simple
    weights)."""
    f = quality_features(col)
    length_ok = F.when((f["n_tokens"] >= 5) & (f["n_tokens"] <= 100000), 1.0).otherwise(
        0.3
    )
    score = (
        0.4 * length_ok
        + 0.3 * F.least(f["stopword_ratio"] * 4.0, F.lit(1.0))
        + 0.2 * (1.0 - F.least(f["punct_ratio"] * 4.0, F.lit(1.0)))
        + 0.1 * (1.0 - F.least(f["digit_ratio"] * 4.0, F.lit(1.0)))
    )
    return F.least(F.greatest(score, F.lit(0.0)), F.lit(1.0))


def lang_scores(col: str | Column) -> dict[str, Column]:
    """Per-language evidence: stopword hits for the latin-script
    languages, CJK character count for zh."""
    c = F.col(col) if isinstance(col, str) else col
    tok = tokens(c)
    scores: dict[str, Column] = {
        lang: _count_in(tok, words).cast("double") for lang, words in STOPWORDS.items()
    }
    scores["zh"] = F.regexp_count(c, F.lit(r"[一-鿿]")).cast("double")
    return scores


def lang_id(col: str | Column, default: str = "und") -> Column:
    """Argmax language with deterministic tie-break (language code asc);
    'und' when no evidence at all."""
    scores = lang_scores(col)
    langs = sorted(scores)  # deterministic tie-break: code asc
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.when(best <= 0, F.lit(default))
    for lang in langs:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit(default))


def normalize_text(col: str | Column) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, strip
    punctuation — the canonical form exact/near-dup hashing keys on."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.lower(c), r"[^\w\s]", " ")
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))


def scrub_pii(col: str | Column) -> Column:
    """Pattern-based PII scrub for free text: emails, IPv4 addresses and
    phone numbers are replaced by typed placeholder tokens (the standard
    pre-training privacy pass). Pure codegen'd regexp_replace chain —
    a narrow projection at any scale. Order matters: emails first (they
    contain dots and digits), then IPs, then phones (whose pattern
    requires separator punctuation, so it cannot re-match an IP
    remnant). Keyed pseudonymization for identifier columns is the
    sha256 expression in ``queries/corpus.py::pii_pseudonymize_customers``."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(
        c, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"
    )
    c = F.regexp_replace(c, r"\b\d{1,3}(\.\d{1,3}){3}\b", "[IP]")
    c = F.regexp_replace(
        c,
        r"(\+?\d{1,2}[\s.-])?(\(\d{3}\)[\s.-]?|\b\d{3}[\s.-])\d{3}[\s.-]\d{4}\b",
        "[PHONE]",
    )
    return c


def shingles(col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles over normalized text (distinct, for Jaccard
    sets). Documents shorter than n tokens yield their full token join.

    The token array is bound ONCE per row (``bind_once``): the per-gram
    lambda slices a computed array instead of re-inlining the
    tokenization expression per gram index (which re-ran the regex
    normalization O(tokens) times per document — measured 3× the cost
    of the MinHash signature aggregation it feeds)."""

    return bind_once(
        tokens(normalize_text(col)), lambda t: shingles_from_tokens(t, n)
    )


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-TOKENIZED array —
    the entry point for pipelines that pool the normalize+tokenize
    prefix once per corpus (``queries/llmdata.py::_doc_norm_tokens``)
    instead of re-inlining the regex stack into every consumer's plan."""
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def char_ngrams(col: str | Column, n: int = 5) -> Column:
    """Character n-gram set over normalized text (distinct, for Jaccard).
    Complements word-shingle ``shingles``: char grams see intra-word
    edits word grams miss, the standard second axis of n-gram dedup.
    Strings shorter than n yield the full string (one gram). The
    normalized string is bound ONCE per row (``bind_once``) so the
    per-gram lambda substrings a computed value instead of re-running
    the regex normalization O(chars) times per document."""

    def build(t: Column) -> Column:
        k = F.greatest(F.length(t) - (n - 1), F.lit(1))
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k), lambda i: F.substr(t, i, F.lit(n))
            )
        )

    return bind_once(normalize_text(col), build)


def fingerprint(col: str | Column, n: int = 3) -> Column:
    """Document fingerprint: min of 64-bit shingle hashes over the
    normalized text (a 1-hash MinHash — the rolling-hash fingerprint the
    north star asks for; xxhash64 is Spark's native 64-bit hash)."""
    return F.array_min(F.transform(shingles(col, n), lambda s: F.xxhash64(s)))


def content_hash(col: str | Column) -> Column:
    """Exact-dedup key: md5 of normalized text (hex, engine-portable)."""
    return F.md5(F.encode(normalize_text(col), "UTF-8"))


def portable_hash60(col: Column) -> Column:
    """60-bit integer hash from the first 15 md5 hex chars — bit-identical
    in DuckDB as ``('0x' || substr(md5(x), 1, 15))::BIGINT``, which makes
    any operator built on it oracle-checkable across engines."""
    return F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 15), 16, 10).cast(
        "long"
    )


def keep_fraction(id_col: Column, fraction: float, denom: int = 10_000) -> Column:
    """Deterministic Bernoulli(fraction) keep-decision from the portable
    row hash: ``hash60(id) % denom < fraction*denom``. Unlike
    ``df.sample``/``rand()`` this is reproducible across retries, engines
    and partitionings — the sampling a training-data pipeline can audit.
    Engine-portable: DuckDB computes the identical decision."""
    return portable_hash60(id_col.cast("string")) % denom < int(round(fraction * denom))


def chunk_starts(n_tokens: Column, chunk_tokens: int, overlap: int) -> Column:
    """1-based chunk start offsets for a sliding window of
    ``chunk_tokens`` with ``overlap`` carried between chunks (the
    context-window chunking step of a training-data pipeline). Last
    chunk may be short; every token is covered."""
    step = chunk_tokens - overlap
    assert step > 0, "overlap must be smaller than chunk_tokens"
    return F.sequence(
        F.lit(1), F.greatest(n_tokens - F.lit(overlap), F.lit(1)), F.lit(step)
    )


def _grams_multiset(c: Column, n: int = 3) -> Column:
    """Word n-grams WITH multiplicity (repetition measures need the
    duplicates that ``shingles`` removes); token array bound once."""
    return bind_once(
        tokens(normalize_text(c)), lambda t: grams_multiset_from_tokens(t, n)
    )


def grams_multiset_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-grams WITH multiplicity from an already-tokenized array
    (pooled-prefix entry point, cf. :func:`shingles_from_tokens`)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def repetition_metrics(col: str | Column) -> dict[str, Column]:
    """Gopher-style within-document repetition signals: the fraction of
    duplicate lines and duplicate word 3-grams (counted WITH
    multiplicity — array_distinct removes what repetition measures).
    Integer-ratio doubles, so thresholds and rounding are engine-exact."""
    c = F.col(col) if isinstance(col, str) else col
    dup_ratio = lambda arr: (  # noqa: E731 — (n − n_distinct) / n on the BOUND array
        (F.size(arr) - F.size(F.array_distinct(arr))) / F.size(arr).cast("double")
    )
    return {
        "dup_line_ratio": bind_once(F.split(c, "\n"), dup_ratio),
        "dup_gram_ratio": bind_once(_grams_multiset(c), dup_ratio),
    }


def repetition_metrics_df(df, text_col: str, id_col: str, tokens_col: str | None = None):
    """Scale path of :func:`repetition_metrics`: the Column form
    references the gram array twice in one projection (size +
    size∘array_distinct), and CollapseProject re-inlines the whole
    interpreted gram-construction tree into BOTH slots. Here each array
    is built once and consumed by an explode, with count/count_distinct
    as codegen'd aggregations. Identical ratios.

    ``tokens_col`` names an already-tokenized array column (a pooled
    normalize+tokenize prefix) — grams then come straight from it and
    the regex stack never enters this plan."""
    grams = (
        grams_multiset_from_tokens(F.col(tokens_col))
        if tokens_col is not None
        else _grams_multiset(F.col(text_col))
    )
    lines = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), "\n")).alias("_l"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_nl"),
            F.count_distinct("_l").alias("_dl"),
        )
    )
    gr = (
        df.select(F.col(id_col), F.explode(grams).alias("_g"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_ng"),
            F.count_distinct("_g").alias("_dg"),
        )
    )
    return lines.join(gr, id_col).select(
        id_col,
        ((F.col("_nl") - F.col("_dl")) / F.col("_nl").cast("double")).alias(
            "dup_line_ratio"
        ),
        ((F.col("_ng") - F.col("_dg")) / F.col("_ng").cast("double")).alias(
            "dup_gram_ratio"
        ),
    )


def hashed_shingle_features(col: str | Column, dim: int = 64, n: int = 3) -> Column:
    """Feature-hashing vectorizer (the 'hashing trick', cf. Weinberger et
    al. 2009): bucket-count histogram of word n-gram shingles, giving a
    fixed-``dim`` dense embedding that PRESERVES near-dup structure —
    texts at Jaccard ≥ 0.8 land at cosine ≥ ~0.9 while unrelated texts
    stay ≤ ~0.73 on this corpus. Engine-portable via the md5-derived
    bucket hash, so similarity-search pipelines over it are
    hash-checkable end to end.

    NOTE: this Column form runs the dim×|grams| bucket-count loop as
    interpreted higher-order functions — fine for small corpora and unit
    tests, but the per-row cost is real. The SCALE PATH is
    :func:`hashed_shingle_features_df` (explode → codegen'd hash
    aggregate), which produces identical vectors with one small shuffle
    instead of an interpreted inner loop; measured ~12× faster at sf0.1."""
    assert dim & (dim - 1) == 0, "dim must be a power of two (bucket mask)"
    return bind_once(
        F.transform(
            shingles(col, n),
            lambda g: portable_hash60(g).bitwiseAND(F.lit(dim - 1)),
        ),
        lambda buckets: F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda b: F.size(F.filter(buckets, lambda h: h == b.cast("long"))).cast(
                "double"
            ),
        ),
    )


def hashed_shingle_features_df(
    df,
    text_col: str,
    id_col: str,
    dim: int = 64,
    n: int = 3,
    out_col: str = "feat",
    tokens_col: str | None = None,
):
    """Scale path of :func:`hashed_shingle_features`: identical vectors,
    built as explode(grams) → project bucket (codegen) → two hash
    aggregations (per-(id,bucket) counts, then per-id dense array) —
    whole-stage-codegen throughout, no interpreted per-gram lambda; the
    shuffles carry (id, bucket, count) triples, never text.

    ``tokens_col`` names a pooled normalize+tokenize prefix column —
    grams then skip the regex stack (cf. :func:`shingles_from_tokens`)."""
    assert dim & (dim - 1) == 0, "dim must be a power of two (bucket mask)"
    from pyspark.sql import DataFrame  # noqa: F401

    grams = (
        shingles_from_tokens(F.col(tokens_col), n)
        if tokens_col is not None
        else shingles(text_col, n)
    )
    exploded = df.select(F.col(id_col), F.explode(grams).alias("_gram")).select(
        id_col,
        portable_hash60(F.col("_gram")).bitwiseAND(F.lit(dim - 1)).alias("_bucket"),
    )
    counts = exploded.groupBy(id_col, "_bucket").agg(
        F.count(F.lit(1)).cast("double").alias("_cnt")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda b: F.coalesce(
            F.element_at("_m", b.cast("long")), F.lit(0.0)
        ),
    )
    return (
        counts.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_bucket"), F.col("_cnt")))
            ).alias("_m")
        )
        .select(id_col, dense.alias(out_col))
    )
