"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference capability (BASELINE.json north star): language ID, quality
scoring, token counting, and document fingerprinting over a ``documents``
table — all as narrow codegen'd projections (no Python in the hot path), so
the same plan runs unchanged over 100 TB of text shards.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import CacheScope, persist
from ..functions.hashing import poly_hash_combined, word_tokens
from ..partitioning import compute_spread

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
# Deliberately minimal + deterministic (a real pipeline would plug in fastText
# or CLD3 here — the *operator shape* is what matters for the engine).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}

# BPE-ish tokenization: words, numbers, or single punctuation marks — a cheap
# stand-in for a subword tokenizer with the same Spark-side plumbing.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(word_tokens(col))


def canonicalize_text(col: Column) -> Column:
    """Normalization-robust canonical form: lowercase, collapse every run of
    non-alphanumeric characters (punctuation, whitespace, casing noise) to a
    single space, trim.

    Canonical-form equality catches the trivial-variant duplicates exact
    dedup misses (re-encoded punctuation, case flips, whitespace reflow)
    without any pairwise comparison — grouping by a digest of the canonical
    text stays one linear shuffle, same shape as ``exact_duplicates``. The
    character class is ASCII on purpose: identical semantics under Java
    regex (Spark) and RE2 (DuckDB/the oracle), so the decision is replayable
    outside the engine.
    """
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def bpeish_token_count(col: Column) -> Column:
    """Count of BPE-ish tokens (words / digit runs / punctuation marks)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def punct_ratio(col: Column) -> Column:
    """Punctuation characters / total characters (0 for empty text)."""
    n = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n)


def stopword_ratio(col: Column, stopwords: tuple[str, ...]) -> Column:
    """Share of whitespace tokens that are (lowercased) stopwords."""
    tokens = word_tokens(F.lower(col))
    hits = F.size(F.filter(tokens, lambda t: t.isin(*stopwords)))
    total = F.size(tokens)
    return F.when(total == 0, F.lit(0.0)).otherwise(hits.cast("double") / total)


def quality_score(col: Column) -> Column:
    """Composite document quality in [0, 1]: length, punctuation, stopwords.

    Heuristic mirrors common LLM-data quality filters (length window +
    punctuation sanity + function-word presence); weights are arbitrary but
    fixed — the engine contract is the *columnar formulation*, not the exact
    heuristic.
    """
    n_tok = token_count(col).cast("double")
    length_component = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    punct_component = F.lit(1.0) - F.least(punct_ratio(col) * 4.0, F.lit(1.0))
    stop_component = F.least(
        stopword_ratio(col, LANG_MARKERS["en"]) * 5.0, F.lit(1.0)
    )
    return (
        F.lit(0.4) * length_component
        + F.lit(0.3) * punct_component
        + F.lit(0.3) * stop_component
    )


def language_scores(col: Column) -> list[tuple[str, Column]]:
    """Per-language marker-hit counts (the argmax is the predicted language)."""
    lowered = F.lower(col)
    out = []
    for lang, markers in LANG_MARKERS.items():
        tokens = word_tokens(lowered)
        out.append((lang, F.size(F.filter(tokens, lambda t: t.isin(*markers)))))
    return out


def predict_language(col: Column) -> Column:
    """Argmax language with deterministic tiebreak (lexicographic lang code),
    'und' when no markers hit at all."""
    scores = language_scores(col)
    best_score: Column = F.lit(-1)
    best_lang: Column = F.lit("und")
    # iterate in sorted order so later candidates win only on strictly
    # greater score → lexicographically-first language wins ties
    for lang in sorted(LANG_MARKERS):
        score = dict(scores)[lang]
        take = score > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, score).otherwise(best_score)
    return F.when(best_score <= 0, F.lit("und")).otherwise(best_lang)


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: the combined two-pair
    polynomial hash (~2^60 keyspace) of the whitespace-normalized,
    lowercased text — portable across engines. A fingerprint is an
    IDENTITY proxy, so it gets the same collision hardening as the span
    window keys: a single sub-2^31 hash yields birthday collisions from
    ~10^5 documents (≈466 false-identity pairs per million docs), which
    silently merges distinct documents in any fingerprint-keyed dedup or
    diff downstream.

    **Version stability**: fingerprint VALUES are an implementation detail
    and are NOT stable across engine versions — the round-6 collision
    hardening changed every value (single-pair → combined two-pair key).
    The contract is recompute-from-source: never compare a stored
    fingerprint against one computed by a different engine version; on
    upgrade, re-fingerprint the corpus (or version the column, e.g.
    ``fingerprint_v2``). The md5-keyed exact-dedup digests
    (``operators/dedup.py::incremental_new_documents``) are the stable
    cross-version identity and were NOT affected by the rekey — warehouse
    seen-digest tables survive upgrades unchanged (test-pinned)."""
    normalized = F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")
    return poly_hash_combined(normalized)


def annotate_documents(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One-pass annotation: all text metrics as added columns.

    Token-dependent metrics (counts, stopword hits per language) are computed
    by **explode + grouped SUM(CASE)** — whole-stage-codegen'd with map-side
    partial aggregation — rather than per-column interpreted HOF filters,
    which re-tokenize per metric (measured 3-4x on 5k docs; the gap widens
    with document count). The same numbers, one shuffle keyed by doc id.
    """
    c = F.col(text_col)
    # spread before the char-pass metrics (fingerprint's packed poly hash,
    # BPE-ish counting) and the token explode: a single-split scan would
    # serialize them onto one task (partitioning.py; no-op on wide scans)
    docs = compute_spread(docs)
    tokens = docs.select(
        F.col(id_col),
        F.explode_outer(word_tokens(F.lower(c))).alias("tok"),
    )
    marker_aggs = [
        F.sum(
            F.when(F.col("tok").isin(*markers), 1).otherwise(0)
        ).alias(f"__hits_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    token_stats = tokens.groupBy(id_col).agg(
        F.sum(F.when(F.col("tok").isNotNull(), 1).otherwise(0)).alias("n_tokens"),
        *marker_aggs,
    )

    # argmax language with lexicographic tiebreak ('und' when no marker hit)
    best_score: F.Column = F.lit(-1)
    best_lang: F.Column = F.lit("und")
    for lang in sorted(LANG_MARKERS):
        score = F.col(f"__hits_{lang}")
        take = score > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, score).otherwise(best_score)
    predicted = F.when(best_score <= 0, F.lit("und")).otherwise(best_lang)

    en_hits = F.col(f"__hits_en")
    n_tok = F.col("n_tokens").cast("double")
    stop_ratio = F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
        en_hits.cast("double") / n_tok
    )
    quality = (
        F.lit(0.4) * F.least(n_tok / F.lit(20.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.col("punct_ratio") * 4.0, F.lit(1.0)))
        + F.lit(0.3) * F.least(stop_ratio * 5.0, F.lit(1.0))
    )

    return (
        docs.select(
            "*",
            bpeish_token_count(c).alias("n_bpe_tokens"),
            punct_ratio(c).alias("punct_ratio"),
            fingerprint(c).alias("fingerprint"),
        )
        .join(token_stats, on=id_col)
        .withColumn("quality", quality)
        .withColumn("predicted_lang", predicted)
        .drop(*[f"__hits_{lang}" for lang in LANG_MARKERS])
    )


# PII patterns deliberately restricted to syntax shared by Java regex
# (Spark) and RE2 (DuckDB/Go tooling): no lookaround, no backreferences —
# the masking decision must replay identically outside Spark for audits.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3}[- .]?[0-9]{2,4}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def unigram_logprob_scores(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    scope: CacheScope | None = None,
) -> DataFrame:
    """Statistical language-model quality signal: each document's mean
    log₁₀ unigram probability under the corpus's own empirical unigram
    distribution. Gibberish/rare-token documents score low, formulaic ones
    high — the classic cheap LM filter (the shape of CCNet/KenLM perplexity
    filtering, with the corpus itself as the model).

    ONE tokenization pass, no Python: the exploded token stream is reduced to
    per-document word counts (map-side combined) and **persisted** — both the
    corpus-wide frequency aggregate and the scoring join read that compact
    (doc, word, count) table, so the scan+lower+split+explode lineage runs
    once, not once per consumer (at 100 TB the raw-text scan is the dominant
    cost; everything after it here is Zipf-bounded). Scoring is a
    token→frequency equi-join keyed by word with a per-document weighted AVG;
    the corpus-total token count is a 1-row broadcast.
    Returns (id, n_tokens, mean_log10_prob).
    """
    toks = persist(
        compute_spread(docs.select(id_col, text_col))
        .select(
            F.col(id_col),
            F.explode(word_tokens(F.lower(F.col(text_col)))).alias("w"),
        )
        .where(F.col("w") != "")
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("n")),
        scope,
    )
    freq = toks.groupBy("w").agg(F.sum("n").alias("c"))
    total = freq.agg(F.sum("c").alias("total"))
    scored = toks.join(freq, "w").crossJoin(F.broadcast(total))
    return scored.groupBy(id_col).agg(
        F.sum("n").alias("n_tokens"),
        (
            F.sum(F.col("n") * F.log10(F.col("c").cast("double") / F.col("total")))
            / F.sum("n")
        ).alias("mean_log10_prob"),
    )


def bigram_logprob_scores(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Interpolated bigram-LM quality signal: each document's mean log₁₀
    bigram probability under the corpus's own empirical model,
    ``P(w₂|w₁) = λ·c(w₁w₂)/c(w₁·) + (1−λ)·c(w₂)/N`` — one step up the
    n-gram ladder from :func:`unigram_logprob_scores` (the CCNet/KenLM
    filtering shape): boilerplate and well-formed text scores high, shuffled
    or template-glitch text with plausible words but implausible *sequences*
    scores low, which the unigram model cannot see.

    Scale shape: ONE scan of the corpus (the token-array projection is a
    persisted barrier), bigrams built per-row with ``transform`` over a
    ``sequence`` of positions (no explode of unigrams first, no
    self-join on position), then reduced straight to per-document
    (w₁, w₂) counts — the compact table every downstream join reads.
    Corpus bigram/prefix/unigram tables are Zipf-bounded aggregates of it.
    Interpolation (vs backoff) keeps the score a pure expression: no
    zero-count branch, every observed bigram has λ·c12/c1 > 0.

    Returns ``(id, n_bigrams, mean_log10_bigram_prob)`` — docs with < 2
    tokens keep ``n_bigrams = 0`` and a NULL score.
    """
    tk = word_tokens(F.lower(F.col(text_col)))
    base = persist(
        compute_spread(docs.select(id_col, text_col)).select(
            F.col(id_col), tk.alias("tk"), F.size(tk).alias("nt")
        ),
        scope,
    )
    uni = base.select(F.explode("tk").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("cu")
    )
    total = uni.agg(F.sum("cu").cast("double").alias("ntot"))
    pairs = base.where(F.col("nt") >= 2).select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(2), F.col("nt")),
                lambda i: F.struct(
                    F.element_at(F.col("tk"), i - 1).alias("w1"),
                    F.element_at(F.col("tk"), i).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select(F.col(id_col), F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    pc = persist(
        pairs.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("n")), scope
    )
    cb = pc.groupBy("w1", "w2").agg(F.sum("n").alias("c12"))
    cp = cb.groupBy("w1").agg(F.sum("c12").alias("c1"))
    scored = (
        pc.join(cb, ["w1", "w2"])
        .join(cp, "w1")
        .join(uni.select(F.col("w").alias("w2"), "cu"), "w2")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_bigrams"),
            (
                F.sum(
                    F.col("n")
                    * F.log10(
                        F.lit(lam) * F.col("c12") / F.col("c1")
                        + F.lit(1.0 - lam) * F.col("cu") / F.col("ntot")
                    )
                )
                / F.sum("n")
            ).alias("mean_log10_bigram_prob"),
        )
    )
    return (
        base.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "mean_log10_bigram_prob",
        )
    )


def redact_pii(
    docs: DataFrame,
    *,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    replacement: str = "[PII:{kind}]",
) -> DataFrame:
    """Mask PII spans (emails, phone numbers, IPv4 addresses by default) and
    annotate per-kind match counts.

    Adds ``n_pii_{kind}`` (match count, BIGINT) per pattern and replaces
    ``text_col`` with the masked text. Patterns apply in dict order, counting
    before any masking so overlapping kinds see the original text. A narrow
    per-row projection — regexes run inside codegen, no Python, no shuffle;
    at 100 TB this is scan-bound like every other annotate pass.
    """
    patterns = patterns or PII_PATTERNS
    out = docs
    masked = F.col(text_col)
    for kind, pat in patterns.items():
        out = out.withColumn(
            f"n_pii_{kind}",
            # idx=0 (whole match): Spark's default idx is group 1, and these
            # patterns are groupless by design (RE2 parity)
            F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
            ).cast("long"),
        )
        masked = F.regexp_replace(masked, pat, replacement.format(kind=kind))
    return out.withColumn(text_col, masked)


__all__ = [
    "BPE_ISH_PATTERN",
    "LANG_MARKERS",
    "PII_PATTERNS",
    "annotate_documents",
    "bigram_logprob_scores",
    "canonicalize_text",
    "redact_pii",
    "bpeish_token_count",
    "fingerprint",
    "language_scores",
    "predict_language",
    "punct_ratio",
    "quality_score",
    "stopword_ratio",
    "token_count",
    "unigram_logprob_scores",
]
