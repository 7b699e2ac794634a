"""Heuristic document-quality filtering (C4/Gopher-style rule pipelines).

Beyond-reference capability for LLM training-data curation: a rule-based
keep/drop decision per document, built from the same columnar text metrics the
annotation pass uses (``operators/textops.py``). Mirrors the shape of the
published C4 / Gopher filtering recipes (word-count window, mean-word-length
window, type-token-ratio floor, stopword floor) without importing any model:
every rule is a codegen'd expression over built-ins, so the filter runs as a
narrow projection + filter over 100 TB of text shards with zero shuffles and
full predicate pushdown of any upstream partition filters.

Scale notes:
* Each metric is computed once from a single ``split`` of the text; rules are
  boolean expressions over those metrics — one pass, no Python, no UDFs.
* The operator *annotates* (keep flag + per-rule flags) rather than filters,
  so a curation pipeline can audit rejection reasons (``groupBy`` on the rule
  flags) before committing to a destructive filter — same DQ-first posture as
  the reference's metadata validation (reference ``metadata_processing.py``:
  flag-and-report, then act).
"""
from __future__ import annotations

import dataclasses

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import CacheScope, persist
from ..functions.hashing import word_tokens
from ..partitioning import compute_spread

#: Function words used for the stopword-presence rule. Deliberately tiny and
#: deterministic (a production pipeline would plug a per-language list here —
#: the operator shape is the contract, as with ``textops.LANG_MARKERS``).
STOPWORDS: tuple[str, ...] = ("the", "a", "and", "of", "to")


@dataclasses.dataclass(frozen=True)
class QualityRules:
    """Thresholds for the rule pipeline (defaults ≈ Gopher's text-quality
    envelope, adapted to the synthetic corpus' ranges)."""

    min_words: int = 30
    max_words: int = 90
    min_mean_word_len: float = 3.5
    max_mean_word_len: float = 5.0
    min_type_token_ratio: float = 0.3
    min_stopword_ratio: float = 0.02
    stopwords: tuple[str, ...] = STOPWORDS


def _metrics(text: Column, rules: QualityRules) -> dict[str, Column]:
    tokens = word_tokens(text)
    n_words = F.size(tokens)
    total_chars = F.aggregate(
        tokens, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    nz = n_words > 0
    mean_word_len = F.when(nz, total_chars.cast("double") / n_words).otherwise(0.0)
    ttr = F.when(
        nz, F.size(F.array_distinct(tokens)).cast("double") / n_words
    ).otherwise(0.0)
    lower_tokens = word_tokens(F.lower(text))
    sw_hits = F.size(F.filter(lower_tokens, lambda t: t.isin(*rules.stopwords)))
    stopword_ratio = F.when(nz, sw_hits.cast("double") / n_words).otherwise(0.0)
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": mean_word_len,
        "type_token_ratio": ttr,
        "stopword_ratio": stopword_ratio,
    }


def annotate_quality(
    docs: DataFrame, text_col: str = "text", rules: QualityRules | None = None
) -> DataFrame:
    """Annotate each document with quality metrics, per-rule pass flags, and
    an overall ``keep`` flag (all rules pass).

    Flags are BIGINT 0/1 (not boolean) so downstream aggregation
    (``SUM(pass_*)`` rejection-reason audits) needs no casts and the DuckDB
    oracle hashes identically.
    """
    rules = rules or QualityRules()
    m = _metrics(F.col(text_col), rules)
    out = docs
    for name, col in m.items():
        out = out.withColumn(name, col)
    passes = {
        "pass_n_words": F.col("n_words").between(rules.min_words, rules.max_words),
        "pass_word_len": F.col("mean_word_len").between(
            rules.min_mean_word_len, rules.max_mean_word_len
        ),
        "pass_ttr": F.col("type_token_ratio") >= rules.min_type_token_ratio,
        "pass_stopwords": F.col("stopword_ratio") >= rules.min_stopword_ratio,
    }
    keep = F.lit(True)
    for name, cond in passes.items():
        out = out.withColumn(name, cond.cast("long"))
        keep = keep & cond
    return out.withColumn("keep", keep.cast("long"))


def quality_filter(
    docs: DataFrame, text_col: str = "text", rules: QualityRules | None = None
) -> DataFrame:
    """Destructive form: only documents passing every rule survive."""
    return annotate_quality(docs, text_col, rules).where(F.col("keep") == 1)


def repetition_metrics(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 2,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Gopher-style within-document repetition metrics:
    (doc_id, n_grams, top_gram_frac, dup_token_frac).

    * ``top_gram_frac`` — occurrences of the most frequent word ``ngram``-gram
      over total n-grams (Gopher drops docs whose top 2-gram exceeds 0.20);
    * ``dup_token_frac`` — 1 − distinct/total tokens (crude boilerplate
      signal; pairs with the TTR rule in ``annotate_quality``).

    Spark-native formulation: n-grams from ``transform`` over a ``sequence``
    of start offsets (per-row, no shuffle), then ONE ``groupBy(doc, gram)``
    count and ONE ``groupBy(doc)`` max/sum — both shuffles keyed by doc id,
    linear in token count, map-side combined. Token-level stats ride the same
    per-row projection. Docs with fewer than ``ngram`` words emit zero grams
    and report fractions of 0 (kept via left join).
    """
    toks = word_tokens(F.lower(F.col(text_col)))
    # spread before the per-doc n-gram materialization: a single-split scan
    # would serialize the HOF pass onto one task (partitioning.py)
    base = compute_spread(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        # all n-grams incl. repeats — frequency is the point here, so no
        # array_distinct (contrast word_ngrams, which dedups for set probes)
        F.when(
            F.size(toks) >= ngram,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - F.lit(ngram - 1)),
                lambda i: F.array_join(F.slice(toks, i, ngram), " "),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("grams"),
    )
    base = persist(base, scope)  # barrier: both the gram explode and the final join read
    # this, and the interpreted HOF projection gets no CSE — without the
    # barrier every branch re-tokenizes (same discipline as the sketch
    # operators in dedup.py; measured 13.3s -> 5.8s warm at sf0.1)
    gram_counts = (
        base.select(F.col(id_col), F.explode("grams").alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_doc = gram_counts.groupBy(id_col).agg(
        F.sum("cnt").alias("n_grams"), F.max("cnt").alias("top_cnt")
    )
    return (
        base.select(id_col, "n_tokens", "n_distinct_tokens")
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce(
                F.col("top_cnt").cast("double") / F.col("n_grams"), F.lit(0.0)
            ).alias("top_gram_frac"),
            F.when(
                F.col("n_tokens") > 0,
                1.0 - F.col("n_distinct_tokens").cast("double") / F.col("n_tokens"),
            )
            .otherwise(0.0)
            .alias("dup_token_frac"),
        )
    )


__all__ = [
    "STOPWORDS",
    "QualityRules",
    "annotate_quality",
    "quality_filter",
    "repetition_metrics",
]
