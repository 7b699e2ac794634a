"""Linear text-classifier inference at corpus scale.

The quality/domain filtering stage every production curation pipeline runs
(CCNet's fastText language/quality models, Dolma's quality classifiers) is,
at inference time, just a linear model over hashed bag-of-words features:
``score = σ(bias + mean_tok w[h(tok)])``. That shape is fully expressible in
codegen'd DataFrame ops — no model runtime, no Python in the row path:

* tokenize → hash each token into one of ``n_features`` buckets with the
  repo's portable polynomial hash (`functions/hashing.py` — DuckDB-
  replicable, so scores are oracle-checkable bit-for-bit on the 1e-6 grid);
* broadcast-join the (feature → weight) table — BOUNDED by ``n_features``
  by construction, never by corpus size;
* one map-side-combinable per-doc aggregation; sigmoid on the mean.

At 100 TB this is a linear scan with a broadcast hash join against a
fixed-size weights table and one keyed aggregation whose partial rows
collapse to one-per-doc before the shuffle — the cheapest shape Spark has.
Training the weights is out of scope (an offline concern); any
externally-trained linear model (fastText without subwords, logistic
regression over hashed n-grams) drops into the ``weights`` argument.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import poly_hash, word_tokens


def hashed_token_features(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 4096,
) -> DataFrame:
    """One row per token occurrence: (id, feat) with
    ``feat = poly_hash(lower(token)) mod n_features`` — the hashing trick
    (Weinberger et al., 2009): a fixed feature space regardless of
    vocabulary size, no dictionary to build or broadcast."""
    toks = docs.select(
        F.col(id_col),
        F.explode(word_tokens(F.lower(F.col(text_col)))).alias("__tok"),
    ).where(F.col("__tok") != "")
    return toks.select(
        id_col, (poly_hash(F.col("__tok")) % n_features).alias("feat")
    )


def linear_classifier_scores(
    docs: DataFrame,
    weights: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 4096,
    bias: float = 0.0,
) -> DataFrame:
    """Per-document score of a linear classifier over hashed bag-of-words:
    ``score = sigmoid(bias + (Σ_tok w[h(tok)]) / n_tokens)`` (mean pooling,
    the fastText convention — doc length must not change the score scale).

    ``weights``: DataFrame (feat: long, weight: double), at most
    ``n_features`` rows — broadcast. Buckets absent from it contribute 0.
    Output: (id_col, n_tokens, score).
    """
    feats = hashed_token_features(
        docs, text_col=text_col, id_col=id_col, n_features=n_features
    )
    joined = feats.join(F.broadcast(weights), "feat", "left")
    agg = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("__s"),
    )
    logit = F.lit(bias) + F.col("__s") / F.col("n_tokens")
    return agg.select(
        id_col,
        "n_tokens",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("score"),
    )


def demo_weights(spark, *, n_features: int = 4096) -> DataFrame:
    """Deterministic stand-in weight table (arithmetic in both engines, so
    the suite oracle can regenerate it verbatim): a Knuth-multiplicative
    scramble of the bucket id mapped to [-0.5, 0.5). Swap for a real
    trained model's weights in production."""
    return spark.range(n_features).select(
        F.col("id").alias("feat"),
        (
            ((F.col("id") * F.lit(2654435761)) % F.lit(1000003))
            / F.lit(1000003.0)
            - F.lit(0.5)
        ).alias("weight"),
    )


__all__ = [
    "demo_weights",
    "hashed_token_features",
    "linear_classifier_scores",
]
