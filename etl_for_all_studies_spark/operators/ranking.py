"""Corpus-statistics text ranking (TF-IDF / BM25) as pure DataFrame plans.

Beyond-reference capability: retrieval-style scoring over the document corpus
— rank documents for a bag-of-words query with BM25 (Robertson/Spärck Jones;
the k1/b form used by Lucene). Useful in a curation pipeline both for
search-style inspection and for query-targeted subset selection ("give me the
training docs most relevant to these probe terms").

Spark-native formulation (no UDFs, three narrow aggregations):

* per-doc term frequencies for the query terms only: tokenize → explode →
  ``isin(terms)`` filter → ``groupBy(doc, term)``. The filter sits directly
  on the exploded stream, so the shuffle carries only query-term hits —
  at 100 TB the shuffled volume is proportional to query-term occurrences,
  not corpus size;
* document frequencies + corpus aggregates (N, avgdl): one global agg over
  the narrow (doc, dl) projection plus a per-term distinct-doc count — both
  tiny results, joined back by **broadcast**;
* the BM25 formula is a codegen'd expression over (tf, df, dl, N, avgdl).

Scoring output is per (doc, query-hit); docs matching none of the terms
score 0 and are omitted (standard IR semantics — rank only the matches).
"""
from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import word_tokens


def bm25_scores(
    docs: DataFrame,
    terms: Sequence[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hit_terms, score) — BM25 of each matching document for a
    bag-of-words ``terms`` query.

    idf uses the standard "+1 inside the log" form (non-negative for
    df > N/2): ``ln(1 + (N - df + 0.5) / (df + 0.5))``.
    """
    terms = [t.lower() for t in terms]
    toks = (
        docs.select(
            F.col(id_col), word_tokens(F.lower(F.col(text_col))).alias("toks")
        )
        .select(F.col(id_col), "toks", F.size("toks").alias("dl"))
    )
    corpus = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    hits = toks.select(
        F.col(id_col), "dl", F.explode("toks").alias("term")
    ).where(F.col("term").isin(list(terms)))
    tf = hits.groupBy(id_col, "term", "dl").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hit_terms"),
        F.sum("term_score").alias("score"),
    )


def bm25_topk(
    docs: DataFrame, terms: Sequence[str], k: int = 20, **kwargs
) -> DataFrame:
    """Top-``k`` documents by BM25 score (ties broken by doc id — the
    deterministic-output discipline every suite query follows)."""
    id_col = kwargs.get("id_col", "doc_id")
    return (
        bm25_scores(docs, terms, **kwargs)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


__all__ = ["bm25_scores", "bm25_topk"]
