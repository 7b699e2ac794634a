"""Train/eval decontamination by word n-gram overlap.

Beyond-reference capability for LLM training-data curation: before training,
every document that shares a long-enough word n-gram with a held-out
evaluation set must be flagged (the GPT-3 / PaLM decontamination recipe —
published in the respective appendices: mark a training doc contaminated iff
any of its n-grams appears in any eval document).

Spark-native formulation:

* both sides tokenize and emit **distinct** word n-grams per document — a
  narrow per-row projection (``transform`` over a ``sequence`` of start
  offsets), no shuffle;
* the eval side is aggregated to a distinct n-gram set. Eval sets are small
  by construction (benchmarks, not corpora), so the set is **broadcast** —
  the train side never shuffles for the probe itself;
* per-doc overlap counts come from one ``groupBy(doc_id)`` over the matched
  explode — the only shuffle, keyed by doc id, linear in match count;
* docs with zero overlap are restored by a left join against the (narrow)
  train id projection, so the output covers every train doc.

At 100 TB the train side is a single scan + broadcast-hash probe; cost is
linear with no pairwise blowup. If the eval set ever outgrows broadcast
range, drop the ``broadcast`` hint and the same plan degrades gracefully to
a shuffled hash join on ``ngram`` — semantics unchanged.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import word_tokens
from ..partitioning import compute_spread


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct space-joined word ``n``-grams of lowercased text
    (``array<string>``; texts shorter than ``n`` words → empty array).

    Same guard discipline as ``char_shingles`` (texts shorter than the
    window emit nothing — a ``sequence(1, 0)`` would count *down* in Spark
    and fabricate a spurious gram).
    """
    toks = word_tokens(F.lower(text))
    n_toks = F.size(toks)
    starts = F.sequence(F.lit(1), n_toks - F.lit(n - 1))
    return F.when(
        n_toks >= n,
        F.array_distinct(
            F.transform(
                starts, lambda i: F.array_join(F.slice(toks, i, n), " ")
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    *,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_overlap_ngrams, contaminated) for every train document.

    ``n_overlap_ngrams`` counts the train doc's *distinct* n-grams that occur
    anywhere in the eval set; ``contaminated`` is 1 iff that count is > 0.
    """
    # spread before the per-doc n-gram build: a single-split train scan
    # would run the whole HOF pass + broadcast probe on one task
    # (partitioning.py; no-op on already-wide scans)
    train_grams = compute_spread(train.select(id_col, text_col)).select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("ngram")
    )
    eval_grams = (
        eval_docs.select(F.explode(word_ngrams(F.col(text_col), n)).alias("ngram"))
        .distinct()
    )
    overlap = (
        train_grams.join(F.broadcast(eval_grams), "ngram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap_ngrams"))
    )
    return (
        train.select(id_col)
        .join(overlap, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_overlap_ngrams", F.lit(0)).alias("n_overlap_ngrams"),
            (F.coalesce("n_overlap_ngrams", F.lit(0)) > 0)
            .cast("long")
            .alias("contaminated"),
        )
    )


def semantic_decontaminate(
    train_vectors: DataFrame,
    eval_vectors: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space decontamination: flag every train vector whose cosine
    similarity to *any* eval vector reaches ``threshold``.

    The n-gram recipe above misses paraphrases; modern curation additionally
    screens against eval-set *embeddings* (semantic dedup between train and
    eval). Same scale shape as the n-gram variant: the eval side is small by
    construction, so its unit vectors are **broadcast** and the train side is
    ONE scan — scored against every eval vector via a codegen'd dot product
    (`F.aggregate`), then reduced with a map-side-combined ``max`` per train
    id. Cost is O(|train| · |eval| · dim) flops with no shuffle of the train
    side beyond the per-id max; no pairwise train×train term ever appears.
    If the eval set outgrows broadcast range, route through
    ``similarity.embedding_near_duplicates_ivf`` instead (cell-bucketed).

    Output: (id, max_eval_sim DOUBLE — NULL if the train vector has zero
    norm or the eval set is empty → never contaminated, max_eval_sim −1.0
    sentinel, matching "no evidence"), contaminated ∈ {0, 1}.
    """
    from .similarity import dot, unit_vectors

    t = unit_vectors(
        train_vectors, id_col=id_col, vec_col=vec_col, id_alias="_tid", vec_alias="tv"
    )
    e = unit_vectors(
        eval_vectors, id_col=id_col, vec_col=vec_col, id_alias="_eid", vec_alias="ev"
    )
    scored = (
        t.crossJoin(F.broadcast(e.select("ev")))
        .select("_tid", dot(F.col("tv"), F.col("ev")).alias("sim"))
        .groupBy("_tid")
        .agg(F.max("sim").alias("max_eval_sim"))
    )
    return (
        train_vectors.select(F.col(id_col).alias("_tid"))
        .join(scored, "_tid", "left")
        .select(
            F.col("_tid").alias(id_col),
            F.coalesce("max_eval_sim", F.lit(-1.0)).alias("max_eval_sim"),
            (F.coalesce("max_eval_sim", F.lit(-1.0)) >= threshold)
            .cast("long")
            .alias("contaminated"),
        )
    )


__all__ = ["decontaminate", "semantic_decontaminate", "word_ngrams"]
