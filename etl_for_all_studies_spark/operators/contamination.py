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
    train_grams = train.select(
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


__all__ = ["decontaminate", "word_ngrams"]
