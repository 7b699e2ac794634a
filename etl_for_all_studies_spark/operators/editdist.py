"""Exact edit-distance near-duplicate join via pigeonhole segment blocking.

The missing member of the dedup family (``operators/dedup.py`` covers
set-similarity: shingle-Jaccard, MinHash, SimHash): *character-level*
near-duplicates — OCR noise, single-token substitutions, whitespace drift —
where the right metric is Levenshtein distance with a small threshold ``d``,
not Jaccard. Naively that is an all-pairs O(n²) string comparison; this
module implements the PassJoin blocking scheme (Li, Deng, Wang, Feng —
"PASS-JOIN: A Partition-based Method for Similarity Joins", PVLDB 5(3),
2011): split every string into ``d+1`` contiguous segments — by the
pigeonhole principle, any pair within edit distance ``d`` must agree on at
least one segment *exactly* (at a position shifted by at most ``d``). So
candidates come from an **equi-join on segment content**, and only
candidates pay the Levenshtein verification.

Spark-first shape:

* segment/substring enumeration is codegen'd ``sequence``/``explode``/
  ``substring`` arithmetic — no Python in the row path;
* the candidate join is a hash equi-join on ``(seg_source_len, seg_idx,
  seg_text)`` — shuffle keyed by segment content, never a cross join, so
  cost scales with segment-collision counts, not n²;
* verification uses Spark's *thresholded* ``levenshtein(a, b, d)`` (early
  exit above ``d``, O(d·min(len)) per candidate instead of O(len²));
* texts are joined back onto the (distinct, canonicalized) candidate pairs
  rather than carried through the explode fan-out, so the wide ``text``
  column never rides the candidate shuffle.

Completeness (no recall loss — this is an *exact* join, unlike MinHash):
the probe side enumerates, for every admissible indexed length
``La ∈ [len(b)−d, len(b)]``, all ``d+1`` segment slots and every start
position within ``±d`` of the slot's home position. Strings shorter than
``d+1`` cannot be split into ``d+1`` non-empty segments; they are routed
through a degenerate coarse-length-bucket block (tiny strings, ≤ 2d+1 chars
— bounded work per bucket, and empty for corpora with a sane minimum
document length).

Reference parity: the reference engine has no fuzzy string join at all
(SURVEY §2.8); this is part of the beyond-reference LLM-curation surface,
alongside `/root/reference/src/etl_for_all_studies/expression_processing.py`'s
exact-key dedup being generalized by ``operators/dedup.py``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import compute_spread


def editdist_candidates(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dist: int = 4,
) -> DataFrame:
    """Candidate id pairs ``(doc_a, doc_b)`` (a < b) that *may* be within
    edit distance ``max_dist`` — a guaranteed superset of the true pairs.

    Index side: each doc of length ``L ≥ d+1`` emits its ``d+1`` segments
    ``(La=L, k, seg)``. Probe side: each doc of length ``Lb`` emits, for
    every ``La ∈ [Lb−d, Lb]`` with ``La ≥ d+1``, and every slot ``k``, the
    substrings of itself at positions within ``±d`` of the slot's home
    position in an ``La``-long string. Equi-join on ``(La, k, seg)``.

    Restricting the probe to ``La ≤ Lb`` indexes the shorter side exactly
    once per unordered pair (ties on equal length produce both directions;
    the closing ``distinct`` on the canonicalized pair collapses them).
    """
    d = max_dist
    m = d + 1
    # spread before the segment/substring fan-out: a single-split scan would
    # serialize the whole index+probe emission onto one task (partitioning.py)
    base = compute_spread(
        docs.select(
            F.col(id_col).alias("_id"),
            F.col(text_col).alias("_text"),
            F.length(text_col).alias("_len"),
        ).where(F.col("_text").isNotNull())
    )

    # -- segment path (len >= m) ------------------------------------------
    ks = F.explode(F.sequence(F.lit(0), F.lit(d))).alias("k")
    index = (
        base.where(F.col("_len") >= m)
        .select("_id", "_len", ks, "_text")
        .select(
            F.col("_id").alias("id_a"),
            F.col("_len").alias("seg_la"),
            "k",
            F.expr(
                f"substring(_text, floor(_len * k / {m}) + 1,"
                f" floor(_len * (k + 1) / {m}) - floor(_len * k / {m}))"
            ).alias("seg"),
        )
    )
    probe = (
        base.select(
            "_id",
            "_len",
            "_text",
            F.explode(
                F.sequence(F.greatest(F.col("_len") - d, F.lit(m)), F.col("_len"))
            ).alias("la"),
        )
        .where(F.col("la") <= F.col("_len"))  # empty sequence guard when _len < m
        .select("_id", "_len", "_text", "la", ks)
        .select(
            "_id",
            "_len",
            "_text",
            "la",
            "k",
            (F.floor(F.col("la") * F.col("k") / m) + 1).alias("p0"),
            (
                F.floor(F.col("la") * (F.col("k") + 1) / m)
                - F.floor(F.col("la") * F.col("k") / m)
            ).alias("slen"),
        )
        .where(F.col("slen") >= 1)
        .select(
            "_id",
            "_text",
            "la",
            "k",
            "slen",
            F.explode(
                F.sequence(
                    F.greatest(F.col("p0") - d, F.lit(1)),
                    F.least(F.col("p0") + d, F.col("_len") - F.col("slen") + 1),
                )
            ).alias("p"),
        )
        .select(
            F.col("_id").alias("id_b"),
            F.col("la").alias("seg_la"),
            "k",
            F.expr("substring(_text, p, slen)").alias("seg"),
        )
    )
    seg_pairs = index.join(probe, on=["seg_la", "k", "seg"]).where(
        F.col("id_a") != F.col("id_b")
    )

    # -- degenerate tiny-string path (len < m on the shorter side) --------
    # Any pair whose shorter member has < m chars has BOTH members ≤ 2d+1
    # chars. Block on a coarse length bucket of width m (each tiny doc
    # probes its own bucket ±1 — covers |Δlen| ≤ d), verify later like every
    # other candidate. Bounded: work is (tiny docs per bucket)², and tiny
    # docs are ≤ 2d+1 chars.
    tiny = base.where(F.col("_len") < m).select(
        F.col("_id").alias("id_a"),
        F.floor(F.col("_len") / m).alias("bucket"),
    )
    small = base.where(F.col("_len") <= 2 * d + 1).select(
        F.col("_id").alias("id_b"),
        F.explode(
            F.sequence(
                F.greatest(F.floor(F.col("_len") / m) - 1, F.lit(0)),
                F.floor(F.col("_len") / m) + 1,
            )
        ).alias("bucket"),
    )
    tiny_pairs = tiny.join(small, on="bucket").where(F.col("id_a") != F.col("id_b"))

    both = seg_pairs.select("id_a", "id_b").unionByName(
        tiny_pairs.select("id_a", "id_b")
    )
    return both.select(
        F.least("id_a", "id_b").alias("doc_a"),
        F.greatest("id_a", "id_b").alias("doc_b"),
    ).distinct()


def editdist_near_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dist: int = 4,
) -> DataFrame:
    """All pairs ``(doc_a, doc_b, dist)`` with ``levenshtein ≤ max_dist``.

    Exact result (candidates are a pigeonhole-guaranteed superset; the
    thresholded ``levenshtein`` verification is the definition). Output is
    canonicalized ``doc_a < doc_b``; ``dist`` is the exact edit distance.
    """
    cands = editdist_candidates(
        docs, text_col=text_col, id_col=id_col, max_dist=max_dist
    )
    texts = docs.select(F.col(id_col).alias("_jid"), F.col(text_col).alias("_jtext"))
    scored = (
        cands.join(texts.withColumnRenamed("_jid", "doc_a").withColumnRenamed("_jtext", "text_a"), on="doc_a")
        .join(texts.withColumnRenamed("_jid", "doc_b").withColumnRenamed("_jtext", "text_b"), on="doc_b")
        .where(
            F.abs(F.length("text_a") - F.length("text_b")) <= max_dist
        )
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("text_a", "text_b", max_dist).alias("dist"),
        )
        .where(F.col("dist") >= 0)  # thresholded form returns -1 above max_dist
    )
    return scored


__all__ = ["editdist_candidates", "editdist_near_pairs"]
