"""Prefix-filtered set-similarity join (operators/prefixjoin.py).

The load-bearing claim is EXACTNESS: prefix filtering must return
bit-identical pairs to the brute-force co-occurrence formulation at the
same threshold — the filter prunes candidates, never results. The scale
claim (candidates ≪ Σdf² co-occurrence pairs) is asserted on a corpus with
a deliberately hot shingle.
"""
import pytest
from pyspark.sql import functions as F

from etl_for_all_studies_spark.operators.dedup import ngram_jaccard_pairs
from etl_for_all_studies_spark.operators.prefixjoin import (
    jaccard_prefix_pairs,
    prefix_candidates,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
TEXTS = [
    BASE,
    BASE,  # exact clone → J = 1
    BASE.replace("quick", "rapid"),  # near-dup
    BASE.replace("fox", "cat").replace("dog", "owl"),  # near-dup, further
    "completely different content about spark physical plans and shuffles",
    "yet another unrelated document concerning parquet row group statistics",
    "ab",  # shorter than k=5 → empty shingle set, must not crash or pair
    "",
]


@pytest.mark.parametrize("threshold", [0.35, 0.6, 0.9])
def test_prefix_join_matches_bruteforce(spark, threshold):
    docs = _docs(spark, TEXTS)
    got = {
        (r.doc_a, r.doc_b, r.common, r.size_a, r.size_b, round(r.jaccard, 9))
        for r in jaccard_prefix_pairs(docs, k=5, threshold=threshold).collect()
    }
    want = {
        (r.doc_a, r.doc_b, r.common, r.size_a, r.size_b, round(r.jaccard, 9))
        for r in ngram_jaccard_pairs(docs, k=5, threshold=threshold).collect()
    }
    assert got == want
    if threshold <= 0.6:
        assert got, "fixture must produce pairs for the test to mean anything"


def test_candidates_are_superset_of_results_and_pruned(spark):
    # every doc shares the BASE suffix (hot shingles), so full co-occurrence
    # pairs = all-pairs; each doc's UNIQUE head is long enough that the
    # df-ascending prefix (≈10% of the set at t=0.9) is all head shingles —
    # disjoint across docs — so candidates collapse to the true clone pair
    import hashlib

    heads = [
        hashlib.md5(f"head-{i}".encode()).hexdigest()
        + hashlib.md5(f"tail-{i}".encode()).hexdigest()
        for i in range(10)
    ]
    texts = [h + " " + BASE for h in heads] + [BASE, BASE]
    docs = _docs(spark, texts)
    t = 0.9
    cand, _ = prefix_candidates(docs, k=5, threshold=t)
    n_cand = cand.count()
    results = jaccard_prefix_pairs(docs, k=5, threshold=t)
    n_res = results.count()
    all_pairs = 12 * 11 // 2
    assert n_res >= 1, "the clone pair must survive"
    assert n_res <= n_cand, "verification only ever drops candidates"
    assert n_cand < all_pairs, (
        f"prefix + length filter kept {n_cand}/{all_pairs} pairs — the "
        "filter did nothing on a corpus built to be prunable"
    )


def test_prefix_join_exact_clones_score_one(spark):
    docs = _docs(spark, [BASE, BASE, "other text entirely different here"])
    rows = jaccard_prefix_pairs(docs, k=5, threshold=0.99).collect()
    assert [(r.doc_a, r.doc_b) for r in rows] == [(0, 1)]
    assert rows[0].jaccard == pytest.approx(1.0)
    assert rows[0].common == rows[0].size_a == rows[0].size_b


def test_threshold_validation():
    with pytest.raises(ValueError):
        prefix_candidates(None, threshold=0.0)
    with pytest.raises(ValueError):
        prefix_candidates(None, threshold=1.5)


@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_incremental_prefix_pairs_match_full_join_filtered(spark, threshold):
    """The incremental leg must find exactly the pairs TOUCHING the new
    batch that the full-corpus prefix join finds over new ∪ seen, with
    vs_seen tagging which side is stored — the exact-leg analog of
    incremental_minhash_dedup's contract (VERDICT r10 #3)."""
    from etl_for_all_studies_spark.operators.prefixjoin import (
        incremental_jaccard_prefix_pairs,
    )

    docs = _docs(spark, TEXTS)
    seen = docs.where(F.col("doc_id") < 4)
    new = docs.where(F.col("doc_id") >= 4).unionByName(
        spark.createDataFrame(
            [(100, BASE), (101, BASE.replace("quick", "rapid")),
             (102, BASE)],  # in-batch clone of 100 → a new×new pair at any t
            "doc_id long, text string",
        )
    )
    inc = {
        (r.doc_a, r.doc_b, r.vs_seen, r.common, r.size_a, r.size_b)
        for r in incremental_jaccard_prefix_pairs(
            new, seen, threshold=threshold
        ).collect()
    }
    seen_ids = {r.doc_id for r in seen.collect()}
    full = {
        (r.doc_a, r.doc_b,
         1 if (r.doc_a in seen_ids) != (r.doc_b in seen_ids) else 0,
         r.common, r.size_a, r.size_b)
        for r in jaccard_prefix_pairs(
            new.unionByName(seen), threshold=threshold
        ).collect()
        if not (r.doc_a in seen_ids and r.doc_b in seen_ids)
    }
    assert inc == full
    assert any(v == 1 for (_, _, v, _, _, _) in inc)   # vs-seen pairs exist
    assert any(v == 0 for (_, _, v, _, _, _) in inc)   # new×new pairs exist


def test_incremental_prefix_never_enumerates_seen_seen(spark):
    """Two identical SEEN docs must produce no pair — seen×seen is outside
    the incremental contract (stability: stored keepers never churn)."""
    from etl_for_all_studies_spark.operators.prefixjoin import (
        incremental_jaccard_prefix_pairs,
    )

    seen = _docs(spark, [BASE, BASE])           # ids 0, 1: exact clones
    new = spark.createDataFrame(
        [(10, "a wholly unrelated new arrival about columnar formats")],
        "doc_id long, text string",
    )
    got = incremental_jaccard_prefix_pairs(new, seen, threshold=0.8).collect()
    assert got == []
