"""Persist lifecycle: operators that cache materialization barriers release
them deterministically through CacheScope (VERDICT r2 item 4 — a library user
composing operators in one long session must not accumulate cached blocks
until eviction thrash)."""
import pytest


def _n_cached_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.fixture()
def docs(spark):
    rows = [
        (i, f"sample document number {i} with shared tokens alpha beta gamma " * 3)
        for i in range(40)
    ] + [(100 + i, f"sample document number {i} with shared tokens alpha beta gamma " * 3) for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scope_releases_minhash_barriers(spark, docs):
    from etl_for_all_studies_spark.caching import CacheScope
    from etl_for_all_studies_spark.operators.dedup import minhash_dedup

    spark.catalog.clearCache()
    assert _n_cached_rdds(spark) == 0
    with CacheScope() as scope:
        pairs = minhash_dedup(docs, scope=scope)
        n = pairs.count()
        assert n > 0  # near-dup copies planted above
        assert _n_cached_rdds(spark) > 0  # barriers alive during consumption
    assert _n_cached_rdds(spark) == 0  # all released on scope exit


def test_scope_releases_similarity_barriers(spark):
    from etl_for_all_studies_spark.caching import CacheScope
    from etl_for_all_studies_spark.operators.similarity import (
        brute_force_topk,
        embedding_near_duplicates_ivf,
    )

    rows = [(i, [float((i * 7 + j * 3) % 13) for j in range(8)]) for i in range(64)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = vecs.limit(4).selectExpr("vec_id as cell", "embedding")
    spark.catalog.clearCache()
    with CacheScope() as scope:
        topk = brute_force_topk(vecs.limit(8), vecs, k=3, scope=scope)
        dups = embedding_near_duplicates_ivf(vecs, cents, threshold=0.9, scope=scope)
        assert topk.count() > 0
        assert dups.count() >= 0
        assert _n_cached_rdds(spark) > 0
    assert _n_cached_rdds(spark) == 0


def test_repeated_composition_memory_steady(spark, docs):
    """Five rounds of the composed curation plan leave ZERO cached RDDs
    behind — the long-lived-session contract. Quality rules are relaxed to
    keep the synthetic fixture flowing through every stage (the rules
    themselves are pinned elsewhere)."""
    from etl_for_all_studies_spark.caching import CacheScope
    from etl_for_all_studies_spark.operators.quality import QualityRules
    from etl_for_all_studies_spark.plans.curation import curate_corpus

    rules = QualityRules(
        min_words=1, max_words=10_000, min_mean_word_len=0.0,
        max_mean_word_len=100.0, min_type_token_ratio=0.0, min_stopword_ratio=0.0,
    )
    spark.catalog.clearCache()
    for _ in range(5):
        with CacheScope() as scope:
            res = curate_corpus(docs, rules=rules, scope=scope)
            assert res.kept.count() > 0
        assert _n_cached_rdds(spark) == 0


def test_scope_none_keeps_legacy_contract(spark, docs):
    """scope=None still persists (the lazy-return path) — released by the
    harness's clearCache, exactly as bench.py does between queries."""
    from etl_for_all_studies_spark.operators.dedup import minhash_dedup

    spark.catalog.clearCache()
    pairs = minhash_dedup(docs)
    assert pairs.count() > 0
    assert _n_cached_rdds(spark) > 0
    spark.catalog.clearCache()
    assert _n_cached_rdds(spark) == 0
