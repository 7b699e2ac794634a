"""Co-occurrence mining: planted baskets, outlier-basket gate, top-k."""
from __future__ import annotations

from pyspark.sql import functions as F

from etl_for_all_studies_spark.operators.cooccurrence import (
    basket_items,
    cooccurrence_counts,
    related_items_topk,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user long, day long, item long")


def test_pair_counts_set_semantics_and_min_count(spark):
    rows = [
        (1, 1, 10), (1, 1, 20), (1, 1, 20),   # dup item in basket counts once
        (2, 1, 10), (2, 1, 20),
        (2, 2, 10), (2, 2, 30),
        (3, 1, 99),                            # singleton basket → no pairs
    ]
    got = {
        (r["item_a"], r["item_b"]): r["n_baskets"]
        for r in cooccurrence_counts(
            _events(spark, rows), item=F.col("item"), key_cols=["user", "day"]
        ).collect()
    }
    assert got == {(10, 20): 2, (10, 30): 1}
    filtered = cooccurrence_counts(
        _events(spark, rows), item=F.col("item"), key_cols=["user", "day"],
        min_count=2,
    ).collect()
    assert {(r["item_a"], r["item_b"]) for r in filtered} == {(10, 20)}


def test_oversized_basket_dropped_entirely(spark):
    # user 9's single basket has 5 items; with max_basket=4 it contributes
    # nothing — not even pairs among its first 4 items
    rows = [(9, 1, i) for i in range(5)] + [(1, 1, 0), (1, 1, 1)]
    small_gate = cooccurrence_counts(
        _events(spark, rows), item=F.col("item"), key_cols=["user", "day"],
        max_basket=4,
    ).collect()
    assert {(r["item_a"], r["item_b"]) for r in small_gate} == {(0, 1)}
    no_gate = basket_items(
        _events(spark, rows), item=F.col("item"), key_cols=["user", "day"],
        max_basket=None,
    )
    assert no_gate.count() == 7


def test_related_topk_symmetric_and_tie_broken(spark):
    # item 1 co-occurs with 2 (x2 baskets), 3 (x1), 4 (x1) → rank: 2,3,4
    rows = [
        (1, 1, 1), (1, 1, 2),
        (2, 1, 1), (2, 1, 2),
        (3, 1, 1), (3, 1, 3),
        (4, 1, 1), (4, 1, 4),
    ]
    got = [
        (r["partner"], r["n_baskets"], r["rank"])
        for r in related_items_topk(
            _events(spark, rows), item=F.col("item"), key_cols=["user", "day"],
            k=2,
        ).where(F.col("item") == 1).orderBy("rank").collect()
    ]
    assert got == [(2, 2, 1), (3, 1, 2)]
    # symmetry: item 2's list leads with 1
    top_of_2 = related_items_topk(
        _events(spark, rows), item=F.col("item"), key_cols=["user", "day"], k=1
    ).where(F.col("item") == 2).collect()
    assert top_of_2[0]["partner"] == 1
