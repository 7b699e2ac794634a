"""Co-occurrence mining: planted baskets, outlier-basket gate, top-k."""
from __future__ import annotations

import pytest
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


def test_attribution_models_conserve_credit_and_order_weights(spark):
    """Each converted purchase's weights sum to exactly 1 under every
    model; last-touch picks the latest touch; time-decay weights decrease
    with age; out-of-window and post-conversion touches get nothing."""
    from etl_for_all_studies_spark.operators.attribution import (
        attribute_conversions,
        attribution_summary,
    )

    H = 3_600_000_000  # one hour in us
    rows = [
        # user 1: touches at t=0h(view), 2h(click), 3h(view); purchase at 4h
        (1, 1, 0 * H, "view", 0.0),
        (2, 1, 2 * H, "click", 0.0),
        (3, 1, 3 * H, "view", 0.0),
        (4, 1, 4 * H, "purchase", 9.9),
        (5, 1, 5 * H, "view", 0.0),         # AFTER conversion → no credit
        # user 2: touch far outside the 24h window, purchase gets nothing
        (6, 2, 0, "view", 0.0),
        (7, 2, 30 * 24 * H, "purchase", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, event_type string, value double"
    )

    def run(model):
        return attribute_conversions(
            ev, conversion_type="purchase", touch_types=("view", "click"),
            window_us=24 * H, model=model, half_life_us=H,
        )

    for model in ("last", "linear", "time_decay", "u_shaped"):
        credits = run(model).collect()
        assert all(r["conversion_id"] == 4 for r in credits)  # user 2 empty
        total = sum(r["weight"] for r in credits)
        assert total == pytest.approx(1.0, abs=1e-12)

    last = run("last").collect()
    assert len(last) == 1 and last[0]["touch_id"] == 3

    linear = {r["touch_id"]: r["weight"] for r in run("linear").collect()}
    assert linear == {1: pytest.approx(1 / 3), 2: pytest.approx(1 / 3),
                      3: pytest.approx(1 / 3)}

    decay = {r["touch_id"]: r["weight"] for r in run("time_decay").collect()}
    assert decay[3] > decay[2] > decay[1]  # fresher touch, more credit
    # explicit geometry: weights ∝ 2^-4, 2^-2, 2^-1 (ages 4h, 2h, 1h)
    z = 2 ** -4 + 2 ** -2 + 2 ** -1
    assert decay[1] == pytest.approx(2 ** -4 / z, abs=1e-12)

    summary = {r["touch_type"]: r["credit"]
               for r in attribution_summary(run("time_decay")).collect()}
    assert sum(summary.values()) == pytest.approx(1.0, abs=1e-12)

    u = {r["touch_id"]: r["weight"] for r in run("u_shaped").collect()}
    # 3 touches: first 0.4, last 0.4, middle shares 0.2
    assert u == {1: pytest.approx(0.4), 2: pytest.approx(0.2),
                 3: pytest.approx(0.4)}

    with pytest.raises(ValueError):
        run("first_click")
