"""Co-occurrence mining: item pairs sharing a basket, with per-item top-k.

"Users who engaged with X also engaged with Y" — the market-basket /
co-visitation primitive behind related-items, query expansion, and
curriculum grouping. Baskets here are (key, period) groups (e.g. a user's
items for one day); items co-occur when they appear in the same basket.

Spark-first shape and the scale hazard that defines this operator:

* baskets are built by ONE ``distinct`` over (key, period, item) — an item
  seen twice in a basket counts once (set semantics, the standard choice);
* pair generation is a **self-equi-join on the basket key** — candidates
  are per-basket, never corpus-wide. Cost is Σ|basket|², which is fine for
  human-scale baskets but explodes on outlier baskets (a bot user touching
  every item turns its basket into a quadratic bomb). The ``max_basket``
  gate drops oversized baskets *before* the join — the standard
  market-basket guard (outlier baskets carry no signal; every item
  co-occurs with everything) — making worst-case cost
  |baskets| · max_basket²;
* per-item rankings take the symmetric closure (both directions of each
  unordered pair) and a rank-limited window top-k per left item — count
  desc, partner asc, engine-independent total order.

At 100 TB: the distinct and the pair count are two shuffles keyed by
basket/pair; AQE absorbs residual pair-key skew (popular pairs), and the
basket-size gate bounds the join fan-out regardless of how skewed user
activity is.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def basket_items(
    events: DataFrame,
    *,
    item: Column,
    key_cols: list[str],
    max_basket: int | None = 64,
) -> DataFrame:
    """Distinct (basket keys..., item) rows, with baskets larger than
    ``max_basket`` items removed entirely (``None`` disables the gate)."""
    base = events.select(*key_cols, item.alias("item")).where(
        F.col("item").isNotNull()
    ).distinct()
    if max_basket is None:
        return base
    w = Window.partitionBy(*key_cols)
    return (
        base.withColumn("__bsz", F.count(F.lit(1)).over(w))
        .where(F.col("__bsz") <= max_basket)
        .drop("__bsz")
    )


def cooccurrence_counts(
    events: DataFrame,
    *,
    item: Column,
    key_cols: list[str],
    max_basket: int | None = 64,
    min_count: int = 1,
) -> DataFrame:
    """(item_a, item_b, n_baskets) for unordered pairs (item_a < item_b)
    co-occurring in at least ``min_count`` baskets."""
    baskets = basket_items(
        events, item=item, key_cols=key_cols, max_basket=max_basket
    )
    left = baskets.select(*key_cols, F.col("item").alias("item_a"))
    right = baskets.select(*key_cols, F.col("item").alias("item_b"))
    pairs = (
        left.join(right, key_cols)
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    return pairs.where(F.col("n_baskets") >= min_count)


def related_items_topk(
    events: DataFrame,
    *,
    item: Column,
    key_cols: list[str],
    k: int = 5,
    max_basket: int | None = 64,
    min_count: int = 1,
) -> DataFrame:
    """Per-item top-k co-occurring partners: (item, partner, n_baskets,
    rank) — symmetric closure of the pair counts, rank-limited per item."""
    pairs = cooccurrence_counts(
        events,
        item=item,
        key_cols=key_cols,
        max_basket=max_basket,
        min_count=min_count,
    )
    sym = pairs.select(
        F.col("item_a").alias("item"),
        F.col("item_b").alias("partner"),
        "n_baskets",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("partner"),
            "n_baskets",
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col("n_baskets").desc(), F.col("partner").asc()
    )
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


__all__ = ["basket_items", "cooccurrence_counts", "related_items_topk"]
