"""Multi-touch attribution: distribute conversion credit across the
preceding touchpoints.

The funnel (``q_events_funnel``) says *whether* users convert; attribution
says *which touches deserve credit* — the question ad/growth analytics
actually bills on. Three standard models over the same touch join:

* ``last``   — the final touch before conversion gets weight 1;
* ``linear`` — every qualifying touch shares 1/n;
* ``time_decay`` — weight ∝ 2^(−Δt / half_life), normalized per
  conversion (recent touches matter more; the industry default).

Spark-first shape: conversions ⋈ touches is a **user-keyed equi-join**
with the attribution window as a post-filter — the same shape as the
correlation pair join (equi keys + inequality post-filter), so it scales
with per-user activity, never users². Per-conversion normalization is one
window (or groupBy) over the conversion id — bounded by touches-per-
conversion. Bot-grade users with enormous touch counts are the documented
skew case; gate upstream with the co-visitation ``max_basket`` discipline
if needed.

Credit conservation invariant (pinned in tests): every converted
conversion's weights sum to exactly 1, so total credit = #attributed
conversions regardless of model.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def attribute_conversions(
    events: DataFrame,
    *,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    window_us: int = 86_400_000_000,
    model: str = "time_decay",
    half_life_us: int = 3_600_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Credit rows (conversion_id, touch_id, touch_type, delta_us, weight)
    for every conversion with ≥1 qualifying touch in its lookback window.
    """
    if model not in ("last", "linear", "time_decay", "u_shaped"):
        raise ValueError(f"unknown attribution model: {model!r}")
    conv = events.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("u"),
        F.col(id_col).alias("conversion_id"),
        F.col(ts_col).alias("c_ts"),
    )
    touch = events.where(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("u"),
        F.col(id_col).alias("touch_id"),
        F.col(type_col).alias("touch_type"),
        F.col(ts_col).alias("t_ts"),
    )
    pairs = conv.join(touch, "u").where(
        (F.col("t_ts") <= F.col("c_ts"))
        & (F.col("t_ts") > F.col("c_ts") - window_us)
    )
    w = Window.partitionBy("conversion_id")
    delta = (F.col("c_ts") - F.col("t_ts")).alias("delta_us")
    if model == "last":
        order = Window.partitionBy("conversion_id").orderBy(
            F.col("t_ts").desc(), F.col("touch_id").desc()
        )
        weighted = pairs.withColumn("__rn", F.row_number().over(order)).select(
            "conversion_id", "touch_id", "touch_type", delta,
            F.when(F.col("__rn") == 1, F.lit(1.0)).otherwise(F.lit(0.0))
            .alias("weight"),
        ).where(F.col("weight") > 0)
    elif model == "linear":
        weighted = pairs.select(
            "conversion_id", "touch_id", "touch_type", delta,
            (F.lit(1.0) / F.count(F.lit(1)).over(w)).alias("weight"),
        )
    elif model == "time_decay":
        raw = F.pow(
            F.lit(2.0),
            -(F.col("c_ts") - F.col("t_ts")).cast("double") / half_life_us,
        )
        weighted = pairs.select(
            "conversion_id", "touch_id", "touch_type", delta,
            (raw / F.sum(raw).over(w)).alias("weight"),
        )
    else:  # u_shaped: 40% first touch, 40% last, 20% split over the middle
        asc = Window.partitionBy("conversion_id").orderBy(
            F.col("t_ts").asc(), F.col("touch_id").asc()
        )
        desc = Window.partitionBy("conversion_id").orderBy(
            F.col("t_ts").desc(), F.col("touch_id").desc()
        )
        n = F.count(F.lit(1)).over(w)
        first = F.row_number().over(asc) == 1
        last_ = F.row_number().over(desc) == 1
        weight = (
            F.when(n == 1, F.lit(1.0))
            .when(n == 2, F.lit(0.5))
            .when(first | last_, F.lit(0.4))
            .otherwise(F.lit(0.2) / (n - 2))
        )
        weighted = pairs.select(
            "conversion_id", "touch_id", "touch_type", delta,
            weight.alias("weight"),
        )
    return weighted


def attribution_summary(credits: DataFrame) -> DataFrame:
    """Per-touch-type rollup: (touch_type, n_touches, credit) — total
    credit sums to the number of attributed conversions."""
    return credits.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum("weight").alias("credit"),
    )


__all__ = ["attribute_conversions", "attribution_summary"]
