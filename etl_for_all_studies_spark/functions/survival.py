"""Survival analysis: the Kaplan–Meier product-limit estimator.

Churn, time-to-conversion, and hardware-lifetime questions share a shape:
units observed for different durations, some reaching the event (churned,
converted, failed), others *censored* (still alive when observation ends).
Naive "average time to event" over non-censored units is biased; the
Kaplan–Meier estimator (JASA 53(282), 1958) is the standard fix:

    S(t) = Π_{tᵢ ≤ t} (1 − dᵢ / nᵢ)

over distinct event times tᵢ, with dᵢ events and nᵢ the at-risk count
(units whose duration ≥ tᵢ — censored units leave the risk set without
contributing an event).

Spark-first shape — everything collapses to distinct durations first:

* ONE (group, duration) aggregation yields dᵢ and the censored count;
* the at-risk curve is ``n − cumsum(previous rows)`` — a cumulative window
  over DISTINCT durations (cardinality: distinct times, not units);
* the running product is ``exp(cumsum(ln(1 − d/n)))`` — the log transform
  turns an unsupported cumulative product into a plain cumulative sum,
  with ``ln``/``exp`` bit-replicable in the oracle (grid-snapped output
  absorbs the last-ulp libm difference).

S(t) = 0 after a time where dᵢ = nᵢ (everyone at risk dies): ln(0) is
guarded to NULL and carried forward as exact zero survival.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def kaplan_meier(
    df: DataFrame,
    *,
    group_cols: list[str],
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """K-M survival curve per group from (duration, event ∈ {0,1}) rows
    (event = 0 means censored at ``duration``).

    Output: one row per (group, distinct duration) — (duration, n_risk,
    n_events, n_censored, survival), survival evaluated AT that duration
    (events at t are counted; rows with dᵢ = 0, censoring-only times, are
    kept so the curve's risk-set bookkeeping is auditable).
    """
    per_t = df.groupBy(*group_cols, duration_col).agg(
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
        F.sum((F.lit(1) - F.col(event_col)).cast("long")).alias("n_censored"),
    )
    w_tot = Window.partitionBy(*group_cols)
    w_prev = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(duration_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(duration_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(w_tot)
    gone_before = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(w_prev), F.lit(0)
    )
    at_risk = (total - gone_before).alias("n_risk")
    stepped = per_t.select(
        *group_cols, duration_col, "n_events", "n_censored", at_risk
    )
    # ln(1 - d/n): NULL at d = n (absorbing zero) — once any prior time hit
    # zero survival, the cumulative sum is NULL-poisoned and we emit exact 0
    frac = F.lit(1.0) - F.col("n_events") / F.col("n_risk")
    log_term = F.when(frac > 0, F.log(frac)).otherwise(F.lit(None))
    hit_zero = F.max((frac <= 0).cast("long")).over(w_cum)
    log_surv = F.sum(log_term).over(w_cum)
    survival = F.when(hit_zero == 1, F.lit(0.0)).otherwise(F.exp(log_surv))
    return stepped.withColumn("survival", survival)


__all__ = ["kaplan_meier"]
