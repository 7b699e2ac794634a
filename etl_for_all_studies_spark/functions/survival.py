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

from .stats import normal_cdf_expr


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


def logrank_test(
    df: DataFrame,
    *,
    group_cols: list[str],
    cohort_col: str,
    duration_col: str,
    event_col: str,
    cohort_a,
    cohort_b,
) -> DataFrame:
    """Two-cohort log-rank test (Mantel–Cox): are the survival curves the
    same? The hypothesis test that belongs next to :func:`kaplan_meier`'s
    picture.

    At every distinct pooled event time, cohort A's observed events are
    compared with the expectation under H₀ (events split ∝ at-risk
    counts): ``O−E = Σ(d_At − d_t·n_At/n_t)``, hypergeometric variance
    ``V = Σ d_t·(n_At/n_t)(1−n_At/n_t)(n_t−d_t)/(n_t−1)``, and
    ``χ² = (O−E)²/V`` with ONE degree of freedom — whose survival function
    is ``2(1−Φ(√χ²))``, i.e. exactly the shared A&S closed form; no
    incomplete gamma needed, and the oracle replays it term-for-term.

    Same scale shape as the estimator: everything reduces to distinct
    durations before any window. Output: group_cols + (n_a, n_b, o_minus_e,
    var_oe, chi2, p_value) — NULL-gated when either cohort is empty or V=0.
    """
    both = df.where(F.col(cohort_col).isin([cohort_a, cohort_b]))
    in_a = (F.col(cohort_col) == cohort_a).cast("long")
    per_t = both.groupBy(*group_cols, duration_col).agg(
        F.sum(in_a * F.col(event_col)).alias("d_a"),
        F.sum((1 - in_a) * F.col(event_col)).alias("d_b"),
        F.sum(in_a).alias("u_a"),
        F.sum(F.lit(1) - in_a).alias("u_b"),
    )
    w_tot = Window.partitionBy(*group_cols)
    w_prev = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(duration_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_a_t = F.sum("u_a").over(w_tot) - F.coalesce(
        F.sum("u_a").over(w_prev), F.lit(0)
    )
    n_b_t = F.sum("u_b").over(w_tot) - F.coalesce(
        F.sum("u_b").over(w_prev), F.lit(0)
    )
    stepped = per_t.select(
        *group_cols, duration_col, "d_a", "d_b",
        n_a_t.alias("na"), n_b_t.alias("nb"),
    )
    d_t = F.col("d_a") + F.col("d_b")
    n_t = F.col("na") + F.col("nb")
    e_a = d_t * F.col("na") / n_t
    v_t = F.when(
        n_t > 1,
        d_t
        * (F.col("na") / n_t)
        * (F.lit(1.0) - F.col("na") / n_t)
        * (n_t - d_t)
        / (n_t - 1),
    ).otherwise(F.lit(0.0))
    agg = stepped.groupBy(*group_cols).agg(
        F.max("na").alias("__na0"),  # first time's risk set = cohort size
        F.max("nb").alias("__nb0"),
        F.sum(F.col("d_a") - e_a).alias("o_minus_e"),
        F.sum(v_t).alias("var_oe"),
    )
    ok = (F.col("__na0") > 0) & (F.col("__nb0") > 0) & (F.col("var_oe") > 0)
    chi2 = F.col("o_minus_e") * F.col("o_minus_e") / F.col("var_oe")
    p = F.lit(2.0) * (F.lit(1.0) - normal_cdf_expr(F.sqrt(chi2)))
    p = F.least(F.greatest(p, F.lit(0.0)), F.lit(1.0))
    return agg.select(
        *group_cols,
        F.col("__na0").alias("n_a"),
        F.col("__nb0").alias("n_b"),
        F.when(ok, F.col("o_minus_e")).alias("o_minus_e"),
        F.when(ok, F.col("var_oe")).alias("var_oe"),
        F.when(ok, chi2).alias("chi2"),
        F.when(ok, p).alias("p_value"),
    )


__all__ = ["kaplan_meier", "logrank_test"]
