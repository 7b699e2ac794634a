"""Experiment analysis: CUPED variance reduction.

CUPED (Controlled-experiment Using Pre-Experiment Data — Deng, Xu, Kohavi,
Walker, WSDM 2013) is the standard variance-reduction trick of every large
A/B platform: a user's pre-experiment metric X is correlated with their
in-experiment metric Y, so analyzing the adjusted metric

    Y' = Y − θ·(X − E[X]),   θ = cov(X, Y) / var(X)

removes the between-user variance X explains (factor 1 − ρ² — often 40-60%
narrower CIs for the same traffic) without biasing the treatment effect
(X predates assignment, so E[X | cohort] is cohort-independent).

Spark-first shape: per-unit pre/post aggregation (two conditional
aggregates in ONE pass over the event log), θ from one global
``covar_samp``/``var_samp`` aggregation per group (group-bounded driver-free
join-back), adjustment as a narrow projection. Welch on the adjusted metric
reuses :func:`~.stats.welch_t_test` unchanged — CUPED composes with the
existing test instead of reimplementing one.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cuped_adjust(
    df: DataFrame,
    *,
    group_cols: list[str],
    unit_col: str,
    pre_col: str,
    post_col: str,
) -> DataFrame:
    """Add the CUPED-adjusted metric to per-unit (pre, post) rows.

    Input: one row per experimental unit with its pre-period covariate and
    in-period metric (build it with two masked aggregates over the raw
    log). Units with NULL pre fall back to the unadjusted metric with the
    group-mean covariate (θ·0 correction — the standard "no history"
    handling). Zero-variance X in a group ⇒ θ = 0 (nothing to remove).

    Output: input columns + ``theta`` + ``adjusted``.
    """
    stats = df.groupBy(*group_cols).agg(
        F.covar_samp(pre_col, post_col).alias("__cov"),
        F.var_samp(pre_col).alias("__var"),
        F.avg(pre_col).alias("__mean_pre"),
    )
    theta = F.when(
        F.col("__var") > 0, F.col("__cov") / F.col("__var")
    ).otherwise(F.lit(0.0))
    joined = df.join(F.broadcast(stats), group_cols)
    centered = F.coalesce(
        F.col(pre_col) - F.col("__mean_pre"), F.lit(0.0)
    )
    return joined.select(
        *df.columns,
        theta.alias("theta"),
        (F.col(post_col) - theta * centered).alias("adjusted"),
    )


__all__ = ["cuped_adjust"]
