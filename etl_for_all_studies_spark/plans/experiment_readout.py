"""Experiment readout: the full A/B analysis as ONE composed plan.

The statistics operators (``functions/stats.py``, ``functions/
experiments.py``) each answer one question; an experiment review asks all
of them at once. This plan takes a cohorted per-unit metric table and
returns the complete readout surface:

* **welch** — mean difference (the headline, variance-reduced when a
  pre-period covariate is supplied: CUPED runs FIRST and Welch analyzes
  the adjusted metric);
* **mann_whitney** — location shift robust to outliers;
* **ks** — any distributional difference (variance, tails, bimodality);
* **proportions** — conversion-rate gap on a binary success column, when
  one is supplied;
* **srm** — the sample-ratio-mismatch guardrail: a proportions z-test of
  the observed assignment split against the expected ratio. A failed SRM
  invalidates everything above it, which is why a readout without this
  check is malpractice (the industry's most-cited A/B pitfall).

Every underlying operator is oracle-checked individually in the suite;
the composition only wires them, so the audit surface inherits the
correctness evidence. All legs share the cohorted input (persist it in
the caller's CacheScope when reading from cold storage).
"""
from __future__ import annotations

import dataclasses

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.experiments import cuped_adjust
from ..functions.stats import (
    ks_two_sample,
    mann_whitney_u,
    normal_cdf_expr,
    proportions_z_test,
    welch_t_test,
)


@dataclasses.dataclass
class ExperimentReadout:
    """Lazily-evaluated readout legs (all per group_cols)."""

    welch: DataFrame
    mann_whitney: DataFrame
    ks: DataFrame
    proportions: DataFrame | None
    srm: DataFrame


def experiment_readout(
    units: DataFrame,
    *,
    group_cols: list[str],
    cohort_col: str,
    metric_col: str,
    cohort_a,
    cohort_b,
    unit_col: str,
    pre_col: str | None = None,
    success_col: str | None = None,
    expected_ratio: float = 0.5,
) -> ExperimentReadout:
    """Run the full readout over per-unit rows.

    ``pre_col``: optional pre-period covariate — enables CUPED, and the
    Welch leg then tests the ADJUSTED metric. ``success_col``: optional 0/1
    conversion flag for the proportions leg. ``expected_ratio``: cohort_a's
    designed share of traffic for the SRM guardrail.
    """
    metric = metric_col
    df = units
    if pre_col is not None:
        df = cuped_adjust(
            units, group_cols=group_cols, unit_col=unit_col,
            pre_col=pre_col, post_col=metric_col,
        )
        metric = "adjusted"

    common = dict(
        group_cols=group_cols, cohort_col=cohort_col,
        cohort_a=cohort_a, cohort_b=cohort_b,
    )
    welch = welch_t_test(df, value_col=metric, **common)
    mw = mann_whitney_u(df, value_col=metric, **common)
    ks = ks_two_sample(df, value_col=metric, **common)
    props = (
        proportions_z_test(units, success_col=success_col, **common)
        if success_col is not None
        else None
    )

    # SRM: observed split vs the designed ratio — an exact-variance z test
    # on the assignment counts (binomial under H0 with p = expected_ratio)
    counts = units.groupBy(*group_cols).agg(
        F.count(F.when(F.col(cohort_col) == cohort_a, F.lit(1))).alias("n_a"),
        F.count(F.when(F.col(cohort_col) == cohort_b, F.lit(1))).alias("n_b"),
    )
    n = F.col("n_a") + F.col("n_b")
    p0 = F.lit(expected_ratio)
    z = (F.col("n_a") - n * p0) / F.sqrt(n * p0 * (F.lit(1.0) - p0))
    p = F.lit(2.0) * (F.lit(1.0) - normal_cdf_expr(F.abs(z)))
    srm = counts.select(
        *group_cols, "n_a", "n_b",
        F.when(n > 0, z).alias("srm_z"),
        F.when(
            n > 0, F.least(F.greatest(p, F.lit(0.0)), F.lit(1.0))
        ).alias("srm_p"),
    )
    return ExperimentReadout(
        welch=welch, mann_whitney=mw, ks=ks, proportions=props, srm=srm
    )


__all__ = ["ExperimentReadout", "experiment_readout"]
