"""Composed experiment readout: all legs fire, CUPED feeds Welch, SRM
guardrail catches a rigged split."""
from __future__ import annotations

import random

import pytest

from etl_for_all_studies_spark.plans.experiment_readout import experiment_readout


def _units(spark, *, effect=1.0, n=300, ratio=0.5, seed=7):
    rng = random.Random(seed)
    rows = []
    for u in range(n):
        # ratio=0.5 → deterministic alternation (an exactly fair split, so
        # the SRM pass assertion isn't hostage to binomial luck); other
        # ratios → random assignment (the rigged-split case)
        cohort = (u % 2) if ratio == 0.5 else (0 if rng.random() < ratio else 1)
        x = rng.gauss(10, 2)
        y = 0.8 * x + rng.gauss(0, 1) + (effect if cohort == 1 else 0.0)
        conv = 1 if rng.random() < (0.3 + (0.1 if cohort == 1 else 0.0)) else 0
        rows.append(("e", u, cohort, x, y, conv))
    return spark.createDataFrame(
        rows, "exp string, unit long, cohort int, pre double, post double, conv int"
    )


def test_readout_detects_planted_effect_with_cuped(spark):
    df = _units(spark, effect=1.0)
    res = experiment_readout(
        df, group_cols=["exp"], cohort_col="cohort", metric_col="post",
        cohort_a=0, cohort_b=1, unit_col="unit", pre_col="pre",
        success_col="conv",
    )
    w = res.welch.collect()[0]
    assert w["p_value"] < 0.01  # CUPED-adjusted Welch sees the 1.0 shift
    assert res.mann_whitney.collect()[0]["p_value"] < 0.05
    assert res.ks.collect()[0]["p_value"] < 0.05
    assert res.proportions.collect()[0]["rate_b"] > res.proportions.collect()[0]["rate_a"]
    srm = res.srm.collect()[0]
    assert srm["srm_p"] > 0.01  # fair split passes the guardrail

    # CUPED sharpening: the unadjusted Welch t is weaker than the adjusted
    raw = experiment_readout(
        df, group_cols=["exp"], cohort_col="cohort", metric_col="post",
        cohort_a=0, cohort_b=1, unit_col="unit",
    )
    assert abs(raw.welch.collect()[0]["t_stat"]) < abs(w["t_stat"])


def test_readout_srm_guardrail_fires_on_rigged_split(spark):
    df = _units(spark, effect=0.0, ratio=0.8)  # designed 50/50, delivered 80/20
    res = experiment_readout(
        df, group_cols=["exp"], cohort_col="cohort", metric_col="post",
        cohort_a=0, cohort_b=1, unit_col="unit",
    )
    srm = res.srm.collect()[0]
    assert srm["srm_p"] < 1e-6  # the invalidating signal
    assert res.proportions is None  # no success column supplied
