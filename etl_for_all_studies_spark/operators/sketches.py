"""Mergeable distinct-count sketches (HyperLogLog, Apache DataSketches).

The 100 TB pattern exact distinct counts can't follow: you cannot re-scan
the whole history to count unique users/docs per day — instead each batch
aggregates a *mergeable sketch*, the sketch column lands in the warehouse
next to the batch's other aggregates, and any later rollup (per week, per
source, all time) is a cheap ``hll_union_agg`` over stored sketches. No
raw-data re-scan, no distinct shuffle over history; error is a fixed ~1-2%
at lgK=12 regardless of cardinality.

Thin, typed wrappers over Spark's native DataSketches expressions (JVM
aggregates, map-side combinable — sketches merge inside the partial
aggregation, so the shuffle carries one sketch per group per partition):

* :func:`sketch_distinct` — per-group HLL sketch column (the batch step);
* :func:`merge_sketches` — re-aggregate stored sketches to coarser groups
  (the rollup step);
* :func:`estimate` — sketch → approximate distinct count.

The merge property (union-of-batches ≡ sketch-of-union) and the accuracy
envelope are pinned in ``tests/test_llm_ops.py``; exactness is explicitly
NOT the contract — the exact twin is ``profile_columns``/``count_distinct``
(oracle-checked), this is the incremental path.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12  # DataSketches default: ~1.6% relative standard error


def sketch_distinct(
    df: DataFrame,
    *,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch per group over ``value_col`` (the per-batch step)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias(sketch_col)
    )


def merge_sketches(
    sketches: DataFrame,
    *,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Roll stored sketches up to coarser groups (no raw-data re-scan)."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )


def estimate(sketch: Column) -> Column:
    """Approximate distinct count from a sketch column."""
    return F.hll_sketch_estimate(sketch)


def theta_distinct(
    df: DataFrame,
    *,
    group_cols: list[str],
    value_col: str,
    sketch_col: str = "theta",
) -> DataFrame:
    """One Theta sketch per group — like HLL, but supporting SET ALGEBRA:
    stored Theta sketches intersect/difference as well as union, so
    "users active in BOTH periods" (retention) or "docs in A but not B"
    come from sketch math over stored aggregates — questions HLL cannot
    answer and exact distinct cannot answer without re-scanning history."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(F.col(value_col)).alias(sketch_col)
    )


def theta_overlap(a: Column, b: Column) -> Column:
    """Estimated |A ∩ B| from two Theta sketch columns."""
    return F.theta_sketch_estimate(F.theta_intersection(a, b))


def theta_only_in_first(a: Column, b: Column) -> Column:
    """Estimated |A \\ B| from two Theta sketch columns."""
    return F.theta_sketch_estimate(F.theta_difference(a, b))


def quantile_sketch(
    df: DataFrame,
    *,
    group_cols: list[str],
    value_col: str,
    sketch_col: str = "kll",
) -> DataFrame:
    """One KLL quantile sketch (double) per group — the mergeable analog of
    ``percentile``: per-batch sketches land in the warehouse, any later
    rollup merges them and reads arbitrary quantiles without re-scanning
    raw values. Bounded size regardless of row count."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col)).alias(sketch_col)
    )


def merge_quantile_sketches(
    sketches: DataFrame,
    *,
    group_cols: list[str],
    sketch_col: str = "kll",
) -> DataFrame:
    """Roll stored KLL sketches up to coarser groups."""
    return sketches.groupBy(*group_cols).agg(
        F.kll_merge_agg_double(F.col(sketch_col)).alias(sketch_col)
    )


def quantile_estimate(sketch: Column, q: float) -> Column:
    """Approximate q-quantile from a KLL sketch column."""
    return F.kll_sketch_get_quantile_double(sketch, F.lit(q))


__all__ = [
    "DEFAULT_LGK",
    "estimate",
    "merge_quantile_sketches",
    "merge_sketches",
    "quantile_estimate",
    "quantile_sketch",
    "sketch_distinct",
    "theta_distinct",
    "theta_only_in_first",
    "theta_overlap",
]
