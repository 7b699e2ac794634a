"""Feature engineering: smoothed leave-one-out target encoding.

High-cardinality categoricals (domain, source, vendor id) can't one-hot;
the standard dense alternative encodes each category by the mean of the
label over that category. Two classic defects, both fixed here:

* **leakage** — a row's own label must not inform its own feature:
  leave-one-out arithmetic ``(Σ_cat − y_row) / (n_cat − 1)`` removes it
  exactly, with no per-row re-aggregation (the category totals are shared,
  the subtraction is a projection);
* **small-category variance** — rare categories' means are noise: additive
  smoothing shrinks toward the global prior with pseudo-count ``m``:
  ``(Σ − y + m·prior) / (n − 1 + m)``; singleton categories (n = 1) fall
  back to the pure prior instead of 0/0.

Scale shape: ONE category aggregation (map-side combined, category-
cardinality output — broadcast back), one global 1-row aggregate for the
prior, then a narrow projection. The label side of a 100 TB table is
scanned once.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode_loo(
    df: DataFrame,
    *,
    category_col: str,
    label_col: str,
    smoothing: float = 10.0,
    out_col: str = "te",
) -> DataFrame:
    """Input columns + ``out_col`` (the smoothed leave-one-out encoding).

    Rows with NULL label get the category's all-rows smoothed mean (they
    contribute nothing to leak). NULL categories form their own group
    (SQL grouping semantics) — encode-before-imputing is the caller's
    ordering decision.
    """
    # NULL categories form a real group under SQL grouping semantics, but a
    # plain equi-join would never match the NULL key back to its rows —
    # null-safe equality (<=>) keeps the join a hash join AND routes the
    # NULL group's rows to the NULL group's aggregate.
    cat = (
        df.groupBy(category_col)
        .agg(
            F.sum(label_col).alias("__s"),
            F.count(label_col).alias("__n"),
        )
        .withColumnRenamed(category_col, "__cat")
    )
    prior_row = df.agg(F.avg(label_col).alias("__prior"))
    joined = df.join(
        F.broadcast(cat), F.col(category_col).eqNullSafe(F.col("__cat")), "left"
    ).join(F.broadcast(prior_row))
    has_label = F.col(label_col).isNotNull()
    num = F.when(
        has_label, F.col("__s") - F.col(label_col)
    ).otherwise(F.col("__s")) + F.lit(smoothing) * F.col("__prior")
    den = F.when(has_label, F.col("__n") - 1).otherwise(F.col("__n")) + F.lit(
        smoothing
    )
    return joined.select(*df.columns, (num / den).alias(out_col))


__all__ = ["target_encode_loo"]
