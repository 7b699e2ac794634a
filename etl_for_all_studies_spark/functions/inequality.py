"""Concentration / inequality metrics: Gini coefficient and HHI.

"How concentrated is revenue across customers / traffic across sources /
tokens across documents?" — the portfolio-risk and marketplace-health
question. Two standard scalars per group:

* **Gini** ∈ [0, 1): from the sorted-values identity
  ``G = (2·Σᵢ i·x₍ᵢ₎) / (n·Σx) − (n+1)/n`` — one rank window (the sort) +
  one aggregation; ties get a deterministic total order via a tiebreak
  column and the identity is tie-invariant (equal values commute within
  the weighted sum... their ranks are consecutive integers whose weights
  sum identically under any permutation of equals).
* **HHI** (Herfindahl–Hirschman) = Σ share² — a pure aggregation, the
  antitrust-screen scalar (10 000·HHI > 2 500 ⇒ "highly concentrated").

Negative values are rejected (Gini is defined for non-negative
distributions); zero-total groups gate to NULL.

Scale bound, stated honestly: the Gini identity needs a per-group RANK —
a window sort whose partition is the whole group, i.e. one task per group.
Fine for segment/region/source groupings (few, large-but-sortable groups);
for a single planet-scale group, switch to the bucketed Lorenz
approximation (quantile edges from ``percentile``, trapezoid area — same
machinery as ``functions/drift.py``'s PSI buckets) rather than this exact
form. HHI has no such bound (pure aggregation).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def concentration(
    df: DataFrame,
    *,
    group_cols: list[str],
    value_col: str,
    id_col: str,
) -> DataFrame:
    """(group..., n, total, gini, hhi) per group over non-negative values.

    ``id_col`` totalizes the sort order (Gini's weighted sum is
    tie-invariant, but a total order keeps the plan deterministic).
    """
    w_rank = Window.partitionBy(*group_cols).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    ranked = df.select(
        *group_cols,
        F.col(value_col).cast("double").alias("__v"),
        F.row_number().over(w_rank).alias("__i"),
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__v").alias("total"),
        F.sum(F.col("__i") * F.col("__v")).alias("__iw"),
        F.sum(F.col("__v") * F.col("__v")).alias("__sq"),
        F.min("__v").alias("__minv"),
    )
    ok = (F.col("total") > 0) & (F.col("__minv") >= 0)
    gini = (
        F.lit(2.0) * F.col("__iw") / (F.col("n") * F.col("total"))
        - (F.col("n") + 1) / F.col("n").cast("double")
    )
    hhi = F.col("__sq") / (F.col("total") * F.col("total"))
    return agg.select(
        *group_cols, "n", "total",
        F.when(ok, gini).alias("gini"),
        F.when(ok, hhi).alias("hhi"),
    )


__all__ = ["concentration"]
