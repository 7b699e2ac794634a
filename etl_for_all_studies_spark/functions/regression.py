"""Distributed ordinary least squares via the normal equations.

The closed-form fit nobody should shell out to an ML library for: with a
modest feature count d (dozens, not thousands), OLS reduces to ONE
aggregation pass computing the Gram matrix ``X'X`` (d+1 × d+1 with the
intercept column) and ``X'y`` per group — d(d+3)/2 + d + 3 codegen'd sum
aggregates, map-side combinable — followed by a (groups × d²)-bounded
driver-side solve (numpy, same "small enough for the driver" contract as
k-means centroids). R² comes from the same aggregates
(``SSE = Σy² − β'X'y``), so the whole fit is a single scan.

At 100 TB: the scan dominates and parallelizes perfectly; the driver work
is groups · d³ flops — microseconds. The d-large regime (embeddings as
features) belongs to iterative solvers, out of scope here by design.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ols_fit(
    df: DataFrame,
    *,
    feature_cols: list[str],
    label_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group OLS of ``label_col`` on ``feature_cols`` (+ intercept).

    Output: group_cols + (n, intercept, coef array<double> in feature
    order, r2). Groups whose normal equations are singular (constant
    feature, n ≤ d) return NULL coefficients — visible, not crashed.
    """
    import numpy as np

    groups = list(group_cols or [])
    feats = ["__one", *feature_cols]
    base = df.withColumn("__one", F.lit(1.0))
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, a in enumerate(feats):
        for b in feats[i:]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"xx_{a}_{b}"))
        aggs.append(F.sum(F.col(a) * F.col(label_col)).alias(f"xy_{a}"))
    aggs.append(F.sum(F.col(label_col) * F.col(label_col)).alias("yy"))
    gram = base.groupBy(*groups).agg(*aggs).collect()  # groups × d² bounded

    d = len(feats)
    out_rows = []
    for row in gram:
        r = row.asDict()
        xtx = np.empty((d, d))
        xty = np.empty(d)
        for i, a in enumerate(feats):
            for j in range(i, d):
                xtx[i, j] = xtx[j, i] = r[f"xx_{a}_{feats[j]}"]
            xty[i] = r[f"xy_{a}"]
        n = r["n"]
        try:
            beta = np.linalg.solve(xtx, xty)
            sse = max(r["yy"] - float(beta @ xty), 0.0)
            sst = r["yy"] - (r["xy___one"] ** 2) / n  # Σy² − n·ȳ²
            r2 = 1.0 - sse / sst if sst > 0 else None
            out_rows.append(
                (*[r[g] for g in groups], n, float(beta[0]),
                 [float(b) for b in beta[1:]], r2)
            )
        except np.linalg.LinAlgError:
            out_rows.append((*[r[g] for g in groups], n, None, None, None))

    schema_groups = "".join(
        f"{g} {dict(df.dtypes)[g]}, " for g in groups
    )
    return df.sparkSession.createDataFrame(
        out_rows,
        schema_groups
        + "n long, intercept double, coef array<double>, r2 double",
    )


__all__ = ["ols_fit"]
