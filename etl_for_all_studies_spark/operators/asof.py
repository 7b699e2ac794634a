"""As-of (point-in-time) join: each left row matched to the latest right row
at or before its timestamp, per key.

Beyond-reference capability: feature stores, market data, and event
enrichment all need "state as of event time". Spark has no ASOF JOIN
operator; the naive formulations both fail at scale — a range join
(``l.ts >= r.ts``) explodes to O(|L|·|R|) per key before aggregation, and a
per-key ``collect_list`` + UDF serializes whole keys through Python.

The scalable formulation is **union-and-window**: tag both inputs, union
them into one stream, sort once per key by (event time, side), and carry the
most recent right-side value forward with ``last_value(..., ignoreNulls)``
over a running frame. Cost: one shuffle on the key + one in-partition sort —
the same shape as any windowed aggregation, linear in |L|+|R|, with map-side
partial nothing to explode. Right-side rows at exactly the left row's
timestamp DO match (ties sort right-before-left).

The same plan is ANSI-expressible (one window function), so the suite query
carries a full DuckDB oracle (``suite.py::q_events_asof``).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Enrich ``left`` with the most recent ``right`` row (per ``key``) whose
    ``right_ts`` <= ``left_ts``.

    Output: all ``left`` columns plus ``<value_col><suffix>`` for each
    requested right-side value column (NULL when no right row precedes).
    """
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("__ts"),
            *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        )
        .withColumn("__side", F.lit(0))
    )
    # align schemas for the union: left rows carry NULL right-values
    for c in value_cols:
        lt = lt.withColumn(f"__r_{c}", F.lit(None).cast(rt.schema[f"__r_{c}"].dataType))
    rcols = [f"__r_{c}" for c in value_cols]
    merged = lt.select(
        *left.columns, F.col(key).alias("__key"), "__ts", "__side", *rcols
    ).unionByName(
        rt.select(
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
            F.col(key).alias("__key"),
            "__ts",
            "__side",
            *rcols,
        )
    )
    # right rows sort BEFORE left rows at equal timestamps → ties match
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        *left.columns,
        F.col("__side"),
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.where(F.col("__side") == 1).drop("__side")


__all__ = ["asof_join"]
