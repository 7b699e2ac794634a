"""Distributed global total-order: rank + running sums without a global window.

``Window.orderBy(...)`` with no partition is the classic scale cliff — Spark
prints "No Partition Defined for Window operation! Moving all data to a
single partition" and funnels the whole table through ONE task. Yet global
order statistics (dense rank, ntile scoring, cumulative share) are bread-and-
butter analytics. This operator computes them exactly, with every stage
splittable:

1. ``repartitionByRange`` on the order key — a distributed sort: each task
   owns one contiguous key range (the same exchange a global ``orderBy``
   plans, WITHOUT the subsequent single-partition window);
2. per-range ``row_number`` / running sums via a window partitioned by the
   range id — parallelism = number of ranges;
3. a TINY per-range stats table (one row per range: row count, value sums,
   first key) ordered by each range's first key → cumulative offsets;
4. broadcast the offsets back: ``global = local + offset``.

This is the same per-partition-offset numbering ``operators/dims.py`` uses
for dim_sample keys, generalized to any total order plus running sums.
Values are EXACT — range bounds (sampled) affect only load balance, and
ordering the stats table by each range's first row key (not the physical
partition id) keeps the offsets correct even if the runtime renumbers or
coalesces partitions.

The order key must be a total order (include a unique tiebreaker column)
for deterministic output — the same requirement the global-window form has.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def attach_global_order(
    df: DataFrame,
    *,
    order: list[tuple[str, bool]],
    rank_col: str | None = "rank",
    running_sum: dict[str, str] | None = None,
    total_count_col: str | None = None,
    total_sum_cols: dict[str, str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Input columns + the requested global order statistics.

    ``order``: [(column, ascending), ...] — MUST be a total order.
    ``rank_col``: output column for the global row_number (None to skip).
    ``running_sum``: {out_col: value_col} — inclusive running sum of
    value_col in the global order.
    ``total_count_col`` / ``total_sum_cols``: optionally attach the global
    row count / {out_col: value_col} grand totals (computed from the same
    tiny stats table — no extra scan), for ntile/share arithmetic.
    """
    running_sum = running_sum or {}
    total_sum_cols = total_sum_cols or {}
    sort_exprs = [
        (F.col(c).asc() if asc else F.col(c).desc()) for c, asc in order
    ]
    n_part = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    rp = df.repartitionByRange(n_part, *sort_exprs).withColumn(
        "__go_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__go_pid").orderBy(*sort_exprs)
    w_run = w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = rp.withColumn("__go_lr", F.row_number().over(w_local))
    for out, val in running_sum.items():
        local = local.withColumn(f"__go_run_{out}", F.sum(val).over(w_run))

    sum_aggs = [F.sum(val).alias(f"__go_s_{out}") for out, val in
                {**running_sum, **total_sum_cols}.items()]
    stats = local.groupBy("__go_pid").agg(
        F.count(F.lit(1)).alias("__go_c"), *sum_aggs
    )
    # each range's FIRST row key orders the stats table — robust to any
    # physical partition renumbering; ranges never interleave by construction
    firsts = local.where(F.col("__go_lr") == 1).select(
        "__go_pid", *[F.col(c).alias(f"__go_k_{c}") for c, _ in order]
    )
    stats = stats.join(firsts, "__go_pid")
    # the stats table is tiny (one row per range) — but partition the
    # windows by a literal anyway so no stage ever carries the
    # "No Partition Defined for Window" single-task signature
    w_prev = (
        Window.partitionBy(F.lit(0))
        .orderBy(
            *[
                (F.col(f"__go_k_{c}").asc() if asc else F.col(f"__go_k_{c}").desc())
                for c, asc in order
            ]
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(F.lit(0))
    off_cols = [
        "__go_pid",
        F.coalesce(F.sum("__go_c").over(w_prev), F.lit(0)).alias("__go_off"),
    ]
    for out in running_sum:
        off_cols.append(
            F.coalesce(F.sum(f"__go_s_{out}").over(w_prev), F.lit(0)).alias(
                f"__go_off_{out}"
            )
        )
    if total_count_col:
        off_cols.append(F.sum("__go_c").over(w_all).alias(total_count_col))
    for out, _ in total_sum_cols.items():
        off_cols.append(F.sum(f"__go_s_{out}").over(w_all).alias(out))
    offsets = stats.select(*off_cols)

    joined = local.join(F.broadcast(offsets), "__go_pid")
    out_cols = list(df.columns)
    proj: list[Column | str] = list(out_cols)
    if rank_col:
        proj.append((F.col("__go_lr") + F.col("__go_off")).alias(rank_col))
    for out, _ in running_sum.items():
        proj.append(
            (F.col(f"__go_run_{out}") + F.col(f"__go_off_{out}")).alias(out)
        )
    if total_count_col:
        proj.append(total_count_col)
    for out in total_sum_cols:
        proj.append(out)
    return joined.select(*proj)


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """Exact SQL NTILE(k) from a global rank: the first ``n mod k`` buckets
    get ``n div k + 1`` rows, the rest ``n div k`` — the standard front-
    loaded rule both Spark and DuckDB implement, reproduced arithmetically
    so a distributed rank can replace the single-task window."""
    q = F.floor(n / k)
    m = n % k
    big = m * (q + 1)
    return F.when(
        rank <= big, F.ceil(rank / (q + 1))
    ).otherwise(m + F.ceil((rank - big) / q)).cast("int")


__all__ = ["attach_global_order", "ntile_from_rank"]
