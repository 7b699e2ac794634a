"""Time-series resampling: fixed-width bucket downsample, dense time-spine
generation, and gap filling with last-observation-carried-forward (LOCF).

Feature pipelines and monitoring queries need *regular* series — one row per
(key, bucket) even when nothing happened in a bucket — while event logs are
irregular. Three composable steps, all shuffle-minimal:

1. ``resample_last``: per (key, bucket) keep the latest observation —
   ONE ``max_by`` aggregation keyed by (key, bucket) with a total
   ``(ts, seq)`` order, so map-side partial aggregation applies and ties are
   engine-independent. No window sort over raw events.
2. ``time_spine``: the dense bucket range per key, from ``sequence`` +
   ``explode`` over each key's [min, max] bucket — generated *after* the
   aggregation, so the explode fans out one row per key, not per event.
   Spine size is (time span / bucket width) per key: bounded by calendar
   time, independent of event volume — the dense range a 100 TB log
   collapses into is the small side of this plan.
3. ``gap_fill_locf``: left-join observations onto the spine and carry the
   last non-null value forward with ``last(col, ignorenulls=True)`` over a
   per-key bucket-ordered window. One shuffle on key; the frame is
   cumulative (``rowsBetween(unboundedPreceding, current)``), which Spark
   evaluates in a single pass without re-scanning the frame per row.

The spine spans each key's [first, last] *observed* bucket, so LOCF always
has a value to carry; ``gap_filled`` marks carried rows for auditability.

The reference has no time-series surface at all (its fact table is
unordered expression data — SURVEY §2.8); this extends the events family
(`events_hourly`, `events_rolling`, `events_asof`) with the resample/LOCF
shape those queries presuppose.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample_last(
    events: DataFrame,
    *,
    bucket_width: int,
    ts_col: str = "ts_us",
    key_col: str = "user_id",
    value_col: str = "value",
    seq_col: str = "event_id",
) -> DataFrame:
    """(key, bucket, last_value, n_events): latest observation per fixed
    bucket of ``bucket_width`` ``ts_col`` ticks. ``seq_col`` breaks ties on
    equal timestamps so "latest" is a total order."""
    order = F.struct(F.col(ts_col).alias("t"), F.col(seq_col).alias("s"))
    return (
        events.select(
            F.col(key_col).alias("key"),
            F.floor(F.col(ts_col) / bucket_width).alias("bucket"),
            F.col(ts_col),
            F.col(seq_col),
            F.col(value_col).alias("v"),
        )
        .groupBy("key", "bucket")
        .agg(
            F.max_by(F.col("v"), order).alias("last_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def time_spine(resampled: DataFrame) -> DataFrame:
    """Dense (key, bucket) spine spanning each key's [min, max] bucket."""
    return (
        resampled.groupBy("key")
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .select(
            "key",
            F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("bucket"),
        )
    )


def gap_fill_locf(
    events: DataFrame,
    *,
    bucket_width: int,
    ts_col: str = "ts_us",
    key_col: str = "user_id",
    value_col: str = "value",
    seq_col: str = "event_id",
) -> DataFrame:
    """Regular per-key series with gaps filled by LOCF.

    Output: (key, bucket, value, n_events, gap_filled) — one row per key per
    bucket in the key's observed span; ``gap_filled`` = 1 on rows whose value
    was carried forward (empty bucket), 0 on observed rows. ``n_events`` is 0
    for filled buckets.
    """
    agg = resample_last(
        events,
        bucket_width=bucket_width,
        ts_col=ts_col,
        key_col=key_col,
        value_col=value_col,
        seq_col=seq_col,
    )
    spine = time_spine(agg)
    joined = spine.join(agg, ["key", "bucket"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "key",
        "bucket",
        F.last("last_value", ignorenulls=True).over(w).alias("value"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        # gap_filled marks SPINE MISSES (no events in the bucket), detected
        # from n_events being NULL before the coalesce — NOT from
        # last_value nullability, which would mislabel an observed bucket
        # whose latest event carries a NULL value.
        F.when(F.col("n_events").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("gap_filled"),
    )


__all__ = ["gap_fill_locf", "resample_last", "time_spine"]
