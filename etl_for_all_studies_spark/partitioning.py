"""Physical-parallelism hygiene for compute-dense narrow stages.

A narrow projection inherits the scan's partitioning, and Spark splits
files by BYTES (``spark.sql.files.maxPartitionBytes``, default 128 MB) —
the right sizing for IO-bound scans, and exactly wrong for stages whose
cost per byte is enormous: a 4 MB documents table arrives as ONE
partition, so a per-token polynomial hash pass or a per-position shingle
fold over it runs on one core of a 32-core session (measured: the w=8
span fold at 13.5M windows takes 23.6 s on one task, 6–8 s on 32 — and
AQE cannot help, it only re-plans EXCHANGES, and a narrow chain from a
scan has none).

:func:`compute_spread` is the guarded fix: round-robin-repartition UP to
the session's shuffle parallelism when the plan's static partitioning is
below it, identity otherwise. At 100 TB the guard is what matters — real
scans arrive as thousands of splits, the condition is false, and no
shuffle is added; the spread only pays (one small exchange of the
pre-compute rows) where compute would otherwise serialize onto a handful
of tasks. Deliberately NOT bytes-aware: the callers are the operators
whose per-row cost dwarfs row width (token hashing, shingle folds,
signature sketches), where task-count is the only variable that matters.
"""
from __future__ import annotations

from pyspark.sql import DataFrame


def compute_spread(df: DataFrame) -> DataFrame:
    """Repartition ``df`` up to ``spark.sql.shuffle.partitions`` iff its
    static plan partitioning is lower; identity otherwise (or when the
    plan's partitioning cannot be inspected, e.g. streaming frames)."""
    try:
        target = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n >= target:
        return df
    return df.repartition(target)
