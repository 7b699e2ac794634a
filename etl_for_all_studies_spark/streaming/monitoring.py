"""Streaming drift monitoring: per-micro-batch PSI against a frozen
reference distribution.

The deployment loop for ``functions/drift.py``: a reference sample is
frozen at calibration time; every arriving micro-batch of events is scored
against it and one (batch_id, group, n_cmp, psi) row lands in an
append-only parquet audit table. Alerting is then a filter on the audit
table (PSI > 0.25 ⇒ page someone) — the monitor itself stays a pure
pipeline stage.

``foreachBatch`` is the right bridge (same pattern as ``streaming/cdc.py``):
PSI needs the batch's full value distribution against the reference —
a batch-relative statistic, not a row-wise or watermark-windowed one, so
it cannot be a streaming aggregation; per-batch batch-mode evaluation is
exactly what foreachBatch provides. The reference is reused across batches
(persist it in the caller's scope); per-batch cost is one union + the PSI
aggregation over batch ∪ reference.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.drift import psi
from .util import await_drain


def stream_monitor_drift(
    events_stream: DataFrame,
    reference: DataFrame,
    audit_dir: str,
    checkpoint_dir: str,
    *,
    group_cols: list[str],
    value_col: str,
    n_buckets: int = 10,
    await_seconds: float = 300.0,
) -> None:
    """Drain the available stream, scoring each micro-batch's ``value_col``
    distribution per group against ``reference`` (same columns), appending
    (batch_id, group..., n_ref, n_cmp, psi) rows to ``audit_dir``."""
    os.makedirs(audit_dir, exist_ok=True)
    cols = [*group_cols, value_col]
    ref = reference.select(*cols).withColumn("__period", F.lit("ref"))

    def _score(batch_df: DataFrame, batch_id: int) -> None:
        cmp_df = batch_df.select(*cols).withColumn("__period", F.lit("cmp"))
        scored = psi(
            ref.unionByName(cmp_df),
            group_cols=group_cols,
            period_col="__period",
            value_col=value_col,
            ref_period="ref",
            cmp_period="cmp",
            n_buckets=n_buckets,
        ).withColumn("batch_id", F.lit(batch_id))
        scored.write.mode("append").parquet(audit_dir)

    q = (
        events_stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, await_seconds)


__all__ = ["stream_monitor_drift"]
