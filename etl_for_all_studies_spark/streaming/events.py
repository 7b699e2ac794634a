"""Structured Streaming over the events stream (beyond-reference capability).

The reference explicitly scopes streaming out (REQ-014,
``docs/genomic-etl-requirements.md:220-223``); a 100 TB training-data
pipeline needs it, so the engine ships the two canonical stateful shapes:

* **windowed aggregation with watermarking** — tumbling event-time windows
  with late-data tolerance (``withWatermark`` + ``window()``);
* **custom stateful sessionization** — gap-based sessions via
  ``applyInPandasWithState`` (arbitrary per-key state: open sessions carry
  across micro-batches; closed sessions are emitted as they are finalized).

Batch equivalents of both live in the oracle-checked suite
(``events_hourly``, ``events_sessionize``); tests assert stream/batch
agreement, which is the streaming correctness contract.
"""
from __future__ import annotations

from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .util import await_drain

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("duration_us", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = "start_us long, last_us long, n long, total double"

SESSION_GAP_US = 30 * 60 * 1_000_000


def read_events_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source event stream: one micro-batch per arriving parquet file
    (``maxFilesPerTrigger=1`` keeps replay deterministic in tests)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
    )


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event-time windows with a late-data watermark.

    Output matches the batch ``events_hourly`` suite query keyed by
    (hour_us, event_type) once all data has arrived.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("hour_us"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Per-user session folding. State = the open session (start, last, n,
    total); closed sessions are emitted, the final open one stays in state
    (emitted by the caller draining state at end-of-stream if desired).

    ``applyInPandasWithState`` may deliver one group's micro-batch as
    *multiple* pandas chunks, so all chunks are concatenated and sorted once
    — sorting each chunk independently would interleave out-of-order events
    and corrupt session boundaries. Cross-micro-batch ordering is a hard
    precondition (documented on :func:`sessionize`): an event older than the
    open session's ``last_us`` is treated as in-session (it can never close
    one — the gap test is strictly forward in event time).
    """
    (user_id,) = key
    if state.exists:
        start_us, last_us, n, total = state.get
    else:
        start_us = last_us = None
        n, total = 0, 0.0

    closed: list[tuple[int, int, int, int, float]] = []
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
        for ts, value in zip(pdf["ts"], pdf["value"]):
            ts_us = int(ts.value) // 1_000  # pandas ns → µs
            v = float(value) if value == value else 0.0
            if last_us is not None and ts_us - last_us > SESSION_GAP_US:
                closed.append((user_id, start_us, n, last_us - start_us, total))
                start_us, n, total = ts_us, 0, 0.0
            if start_us is None:
                start_us = ts_us
            last_us = ts_us
            n += 1
            total += v

    if start_us is not None:
        state.update((start_us, last_us, n, total))
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_us", "n_events", "duration_us", "sum_value"],
        )


def sessionize(events: DataFrame) -> DataFrame:
    """Gap-based sessionization with arbitrary per-key state
    (``applyInPandasWithState``): sessions spanning micro-batches are
    stitched through state; a session is emitted once a later event proves
    the gap. The open tail session per user remains in state by design
    (streams don't end), so outputs cover *closed* sessions only.

    Precondition: event time must be non-decreasing **across micro-batches**
    per user (within a micro-batch, events are gathered and sorted). An event
    arriving in a later micro-batch with a timestamp before the open
    session's last event is folded into that session rather than reopening a
    closed one — closed sessions are final (append output mode). Feed the
    source through a watermark-bounded ingestion if late cross-batch data is
    possible."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


ANOMALY_SCHEMA = (
    "user_id long, event_id long, ts_us long, value double, z double"
)
_ANOM_STATE_SCHEMA = "n long, mean double, m2 double"


def _anomaly_group(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Per-user expanding-window anomaly scoring with Welford state.

    State = (n, mean, M2) of ALL past values — three numbers regardless of
    history length, the textbook single-pass variance recurrence. Each new
    event is scored against the state BEFORE it updates it (an outlier must
    not vaccinate itself by inflating the variance it is judged by), then
    folded in. Same chunk-concat-and-sort discipline as
    :func:`_sessionize_group`.
    """
    (user_id,) = key
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    flagged: list[tuple[int, int, int, float, float]] = []
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        for eid, ts, value in zip(pdf["event_id"], pdf["ts"], pdf["value"]):
            ts_us = int(ts.value) // 1_000
            v = float(value) if value == value else 0.0
            if n >= 5:
                var = m2 / (n - 1)
                if var > 0:
                    z = (v - mean) / var ** 0.5
                    if abs(z) >= 3.0:
                        flagged.append((user_id, int(eid), ts_us, v, z))
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
    state.update((n, mean, m2))
    if flagged:
        yield pd.DataFrame(
            flagged, columns=["user_id", "event_id", "ts_us", "value", "z"]
        )


def stream_anomaly_flags(events: DataFrame) -> DataFrame:
    """Streaming expanding-window anomaly detector: flag events ≥ 3σ from
    their user's running distribution (``applyInPandasWithState`` with the
    O(1) Welford state — the fourth canonical stateful shape here, after
    windowed agg, sessionization, and dedup). The batch twin is an
    expanding ``rowsBetween(unboundedPreceding, -1)`` window — parity
    pinned in ``test_streaming.py`` including state carried across
    micro-batches. Warm-up (< 5 priors) and zero-variance histories are
    unflaggable by construction.
    """
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _anomaly_group,
            outputStructType=ANOMALY_SCHEMA,
            stateStructType=_ANOM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once ingestion dedup: drop re-delivered ``event_id``s.

    The third canonical stateful-streaming shape (after windowed agg and
    sessionization): at-least-once upstreams (Kafka redeliveries, replayed
    files) are collapsed to exactly-once downstream. State is one key per
    event_id, *bounded by the watermark* —
    ``dropDuplicatesWithinWatermark`` evicts ids older than the horizon, so
    state never grows with the full history (the unbounded-state failure mode
    of plain ``dropDuplicates`` at 100 TB/day event volume).

    Batch twin: ``dropDuplicates`` on event_id (exact, unbounded) — agreement
    is asserted in ``test_streaming.py`` for in-horizon redeliveries.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def session_aggregates(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native ``session_window`` sessionization (the declarative counterpart
    of :func:`sessionize`'s arbitrary-state formulation): event-time windows
    ``[t, t+gap)`` merged on overlap, watermark-bounded state. Matches the
    batch ``events_sessions_native`` suite query once all data has arrived
    (same ≥-gap boundary semantics)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


def run_to_memory_sink(
    stream_df: DataFrame,
    query_name: str,
    *,
    output_mode: str = "append",
    await_seconds: float = 120.0,
) -> None:
    """Drain an availableNow stream into an in-memory table ``query_name``."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, await_seconds)


def attribute_clicks(
    views: DataFrame,
    clicks: DataFrame,
    *,
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each click joined to every view by the
    same user within the preceding ``attribution_window``.

    Both sides carry event-time watermarks and the join condition bounds the
    time skew, so Spark can size the join state to
    ``watermark + attribution_window`` per side and evict older rows —
    bounded state on unbounded streams, the scale contract for stream-stream
    joins. An unbounded-condition join would grow state forever and is
    rejected by Spark in append mode.

    Output: (click_event_id, user_id, click_ts_us, view_ts_us, view_value).
    The batch twin is the identical inner join on the same condition —
    parity pinned in ``test_streaming.py``.
    """
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("value").alias("view_value"),
        )
    )
    c = clicks.withWatermark("ts", watermark).select(
        "event_id", "user_id", F.col("ts").alias("c_ts")
    )
    joined = c.join(
        v,
        F.expr(
            f"user_id = v_user AND v_ts <= c_ts "
            f"AND v_ts >= c_ts - INTERVAL {attribution_window}"
        ),
    )
    return joined.select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.unix_micros("c_ts").alias("click_ts_us"),
        F.unix_micros("v_ts").alias("view_ts_us"),
        "view_value",
    )


def attribute_clicks_with_orphans(
    views: DataFrame,
    clicks: DataFrame,
    *,
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Left-outer stream-stream join: every click is attributed to its
    preceding views like :func:`attribute_clicks`, AND clicks with NO
    qualifying view are still emitted (NULL view columns) — the "orphan
    conversions" a funnel audit needs.

    The outer semantics are what makes the watermark *required*, not just a
    state bound: an unmatched click can only be declared unmatched once the
    watermark guarantees no qualifying view can still arrive, so orphan rows
    are emitted with watermark latency (not immediately), matched rows as
    soon as both sides meet. State stays bounded exactly as in the inner
    form; correctness-vs-latency is the documented streaming trade.

    Output schema matches :func:`attribute_clicks` with ``view_ts_us`` /
    ``view_value`` nullable; ``matched`` flags the orphans.
    """
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("value").alias("view_value"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        "event_id", "user_id", F.col("ts").alias("c_ts")
    )
    joined = c.join(
        v,
        F.expr(
            f"user_id = v_user AND v_ts <= c_ts "
            f"AND v_ts >= c_ts - INTERVAL {attribution_window}"
        ),
        "left_outer",
    )
    return joined.select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.unix_micros("c_ts").alias("click_ts_us"),
        F.unix_micros("v_ts").alias("view_ts_us"),
        "view_value",
        F.col("v_ts").isNotNull().cast("long").alias("matched"),
    )


__all__ = [
    "EVENT_SCHEMA",
    "SESSION_GAP_US",
    "SESSION_SCHEMA",
    "attribute_clicks",
    "dedup_events",
    "hourly_counts",
    "read_events_stream",
    "run_to_memory_sink",
    "session_aggregates",
    "sessionize",
    "stream_anomaly_flags",
]
