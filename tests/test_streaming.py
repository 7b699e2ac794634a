"""Structured Streaming: stream results must agree with the oracle-checked
batch formulations (the streaming correctness contract)."""
import datetime as dt

import pytest

from etl_for_all_studies_spark.streaming.events import (
    EVENT_SCHEMA,
    hourly_counts,
    read_events_stream,
    run_to_memory_sink,
    sessionize,
)


def _write_events(path, rows, start_id=0):
    """Write one FLAT parquet file (the file-stream source does not recurse
    into Spark's per-write output directories)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    data = [
        (start_id + i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, t, v, "{}")
        for i, (s, u, t, v) in enumerate(rows)
    ]
    table = pa.table(
        {
            "event_id": pa.array([d[0] for d in data], pa.int64()),
            "ts": pa.array([d[1] for d in data], pa.timestamp("us")),
            "user_id": pa.array([d[2] for d in data], pa.int64()),
            "event_type": pa.array([d[3] for d in data], pa.string()),
            "value": pa.array([d[4] for d in data], pa.float64()),
            "props": pa.array([d[5] for d in data], pa.string()),
        }
    )
    pq.write_table(table, str(path))


@pytest.fixture()
def event_files(spark, tmp_path):
    """Two parquet files → two micro-batches; user 1 has a session spanning
    both files (stitched via state), then a >30min gap closing it."""
    d = tmp_path / "stream_in"
    d.mkdir()
    _write_events(
        d / "f1.parquet",
        [
            (0, 1, "click", 1.0),
            (60, 1, "click", 2.0),
            (120, 2, "view", 5.0),
        ],
    )
    _write_events(
        d / "f2.parquet",
        [
            (180, 1, "click", 3.0),  # continues user 1's open session
            (180 + 45 * 60, 1, "click", 4.0),  # >30min gap → closes it
            (200, 2, "view", 1.0),
        ],
        start_id=3,
    )
    return d


def test_windowed_counts_match_batch(spark, event_files):
    stream = read_events_stream(spark, str(event_files))
    assert stream.isStreaming
    run_to_memory_sink(
        hourly_counts(stream), "hourly_test", output_mode="complete"
    )
    got = {
        (r["hour_us"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM hourly_test").collect()
    }
    batch = spark.read.schema(EVENT_SCHEMA).parquet(str(event_files))
    from pyspark.sql import functions as F

    expected = {
        (r["hour_us"], r["event_type"]): r["n"]
        for r in batch.groupBy(
            F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_us"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected
    assert sum(got.values()) == 6


def test_stateful_sessionize_stitches_across_batches(spark, event_files):
    stream = read_events_stream(spark, str(event_files))
    run_to_memory_sink(sessionize(stream), "sessions_test", output_mode="append")
    rows = spark.sql("SELECT * FROM sessions_test").collect()
    # only user 1's first session is CLOSED (by the 45-min gap); it must span
    # both micro-batches: events at 0s, 60s (batch 1) and 180s (batch 2)
    assert len(rows) == 1
    s = rows[0].asDict()
    assert s["user_id"] == 1
    assert s["n_events"] == 3  # stitched across the file boundary
    assert s["duration_us"] == 180 * 1_000_000
    assert s["sum_value"] == pytest.approx(6.0)
