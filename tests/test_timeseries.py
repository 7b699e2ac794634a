"""Resample + time-spine + LOCF gap fill: planted irregular series."""
from __future__ import annotations

from etl_for_all_studies_spark.operators.timeseries import (
    gap_fill_locf,
    resample_last,
    time_spine,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, value double"
    )


def test_gap_fill_locf_fills_and_marks(spark):
    # user 1: observations in buckets 0, 1, 4 (width 10) — 2 and 3 are gaps
    rows = [
        (1, 1, 5, 10.0),
        (2, 1, 12, 20.0),
        (3, 1, 15, 21.0),   # same bucket as event 2, later ts → wins
        (4, 1, 47, 40.0),
        (5, 2, 100, 7.0),   # single-bucket user → spine of one row
    ]
    out = {
        (r["key"], r["bucket"]): r.asDict()
        for r in gap_fill_locf(_df(spark, rows), bucket_width=10).collect()
    }
    assert set(out) == {(1, 0), (1, 1), (1, 2), (1, 3), (1, 4), (2, 10)}
    assert out[(1, 0)] == {"key": 1, "bucket": 0, "value": 10.0, "n_events": 1, "gap_filled": 0}
    assert out[(1, 1)]["value"] == 21.0 and out[(1, 1)]["n_events"] == 2
    for b in (2, 3):  # carried forward from bucket 1
        assert out[(1, b)] == {"key": 1, "bucket": b, "value": 21.0, "n_events": 0, "gap_filled": 1}
    assert out[(1, 4)]["value"] == 40.0 and out[(1, 4)]["gap_filled"] == 0
    assert out[(2, 10)] == {"key": 2, "bucket": 10, "value": 7.0, "n_events": 1, "gap_filled": 0}


def test_gap_fill_locf_null_valued_event_is_not_a_gap(spark):
    # a bucket whose latest event carries a NULL value is OBSERVED
    # (n_events > 0, gap_filled = 0); only true spine misses are flagged
    rows = [(1, 1, 5, 10.0), (2, 1, 25, None), (3, 1, 45, 40.0)]
    out = {
        r["bucket"]: r.asDict()
        for r in gap_fill_locf(_df(spark, rows), bucket_width=10).collect()
    }
    assert out[2] == {"key": 1, "bucket": 2, "value": 10.0, "n_events": 1, "gap_filled": 0}
    assert out[1] == {"key": 1, "bucket": 1, "value": 10.0, "n_events": 0, "gap_filled": 1}
    assert out[3]["gap_filled"] == 1 and out[4]["gap_filled"] == 0


def test_resample_last_tie_breaks_on_seq(spark):
    # identical timestamps in one bucket: higher event_id wins
    rows = [(1, 1, 50, 1.0), (2, 1, 50, 2.0), (3, 1, 50, 3.0)]
    got = resample_last(_df(spark, rows), bucket_width=100).collect()
    assert len(got) == 1
    assert got[0]["last_value"] == 3.0 and got[0]["n_events"] == 3


def test_time_spine_spans_min_to_max(spark):
    rows = [(1, 1, 0, 1.0), (2, 1, 95, 2.0)]
    agg = resample_last(_df(spark, rows), bucket_width=10)
    spine = sorted(r["bucket"] for r in time_spine(agg).collect())
    assert spine == list(range(0, 10))
