"""As-of join unit tests (hand-checkable fixtures; the suite-level DuckDB
oracle covers the at-SF formulation)."""
from pyspark.sql import functions as F

from etl_for_all_studies_spark.operators.asof import asof_join


def test_asof_basic_carry_and_ties(spark):
    clicks = spark.createDataFrame(
        [
            (100, 1, 0),   # before any view → NULL
            (101, 1, 10),  # tie with view@10 → matches it
            (102, 1, 30),  # between views → carries view@10
            (103, 1, 60),  # after view@50 → carries view@50
            (104, 2, 99),  # other user, no views → NULL
        ],
        "event_id long, user_id long, ts long",
    )
    views = spark.createDataFrame(
        [(1, 10, 1.5), (1, 50, 2.5)], "user_id long, ts long, v double"
    )
    out = {
        r["event_id"]: r["v_asof"]
        for r in asof_join(
            clicks, views, key="user_id", left_ts="ts", right_ts="ts",
            value_cols=["v"],
        ).collect()
    }
    assert out == {100: None, 101: 1.5, 102: 1.5, 103: 2.5, 104: None}


def test_asof_multiple_value_cols_and_left_schema_preserved(spark):
    clicks = spark.createDataFrame(
        [(1, 1, 20, "x")], "event_id long, user_id long, ts long, tag string"
    )
    views = spark.createDataFrame(
        [(1, 10, 1.0, "a")], "user_id long, ts long, v double, label string"
    )
    out = asof_join(
        clicks, views, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["v", "label"],
    )
    assert set(out.columns) == {"event_id", "user_id", "ts", "tag",
                                "v_asof", "label_asof"}
    row = out.collect()[0]
    assert (row["tag"], row["v_asof"], row["label_asof"]) == ("x", 1.0, "a")


def test_asof_plan_is_single_window(spark):
    clicks = spark.createDataFrame([(1, 1, 20)], "event_id long, user_id long, ts long")
    views = spark.createDataFrame([(1, 10, 1.0)], "user_id long, ts long, v double")
    out = asof_join(
        clicks, views, key="user_id", left_ts="ts", right_ts="ts", value_cols=["v"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the scalable contract: one window over the union — never a range join
    # (no BroadcastNestedLoopJoin / CartesianProduct in the plan)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert plan.count("Window") == 1


# ---- bucketed interval (range) join --------------------------------------

def test_bucketed_interval_join_matches_naive(spark):
    """The bucketed plan must produce exactly the naive range-join's pairs,
    across bucket widths (narrower/wider than the intervals) and boundary
    timestamps (start inclusive, end exclusive, bucket-edge events)."""
    import datetime as dt

    from etl_for_all_studies_spark.operators.rangejoin import bucketed_interval_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    events = spark.createDataFrame(
        [
            (1, 1, ts(0)),      # == interval start: IN (half-open start)
            (2, 1, ts(599)),    # just inside
            (3, 1, ts(600)),    # == interval end: OUT (half-open end)
            (4, 1, ts(1200)),   # exact bucket boundary inside wide interval
            (5, 2, ts(100)),    # other user — key mismatch
            (6, 1, ts(3600)),   # no interval
        ],
        "event_id long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (10, 1, ts(0), ts(600)),
            (11, 1, ts(550), ts(1500)),   # overlapping interval, spans buckets
            (12, 2, ts(0), ts(50)),       # user 2, misses event 5
        ],
        "iv_id long, user_id long, start timestamp, end timestamp",
    )
    expected = {
        (1, 10), (2, 10),          # [0, 600)
        (2, 11), (3, 11), (4, 11),  # [550, 1500)
    }
    for width in (60, 600, 7 * 3600):
        got = {
            (r["event_id"], r["iv_id"])
            for r in bucketed_interval_join(
                events, intervals,
                ts_col="ts", start_col="start", end_col="end",
                on=["user_id"], bucket_width_seconds=width,
            ).collect()
        }
        assert got == expected, width


def test_bucketed_interval_join_left_keeps_unmatched(spark):
    import datetime as dt

    from etl_for_all_studies_spark.operators.rangejoin import bucketed_interval_join

    t0 = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(1, 1, t0), (2, 1, t0 + dt.timedelta(hours=5))],
        "event_id long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(10, 1, t0, t0 + dt.timedelta(seconds=60))],
        "iv_id long, user_id long, start timestamp, end timestamp",
    )
    rows = {
        r["event_id"]: r
        for r in bucketed_interval_join(
            events, intervals, ts_col="ts", start_col="start", end_col="end",
            on=["user_id"], how="left",
        ).collect()
    }
    assert rows[1]["iv_id"] == 10
    assert rows[2]["iv_id"] is None  # unmatched event kept, NULL interval


def test_bucketed_interval_join_plan_has_no_nested_loop(spark):
    """The whole point: the physical plan is an equi-join (sort-merge or
    hash) keyed on (user, bucket) — never BroadcastNestedLoopJoin or
    CartesianProduct, which is what a raw range predicate compiles to."""
    import datetime as dt

    from etl_for_all_studies_spark.operators.rangejoin import bucketed_interval_join

    t0 = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(1, 1, t0)], "event_id long, user_id long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(10, 1, t0, t0 + dt.timedelta(seconds=60))],
        "iv_id long, user_id long, start timestamp, end timestamp",
    )
    plan = bucketed_interval_join(
        events, intervals, ts_col="ts", start_col="start", end_col="end",
        on=["user_id"],
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
