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
