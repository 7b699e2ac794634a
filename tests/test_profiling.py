"""Column profiler: typed stats, null handling, exact-vs-approx planning."""
from __future__ import annotations

import pytest

from etl_for_all_studies_spark.operators.profiling import profile_columns


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, [1]),
            (2, "b", None, [2]),
            (3, None, 30.0, None),
            (3, "a", 20.0, [3]),
        ],
        "k long, s string, v double, arr array<int>",
    )


def test_profile_typed_stats(spark):
    got = {r["column"]: r.asDict() for r in profile_columns(_df(spark)).collect()}
    assert set(got) == {"k", "s", "v", "arr"}
    k = got["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 0, 3)
    assert (k["min_num"], k["max_num"], k["mean"]) == (1.0, 3.0, 2.25)
    assert k["min_str"] is None and k["max_str"] is None
    s = got["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    assert s["min_num"] is None and s["mean"] is None
    v = got["v"]
    assert (v["n_nulls"], v["n_distinct"], v["null_frac"]) == (1, 3, 0.25)
    assert v["mean"] == 20.0  # NULLs excluded from the mean
    arr = got["arr"]  # non-scalar type: counts only, typed stats NULL
    assert (arr["n_nulls"], arr["n_distinct"]) == (1, 3)
    assert arr["min_num"] is None and arr["min_str"] is None


def test_profile_column_subset_and_empty_selection(spark):
    got = profile_columns(_df(spark), columns=["k"]).collect()
    assert [r["column"] for r in got] == ["k"]
    with pytest.raises(ValueError):
        profile_columns(_df(spark), columns=["nope"])


def test_profile_approx_avoids_expand(spark):
    """Exact distinct counts require an Expand (the documented cost);
    the approx production path must plan WITHOUT one."""
    df = _df(spark)
    exact_plan = profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    approx_plan = (
        profile_columns(df, approx=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan

    # approx estimates on tiny inputs are exact in practice — sanity only
    got = {r["column"]: r for r in profile_columns(df, approx=True).collect()}
    assert got["k"]["n_distinct"] == 3
