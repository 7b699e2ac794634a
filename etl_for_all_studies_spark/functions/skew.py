"""Skew mitigation utilities.

AQE's skew-join splitting handles most hot-key problems at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on by default in
``session.py``), but two shapes still benefit from explicit salting:

* **skewed aggregation** — one giant group (e.g. one study holding half the
  facts) serializes its reduce task. :func:`salted_aggregate` runs the
  classic two-phase plan: pre-aggregate on (key, salt), then merge the salt
  partials — both phases shuffle, but the first spreads the hot key over
  ``n_salts`` reducers and the second only sees ``n_salts`` rows per key.
* **skewed broadcast-probe replication** — for joins where one build-side
  key dominates, replicate the build row per salt (:func:`replicate_salts`)
  and salt the probe side randomly.

Works for any algebraic aggregate (sum/count/min/max); averages are
composed as sum/count by the caller.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over skewed group keys.

    ``aggs`` maps output column name → (merge_fn, partial_expression), where
    ``merge_fn`` ∈ {"sum", "min", "max"} recombines the per-salt partials.
    Example::

        salted_aggregate(facts, ["study_key"],
                         {"n": ("sum", F.count(F.lit(1))),
                          "total": ("sum", F.sum("expression_value"))})
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=0) * n_salts).cast("int")
    )
    partial = salted.groupBy(*group_cols, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (_, expr) in aggs.items()]
    )
    mergers = {"sum": F.sum, "min": F.min, "max": F.max}
    final = partial.groupBy(*group_cols).agg(
        *[
            mergers[merge](F.col(f"__p_{name}")).alias(name)
            for name, (merge, _) in aggs.items()
        ]
    )
    return final


def replicate_salts(small: DataFrame, n_salts: int = 16) -> DataFrame:
    """Explode a (broadcastable) build side once per salt value so a salted
    probe side can equi-join on (key, __salt)."""
    return small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def with_probe_salt(big: DataFrame, n_salts: int = 16) -> Column | DataFrame:
    """Attach a uniform random salt to the probe side."""
    return big.withColumn("__salt", (F.rand(seed=0) * n_salts).cast("int"))


__all__ = ["replicate_salts", "salted_aggregate", "with_probe_salt"]
