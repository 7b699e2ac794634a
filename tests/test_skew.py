"""Salted two-phase aggregation must equal the direct aggregation."""
from pyspark.sql import functions as F

from etl_for_all_studies_spark.functions.skew import (
    replicate_salts,
    salted_aggregate,
    with_probe_salt,
)


def test_salted_aggregate_matches_direct(spark):
    # one hot key (90% of rows) + a long tail
    df = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 != 0, F.lit(1)).otherwise(F.col("id") % 7 + 2).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    direct = {
        r["k"]: (r["n"], r["total"], r["vmax"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"), F.max("v").alias("vmax"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["total"], r["vmax"])
        for r in salted_aggregate(
            df,
            ["k"],
            {
                "n": ("sum", F.count(F.lit(1))),
                "total": ("sum", F.sum("v")),
                "vmax": ("max", F.max("v")),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == direct


def test_salted_join_matches_plain(spark):
    big = spark.range(0, 5000).select(
        F.when(F.col("id") % 5 != 0, F.lit(1)).otherwise(F.col("id") % 4).alias("k"),
        F.col("id").alias("rowid"),
    )
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, label string")
    plain = big.join(small, on="k").groupBy("label").count()
    salted = (
        with_probe_salt(big, 8)
        .join(F.broadcast(replicate_salts(small, 8)), on=["k", "__salt"])
        .groupBy("label")
        .count()
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}
