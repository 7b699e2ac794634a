#!/usr/bin/env python
"""Scale-up probe for the PassJoin edit-distance join: 1x vs Nx corpora.

Same cipher-replication methodology as ``bench_scaleup.py`` (bijective
per-copy character rotation keeps every copy's INTERNAL edit-distance
structure identical to the original while making copies disjoint), so the
wall-clock ratio isolates n-scaling. PassJoin's cost model is linear scan
+ Σ segment-collision products; near-linear growth is the pass criterion —
superlinear would mean segment collisions are quadratically compounding.

Usage: python tools/bench_scaleup_editdist.py [multiplier]
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from pyspark.sql import functions as F

    from etl_for_all_studies_spark.operators.editdist import editdist_near_pairs
    from etl_for_all_studies_spark.session import get_spark

    spark = get_spark(
        app_name="bench-scaleup-editdist",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def replicate(k: int):
        if k == 1:
            return base
        alpha = "abcdefghijklmnopqrstuvwxyz"
        copies = [
            base.select(
                (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
                (
                    F.translate(F.col("text"), alpha, alpha[i:] + alpha[:i])
                    if i
                    else F.col("text")
                ).alias("text"),
            )
            for i in range(k)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.union(c)
        return out

    def run(docs):
        t0 = time.monotonic()
        n_pairs = editdist_near_pairs(docs, max_dist=4).count()
        el = time.monotonic() - t0
        spark.catalog.clearCache()
        return el, n_pairs

    run(base)  # JIT warm-up
    t1, p1 = run(base)
    big = replicate(mult).localCheckpoint()
    n_big = big.count()
    tn, pn = run(big)
    print(
        f"editdist 1x: {t1:.1f}s ({p1} pairs) | {mult}x ({n_big} docs): "
        f"{tn:.1f}s ({pn} pairs) | ratio {tn / t1:.2f} (linear = {mult})"
    )


if __name__ == "__main__":
    main()
