#!/usr/bin/env python
"""Wide-gene correlation probe: dense vs block pair enumeration (SURVEY
§7.4.7, SCALE.md round-3).

Builds a synthetic dense study with ``n_genes`` far beyond the reference's
~hundreds envelope and times the SAME correlation through ``mode="dense"``
(the (study, sample)-keyed join: every sample's full n² pair fan-out is one
reducer) and ``mode="block"`` (the bucketed join: B(B+1)/2 reducers per
sample). Also reports the per-task output bound that is the actual 100 TB
argument — wall-clock on a 32-thread local box underestimates the win on a
cluster where one 10⁸-row task would also blow executor memory, not just
time.

Usage: python tools/bench_block_pairs.py [n_genes] [n_samples] [n_blocks]
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    n_genes = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from etl_for_all_studies_spark.plans.correlation import (
        compute_gene_pair_correlations,
    )
    from etl_for_all_studies_spark.session import get_spark

    spark = get_spark(
        app_name="bench-block-pairs",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )
    spark.range(1).count()

    e = (
        spark.range(n_genes)
        .select(F.col("id").alias("gene_key"))
        .crossJoin(
            spark.range(n_samples).select(
                F.concat(F.lit("S"), F.col("id")).alias("gsm_accession")
            )
        )
        .select(
            F.lit(1).cast("long").alias("study_key"),
            "gene_key",
            "gsm_accession",
            (
                F.pmod(F.col("gene_key") * 37 + F.length("gsm_accession") * 11, F.lit(97))
                .cast("double")
            ).alias("expression_value"),
        )
        .repartition(32)
        .persist()
    )
    e.count()

    results = {}
    for mode in ("dense", "block"):
        t0 = time.monotonic()
        corr = compute_gene_pair_correlations(
            e, min_samples=2, mode=mode, n_blocks=n_blocks, computed_at="fixed"
        )
        corr.write.format("noop").mode("overwrite").save()
        results[mode] = round(time.monotonic() - t0, 1)

    pairs = n_genes * (n_genes - 1) // 2
    per_task_dense = pairs  # one (study, sample) reducer emits all pairs
    per_task_block = (n_genes // n_blocks) ** 2
    print(
        f"n_genes={n_genes} n_samples={n_samples} n_blocks={n_blocks} "
        f"pairs={pairs} dense={results['dense']}s block={results['block']}s "
        f"per_reducer_pairs dense={per_task_dense} block<={per_task_block} "
        f"({per_task_dense / per_task_block:.0f}x smaller)"
    )


if __name__ == "__main__":
    main()
