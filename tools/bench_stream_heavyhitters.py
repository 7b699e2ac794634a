#!/usr/bin/env python
"""Streaming heavy-hitters steady-state probe: per-fold cost and state size
as history accrues across K Misra–Gries folds.

Pass criterion: per-fold wall is governed by the BATCH (flat across fold
index) and the live state stays ≤ m rows / one partition read per fold —
the mergeable-summary contract. A growing per-fold trend would mean the
fold re-reads history; a growing state would mean the shrink is broken.

Each fold is 200k Zipf-drawn tokens (vocab ~30k via the u^3.5 rank draw,
per-fold seed) plus a persistent heavy set ("hh0..hh9", 2k occurrences
each per fold) — the heavy set must hold the top ranks at every
checkpoint while the tail churns.

Round 10 extends the probe to the 500-1000 fold horizon (VERDICT r9
next #5) with a ``prune_every`` cadence exercising ``prune_state`` as the
maintenance story, and counts Spark JOBS per fold via the status tracker —
the r10 fold rework (persisted batch, prior-n riding the merge as a
broadcast aggregate) must show one fewer job per fold than the r9 shape.

Usage: python tools/bench_stream_heavyhitters.py [n_folds] [m] [prune_every]
"""
from __future__ import annotations

import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    n_folds = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    prune_every = int(sys.argv[3]) if len(sys.argv) > 3 else 0  # 0 = never

    from pyspark.sql import functions as F

    from etl_for_all_studies_spark.session import get_spark
    from etl_for_all_studies_spark.streaming.heavyhitters import (
        fold_batch,
        prune_state,
        read_state,
        top_k_from_state,
    )

    spark = get_spark(
        app_name="bench-stream-hh",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )
    state = tempfile.mkdtemp(prefix="hh_probe_") + "/state"
    try:
        walls, jobs_per_fold = [], []
        for i in range(n_folds):
            tail = spark.range(200_000).select(
                F.concat(
                    F.lit("w"),
                    F.floor(
                        F.pow(
                            F.abs(F.hash(F.col("id") + i * 1_000_003))
                            .cast("double")
                            / 2147483647.0,
                            F.lit(3.5),
                        )
                        * 30000
                    ).cast("string"),
                ).alias("item")
            )
            heavy = spark.range(20_000).select(
                F.concat(F.lit("hh"), (F.col("id") % 10).cast("string")).alias(
                    "item"
                )
            )
            batch = tail.unionByName(heavy)
            jobs0 = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))
            t0 = time.time()
            fold_batch(batch, i, state, m=m)
            walls.append(time.time() - t0)
            jobs_per_fold.append(
                len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))
                - jobs0
            )
            if prune_every and (i + 1) % prune_every == 0:
                prune_state(state, keep_last=8)
        st = read_state(spark, state)
        n_rows = st.count()
        files = sum(1 for _ in pathlib.Path(state).rglob("*.parquet"))
        top = top_k_from_state(spark, state, k=10).collect()
        q = max(1, n_folds // 4)
        print(
            f"folds={n_folds} m={m} prune_every={prune_every} "
            f"jobs_per_fold_q1={sum(jobs_per_fold[:q])/q:.1f} "
            f"jobs_per_fold_q4={sum(jobs_per_fold[-q:])/q:.1f} "
            f"q1_mean={sum(walls[:q])/q:.2f}s q4_mean={sum(walls[-q:])/q:.2f}s "
            f"trend={sum(walls[-q:])/max(sum(walls[:q]), 1e-9):.2f} "
            f"state_rows={n_rows} state_files_total={files} "
            f"top3={[(r.item, r.weight) for r in top[:3]]} "
            f"heavy_in_top10={sum(1 for r in top if r.item.startswith('hh'))}"
        )
    finally:
        shutil.rmtree(pathlib.Path(state).parent, ignore_errors=True)


if __name__ == "__main__":
    main()
