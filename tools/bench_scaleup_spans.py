#!/usr/bin/env python
"""Scale-up probe for exact-substring duplicate spans: 1x vs Nx corpora.

Same cipher-replication methodology as ``bench_scaleup_editdist.py``: each
copy applies a bijective LETTER rotation, preserving every copy's INTERNAL
window-duplication structure. Digit/punctuation-heavy windows are untouched
by the cipher and DO still collide across copies, so the replicated corpus
carries MORE duplication than k-fold — the probe is an upper-bound
workload, and the wall-clock ratio still bounds n-scaling of the
window-hash aggregation (the operator's only corpus-wide shuffle) from
above. Near-linear growth is the pass criterion.

Usage: python tools/bench_scaleup_spans.py [multiplier]
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from pyspark.sql import functions as F

    from etl_for_all_studies_spark.operators.spans import duplicated_spans
    from etl_for_all_studies_spark.session import get_spark

    spark = get_spark(
        app_name="bench-scaleup-spans",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def replicate(k: int):
        if k == 1:
            return base
        copies = [
            base.select(
                (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
                F.translate(
                    F.col("text"), alpha, alpha[i:] + alpha[:i]
                ).alias("text"),
            )
            for i in range(k)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        return out.repartition(32).persist()

    results = {}
    spans = {}
    for k in (1, mult):
        docs = replicate(k)
        docs.count()
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            n = duplicated_spans(docs, w=8).count()
            el = time.monotonic() - t0
            best = el if best is None else min(best, el)
            spark.catalog.clearCache()
            if k != 1:
                docs.persist().count()  # keep the input warm across repeats
        results[k] = round(best, 2)
        spans[k] = n
    print(
        f"docs x1={results[1]}s ({spans[1]} spans) "
        f"x{mult}={results[mult]}s ({spans[mult]} spans) "
        f"wall ratio {results[mult]/results[1]:.1f}x for {mult}x data "
        f"(span ratio {spans[mult]/max(spans[1],1):.1f}x — cross-copy numeric-window collisions add load beyond {mult}x)"
    )


if __name__ == "__main__":
    main()
