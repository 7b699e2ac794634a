#!/usr/bin/env python
"""Forced-distributed connected-components scale probe (1x vs Nx graph).

The round-2 record (SCALE.md) forced the pointer-jumping loop on the 1x
sf0.1 SimHash near-dup graph (283k edges, 5 rounds, ~15 s); this probe
re-runs the SAME forced path on the cipher-replicated Nx graph to verify
the two properties the 100 TB argument rests on:

* ROUND COUNT is O(log diameter), not O(n): the replicated corpus has the
  same per-copy component structure, so rounds must stay ~flat while the
  edge list grows ~Nx;
* per-round cost is |E|-linear (label join keyed by node, ~1M labels per
  partition), so wall grows ~linearly in the edge count.

Edges are the production composition (``dedup_clusters``'s input shape):
SimHash near-pairs UNION exact-dup star edges. The per-copy alphabet
rotation keeps each copy's internal near-dup structure identical to the
original corpus (same design as ``bench_scaleup.py``; N <= 26 before the
rotation wraps).

Usage: python tools/bench_cc_distributed.py [mult]
"""
from __future__ import annotations

import json
import logging
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

ALPHA = "abcdefghijklmnopqrstuvwxyz"


class _RoundCapture(logging.Handler):
    def __init__(self) -> None:
        super().__init__()
        self.rounds: int | None = None

    def emit(self, record: logging.LogRecord) -> None:
        if "converged after" in record.getMessage():
            self.rounds = record.args[0]


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from pyspark.sql import functions as F

    from etl_for_all_studies_spark.operators.dedup import (
        simhash,
        simhash_near_pairs,
    )
    from etl_for_all_studies_spark.operators.dedup_graph import (
        connected_components,
        exact_dup_star_edges,
    )
    from etl_for_all_studies_spark.session import get_spark

    cap = _RoundCapture()
    graph_logger = logging.getLogger(
        "etl_for_all_studies_spark.operators.dedup_graph"
    )
    graph_logger.addHandler(cap)
    graph_logger.setLevel(logging.INFO)  # the root gate would filter INFO

    spark = get_spark(
        app_name="bench-cc-distributed",
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
        copies = [
            base.select(
                (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
                (
                    F.translate(F.col("text"), ALPHA, ALPHA[i:] + ALPHA[:i])
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

    for k in sorted({1, mult}):
        docs = replicate(k).persist()
        docs.count()
        # the dedup_clusters edge composition: near-pairs + exact-dup stars
        near = simhash_near_pairs(
            simhash(docs, bits=32), bits=32, max_hamming=1, bands=2
        ).select(
            F.col("doc_a").cast("long").alias("u"),
            F.col("doc_b").cast("long").alias("v"),
        )
        edges = exact_dup_star_edges(docs).union(near).persist()
        n_edges = edges.count()  # detector materialized OUTSIDE the timing
        cap.rounds = None
        t0 = time.monotonic()
        cc = connected_components(
            edges,
            nodes=docs.select(F.col("doc_id").alias("node")),
            local_edge_threshold=0,
        )
        n_clusters = cc.select("cluster_id").distinct().count()
        wall = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "mult": k,
                    "n_docs": docs.count(),
                    "n_edges": n_edges,
                    "n_clusters": n_clusters,
                    "rounds": cap.rounds,
                    "cc_wall_s": round(wall, 1),
                }
            ),
            flush=True,
        )
        edges.unpersist()
        docs.unpersist()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
