#!/usr/bin/env python
"""Scale-up probe: run the dedup stack on 1x and 10x corpora and report the
wall-clock ratio. The bucketed detectors (MinHash LSH, SimHash banding) and
the clustering must scale ~linearly in document count — a superlinear ratio
would mean a pairwise blowup is hiding somewhere.

The 10x corpus is the sf0.1 documents replicated with doc_id offsets and a
per-copy CHARACTER SUBSTITUTION CIPHER (alphabet rotated by the copy index):
a bijective per-character map rewrites every shingle, so copies are distinct
from their originals AND the pairwise-similarity structure *within* each
copy is exactly the original corpus's — duplicate-pair density per document
stays constant and the ratio isolates n-scaling. (Tried and rejected:
prefix-only perturbation makes all k copies of a doc mutual near-dups —
pair count x k² per group; an injected inter-word token makes every doc in
a cohort share half its shingles with every other — a 5000-doc mutual-
similarity clique. Both measure duplication density, not corpus size.)

Usage: python tools/bench_scaleup.py [multiplier]
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from pyspark.sql import functions as F

    from etl_for_all_studies_spark.operators.dedup import (
        minhash_dedup,
        simhash,
        simhash_near_pairs,
    )
    from etl_for_all_studies_spark.operators.dedup_graph import dedup_clusters
    from etl_for_all_studies_spark.session import get_spark

    spark = get_spark(
        app_name="bench-scaleup",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = base.count()

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
                "lang",
                "source",
                "n_chars",
            )
            for i in range(k)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.union(c)
        return out

    def run_stack(docs):
        t = {}
        t0 = time.monotonic()
        # suite parameters (2x8 banding — see q_dedup_minhash's rationale)
        minhash_dedup(docs, bands=2, verify_threshold=0.5).write.format(
            "noop"
        ).mode("overwrite").save()
        t["minhash"] = time.monotonic() - t0
        spark.catalog.clearCache()
        t0 = time.monotonic()
        near = simhash_near_pairs(simhash(docs, bits=32), bits=32, max_hamming=1, bands=2)
        dedup_clusters(docs, near).write.format("noop").mode("overwrite").save()
        t["clusters"] = time.monotonic() - t0
        spark.catalog.clearCache()
        return t

    def run_ann(emb):
        from etl_for_all_studies_spark.operators.similarity import ivf_topk

        # fixed query set + fixed centroid count: the corpus side scales, so
        # linear growth is the pass criterion (cells grow, probes don't)
        centroids = emb.where(F.col("vec_id") < 32).select(
            F.col("vec_id").alias("cell"), F.col("embedding")
        )
        queries = emb.where(F.col("vec_id") < 64)
        t0 = time.monotonic()
        ivf_topk(queries, emb, centroids, k=5, n_probes=2).write.format(
            "noop"
        ).mode("overwrite").save()
        el = time.monotonic() - t0
        spark.catalog.clearCache()
        return el

    # warm once at 1x so JIT/codegen doesn't pollute the ratio
    run_stack(base)
    one = run_stack(base)
    big = replicate(mult).localCheckpoint()  # pin the corpus; measure ops only
    n_big = big.count()
    ten = run_stack(big)

    for op in one:
        ratio = ten[op] / one[op]
        print(
            f"{op}: {n_base} docs {one[op]:.2f}s -> {n_big} docs "
            f"{ten[op]:.2f}s (x{ratio:.1f} time at x{mult} data)"
        )

    # ANN leg: replicate embeddings by vec_id offset (same vectors — IVF
    # cell sizes grow x mult, which is exactly the scan the probe bounds)
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n_emb = emb.count()
    run_ann(emb)
    e_one = run_ann(emb)
    emb_big = emb
    for i in range(1, mult):
        emb_big = emb_big.union(
            emb.select(
                (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
                "embedding",
                "label",
            )
        )
    emb_big = emb_big.localCheckpoint()
    e_ten = run_ann(emb_big)
    print(
        f"ivf_topk: {n_emb} vecs {e_one:.2f}s -> {emb_big.count()} vecs "
        f"{e_ten:.2f}s (x{e_ten / e_one:.1f} time at x{mult} data)"
    )

    # k-means leg: fixed k and iteration count, corpus side scales — per
    # round cost is one broadcast argmin + one n·dim mean aggregation, so
    # linear growth is the pass criterion here too
    def run_kmeans(vectors):
        from etl_for_all_studies_spark.operators.similarity import (
            kmeans_fit,
            kmeans_predict,
        )

        t0 = time.monotonic()
        cent = kmeans_fit(vectors, k=8, n_iter=2)
        kmeans_predict(vectors, cent).write.format("noop").mode(
            "overwrite"
        ).save()
        el = time.monotonic() - t0
        spark.catalog.clearCache()
        return el

    run_kmeans(emb)
    k_one = run_kmeans(emb)
    k_ten = run_kmeans(emb_big)
    print(
        f"kmeans: {n_emb} vecs {k_one:.2f}s -> {emb_big.count()} vecs "
        f"{k_ten:.2f}s (x{k_ten / k_one:.1f} time at x{mult} data)"
    )


if __name__ == "__main__":
    main()
