#!/usr/bin/env python
"""CLI entry point #4: embedding-corpus curation (beyond-reference).

Runs ``plans/embedding_curation.py::curate_embeddings`` over a parquet
embedding table of (vec_id, embedding, ...) rows: IVF-bucketed semantic
near-dup detection → connected-components clustering → keeper election →
SQ8 quantization of the kept vectors, written as parquet. Centroids come
from a k-means fit over the corpus (deterministic, ``kmeans_fit``) unless a
centroid table is supplied.
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Curate an embedding corpus (Spark)")
    parser.add_argument("--input", required=True, help="Parquet table (vec_id, embedding)")
    parser.add_argument("--out", required=True, help="Output directory (kept SQ8 codes)")
    parser.add_argument("--centroids", help="Optional parquet centroid table (cell, embedding)")
    parser.add_argument("--n-centroids", type=int, default=32, help="k for the k-means codebook fit")
    parser.add_argument("--threshold", type=float, default=0.95, help="Cosine near-dup threshold")
    parser.add_argument("--n-probes", type=int, default=2, help="IVF probe cells per vector")
    parser.add_argument("--master", default="local[*]")
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from etl_for_all_studies_spark.caching import CacheScope
    from etl_for_all_studies_spark.operators.similarity import kmeans_fit
    from etl_for_all_studies_spark.plans.embedding_curation import curate_embeddings
    from etl_for_all_studies_spark.session import get_spark

    spark = get_spark(app_name="embedding-curation", master=args.master)
    t0 = time.monotonic()
    with CacheScope() as scope:
        vecs = scope.persist(spark.read.parquet(args.input))
        if args.centroids:
            centroids = spark.read.parquet(args.centroids)
        else:
            centroids = kmeans_fit(vecs, k=args.n_centroids).select(
                "cell", F.col("c").cast("array<float>").alias("embedding")
            )
        res = curate_embeddings(
            vecs, centroids,
            threshold=args.threshold, n_probes=args.n_probes, scope=scope,
        )
        kept = scope.persist(res.kept_codes)
        kept.write.mode("overwrite").parquet(args.out)
        n_in = vecs.count()
        n_kept = kept.count()
        n_pairs = res.pairs.count()
    print(
        f"vectors={n_in} kept={n_kept} dropped={n_in - n_kept} "
        f"near_dup_pairs={n_pairs} elapsed={time.monotonic() - t0:.1f}s"
    )
    return 0 if n_kept > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
