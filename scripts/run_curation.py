#!/usr/bin/env python
"""CLI entry point #3: LLM-corpus curation (beyond-reference capability).

Runs ``plans/curation.py::curate_corpus`` over a parquet corpus of
(doc_id, text, ...) rows: quality-rule filter → optional eval-set
decontamination → MinHash near-dup clustering with longest-member keeper
election → deterministic training shards. Prints one summary line; audit
counts come from the returned DataFrames.
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Curate a document corpus (Spark)")
    parser.add_argument("--input", required=True, help="Parquet corpus (doc_id, text)")
    parser.add_argument("--out", required=True, help="Output directory for shards")
    parser.add_argument("--eval", help="Optional parquet eval set to decontaminate against")
    parser.add_argument("--shards", type=int, default=16, help="Number of output shards")
    parser.add_argument(
        "--trim-spans-w", type=int, default=None, metavar="W",
        help="Also cut repeated W-token passages from kept docs before "
        "sharding (exact-substring span dedup, keep-first semantics)",
    )
    parser.add_argument(
        "--minhash-max-bucket", type=int, default=None, metavar="M",
        help="LSH hot-bucket valve: drop near-dup band buckets larger than "
        "M before the candidate self-join (a bucket of m docs is m(m-1)/2 "
        "pairs; boilerplate cohorts grow quadratically without a cap). "
        "Default: no cap (exact banding)",
    )
    parser.add_argument(
        "--verify-threshold", type=float, default=0.5, metavar="T",
        help="Near-dup Jaccard threshold. The dedup stage is routed by "
        "the corpus's shingle-df profile (operators/simjoin.py): EXACT "
        "prefix join where its candidate volume undercuts LSH's hashing "
        "term, MinHash-LSH otherwise",
    )
    parser.add_argument(
        "--dedup-mode", choices=("auto", "prefix", "lsh"), default="auto",
        help="Force a similarity-join leg instead of the df-profile "
        "router (auto)",
    )
    parser.add_argument("--master", default="local[*]")
    args = parser.parse_args(argv)

    from etl_for_all_studies_spark.caching import CacheScope
    from etl_for_all_studies_spark.plans.curation import curate_corpus
    from etl_for_all_studies_spark.session import get_spark

    spark = get_spark(app_name="curation", master=args.master)
    t0 = time.monotonic()
    # one CacheScope around the whole run: the corpus scan, the kept set, and
    # every dedup sketch barrier inside curate_corpus are computed ONCE,
    # shared by the shard write and all audit counts, then released together
    # (without the barriers each count would re-run the MinHash/clustering DAG)
    with CacheScope() as scope:
        docs = scope.persist(spark.read.parquet(args.input))
        eval_docs = spark.read.parquet(args.eval) if args.eval else None
        res = curate_corpus(
            docs, eval_docs=eval_docs, out_dir=args.out, n_shards=args.shards,
            minhash_max_bucket=args.minhash_max_bucket,
            verify_threshold=args.verify_threshold,
            trim_spans_w=args.trim_spans_w, dedup_mode=args.dedup_mode,
            scope=scope,
        )
        n_in = docs.count()
        n_kept = res.kept.count()
        n_contam = res.contaminated.count() if res.contaminated is not None else 0
        n_shards = res.shard_manifest.count() if res.shard_manifest is not None else 0
        n_trimmed = (
            res.trimmed_spans.count() if res.trimmed_spans is not None else 0
        )
    print(
        f"docs={n_in} kept={n_kept} dropped={n_in - n_kept} "
        f"contaminated={n_contam} trimmed_spans={n_trimmed} shards={n_shards} "
        f"elapsed={time.monotonic() - t0:.1f}s"
    )
    return 0 if n_kept > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
