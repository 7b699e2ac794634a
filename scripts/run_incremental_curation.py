#!/usr/bin/env python
"""CLI entry point #6: fold a new crawl batch into a curated corpus.

Runs ``plans/incremental_curation.py::curate_batch``: quality-filter and
decontaminate the batch, drop docs near-duplicating the stored kept corpus
(stability-first — history never churns), elect keepers among the rest, and
append the admitted docs to the corpus directory as parquet.
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Incremental corpus curation (Spark)")
    parser.add_argument("--new", required=True, help="Parquet path of the new batch")
    parser.add_argument("--seen", required=True, help="Parquet path of the kept corpus")
    parser.add_argument("--out", required=True, help="Directory to append admitted docs")
    parser.add_argument("--eval", help="Optional parquet eval set for decontamination")
    parser.add_argument(
        "--trim-spans-w", type=int, default=None, metavar="W",
        help="Also cut repeated W-token passages from admitted docs "
        "(incremental exact-substring span dedup, keep-first semantics)",
    )
    parser.add_argument(
        "--window-hashes", default=None, metavar="DIR",
        help="Parquet dir of the accumulated window-hash table (one BIGINT "
        "column h). Read as the seen side if it exists; the batch's "
        "pre-trim hashes are appended after the admitted docs commit. "
        "Required with --trim-spans-w.",
    )
    parser.add_argument(
        "--verify-threshold", type=float, default=0.5, metavar="T",
        help="Near-dup Jaccard threshold. The dedup stage is routed by "
        "the batch∪seen shingle-df profile (operators/simjoin.py): the "
        "EXACT incremental prefix join where its candidate volume "
        "undercuts LSH's hashing term, incremental MinHash-LSH otherwise",
    )
    parser.add_argument(
        "--dedup-mode", choices=("auto", "prefix", "lsh"), default="auto",
        help="Force a similarity-join leg instead of the df-profile "
        "router (auto)",
    )
    parser.add_argument("--master", default="local[*]")
    args = parser.parse_args(argv)
    if (args.trim_spans_w is None) != (args.window_hashes is None):
        parser.error("--trim-spans-w and --window-hashes go together")

    from etl_for_all_studies_spark.caching import CacheScope
    from etl_for_all_studies_spark.plans.incremental_curation import curate_batch
    from etl_for_all_studies_spark.session import get_spark

    spark = get_spark(app_name="incremental-curation", master=args.master)
    t0 = time.monotonic()
    with CacheScope() as scope:
        new = scope.persist(spark.read.parquet(args.new))
        seen = spark.read.parquet(args.seen)
        eval_docs = spark.read.parquet(args.eval) if args.eval else None
        seen_hashes = None
        if args.window_hashes and pathlib.Path(args.window_hashes).exists():
            seen_hashes = spark.read.parquet(args.window_hashes)
        res = curate_batch(
            new, seen, eval_docs=eval_docs, trim_spans_w=args.trim_spans_w,
            verify_threshold=args.verify_threshold,
            seen_window_hashes=seen_hashes, dedup_mode=args.dedup_mode,
            scope=scope,
        )
        admitted = scope.persist(res.admitted)
        n_new = new.count()
        n_admit = admitted.count()
        n_vs_seen = res.dropped_vs_seen.count()
        n_contam = res.contaminated.count() if res.contaminated is not None else 0
        n_trimmed = (
            res.trimmed_spans.count() if res.trimmed_spans is not None else 0
        )
        admitted.write.mode("append").parquet(args.out)
        if res.new_window_hashes is not None:
            # accrue AFTER the docs commit: a crash between the two writes
            # re-runs the batch, and the digest anti-join (O-16) dedups the
            # docs while the hash append is distinct-idempotent downstream
            res.new_window_hashes.write.mode("append").parquet(args.window_hashes)
    print(
        f"batch={n_new} admitted={n_admit} dropped_vs_seen={n_vs_seen} "
        f"contaminated={n_contam} trimmed_spans={n_trimmed} "
        f"elapsed={time.monotonic() - t0:.1f}s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
