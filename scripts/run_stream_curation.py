#!/usr/bin/env python
"""CLI entry point #7: continuously curate arriving document shards.

Runs ``streaming/curation.py::stream_curate_corpus``: a checkpointed file
source drains every currently-available shard (``availableNow``), and each
micro-batch is folded through ``plans/incremental_curation.py::curate_batch``
against everything already admitted — quality filter, optional
decontamination, vs-seen + within-batch near-dup, optional incremental span
trim with corpus-wide hash accrual. Re-running later picks up only NEW
shards; a crash-window batch replay overwrites its own ``batch_id=N``
partitions with the identical result (see the module docstring).
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        description="Streaming incremental corpus curation (Spark)"
    )
    parser.add_argument(
        "--source", required=True,
        help="Directory the document shards arrive in",
    )
    parser.add_argument(
        "--format", default="jsonl", choices=("jsonl", "json", "parquet"),
        help="Shard file format (canonical document schema)",
    )
    parser.add_argument(
        "--corpus", required=True,
        help="Curated-corpus state directory (admitted/, window_hashes/, audit/)",
    )
    parser.add_argument(
        "--checkpoint", required=True,
        help="Streaming checkpoint directory (source progress)",
    )
    parser.add_argument("--eval", help="Optional parquet eval set (decontamination)")
    parser.add_argument(
        "--trim-spans-w", type=int, default=None, metavar="W",
        help="Also cut repeated W-token passages vs the accrued corpus",
    )
    parser.add_argument(
        "--max-files-per-trigger", type=int, default=1,
        help="Shards per micro-batch (tune to cluster size)",
    )
    parser.add_argument(
        "--compact", action="store_true",
        help="After the drain, compact closed batch partitions (all but "
             "the newest committed batch) into one generation partition",
    )
    parser.add_argument(
        "--verify-threshold", type=float, default=0.5, metavar="T",
        help="Near-dup Jaccard threshold. The route — EXACT incremental "
        "prefix join vs incremental MinHash-LSH with the stored-"
        "signatures seam — is chosen by the BOOTSTRAP batch's shingle-df "
        "profile on the first fold and pinned per corpus "
        "(simjoin_route.json). The route is corpus state: changing T "
        "against an existing corpus fails loudly",
    )
    parser.add_argument(
        "--dedup-mode", choices=("auto", "prefix", "lsh"), default="auto",
        help="Force a similarity-join leg instead of the df-profile "
        "router (auto)",
    )
    parser.add_argument("--master", default="local[*]")
    args = parser.parse_args(argv)

    from etl_for_all_studies_spark.session import get_spark
    from etl_for_all_studies_spark.streaming.corpus import read_corpus_stream
    from etl_for_all_studies_spark.streaming.curation import (
        compact_batches,
        read_audit,
        read_curated_corpus,
        stream_curate_corpus,
    )

    spark = get_spark(app_name="stream-curation", master=args.master)
    t0 = time.monotonic()
    eval_docs = spark.read.parquet(args.eval) if args.eval else None
    stream_curate_corpus(
        read_corpus_stream(
            spark, args.source, fmt=args.format,
            max_files_per_trigger=args.max_files_per_trigger,
        ),
        args.corpus,
        args.checkpoint,
        eval_docs=eval_docs,
        verify_threshold=args.verify_threshold,
        trim_spans_w=args.trim_spans_w,
        dedup_mode=args.dedup_mode,
    )
    compacted = (
        len(compact_batches(spark, args.corpus)) if args.compact else 0
    )
    # a drain that processed zero batches leaves no corpus state at all —
    # report batches=0 instead of tripping over the missing directory
    audit = read_audit(spark, args.corpus)
    batches = admitted = corpus_total = 0
    if audit is not None:
        from pyspark.sql import functions as F

        row = audit.agg(
            F.count(F.lit(1)).alias("b"), F.sum("n_admitted").alias("a")
        ).collect()[0]
        batches, admitted = row["b"], int(row["a"])
        corpus_total = read_curated_corpus(spark, args.corpus).count()
    print(
        f"batches={batches} admitted_total={admitted} "
        f"corpus_docs={corpus_total} compacted={compacted} "
        f"elapsed={time.monotonic() - t0:.1f}s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
