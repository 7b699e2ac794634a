#!/usr/bin/env python
"""CLI entry point #8: continuously track heavy hitters over an item stream.

Runs ``streaming/heavyhitters.py::stream_heavy_hitters``: a checkpointed
file source drains every currently-available shard (``availableNow``), each
micro-batch is summarized per-partition by Misra–Gries and merged into the
bounded (≤ m rows) state at ``--state``; the any-time top-k prints after
the drain. Re-running later folds only NEW shards; a crash-window replay
rebuilds its own ``batch_id=N`` state partition identically.
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        description="Streaming heavy hitters (mergeable Misra–Gries, Spark)"
    )
    parser.add_argument(
        "--source", required=True, help="Directory the item shards arrive in"
    )
    parser.add_argument(
        "--format", default="jsonl", choices=("jsonl", "json", "parquet"),
        help="Shard file format (must carry the --item-col column)",
    )
    parser.add_argument(
        "--state", required=True, help="Summary state directory (batch_id=N/)"
    )
    parser.add_argument(
        "--checkpoint", required=True,
        help="Streaming checkpoint directory (source progress)",
    )
    parser.add_argument("--item-col", default="item")
    parser.add_argument(
        "--max-files-per-trigger", type=int, default=0,
        help="Shards per micro-batch (0 = drain everything in one fold)",
    )
    parser.add_argument(
        "--m", type=int, default=4096,
        help="MG counters: every item above n_total/(m+1) is guaranteed kept",
    )
    parser.add_argument("--top", type=int, default=20, help="Top-k to print")
    parser.add_argument(
        "--prune-keep", type=int, default=0, metavar="N",
        help="After the drain, delete state partitions older than the "
             "newest N (≥2; 0 = keep the full audit trail)",
    )
    parser.add_argument("--master", default="local[*]")
    args = parser.parse_args(argv)

    from etl_for_all_studies_spark.session import get_spark
    from etl_for_all_studies_spark.streaming.heavyhitters import (
        prune_state,
        stream_heavy_hitters,
        top_k_from_state,
    )

    spark = get_spark(app_name="stream-heavyhitters", master=args.master)
    t0 = time.monotonic()
    reader = spark.readStream.schema(f"{args.item_col} string")
    if args.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", args.max_files_per_trigger)
    stream = (
        reader.parquet(args.source)
        if args.format == "parquet"
        else reader.json(args.source)
    )
    stream_heavy_hitters(
        stream, args.state, args.checkpoint, item_col=args.item_col, m=args.m
    )
    pruned = prune_state(args.state, keep_last=args.prune_keep) if args.prune_keep else []
    top = top_k_from_state(spark, args.state, k=args.top).collect()
    n_total = top[0].n_total if top else 0
    for r in top:
        print(f"  #{r.rank:<3} {r.item}  weight>={r.weight}")
    print(
        f"items_tracked={len(top)} n_total={n_total} "
        f"support_bound={n_total / (args.m + 1):.1f} "
        f"pruned={len(pruned)} elapsed={time.monotonic() - t0:.1f}s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
