#!/usr/bin/env python
"""CLI entry point #5: one-pass column profile of any parquet table.

Runs ``operators/profiling.py::profile_columns`` and prints one line per
column (null rate, cardinality, typed min/max/mean). ``--approx`` switches
exact distinct counts (Expand — the oracle-checked form) for HLL++
estimates (single pass, no Expand — the 100 TB default).
"""
from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Profile a parquet table (Spark)")
    parser.add_argument("--input", required=True, help="Parquet table path")
    parser.add_argument("--columns", help="Comma-separated subset of columns")
    parser.add_argument(
        "--approx", action="store_true",
        help="HLL++ distinct estimates instead of exact (no Expand)",
    )
    parser.add_argument("--master", default="local[*]")
    args = parser.parse_args(argv)

    from etl_for_all_studies_spark.operators.profiling import profile_columns
    from etl_for_all_studies_spark.session import get_spark

    spark = get_spark(app_name="profile", master=args.master)
    df = spark.read.parquet(args.input)
    cols = args.columns.split(",") if args.columns else None
    rows = profile_columns(df, cols, approx=args.approx).collect()
    width = max(len(r["column"]) for r in rows)
    for r in rows:
        typed = (
            f"min={r['min_num']!r} max={r['max_num']!r} mean={r['mean']!r}"
            if r["mean"] is not None or r["min_num"] is not None
            else f"min={r['min_str']!r} max={r['max_str']!r}"
            if r["min_str"] is not None or r["max_str"] is not None
            else ""
        )
        print(
            f"{r['column']:<{width}}  rows={r['n_rows']} "
            f"nulls={r['n_nulls']} ({r['null_frac']:.4f}) "
            f"distinct={r['n_distinct']} {typed}"
        )
    return 0 if rows else 1


if __name__ == "__main__":
    sys.exit(main())
