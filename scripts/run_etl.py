#!/usr/bin/env python
"""CLI entry point #1: full ETL (mirrors reference ``scripts/run_etl.py``)."""
from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Run the study ETL pipeline (Spark)")
    parser.add_argument("--config", required=True, help="Path to YAML config file")
    parser.add_argument(
        "--with-correlations",
        action="store_true",
        help="Also refresh gene-pair correlations after loading",
    )
    args = parser.parse_args(argv)

    from etl_for_all_studies_spark import load_config, run_pipeline

    config = load_config(args.config)
    from etl_for_all_studies_spark.logging_utils import configure_logging

    configure_logging(config)
    result = run_pipeline(config, with_correlations=args.with_correlations)
    print(
        f"processed={len(result.processed_studies)} failures={len(result.failures)} "
        f"fact_rows={result.fact_rows_written} elapsed={result.elapsed_seconds:.1f}s"
    )
    return 1 if result.failures and not result.processed_studies else 0


if __name__ == "__main__":
    sys.exit(main())
