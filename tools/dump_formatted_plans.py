#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named registry queries to files.

Optimization-round utility: captures the judge-checkable before/after plan
artifacts under plans/<round>/ (``<query>_<tag>.txt``; round dir from
``$SPARK_GRAFT_PLANS_DIR``, default r12).

Usage: python tools/dump_formatted_plans.py TAG QUERY [QUERY ...]
       python tools/dump_formatted_plans.py TAG --top N   # N most expensive per bench_full.json
"""
from __future__ import annotations

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REPO = pathlib.Path(__file__).resolve().parent.parent
OUT = REPO / "plans" / os.environ.get("SPARK_GRAFT_PLANS_DIR", "r12")
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names and names[0] == "--top":
        n = int(names[1])
        bench = json.loads((REPO / "bench_results" / "bench_full.json").read_text())
        names = [
            k for k, _ in sorted(bench["queries"].items(), key=lambda kv: -kv[1])
        ][:n]

    from etl_for_all_studies_spark.session import get_spark
    from etl_for_all_studies_spark.suite import QUERY_REGISTRY

    spark = get_spark(master="local[4]", shuffle_partitions=8)
    OUT.mkdir(parents=True, exist_ok=True)
    for name in names:
        qd = QUERY_REGISTRY[name]
        try:
            df = qd.fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building plan: {type(exc).__name__}: {exc}"
        (OUT / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
