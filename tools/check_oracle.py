#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate: run each suite query in
Spark AND its DuckDB oracle, compare row count + column names + sorted values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""
from __future__ import annotations

import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df):
    """Sort columns by name, then rows; stringify for stable comparison."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()

    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return f"{v:.6f}"
            return f"{v:.10g}"
        return str(v)

    rows = sorted(tuple(canon(v) for v in row) for row in df.itertuples(index=False))
    return rows


def main():
    import duckdb

    from etl_for_all_studies_spark.session import get_spark
    from etl_for_all_studies_spark.suite import QUERY_REGISTRY

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, qd in QUERY_REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = qd.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if qd.sql is None:
            print(f"rows-only {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(qd.sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            failures.append(name)
            continue
        issues = []
        if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, odf.columns)):
            issues.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if len(sdf) != len(odf):
            issues.append(f"rowcount {len(sdf)} vs {len(odf)}")
        if not issues:
            s_rows, o_rows = normalize(sdf), normalize(odf)
            if s_rows != o_rows:
                diff = [
                    (a, b) for a, b in zip(s_rows, o_rows) if a != b
                ][:5]
                issues.append(f"values differ; first diffs: {diff}")
        if issues:
            print(f"FAIL {name}: " + "; ".join(issues))
            failures.append(name)
        else:
            print(f"ok   {name}: {len(sdf)} rows")
    print()
    if failures:
        print(f"FAILURES: {failures}")
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
