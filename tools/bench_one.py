#!/usr/bin/env python
"""Run a subset of suite queries under the EXACT bench.py harness conditions
(same session flags, same noop sink, same clearCache cadence), printing every
repeat's time — the tool for chasing per-query bench regressions.

Usage: python tools/bench_one.py dedup_embedding [more...] [--repeats N]
"""
from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    args = []
    repeats = 2
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--repeats"):
            if "=" in a:
                repeats = int(a.split("=", 1)[1])
            else:
                repeats = int(argv[i + 1])
                i += 1
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from etl_for_all_studies_spark.session import get_spark
    from etl_for_all_studies_spark.suite import QUERY_REGISTRY

    spark = get_spark(
        app_name="bench_one",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    spark.range(1).count()
    names = args or ["dedup_embedding"]
    if os.path.isdir(warm_dir):
        for name in names:
            try:
                QUERY_REGISTRY[name].fn(spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:
                print(f"warmup {name}: {exc}", file=sys.stderr)
        spark.catalog.clearCache()

    for name in names:
        qd = QUERY_REGISTRY[name]
        times = []
        for i in range(repeats):
            t0 = time.monotonic()
            qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.monotonic() - t0
            times.append(round(el, 3))
            spark.catalog.clearCache()
        print(f"{name}: repeats={times} best={min(times)}")


if __name__ == "__main__":
    main()
