"""Dump every registry query's executedPlan string to a JSON file.

Round-8 utility for diffing physical plans across an engine change (used
to compute the modified-since-last-check rotation cohort honestly, not by
guessing call sites). Plan strings normalize plan-id / exprId noise via
the same regex the scale-plan lint uses.

Usage: python tools/dump_plans.py OUT.json [SF_DIR]
       python tools/dump_plans.py --one QUERY [SF_DIR]   # fresh-session plan

A residual noise class the whole-registry dump CANNOT normalize away:
``RewriteDistinctAggregates`` numbers its grouping ids (``gid``) by an
exprId-sensitive grouping, so a query with multiple distinct aggregates
(profile_customer) renumbers its Expand/FILTER gids when the queries
analyzed BEFORE it in the same session change — e.g. when new registry
entries sort earlier by name (measured r9: 5 appended queries flipped
``gid = 5`` to ``gid = 2`` with zero semantic change). Confirm any
suspicious diff with ``--one``: build ONLY that query in a fresh session
on both commits; identical output ⇒ session-counter noise, not a plan
change.
"""
from __future__ import annotations

import json
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def normalize(plan: str) -> str:
    plan = re.sub(r"#\d+L?", "#x", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=x", plan)
    plan = re.sub(r"\[id=#?\d+\]", "[id=x]", plan)
    plan = re.sub(r"/tmp/[^\s,)\]]+", "/tmp/x", plan)
    # lambda variable names carry a session-global counter (lambda x_158)
    # that shifts with everything analyzed earlier in the process — same
    # noise class as exprIds, normalized the same way
    plan = re.sub(r"\blambda ([A-Za-z]+)_\d+", r"lambda \1_x", plan)
    # Spark truncates long expression lists at a CHARACTER budget, so the
    # cut point shifts with exprId digit widths — the truncated tail is
    # noise by construction; collapse everything from the enclosing
    # bracket/comma boundary to the ellipsis (a token-level collapse left
    # one boundary token of drift per cut — measured r8→r9 false diffs on
    # FileScan DataFilters metadata, which maxMetadataStringLength
    # truncates independently of the plan-string budget)
    plan = re.sub(r"[^\[\],]*\.\.\.", "x...", plan)
    # with-common-expr aliases carry the same session-global counter class
    # as lambda variables
    plan = re.sub(r"_common_expr_\d+", "_common_expr_x", plan)
    return plan


def main() -> None:
    if sys.argv[1] == "--one":
        _one(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01")
        return
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    from etl_for_all_studies_spark import suite
    from etl_for_all_studies_spark.session import get_spark

    spark = get_spark(
        app_name="dump-plans",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.ui.enabled": "false",
            # no truncation: a '...' cut lands at a CHARACTER offset that
            # shifts with exprId digit widths, defeating normalization
            "spark.sql.debug.maxToStringFields": "100000",
            "spark.sql.maxPlanStringLength": "2147483632",
            # scan-node metadata (DataFilters/Location lists) truncates at
            # its own budget, independent of maxPlanStringLength
            "spark.sql.maxMetadataStringLength": "1000000",
        },
    )
    plans = {}
    # NAME order + a cache clear per query: the registry's rotation order
    # must not leak into the dump (a reorder shifts which persisted
    # intermediates are already materialized when a later plan is built,
    # flipping size-based choices like BroadcastNestedLoopJoin build side
    # and isFinalPlan markers inside InMemoryRelation subtrees — measured
    # as 5 false diffs across the r9 rotation)
    for name in sorted(suite.QUERY_REGISTRY):
        qd = suite.QUERY_REGISTRY[name]
        try:
            plans[name] = normalize(
                qd.fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as e:  # noqa: BLE001 - diagnostic dump
            plans[name] = f"ERROR: {e}"
        spark.catalog.clearCache()
    pathlib.Path(out).write_text(json.dumps(plans, indent=1))
    print(f"wrote {len(plans)} plans to {out}")


def _one(name: str, sf: str) -> None:
    """Fresh-session single-query dump (module docstring: gid noise)."""
    from etl_for_all_studies_spark import suite
    from etl_for_all_studies_spark.session import get_spark

    spark = get_spark(
        app_name="dump-one-plan",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.debug.maxToStringFields": "100000",
            "spark.sql.maxPlanStringLength": "2147483632",
            "spark.sql.maxMetadataStringLength": "1000000",
        },
    )
    qd = suite.QUERY_REGISTRY[name]
    print(normalize(qd.fn(spark, sf)._jdf.queryExecution().executedPlan().toString()))


if __name__ == "__main__":
    main()
