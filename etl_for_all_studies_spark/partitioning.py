"""Physical-parallelism hygiene for compute-dense narrow stages.

A narrow projection inherits the scan's partitioning, and Spark splits
files by BYTES (``spark.sql.files.maxPartitionBytes``, default 128 MB) —
the right sizing for IO-bound scans, and exactly wrong for stages whose
cost per byte is enormous: a 4 MB documents table arrives as ONE
partition, so a per-token polynomial hash pass or a per-position shingle
fold over it runs on one core of a 32-core session (measured: the w=8
span fold at 13.5M windows takes 23.6 s on one task, 6–8 s on 32 — and
AQE cannot help, it only re-plans EXCHANGES, and a narrow chain from a
scan has none).

:func:`compute_spread` is the guarded fix: round-robin-repartition UP to
the session's shuffle parallelism when a SCAN-ROOTED NARROW plan's static
partitioning is below it, identity otherwise. At 100 TB the guard is what
matters — real scans arrive as thousands of splits, the condition is
false, and no shuffle is added; the spread only pays (one small exchange
of the pre-compute rows) where compute would otherwise serialize onto a
handful of tasks. Deliberately NOT bytes-aware: the callers are the
operators whose per-row cost dwarfs row width (token hashing, shingle
folds, signature sketches), where task-count is the only variable that
matters.

LAZY-PLAN CONTRACT (round-8 fix, ADVICE r7): the partition-count probe is
restricted to plans whose analyzed logical tree is entirely narrow ops
over leaf relations (project / filter / generate / coalesce over a file or
local relation). On such plans ``df.rdd.getNumPartitions()`` is pure RDD
construction — AQE never wraps an exchange-free plan, so NO Spark job runs
at plan-build time (pinned by ``tests/test_scale_plans.py::
test_compute_spread_lazy_on_derived``). Any exchange-bearing input (a
join, aggregate, window, or ``repartition`` anywhere in the tree) returns
IDENTITY instead: under AQE the old ``df.rdd`` probe materialized every
upstream shuffle stage eagerly and then re-executed it at action time —
and a post-exchange frame already runs at shuffle parallelism, so the
spread has nothing to add there anyway.
"""
from __future__ import annotations

from pyspark.sql import DataFrame

# Analyzed-logical-plan node classes that neither shuffle nor gate the
# probe: narrow row-wise ops plus the leaf relations a spread caller can
# legitimately sit on. Anything else (Aggregate, Join, Window, Sort,
# RepartitionByExpression, set ops, ...) makes the plan exchange-bearing
# (or unknown) and the spread degrades to identity.
_NARROW_NODES = frozenset(
    {
        "Project",
        "Filter",
        "Generate",
        "SubqueryAlias",
        "Union",
        "View",
        "LocalRelation",
        "OneRowRelation",
        "Range",
        "LogicalRDD",
        "LogicalRelation",
        "DataSourceV2Relation",
        "DataSourceV2ScanRelation",
    }
)


def _scan_rooted_narrow(jnode) -> bool:
    """True iff every node of the analyzed logical plan is a narrow op or
    leaf relation — i.e. probing the frame's RDD partition count cannot
    materialize a stage. ``Repartition`` is the one dual-natured node:
    ``coalesce(n)`` (shuffle=false) is narrow, ``repartition(n)``
    (shuffle=true) is an exchange."""
    name = jnode.getClass().getSimpleName()
    if name == "Repartition":
        if jnode.shuffle():
            return False
    elif name not in _NARROW_NODES:
        return False
    children = jnode.children()
    for i in range(children.size()):
        if not _scan_rooted_narrow(children.apply(i)):
            return False
    return True


def compute_spread(df: DataFrame) -> DataFrame:
    """Repartition ``df`` up to ``spark.sql.shuffle.partitions`` iff it is
    a scan-rooted narrow plan whose static partitioning is lower; identity
    otherwise (exchange-bearing, streaming, or uninspectable frames —
    probing those would run upstream stages eagerly, see module
    docstring)."""
    try:
        target = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        if not _scan_rooted_narrow(df._jdf.queryExecution().analyzed()):
            return df
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n >= target:
        return df
    return df.repartition(target)
