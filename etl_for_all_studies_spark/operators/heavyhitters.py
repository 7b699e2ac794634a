"""Heavy hitters: exact top-k frequent items without a full-vocabulary
shuffle (Misra–Gries candidates → exact recount).

At web-corpus scale the naive top-k (``groupBy(item).count().orderBy``)
shuffles one row per *distinct item per partition* — for token streams
whose vocabulary is billions (typos, URLs, code identifiers), the shuffle
is vocabulary-sized even though only k items matter. The classic two-phase
fix (Misra–Gries 1982, the standard streaming heavy-hitters algorithm):

1. **candidates** — each partition runs a bounded Misra–Gries summary with
   ``m`` counters over its local stream and emits at most ``m`` candidate
   items. MG guarantee: any item whose partition frequency exceeds
   ``n_p/(m+1)`` survives that partition's summary, so (pigeonhole) any
   item with GLOBAL frequency > ``N/(m+1)`` appears in the union of
   candidates. Shuffle volume: ``partitions × m`` rows, independent of
   vocabulary size.
2. **exact recount** — the stream is re-scanned once, filtered to the
   (broadcast) candidate set, and counted exactly; top-k by (count desc,
   item asc) is then a correct, fully deterministic answer whenever the
   k-th item clears the support bound — the function also RETURNS that
   bound so callers can verify the contract instead of trusting it.

The MG pass is the one deliberate Python-in-the-path operator in this
engine: Spark has no JVM Misra–Gries, and the whole point is per-partition
bounded memory — ``mapInPandas`` streams Arrow batches through a dict
capped at ``m`` entries, accumulating across batches within a partition
(state lives in the generator, never materializing the partition). The
recount phase is pure JVM.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def misra_gries_candidates(
    items: DataFrame,
    *,
    item_col: str = "item",
    m: int = 4096,
    emit_partition_totals: bool = False,
) -> DataFrame:
    """Per-partition MG summaries → (item, weight_lower_bound) candidates.

    ``weight_lower_bound`` is the MG counter value (an under-estimate of the
    partition-local count by at most ``n_p/(m+1)``); callers wanting exact
    numbers recount — see :func:`heavy_hitters`.

    ``emit_partition_totals=True`` additionally yields ONE sentinel row per
    partition — ``(NULL, n_p)`` with the partition's row count — so a
    caller can recover the batch total from the same single pass instead of
    a separate ``count()`` action (the streaming fold's one-scan contract,
    ``streaming/heavyhitters.py``). Item values are never NULL otherwise
    (NULL inputs are skipped by the summary), so the sentinel is
    unambiguous.
    """
    schema = f"{item_col} string, weight_lower_bound long"

    def summarize(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            for value in pdf[item_col]:
                if value is None:
                    continue
                if value in counters:
                    counters[value] += 1
                elif len(counters) < m:
                    counters[value] = 1
                else:
                    # decrement-all step, dropping zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        keys = list(counters.keys())
        vals = list(counters.values())
        if emit_partition_totals:
            keys.append(None)
            vals.append(n_part)
        yield pd.DataFrame({item_col: keys, "weight_lower_bound": vals})

    return items.select(F.col(item_col).cast("string").alias(item_col)).mapInPandas(
        summarize, schema
    )


def heavy_hitters(
    items: DataFrame, *, item_col: str = "item", k: int = 20, m: int = 4096
) -> DataFrame:
    """Exact top-k most frequent items (count desc, item asc) via
    MG candidates + exact recount.

    Returns (item, cnt, rank, support_bound) where ``support_bound`` is the
    N/(m+1) guarantee threshold: the result is provably the exact top-k iff
    ``cnt`` of the k-th row exceeds it (true for any remotely heavy-tailed
    stream with sensible ``m``; callers can assert it).
    """
    src = items.select(F.col(item_col).cast("string").alias(item_col))
    candidates = (
        misra_gries_candidates(src, item_col=item_col, m=m)
        .select(item_col)
        .dropDuplicates([item_col])
    )
    counts = src.join(F.broadcast(candidates), item_col).groupBy(item_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = src.select(F.count(F.lit(1)).alias("n_total"))
    w = Window.orderBy(F.col("cnt").desc(), F.col(item_col).asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .crossJoin(F.broadcast(total))
        .select(
            item_col,
            "cnt",
            "rank",
            (F.col("n_total") / F.lit(float(m + 1))).alias("support_bound"),
        )
    )


__all__ = ["heavy_hitters", "misra_gries_candidates"]
