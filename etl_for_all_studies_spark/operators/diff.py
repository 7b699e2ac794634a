"""Keyed snapshot diff: what changed between two versions of a table.

Warehouse operations need "what did this rerun change?" as a first-class
query — regression-testing an ETL change, auditing an idempotent-rerun
contract (the engine's own O-16/O-47 claims), or validating a migration.
The reference answers this manually; here it is one operator:

``snapshot_diff(old, new, keys)`` → one row per key present in either
snapshot, with ``change ∈ {added, removed, changed, same}`` and the list of
value columns that differ. NULL-safe comparison throughout (``<=>`` — a
NULL→value transition is a change, NULL→NULL is not).

Scale shape: ONE full-outer sort-merge join on the key columns — both
sides shuffle once; the column comparison is a codegen'd expression, and
the common case (``same``) can be filtered out before anything downstream
materializes. At warehouse scale, run it partition-pruned (pass snapshots
already filtered to the studies/dates a rerun touched) exactly like the
engine's fact-append anti-join.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    *,
    include_same: bool = False,
) -> DataFrame:
    """Diff two snapshots sharing a schema, keyed by ``keys``.

    Returns (keys…, change, changed_cols, n_changed_cols) where ``change``
    is ``added`` (key only in new), ``removed`` (only in old), ``changed``
    (present in both, ≥1 value column differs) or ``same`` (only when
    ``include_same=True``). ``changed_cols`` is the sorted list of value
    columns whose NULL-safe comparison failed (empty for added/removed —
    the row-level change already says everything).
    """
    value_cols = [c for c in old.columns if c not in keys]
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"snapshot schemas differ: {sorted(old.columns)} vs {sorted(new.columns)}"
        )
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in value_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in value_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = [F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}")) for k in keys]
    joined = o.join(n, on=cond, how="full_outer")

    changed_cols = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
                    )
                    for c in value_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    out = joined.select(
        *[
            F.coalesce(F.col(f"__ko_{k}"), F.col(f"__kn_{k}")).alias(k)
            for k in keys
        ],
        change.alias("change"),
        F.when(F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull(), changed_cols)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    ).withColumn("n_changed_cols", F.size("changed_cols").cast("long"))
    if not include_same:
        out = out.where(F.col("change") != "same")
    return out


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    *,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Materialize the current state of a table from a base snapshot plus a
    CDC changelog — the MERGE/upsert primitive for a parquet warehouse.

    ``changes`` carries the base's value columns plus ``op_col``
    (``'U'`` = upsert, ``'D'`` = delete) and ``seq_col`` (a monotonically
    increasing change sequence — commit LSN, kafka offset, batch id).
    Semantics: for every key, the highest-``seq`` change wins; a winning
    upsert replaces the base row (or inserts), a winning delete removes the
    key; keys untouched by the changelog pass through. Value columns on
    delete rows are ignored. ``seq`` must be unique per key (the CDC-source
    contract — LSNs/offsets are); ties would make the winner undefined.

    Scale shape: the changelog is reduced FIRST — one ``max_by`` aggregation
    per key (map-side combined, no per-key window sort over the raw
    changelog) — and only then joined to the base with ONE full-outer join
    on the keys. Base rows never shuffle more than once, and a
    partition-pruned base (only the partitions a batch touches, like the
    engine's fact append) keeps the join sides proportional to the batch,
    not the warehouse.
    """
    value_cols = [c for c in base.columns if c not in keys]
    missing = [c for c in value_cols + keys if c not in changes.columns]
    if missing:
        raise ValueError(f"apply_changelog: changes missing columns {missing}")

    order = F.struct(F.col(seq_col).alias("s"))
    latest = changes.groupBy(*keys).agg(
        F.max_by(
            F.struct(F.col(op_col).alias("__op"), *[F.col(c) for c in value_cols]),
            order,
        ).alias("__w")
    ).select(*keys, "__w.*")

    joined = base.alias("b").join(latest.alias("c"), keys, "full_outer")
    kept = joined.where(
        F.col("__op").isNull() | (F.col("__op") != "D")
    )
    return kept.select(
        *keys,
        *[
            F.when(F.col("__op").isNotNull(), F.col(f"c.{c}"))
            .otherwise(F.col(f"b.{c}"))
            .alias(c)
            for c in value_cols
        ],
    )


__all__ = ["apply_changelog", "snapshot_diff"]
