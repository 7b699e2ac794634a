"""Dimension builds with deterministic surrogate keys.

Replaces the reference's per-row get-or-create probes + in-memory dim caches
(``src/etl_for_all_studies/repositories.py:30-185``) with set-oriented builds:
``distinct()`` natural keys + ``row_number()`` surrogate assignment. Keys are
**deterministic** (ordered by natural key) so oracle comparison is stable, and
**preserved across reruns**: existing rows keep their keys; only novel natural
keys get fresh keys starting at ``max(existing)+1`` (get-or-create semantics,
set-at-a-time).

Scale note: genes/studies/platforms/illnesses are small by construction
(genes ≈ whitelist size, the rest tiny), so their single-partition
``row_number`` is bounded by dim cardinality and left as-is. ``dim_sample``
is the one dim that grows with the corpus (10k–50k samples/study × many
studies), so its keys are assigned **per-study in parallel**: ``row_number``
partitioned by ``study_key`` plus dense per-study offsets (a window over one
row per study) — numerically identical to a global sort by
``(study_key, gsm_accession)`` but with no fact-scale single-partition
Exchange. The facts side only ever *joins* (broadcast) against these dims.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import UNKNOWN


def assign_surrogate_keys(
    existing: DataFrame | None,
    natural: DataFrame,
    key_col: str,
    natural_cols: list[str],
) -> DataFrame:
    """Union existing dim with novel natural keys, assigning stable keys.

    ``existing`` is the previously-written dim (or None on first build);
    ``natural`` holds candidate natural-key rows (any duplicates are dropped).
    """
    natural = (
        natural.select(*natural_cols)
        .where(F.col(natural_cols[0]).isNotNull())
        .distinct()
    )
    if existing is None or existing.isEmpty():
        w = Window.orderBy(*natural_cols)
        return natural.withColumn(key_col, F.row_number().over(w).cast("long")).select(
            key_col, *natural_cols
        )
    novel = natural.join(existing.select(*natural_cols), on=natural_cols, how="left_anti")
    base = existing.agg(F.max(key_col)).collect()[0][0] or 0
    w = Window.orderBy(*natural_cols)
    fresh = novel.withColumn(
        key_col, (F.row_number().over(w) + F.lit(base)).cast("long")
    ).select(key_col, *natural_cols)
    return existing.select(key_col, *natural_cols).unionByName(fresh)


def build_dim_study(existing: DataFrame | None, metadata: DataFrame) -> DataFrame:
    """dim_study: 1 row per GSE accession (``models.py:24-31``)."""
    return assign_surrogate_keys(
        existing, metadata.select("gse_accession"), "study_key", ["gse_accession"]
    )


def build_dim_gene(existing: DataFrame | None, expression_long: DataFrame) -> DataFrame:
    """dim_gene: 1 row per Ensembl id **seen in loaded facts** (``models.py:15-21``;
    the reference creates gene rows lazily per loaded expression row,
    ``pipeline.py:202``, so unexpressed whitelist genes never get dim rows)."""
    return assign_surrogate_keys(
        existing, expression_long.select("ensembl_id"), "gene_key", ["ensembl_id"]
    )


def build_dim_illness(existing: DataFrame | None, metadata: DataFrame) -> DataFrame:
    """dim_illness: 1 row per non-UNKNOWN label (``models.py:34-40``; UNKNOWN
    maps to a NULL FK, never to a dim row — ``repositories.py:148-173``)."""
    labels = metadata.select(F.col("illness").alias("illness_label")).where(
        (F.col("illness_label") != UNKNOWN) & (F.col("illness_label") != "")
    )
    return assign_surrogate_keys(existing, labels, "illness_key", ["illness_label"])


def build_dim_platform(existing: DataFrame | None, metadata: DataFrame) -> DataFrame:
    """dim_platform: 1 row per non-UNKNOWN accession (``models.py:43-49``)."""
    accs = metadata.select(F.col("platform").alias("platform_accession")).where(
        (F.col("platform_accession") != UNKNOWN) & (F.col("platform_accession") != "")
    )
    return assign_surrogate_keys(existing, accs, "platform_key", ["platform_accession"])


def _assign_sample_keys(incoming: DataFrame, base: int) -> DataFrame:
    """Dense, deterministic sample keys without a global single-partition sort.

    key = ``base`` + rank of (study_key, gsm_accession) — computed as a
    per-study ``row_number`` (parallel across studies) plus each study's
    cumulative row-count offset. The offset window is single-partition but
    runs over ONE row per study (the counts aggregate), never the samples
    themselves, so the plan stays parallel at any corpus size.
    """
    per_study = Window.partitionBy("study_key").orderBy("gsm_accession")
    counts = incoming.groupBy("study_key").agg(F.count(F.lit(1)).alias("__n"))
    off_w = Window.orderBy("study_key").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "study_key", F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__off")
    )
    return (
        incoming.withColumn("__rn", F.row_number().over(per_study))
        .join(F.broadcast(offsets), on="study_key")
        .withColumn(
            "sample_key",
            (F.col("__rn") + F.col("__off") + F.lit(base)).cast("long"),
        )
        .drop("__rn", "__off")
    )


def build_dim_sample(
    existing: DataFrame | None,
    metadata: DataFrame,
    dim_study: DataFrame,
    dim_illness: DataFrame,
    dim_platform: DataFrame,
) -> DataFrame:
    """dim_sample: 1 row per (gsm_accession, study_key) (``models.py:52-69``).

    * UNKNOWN platform/illness → NULL FK (O-17, ``repositories.py:148-173``);
    * enrichment on re-run (O-47, ``repositories.py:188-229``): an existing
      sample's UNKNOWN/NULL attributes are filled from new metadata, but a
      known value is never downgraded;
    * surrogate keys preserved for existing (gsm, study) pairs.

    All dim joins broadcast (dims ≪ broadcast threshold).
    """
    incoming = (
        metadata.join(F.broadcast(dim_study), on="gse_accession", how="inner")
        .join(
            F.broadcast(dim_illness),
            on=metadata["illness"] == dim_illness["illness_label"],
            how="left",
        )
        .join(
            F.broadcast(dim_platform),
            on=metadata["platform"] == dim_platform["platform_accession"],
            how="left",
        )
        .select(
            "gsm_accession",
            "study_key",
            F.col("platform_key"),
            F.col("illness_key"),
            F.col("age"),
            F.col("sex"),
        )
        .dropDuplicates(["gsm_accession", "study_key"])
    )
    if existing is None or existing.isEmpty():
        return _assign_sample_keys(incoming, 0).select(
            "sample_key",
            "gsm_accession",
            "study_key",
            "platform_key",
            "illness_key",
            "age",
            "sex",
        )

    new = incoming.alias("new")
    old = existing.alias("old")
    joined = old.join(new, on=["gsm_accession", "study_key"], how="full_outer")

    def enrich_str(col: str):
        o, n = F.col(f"old.{col}"), F.col(f"new.{col}")
        return F.coalesce(F.nullif(o, F.lit(UNKNOWN)), n, o, F.lit(UNKNOWN))

    def enrich_key(col: str):
        return F.coalesce(F.col(f"old.{col}"), F.col(f"new.{col}"))

    merged = joined.select(
        F.col("old.sample_key").alias("sample_key"),
        "gsm_accession",
        "study_key",
        enrich_key("platform_key").alias("platform_key"),
        enrich_key("illness_key").alias("illness_key"),
        enrich_str("age").alias("age"),
        enrich_str("sex").alias("sex"),
    )
    base = existing.agg(F.max("sample_key")).collect()[0][0] or 0
    novel_keys = _assign_sample_keys(
        merged.where(F.col("sample_key").isNull()).drop("sample_key"), base
    ).select(
        "sample_key",
        "gsm_accession",
        "study_key",
        "platform_key",
        "illness_key",
        "age",
        "sex",
    )
    return merged.where(F.col("sample_key").isNotNull()).unionByName(novel_keys)


__all__ = [
    "assign_surrogate_keys",
    "build_dim_gene",
    "build_dim_illness",
    "build_dim_platform",
    "build_dim_sample",
    "build_dim_study",
]
