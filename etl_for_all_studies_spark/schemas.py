"""StructType schemas for the star-schema warehouse.

Table shapes mirror the reference's SQLAlchemy models
(``src/etl_for_all_studies/models.py:15-131``) with Spark types per SURVEY
§1.2: surrogate keys → LongType, Float → DoubleType, ``computed_at`` stays a
STRING ISO-8601 timestamp (``models.py:115``), ``age``/``sex`` stay strings
(``models.py:63-64``). FK integrity is a property of the build (dims and facts
derive from the same source DataFrames), not an enforced constraint.
"""
from __future__ import annotations

from pyspark.sql import types as T

DIM_GENE = T.StructType(
    [
        T.StructField("gene_key", T.LongType(), False),
        T.StructField("ensembl_id", T.StringType(), False),
    ]
)

DIM_STUDY = T.StructType(
    [
        T.StructField("study_key", T.LongType(), False),
        T.StructField("gse_accession", T.StringType(), False),
    ]
)

DIM_ILLNESS = T.StructType(
    [
        T.StructField("illness_key", T.LongType(), False),
        T.StructField("illness_label", T.StringType(), False),
    ]
)

DIM_PLATFORM = T.StructType(
    [
        T.StructField("platform_key", T.LongType(), False),
        T.StructField("platform_accession", T.StringType(), False),
    ]
)

DIM_SAMPLE = T.StructType(
    [
        T.StructField("sample_key", T.LongType(), False),
        T.StructField("gsm_accession", T.StringType(), False),
        T.StructField("study_key", T.LongType(), False),
        T.StructField("platform_key", T.LongType(), True),
        T.StructField("illness_key", T.LongType(), True),
        T.StructField("age", T.StringType(), False),
        T.StructField("sex", T.StringType(), False),
    ]
)

FACT_EXPRESSION = T.StructType(
    [
        T.StructField("sample_key", T.LongType(), False),
        T.StructField("gene_key", T.LongType(), False),
        T.StructField("expression_value", T.DoubleType(), False),
        T.StructField("study_key", T.LongType(), False),  # partition column last
    ]
)

FACT_GENE_PAIR_CORR = T.StructType(
    [
        T.StructField("gene_a_key", T.LongType(), False),
        T.StructField("gene_b_key", T.LongType(), False),
        T.StructField("illness_key", T.LongType(), True),
        T.StructField("rho_spearman", T.DoubleType(), False),
        T.StructField("p_value", T.DoubleType(), False),
        T.StructField("q_value", T.DoubleType(), True),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("computed_at", T.StringType(), False),
        T.StructField("study_key", T.LongType(), False),  # partition column last
    ]
)

# Long-form expression rows as produced by the study readers, before key joins.
EXPRESSION_LONG = T.StructType(
    [
        T.StructField("gse_accession", T.StringType(), False),
        T.StructField("ensembl_id", T.StringType(), False),
        T.StructField("gsm_accession", T.StringType(), False),
        T.StructField("expression_value", T.DoubleType(), False),
    ]
)

# Normalized per-sample metadata (reference SampleMetadata,
# metadata_processing.py:16-24) — the "UNKNOWN" sentinel semantics of §1.3.
SAMPLE_METADATA = T.StructType(
    [
        T.StructField("gse_accession", T.StringType(), False),
        T.StructField("gsm_accession", T.StringType(), False),
        T.StructField("age", T.StringType(), False),
        T.StructField("sex", T.StringType(), False),
        T.StructField("illness", T.StringType(), False),
        T.StructField("platform", T.StringType(), False),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "dim_gene": DIM_GENE,
    "dim_study": DIM_STUDY,
    "dim_illness": DIM_ILLNESS,
    "dim_platform": DIM_PLATFORM,
    "dim_sample": DIM_SAMPLE,
    "fact_expression": FACT_EXPRESSION,
    "fact_gene_pair_corr": FACT_GENE_PAIR_CORR,
}

# Facts are partitioned by study so per-study reads/overwrites prune to one
# partition (the reference scopes every warehouse op `WHERE study_key = ?`,
# repositories.py:303-309,322-323 — partition pruning is the Spark analog).
PARTITIONED_BY_STUDY = {"fact_expression", "fact_gene_pair_corr"}

UNKNOWN = "UNKNOWN"  # sentinel, reference metadata_processing.py:13

__all__ = [
    "DIM_GENE",
    "DIM_STUDY",
    "DIM_ILLNESS",
    "DIM_PLATFORM",
    "DIM_SAMPLE",
    "FACT_EXPRESSION",
    "FACT_GENE_PAIR_CORR",
    "EXPRESSION_LONG",
    "SAMPLE_METADATA",
    "TABLE_SCHEMAS",
    "PARTITIONED_BY_STUDY",
    "UNKNOWN",
]
