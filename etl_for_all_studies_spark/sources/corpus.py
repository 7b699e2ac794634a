"""Corpus sources/sinks for the documents table (format breadth + bucketing).

The reference's ingestion surface is TSV studies (``study_io.py``); a
training-data corpus arrives as parquet, JSONL, or CSV shards. This module
gives the engine one entry point for all three, plus the scale-side sink:
partitioned, optionally *bucketed* warehouse tables.

Why bucketing matters at 100 TB: every self-join the dedup operators run
(digest groups, candidate verification) and every corpus ⋈ corpus join
(incremental snapshots) shuffles on ``doc_id``-like keys. Writing both sides
bucketed by the join key into the session catalog makes those joins
**shuffle-free** — SortMergeJoin reads co-located buckets directly
(``test_corpus_io.py`` asserts the physical plan has no Exchange). On a real
cluster the same tables also give deterministic task-to-bucket affinity for
incremental appends.

All readers apply the explicit schema (never infer at scale — schema
inference reads the data twice and can flip types between shards).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read a documents corpus from parquet / orc / jsonl / csv with the
    canonical schema (column pruning and predicate pushdown work on all
    four; parquet and ORC additionally prune row groups/stripes)."""
    if fmt == "parquet":
        return spark.read.schema(DOCUMENT_SCHEMA).parquet(path)
    if fmt == "orc":
        return spark.read.schema(DOCUMENT_SCHEMA).orc(path)
    if fmt in ("json", "jsonl"):
        return spark.read.schema(DOCUMENT_SCHEMA).json(path)
    if fmt == "csv":
        return spark.read.schema(DOCUMENT_SCHEMA).option("header", "true").csv(path)
    raise ValueError(f"unsupported corpus format: {fmt!r}")


def write_corpus_table(
    docs: DataFrame,
    table: str,
    *,
    bucket_by: str | None = "doc_id",
    n_buckets: int = 8,
    partition_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a corpus as a catalog-managed parquet table, bucketed on the
    join key (and optionally partitioned, e.g. by ``source`` for per-stratum
    pruning). Bucketing requires the catalog (``saveAsTable``) — pure-path
    parquet cannot record bucket metadata."""
    writer = docs.write.format("parquet").mode(mode)
    if partition_by:
        writer = writer.partitionBy(partition_by)
    if bucket_by:
        writer = writer.bucketBy(n_buckets, bucket_by).sortBy(bucket_by)
    writer.saveAsTable(table)


__all__ = ["DOCUMENT_SCHEMA", "read_documents", "write_corpus_table"]
