"""Deterministic corpus sharding — the training-data output stage.

Beyond-reference capability: a curated corpus is consumed by a data loader
that wants N same-sized shards with documents spread pseudo-randomly (a
"global shuffle" — adjacent source documents must not land in the same
shard, or training sees correlated batches). Doing this with ``rand()`` or
``repartition(N)`` alone is irreproducible: retries, speculative tasks, and
incremental re-runs each deal documents differently. The scale-stable answer
is the same trick as ``operators/sampling.py``: a *deterministic* hash of a
stable key decides the shard, so every re-run (and every engine — the DuckDB
oracle replays the assignment bit-for-bit) deals identically.

Scale notes:

* ``assign_shards`` is a narrow projection — no shuffle; the portable
  polynomial hash (``functions/hashing.py``) rides whole-stage codegen.
* ``write_training_shards`` shuffles once, keyed by the shard id, writing
  ``shard=K`` Hive partitions — a 100 TB corpus lands as one distributed
  write with each output partition independently retryable. Because the
  hash is uniform, shard sizes concentrate tightly around n/N (the suite
  query ``corpus_shard`` measures the spread).
* The salt constants are distinct from the sampling/MinHash families so
  shard assignment is independent of the sampling decision (sampling then
  sharding composes without correlation).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import affine_hash, poly_hash

#: Affine-family parameters for sharding (≠ sampling's 7919/104729 and the
#: MinHash families — independence across decision families).
SHARD_A = 12289
SHARD_B = 65537


def shard_id(key: Column, n_shards: int) -> Column:
    """Deterministic shard in [0, n_shards) from a stable key column."""
    return affine_hash(poly_hash(key.cast("string")), SHARD_A, SHARD_B) % F.lit(
        n_shards
    )


def assign_shards(
    df: DataFrame, n_shards: int, key_col: str = "doc_id"
) -> DataFrame:
    """Annotate every row with its deterministic ``shard`` id."""
    return df.withColumn("shard", shard_id(F.col(key_col), n_shards))


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    format: str = "parquet",
) -> DataFrame:
    """Write ``df`` as ``path/shard=K/`` partitions, one deterministic shard
    per document; returns the (shard, n_docs) manifest.

    One ``repartition`` keyed by shard co-locates each shard's rows before
    the partitioned write (one file per shard instead of
    tasks × shards fragments); the manifest is computed from the written
    data, so it reflects what a crash-free commit actually persisted.
    """
    sharded = assign_shards(df, n_shards, key_col=key_col)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(format)
        .save(path)
    )
    written = df.sparkSession.read.format(format).load(path)
    return written.groupBy("shard").agg(F.count(F.lit(1)).alias("n_docs"))


__all__ = ["SHARD_A", "SHARD_B", "assign_shards", "shard_id", "write_training_shards"]
