"""Training-sequence shaping: contiguous token packing and text chunking.

Beyond-reference capability for LLM training-data pipelines: turn a corpus of
variable-length documents into fixed-token-budget training sequences.

Two operators:

* ``pack_contiguous`` — the concat-then-split packing used by most LLM data
  loaders: documents are laid end-to-end in a deterministic order and the
  token stream is cut every ``budget`` tokens. A document's pack assignment is
  ``floor(start_offset / budget)`` where ``start_offset`` is the running token
  count *before* the document — a pure window cumsum, fully associative, so
  Spark computes it with one partitioned window (group_col shuffle), map-side
  partial aggregation, and no Python. Documents may straddle a boundary (the
  loader splits them at read time); the operator records each doc's offset so
  the split point is recoverable.
* ``chunk_text`` — overlapping fixed-size character windows (RAG/pretraining
  context chunks): ``sequence``/``transform``/``posexplode`` over built-ins,
  a pure narrow map with no shuffle at all — each 100 TB shard chunks
  independently.

Scale notes:
* Packing windows partition by ``group_col`` (e.g. ``source``): no global
  sort. At 1000-executor scale, a skewed group salts into sub-groups first
  (``functions/skew.py``) and pack ids get a per-salt offset — same recipe as
  the dim-key assignment in ``operators/dims.py``.
* Chunking multiplies row count by ~len/stride; keep it *after* quality
  filtering and dedup so the explosion applies to kept docs only.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import poly_hash_combined


def pack_contiguous(
    df: DataFrame,
    token_col: str,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each row a ``pack_id`` (and its token ``pack_offset``) by laying
    rows end-to-end per ``group_col`` in ``order_col`` order and cutting every
    ``budget`` tokens."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn("pack_offset", offset.cast("long")).withColumn(
        "pack_id", F.floor(F.col("pack_offset") / F.lit(budget)).cast("long")
    )


def chunk_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 200,
    stride: int = 150,
) -> DataFrame:
    """Explode each document into overlapping character windows.

    Chunk ``i`` covers ``[1 + i*stride, 1 + i*stride + size)`` (1-based);
    windows start while the start position is within the text, so every
    character lands in ≥1 chunk and the final chunk may be short. Empty/NULL
    texts yield zero chunks. Output keeps a portable ``chunk_hash``
    (``functions/hashing.poly_hash_combined``, the injective ~2^60 two-pair
    key) so chunk-level dedup can run downstream without re-reading the
    text — an identity proxy, so it gets the same collision hardening as
    document fingerprints and span window keys (a sub-2^31 hash falsely
    merges distinct chunks from ~10^5 chunks up). Like ``fingerprint``,
    ``chunk_hash`` VALUES are not stable across engine versions (the
    round-6 rekey changed them): recompute on upgrade rather than
    comparing stored hashes across versions — the md5 exact-dedup digests
    are the stable cross-version identity.
    """
    text = F.col(text_col)
    n = F.length(text)
    starts = F.when(
        n > 0, F.sequence(F.lit(1), n, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(starts, lambda s: text.substr(s, F.lit(size)))
    exploded = docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    )
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.length("chunk_text").cast("long").alias("chunk_len"),
        poly_hash_combined(F.col("chunk_text")).alias("chunk_hash"),
        "chunk_text",
    )


__all__ = ["chunk_text", "pack_contiguous"]
