"""Streaming corpus ingestion: land arriving document shards in the
warehouse continuously, exactly once.

Production corpora arrive as a stream of files (crawl dumps, upstream
deliveries); re-running a batch loader over a growing directory either
re-reads everything or needs external bookkeeping. Structured Streaming's
file source + checkpointed file sink give exactly-once landing for free:
the source tracks seen files in the checkpoint, the sink commits output
files through its transaction log, and a crash/restart resumes from the
checkpoint without duplicating or losing shards.

The transform stage is any stateless projection — here the quality/text
annotators (``operators/quality.py``/``textops.py``), which run identically
in batch and streaming (parity pinned in ``test_streaming.py``). At 100 TB
the same topology runs with ``maxFilesPerTrigger`` tuned to cluster size;
the sink stays append-only parquet partitioned however downstream reads
prune best.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.corpus import DOCUMENT_SCHEMA
from .util import await_drain


def read_corpus_stream(
    spark: SparkSession, source_dir: str, *, fmt: str = "jsonl",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source document stream with the canonical corpus schema."""
    reader = (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
    )
    if fmt == "parquet":
        return reader.parquet(source_dir)
    if fmt in ("json", "jsonl"):
        return reader.json(source_dir)
    raise ValueError(f"unsupported streaming corpus format: {fmt!r}")


def stream_ingest_corpus(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    transform=None,
    await_seconds: float = 300.0,
) -> None:
    """Drain all currently-available shards into ``out_dir`` exactly once.

    ``transform`` is an optional stateless DataFrame→DataFrame stage (e.g.
    ``annotate_quality``). ``availableNow`` processes the backlog and stops —
    rerunning later picks up only NEW files (source progress lives in the
    checkpoint), making ingestion idempotent under restarts and crashes
    (the sink's ``_spark_metadata`` log is the commit protocol).
    """
    if transform is not None:
        docs_stream = transform(docs_stream)
    q = (
        docs_stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, await_seconds)


__all__ = ["read_corpus_stream", "stream_ingest_corpus"]
