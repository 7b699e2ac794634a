"""Streaming incremental curation: fold arriving document shards into a
curated corpus continuously, idempotently, without re-curating history.

``streaming/corpus.py`` lands shards verbatim (stateless transforms only);
``plans/incremental_curation.py`` folds ONE batch against the accumulated
corpus. This module is their composition as a continuously-runnable
pipeline: a file-source document stream drives ``curate_batch`` per
micro-batch via ``foreachBatch``, with the kept corpus and the accrued
window-hash table as the cross-batch state. Steady-state training-data
ingestion at 100 TB is exactly this shape — crawl batches arrive forever,
and each must be quality-filtered, decontaminated, near-dup'd against
everything already admitted, and span-trimmed against every passage ever
kept, at a per-batch cost governed by the batch (the 100x-history probe:
4.9x per-batch wall for 100x history — ``SCALE.md`` round 8).

Exactly-once layout. ``foreachBatch`` side effects are at-least-once: a
crash after a partial write replays the same ``batch_id``. Every write
here is therefore keyed by the batch id —

    corpus_dir/admitted/batch_id=N/        the admitted (possibly trimmed) docs
    corpus_dir/window_hashes/batch_id=N/   the batch's hash accrual (trim mode)
    corpus_dir/audit/batch_id=N/           one row of drop accounting

— and a replay OVERWRITES its own partition with a bit-identical result
(``curate_batch`` is deterministic; the plan docstring pins it). The one
sharp edge is self-seen corruption: a replayed batch whose partial output
already sits in ``admitted/batch_id=N`` must NOT see those rows as "seen"
— the vs-seen dedup would drop the entire batch and commit an EMPTY
partition, losing the data. ``_seen_paths`` therefore assembles the seen
corpus from every partition EXCEPT the current batch's own
(``test_stream_curate_crash_replay_is_idempotent`` pins this).

Doc ids must be globally unique across all shards ever streamed (the
``curate_batch`` warehouse contract, extended stream-wide); the admitted
corpus keeps the input document schema so batches with and without the
trim stage append reader-consistently.
"""
from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession

from ..caching import CacheScope
from ..operators.quality import QualityRules
from ..plans.incremental_curation import curate_batch

# batch_id is NOT a data column: the audit partition path (batch_id=N)
# carries it, and duplicating it in-data makes every read warn
# COLUMN_ALREADY_EXISTS; readers get batch_id back via partition discovery
AUDIT_SCHEMA = (
    "n_batch BIGINT, n_admitted BIGINT, "
    "n_dropped_vs_seen BIGINT, n_contaminated BIGINT, n_trimmed_spans BIGINT"
)


def _partition_paths(root: str, exclude_batch_id: int) -> list[str]:
    """Committed ``batch_id=*`` partition dirs under ``root``, excluding the
    current batch's own (a crash replay must not see its partial output)."""
    base = pathlib.Path(root)
    if not base.is_dir():
        return []
    return sorted(
        str(p)
        for p in base.iterdir()
        if p.is_dir()
        and p.name.startswith("batch_id=")
        and p.name != f"batch_id={exclude_batch_id}"
    )


def fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    corpus_dir: str,
    *,
    rules: QualityRules | None = None,
    eval_docs: DataFrame | None = None,
    minhash_bands: int = 2,
    verify_threshold: float = 0.5,
    trim_spans_w: int | None = None,
) -> None:
    """One micro-batch fold: curate ``batch_df`` against every PREVIOUS
    batch's admitted docs/hashes, then overwrite this batch's own
    partitions. Deterministic + self-partition-keyed = replay-idempotent.
    """
    spark = batch_df.sparkSession
    admitted_dir = f"{corpus_dir}/admitted"
    hashes_dir = f"{corpus_dir}/window_hashes"

    seen_paths = _partition_paths(admitted_dir, batch_id)
    seen_docs = (
        spark.read.parquet(*seen_paths) if seen_paths else batch_df.limit(0)
    )
    seen_hashes = None
    if trim_spans_w is not None:
        hash_paths = _partition_paths(hashes_dir, batch_id)
        if hash_paths:
            seen_hashes = spark.read.parquet(*hash_paths)

    with CacheScope() as scope:
        res = curate_batch(
            batch_df,
            seen_docs,
            rules=rules,
            eval_docs=eval_docs,
            minhash_bands=minhash_bands,
            verify_threshold=verify_threshold,
            trim_spans_w=trim_spans_w,
            seen_window_hashes=seen_hashes,
            scope=scope,
        )
        # admitted first (the corpus IS the state the next batch dedups
        # against), hashes second, audit row last as the batch's commit
        # marker — a crash between any two leaves a replay that rebuilds
        # all three bit-identically from the same inputs
        res.admitted.write.mode("overwrite").parquet(
            f"{admitted_dir}/batch_id={batch_id}"
        )
        if res.new_window_hashes is not None:
            res.new_window_hashes.write.mode("overwrite").parquet(
                f"{hashes_dir}/batch_id={batch_id}"
            )
        audit = [
            (
                batch_df.count(),
                res.admitted.count(),
                res.dropped_vs_seen.count(),
                res.contaminated.count() if res.contaminated is not None else 0,
                res.trimmed_spans.count() if res.trimmed_spans is not None else 0,
            )
        ]
    spark.createDataFrame(audit, AUDIT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{corpus_dir}/audit/batch_id={batch_id}")


def stream_curate_corpus(
    docs_stream: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    *,
    rules: QualityRules | None = None,
    eval_docs: DataFrame | None = None,
    minhash_bands: int = 2,
    verify_threshold: float = 0.5,
    trim_spans_w: int | None = None,
    await_seconds: float = 600.0,
) -> None:
    """Drain all currently-available shards through the incremental
    curation plan, exactly once.

    ``availableNow`` processes the backlog and stops; rerunning later picks
    up only NEW files (source progress lives in the checkpoint), and a
    replayed crash-window batch overwrites its own partitions with the
    identical result (see module docstring). ``eval_docs`` is a static
    frame read once by the caller — the decontamination probe broadcasts
    it per batch.
    """

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(
            batch_df,
            batch_id,
            corpus_dir,
            rules=rules,
            eval_docs=eval_docs,
            minhash_bands=minhash_bands,
            verify_threshold=verify_threshold,
            trim_spans_w=trim_spans_w,
        )

    q = (
        docs_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(await_seconds)


def read_curated_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """The admitted corpus across all committed batches (partition column
    ``batch_id`` dropped — consumers see the document schema)."""
    return spark.read.parquet(f"{corpus_dir}/admitted").drop("batch_id")


def read_accrued_hashes(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """The corpus-wide distinct window-hash table (trim mode's cross-batch
    state), deduplicated across batch accruals."""
    return (
        spark.read.parquet(f"{corpus_dir}/window_hashes")
        .select("h")
        .distinct()
    )


__all__ = [
    "fold_batch",
    "stream_curate_corpus",
    "read_curated_corpus",
    "read_accrued_hashes",
]
