"""Streaming CDC apply: maintain a warehouse table from a changelog stream.

The batch operator (``operators/diff.py::apply_changelog``) merges one
changelog against one snapshot; production change-data-capture is a
*stream* of such batches. ``foreachBatch`` is the Structured Streaming
bridge: each micro-batch of changes is merged against the current table
state and committed as a new table version, with the streaming checkpoint
carrying source progress.

Crash-safety without a table format: versioned snapshot directories plus a
last-written pointer file (``_VERSION``). A commit writes ``v=<batch_id>/``
first and flips the pointer second (atomic rename); readers resolve the
pointer, so a crash mid-write leaves the previous version live. Replays
(crash between pointer flip and checkpoint commit) are detected by the
pointer plus a per-version content fingerprint: a batch whose id the live
pointer already reached AND whose digest matches the committed one is
durably applied and is skipped outright — re-merging would lazily read
``v=<batch_id>`` while overwriting that same directory, which Spark
forbids. An id match with a digest MISMATCH is a lost checkpoint whose
restarted batch 0 picked up new source files — skipping would drop those
rows forever, so the apply raises instead. Migration: versions committed
before fingerprinting existed have no digest to compare — an id match
against such a legacy version warns and skips (the legacy contract),
and the table becomes strictly guarded from its next commit on. For a crash BEFORE the flip
the previous version is still live and the merge replays cleanly by
algebra: changelog rows carry absolute values, so
``apply(apply(S, C), C) = apply(S, C)``.

Scale notes: each micro-batch pays ONE full-outer join of (current state ⋈
batch-winners) — the batch side is reduced to one winner per key before the
join, map-side combined. Full-snapshot rewrite per batch is the simple
contract at warehouse-dim scale (the reference's own dims are snapshot-
replaced the same way, `/root/reference/src/etl_for_all_studies/database.py`
write path); fact-scale CDC would partition the state and overwrite only
touched partitions exactly like ``sources/warehouse.py``'s fact path.
"""
from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.diff import apply_changelog
from .util import await_drain

_VERSION_FILE = "_VERSION"
_FINGERPRINT_FILE = "_FINGERPRINT"


def _live_version(table_dir: str) -> int | None:
    """Committed version id from the pointer file, or None pre-commit."""
    pointer = os.path.join(table_dir, _VERSION_FILE)
    if not os.path.exists(pointer):
        return None
    with open(pointer) as fh:
        return int(fh.read().strip())


def read_table_state(
    spark: SparkSession, table_dir: str
) -> DataFrame | None:
    """Current committed snapshot, or None before the first commit."""
    version = _live_version(table_dir)
    if version is None:
        return None
    return spark.read.parquet(os.path.join(table_dir, f"v={version}"))


def _batch_fingerprint(batch_df: DataFrame) -> str:
    """Order-independent content digest of a micro-batch: row count, XOR of
    per-row xxhash64, and a bounded hash sum (the sum term keeps even-count
    repeated rows — which XOR alone cancels — in the digest). One map-side-
    combinable aggregation over the batch; used to tell a byte-identical
    crash-window replay apart from a checkpoint-loss redelivery that picked
    up NEW source files under the same batch id."""
    h = F.xxhash64(*batch_df.columns)
    row = batch_df.select(
        F.count(F.lit(1)).alias("c"),
        F.bit_xor(h).alias("x"),
        F.sum(F.pmod(h, F.lit(2**32))).alias("s"),  # < 2^63 for < 2^31 rows
    ).collect()[0]
    x = (row["x"] or 0) & 0xFFFFFFFFFFFFFFFF
    return f"{row['c']}:{x:016x}:{row['s'] or 0}"


def _live_fingerprint(table_dir: str, version: int) -> str | None:
    path = os.path.join(table_dir, f"v={version}", _FINGERPRINT_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return fh.read().strip()


def _commit_state(
    state: DataFrame, table_dir: str, batch_id: int, fingerprint: str
) -> None:
    out = os.path.join(table_dir, f"v={batch_id}")
    state.write.mode("overwrite").parquet(out)
    # the applied batch's digest rides inside the snapshot dir (written
    # AFTER the overwrite, BEFORE the flip — underscore-prefixed, so the
    # parquet reader ignores it); a version is live only with both in place
    with open(os.path.join(out, _FINGERPRINT_FILE), "w") as fh:
        fh.write(fingerprint)
    tmp = os.path.join(table_dir, f".{_VERSION_FILE}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(batch_id))
    os.replace(tmp, os.path.join(table_dir, _VERSION_FILE))  # atomic flip


def stream_apply_changelog(
    changes_stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    *,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
    await_seconds: float = 300.0,
) -> None:
    """Drain the available changelog into ``table_dir``, one committed
    snapshot version per micro-batch (``availableNow`` — rerun later to
    pick up only new changes; the checkpoint tracks source progress)."""
    os.makedirs(table_dir, exist_ok=True)
    value_cols = [
        c for c in changes_stream.columns if c not in (op_col, seq_col)
    ]

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # Replay guard for the crash window between the _VERSION flip and
        # the streaming-checkpoint commit: if the live pointer EQUALS
        # batch_id, v=<batch_id> was FULLY written (the pointer flips only
        # after a successful snapshot write). But equality of ids alone
        # does NOT prove the replay is the same batch: when the checkpoint
        # is lost after exactly one committed batch, ids restart at 0 and
        # the redelivered batch 0 may carry NEW source files — skipping
        # would drop them forever while the fresh checkpoint marks the
        # files processed. So the skip is gated on the CONTENT fingerprint
        # persisted with the snapshot: match → durably-applied replay,
        # skip (re-merging would lazily read v=<batch_id> while
        # overwriting the directory being read, which Spark forbids);
        # mismatch → fail loudly, same as below. MISSING digest →
        # pre-upgrade table (versions committed before the fingerprint
        # file existed): the legacy contract was skip-on-id-match, so a
        # hard error here would break every in-flight upgrade on its
        # first crash-window replay. Warn-and-skip preserves the legacy
        # behavior for exactly one replay — the skip leaves the table
        # untouched at v=<batch_id>, and every commit made by THIS code
        # writes the digest, so the strict gate takes over from the next
        # batch on. (The residual risk is the legacy one: a checkpoint
        # lost after exactly one pre-upgrade batch is indistinguishable
        # from a replay — which is why the message is operator-visible.)
        # live > batch_id is never that window: a replayed low-id batch
        # against a further-along table is always a checkpoint/table
        # mismatch only an operator can resolve.
        live = _live_version(table_dir)
        if live is not None and live == batch_id:
            committed = _live_fingerprint(table_dir, live)
            if committed is None:
                logging.getLogger(__name__).warning(
                    "changelog table %r version %d predates content "
                    "fingerprinting (no _FINGERPRINT file) — treating the "
                    "redelivered batch %d as a durably-applied replay and "
                    "skipping it, per the pre-upgrade contract. If the "
                    "streaming checkpoint was lost (not a crash-window "
                    "replay), this batch's NEW rows are dropped: rebuild "
                    "the table from a fresh checkpoint + full changelog. "
                    "Subsequent commits are fingerprinted and verified.",
                    table_dir,
                    live,
                    batch_id,
                )
                return
            if committed == _batch_fingerprint(batch_df):
                return
            raise RuntimeError(
                f"changelog checkpoint/table mismatch: table {table_dir!r} "
                f"already committed batch {batch_id}, but the redelivered "
                "batch's content fingerprint differs — the streaming "
                "checkpoint was lost and the source has accumulated new "
                "files since. Restore the matching checkpoint, or rebuild "
                "the table from a fresh checkpoint + full changelog."
            )
        if live is not None and live > batch_id:
            raise RuntimeError(
                f"changelog checkpoint/table mismatch: table {table_dir!r} is "
                f"at version {live} but the stream delivered batch "
                f"{batch_id} — the streaming checkpoint was lost or points "
                "at a different table. Restore the matching checkpoint, or "
                "rebuild the table from a fresh checkpoint+full changelog."
            )
        base = read_table_state(spark, table_dir)
        if base is None:
            base = batch_df.select(*value_cols).limit(0)
        state = apply_changelog(
            base, batch_df, keys, op_col=op_col, seq_col=seq_col
        )
        _commit_state(state, table_dir, batch_id, _batch_fingerprint(batch_df))

    q = (
        changes_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, await_seconds)


def vacuum_table(table_dir: str, *, keep_last: int = 2) -> list[str]:
    """Remove snapshot versions older than the ``keep_last`` most recent,
    never touching the live version — the retention pass that keeps the
    versioned-commit layout from growing without bound.

    Safety order mirrors the commit protocol in reverse: the pointer is
    read FIRST, the live version (and the newest ``keep_last − 1`` others)
    are exempted, and only then are older ``v=*`` directories deleted —
    a concurrent reader resolving the pointer can never observe its
    version vanish. Returns the deleted version ids (for the audit log).
    """
    import shutil

    pointer = os.path.join(table_dir, _VERSION_FILE)
    if not os.path.exists(pointer):
        return []
    with open(pointer) as fh:
        live = fh.read().strip()
    versions = sorted(
        (
            d[len("v="):]
            for d in os.listdir(table_dir)
            if d.startswith("v=") and os.path.isdir(os.path.join(table_dir, d))
        ),
        key=int,
    )
    keep = set(versions[-keep_last:]) | {live}
    deleted = []
    for v in versions:
        if v not in keep:
            shutil.rmtree(os.path.join(table_dir, f"v={v}"))
            deleted.append(v)
    return deleted


__all__ = ["read_table_state", "stream_apply_changelog", "vacuum_table"]
