"""Shared drain-await for availableNow streaming entry points.

``StreamingQuery.awaitTermination(timeout)`` returns ``False`` when the
deadline passes with the query still running; every drain entry point here
used to ignore that, so a backlog outlasting the deadline returned with
the query mid-batch — callers then read partial state and process exit
killed the in-flight fold (ADVICE r8, found on ``stream_curate_corpus``
and latent at every other ``availableNow`` site). This helper makes the
contract uniform: unbounded wait by default (``availableNow`` guarantees
termination, so a healthy drain cannot hang), and a bounded wait that
expires STOPS the query and raises — never a silently truncated drain.
The batch-keyed/checkpointed layouts every caller writes make the abort
safe: the next run redelivers the interrupted batch.
"""
from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery


def await_drain(q: StreamingQuery, await_seconds: float | None = None) -> None:
    """Block until the drain terminates; bounded waits fail loudly."""
    if await_seconds is None:
        q.awaitTermination()
        return
    if not q.awaitTermination(await_seconds):
        q.stop()
        raise TimeoutError(
            f"streaming drain exceeded {await_seconds}s and was stopped "
            "mid-backlog; committed state is consistent — rerun to resume "
            "from the checkpoint"
        )


__all__ = ["await_drain"]
