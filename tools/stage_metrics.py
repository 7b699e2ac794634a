"""Spark-UI REST snapshots of stage execution metrics for the scale probes.

The scale-up probes need more than wall clock: the composed-plan contract
("no stage's lineage executes twice" — the CacheScope barrier discipline,
``caching.py``) and the shuffle-growth contract (span dedup's one
window-hash-keyed exchange) are statements about EXECUTED STAGES and
SHUFFLE BYTES, not seconds. The driver-local UI REST API
(``/api/v1/applications/<id>/stages``) exposes exactly those per stage, so
a probe snapshots before/after each measured run and diffs:

* ``executed`` — stages that actually ran (``COMPLETE``). A persist
  barrier doing its job turns downstream re-references into SKIPPED
  stages; a broken barrier shows up as extra executed stages whose names
  repeat.
* ``skipped`` — stages Spark elided because their output was already
  available (shuffle files or cached blocks). High skip counts are the
  cache contract WORKING.
* ``input_bytes`` / ``shuffle_read`` / ``shuffle_write`` — summed over the
  newly executed stages. ``input_bytes / on-disk corpus bytes`` is the
  scan-amplification number: it must stay flat as the corpus scales, or a
  recompute is hiding in the growth.

Probes must build their session with ``spark.ui.enabled=true`` (the bench
harness disables it; the probes re-enable it deliberately).
"""
from __future__ import annotations

import json
import urllib.request


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as resp:
        return json.load(resp)


def stage_snapshot(port: int = 4040) -> dict[tuple[int, int], dict]:
    """All stage attempts the UI knows, keyed by (stageId, attemptId)."""
    base = f"http://localhost:{port}/api/v1"
    app_id = _get(f"{base}/applications")[0]["id"]
    stages = _get(f"{base}/applications/{app_id}/stages?details=false")
    return {(s["stageId"], s["attemptId"]): s for s in stages}


def diff_stages(
    before: dict[tuple[int, int], dict], after: dict[tuple[int, int], dict]
) -> dict:
    """Summarize the stages that appeared (or finished) between snapshots."""
    new = [s for k, s in after.items() if k not in before]
    executed = [s for s in new if s["status"] == "COMPLETE"]
    skipped = [s for s in new if s["status"] == "SKIPPED"]
    return {
        "executed": len(executed),
        "skipped": len(skipped),
        "input_bytes": sum(s.get("inputBytes", 0) for s in executed),
        "shuffle_read": sum(s.get("shuffleReadBytes", 0) for s in executed),
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in executed),
        # name multiset of executed stages: scale-invariant for a fixed plan;
        # a name appearing MORE often at 10x than 1x is a recompute signature
        "names": sorted(s["name"].split(" at ")[0] for s in executed),
    }


def fmt_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024:
            return f"{n:.1f}{unit}"
        n /= 1024
    return f"{n:.1f}TiB"
