"""Regenerate ``tools/last_checked.json`` from the CORRECTNESS_r*.json
artifacts — the committed record of each registry query's most recent
driver oracle check.

The first-50 snapshot window the driver checks per round must lead with
(1) never-checked entries, (2) plans modified since their last check
(declared in ``suite.ROTATION_MODIFIED``), then (3) oldest-checked-first.
``tests/test_registry_rotation.py`` asserts the committed registry order
against this file, so the rule is code, not a comment. Run this at the
START of a round (after the driver drops the previous round's
CORRECTNESS file) and commit the result together with the re-rotation.

``build(cap=N)`` regenerates as of round N, ignoring newer artifacts —
the staleness test uses this so the driver dropping CORRECTNESS_r{N+1}
AFTER the builder's commit doesn't spuriously redden the suite, while a
builder who skips a round's regeneration still fails it.

Usage: python tools/gen_last_checked.py
"""
from __future__ import annotations

import glob
import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent


def artifact_rounds() -> list[int]:
    """Round numbers of every CORRECTNESS_r*.json present, ascending."""
    return sorted(
        int(pathlib.Path(f).stem.split("_r")[1])
        for f in glob.glob(str(REPO / "CORRECTNESS_r*.json"))
    )


def build(cap: int | None = None) -> dict[str, int]:
    """Latest-check round per query, from artifacts with round <= cap."""
    last: dict[str, int] = {}
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        rnd = int(pathlib.Path(f).stem.split("_r")[1])
        if cap is not None and rnd > cap:
            continue
        for name in json.load(open(f)):
            last[name] = max(last.get(name, 0), rnd)
    return dict(sorted(last.items()))


def main() -> None:
    out = REPO / "tools" / "last_checked.json"
    out.write_text(json.dumps(build(), indent=1) + "\n")
    print(f"wrote {out} ({len(build())} queries)")


if __name__ == "__main__":
    main()
