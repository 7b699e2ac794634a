"""The correctness-window rotation rule, pinned in code (VERDICT r7 #5).

The driver snapshots the FIRST 50 registry entries each round and oracles
them; with a 126-entry registry that window is the only hard correctness
signal, so its composition is load-bearing. The standing rule:

    window = {never-driver-checked}
           ∪ {plans modified since their last check}   (suite.ROTATION_MODIFIED)
           ∪ {the oldest-checked remainder, oldest first}

``tools/last_checked.json`` is the committed record (regenerated per round
by ``tools/gen_last_checked.py`` from the CORRECTNESS_r*.json artifacts);
these tests assert the committed registry order against it, so a careless
reorder makes staleness loudly visible instead of silently invisible.
"""
from __future__ import annotations

import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent
WINDOW = 50


def _load():
    from etl_for_all_studies_spark import suite

    last = json.loads((REPO / "tools" / "last_checked.json").read_text())
    return suite, last


def test_last_checked_is_current():
    """The committed last_checked.json must match a regeneration from the
    CORRECTNESS artifacts *as of its own horizon*, and that horizon may
    trail the newest artifact by at most one round.

    The driver drops CORRECTNESS_r{N}.json AFTER the builder's last commit
    of round N, so at every judge checkpoint exactly one artifact newer
    than the committed horizon legitimately exists — tolerate it. A gap of
    two or more rounds means a round went by without the builder rerunning
    tools/gen_last_checked.py — fail loudly (VERDICT r8 #1)."""
    import tools.gen_last_checked as gen

    _, last = _load()
    horizon = max(last.values(), default=0)
    assert last == gen.build(cap=horizon), (
        "tools/last_checked.json disagrees with the artifacts at its own "
        "horizon — rerun tools/gen_last_checked.py"
    )
    newest = max(gen.artifact_rounds(), default=0)
    assert newest - horizon <= 1, (
        f"rotation bookkeeping missed a round: newest artifact r{newest} "
        f"vs committed horizon r{horizon} — rerun tools/gen_last_checked.py "
        "and re-rotate the registry window"
    )


def test_window_composition():
    """First-50 = never-checked ∪ ROTATION_MODIFIED ∪ oldest-checked fill."""
    suite, last = _load()
    reg = list(suite.QUERY_REGISTRY)
    assert len(reg) == len(set(reg))
    window = reg[:WINDOW]
    modified = set(suite.ROTATION_MODIFIED)
    assert modified <= set(reg)
    assert modified <= set(window), "modified plans must sit in the window"
    # fill: the oldest-checked non-modified queries, by (round, prior order)
    fill = sorted(
        (q for q in reg if q not in modified),
        key=lambda q: (last.get(q, 0), reg.index(q)),
    )[: WINDOW - len(modified)]
    assert set(window) == modified | set(fill), (
        "window must be ROTATION_MODIFIED + the oldest-checked remainder; "
        f"missing={sorted((modified | set(fill)) - set(window))} "
        f"extra={sorted(set(window) - modified - set(fill))}"
    )


def test_stale_cohort_leads_oldest_first():
    """Within the window's non-modified entries, older checks come first
    (round-monotone), so a partial driver run still hits the stalest."""
    suite, last = _load()
    reg = list(suite.QUERY_REGISTRY)
    rounds = [
        last.get(q, 0)
        for q in reg[:WINDOW]
        if q not in set(suite.ROTATION_MODIFIED)
    ]
    assert rounds == sorted(rounds), (
        "stale window entries must be ordered oldest-checked-first"
    )
