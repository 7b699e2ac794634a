"""Shared plan-text lint helpers for the scale-shape tests."""
import re


def unpartitioned_windows(plan: str) -> list[str]:
    """Window nodes with an ORDER clause but NO partition clause — the
    single-task "Moving all data to a single partition" shape. Node text is
    ``Window [exprs], [part], [order]``; when one clause is omitted only two
    groups print, and an order-spec group is recognizable by its ASC/DESC
    tokens (a partition-only aggregate window legitimately has two groups
    and none). NB: a ``partitionBy(lit(0))`` guard is constant-folded away
    by Catalyst, so this detector sees through that false comfort too."""
    hits = []
    for line in plan.splitlines():
        m = re.search(r"\bWindow (\[.*)$", line)
        if not m or "windowspecdefinition" not in line:
            continue
        groups = m.group(1).split("], [")
        if len(groups) < 3 and re.search(r" (ASC|DESC)", groups[-1]):
            hits.append(line.strip()[:200])
    return hits
