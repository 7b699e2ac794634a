"""Pure-Python oracle for Spearman/p/BH — independent re-implementation of the
documented semantics (reference ``correlation.py:13-92`` fallback path), used
only to check the Spark plans in tests."""
from __future__ import annotations

import itertools
import math
from statistics import NormalDist


def rankdata_avg(values: list[float]) -> list[float]:
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and values[order[j]] == values[order[i]]:
            j += 1
        avg = (i + 1 + j) / 2.0  # mean of positions i+1..j
        for k in range(i, j):
            ranks[order[k]] = avg
        i = j
    return ranks


def pearson(x: list[float], y: list[float]) -> float:
    n = len(x)
    mx, my = sum(x) / n, sum(y) / n
    num = sum((a - mx) * (b - my) for a, b in zip(x, y))
    den = math.sqrt(sum((a - mx) ** 2 for a in x)) * math.sqrt(
        sum((b - my) ** 2 for b in y)
    )
    return math.nan if den == 0 else num / den


def spearman(x: list[float], y: list[float]) -> tuple[float, float]:
    rho = pearson(rankdata_avg(x), rankdata_avg(y))
    n = len(x)
    if math.isnan(rho):
        return math.nan, math.nan
    if n < 3:
        return rho, math.nan
    if abs(rho) >= 1.0:
        return max(min(rho, 1.0), -1.0), 0.0
    t = rho * math.sqrt((n - 2) / (1 - rho**2))
    p = 2 * (1 - NormalDist().cdf(abs(t)))
    return rho, min(max(p, 0.0), 1.0)


def benjamini_hochberg(p_values: list[float | None]) -> list[float | None]:
    valid = [i for i, p in enumerate(p_values) if p is not None and not math.isnan(p)]
    m = len(valid)
    out: list[float | None] = [None] * len(p_values)
    if not m:
        return out
    order = sorted(valid, key=lambda i: p_values[i])
    prev = 1.0
    for rank, idx in enumerate(reversed(order), start=1):
        raw = p_values[idx] * m / (m - rank + 1)
        prev = min(prev, raw)
        out[idx] = min(prev, 1.0)
    return out


def all_pairs(
    matrix: dict[int, dict[str, float]], min_samples: int = 2
) -> list[dict]:
    """Reference-faithful all-pairs computation over one study's matrix."""
    stats = []
    for a, b in itertools.combinations(sorted(matrix), 2):
        shared = sorted(matrix[a].keys() & matrix[b].keys())
        if len(shared) < min_samples:
            continue
        va = [matrix[a][s] for s in shared]
        vb = [matrix[b][s] for s in shared]
        if len(set(va)) < 2 or len(set(vb)) < 2:
            continue
        rho, p = spearman(va, vb)
        if math.isnan(rho):
            continue
        stats.append(
            {
                "gene_a_key": a,
                "gene_b_key": b,
                "n_samples": len(shared),
                "rho": rho,
                "p": None if math.isnan(p) else p,
            }
        )
    qs = benjamini_hochberg([s["p"] for s in stats])
    for s, q in zip(stats, qs):
        s["q"] = q
        s["p_stored"] = s["p"] if s["p"] is not None else 1.0
    return stats
