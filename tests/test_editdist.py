"""PassJoin edit-distance near-dup join: planted cases + exhaustive property
sweep against a Python brute force (the operator is an *exact* join, so any
divergence from brute force is a bug, not a recall trade-off)."""
from __future__ import annotations

import random

import pytest

from etl_for_all_studies_spark.operators.editdist import (
    editdist_candidates,
    editdist_near_pairs,
)


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows: list[tuple[int, str]], d: int) -> set[tuple[int, int, int]]:
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, ta), (ib, tb) = rows[i], rows[j]
            if abs(len(ta) - len(tb)) <= d:
                dist = _levenshtein(ta, tb)
                if dist <= d:
                    a, b = min(ia, ib), max(ia, ib)
                    out.add((a, b, dist))
    return out


def _run(spark, rows: list[tuple[int, str]], d: int) -> set[tuple[int, int, int]]:
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in editdist_near_pairs(df, max_dist=d).collect()
    }


def test_planted_edits_found(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base.replace("quick", "quack")),          # dist 2 (substitutions)
        (3, base + " ok"),                            # dist 3 (insertions)
        (4, "completely unrelated text about spark"),  # far from all
        (5, base[8:]),                                # 8 deletions > d
    ]
    got = _run(spark, rows, d=4)
    assert (1, 2, _levenshtein(rows[0][1], rows[1][1])) in got
    assert (1, 3, 3) in got
    assert got == _brute(rows, 4)


def test_tiny_string_bucket_path(spark):
    """Strings shorter than d+1 chars cannot be segment-split; the coarse
    length-bucket block must still find their pairs."""
    rows = [
        (1, "ab"), (2, "ac"), (3, "abcd"), (4, ""), (5, "a"),
        (6, "abcdefgh"),  # len 8 = 2d (tiny-adjacent), pairs with 3 at dist 4
        (7, "zzzzzzzzzzzzzzzz"),
    ]
    got = _run(spark, rows, d=4)
    assert got == _brute(rows, 4)
    assert (1, 2, 1) in got and (4, 5, 1) in got and (3, 6, 4) in got


@pytest.mark.parametrize("d", [1, 2, 4])
def test_property_sweep_matches_brute_force(spark, d):
    """Randomized corpus mixing tiny, short, and mid-length strings over a
    small alphabet (maximizes collisions and boundary pairs)."""
    rng = random.Random(42 + d)
    alphabet = "abc "
    rows = []
    for i in range(120):
        n = rng.choice([0, 1, 3, d, d + 1, 2 * d + 1, 2 * d + 2, 15, 30])
        rows.append((i, "".join(rng.choice(alphabet) for _ in range(n))))
    # plant a few explicit near-pairs at varying lengths
    for j, src in enumerate((5, 50, 100)):
        text = rows[src][1]
        mutated = text + "x" * min(d, 2)
        rows.append((200 + j, mutated))
    got = _run(spark, rows, d=d)
    assert got == _brute(rows, d)


def test_candidates_are_superset(spark):
    rng = random.Random(7)
    rows = [
        (i, "".join(rng.choice("ab") for _ in range(rng.randint(0, 20))))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in editdist_candidates(df, max_dist=2).collect()
    }
    true_pairs = {(a, b) for a, b, _ in _brute(rows, 2)}
    assert true_pairs <= cands
