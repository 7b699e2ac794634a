"""PageRank: closed-form small graphs, dangling leak, determinism."""
from __future__ import annotations

import pytest

from etl_for_all_studies_spark.operators.graphrank import pagerank


def _edges(spark, rows, weighted=False):
    schema = "src long, dst long" + (", w double" if weighted else "")
    return spark.createDataFrame(rows, schema)


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_symmetric_cycle_is_uniform(spark):
    # 3-cycle both directions: perfectly symmetric → uniform 1/3 fixed point
    rows = [(a, b) for a, b in [(1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3)]]
    got = _ranks(pagerank(_edges(spark, rows), n_iter=10))
    for v in got.values():
        assert v == pytest.approx(1 / 3, abs=2e-6)


def test_star_center_dominates_and_matches_reference_iteration(spark):
    # undirected star 0–{1,2,3}: run the same quantized iteration in Python
    rows = [(0, i) for i in (1, 2, 3)] + [(i, 0) for i in (1, 2, 3)]
    got = _ranks(pagerank(_edges(spark, rows), n_iter=5))

    def q6(x):
        import math
        return math.floor(x * 1e6 + 0.5001) / 1e6

    ranks = {n: q6(1 / 4) for n in range(4)}
    for _ in range(5):
        new = {}
        for n in range(4):
            if n == 0:
                mass = sum(ranks[i] for i in (1, 2, 3))  # leaves send all to 0
            else:
                mass = ranks[0] / 3
            new[n] = q6(0.15 / 4 + 0.85 * mass)
        ranks = new
    assert got == ranks
    assert got[0] > got[1] == got[2] == got[3]


def test_dangling_node_leaks_but_keeps_teleport(spark):
    # 1 -> 2, 2 has no out-edges: 2 accumulates, its mass leaks each round,
    # and node 1 still holds exactly the teleport floor
    got = _ranks(pagerank(_edges(spark, [(1, 2)]), n_iter=8))
    assert got[1] == pytest.approx(0.15 / 2, abs=2e-6)
    assert got[2] > got[1]


def test_weighted_edges_shift_mass(spark):
    # 1 splits 90/10 between 2 and 3
    rows = [(1, 2, 9.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)]
    got = _ranks(pagerank(_edges(spark, rows, weighted=True), weight_col="w", n_iter=10))
    assert got[2] > got[3]


def test_deterministic_across_runs(spark):
    rows = [(i, (i * 7) % 23) for i in range(23)] + [(i, (i * 5) % 23) for i in range(23)]
    df = _edges(spark, [(a, b) for a, b in rows if a != b])
    assert _ranks(pagerank(df, n_iter=5)) == _ranks(pagerank(df, n_iter=5))
