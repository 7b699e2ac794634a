"""Triangle counting (operators/triangles.py).

Closed-form fixtures (K4, star, cycle) pin the semantics; the messy-input
test pins canonicalization (duplicates, reversed direction, self-loops).
"""
import pytest
from pyspark.sql import functions as F

from etl_for_all_studies_spark.operators.triangles import (
    canonical_edges,
    enumerate_triangles,
    local_triangle_counts,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_k4_has_four_triangles_three_per_vertex(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    tri = enumerate_triangles(_edges(spark, k4))
    got = {(r.v_a, r.v_b, r.v_c) for r in tri.collect()}
    assert got == {(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)}
    local = {
        (r.vertex, r.n_triangles)
        for r in local_triangle_counts(_edges(spark, k4)).collect()
    }
    assert local == {(0, 3), (1, 3), (2, 3), (3, 3)}


def test_star_and_cycle_are_triangle_free(spark):
    star = [(0, i) for i in range(1, 8)]  # celebrity hub, no closures
    cycle = [(i, (i + 1) % 6) for i in range(6)]
    assert enumerate_triangles(_edges(spark, star)).count() == 0
    assert enumerate_triangles(_edges(spark, cycle)).count() == 0


def test_messy_input_canonicalized(spark):
    # duplicates, both directions, and self-loops must not change the count
    messy = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 2), (0, 1)]
    e = canonical_edges(_edges(spark, messy))
    assert {(r.src, r.dst) for r in e.collect()} == {(0, 1), (1, 2), (0, 2)}
    tri = enumerate_triangles(_edges(spark, messy))
    assert [(r.v_a, r.v_b, r.v_c) for r in tri.collect()] == [(0, 1, 2)]


def test_matches_naive_on_random_graph(spark):
    # deterministic pseudo-random graph; naive count = Σ over vertex triples
    import itertools
    import random

    rng = random.Random(42)
    rng_edges = sorted(
        rng.sample(
            [(a, b) for a in range(23) for b in range(23) if a < b], 90
        )
    )
    eset = set(rng_edges)
    naive = sum(
        1
        for a, b, c in itertools.combinations(range(23), 3)
        if (a, b) in eset and (a, c) in eset and (b, c) in eset
    )
    got = enumerate_triangles(_edges(spark, rng_edges)).count()
    assert got == naive and naive > 0
