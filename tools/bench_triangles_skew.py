#!/usr/bin/env python
"""Celebrity-vertex triangle-counting scale probe (VERDICT r9 next #4).

The suite's `triangle_parts` runs on a mod-4-sliced co-order graph with no
extreme hub; the O(m^1.5) skew claim (degree ordering bounds wedge volume
regardless of degree skew) had no forced probe behind it the way CC and
PageRank do. This probe builds a synthetic graph with ONE celebrity vertex
adjacent to EVERY other vertex — the adversarial shape for naive wedge
enumeration — at 1x/10x/100x edges and verifies:

* NAIVE wedge volume (Σ deg·(deg−1)/2, what a shared-endpoint self-join
  without orientation would generate) grows with n² — the celebrity alone
  contributes n·(n−1)/2 wedges;
* ORIENTED wedge volume stays ~m·avg_outdeg: the celebrity has the maximum
  degree, so every incident edge orients INTO it and its root wedge count
  is ZERO — the quadratic term is deleted by construction, not by AQE luck;
* correctness has a closed form: every random edge (u, v) among the
  celebrity's neighbors closes a triangle (u, v, celebrity), so triangles
  touching the celebrity == |distinct canonical random edges|; the 1x total
  is also cross-checked against a naive 3-way closing-edge enumeration.

Graph: vertices 0..n−1 plus celebrity n; m_rand pseudo-random edges from
xxhash64 over a range (deterministic, no driver loops, built distributed)
plus the n celebrity edges.

Usage: python tools/bench_triangles_skew.py [mult ...]   (default: 1 10 100)
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

N_BASE = 20_000
M_RAND_BASE = 100_000


def build_graph(spark, n: int, m_rand: int):
    from pyspark.sql import functions as F

    rnd = (
        spark.range(m_rand)
        .select(
            (F.abs(F.xxhash64(F.col("id") * 2 + 1)) % n).alias("src"),
            (F.abs(F.xxhash64(F.col("id") * 2 + 2)) % n).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    celeb = spark.range(n).select(
        F.col("id").alias("src"), F.lit(n).cast("long").alias("dst")
    )
    return rnd.unionByName(celeb), rnd


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 100]

    from pyspark.sql import functions as F

    from etl_for_all_studies_spark.operators.triangles import (
        _oriented,
        canonical_edges,
        local_triangle_counts,
    )
    from etl_for_all_studies_spark.session import get_spark

    spark = get_spark(
        app_name="bench-triangles-skew",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )

    results = []
    for mult in mults:
        n, m_rand = N_BASE * mult, M_RAND_BASE * mult
        edges, rnd = build_graph(spark, n, m_rand)

        e = canonical_edges(edges).persist()
        m = e.count()
        rnd_canon = canonical_edges(rnd).persist()
        n_rnd = rnd_canon.count()

        deg = (
            e.select(F.col("src").alias("v"))
            .unionAll(e.select(F.col("dst").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        naive_wedges, max_deg = deg.select(
            F.sum(F.col("deg") * (F.col("deg") - 1) / 2), F.max("deg")
        ).collect()[0]
        o = _oriented(e).persist()
        outdeg = o.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        oriented_wedges, max_outdeg, celeb_outdeg = (
            outdeg.agg(
                F.sum(F.col("d") * (F.col("d") - 1) / 2),
                F.max("d"),
                F.max(F.when(F.col("u") == n, F.col("d"))),
            ).collect()[0]
        )

        t0 = time.time()
        counts = local_triangle_counts(edges).persist()
        total = counts.agg(F.sum("n_triangles")).collect()[0][0] or 0
        wall = time.time() - t0
        n_tri = total // 3

        # closed form: triangles touching the celebrity == distinct random
        # edges among its neighbors (it neighbors EVERY base vertex)
        celeb_tri = (
            counts.where(F.col("vertex") == n).select("n_triangles").collect()
        )
        celeb_tri = celeb_tri[0][0] if celeb_tri else 0
        assert celeb_tri == n_rnd, (celeb_tri, n_rnd)

        if mult == mults[0]:
            # naive 3-way closing-edge enumeration cross-check at 1x
            a, b, c = e.alias("a"), e.alias("b"), e.alias("c")
            naive_total = (
                a.join(
                    b,
                    (F.col("b.src") == F.col("a.src"))
                    & (F.col("a.dst") < F.col("b.dst")),
                )
                .join(
                    c,
                    (F.col("c.src") == F.col("a.dst"))
                    & (F.col("c.dst") == F.col("b.dst")),
                )
                .count()
            )
            assert naive_total == n_tri, (naive_total, n_tri)

        row = {
            "mult": mult,
            "n": n,
            "m": m,
            "max_deg": int(max_deg),
            "naive_wedges": int(naive_wedges),
            "oriented_wedges": int(oriented_wedges),
            "max_outdeg": int(max_outdeg),
            "celebrity_outdeg": int(celeb_outdeg or 0),
            "m_pow_1_5": int(m**1.5),
            "triangles": int(n_tri),
            "celebrity_triangles": int(celeb_tri),
            "wall_sec": round(wall, 1),
        }
        results.append(row)
        print(json.dumps(row))
        for df in (e, rnd_canon, o, counts):
            df.unpersist()
        spark.catalog.clearCache()

    print(json.dumps({"series": results}))


if __name__ == "__main__":
    main()
