#!/usr/bin/env python
"""Prefix-join scale probe: candidate volume vs the Σdf² co-occurrence join
on a Zipf-vocabulary corpus (natural-text shape), across corpus scale.

The suite's synthetic `documents` table has a tiny shingle vocabulary —
adversarial for prefix filtering (every prefix shingle is hot). Natural text
is Zipf: most shingles are rare, so df-ascending prefixes are nearly-unique
and the candidate join is ~linear. This probe measures that claim instead of
asserting it:

  corpus = N docs of ~60 Zipf-sampled words (vocab 30k, s=1.07, per-doc
  seed), plus 5% near-clone pairs (one word substituted) — the realistic
  near-dup regime. For scale in {1x, 4x, 16x}:
    - Σdf² over 9-gram shingles  (the co-occurrence join's row volume)
    - prefix-join candidate count at t=0.9 (its join's pair volume)
    - wall: jaccard_prefix_pairs end-to-end
    - found pairs (must equal the planted clone count: recall check)

Usage: python tools/bench_prefixjoin.py [n_docs_base] [scales...]
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    scales = [int(s) for s in sys.argv[2:]] or [1, 4, 16]

    from pyspark.sql import functions as F

    from etl_for_all_studies_spark.operators.prefixjoin import (
        jaccard_prefix_pairs,
        prefix_candidates,
    )
    from etl_for_all_studies_spark.session import get_spark

    spark = get_spark(
        app_name="bench_prefixjoin",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )

    def zipf_corpus(n_docs: int):
        """Deterministic Zipf-ish corpus, built distributed (no driver data).

        word(r) for rank r in [0, V): 'w' + base26(r). Each doc draws 60
        words whose ranks follow ~ u^(3.5) over V=30000 (heavy head, long
        tail; exponent tuned so dfs are Zipf-shaped). Docs [0, 5%) get a
        near-clone partner: doc i+n_docs with one word changed.
        """
        base = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(60)),
                    lambda i: F.concat(
                        F.lit("w"),
                        F.conv(
                            F.floor(
                                F.pow(
                                    F.abs(
                                        F.hash(
                                            F.col("id") * 1000 + i
                                        ).cast("double")
                                    )
                                    / F.lit(2147483647.0),
                                    F.lit(3.5),
                                )
                                * 30000
                            ).cast("string"),
                            10,
                            26,
                        ),
                    ),
                ),
            ).alias("text"),
        )
        n_clones = max(1, n_docs // 20)
        clones = base.where(F.col("doc_id") < n_clones).select(
            (F.col("doc_id") + n_docs).alias("doc_id"),
            # substitute the first word → Jaccard(9-gram) stays ≈ 0.9+
            F.regexp_replace("text", r"^\S+", "wCLONESUB").alias("text"),
        )
        return base.unionByName(clones), n_clones

    print(f"{'scale':>6} {'docs':>8} {'sum_df2':>14} {'cands':>10} "
          f"{'pairs':>7} {'clones':>7} {'wall_s':>7}")
    for s in scales:
        n = n_base * s
        docs, n_clones = zipf_corpus(n)
        docs = docs.persist()
        docs.count()
        # Σdf² over the same 9-gram shingles the join uses
        from etl_for_all_studies_spark.functions.hashing import char_shingles

        sh = docs.select(
            "doc_id", F.explode(char_shingles(F.col("text"), 9)).alias("s")
        )
        sum_df2 = (
            sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
            .agg(F.sum(F.col("df") * F.col("df")))
            .collect()[0][0]
        )
        cand, _ = prefix_candidates(docs, k=9, threshold=0.9)
        n_cand = cand.count()
        t0 = time.time()
        n_pairs = jaccard_prefix_pairs(docs, k=9, threshold=0.9).count()
        wall = time.time() - t0
        # head-to-head: MinHash-LSH at the same threshold — probabilistic
        # recall (a missed band ⇒ missed pair) vs the prefix join's exact
        # contract, same corpus, same verify threshold
        from etl_for_all_studies_spark.operators.dedup import minhash_dedup

        t0 = time.time()
        n_mh = minhash_dedup(
            docs, k=9, num_hashes=16, bands=4, verify_threshold=0.9
        ).count()
        mh_wall = time.time() - t0
        print(f"{s:>6} {n + n_clones:>8} {sum_df2:>14} {n_cand:>10} "
              f"{n_pairs:>7} {n_clones:>7} {wall:>7.2f} "
              f"| minhash: {n_mh} pairs {mh_wall:.2f}s")
        docs.unpersist()


if __name__ == "__main__":
    main()
