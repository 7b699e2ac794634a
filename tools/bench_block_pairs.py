#!/usr/bin/env python
"""Wide-gene correlation probe: dense vs block pair enumeration (SURVEY
§7.4.7; SCALE.md round-3, round-8 envelope series).

Builds a synthetic dense study with ``n_genes`` up to the reference's own
stated envelope (``docs/genomic-etl-requirements.md:35,41``: 20k+ genes ⇒
C(20k,2) ≈ 2·10⁸ pairs) and times the SAME correlation through
``mode="dense"`` (the (study, sample)-keyed join: every sample's full n²/2
pair fan-out is ONE reducer) and ``mode="block"`` (the bucketed join:
B(B+1)/2 reducers per sample). Reports wall, pairs/s, and the shuffle
bytes of the newly executed stages (UI REST, ``tools/stage_metrics.py``)
— the per-task output bound is the actual 100 TB argument: on a cluster
the single 10⁸-row dense task would blow executor memory, not just time.

Usage:
  python tools/bench_block_pairs.py one <n_genes> <n_samples> <n_blocks> <modes>
      # modes: comma list of dense,block — one JSON line per mode
  python tools/bench_block_pairs.py series
      # the round-8 envelope grid, each config in its OWN subprocess so
      # shuffle files are reclaimed between configs (the 20k runs write
      # tens of GB); prints a markdown table for SCALE.md
  python tools/bench_block_pairs.py [n_genes] [n_samples] [n_blocks]
      # legacy single-run form (dense + block, no shuffle capture)
"""
from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

UI_PORT = 4055

# the round-8 envelope grid: crossover anchors (dense vs block at 1k-8k),
# the n_blocks sweep at 8k, and the reference's 20k envelope (block only:
# dense at 20k is one reducer emitting 2e8 rows per sample — the
# pathology block mode exists to remove; probed at 8k instead).
# ``-nobc`` variants run with autoBroadcastJoinThreshold=-1: locally the
# tiny synthetic expression table BROADCASTS, which hides the dense
# mode's single-reducer pathology (the self-join never shuffles on
# (study, sample) at all); on a cluster where the expression leg is TBs
# the join shuffles, and that is the regime block mode exists for — the
# nobc rows are the honest cluster proxy.
SERIES: list[tuple[int, int, int, str]] = [
    (1000, 4, 8, "dense,block"),
    (2000, 4, 8, "dense,block"),
    (4000, 4, 8, "dense,block"),
    (8000, 4, 4, "block"),
    (8000, 4, 8, "dense,block"),
    (8000, 4, 16, "block"),
    (4000, 4, 8, "dense-nobc,block-nobc"),
    (8000, 4, 8, "dense-nobc,block-nobc"),
    (20000, 4, 10, "block"),
    (20000, 4, 16, "block"),
]


def synth_expression(spark, n_genes: int, n_samples: int):
    from pyspark.sql import functions as F

    e = (
        spark.range(n_genes)
        .select(F.col("id").alias("gene_key"))
        .crossJoin(
            spark.range(n_samples).select(
                F.concat(F.lit("S"), F.col("id")).alias("gsm_accession")
            )
        )
        .select(
            F.lit(1).cast("long").alias("study_key"),
            "gene_key",
            "gsm_accession",
            (
                F.pmod(
                    F.col("gene_key") * 37 + F.length("gsm_accession") * 11,
                    F.lit(97),
                ).cast("double")
            ).alias("expression_value"),
        )
        .repartition(32)
        .persist()
    )
    e.count()
    return e


def run_one(n_genes: int, n_samples: int, n_blocks: int, modes: list[str]) -> None:
    from etl_for_all_studies_spark.plans.correlation import (
        _split_dense_studies,
        compute_gene_pair_correlations,
    )
    from etl_for_all_studies_spark.session import get_spark
    from tools.stage_metrics import diff_stages, stage_snapshot

    spark = get_spark(
        app_name="bench-block-pairs",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.driver.memory": "48g",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )
    spark.range(1).count()
    e = synth_expression(spark, n_genes, n_samples)

    # the auto router must classify this width correctly: dense at/below
    # the threshold, block above (the SCALE envelope contract)
    dense_k, wide_k, ragged_k, _genes = _split_dense_studies(
        e, wide_gene_threshold=1024
    )
    pairs = n_genes * (n_genes - 1) // 2
    for token in modes:
        mode, _, variant = token.partition("-")
        nobc = variant == "nobc"
        if nobc:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        before = stage_snapshot(UI_PORT)
        t0 = time.monotonic()
        corr = compute_gene_pair_correlations(
            e, min_samples=2, mode=mode, n_blocks=n_blocks, computed_at="fixed"
        )
        corr.write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        stages = diff_stages(before, stage_snapshot(UI_PORT))
        if nobc:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        print(
            json.dumps(
                {
                    "n_genes": n_genes,
                    "n_samples": n_samples,
                    "n_blocks": n_blocks if mode == "block" else None,
                    "mode": token,
                    "pairs": pairs,
                    "wall_s": round(wall, 1),
                    "pairs_per_s": int(pairs / wall),
                    "shuffle_write": stages["shuffle_write"],
                    "router": "block"
                    if wide_k
                    else ("dense" if dense_k else "exact"),
                }
            ),
            flush=True,
        )


def run_series() -> None:
    rows = []
    for n_genes, n_samples, n_blocks, modes in SERIES:
        out = subprocess.run(
            [
                sys.executable,
                __file__,
                "one",
                str(n_genes),
                str(n_samples),
                str(n_blocks),
                modes,
            ],
            capture_output=True,
            text=True,
            check=False,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                rows.append(json.loads(line))
                print(line, flush=True)
        if out.returncode != 0:
            print(f"FAILED {n_genes}/{n_blocks}: {out.stderr[-800:]}", flush=True)
    print("\n| n_genes | mode | n_blocks | pairs | wall | pairs/s | shuffle_write | router |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['n_genes']} | {r['mode']} | {r['n_blocks'] or '-'} | "
            f"{r['pairs']:.1e} | {r['wall_s']} s | {r['pairs_per_s']:,} | "
            f"{r['shuffle_write'] / 1e9:.2f} GB | {r['router']} |"
        )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "series":
        run_series()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one(
            int(sys.argv[2]),
            int(sys.argv[3]),
            int(sys.argv[4]),
            sys.argv[5].split(","),
        )
        return
    n_genes = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    run_one(n_genes, n_samples, n_blocks, ["dense", "block"])


if __name__ == "__main__":
    main()
