"""All-pairs per-study Spearman correlation with p-values and BH FDR.

Re-expresses the reference's correlation engine
(``src/etl_for_all_studies/correlation.py:95-162``) as one declarative plan:

  pair self-join (O-24/O-25) → gates (O-33/O-34) → average ranks (O-35) →
  Pearson-on-ranks ``corr()`` (O-36) → normal-approx p (O-37) → NaN-ρ drop
  (O-38) → BH FDR per study (O-40) → p NULL→1.0 at store time (O-39).

Two physical strategies, same semantics on dense matrices:

* ``mode="exact"`` (default): ranks are computed **within each pair's shared
  sample set** after the self-join — bit-faithful to the reference even when
  genes cover ragged sample sets (the reference intersects per pair,
  ``correlation.py:118``). Cost: windows over the pair-expanded table.
* ``mode="dense"``: ranks computed once per (study, gene) **before** the
  self-join — identical results when every gene in a study covers the same
  samples (the common dense-matrix case) at a fraction of the cost; this is
  the 100 TB-scale path (one window over the long table, then the join's
  equi-keys (study, sample) drive a sort-merge join and the aggregation is
  map-side partial).

The join is equi on (study_key, gsm_accession) with ``gene_a < gene_b`` —
Catalyst plans the equi part as the join key and the inequality as a
post-join filter; AQE handles skewed studies.
"""
from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stats import (
    average_rank,
    benjamini_hochberg,
    benjamini_hochberg_scalable,
    spearman_p_value_expr,
    spearman_p_value_t_expr,
)

MIN_SAMPLES_FOR_CORRELATION = 2  # reference correlation.py:65


def _utc_now_iso() -> str:
    return dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds")


def _split_dense_studies(
    e: DataFrame, wide_gene_threshold: int | None = None
) -> tuple[list[int], list[int], list[int], dict[int, int]]:
    """Classify studies as dense (every gene covers every sample exactly
    once), WIDE dense (dense with ``n_genes > wide_gene_threshold`` — the
    beyond-envelope shape that needs block pair enumeration), or ragged.
    Also returns the per-study gene counts the classification aggregation
    already paid for, so auto mode can size ``n_blocks`` from the widest
    study instead of a guess.

    A study is dense iff (a) no (gene, sample) cell repeats and (b) the
    distinct cells fill the full gene × sample grid. Two-phase screen so the
    router's fixed cost stays small (it is pure latency on every auto-routed
    query):

    1. ONE aggregation computes (total, n_genes, n_samples). If
       ``total != n_genes · n_samples`` the study cannot be dense — this
       rejects ragged matrices (the common case at warehouse scale) without
       ever paying a distinct over (gene, sample) pairs. The screen's Expand
       is over two single columns, not a two-column struct.
    2. Only screen-passing candidates get the exact no-duplicate-cells
       verification: a distinct count over (gene, sample), filtered to just
       those studies. A truly dense study pays it (and then saves far more
       on the pre-ranked plan); a duplicated-cell impostor is demoted to
       ragged, so routing can never change results.
    """
    from pyspark.sql import functions as SF

    per_study = e.groupBy("study_key").agg(
        SF.count(SF.lit(1)).alias("total"),
        SF.count_distinct("gene_key").alias("n_genes"),
        SF.count_distinct("gsm_accession").alias("n_samples"),
    )
    rows = per_study.withColumn(
        "candidate", SF.col("total") == SF.col("n_genes") * SF.col("n_samples")
    ).collect()
    candidates = [r["study_key"] for r in rows if r["candidate"]]
    expected = {r["study_key"]: r["total"] for r in rows}

    dense: list[int] = []
    if candidates:
        cells = (
            e.where(F.col("study_key").isin(candidates))
            .select("study_key", "gene_key", "gsm_accession")
            .distinct()
            .groupBy("study_key")
            .agg(SF.count(SF.lit(1)).alias("cells"))
            .collect()
        )
        dense = [r["study_key"] for r in cells if r["cells"] == expected[r["study_key"]]]
    genes = {r["study_key"]: r["n_genes"] for r in rows}
    wide = (
        [k for k in dense if genes[k] > wide_gene_threshold]
        if wide_gene_threshold is not None
        else []
    )
    dense = [k for k in dense if k not in set(wide)]
    ragged = [r["study_key"] for r in rows if r["study_key"] not in set(dense) | set(wide)]
    return dense, wide, ragged, genes


# Auto-mode block sizing: keep each block pair's output near
# (_GENES_PER_BLOCK)² ≈ 4M rows per (sample, block-pair) task. Measured
# round-8 envelope sweep (SCALE.md): at 20k genes B=10 (2k genes/block)
# was the sweet spot; smaller blocks buy nothing locally and pay B+1×
# input replication, larger blocks push per-task output toward the
# single-reducer pathology block mode exists to remove.
_GENES_PER_BLOCK = 2000


def _derive_n_blocks(max_genes: int) -> int:
    """Blocks for the widest auto-routed study: ceil(width / 2k), min 2
    (one block would make the block plan a strictly worse dense plan)."""
    return max(2, -(-max_genes // _GENES_PER_BLOCK))


def _block_pairs(e: DataFrame, n_blocks: int) -> DataFrame:
    """Bucketed pair enumeration over a pre-ranked long table (``block``
    mode's core). Every unordered gene pair {g₁, g₂} with blocks p ≤ q is
    produced by exactly one block pair (p, q):

    * as the LEFT side, a row with block g is replicated to block pairs
      (g, g), (g, g+1), …, (g, B−1) — a per-row ``sequence`` explode;
    * as the RIGHT side, to (0, g), …, (g, g).

    The join is then a pure equi-join on (study, sample, block_a, block_b) —
    the block columns join the shuffle key, so one (study, sample)'s
    quadratic pair fan-out is spread over B(B+1)/2 independent reducers
    instead of one. Off-diagonal block pairs contain each unordered pair
    once with arbitrary side order (blocks differ ⇒ genes differ), so the
    output is canonicalized with least/greatest + a conditional swap of the
    value/rank columns; diagonal pairs keep the usual ``gene_a < gene_b``
    predicate. Block id is ``pmod(hash(gene_key), B)`` — hash, not range, so
    dense and sparse gene-key spaces both balance.
    """
    blk = F.pmod(F.hash(F.col("gene_key")), F.lit(n_blocks)).alias("blk")
    base = e.select("*", blk)
    left = base.select(
        "*",
        F.explode(
            F.sequence(F.col("blk"), F.lit(n_blocks - 1))
        ).alias("blk_b"),
    ).withColumnRenamed("blk", "blk_a")
    right = base.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("blk_a"),
    ).withColumnRenamed("blk", "blk_b")
    # PIN the join parallelism: AQE's coalescing sizes partitions by shuffle
    # INPUT bytes, but this join amplifies output ~n_genes/B× per input row —
    # on a wide-gene study the tiny replicated input coalesces into one
    # partition and the whole quadratic fan-out lands on a single reducer,
    # recreating exactly the hot-spot block mode exists to remove. An
    # explicit numbered repartition on the join keys is non-coalescible, so
    # the B(B+1)/2 × samples key groups keep their full reducer spread.
    n_part = int(e.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    left = left.repartition(
        n_part, "study_key", "gsm_accession", "blk_a", "blk_b"
    )
    a = left.alias("a")
    b = right.alias("b")
    joined = a.join(
        b,
        on=[
            F.col("a.study_key") == F.col("b.study_key"),
            F.col("a.gsm_accession") == F.col("b.gsm_accession"),
            F.col("a.blk_a") == F.col("b.blk_a"),
            F.col("a.blk_b") == F.col("b.blk_b"),
        ],
    ).where(
        # diagonal block: classic ordered-pair predicate; off-diagonal: the
        # sides are distinct blocks, every unordered pair appears once
        (F.col("a.blk_a") != F.col("a.blk_b"))
        | (F.col("a.gene_key") < F.col("b.gene_key"))
    )
    swap = F.col("a.gene_key") > F.col("b.gene_key")

    def pick(col: str, flipped: bool) -> F.Column:
        first, second = ("b", "a") if flipped else ("a", "b")
        return F.when(swap, F.col(f"{first}.{col}")).otherwise(F.col(f"{second}.{col}"))

    return joined.select(
        F.col("a.study_key").alias("study_key"),
        F.least(F.col("a.gene_key"), F.col("b.gene_key")).alias("gene_a_key"),
        F.greatest(F.col("a.gene_key"), F.col("b.gene_key")).alias("gene_b_key"),
        pick("expression_value", True).alias("va"),
        pick("expression_value", False).alias("vb"),
        pick("rank", True).alias("ra"),
        pick("rank", False).alias("rb"),
    )


def compute_gene_pair_correlations(
    expression: DataFrame,
    *,
    min_samples: int = MIN_SAMPLES_FOR_CORRELATION,
    mode: str = "exact",
    computed_at: str | None = None,
    pvalue_dist: str = "normal",
    n_blocks: int | None = None,
    wide_gene_threshold: int = 1024,
    scope=None,
) -> DataFrame:
    """Long-form expression → fact_gene_pair_corr rows.

    ``expression`` needs columns (study_key, gene_key, gsm_accession,
    expression_value); output matches ``schemas.FACT_GENE_PAIR_CORR``.

    ``mode="auto"`` classifies each study (one cheap aggregation) and routes
    dense studies through the pre-ranked plan, WIDE dense studies
    (``n_genes > wide_gene_threshold``) through the block-bucketed plan,
    and ragged ones through the exact per-pair plan — identical results
    every way, since the physical plans only diverge on ragged matrices
    and block ≡ dense is pinned by tests.

    ``mode="block"`` is the beyond-envelope scale path (SURVEY §7.4.7) for
    studies whose gene count far exceeds the reference's ~hundreds: dense
    semantics (pre-ranked), but pair enumeration is **bucketed** into
    ``n_blocks`` gene blocks. The plain dense join keys the shuffle on
    (study, sample), so ONE task must emit all n_genes²/2 pairs for its
    sample — at 20k genes that is 2·10⁸ rows from a single task, an
    unsplittable hot key (AQE splits skewed *partitions*, not single keys).
    The block plan keys on (study, sample, block_a, block_b): each task emits
    at most (n_genes/B)² pairs, giving B(B+1)/2-way parallelism per sample at
    the cost of replicating each input row B+1 times across the two join
    sides — the classic triangle-enumeration tradeoff (shuffle grows √P-ish,
    task output shrinks quadratically). Results are hash-identical to
    ``mode="dense"`` (tests pin this). ``n_blocks=None`` (default) sizes
    blocks from the data: auto mode derives ``ceil(width / 2000)`` from
    the widest routed study (block-pair output stays ~4M rows,
    ``_derive_n_blocks``); an explicit ``mode="block"`` call falls back
    to 8. Pass a value to override either.

    ``pvalue_dist`` pins the SURVEY §7.4.2 fork: ``"normal"`` (default) is
    the reference's no-SciPy fallback — a closed-form JVM-side expression;
    ``"t"`` is SciPy's primary Student-t semantics — ALSO a pure JVM
    expression (incomplete-beta continued fraction as a ``sequence`` fold,
    ``functions/stats.py::spearman_p_value_t_expr``; < 1e-12 vs SciPy), so
    neither p-value path has Python in the row path.
    """
    ts = computed_at or _utc_now_iso()
    e = expression.select("study_key", "gene_key", "gsm_accession", "expression_value")

    if mode == "auto":
        dense_keys, wide_keys, ragged_keys, genes = _split_dense_studies(
            e, wide_gene_threshold=wide_gene_threshold
        )
        parts = []
        if dense_keys:
            parts.append(
                compute_gene_pair_correlations(
                    e.where(F.col("study_key").isin(dense_keys)),
                    min_samples=min_samples, mode="dense", computed_at=ts,
                    pvalue_dist=pvalue_dist,
                )
            )
        if wide_keys:
            nb = (
                n_blocks
                if n_blocks is not None
                else _derive_n_blocks(max(genes[k] for k in wide_keys))
            )
            parts.append(
                compute_gene_pair_correlations(
                    e.where(F.col("study_key").isin(wide_keys)),
                    min_samples=min_samples, mode="block", computed_at=ts,
                    pvalue_dist=pvalue_dist, n_blocks=nb, scope=scope,
                )
            )
        if ragged_keys:
            parts.append(
                compute_gene_pair_correlations(
                    e.where(F.col("study_key").isin(ragged_keys)),
                    min_samples=min_samples, mode="exact", computed_at=ts,
                    pvalue_dist=pvalue_dist,
                )
            )
        if not parts:
            return compute_gene_pair_correlations(
                e, min_samples=min_samples, mode="exact", computed_at=ts,
                pvalue_dist=pvalue_dist,
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    if mode == "dense":
        e = e.withColumn(
            "rank", average_rank(["study_key", "gene_key"], "expression_value")
        )
        a = e.alias("a")
        b = e.alias("b")
        paired = a.join(
            b,
            on=[
                F.col("a.study_key") == F.col("b.study_key"),
                F.col("a.gsm_accession") == F.col("b.gsm_accession"),
                F.col("a.gene_key") < F.col("b.gene_key"),
            ],
        ).select(
            F.col("a.study_key").alias("study_key"),
            F.col("a.gene_key").alias("gene_a_key"),
            F.col("b.gene_key").alias("gene_b_key"),
            F.col("a.expression_value").alias("va"),
            F.col("b.expression_value").alias("vb"),
            F.col("a.rank").alias("ra"),
            F.col("b.rank").alias("rb"),
        )
    elif mode == "block":
        e = e.withColumn(
            "rank", average_rank(["study_key", "gene_key"], "expression_value")
        )
        paired = _block_pairs(e, 8 if n_blocks is None else n_blocks)
    else:
        a = e.alias("a")
        b = e.alias("b")
        paired = a.join(
            b,
            on=[
                F.col("a.study_key") == F.col("b.study_key"),
                F.col("a.gsm_accession") == F.col("b.gsm_accession"),
                F.col("a.gene_key") < F.col("b.gene_key"),
            ],
        ).select(
            F.col("a.study_key").alias("study_key"),
            F.col("a.gene_key").alias("gene_a_key"),
            F.col("b.gene_key").alias("gene_b_key"),
            F.col("a.expression_value").alias("va"),
            F.col("b.expression_value").alias("vb"),
        )
        # Ranks within the pair's shared sample set — exact reference
        # semantics for ragged matrices (correlation.py:118 intersects first).
        pair_cols = ["study_key", "gene_a_key", "gene_b_key"]
        paired = paired.withColumn("ra", average_rank(pair_cols, "va")).withColumn(
            "rb", average_rank(pair_cols, "vb")
        )

    stats = (
        paired.groupBy("study_key", "gene_a_key", "gene_b_key")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            # Pearson-on-ranks assembled from covariance/variance aggregates
            # instead of corr(): ANSI-safe on zero-variance series (corr()
            # raises DIVIDE_BY_ZERO under ANSI; the reference's semantics are
            # "NaN ρ → drop the pair", O-38), numerically identical otherwise.
            F.covar_samp("ra", "rb").alias("cov_ab"),
            F.var_samp("ra").alias("var_a"),
            F.var_samp("rb").alias("var_b"),
        )
        # O-33 min-samples gate + O-34 constant-series gate + O-38 NaN-ρ drop.
        # var(rank) > 0 ⇔ ≥2 distinct values — the reference's
        # len(set(values)) < 2 gate without a count_distinct (which would
        # force an Expand tripling the aggregation input).
        .where(
            (F.col("n_samples") >= min_samples)
            & (F.col("var_a") > 0)
            & (F.col("var_b") > 0)
        )
        # single sqrt of the variance product (not sd_a*sd_b) keeps perfect
        # monotone pairs at exactly ±1.0; clamp guards residual FP noise
        .withColumn(
            "rho_spearman",
            F.least(
                F.greatest(
                    F.col("cov_ab") / F.sqrt(F.col("var_a") * F.col("var_b")),
                    F.lit(-1.0),
                ),
                F.lit(1.0),
            ),
        )
        .where(F.col("rho_spearman").isNotNull() & ~F.isnan("rho_spearman"))
        .drop("cov_ab", "var_a", "var_b")
        .withColumn(
            "p_value",
            spearman_p_value_expr(F.col("rho_spearman"), F.col("n_samples"))
            if pvalue_dist == "normal"
            else spearman_p_value_t_expr(F.col("rho_spearman"), F.col("n_samples")),
        )
        # normalize any NaN to NULL so BH's valid-p accounting is uniform
        .withColumn(
            "p_value",
            F.when(F.isnan("p_value"), F.lit(None).cast("double")).otherwise(
                F.col("p_value")
            ),
        )
    )

    # q-values: block mode's pair families are n_genes²/2 rows — the classic
    # per-family window would funnel exactly the fan-out _block_pairs spread
    # across reducers back into ONE task. The bucketed BH keeps every stage
    # partitioned by (study, p-bucket) with bit-identical output (pinned by
    # test_bh_scalable_matches_classic_and_oracle).
    if mode == "block":
        with_q = benjamini_hochberg_scalable(
            stats, p_col="p_value", q_col="q_value", family_cols=["study_key"],
            scope=scope,
        )
    else:
        with_q = benjamini_hochberg(
            stats, p_col="p_value", q_col="q_value", family_cols=["study_key"]
        )

    return with_q.select(
        "gene_a_key",
        "gene_b_key",
        F.lit(None).cast("long").alias("illness_key"),  # always NULL, correlation.py:153
        F.col("rho_spearman"),
        F.coalesce(F.col("p_value"), F.lit(1.0)).alias("p_value"),  # O-39
        F.col("q_value"),
        F.col("n_samples").cast("int").alias("n_samples"),
        F.lit(ts).alias("computed_at"),
        "study_key",
    )


__all__ = ["MIN_SAMPLES_FOR_CORRELATION", "compute_gene_pair_correlations"]
