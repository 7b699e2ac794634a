"""Distribution drift metrics: Population Stability Index (PSI).

The monitoring question every deployed pipeline asks: "does today's data
still look like the data we trained/calibrated on?" PSI is the industry-
standard scalar for it (credit-risk lineage, now general ML monitoring):
bucket the REFERENCE period's values (its own deciles, so buckets are
equal-mass by construction), measure both periods' bucket shares, and

    PSI = Σ_buckets (p_cmp − p_ref) · ln(p_cmp / p_ref)

with the conventional reading: < 0.1 stable, 0.1–0.25 drifting, > 0.25
shifted. Zero-count buckets get the standard ε floor so the log stays
finite (deterministic, not data-dependent).

Spark-first shape:

* reference decile edges are ONE ``percentile`` aggregation per group —
  a group-bounded array, joined back (broadcast-sized: groups × 9 doubles);
* bucket assignment is a codegen'd fold over the edge array (≤ n_buckets
  comparisons per row, no per-row join against an edge table);
* shares are one (group, period, bucket) aggregation; the PSI sum is a
  pivot-free conditional aggregate over buckets.

Everything is exact arithmetic on interpolated quantiles — the DuckDB
oracle replays edges, buckets, and the ε floor identically.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def psi(
    df: DataFrame,
    *,
    group_cols: list[str],
    period_col: str,
    value_col: str,
    ref_period,
    cmp_period,
    n_buckets: int = 10,
    eps: float = 1e-4,
) -> DataFrame:
    """Per-group PSI of ``cmp_period``'s value distribution against
    ``ref_period``'s. Output: group_cols + (n_ref, n_cmp, psi)."""
    both = df.where(F.col(period_col).isin([ref_period, cmp_period]))
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges = (
        both.where(F.col(period_col) == ref_period)
        .groupBy(*group_cols)
        .agg(
            F.percentile(F.col(value_col), F.array(*[F.lit(q) for q in qs])
        ).alias("__edges"))
    )
    # bucket = 1 + number of edges the value exceeds — a fold over the
    # (n_buckets−1)-element edge array, evaluated per row without a join
    bucketed = both.join(edges, group_cols).select(
        *group_cols,
        F.col(period_col).alias("__p"),
        (
            F.lit(1)
            + F.aggregate(
                F.col("__edges"),
                F.lit(0),
                lambda acc, e: acc
                + F.when(F.col(value_col) > e, F.lit(1)).otherwise(F.lit(0)),
            )
        ).alias("__b"),
    )
    counts = bucketed.groupBy(*group_cols, "__b").agg(
        F.sum((F.col("__p") == ref_period).cast("long")).alias("c_ref"),
        F.sum((F.col("__p") == cmp_period).cast("long")).alias("c_cmp"),
    )
    # bucket cells collapse into ONE group-bounded array (≤ n_buckets
    # structs), so shares, the ε floor, and the PSI sum are a single
    # codegen'd fold — no pivot, no second shuffle
    final = counts.groupBy(*group_cols).agg(
        F.sum("c_ref").alias("n_ref"),
        F.sum("c_cmp").alias("n_cmp"),
        F.collect_list(F.struct("__b", "c_ref", "c_cmp")).alias("__cells"),
    )
    p_ref = lambda cell: F.greatest(  # noqa: E731
        cell["c_ref"].cast("double") / F.col("n_ref"), F.lit(eps)
    )
    p_cmp = lambda cell: F.greatest(  # noqa: E731
        cell["c_cmp"].cast("double") / F.col("n_cmp"), F.lit(eps)
    )
    psi_col = F.aggregate(
        F.col("__cells"),
        F.lit(0.0),
        lambda acc, cell: acc
        + (p_cmp(cell) - p_ref(cell)) * F.log(p_cmp(cell) / p_ref(cell)),
    )
    return final.select(
        *group_cols,
        "n_ref",
        "n_cmp",
        F.when((F.col("n_ref") > 0) & (F.col("n_cmp") > 0), psi_col).alias("psi"),
    )


def benford_test(
    df: DataFrame,
    *,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """First-digit Benford conformity per group — the classic
    fabricated-numbers screen (accounting/fraud audits): natural
    multiplicative data has first-digit shares ``log₁₀(1 + 1/d)``; human-
    invented numbers don't. Reports the χ² goodness-of-fit against the
    Benford distribution with df = 8 (9 digits − 1 — even, so the exact
    finite-sum survival function applies) plus the max absolute share
    deviation (the quick-look statistic auditors quote).

    One (group, digit) count aggregation over a narrow projection; the
    Benford expectation is a literal array. Only zero/NULL values are
    excluded (no leading digit); negatives contribute through |x| and
    fractional magnitudes in (0, 1) keep their true first significant
    digit (0.023 → 2) via the arithmetic extraction below.

    Output: group_cols + (n, chi2, p_value, max_dev).
    """
    from .stats import chi2_sf_even_df_expr

    # arithmetic first digit: ⌊|x| / 10^⌊log₁₀|x|⌋⌋ — engine-portable (a
    # string cast would hit scientific-notation rendering differences)
    ax = F.abs(F.col(value_col)).cast("double")
    digit = F.least(
        F.greatest(
            F.floor(ax / F.pow(F.lit(10.0), F.floor(F.log10(ax)))).cast("int"),
            F.lit(1),
        ),
        F.lit(9),  # clamp guards last-ulp log10 rounding at powers of ten
    )
    base = df.where(
        F.col(value_col).isNotNull() & (F.col(value_col) != 0)
    ).select(*group_cols, digit.alias("__d"))
    counts = base.groupBy(*group_cols, "__d").agg(
        F.count(F.lit(1)).alias("o")
    )
    import math as _math

    expected = {d: _math.log10(1 + 1 / d) for d in range(1, 10)}
    exp_share = F.element_at(
        F.array(*[F.lit(expected[d]) for d in range(1, 10)]), F.col("__d")
    )
    w_g = Window.partitionBy(*group_cols)
    with_n = counts.withColumn("__n", F.sum("o").over(w_g))
    term = (
        (F.col("o") - F.col("__n") * exp_share)
        * (F.col("o") - F.col("__n") * exp_share)
        / (F.col("__n") * exp_share)
    )
    dev = F.abs(F.col("o") / F.col("__n") - exp_share)
    agg = with_n.groupBy(*group_cols).agg(
        F.max("__n").alias("n"),
        F.sum(term).alias("chi2"),
        F.max(dev).alias("max_dev"),
    )
    # digits that never occur contribute n·p_d to chi2 (O = 0) — add the
    # missing-digit mass analytically instead of densifying the table
    present_mass = with_n.groupBy(*group_cols).agg(
        F.sum(exp_share).alias("__mass")
    )
    out = agg.join(present_mass, group_cols).select(
        *group_cols, "n",
        (F.col("chi2") + F.col("n") * (F.lit(1.0) - F.col("__mass"))).alias("chi2"),
        "max_dev",
    )
    p = chi2_sf_even_df_expr(F.col("chi2"), F.lit(4.0))  # df = 8
    return out.select(
        *group_cols, "n", "chi2",
        F.when(F.col("n") > 0, p).alias("p_value"),
        "max_dev",
    )


__all__ = ["benford_test", "psi"]
