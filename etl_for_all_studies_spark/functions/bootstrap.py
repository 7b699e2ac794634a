"""Poisson bootstrap: confidence intervals over massive data, one pass.

The classic bootstrap resamples n rows with replacement B times — impossible
when n doesn't fit anywhere. The *Poisson bootstrap* (Chamandy, Muralidharan,
Najmi, Naidu — "Estimating Uncertainty for Massive Data Streams", Google
research report, 2012) replaces per-replicate multinomial sampling with an
independent Poisson(1) weight per (row, replicate): each replicate's
weighted statistic is computed in the SAME aggregation pass, and for large n
the replicate distribution converges to the true bootstrap's.

Engine-specific twist, consistent with every sampler here: the Poisson draw
is NOT ``rand()`` but the portable hash of (row key, replicate id) pushed
through the Poisson(1) inverse CDF — deterministic, retry/rerun-stable, and
bit-replayable by the DuckDB oracle and a pure-Python audit.

Shape: ``explode(1..B)`` fans each row into B (row, replicate) pairs —
a linear ×B map (no extra shuffle keys beyond (group, b)) — then ONE
map-side-combined aggregation computes every replicate's weighted mean, and
a tiny (groups × B) reduction takes percentiles of the replicate means.
B is the cost knob: B=100-200 gives stable 95% CIs; the heavy fan-out term
is B·n rows *through a projection*, not through state.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import MOD, poly_hash

#: Poisson(1) CDF at k = 0..5 (cumulative e^{-1}/k! partial sums); weights
#: cap at 6 (P(X ≥ 7) < 1e-5 — negligible and keeps the CASE short).
_POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)

#: replicate-salt multiplier (distinct from sampling/shard salts so the
#: bootstrap tape is independent of every other hash decision)
BOOT_A = 7919
BOOT_B = 104729
BOOT_C = 65537


def poisson_weight_from_hash(key_hash: Column, replicate: Column) -> Column:
    """Deterministic Poisson(1) weight from a precomputed key hash and a
    replicate id, ∈ {0..6}.

    The replicate id is mixed NONLINEARLY (square mod p after the additive
    salt): a purely affine salt makes consecutive replicates' uniforms
    differ by a tiny fixed stride — every replicate then draws nearly the
    same weight for a row, which silently collapses the bootstrap variance
    (measured: E[W] drifted to 1.2 and CIs vanished). The squared mix keeps
    replicate draws empirically independent (cov ≈ 1e-3) while staying
    64-bit-safe (x < 2³⁰ → x² < 2⁶⁰) and bit-replayable in SQL/Python.

    Taking the hash as an input (not the key) matters for cost: the O(len)
    polynomial hash is replicate-INdependent, so callers compute it once
    per row and fan out B cheap arithmetic mixes — not B string hashes
    (measured 10 s → 2 s on the sf0.1 bench query at B=100).
    """
    x = (key_hash + replicate * F.lit(BOOT_C)) % F.lit(MOD)
    h = ((x * x) % F.lit(MOD) * F.lit(BOOT_A) + F.lit(BOOT_B)) % F.lit(
        MOD
    ) % F.lit(1_000_000_000)
    u = (h.cast("double") + F.lit(0.5)) / F.lit(1_000_000_000.0)
    w = F.lit(6)
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w


def poisson_weight(key: Column, replicate: Column) -> Column:
    """Deterministic Poisson(1) weight for (key, replicate) ∈ {0..6}."""
    return poisson_weight_from_hash(poly_hash(key.cast("string")), replicate)


def bootstrap_mean_ci(
    df: DataFrame,
    *,
    group_cols: list[str],
    key_col: str,
    value_col: str,
    n_replicates: int = 100,
    ci: float = 0.95,
) -> DataFrame:
    """Per-group mean with a percentile-bootstrap CI.

    Output: group_cols + (mean, ci_lo, ci_hi, n, n_replicates). Replicates
    whose total Poisson weight is 0 (possible only for tiny groups) drop
    out of the percentile — visible via ``n_replicates`` < the requested B.
    """
    lo_q = (1.0 - ci) / 2.0
    hi_q = 1.0 - lo_q
    drop_group = not group_cols
    if drop_group:  # global statistic: a constant key keeps the joins keyed
        df = df.withColumn("__g", F.lit(1))
        group_cols = ["__g"]
    b = F.explode(F.sequence(F.lit(1), F.lit(n_replicates))).alias("b")
    fan = df.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        poly_hash(F.col(key_col).cast("string")).alias("__h"),  # once per row
    ).select(*group_cols, "__v", "__h", b).withColumn(
        "__w", poisson_weight_from_hash(F.col("__h"), F.col("b"))
    )
    reps = (
        fan.groupBy(*group_cols, "b")
        .agg(
            F.sum(F.col("__w") * F.col("__v")).alias("__ws"),
            F.sum("__w").alias("__wn"),
        )
        .where(F.col("__wn") > 0)
        .select(*group_cols, (F.col("__ws") / F.col("__wn")).alias("__m"))
    )
    cis = reps.groupBy(*group_cols).agg(
        F.percentile(F.col("__m"), F.lit(lo_q)).alias("ci_lo"),
        F.percentile(F.col("__m"), F.lit(hi_q)).alias("ci_hi"),
        F.count(F.lit(1)).alias("n_replicates"),
    )
    point = df.groupBy(*group_cols).agg(
        F.avg(value_col).alias("mean"), F.count(value_col).alias("n")
    )
    out = point.join(cis, group_cols).select(
        *group_cols, "mean", "ci_lo", "ci_hi", "n", "n_replicates"
    )
    return out.drop("__g") if drop_group else out


__all__ = ["BOOT_A", "BOOT_B", "BOOT_C", "bootstrap_mean_ci", "poisson_weight", "poisson_weight_from_hash"]
