"""Deterministic hash-based sampling (stratified subsampling for data mixes).

Beyond-reference capability: LLM data curation re-weights sources by sampling
each stratum at its own rate (e.g. down-sample crawl, keep books). Doing that
with ``rand()`` is irreproducible and unstable under retries/speculative
execution; the standard scale answer is a *deterministic* hash of a stable
key: ``keep iff hash(key) mod denom < rate``. Re-runs, partial re-runs, and
per-executor retries all make identical decisions, and the sample composes
with incremental loads (the same doc always lands the same way).

The hash is the portable polynomial hash (``functions/hashing.py``), so the
decision is reproducible *outside* Spark too (the DuckDB oracle replays it
bit-for-bit) — auditable sampling, not engine-dependent.

Scale notes: a narrow projection + filter per row — no shuffle, no Python;
the filter sits directly on the scan so column pruning and partition pruning
pass through. Per-stratum rates arrive as an arbitrary ``Column`` (a literal,
an expression over the stratum column, or a broadcast-joined rate dim), so
the rate table never forces a wide shuffle.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import affine_hash, poly_hash

#: Default affine-family parameters (distinct from the MinHash family so the
#: sampling decision is independent of dedup signatures).
SALT_A = 7919
SALT_B = 104729


def sample_bucket(key: Column, denom: int = 1000) -> Column:
    """Deterministic bucket in [0, denom) from a stable key column."""
    return affine_hash(poly_hash(key.cast("string")), SALT_A, SALT_B) % F.lit(denom)


def hash_sample(
    df: DataFrame, key: Column, rate: Column, denom: int = 1000
) -> DataFrame:
    """Keep rows whose deterministic bucket falls below ``rate`` (per-row
    Column — per-mille when ``denom=1000``). Annotates ``sample_bucket`` so
    audits can verify the decision."""
    bucketed = df.withColumn("sample_bucket", sample_bucket(key, denom))
    return bucketed.where(F.col("sample_bucket") < rate)


def mix_to_budget(
    df: DataFrame,
    *,
    stratum_col: str,
    weight_col_df: DataFrame,
    token_col: str,
    budget_tokens: int,
    key_col: str = "doc_id",
    denom: int = 1000,
    alpha: float = 1.0,
) -> DataFrame:
    """Deterministically subsample each stratum toward a target token mix.

    ``weight_col_df`` is a tiny (stratum, weight) table; stratum ``s`` gets a
    token target of ``budget_tokens * weight_s / Σweights`` and a keep-rate of
    ``min(1, target_s / actual_tokens_s)`` (an undersized stratum is kept
    whole — rates never upsample). Strata ABSENT from the weight table are
    dropped entirely (inner join) — weight-zero and weight-missing mean the
    same thing: not in the mix. Pass an explicit weight for every stratum
    you want kept. Rows are then kept by the same
    deterministic hash-bucket rule as ``hash_sample``, so the mix is
    reproducible under retries and replayable outside Spark.

    Scale notes: per-stratum token totals are ONE map-side-combined
    aggregation over a two-column projection; the resulting rate table is
    strata-sized and **broadcast** back, so the data path is scan → broadcast
    join → filter — a single pass with no wide shuffle. Expected (not exact)
    token counts per stratum — the standard trade for a one-pass, stateless,
    retry-stable mix (an exact cut would need a per-stratum global sort).

    Output: input columns + ``sample_bucket``, ``keep_rate_mille`` (audit
    columns), filtered to kept rows.
    """
    # temperature scaling (mT5-style alpha sampling): raw weights are
    # usually corpus sizes, and sampling ∝ size^alpha with alpha < 1 lifts
    # low-resource strata without flattening the mix entirely (alpha = 0 →
    # uniform, alpha = 1 → proportional). Applied BEFORE normalization so
    # the published recipe p_s ∝ w_s^alpha / Σ w^alpha holds exactly.
    if alpha != 1.0:
        weight_col_df = weight_col_df.withColumn(
            "weight", F.pow(F.col("weight"), F.lit(alpha))
        )
    totals = df.groupBy(stratum_col).agg(F.sum(token_col).alias("actual_tokens"))
    wsum = weight_col_df.agg(F.sum("weight").alias("wsum"))
    rates = (
        totals.join(F.broadcast(weight_col_df), stratum_col)
        .join(F.broadcast(wsum))
        .select(
            stratum_col,
            # a stratum whose rows sum to zero tokens costs nothing against
            # the budget — keep it whole rather than divide by zero (ANSI
            # mode makes that an error, not an Inf)
            F.when(F.col("actual_tokens") <= 0, F.lit(denom))
            .when(F.col("wsum") <= 0, F.lit(0))  # degenerate all-zero weights
            .otherwise(
                F.least(
                    F.lit(denom),
                    F.floor(
                        F.lit(float(budget_tokens))
                        * F.col("weight")
                        / F.col("wsum")
                        / F.col("actual_tokens")
                        * denom
                    ),
                )
            )
            .cast("long")
            .alias("keep_rate_mille"),
        )
    )
    joined = df.join(F.broadcast(rates), stratum_col)
    return hash_sample(
        joined, F.col(key_col), F.col("keep_rate_mille"), denom=denom
    )


def sample_fixed_per_group(
    df: DataFrame,
    *,
    group_cols: list[str],
    key_col: str,
    n: int,
) -> DataFrame:
    """Deterministic FIXED-SIZE sample: exactly ``min(n, |group|)`` rows per
    group — the reproducible analog of reservoir sampling.

    Rate-based sampling (:func:`hash_sample`) cannot promise a per-group
    row count; eval-set construction, per-domain spot-check exports, and
    debugging slices need "give me exactly n per source". Ordering rows by
    the portable hash of their key (ties → key) IS a uniform-at-random
    permutation in expectation, but a *fixed* one: re-runs, retries, and
    incremental appends agree on which rows are in the sample (a new row
    enters only by displacing the highest-hash member, exactly like a
    reservoir with a frozen random tape).

    Scale notes: one shuffle keyed by the group columns + an in-partition
    TOP-N sort — Spark's window TOP-N is rank-limit-pushed (a bounded heap
    per group in the sort, not a full group sort at rest). Groups are
    domains/sources (bounded cardinality, far coarser than doc ids), and n
    is small; skew in group sizes is absorbed by the partial top-n.
    """
    order = F.struct(
        sample_bucket(F.col(key_col), denom=1_000_000_000).alias("h"),
        F.col(key_col).alias("k"),
    )
    w = Window.partitionBy(*group_cols).orderBy(order.asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def es_key(key: Column, weight: Column) -> Column:
    """Efraimidis–Spirakis selection key with a frozen random tape.

    E-S weighted sampling without replacement (Efraimidis & Spirakis, IPL
    97(5), 2006): draw ``u_i ~ U(0,1)``, rank items by ``u_i^(1/w_i)`` and
    keep the top k — equivalently (log-transformed, monotone) rank by
    ``-ln(u_i)/w_i`` ascending, the exponential-clocks form used here. Each
    item competes independently, so the top-k can be taken with a
    distributed partial top-k — no sequential reservoir state.

    Determinism: ``u_i`` comes from the portable hash of the item's key
    (``(h + 0.5) / 10^9`` — strictly inside (0,1)), not ``rand()``, so
    retries, re-runs, and the DuckDB oracle reproduce the same sample.
    """
    h = sample_bucket(key, denom=1_000_000_000)
    u = (h.cast("double") + F.lit(0.5)) / F.lit(1_000_000_000.0)
    return -F.log(u) / weight


def sample_weighted_per_group(
    df: DataFrame,
    *,
    group_cols: list[str],
    key_col: str,
    weight_col: str,
    n: int,
) -> DataFrame:
    """Exactly ``min(n, |group|)`` rows per group, drawn *without replacement
    with probability proportional to weight* — deterministic (frozen tape).

    The fixed-size uniform sampler above treats every row equally; curation
    mixes usually want token-weighted draws (long docs proportionally more
    likely) — this is the standard one-pass distributed answer. Rows with
    non-positive or NULL weight can never be drawn (E-S keys are undefined
    there) and are filtered out.

    Scale notes: identical shape to :func:`sample_fixed_per_group` — one
    narrow projection computing the key, one shuffle on the group columns,
    rank-limited window top-n (bounded heap per group). Appends compose: a
    new row enters a group's sample only by displacing the current largest
    key, exactly like a weighted reservoir with a frozen tape.

    Output: input columns + ``es_key`` (audit) + ``sample_rank``.
    """
    keyed = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("es_key", es_key(F.col(key_col), F.col(weight_col)))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("es_key").asc(), F.col(key_col).asc()
    )
    return (
        keyed.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n)
    )


def assign_splits(
    df: DataFrame,
    *,
    key_col: str,
    fractions: dict[str, float],
    denom: int = 1_000_000,
) -> DataFrame:
    """Deterministic train/val/test (or any named) disjoint splits.

    Every row gets a ``split`` label by carving the portable-hash bucket
    space [0, denom) into contiguous ranges proportional to ``fractions``
    (which must sum to ≤ 1; any remainder is labeled NULL — an explicit
    "held out of all splits" band). The assignment is a pure function of
    the key: retries, re-runs, appends, and other engines (the DuckDB
    oracle, a pure-Python audit) place the same row in the same split
    forever — the property that keeps eval sets uncontaminated as the
    corpus grows. A narrow projection; no shuffle.
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    bucket = sample_bucket(F.col(key_col), denom)
    expr = F.lit(None).cast("string")
    upper = 0
    # build the CASE from the top down so the first band wins at boundaries
    bands = []
    for name, frac in fractions.items():
        lower = upper
        upper = lower + int(round(frac * denom))
        bands.append((name, lower, upper))
    for name, lower, up in reversed(bands):
        expr = F.when((bucket >= lower) & (bucket < up), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


__all__ = [
    "SALT_A",
    "SALT_B",
    "assign_splits",
    "es_key",
    "hash_sample",
    "mix_to_budget",
    "sample_bucket",
    "sample_fixed_per_group",
    "sample_weighted_per_group",
]
