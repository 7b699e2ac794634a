"""Similarity-join auto-router: prefix join vs MinHash-LSH, chosen from
the threshold and a one-aggregation corpus profile.

The engine has two scale paths for near-dup pairs over shingle sets and
the choice was manual (VERDICT r9, missing #4):

* ``prefixjoin.jaccard_prefix_pairs`` — EXACT Jaccard, candidate join
  bounded by Σ(prefix-df)². The prefix keeps ``|T| − ⌈t·|T|⌉ + 1``
  shingles per set, so its cost collapses as the threshold rises (t=0.9
  keeps ~10% of each set, concentrated on the RAREST shingles). Measured
  head-to-head at t=0.9 (SCALE.md r9): 2.4–10× faster than LSH *and*
  complete (LSH missed 22/6,400 pairs at 64×).
* ``dedup.minhash_dedup`` — approximate recall, cost ≈ ``num_hashes``
  evaluations per shingle occurrence plus the band-bucket join; FLAT in
  the threshold. Keeps the low-t regime where prefixes lengthen toward
  |T|/2 and the prefix bound weakens.

Routing rule (mirrors the correlation router, ``plans/correlation.py``:
one bounded classification aggregation, then identical-semantics legs):

1. ``threshold ≥ prefix_threshold`` (default 0.8) → **prefix**, no
   profile needed — the measured regime where the exact join dominates
   at every corpus shape tried.
2. below that, profile the shingle df distribution — ONE aggregation
   over the exploded shingles yielding ``(total_occurrences, vocab,
   sum_df2)`` — and compare cost proxies:

   * prefix candidate volume ≲ ``(1−t)² · Σdf²`` (uniform-placement
     bound; the real df-ordered prefix volume is LOWER because hot
     shingles land in suffixes — so this routes *conservatively toward
     LSH*);
   * LSH cost ∝ ``num_hashes · total_occurrences`` (the per-occurrence
     hashing term that dominated the measured head-to-head; the band
     join rides on top, in LSH's disfavor).

   Route prefix iff the first ≤ the second. On the r9 crossover corpus
   this sends (t=0.6, k=5, tiny vocab → Σdf² huge) to LSH and
   (t=0.6, k=9, large vocab → low dfs) to the exact prefix join.

At 100 TB the profile aggregation shuffles once on the shingle key —
the same exchange stage 1 of either leg needs anyway; pass
``profile_fraction < 1`` to profile a Bernoulli doc sample instead
(df scales ~linearly in the fraction for non-hapax shingles, so
``sum_df2`` is extrapolated by ``1/f²`` — conservative for the hot
shingles that actually decide the route).

Reference parity: none — the reference has no set-similarity surface;
this is beyond-reference curation capability (SURVEY §2.8 extension).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import CacheScope, persist
from ..functions.hashing import char_shingles
from ..partitioning import compute_spread
from .dedup import (
    exact_rows_per_band,
    minhash_lsh_candidates,
    minhash_signatures,
)
from .prefixjoin import jaccard_prefix_pairs

_PREFIX_ALWAYS_THRESHOLD = 0.8  # measured regime boundary, SCALE.md r9


def profile_shingle_dfs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    k: int = 5,
    profile_fraction: float = 1.0,
) -> dict[str, float]:
    """``{total_occurrences, vocab, sum_df2}`` — the router's
    classification aggregation (bounded: a 3-number collect, ONE job)."""
    if not 0.0 < profile_fraction <= 1.0:
        raise ValueError(f"profile_fraction must be in (0, 1], got {profile_fraction}")
    base = docs.select("doc_id", text_col)
    if profile_fraction < 1.0:
        base = base.sample(fraction=profile_fraction, seed=7)
    sh = compute_spread(base).select(
        F.explode(char_shingles(F.col(text_col), k)).alias("shingle")
    )
    row = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(
            F.coalesce(F.sum("df"), F.lit(0)).alias("total"),
            F.count(F.lit(1)).alias("vocab"),
            F.coalesce(F.sum(F.col("df") * F.col("df")), F.lit(0)).alias("sum_df2"),
        )
        .collect()[0]
    )
    f = profile_fraction
    return {
        "total_occurrences": float(row["total"]) / f,
        "vocab": float(row["vocab"]),
        # df scales ~f for non-hapax shingles → Σdf² scales ~f²; the 1/f²
        # blow-up over-estimates the hapax tail's contribution, which is
        # conservative toward LSH (hapax shingles join with nothing)
        "sum_df2": float(row["sum_df2"]) / (f * f),
    }


def choose_jaccard_mode(
    *,
    threshold: float,
    total_occurrences: float,
    sum_df2: float,
    num_hashes: int = 16,
    prefix_threshold: float = _PREFIX_ALWAYS_THRESHOLD,
) -> str:
    """``"prefix"`` or ``"lsh"`` from the profile (pure; test-pinnable)."""
    if threshold >= prefix_threshold:
        return "prefix"
    p = 1.0 - threshold  # prefix fraction bound (the +1 shingle is noise)
    est_prefix_candidates = p * p * sum_df2
    est_lsh_hash_ops = float(num_hashes) * total_occurrences
    return "prefix" if est_prefix_candidates <= est_lsh_hash_ops else "lsh"


def route_similarity_mode(
    threshold: float,
    *,
    prefix_threshold: float = _PREFIX_ALWAYS_THRESHOLD,
) -> str:
    """The CURATION plans' router: ``"prefix"`` at the clone threshold
    (``threshold ≥ prefix_threshold``), else ``"lsh"`` — rule 1 of the
    module routing, WITHOUT the data-dependent profile branch.

    Curation pipelines route ONCE per corpus and persist the decision
    (VERDICT r10 #3): an incremental corpus accrues leg-specific state
    (the LSH leg's stored-signatures seam), so the route must be a pure
    function of configuration — the same every fold — never of the
    corpus's current df profile, which drifts as batches land. Standalone
    similarity joins keep the full profile-routed rule via
    :func:`route_jaccard_join`.
    """
    return "prefix" if threshold >= prefix_threshold else "lsh"


def route_jaccard_join(
    docs: DataFrame,
    *,
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.6,
    num_hashes: int = 16,
    prefix_threshold: float = _PREFIX_ALWAYS_THRESHOLD,
    profile_fraction: float = 1.0,
) -> str:
    """Profile (when needed) and return the chosen mode."""
    if threshold >= prefix_threshold:
        return "prefix"
    prof = profile_shingle_dfs(
        docs, text_col=text_col, k=k, profile_fraction=profile_fraction
    )
    return choose_jaccard_mode(
        threshold=threshold,
        total_occurrences=prof["total_occurrences"],
        sum_df2=prof["sum_df2"],
        num_hashes=num_hashes,
        prefix_threshold=prefix_threshold,
    )


def _lsh_verified_pairs(
    docs: DataFrame,
    *,
    text_col: str,
    k: int,
    threshold: float,
    num_hashes: int,
    bands: int,
    max_bucket_size: int | None,
    scope: CacheScope | None,
) -> DataFrame:
    """MinHash-LSH candidates verified to the ROUTER's output contract —
    same columns as ``jaccard_prefix_pairs`` (sizes included) so the two
    legs are drop-in interchangeable. Approximate recall: a true pair is
    missed only when every band disagrees (same contract as
    ``minhash_dedup``, whose verify this mirrors with size columns)."""
    sigs = persist(
        minhash_signatures(
            docs, text_col=text_col, k=k, num_hashes=num_hashes, scope=scope
        ),
        scope,
    )
    candidates = minhash_lsh_candidates(
        sigs,
        bands=bands,
        rows_per_band=exact_rows_per_band(num_hashes, bands),
        max_bucket_size=max_bucket_size,
    )
    sets = persist(
        compute_spread(docs.select("doc_id", text_col)).select(
            "doc_id", char_shingles(F.col(text_col), k).alias("__set")
        ),
        scope,
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("__set").alias("__sa"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("__set").alias("__sb"))
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("common", F.size(F.array_intersect("__sa", "__sb")))
        .withColumn("size_a", F.size("__sa"))
        .withColumn("size_b", F.size("__sb"))
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.col("size_a") + F.col("size_b") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "common", "size_a", "size_b", "jaccard")
    )


def jaccard_pairs_auto(
    docs: DataFrame,
    *,
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.6,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int | None = None,
    prefix_threshold: float = _PREFIX_ALWAYS_THRESHOLD,
    profile_fraction: float = 1.0,
    mode: str = "auto",
    scope: CacheScope | None = None,
) -> DataFrame:
    """Near-dup pairs ``J ≥ threshold`` through the routed scale path.

    Output is ``(doc_a, doc_b, common, size_a, size_b, jaccard)`` with
    ``doc_a < doc_b`` on EITHER leg. ``mode="prefix"`` is exact;
    ``mode="lsh"`` is approximate-recall (subset of the exact answer,
    every emitted pair verified ≥ threshold — tests pin the containment);
    ``mode="auto"`` routes per the module-docstring rule.

    ``bands`` must divide ``num_hashes`` exactly: a silent
    ``num_hashes // bands`` truncation (16//3 → 5 rows/band using only 15
    of the 16 hash functions) would quietly weaken the banding's recall
    contract (VERDICT r10 #6).
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}) "
            "exactly — a truncated rows_per_band would silently ignore "
            f"{num_hashes % bands} of the hash functions"
        )
    if mode == "auto":
        mode = route_jaccard_join(
            docs,
            text_col=text_col,
            k=k,
            threshold=threshold,
            num_hashes=num_hashes,
            prefix_threshold=prefix_threshold,
            profile_fraction=profile_fraction,
        )
    if mode == "prefix":
        return jaccard_prefix_pairs(
            docs, text_col=text_col, k=k, threshold=threshold, scope=scope
        )
    if mode == "lsh":
        return _lsh_verified_pairs(
            docs,
            text_col=text_col,
            k=k,
            threshold=threshold,
            num_hashes=num_hashes,
            bands=bands,
            max_bucket_size=max_bucket_size,
            scope=scope,
        )
    raise ValueError(f"mode must be auto|prefix|lsh, got {mode!r}")


__all__ = [
    "choose_jaccard_mode",
    "jaccard_pairs_auto",
    "profile_shingle_dfs",
    "route_jaccard_join",
    "route_similarity_mode",
]
