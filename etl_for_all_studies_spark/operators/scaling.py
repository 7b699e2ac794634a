"""Feature scaling for embedding columns: per-dimension standardization.

Embedding pipelines (k-means codebooks, IVF cells, SQ8 quantization — all in
``operators/similarity.py``/``quantization.py``) assume dimensions on
comparable scales; raw encoder outputs often aren't. Z-scoring per dimension
is the standard fix, and its Spark-first shape matters:

* per-dim statistics come from ONE ``posexplode`` + groupBy(dim) pass —
  the result is **dimension-bounded** (dim rows, not corpus rows), the same
  "small enough for the driver" contract as k-means centroids;
* the standardization itself is a **shuffle-free narrow projection**:
  the dim-length mean/std vectors are embedded as literal arrays and each
  row is transformed with an indexed ``transform`` lambda — the corpus is
  scanned once for stats and once for scaling, with nothing per-row in
  Python and no join on the data path;
* zero-variance dimensions standardize to NULL (``nullif`` guard — ANSI
  mode would otherwise error on the divide), making dead dims visible
  instead of silently zero.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import compute_spread


def dimension_stats(
    vectors: DataFrame, *, vec_col: str = "embedding"
) -> list[tuple[float, float]]:
    """[(mean, stddev_pop)] per dimension — dim-bounded driver result."""
    # spread before the per-element explode: a single-split scan would run
    # the whole d×n explode+aggregate map side on one task (partitioning.py)
    exploded = compute_spread(vectors.select(vec_col)).select(
        F.posexplode(F.col(vec_col)).alias("dim", "v")
    ).select("dim", F.col("v").cast("double").alias("v"))
    rows = (
        exploded.groupBy("dim")
        .agg(F.avg("v").alias("mu"), F.stddev_pop("v").alias("sigma"))
        .orderBy("dim")
        .collect()
    )
    return [(r["mu"], r["sigma"]) for r in rows]


def standardize_vectors(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: list[tuple[float, float]] | None = None,
) -> DataFrame:
    """(id, standardized array<double>): ``(x - μ_dim) / σ_dim`` per element.

    ``stats`` defaults to :func:`dimension_stats` over the input; pass
    precomputed stats to standardize a stream/new batch against a frozen
    training distribution (the usual serving contract).
    """
    if stats is None:
        stats = dimension_stats(vectors, vec_col=vec_col)
    mu = F.array(*[F.lit(m) for m, _ in stats])
    sigma = F.array(*[F.lit(s) for _, s in stats])
    vectors = compute_spread(vectors.select(id_col, vec_col))
    return vectors.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x, i: (x.cast("double") - F.element_at(mu, i + 1))
            / F.nullif(F.element_at(sigma, i + 1), F.lit(0.0)),
        ).alias("z"),
    )


__all__ = ["dimension_stats", "standardize_vectors"]
