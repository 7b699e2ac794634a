"""Similarity search over embedding columns (``array<float>``).

Beyond-reference capability (BASELINE.json north star):

* **brute-force cosine top-k** — the correctness baseline: query×corpus join
  with a JVM-side dot product (``aggregate``/``zip_with``), windowed top-k.
  Right answer, O(Q·N) — fine for small Q, and the oracle for the ANN path.
* **IVF (inverted-file) ANN** — the scale path: pick C centroids, assign
  every vector to its nearest centroid (narrow per-row computation against a
  broadcast centroid list), then search only the query's probe cells. The
  candidate join is an equi-join on ``cell``, so the shuffle is keyed by
  cell — never all-pairs. Recall is tunable via ``n_probes``.

Both are pure DataFrame ops; no Python in the row path.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ over two array columns (float64 accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, neighbor_id, cos_sim, rank).

    Self-matches are excluded; ties break deterministically on neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its ``n_probes`` nearest centroid cells (by
    cosine). Centroids are broadcast; output (id, cell, probe_rank)."""
    v = vectors.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vv"))
    cent = centroids.select(
        F.col("cell").alias("cell"), F.col(vec_col).alias("centv")
    )
    scored = v.join(F.broadcast(cent)).select(
        "vid", "cell", cosine(F.col("vv"), F.col("centv")).alias("sim")
    )
    w = Window.partitionBy("vid").orderBy(F.col("sim").desc(), F.col("cell").asc())
    return (
        scored.withColumn("probe_rank", F.row_number().over(w))
        .where(F.col("probe_rank") <= n_probes)
        .select("vid", "cell", "probe_rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    k: int = 3,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: corpus vectors live in their nearest cell; each query
    scans only its ``n_probes`` nearest cells. Returns
    (query_id, neighbor_id, cos_sim, rank)."""
    corpus_cells = assign_cells(
        corpus, centroids, n_probes=1, id_col=id_col, vec_col=vec_col
    ).select(F.col("vid").alias("neighbor_id"), "cell")
    query_cells = assign_cells(
        queries, centroids, n_probes=n_probes, id_col=id_col, vec_col=vec_col
    ).select(F.col("vid").alias("query_id"), "cell")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    candidates = (
        query_cells.join(corpus_cells, on="cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = (
        candidates.join(q, on="query_id")
        .join(c, on="neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_near_duplicates(
    vectors: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold (brute-force form;
    for scale, route through :func:`ivf_topk` cells first)."""
    a = vectors.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim")
        )
        .where(F.col("cos_sim") >= threshold)
    )


__all__ = [
    "assign_cells",
    "brute_force_topk",
    "cosine",
    "dot",
    "embedding_near_duplicates",
    "ivf_topk",
    "norm",
]
