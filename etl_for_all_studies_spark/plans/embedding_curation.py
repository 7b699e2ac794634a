"""End-to-end embedding curation: the vector half of the training-data
pipeline as ONE plan — the embedding analog of ``plans/curation.py``.

Pipeline shape at 100 TB (every stage is a shape already proven by its
stand-alone operator; this module is the composition a user actually runs
over an embedding table):

1. **semantic near-dup detection** — IVF-bucketed candidates → cosine
   verify (``similarity.embedding_near_duplicates_ivf``): Σ|cell|² work,
   never n².
2. **clustering** — connected components over the verified pair edges
   (``dedup_graph.connected_components``): min-label + pointer jumping,
   O(log diameter) rounds.
3. **keeper election** — the cluster label IS the minimum member id, so
   keepers need no extra aggregation: ``node == cluster_id`` (callers
   wanting policy-based election join a score and use
   ``select_cluster_keepers`` exactly as the text pipeline does).
4. **SQ8 quantization** — the kept vectors are encoded against a codebook
   fitted on the FULL corpus (pre-dedup): the codebook must not shift when
   the kept set changes, or incremental re-curation would re-encode
   history.

Deterministic end to end (hash-free: cell assignment, CC labels, and codes
are all pure functions of the data), so reruns reproduce byte-identical
outputs — and the whole composition is oracle-checkable as one chained SQL
statement (suite query ``embedding_pipeline``).
"""
from __future__ import annotations

import dataclasses

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import CacheScope
from ..operators.dedup_graph import connected_components
from ..operators.quantization import fit_scalar_quantizer, quantize_embeddings
from ..operators.similarity import embedding_near_duplicates_ivf


@dataclasses.dataclass
class EmbeddingCurationResult:
    """Audit surface of one embedding-curation run (lazy DataFrames)."""

    kept_codes: DataFrame       # vec_id, cluster_size, codes (SQ8)
    clusters: DataFrame         # vec_id, cluster_id, cluster_size, is_keeper
    pairs: DataFrame            # doc_a, doc_b, cos_sim (verified near-dups)
    quantizer: DataFrame        # pos, lo, hi (full-corpus codebook)


def curate_embeddings(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    threshold: float = 0.95,
    n_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scope: CacheScope | None = None,
) -> EmbeddingCurationResult:
    """Run the full embedding curation pipeline over ``vectors``."""
    pairs = embedding_near_duplicates_ivf(
        vectors, centroids,
        threshold=threshold, n_probes=n_probes,
        id_col=id_col, vec_col=vec_col, scope=scope,
    )
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")),
        nodes=vectors.select(F.col(id_col).alias("node")),
        scope=scope,
    )
    sizes = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    clusters = comp.join(sizes, "cluster_id").select(
        F.col("node").alias(id_col),
        "cluster_id",
        "cluster_size",
        (F.col("node") == F.col("cluster_id")).cast("long").alias("is_keeper"),
    )
    quantizer = fit_scalar_quantizer(vectors, vec_col=vec_col)
    kept = vectors.join(
        clusters.where(F.col("is_keeper") == 1).select(id_col, "cluster_size"),
        id_col,
    )
    codes = quantize_embeddings(
        kept, quantizer, id_col=id_col, vec_col=vec_col
    ).join(clusters.where(F.col("is_keeper") == 1).select(id_col, "cluster_size"), id_col)
    return EmbeddingCurationResult(
        kept_codes=codes.select(id_col, "cluster_size", "codes"),
        clusters=clusters,
        pairs=pairs,
        quantizer=quantizer,
    )


__all__ = ["EmbeddingCurationResult", "curate_embeddings"]
