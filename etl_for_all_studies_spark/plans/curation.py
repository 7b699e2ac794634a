"""End-to-end corpus curation: the training-data pipeline as ONE plan.

The individual operators (quality rules, near-dup detection, cluster
keeper selection, decontamination, deterministic sharding) are each
oracle-checked in the suite; this module is the composition a user actually
runs over a raw corpus: filter → dedup → decontaminate → shard, with audit
DataFrames at every stage.

Pipeline shape at 100 TB (each stage is linear; nothing pairwise):

1. **quality filter** — narrow per-row projections + flags, no shuffle;
2. **decontamination** — broadcast eval-set n-gram probe (train side is
   never joined pairwise). Runs BEFORE dedup on purpose: a contaminated
   document must not win a cluster's keeper election and then be removed —
   that would silently delete the whole cluster's content when a clean
   duplicate was available to keep;
3. **near-dup detection** — MinHash-LSH banding (candidates from an
   equi-join on band hashes, bounded by banding, never n²);
4. **clustering + keeper policy** — connected components over pair edges
   (edge-linear label propagation) and ONE ``max_by`` per cluster keyed by
   the configured score (longest doc by default);
5. **shard write** — deterministic portable-hash deal, one shard-keyed
   shuffle into hive partitions + manifest.

Stages communicate only through DataFrames keyed by ``doc_id``; every
decision is deterministic (hash-based or policy-ordered), so re-running the
pipeline over the same corpus reproduces byte-identical shard assignment
and keeper choices — the idempotency contract the genomic pipeline makes
for its warehouse (SURVEY §7.4.4), carried over to curation.
"""
from __future__ import annotations

import dataclasses

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import CacheScope, persist
from ..operators.contamination import decontaminate
from ..operators.dedup import minhash_dedup
from ..operators.dedup_graph import dedup_clusters, select_cluster_keepers
from ..operators.prefixjoin import jaccard_prefix_pairs
from ..operators.simjoin import route_jaccard_join
from ..operators.quality import QualityRules, annotate_quality
from ..operators.sharding import write_training_shards
from ..operators.textops import token_count


@dataclasses.dataclass
class CurationResult:
    """Audit surface of one curation run (all lazily-evaluated DataFrames).

    ``kept`` is the curated corpus; the rest explain every dropped row:
    a document is absent from ``kept`` iff it failed quality rules, hit the
    contamination probe, or lost its dup-cluster keeper election (in that
    stage order — see the module docstring for why decontamination precedes
    the election).
    """

    kept: DataFrame
    quality: DataFrame          # doc_id + rule flags + keep
    clusters: DataFrame         # doc_id, cluster_id, cluster_size, is_keeper
    keepers: DataFrame          # cluster_id, cluster_size, keeper_doc_id, score
    contaminated: DataFrame | None  # doc_id of hits (None if no eval set)
    shard_manifest: DataFrame | None  # (shard, n_docs) (None if not written)
    trimmed_spans: DataFrame | None  # (doc_id, span_start, span_end, n_windows)
    #                                  cut from kept (None unless trim_spans_w)


def curate_corpus(
    docs: DataFrame,
    *,
    rules: QualityRules | None = None,
    eval_docs: DataFrame | None = None,
    out_dir: str | None = None,
    n_shards: int = 16,
    minhash_bands: int = 2,
    verify_threshold: float = 0.5,
    minhash_max_bucket: int | None = None,
    decontaminate_n: int = 3,
    trim_spans_w: int | None = None,
    dedup_mode: str = "auto",
    scope: CacheScope | None = None,
) -> CurationResult:
    """Run the full curation pipeline over ``docs`` (doc_id, text, ...).

    Keeper policy: the longest member (whitespace tokens) of each near-dup
    cluster survives, ties to the lowest doc_id. Pass ``eval_docs`` to drop
    training documents sharing word-``decontaminate_n``-gram overlap with an
    evaluation set (default 3 — raise to 8-13 for production-size corpora,
    where longer grams cut false positives; the suite's small fixture needs
    3 to have any overlap at all). Pass ``out_dir`` to also write the kept
    corpus as deterministic training shards and return the manifest. Pass a
    ``scope`` (``caching.CacheScope``) to release the dedup sketch barriers
    after materializing the results.

    ``trim_spans_w`` additionally runs exact-substring span dedup over the
    kept corpus as the FINAL stage (``operators/spans.py``, keep-first
    semantics: one copy of every repeated ``trim_spans_w``-token passage
    survives; repeats are cut from the kept docs' text). It runs after the
    keeper election on purpose — document-level dedup first removes whole
    near-dup docs cheaply, span dedup then handles the passage-level
    remainder boilerplate inside otherwise-unique survivors. Production
    guidance: 50 tokens (the Lee et al. setting); small fixtures need ~8
    to have any repeats.

    ``minhash_max_bucket`` is the LSH hot-bucket valve passed through to
    ``minhash_lsh_candidates``: at corpus scale a boilerplate cohort's band
    bucket emits m(m-1)/2 candidate pairs, so cap it for production runs
    (pairs survive via any under-cap band). ``None`` keeps exact banding —
    the oracle-checked default.

    ``dedup_mode`` routes the near-dup stage (VERDICT r10 #3, refined
    r11): ``"auto"`` profiles the quality-passed corpus at the dedup
    stage's shingle width (``simjoin.route_jaccard_join``, the max-of-two-
    estimates rule) and takes the cheaper leg — the r10 threshold-only
    rule (``t ≥ 0.8 → prefix``) measured ~2.5× WRONG at the curation
    default k=5 shingles, where the tiny hot vocabulary makes the prefix
    join's candidate volume dwarf LSH's hashing term at every threshold
    (SCALE.md r11). The profile costs one shingle-keyed aggregation over
    the ALREADY-PERSISTED clean frame, amortized per run. ``"prefix"``
    (exact — use it when completeness is worth the measured k=5 cost) /
    ``"lsh"`` force a leg; both legs admit the same survivors on exact
    clones (test-pinned). Incremental corpora must route ONCE and persist
    the decision (``streaming/curation.py::_pin_route``) — the legs
    accrue different state.
    """
    quality = annotate_quality(docs, rules=rules)
    passed = quality.where(F.col("keep") == 1).select(docs.columns)

    contaminated = None
    clean = passed
    if eval_docs is not None:
        decon = decontaminate(passed, eval_docs, n=decontaminate_n)
        contaminated = decon.where(F.col("contaminated") == 1).select("doc_id")
        clean = passed.join(contaminated, "doc_id", "left_anti")
    # barrier: ``clean`` feeds four branches (MinHash pairs, the cluster
    # node set, the keeper scoring join, the final keep semi-join) and its
    # lineage carries the HOF-heavy quality annotations — without the
    # persist the quality pass re-executes once per branch (measured ~3.3 s
    # per execution at sf0.1, the dominant curation_pipeline cost)
    clean = persist(clean, scope)

    mode = (
        # profile the dedup stage's actual input at its shingle width
        # (k=5, the legs' shared default) — runs on the persisted frame
        route_jaccard_join(clean, k=5, threshold=verify_threshold)
        if dedup_mode == "auto"
        else dedup_mode
    )
    if mode == "prefix":
        # the regime where the exact join is ALSO the cheap one (large
        # vocab / low dfs); exactness needs no LSH hot-bucket valve
        pairs = jaccard_prefix_pairs(
            clean, threshold=verify_threshold, scope=scope
        ).select("doc_a", "doc_b")
    elif mode == "lsh":
        pairs = minhash_dedup(
            clean,
            bands=minhash_bands,
            verify_threshold=verify_threshold,
            # the LSH hot-bucket valve (minhash_lsh_candidates): production
            # corpora have boilerplate cohorts whose band buckets grow with
            # the corpus and emit m(m-1)/2 candidates — cap them here;
            # None = exact
            max_bucket_size=minhash_max_bucket,
            scope=scope,
        ).select("doc_a", "doc_b")
    else:
        raise ValueError(f"dedup_mode must be auto|prefix|lsh, got {dedup_mode!r}")
    clusters = dedup_clusters(clean, pairs, scope=scope)
    scored = clusters.join(
        clean.select(
            "doc_id", token_count(F.col("text")).cast("long").alias("__score")
        ),
        "doc_id",
    )
    keepers = select_cluster_keepers(scored, score_col="__score")
    kept = clean.join(
        keepers.select(F.col("keeper_doc_id").alias("doc_id")), "doc_id", "left_semi"
    )

    trimmed_spans = None
    if trim_spans_w is not None:
        from ..operators.spans import duplicated_spans, trim_spans

        kept = persist(kept, scope)  # span detection + rewrite share one pass
        trimmed_spans = duplicated_spans(
            kept, w=trim_spans_w, keep_first=True, scope=scope
        )
        # project back to the input schema: downstream consumers (shard
        # writer, re-curation readers) see the same columns whether or not
        # the trim stage ran; removal evidence lives on trimmed_spans
        kept = trim_spans(kept, trimmed_spans).select(docs.columns)

    manifest = None
    if out_dir is not None:
        if scope is not None:
            # barrier before the shard write: the write materializes the full
            # curation DAG; caching `kept` here lets every subsequent audit
            # count read the cached rows instead of re-running the pipeline
            kept = scope.persist(kept)
        manifest = write_training_shards(kept, out_dir, n_shards=n_shards)

    return CurationResult(
        kept=kept,
        quality=quality,
        clusters=clusters,
        keepers=keepers,
        contaminated=contaminated,
        shard_manifest=manifest,
        trimmed_spans=trimmed_spans,
    )


def leakage_safe_splits(
    docs: DataFrame,
    clusters: DataFrame,
    *,
    fractions: dict[str, float] | None = None,
) -> DataFrame:
    """Near-dup-cluster-aware train/val/test assignment: the split hash is
    keyed on the CLUSTER id (the deterministic min-doc-id component label
    from :func:`~..operators.dedup_graph.dedup_clusters`), so every member
    of a near-dup cluster — not just trivial canonical variants — lands in
    the SAME split. This closes the eval-leakage hole a per-doc (or even
    canonical-digest) split leaves open: a paraphrased or lightly-edited
    duplicate of a training doc can otherwise sit in the test set. One
    broadcast-free equi-join on doc_id + a narrow projection; the suite's
    ``splits_leakage_safe`` query demonstrates the cheaper digest-keyed
    form, this is the fuzzy-safe composition over a curation run's
    ``clusters`` audit frame."""
    from ..operators.sampling import assign_splits

    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    keyed = docs.join(clusters.select("doc_id", "cluster_id"), "doc_id")
    return assign_splits(keyed, key_col="cluster_id", fractions=fractions)


__all__ = ["CurationResult", "curate_corpus", "leakage_safe_splits"]
