"""Exact-substring duplicate spans — corpus-wide repeated token windows.

The span-level companion to document-level dedup (Lee et al., 2022,
"Deduplicating Training Data Makes Language Models Better"): even after
near-dup removal, corpora carry *repeated passages* (boilerplate headers,
license blocks, quoted chunks) inside otherwise-unique documents. The
remedy is to find every token window that occurs more than once in the
whole corpus and merge the hits into contiguous spans a trimmer can cut.

The suffix-array formulation of the paper is replaced by the Spark-native
shape — every stage linear and keyed:

1. per-doc token-hash array (portable polynomial hash per token), persisted
   — the same no-CSE-for-HOFs barrier the MinHash signatures use;
2. rolling window hash per start position: a ``w``-step fold of array
   lookups (O(tokens·w) per doc, embarrassingly parallel);
3. ONE corpus-wide groupBy on the window hash → occurrence counts; windows
   with count > 1 are duplicated (within-doc repeats count too);
4. per-doc gaps-and-islands merge of overlapping/touching hit windows into
   spans — a window partitioned by doc_id (per-doc history is the bounded
   dimension, same contract as the event-stream operators).

The corpus-wide shuffle is keyed by the window hash — cardinality ≈ total
token count, the same scale as every other token-keyed aggregation here
(vocab, BM25, LM scoring). Hash collisions (~n²/2p for p ≈ 2³¹) can merge
unrelated windows; at the paper's scale a 64-bit+ hash (or verify pass)
is the production hardening — the portable prime keeps every decision
DuckDB-replayable, which is the correctness contract this repo optimizes.

:func:`duplicated_spans_incremental` is the per-crawl-batch form: the new
batch's windows are checked against the warehouse's accumulated
window-hash table (semi-join) plus themselves — per-batch cost tracks the
BATCH token count, never the corpus history (the same new-vs-seen contract
as ``dedup.incremental_new_documents`` and the incremental MinHash/IVF
paths).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..caching import CacheScope, persist
from ..functions.hashing import BASE, MOD, poly_hash, word_tokens


def window_hashes(
    docs: DataFrame,
    *,
    w: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope: CacheScope | None = None,
) -> DataFrame:
    """(id, pos, h) — rolling portable hash of every ``w``-token window
    (1-based start positions; lowercase whitespace tokenization). The frame
    the corpus-level and incremental span detectors share; its distinct
    ``h`` column is also the warehouse state the incremental form accrues.
    """
    toks = word_tokens(F.lower(F.col(text_col)))
    th = F.transform(toks, lambda t: poly_hash(t))
    # barrier: the rolling fold below references the token-hash array once
    # per window step — inline, the whole O(tokens) hash pass would re-run
    # per step (no CSE inside HOF lambdas)
    hashed = persist(
        docs.select(F.col(id_col), th.alias("__th")).where(
            F.size(th) >= F.lit(w)
        ),
        scope,
    )
    arr = F.col("__th")
    positions = F.sequence(F.lit(1), F.size(arr) - F.lit(w - 1))
    return hashed.select(
        id_col,
        F.explode(
            F.transform(
                positions,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.aggregate(
                        F.sequence(i, i + F.lit(w - 1)),
                        F.lit(0).cast("long"),
                        lambda acc, j: (acc * F.lit(BASE) + F.element_at(arr, j))
                        % F.lit(MOD),
                    ).alias("h"),
                ),
            )
        ).alias("ph"),
    ).select(id_col, F.col("ph.pos").alias("pos"), F.col("ph.h").alias("h"))


def _merge_hit_windows(hits: DataFrame, *, w: int, id_col: str) -> DataFrame:
    """Gaps-and-islands merge of (id, pos) hit windows into maximal spans:
    a new span starts when this window clears the furthest end any earlier
    window reached (+1 merges touching spans)."""
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("pos") + F.lit(w - 1)).over(w_prev)
    new_span = (
        prev_end.isNull() | (F.col("pos") > prev_end + F.lit(1))
    ).cast("long")
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = hits.withColumn("__isl", F.sum(new_span).over(w_run))
    return islands.groupBy(id_col, "__isl").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(w - 1)).alias("span_end"),
        F.count(F.lit(1)).alias("n_windows"),
    ).drop("__isl")


def duplicated_spans(
    docs: DataFrame,
    *,
    w: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_first: bool = False,
    scope: CacheScope | None = None,
) -> DataFrame:
    """(id, span_start, span_end, n_windows) — maximal merged spans of
    corpus-duplicated ``w``-token windows, 1-based inclusive token positions.

    A window starting at position p covers tokens [p, p+w-1]; two hit
    windows merge when they overlap **or touch** (next start ≤ prev end+1),
    so a trimmer sees one contiguous duplicated region. Tokenization is the
    suite-standard lowercase whitespace split.

    ``keep_first=False`` (audit mode) flags EVERY occurrence of a
    duplicated window. ``keep_first=True`` is the Lee-et-al. removal
    semantics: the canonical occurrence — the lexicographically smallest
    (doc, pos) per window hash, chosen with one ``min`` aggregate in the
    same groupBy that counts — is exempted, so trimming the returned spans
    (:func:`trim_spans`) removes repeats while ALWAYS preserving one copy
    of the passage in the corpus.
    """
    win = window_hashes(
        docs, w=w, text_col=text_col, id_col=id_col, scope=scope
    )
    counts = win.groupBy("h").agg(
        F.count(F.lit(1)).alias("__c"),
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__keep"),
    )
    hits = win.join(counts.where(F.col("__c") > 1), "h")
    if keep_first:
        hits = hits.where(
            ~(
                (F.col(id_col) == F.col(f"__keep.{id_col}"))
                & (F.col("pos") == F.col("__keep.pos"))
            )
        )
    return _merge_hit_windows(hits.select(id_col, "pos"), w=w, id_col=id_col)


def trim_spans(
    docs: DataFrame,
    spans: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rewrite each document with its duplicated spans cut out.

    ``spans``: (id, span_start, span_end) token ranges (1-based inclusive,
    whitespace tokenization — :func:`duplicated_spans` output, typically
    with ``keep_first=True`` so one copy of every passage survives
    corpus-wide). Returns the input columns with ``text`` replaced by the
    trimmed text (original casing; whitespace normalized to single spaces)
    plus ``n_tokens_removed``. Docs without spans pass through unchanged
    modulo the whitespace normalization — do NOT feed the output back as
    position references for the ORIGINAL text.

    Shape: one broadcast-free equi-join on the doc id + a per-row HOF
    filter (O(tokens × spans-per-doc), spans-per-doc bounded by doc
    length) — no shuffle beyond the join.
    """
    sp = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
        ).alias("__spans")
    )
    joined = docs.join(sp, id_col, "left")
    toks = word_tokens(F.col(text_col))
    zipped = F.transform(
        toks, lambda t, i: F.struct(t.alias("t"), (i + F.lit(1)).alias("p"))
    )
    spans_col = F.coalesce(
        F.col("__spans"),
        F.array().cast("array<struct<s:bigint,e:bigint>>"),
    )
    kept = F.filter(
        zipped,
        lambda x: ~F.exists(
            spans_col, lambda r: (x["p"] >= r["s"]) & (x["p"] <= r["e"])
        ),
    )
    out_cols = [c for c in docs.columns if c != text_col]
    return joined.select(
        *out_cols,
        F.concat_ws(" ", F.transform(kept, lambda x: x["t"])).alias(text_col),
        (F.size(zipped) - F.size(kept)).cast("long").alias("n_tokens_removed"),
    )


def duplicated_spans_incremental(
    new_docs: DataFrame,
    seen_hashes: DataFrame,
    *,
    w: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope: CacheScope | None = None,
) -> DataFrame:
    """Per-batch duplicate spans: windows of the NEW batch that already
    occur in the accumulated corpus (``seen_hashes``: one ``h`` column, the
    distinct window hashes of everything ingested so far) **or** more than
    once within the batch itself — merged into spans exactly like
    :func:`duplicated_spans`.

    Cost contract: one pass over the batch + a semi-join against the seen
    table keyed by hash (at warehouse scale a hash-bucketed table, so the
    join co-locates) — per-batch work tracks the batch, never history².
    After trimming, append ``window_hashes(new_docs).select("h").distinct()``
    to the seen table — the same accrual contract as the incremental
    MinHash and embedding-IVF paths.
    """
    win = persist(
        window_hashes(
            new_docs, w=w, text_col=text_col, id_col=id_col, scope=scope
        ),
        scope,
    )
    counts = win.groupBy("h").agg(F.count(F.lit(1)).alias("__c"))
    in_batch = win.join(counts.where(F.col("__c") > 1), "h").select(
        id_col, "pos"
    )
    vs_seen = win.join(
        seen_hashes.select("h").distinct(), "h", "left_semi"
    ).select(id_col, "pos")
    hits = in_batch.unionByName(vs_seen).distinct()
    return _merge_hit_windows(hits, w=w, id_col=id_col)


__all__ = [
    "duplicated_spans",
    "duplicated_spans_incremental",
    "trim_spans",
    "window_hashes",
]
