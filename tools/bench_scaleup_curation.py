#!/usr/bin/env python
"""Composed-plan scale-up probe: the END-TO-END curation pipelines at 1x
vs Nx documents (and Nx history for the incremental plan).

The per-operator probes (``bench_scaleup.py``, ``bench_scaleup_spans.py``)
establish each stage scales; this one measures the COMPOSITION —
``plans/curation.py::curate_corpus`` and
``plans/incremental_curation.py::curate_batch`` — because the composition
is where a hidden recompute bites: six stages chained through CacheScope
persist barriers, each feeding several downstream branches. A barrier that
silently stopped covering a branch would re-execute an upstream stage's
lineage once per consumer, which a per-operator probe can never see.

Instrumentation (``tools/stage_metrics.py``, Spark-UI REST): per measured
run we record executed vs skipped stage counts, input bytes, and shuffle
bytes. Pass criteria:

* wall ratio ~ linear in the document multiplier (batch) / near-flat in
  the history multiplier (incremental — per-batch cost is governed by the
  batch, the history enters only through hash-keyed joins);
* the executed-stage NAME MULTISET is identical at 1x and Nx — a fixed
  plan executes a fixed stage graph, so any stage name occurring more
  often at Nx is a recompute (e.g. storage-evicted barrier partitions);
* scan amplification (input bytes / on-disk corpus bytes) stays flat.

Corpora are REPLICATED WITH A PER-COPY QUALITY-INVARIANT WORD CIPHER:
each copy maps the characters of every NON-STOPWORD token through a
per-copy AFFINE substitution (312 distinct ciphers — injective past the
26-copy wrap a plain rotation would hit at the 100x point) and leaves the
quality rules' stopwords verbatim. Unlike the plain
alphabet rotation the dedup probes use, this keeps every quality metric
(word count, word lengths, type-token ratio, stopword ratio) bit-identical
per copy — a plain rotation turns the stopwords into gibberish and the
quality stage drops copies 1..k-1 WHOLESALE, so every stage downstream of
quality would see 1x data at the "10x" point and the ratio would measure
nothing (observed: kept-count identical at 1x and 10x). Cross-copy texts
stay distinct (ciphered shingles share nothing beyond stopword islands),
so per-copy duplicate structure is constant and cross-copy dup pairs are
absent — the ratio isolates n-scaling. Corpora are then WRITTEN TO
PARQUET and read back, so the probe exercises the real storage-scan path
and input-bytes are interpretable. (Contamination hits stay constant — the
un-ciphered eval set overlaps copy 0 only — but the decon join still scans
every copy's n-grams, which is the scaling that matters.)

Usage: python tools/bench_scaleup_curation.py [batch|incremental|all] [mult] [cap]

``cap`` (optional, batch mode): pass the LSH hot-bucket valve
(``curate_corpus(minhash_max_bucket=cap)``) — the cipher corpus's
stopword-island band buckets grow with the copy count and emit m(m-1)/2
candidates (measured 164x candidates at 10x, round 7), which is exactly
the boilerplate-cohort shape the valve exists for; with the cap the
probe's input/shuffle growth should collapse to ~linear.
"""
from __future__ import annotations

import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tools.stage_metrics import diff_stages, fmt_bytes, stage_snapshot

UI_PORT = 4046
W = 8  # span-trim window width: sf-scale fixtures need ~8 to have repeats
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _spark():
    from etl_for_all_studies_spark.session import get_spark

    return get_spark(
        app_name="bench-scaleup-curation",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            # the probes NEED the UI: stage metrics come from its REST API
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "5000",
            "spark.driver.memory": "48g",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )


# multipliers coprime to 26 — with 26 shifts that is 312 distinct affine
# ciphers, so copy indices stay injective far past the 26 where the old
# plain-rotation family wrapped (copies i and i+26 became EXACT cross-copy
# duplicates, which would hand the 100x probe a dedup explosion that
# measures the cipher, not the engine)
_AFFINE_A = (1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)


def _cipher(text_col, idx: int):
    """Substitute the chars of every non-stopword token through the idx-th
    AFFINE cipher (letter p → a·p + b mod 26); keep the quality rules'
    stopwords verbatim. Bijective per token, so word count / word lengths /
    TTR / stopword ratio — every quality metric — are unchanged, while the
    text content (shingles, window hashes) is disjoint across cipher
    indices. idx=0 is the identity (copy 0 keeps the raw text, which is
    what the un-ciphered eval set overlaps for the decontamination leg)."""
    from pyspark.sql import functions as F

    from etl_for_all_studies_spark.operators.quality import STOPWORDS

    a = _AFFINE_A[(idx // 26) % len(_AFFINE_A)]
    b = idx % 26
    if a == 1 and b == 0:
        return text_col
    mapped = "".join(ALPHA[(a * p + b) % 26] for p in range(26))
    return F.array_join(
        F.transform(
            F.split(text_col, " "),
            lambda w: F.when(w.isin(*STOPWORDS), w).otherwise(
                F.translate(w, ALPHA, mapped)
            ),
        ),
        " ",
    )


def _replicated_dir(
    spark, k: int, tmp: str, *, offset_tag: int = 0, rot_offset: int = 0
) -> str:
    """Write the k-x ciphered corpus to parquet, return its path.

    ``rot_offset`` shifts the per-copy cipher rotations so two corpora can
    be made textually DISJOINT (the incremental batch must be mostly new
    content vs the seen history, or vs-seen dedup trivially drops it all).
    """
    from pyspark.sql import functions as F

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    out = f"{tmp}/docs_{offset_tag}_{k}x.parquet"
    copies = [
        base.select(
            (F.col("doc_id") + F.lit((offset_tag + i) * 1_000_000)).alias(
                "doc_id"
            ),
            _cipher(F.col("text"), rot_offset + i).alias("text"),
        )
        for i in range(k)
    ]
    docs = copies[0]
    for c in copies[1:]:
        docs = docs.unionByName(c)
    docs.repartition(max(32, k)).write.mode("overwrite").parquet(out)
    return out


def _dir_bytes(path: str) -> int:
    return sum(p.stat().st_size for p in pathlib.Path(path).rglob("*.parquet"))


def _eval_docs(spark):
    """A small fixed eval set: 20 documents' texts (decontamination probe)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .orderBy("doc_id")
        .limit(20)
        .select(F.col("doc_id").alias("eval_id"), "text")
    )


def _run_batch(spark, docs_dir: str, eval_docs, cap: int | None = None) -> dict:
    """One timed end-to-end curate_corpus over the parquet corpus."""
    from pyspark.sql import functions as F  # noqa: F401

    from etl_for_all_studies_spark.caching import CacheScope
    from etl_for_all_studies_spark.plans.curation import curate_corpus

    docs = spark.read.parquet(docs_dir).select("doc_id", "text")
    before = stage_snapshot(UI_PORT)
    t0 = time.monotonic()
    with CacheScope() as scope:
        res = curate_corpus(
            docs, eval_docs=_rename_eval(eval_docs), trim_spans_w=W,
            minhash_max_bucket=cap, scope=scope,
        )
        # the run_curation.py audit surface: kept + drop-evidence counts
        n_kept = res.kept.count()
        n_contam = res.contaminated.count()
        n_trim = res.trimmed_spans.count()
    wall = time.monotonic() - t0
    metrics = diff_stages(before, stage_snapshot(UI_PORT))
    spark.catalog.clearCache()
    return {
        "wall": wall,
        "kept": n_kept,
        "contam": n_contam,
        "trimmed": n_trim,
        **metrics,
    }


def _rename_eval(eval_docs):
    from pyspark.sql import functions as F

    return eval_docs.select(F.col("eval_id").alias("doc_id"), "text")


def _run_incremental(spark, batch_dir: str, seen_dir: str, seen_hashes) -> dict:
    """One timed end-to-end curate_batch: fixed batch vs a seen corpus."""
    from etl_for_all_studies_spark.caching import CacheScope
    from etl_for_all_studies_spark.plans.incremental_curation import curate_batch

    new_docs = spark.read.parquet(batch_dir).select("doc_id", "text")
    seen_docs = spark.read.parquet(seen_dir).select("doc_id", "text")
    before = stage_snapshot(UI_PORT)
    t0 = time.monotonic()
    with CacheScope() as scope:
        res = curate_batch(
            new_docs,
            seen_docs,
            trim_spans_w=W,
            seen_window_hashes=seen_hashes,
            scope=scope,
        )
        n_admitted = res.admitted.count()
        n_dropped = res.dropped_vs_seen.count()
        n_trim = res.trimmed_spans.count()
        n_accrue = res.new_window_hashes.count()
    wall = time.monotonic() - t0
    metrics = diff_stages(before, stage_snapshot(UI_PORT))
    spark.catalog.clearCache()
    return {
        "wall": wall,
        "admitted": n_admitted,
        "dropped_vs_seen": n_dropped,
        "trimmed": n_trim,
        "accrued_hashes": n_accrue,
        **metrics,
    }


def _report(tag: str, k: int, runs_1x: list[dict], runs_kx: list[dict],
            bytes_1x: int, bytes_kx: int) -> None:
    b1 = min(runs_1x, key=lambda r: r["wall"])
    bk = min(runs_kx, key=lambda r: r["wall"])
    ratio = bk["wall"] / b1["wall"]
    amp1 = b1["input_bytes"] / max(bytes_1x, 1)
    ampk = bk["input_bytes"] / max(bytes_kx, 1)
    from collections import Counter

    extra = Counter(bk["names"]) - Counter(b1["names"])
    print(f"== {tag} (1x vs {k}x) ==")
    print(
        f"  wall: {b1['wall']:.2f}s -> {bk['wall']:.2f}s  ratio {ratio:.2f}x"
    )
    print(
        f"  stages executed/skipped: {b1['executed']}/{b1['skipped']} -> "
        f"{bk['executed']}/{bk['skipped']}"
    )
    print(
        f"  input: {fmt_bytes(b1['input_bytes'])} -> "
        f"{fmt_bytes(bk['input_bytes'])}  scan amplification "
        f"{amp1:.1f}x -> {ampk:.1f}x (corpus {fmt_bytes(bytes_1x)} / "
        f"{fmt_bytes(bytes_kx)})"
    )
    print(
        f"  shuffle write: {fmt_bytes(b1['shuffle_write'])} -> "
        f"{fmt_bytes(bk['shuffle_write'])}"
    )
    counts1 = {kk: v for kk, v in b1.items() if kk in (
        "kept", "contam", "trimmed", "admitted", "dropped_vs_seen",
        "accrued_hashes")}
    countsk = {kk: v for kk, v in bk.items() if kk in counts1}
    print(f"  results: 1x={counts1}  {k}x={countsk}")
    if extra:
        print(f"  RECOMPUTE SUSPECTS (stage names more frequent at {k}x):")
        for name, n in extra.most_common(10):
            print(f"    +{n}  {name}")
    else:
        print(f"  recompute check: executed-stage name multiset at {k}x "
              f"== 1x (no stage lineage ran extra times)")


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else None
    spark = _spark()
    tmp = tempfile.mkdtemp(prefix="curation_probe_")
    try:
        eval_docs = _eval_docs(spark).persist()
        eval_docs.count()

        if mode in ("batch", "all"):
            d1 = _replicated_dir(spark, 1, tmp)
            dk = _replicated_dir(spark, mult, tmp)
            runs1 = [_run_batch(spark, d1, eval_docs, cap) for _ in range(2)]
            runsk = [_run_batch(spark, dk, eval_docs, cap) for _ in range(2)]
            tag = "curate_corpus" if cap is None else f"curate_corpus cap={cap}"
            _report(tag, mult, runs1, runsk,
                    _dir_bytes(d1), _dir_bytes(dk))

        if mode in ("incremental", "all"):
            from etl_for_all_studies_spark.operators.spans import window_hashes

            # cipher index 200 (affine family 7): outside the seen copies'
            # indices (0..mult-1, families 0..3 even at mult=100) — the
            # batch shares no ciphered text with the seen corpus, i.e.
            # mostly-new content, the regime the incremental plan exists for
            batch_dir = _replicated_dir(
                spark, 1, tmp, offset_tag=900, rot_offset=200
            )
            s1 = _replicated_dir(spark, 1, tmp, offset_tag=100)
            sk = _replicated_dir(spark, mult, tmp, offset_tag=200)
            runs1, runsk = [], []
            for seen_dir, runs in ((s1, runs1), (sk, runsk)):
                seen = spark.read.parquet(seen_dir).select("doc_id", "text")
                hashes = (
                    window_hashes(seen, w=W).select("h").distinct().persist()
                )
                hashes.count()  # the warehouse hash table is stored, not timed
                for _ in range(2):
                    runs.append(
                        _run_incremental(spark, batch_dir, seen_dir, hashes)
                    )
                hashes.unpersist()
            _report("curate_batch", mult, runs1, runsk,
                    _dir_bytes(s1), _dir_bytes(sk))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
