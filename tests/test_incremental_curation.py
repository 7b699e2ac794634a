"""Incremental curation plan: stability-first batch folding."""
from __future__ import annotations

from pyspark.sql import functions as F

from etl_for_all_studies_spark.caching import CacheScope
from etl_for_all_studies_spark.operators.quality import QualityRules
from etl_for_all_studies_spark.plans.incremental_curation import curate_batch

RULES = QualityRules(min_words=5, max_words=100, min_mean_word_len=2.0,
                     max_mean_word_len=8.0, min_type_token_ratio=0.3,
                     min_stopword_ratio=0.05)

BASE = ("the quick brown fox jumps over a lazy dog near the old stone "
        "bridge while morning light settles on the quiet river town "
        "and early workers cross toward the open market square")
ALT = ("a completely different story begins when the evening train "
       "arrives at the small station and travelers with heavy bags "
       "walk slowly past the closed bakery toward their warm homes")
NEW = ("under bright summer skies the research team compared careful "
       "measurements from seven distant weather stations and noted how "
       "each sensor recorded slightly warmer readings than last year")


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_curate_batch_stability_and_new_clusters(spark):
    seen = _docs(spark, [(1, BASE + " first"), (2, ALT)])
    new = _docs(spark, [
        (100, BASE + " first"),          # dup of SEEN 1 → dropped, seen wins
        (101, NEW + " alpha"),           # near-dups 102, unrelated to seen
        (102, NEW + " alpha"),           # loses to 101
        (103, BASE.replace("fox", "cat").replace("river", "harbor")
              .replace("morning", "autumn").replace("bridge", "tunnel")
              .replace("market", "garden") + " novel tail words here"),
        (104, "tiny"),                   # fails quality
    ])
    with CacheScope() as scope:
        res = curate_batch(new, seen, rules=RULES, scope=scope)
        admitted = {r["doc_id"] for r in res.admitted.collect()}
        dropped_seen = {r["doc_id"] for r in res.dropped_vs_seen.collect()}
        clusters = {r["doc_id"]: r["cluster_id"] for r in res.new_clusters.collect()}
        quality = {r["doc_id"]: r["keep"] for r in res.quality.collect()}

    assert quality[104] == 0
    assert 100 in dropped_seen  # exact seen-dup can never be admitted
    assert clusters[101] == 101 and clusters[102] == 101  # one new cluster
    assert 101 in admitted and 102 not in admitted  # min-id keeper
    assert 104 not in admitted and 100 not in admitted


def test_curate_batch_idempotent_rerun(spark):
    seen = _docs(spark, [(1, BASE)])
    new = _docs(spark, [(200, ALT + " one"), (201, ALT.replace("evening", "noisy")
                                                  .replace("station", "harbor")
                                                  .replace("bakery", "library")
                                                  .replace("train", "boat") + " two distinct")])
    first = {r["doc_id"] for r in curate_batch(new, seen, rules=RULES).admitted.collect()}
    second = {r["doc_id"] for r in curate_batch(new, seen, rules=RULES).admitted.collect()}
    assert first == second and 200 in first


PASSAGE = "please subscribe to our trusted newsletter for daily updates"
LICENSE = "this standard license header text applies to every file"


def test_curate_batch_span_trim_across_batches(spark):
    """Two-batch e2e of the incremental span-trim stage: batch-2 passages
    repeated from batch-1 are trimmed against the ACCRUED window-hash table
    (no surviving copy in the batch — history holds it), while a passage
    repeated only within batch-2 keeps exactly one copy (keep-first)."""
    seen = _docs(spark, [(1, BASE)])
    batch1 = _docs(spark, [(10, ALT + " " + PASSAGE)])
    with CacheScope() as scope:
        res1 = curate_batch(
            batch1, seen, rules=RULES, trim_spans_w=8, scope=scope
        )
        assert {r["doc_id"] for r in res1.admitted.collect()} == {10}
        # bootstrap batch: nothing seen, nothing repeated → no trims, but
        # the batch's pre-trim hashes are surfaced for accrual
        assert res1.trimmed_spans.count() == 0
        accrued = [(r["h"],) for r in res1.new_window_hashes.collect()]
        assert len(accrued) > 0

    seen2 = _docs(spark, [(1, BASE), (10, ALT + " " + PASSAGE)])
    batch2 = _docs(spark, [
        # carries the batch-1 passage inside otherwise-novel text → every
        # occurrence trims (the corpus copy in doc 10 survives)
        (20, NEW + " " + PASSAGE + " with a fresh concluding observation"),
        # 21/22 share a batch-internal passage → min (doc, pos) copy survives
        (21, "morning couriers deliver sealed crates past the harbor gate " + LICENSE),
        (22, "quiet archivists catalog weathered maps beside the cold vault " + LICENSE),
    ])
    seen_hashes = spark.createDataFrame(accrued, "h BIGINT")
    with CacheScope() as scope:
        res2 = curate_batch(
            batch2, seen2, rules=RULES, trim_spans_w=8,
            seen_window_hashes=seen_hashes, scope=scope,
        )
        out = {r["doc_id"]: r for r in res2.admitted.collect()}
        span_rows = res2.trimmed_spans.collect()
        spans = {r["doc_id"] for r in span_rows}

    assert set(out) == {20, 21, 22}
    assert spans == {20, 22}
    assert "newsletter" not in out[20]["text"]
    assert "concluding" in out[20]["text"]          # novel tail survives
    assert "license" in out[21]["text"]             # keep-first copy intact
    assert out[21]["text"] == batch2.where("doc_id = 21").first()["text"]
    assert "license" not in out[22]["text"]
    # admitted keeps the INPUT schema (corpus appends stay reader-
    # consistent across trim/non-trim batches); removal evidence is the
    # spans themselves
    assert set(res2.admitted.columns) == set(batch2.columns)
    removed = {
        r["doc_id"]: r["span_end"] - r["span_start"] + 1 for r in span_rows
    }
    assert removed[20] >= 8 and removed[22] >= 8 and 21 not in removed


def test_curate_batch_decontaminates_before_admission(spark):
    seen = _docs(spark, [(1, BASE)])
    leak = ALT + " the exact eval question appears here verbatim"
    new = _docs(spark, [(300, leak), (301, ALT.replace("evening", "morning")
                                           .replace("bags", "coats")
                                           .replace("bakery", "library")
                                           .replace("train", "bus") + " clean novel content")])
    evals = _docs(spark, [(900, "the exact eval question appears")])
    res = curate_batch(new, seen, rules=RULES, eval_docs=evals)
    assert {r["doc_id"] for r in res.contaminated.collect()} == {300}
    admitted = {r["doc_id"] for r in res.admitted.collect()}
    assert 301 in admitted and 300 not in admitted


PREFIX = ("careful gardeners planted seven maple saplings along the "
          "narrow path")
SUFFIX = ("while distant church bells rang across the foggy valley "
          "again")
# an 8-gram that exists ONLY in doc 20's POST-trim text (last 4 prefix
# tokens ++ first 4 suffix tokens across the cut junction)
JUNCTION = "along the narrow path while distant church bells"


def test_curate_batch_accrues_post_trim_junction_hashes(spark):
    """ADVICE r6: trimming concatenates the surviving tokens, so w-grams
    SPANNING a cut junction exist in the stored corpus text but never
    existed pre-trim. The accrual must include them — a later batch
    duplicating a junction passage has to be caught."""
    seen = _docs(spark, [(1, BASE)])
    # batch A: establishes PASSAGE in the corpus (no trims — bootstrap)
    batch_a = _docs(spark, [(10, ALT + " " + PASSAGE)])
    res_a = curate_batch(batch_a, seen, rules=RULES, trim_spans_w=8)
    accrued_a = [(r["h"],) for r in res_a.new_window_hashes.collect()]
    assert res_a.trimmed_spans.count() == 0

    # batch B: doc 20 embeds PASSAGE mid-text → the 9 passage tokens trim
    # out, splicing PREFIX directly onto SUFFIX in the stored text
    seen_b = _docs(spark, [(1, BASE), (10, ALT + " " + PASSAGE)])
    batch_b = _docs(
        spark, [(20, PREFIX + " " + PASSAGE + " " + SUFFIX)]
    )
    res_b = curate_batch(
        batch_b, seen_b, rules=RULES, trim_spans_w=8,
        seen_window_hashes=spark.createDataFrame(accrued_a, "h BIGINT"),
    )
    out_b = {r["doc_id"]: r["text"] for r in res_b.admitted.collect()}
    assert "newsletter" not in out_b[20]
    assert "saplings" in out_b[20] and "foggy" in out_b[20]
    assert JUNCTION in out_b[20]  # the junction really is in stored text
    accrued_b = [(r["h"],) for r in res_b.new_window_hashes.collect()]

    # batch C: doc 30 contains the junction 8-gram verbatim — absent from
    # any PRE-trim text, present in the stored corpus. With junction
    # accrual it trims; without (the r6 bug) it would slip through.
    seen_c = _docs(
        spark,
        [(1, BASE), (10, ALT + " " + PASSAGE), (20, out_b[20])],
    )
    batch_c = _docs(spark, [(
        30,
        "morning swimmers crossed the cold lake before sunrise "
        + JUNCTION + " and nobody noticed the change",
    )])
    res_c = curate_batch(
        batch_c, seen_c, rules=RULES, trim_spans_w=8,
        seen_window_hashes=spark.createDataFrame(
            accrued_a + accrued_b, "h BIGINT"
        ),
    )
    out_c = {r["doc_id"]: r["text"] for r in res_c.admitted.collect()}
    assert 30 in out_c
    assert "church" not in out_c[30] and "narrow" not in out_c[30]
    assert "sunrise" in out_c[30] and "noticed" in out_c[30]
    assert res_c.trimmed_spans.where(F.col("doc_id") == 30).count() == 1


def test_curate_batch_routes_prefix_at_clone_threshold(spark):
    """VERDICT r10 #3 (refined r11): on this low-df fixture the profile
    router sends the incremental plan's near-dup stage to the exact
    incremental prefix join — same admissions as the LSH leg on exact
    clones (identical signatures band with probability 1, so neither leg
    can miss them), and NO signature accrual (the prefix leg keeps no
    banding state)."""
    seen = _docs(spark, [(1, BASE + " first"), (2, ALT)])
    new = _docs(spark, [
        (100, BASE + " first"),   # exact clone of SEEN 1 → dropped
        (101, NEW + " alpha"),
        (102, NEW + " alpha"),    # in-batch clone → loses to 101
    ])
    admitted = {}
    for mode in ("auto", "prefix", "lsh"):
        res = curate_batch(
            new, seen, rules=RULES, verify_threshold=0.9, dedup_mode=mode
        )
        admitted[mode] = sorted(
            r.doc_id for r in res.admitted.select("doc_id").collect()
        )
        if mode == "lsh":
            assert res.new_signatures is not None
        else:
            assert res.new_signatures is None
    assert admitted["auto"] == admitted["prefix"] == admitted["lsh"] == [101]
    # vs_seen tagging flows through the prefix leg
    res = curate_batch(new, seen, rules=RULES, verify_threshold=0.9)
    dropped = {r.doc_id for r in res.dropped_vs_seen.collect()}
    assert dropped == {100}
