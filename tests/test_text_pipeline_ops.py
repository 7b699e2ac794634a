"""Unit tests for the text-pipeline operators added on top of the curation
set: decontamination, repetition metrics, PII redaction, BM25 ranking, and
budgeted domain mixing."""
import math

import pytest
from pyspark.sql import functions as F

from etl_for_all_studies_spark.operators.contamination import (
    decontaminate,
    word_ngrams,
)
from etl_for_all_studies_spark.operators.quality import repetition_metrics
from etl_for_all_studies_spark.operators.ranking import bm25_scores, bm25_topk
from etl_for_all_studies_spark.operators.sampling import mix_to_budget
from etl_for_all_studies_spark.operators.textops import redact_pii


# ---------------------------------------------------------------- ngrams


def test_word_ngrams_short_text_guard(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("",), ("solo",)], ["text"]
    ).select(word_ngrams(F.col("text"), 3).alias("g"))
    rows = [r.g for r in df.collect()]
    assert rows[0] == ["a b c", "b c d"]
    assert rows[1] == []  # shorter than n → no spurious gram
    assert rows[2] == []
    assert rows[3] == []


def test_word_ngrams_distinct(spark):
    df = spark.createDataFrame([("x y x y x y",)], ["text"]).select(
        word_ngrams(F.col("text"), 2).alias("g")
    )
    assert sorted(df.first().g) == ["x y", "y x"]


# ---------------------------------------------------------- decontaminate


def test_decontaminate_flags_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # shares "quick brown fox"
            (2, "totally unrelated training text here"),
            (3, ""),  # empty doc: zero grams, never contaminated
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "benchmark asks about the quick brown fox riddle")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in decontaminate(train, ev, n=3).collect()}
    assert out[1].contaminated == 1 and out[1].n_overlap_ngrams >= 1
    assert out[2].contaminated == 0 and out[2].n_overlap_ngrams == 0
    assert out[3].contaminated == 0
    assert len(out) == 3  # every train doc present


def test_decontaminate_counts_distinct_grams(spark):
    # the shared gram appears twice in train doc — distinct-per-doc counting
    # reports it once
    train = spark.createDataFrame([(1, "a b c x a b c")], ["doc_id", "text"])
    ev = spark.createDataFrame([(9, "a b c")], ["doc_id", "text"])
    row = decontaminate(train, ev, n=3).first()
    assert row.n_overlap_ngrams == 1


# ------------------------------------------------------------- repetition


def test_repetition_metrics_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "go go go go"),     # bigrams: 3x "go go" → top frac 1.0
            (2, "a b c d"),          # all distinct
            (3, ""),                 # empty: everything 0
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in repetition_metrics(docs).collect()}
    assert out[1].n_grams == 3 and out[1].top_gram_frac == 1.0
    assert out[1].dup_token_frac == pytest.approx(1 - 1 / 4)
    assert out[2].top_gram_frac == pytest.approx(1 / 3)
    assert out[2].dup_token_frac == 0.0
    assert out[3].n_grams == 0
    assert out[3].top_gram_frac == 0.0 and out[3].dup_token_frac == 0.0


# -------------------------------------------------------------------- pii


def test_redact_pii_masks_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call +1 555-123-4567 or visit 192.168.0.1 twice 10.0.0.7"),
            (3, "clean text with no pii at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert out[1].n_pii_email == 1
    assert out[1].text == "mail [PII:email] now"
    assert out[2].n_pii_phone == 1 and out[2].n_pii_ipv4 == 2
    assert "[PII:phone]" in out[2].text and out[2].text.count("[PII:ipv4]") == 2
    assert out[3].text == "clean text with no pii at all"
    assert out[3].n_pii_email == out[3].n_pii_phone == out[3].n_pii_ipv4 == 0


# ------------------------------------------------------------------- bm25


def test_bm25_scores_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark"),
            (2, "spark is nice"),
            (3, "nothing relevant"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in bm25_scores(docs, ["spark"]).collect()}
    assert set(out) == {1, 2}  # non-matching doc omitted
    # N=3, df=2, idf = ln(1 + 1.5/2.5); doc1: tf=3, dl=3, avgdl=8/3
    idf = math.log(1 + 1.5 / 2.5)
    expect1 = idf * (3 * 2.2) / (3 + 1.2 * (1 - 0.75 + 0.75 * 3 / (8 / 3)))
    assert out[1].score == pytest.approx(expect1)
    assert out[1].score > out[2].score


def test_bm25_topk_deterministic_ties(spark):
    docs = spark.createDataFrame(
        [(i, "tie tie tie") for i in range(10)], ["doc_id", "text"]
    )
    top = bm25_topk(docs, ["tie"], k=5).collect()
    assert [r.doc_id for r in top] == [0, 1, 2, 3, 4]  # id-ordered on ties


# ------------------------------------------------------------ plan shapes


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_probes_eval_set_via_broadcast(spark):
    train = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    ev = spark.createDataFrame([(9, "c d e")], ["doc_id", "text"])
    plan = _executed_plan(decontaminate(train, ev))
    # the train-side n-gram probe must be a broadcast hash join — a shuffled
    # join here would re-shuffle the full corpus against a benchmark-sized set
    assert "BroadcastHashJoin" in plan, plan


def test_bm25_stats_joined_by_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, "spark join window scan") for i in range(5)], ["doc_id", "text"]
    )
    plan = _executed_plan(bm25_scores(docs, ["spark", "join"]))
    # per-term df joins by broadcast hash; the keyless scalar corpus stats
    # ride a broadcast nested-loop (one row — effectively a literal). The
    # doc side must never sort-merge against either.
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


# ------------------------------------------------------------ mix budget


def test_mix_to_budget_rates_and_determinism(spark):
    rows = [(i, "big" if i < 800 else "small", 100) for i in range(1000)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    weights = spark.createDataFrame(
        [("big", 1.0), ("small", 1.0)], ["source", "weight"]
    )
    kept = mix_to_budget(
        docs,
        stratum_col="source",
        weight_col_df=weights,
        token_col="n_tokens",
        budget_tokens=40_000,
        key_col="doc_id",
    )
    rates = {
        r.source: r.keep_rate_mille
        for r in kept.select("source", "keep_rate_mille").distinct().collect()
    }
    # big: target 20k / actual 80k → 250‰; small: 20k / 20k → capped at 1000‰
    assert rates == {"big": 250, "small": 1000}
    assert kept.where(F.col("source") == "small").count() == 200  # kept whole
    # deterministic: identical decisions on a rerun
    again = mix_to_budget(
        docs,
        stratum_col="source",
        weight_col_df=weights,
        token_col="n_tokens",
        budget_tokens=40_000,
        key_col="doc_id",
    )
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in again.collect()
    )
    # scale shape: the rate dim joins by broadcast — the corpus side of the
    # mix never takes a wide shuffle
    assert "BroadcastHashJoin" in _executed_plan(kept)


def test_mix_to_budget_zero_token_stratum_kept_whole(spark):
    docs = spark.createDataFrame(
        [(1, "empty", 0), (2, "empty", 0), (3, "full", 100)],
        ["doc_id", "source", "n_tokens"],
    )
    weights = spark.createDataFrame(
        [("empty", 1.0), ("full", 1.0)], ["source", "weight"]
    )
    kept = mix_to_budget(
        docs,
        stratum_col="source",
        weight_col_df=weights,
        token_col="n_tokens",
        budget_tokens=100,
        key_col="doc_id",
    )
    # zero-token stratum costs nothing: kept whole, no divide-by-zero
    assert kept.where(F.col("source") == "empty").count() == 2


# --------------------------------------------------- property-based checks


def _py_ngrams(text, n):
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_decontaminate_matches_python_oracle(spark):
    from hypothesis import given, settings, strategies as st

    words = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
    text = st.lists(words, min_size=0, max_size=8).map(" ".join)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(text, min_size=1, max_size=5), st.lists(text, min_size=1, max_size=3))
    def check(train_texts, eval_texts):
        train = spark.createDataFrame(
            list(enumerate(train_texts)), ["doc_id", "text"]
        )
        ev = spark.createDataFrame(
            [(100 + i, t) for i, t in enumerate(eval_texts)], ["doc_id", "text"]
        )
        got = {
            r.doc_id: r.n_overlap_ngrams
            for r in decontaminate(train, ev, n=2).collect()
        }
        eval_grams = set().union(*(_py_ngrams(t, 2) for t in eval_texts))
        want = {
            i: len(_py_ngrams(t, 2) & eval_grams)
            for i, t in enumerate(train_texts)
        }
        assert got == want

    check()


def test_repetition_matches_python_oracle(spark):
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    words = st.sampled_from(["x", "y", "z"])
    text = st.lists(words, min_size=0, max_size=10).map(" ".join)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(text, min_size=1, max_size=4))
    def check(texts):
        docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
        got = {r.doc_id: r for r in repetition_metrics(docs).collect()}
        for i, t in enumerate(texts):
            toks = t.lower().split()
            grams = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
            assert got[i].n_grams == len(grams)
            if grams:
                top = Counter(grams).most_common(1)[0][1]
                assert got[i].top_gram_frac == pytest.approx(top / len(grams))
            else:
                assert got[i].top_gram_frac == 0.0
            if toks:
                assert got[i].dup_token_frac == pytest.approx(
                    1 - len(set(toks)) / len(toks)
                )

    check()


def test_bm25_matches_python_oracle(spark):
    from hypothesis import given, settings, strategies as st

    words = st.sampled_from(["q1", "q2", "w", "x"])
    text = st.lists(words, min_size=1, max_size=8).map(" ".join)

    def py_bm25(texts, terms, k1=1.2, b=0.75):
        toks = [t.lower().split() for t in texts]
        n = len(toks)
        avgdl = sum(map(len, toks)) / n
        out = {}
        for i, doc in enumerate(toks):
            score, hits = 0.0, 0
            for term in terms:
                tf = doc.count(term)
                if tf == 0:
                    continue
                df = sum(1 for d in toks if term in d)
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                score += idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * len(doc) / avgdl)
                )
                hits += 1
            if hits:
                out[i] = (hits, score)
        return out

    @settings(max_examples=10, deadline=None)
    @given(st.lists(text, min_size=1, max_size=6))
    def check(texts):
        docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
        got = {
            r.doc_id: (r.n_hit_terms, r.score)
            for r in bm25_scores(docs, ["q1", "q2"]).collect()
        }
        want = py_bm25(texts, ["q1", "q2"])
        assert set(got) == set(want)
        for i in want:
            assert got[i][0] == want[i][0]
            assert got[i][1] == pytest.approx(want[i][1])

    check()


def test_unigram_logprob_ranks_rare_token_docs_lower(spark):
    import math

    from etl_for_all_studies_spark.operators.textops import unigram_logprob_scores

    # corpus: "common" appears 6x, each zX once → doc 2 (all-rare) must score
    # lower than doc 1 (all-common); values are exactly computable by hand
    rows = [
        (1, "common common common"),
        (2, "z1 z2 z3"),
        (3, "common common common z4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_logprob_scores(df).collect()}
    total = 10.0
    assert out[1]["n_tokens"] == 3
    assert out[1]["mean_log10_prob"] == pytest.approx(math.log10(6 / total))
    assert out[2]["mean_log10_prob"] == pytest.approx(math.log10(1 / total))
    expected3 = (3 * math.log10(6 / total) + math.log10(1 / total)) / 4
    assert out[3]["mean_log10_prob"] == pytest.approx(expected3)
    assert out[2]["mean_log10_prob"] < out[3]["mean_log10_prob"] < out[1]["mean_log10_prob"]


def test_correlated_subquery_decorrelates_to_one_join(spark, tmp_path):
    """q_orders_above_avg's docstring claims Catalyst decorrelates the
    scalar subquery into aggregate+join — pin that: exactly one join in the
    executed plan, and it is broadcast-hash, with no per-row subquery node."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_for_all_studies_spark.suite import q_orders_above_avg

    d = tmp_path / "sf"
    d.mkdir()
    table = pa.table(
        {
            "o_orderkey": pa.array(range(20), pa.int64()),
            "o_custkey": pa.array([i % 4 for i in range(20)], pa.int64()),
            "o_totalprice": pa.array([100.0 + i for i in range(20)], pa.float64()),
        }
    )
    pq.write_table(table, str(d / "orders.parquet"))
    plan = (
        q_orders_above_avg(spark, str(d))
        ._jdf.queryExecution().executedPlan().toString()
    )
    joins = [l for l in plan.splitlines() if "Join" in l]
    assert len(joins) == 1 and "BroadcastHashJoin" in joins[0], plan


# ---- interpolated bigram LM ----------------------------------------------

def test_bigram_logprob_scores_small_corpus(spark):
    """Hand-checkable corpus: P(w2|w1) = 0.75·c12/c1 + 0.25·c(w2)/N, score =
    weighted mean log10 over a doc's bigram occurrences; <2-token docs get
    n_bigrams=0 and NULL score."""
    import math

    from etl_for_all_studies_spark.operators.textops import bigram_logprob_scores

    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat ran"),
            (3, "cat"),          # 1 token -> no bigrams
            (4, "  "),           # whitespace-only -> no tokens at all
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in bigram_logprob_scores(docs).collect()}
    # corpus: tokens = the,cat,sat,the,cat,ran,cat -> N=7
    # c(the)=2 c(cat)=3 c(sat)=1 c(ran)=1
    # bigrams: (the,cat)x2 (cat,sat) (cat,ran); prefixes: c1(the)=2 c1(cat)=2
    N = 7.0
    p_the_cat = 0.75 * 2 / 2 + 0.25 * 3 / N
    p_cat_sat = 0.75 * 1 / 2 + 0.25 * 1 / N
    p_cat_ran = 0.75 * 1 / 2 + 0.25 * 1 / N
    exp1 = (math.log10(p_the_cat) + math.log10(p_cat_sat)) / 2
    exp2 = (math.log10(p_the_cat) + math.log10(p_cat_ran)) / 2
    assert got[1]["n_bigrams"] == 2
    assert got[1]["mean_log10_bigram_prob"] == pytest.approx(exp1, abs=1e-12)
    assert got[2]["mean_log10_bigram_prob"] == pytest.approx(exp2, abs=1e-12)
    assert got[3]["n_bigrams"] == 0 and got[3]["mean_log10_bigram_prob"] is None
    assert got[4]["n_bigrams"] == 0 and got[4]["mean_log10_bigram_prob"] is None


def test_bigram_model_ranks_shuffled_text_below_natural(spark):
    """The sequence-awareness claim: a document whose words are globally
    plausible but locally shuffled must score below its natural counterpart
    under the bigram model."""
    from etl_for_all_studies_spark.operators.textops import bigram_logprob_scores

    natural = "the quick brown fox jumps over the lazy dog " * 5
    shuffled = "fox the over dog quick lazy the brown jumps " * 5
    corpus = [(i, natural) for i in range(8)] + [(100, shuffled)]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r["doc_id"]: r["mean_log10_bigram_prob"]
           for r in bigram_logprob_scores(docs).collect()}
    assert got[100] < got[0]


# ---- TF-IDF query-by-example ---------------------------------------------

def test_tfidf_doc_similarity_ranks_lexical_neighbors(spark):
    from etl_for_all_studies_spark.operators.ranking import tfidf_doc_similarity

    docs = spark.createDataFrame(
        [
            (0, "apple banana cherry apple"),
            (1, "apple banana cherry"),        # near-clone of probe 0
            (2, "apple dog elephant"),          # shares one term
            (3, "zebra yak xylophone"),         # disjoint — must not appear
            (4, "banana cherry apple apple"),   # same bag as 0
        ],
        "doc_id long, text string",
    )
    out = tfidf_doc_similarity(docs, probe_ids=[0], k=3).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked[0] == 4          # identical bag → cos 1
    assert ranked[1] == 1          # near-clone next
    assert 3 not in ranked         # disjoint doc never meets the probe
    by_id = {r["doc_id"]: r["cos_sim"] for r in out}
    assert by_id[4] == pytest.approx(1.0, abs=1e-12)
    assert by_id[1] > by_id.get(2, -1.0)


def test_tfidf_max_df_caps_join_but_keeps_norms(spark):
    """max_df drops stopword-like terms from the JOIN, but norms still
    cover the full vector — similarity can only shrink, never grow."""
    from etl_for_all_studies_spark.operators.ranking import tfidf_doc_scores

    docs = spark.createDataFrame(
        [
            (0, "the the common rare_a"),
            (1, "the common rare_a"),
            (2, "the common other"),
        ],
        "doc_id long, text string",
    )
    full = {
        (r["probe_id"], r["doc_id"]): r["cos_sim"]
        for r in tfidf_doc_scores(docs, [0]).collect()
    }
    capped = {
        (r["probe_id"], r["doc_id"]): r["cos_sim"]
        for r in tfidf_doc_scores(docs, [0], max_df=2).collect()
    }
    for k in capped:
        assert capped[k] <= full[k] + 1e-12


def test_mix_temperature_lifts_low_resource_strata(spark):
    """alpha sampling: with weights = stratum sizes, alpha=1 keeps the mix
    proportional while alpha=0.5 shifts keep-rates toward small strata (the
    small stratum's rate rises relative to the big one's); alpha=0 makes
    the target shares uniform."""
    from pyspark.sql import functions as F

    # big stratum: 900 docs x 100 tokens; small: 100 docs x 100 tokens
    rows = [(i, "big", 100) for i in range(900)]
    rows += [(1000 + i, "small", 100) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, src string, toks long")
    weights = df.groupBy("src").agg(F.sum("toks").cast("double").alias("weight"))

    def rates(alpha):
        kept = mix_to_budget(
            df, stratum_col="src", weight_col_df=weights, token_col="toks",
            budget_tokens=20_000, key_col="doc_id", alpha=alpha,
        )
        return {
            r["src"]: r["keep_rate_mille"]
            for r in kept.select("src", "keep_rate_mille").distinct().collect()
        }

    prop = rates(1.0)       # proportional: equal rates (same budget share ratio)
    assert prop["big"] == prop["small"]
    cooled = rates(0.5)     # sqrt weights: small stratum over-sampled
    assert cooled["small"] > cooled["big"]
    uniform = rates(0.0)    # alpha=0: equal TARGETS -> small stratum's rate 9x
    assert uniform["small"] == 1000  # capped: target exceeds its actual tokens
    assert uniform["big"] < uniform["small"]
