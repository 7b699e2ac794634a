"""Equivalence pins for the vectorized Arrow shingle-hash kernels.

The r11 optimization round replaced the interpreted HOF MinHash signature
pass with ``functions/sigkernel.py`` (numpy over ``mapInArrow``). These
tests pin the contract that makes that a pure optimization: bit-identical
output to the retained HOF form on real corpus rows AND on the unicode
edge cases where a byte-level shortcut would diverge (astral-plane emoji,
CJK, combining marks, empty/short/NULL texts).
"""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_for_all_studies_spark.functions.hashing import BASE, MOD
from etl_for_all_studies_spark.functions.sigkernel import (
    mod_powers,
    window_hashes,
)
from etl_for_all_studies_spark.operators.dedup import (
    MINHASH_SEEDS,
    minhash_signatures,
    minhash_signatures_hof,
)

NASTY = [
    (1, ""),
    (2, None),
    (3, "ab"),
    (4, "abcde"),
    (5, "héllo wörld ünïcode"),
    (6, "日本語のテキストです、短い"),
    (7, "emoji \U0001f600\U0001f600\U0001f600 test \U0001f600 more text"),
    (8, "a" * 5),
    (9, "tab\tand\nnewline chars mixed in here"),
    (10, "combining: café naivë x"),
    (11, "exactly5c"),
    (12, "ascii only but fairly long " * 40),
]


def _collect_sigs(df):
    return {r["doc_id"]: list(r["sig"]) for r in df.collect()}


def test_mod_powers_matches_pow():
    p = mod_powers(BASE, 300, MOD)
    for i in (0, 1, 2, 17, 299):
        assert p[i] == pow(BASE, i, MOD)


def test_window_hashes_match_direct_fold():
    texts = ["abcdefgh", "shor", "polynomial hashing"]
    k = 5
    cps_parts = [
        np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        for t in texts
    ]
    offs = np.zeros(len(texts) + 1, dtype=np.int64)
    offs[1:] = np.cumsum([len(c) for c in cps_parts])
    cps = np.concatenate(cps_parts)
    h, seg = window_hashes(cps, offs, k)
    # direct fold reference
    expect = []
    for t in texts:
        if len(t) < k:
            continue
        for i in range(len(t) - k + 1):
            acc = 0
            for ch in t[i : i + k]:
                acc = (acc * BASE + ord(ch)) % MOD
            expect.append(acc)
    assert h.tolist() == expect
    assert seg.tolist() == [0, 4, 18]


@pytest.mark.parametrize("k,num_hashes", [(5, 16), (9, 16), (5, 8)])
def test_arrow_kernel_matches_hof_on_nasty_docs(spark, k, num_hashes):
    docs = spark.createDataFrame(NASTY, "doc_id BIGINT, text STRING")
    got = _collect_sigs(
        minhash_signatures(docs, k=k, num_hashes=num_hashes)
    )
    want = _collect_sigs(
        minhash_signatures_hof(docs, k=k, num_hashes=num_hashes)
    )
    assert got == want


def test_arrow_kernel_matches_hof_on_corpus_sample(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    got = _collect_sigs(minhash_signatures(docs))
    want = _collect_sigs(minhash_signatures_hof(docs))
    assert got == want
