"""Streaming heavy hitters (streaming/heavyhitters.py): mergeable MG folds.

The load-bearing claims: (1) in the ≤ m-vocabulary regime the folded
weights are EXACT counts across any batch split (merge is lossless when
the shrink subtracts 0); (2) over-m streams keep the MG guarantee — every
item above n_total/(m+1) survives, weights under-estimate by ≤ that bound;
(3) a crash replay of a fold is idempotent; (4) state stays ≤ m rows and
only the latest committed partition feeds the next fold.
"""
import json

import pytest
from pyspark.sql import functions as F

from etl_for_all_studies_spark.streaming.heavyhitters import (
    fold_batch,
    merge_summaries,
    read_state,
    stream_heavy_hitters,
    top_k_from_state,
)


def _shard(src_dir, name, items):
    with (src_dir / name).open("w") as f:
        for it in items:
            f.write(json.dumps({"item": it}) + "\n")


def _stream(spark, src):
    return spark.readStream.schema("item string").json(str(src))


def test_small_vocab_weights_are_exact_across_batches(spark, tmp_path):
    src = tmp_path / "shards"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _shard(src, "a.jsonl", ["x"] * 5 + ["y"] * 3 + ["z"])
    stream_heavy_hitters(_stream(spark, src), state, ckpt, m=64)
    _shard(src, "b.jsonl", ["x"] * 2 + ["z"] * 4 + ["w"])
    stream_heavy_hitters(_stream(spark, src), state, ckpt, m=64)

    top = {r.item: (r.weight, r.rank) for r in
           top_k_from_state(spark, state, k=10).collect()}
    assert top == {"x": (7, 1), "z": (5, 2), "y": (3, 3), "w": (1, 4)}
    n_total = read_state(spark, state).select(F.max("n_total")).collect()[0][0]
    assert n_total == 16


def test_over_m_keeps_the_mg_guarantee(spark, tmp_path):
    src = tmp_path / "shards"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    # 2 batches × (1 heavy item × 40 + 60 singletons); m=8 → state ≤ 8 rows
    _shard(src, "a.jsonl", ["HEAVY"] * 40 + [f"a{i}" for i in range(60)])
    stream_heavy_hitters(_stream(spark, src), state, ckpt, m=8)
    _shard(src, "b.jsonl", ["HEAVY"] * 40 + [f"b{i}" for i in range(60)])
    stream_heavy_hitters(_stream(spark, src), state, ckpt, m=8)

    st = read_state(spark, state)
    rows = {r.item: r.weight for r in st.collect()}
    assert len(rows) <= 8
    n_total = st.select(F.max("n_total")).collect()[0][0]
    assert n_total == 200
    # true count 80 > n_total/(m+1) = 22.2 → guaranteed present, and the
    # weight under-estimates by at most that bound
    assert "HEAVY" in rows
    assert 80 - 200 / 9 <= rows["HEAVY"] <= 80


def test_fold_replay_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    b0 = spark.createDataFrame([("x",)] * 4 + [("y",)] * 2, "item string")
    b1 = spark.createDataFrame([("x",)] * 3 + [("z",)], "item string")
    fold_batch(b0, 0, state, m=16)
    fold_batch(b1, 1, state, m=16)
    after_once = sorted(
        (r.item, r.weight, r.n_total) for r in read_state(spark, state).collect()
    )
    fold_batch(b1, 1, state, m=16)  # crash replay of the live batch
    after_twice = sorted(
        (r.item, r.weight, r.n_total) for r in read_state(spark, state).collect()
    )
    assert after_once == after_twice == [("x", 7, 10), ("y", 2, 10), ("z", 1, 10)]


def test_merge_shrink_matches_handrolled_mg_merge(spark):
    # 10 items, m=4: merged weights minus the 5th-largest, positives kept
    s1 = spark.createDataFrame(
        [("a", 9), ("b", 7), ("c", 3), ("d", 2)], "item string, weight long"
    )
    s2 = spark.createDataFrame(
        [("a", 4), ("e", 6), ("c", 1), ("f", 2)], "item string, weight long"
    )
    got = {
        (r.item, r.weight)
        for r in merge_summaries(s1, s2, m=4).collect()
    }
    # merged: a13 b7 e6 c4 d2 f2 → 5th largest (weight desc, item asc:
    # a,b,e,c,d,f) is d=2 → subtract 2, keep top-4 positives
    assert got == {("a", 11), ("b", 5), ("e", 4), ("c", 2)}


def test_prune_state_keeps_replay_parent_and_answer(spark, tmp_path):
    from etl_for_all_studies_spark.streaming.heavyhitters import prune_state

    state = str(tmp_path / "state")
    for i in range(6):
        b = spark.createDataFrame([("x",)] * (i + 1), "item string")
        fold_batch(b, i, state, m=16)
    before = {r.item: r.weight for r in read_state(spark, state).collect()}
    pruned = prune_state(state, keep_last=2)
    assert pruned == [0, 1, 2, 3]
    after = {r.item: r.weight for r in read_state(spark, state).collect()}
    assert after == before == {"x": 21}  # 1+2+..+6
    # replay of the live batch still folds from the retained parent
    b5 = spark.createDataFrame([("x",)] * 6, "item string")
    fold_batch(b5, 5, state, m=16)
    assert {r.item: r.weight for r in read_state(spark, state).collect()} == {"x": 21}
    with pytest.raises(ValueError):
        prune_state(state, keep_last=1)


def test_torn_state_partition_is_invisible(spark, tmp_path):
    """A batch_id dir without parquet's _SUCCESS marker (crash mid-write)
    must be invisible to reads AND to the next fold's replay parent."""
    import pathlib

    state = str(tmp_path / "state")
    fold_batch(spark.createDataFrame([("x",)] * 3, "item string"), 0, state, m=8)
    torn = pathlib.Path(state) / "batch_id=1"
    torn.mkdir()
    (torn / "part-00000.parquet").write_bytes(b"not parquet")
    st = {r.item: r.weight for r in read_state(spark, state).collect()}
    assert st == {"x": 3}  # the torn partition never surfaces
    fold_batch(spark.createDataFrame([("x",)] * 2, "item string"), 1, state, m=8)
    assert {r.item: r.weight for r in read_state(spark, state).collect()} == {"x": 5}


def test_fold_batch_rejects_restarted_batch_ids(spark, tmp_path):
    """A batch_id below the max committed state batch means the checkpoint
    restarted against a reused state_dir — new folds would write partitions
    read_state never surfaces. Must fail loudly (ADVICE r9, low)."""
    state = str(tmp_path / "state")
    df = spark.createDataFrame([("x",)], "item string")
    fold_batch(df, 5, state, m=8)
    # replay of the SAME batch is fine (crash-replay contract) ...
    fold_batch(df, 5, state, m=8)
    # ... and advancing is fine
    fold_batch(df, 6, state, m=8)
    # ... but a lower id is a state/checkpoint mismatch
    with pytest.raises(RuntimeError, match="max committed state batch"):
        fold_batch(df, 3, state, m=8)


def test_fused_fold_matches_reference_merge(spark, tmp_path):
    """fold_batch's fused single-action form (sentinel totals + window
    carries) must produce exactly merge_summaries(prior, batch_summary)
    plus the correct n_total — the mode-equivalence pin the fused plan's
    docstring promises."""
    from etl_for_all_studies_spark.operators.heavyhitters import (
        misra_gries_candidates,
    )

    state = str(tmp_path / "state")
    b0 = spark.createDataFrame(
        [(f"a{i % 7}",) for i in range(40)] + [("hot",)] * 25, "item string"
    )
    b1 = spark.createDataFrame(
        [(f"b{i % 9}",) for i in range(50)] + [("hot",)] * 15, "item string"
    )
    m = 6
    fold_batch(b0, 0, state, m=m)
    fold_batch(b1, 1, state, m=m)
    got = {(r.item, r.weight) for r in read_state(spark, state).collect()}

    prior = read_state(spark, state, before=1)
    summary1 = (
        misra_gries_candidates(b1, m=m)
        .groupBy("item")
        .agg(F.sum("weight_lower_bound").alias("weight"))
    )
    want = {
        (r.item, r.weight)
        for r in merge_summaries(prior, summary1, m=m).collect()
    }
    assert got == want
    n_total = read_state(spark, state).select(F.max("n_total")).collect()[0][0]
    assert n_total == 65 + 65


def test_n_total_survives_a_shrink_that_drops_every_counter(spark, tmp_path):
    """m+1 items with tied weights make weight−decr == 0 for all — the
    items-only state would be EMPTY and the next fold's __prior_n would
    silently reset to 0, understating the n_total/(m+1) bound (ADVICE
    r10). The NULL-item total carrier must keep the running n_total."""
    state = str(tmp_path / "state")
    m = 4
    b0 = spark.createDataFrame(
        [(f"t{i}",) for i in range(m + 1) for _ in range(3)], "item string"
    )
    fold_batch(b0, 0, state, m=m)
    # the shrink dropped every counter… (public view: no items)
    assert read_state(spark, state).count() == 0
    # …but the carrier kept the total
    carrier = read_state(spark, state, include_sentinel=True).collect()
    assert [(r.item, r.weight, r.n_total) for r in carrier] == [(None, 0, 15)]

    b1 = spark.createDataFrame([("x",)] * 2, "item string")
    fold_batch(b1, 1, state, m=m)
    top = top_k_from_state(spark, state, k=10).collect()
    assert [(r.item, r.weight, r.rank, r.n_total) for r in top] == [
        ("x", 2, 1, 17)
    ]
    # MG bound: every t_i's true count (3) ≤ weight (0, dropped) + n/(m+1)
    assert 17 / (m + 1) >= 3


def test_top_k_never_surfaces_the_total_carrier(spark, tmp_path):
    """The NULL-item carrier row is fold-internal: top_k and the default
    read_state must hide it even when k exceeds the item count."""
    state = str(tmp_path / "state")
    b0 = spark.createDataFrame([("x",), ("x",), ("y",)], "item string")
    fold_batch(b0, 0, state, m=8)
    top = top_k_from_state(spark, state, k=100).collect()
    assert all(r.item is not None for r in top)
    assert {r.item: r.weight for r in top} == {"x": 2, "y": 1}
    assert all(
        r.item is not None for r in read_state(spark, state).collect()
    )
