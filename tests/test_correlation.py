"""Correlation plan vs pure-Python oracle (reference shape:
``tests/test_correlation.py`` + FIXTURES.md F6)."""
import math

import pytest

from etl_for_all_studies_spark.plans.correlation import compute_gene_pair_correlations
from oracle import all_pairs

CANONICAL = {
    1: {"S1": 1.0, "S2": 2.0, "S3": 3.0},
    2: {"S1": 1.0, "S2": 1.5, "S3": 2.0},
    3: {"S1": 3.0, "S2": 2.0, "S3": 1.0},
}


def _to_df(spark, matrix, study_key=1):
    rows = [
        (study_key, g, s, v)
        for g, by_sample in matrix.items()
        for s, v in by_sample.items()
    ]
    return spark.createDataFrame(
        rows, "study_key long, gene_key long, gsm_accession string, expression_value double"
    )


def _run(spark, matrix, mode="exact", min_samples=2):
    df = compute_gene_pair_correlations(
        _to_df(spark, matrix), min_samples=min_samples, mode=mode
    )
    return {
        (r["gene_a_key"], r["gene_b_key"]): r.asDict()
        for r in df.collect()
    }


@pytest.mark.parametrize("mode", ["exact", "dense", "block"])
def test_canonical_three_gene_study(spark, mode):
    got = _run(spark, CANONICAL, mode=mode)
    expected = {(s["gene_a_key"], s["gene_b_key"]): s for s in all_pairs(CANONICAL)}
    assert set(got) == set(expected) == {(1, 2), (1, 3), (2, 3)}
    for key, exp in expected.items():
        g = got[key]
        assert g["n_samples"] == exp["n_samples"] == 3
        assert g["rho_spearman"] == pytest.approx(exp["rho"], abs=1e-12)
        assert g["p_value"] == pytest.approx(exp["p_stored"], abs=2e-7)
        assert g["illness_key"] is None
    assert got[(1, 2)]["rho_spearman"] == 1.0
    assert got[(1, 3)]["rho_spearman"] == -1.0


def test_insufficient_samples_empty(spark):
    matrix = {1: {"S1": 1.0}, 2: {"S2": 2.0}}
    assert _run(spark, matrix) == {}


def test_n2_pair_p_forced_q_null(spark):
    matrix = {1: {"S1": 1.0, "S2": 2.0}, 2: {"S1": 5.0, "S2": 3.0}}
    got = _run(spark, matrix)
    assert set(got) == {(1, 2)}
    row = got[(1, 2)]
    assert row["rho_spearman"] == -1.0
    assert row["p_value"] == 1.0  # NaN p stored as 1.0 (O-39)
    assert row["q_value"] is None  # excluded from BH family (O-40)


def test_constant_series_dropped(spark):
    matrix = {
        1: {"S1": 1.0, "S2": 1.0, "S3": 1.0},
        2: {"S1": 1.0, "S2": 2.0, "S3": 3.0},
        3: {"S1": 3.0, "S2": 1.0, "S3": 2.0},
    }
    got = _run(spark, matrix)
    assert set(got) == {(2, 3)}  # pairs involving constant gene 1 dropped


@pytest.mark.parametrize("mode", ["exact", "dense"])
def test_tie_heavy_matches_average_rank_oracle(spark, mode):
    matrix = {
        1: {f"S{i}": v for i, v in enumerate([1.0, 1.0, 2.0, 2.0, 3.0, 7.0])},
        2: {f"S{i}": v for i, v in enumerate([2.0, 2.0, 2.0, 5.0, 4.0, 4.0])},
        3: {f"S{i}": v for i, v in enumerate([9.0, 1.0, 1.0, 1.0, 2.0, 3.0])},
    }
    got = _run(spark, matrix, mode=mode)
    expected = {(s["gene_a_key"], s["gene_b_key"]): s for s in all_pairs(matrix)}
    assert set(got) == set(expected)
    for key, exp in expected.items():
        assert got[key]["rho_spearman"] == pytest.approx(exp["rho"], abs=1e-12), key
        assert got[key]["p_value"] == pytest.approx(exp["p_stored"], abs=2e-7), key
        if exp["q"] is None:
            assert got[key]["q_value"] is None
        else:
            assert got[key]["q_value"] == pytest.approx(exp["q"], abs=1e-6), key


def test_ragged_matrix_exact_mode_intersects_per_pair(spark):
    # gene 3 lacks S3; pair (1,3) must rank over {S1,S2,S4} only
    matrix = {
        1: {"S1": 1.0, "S2": 2.0, "S3": 3.0, "S4": 4.0},
        2: {"S1": 4.0, "S2": 3.0, "S3": 2.0, "S4": 1.0},
        3: {"S1": 2.0, "S2": 9.0, "S4": 5.0},
    }
    got = _run(spark, matrix, mode="exact")
    expected = {(s["gene_a_key"], s["gene_b_key"]): s for s in all_pairs(matrix)}
    assert set(got) == set(expected)
    for key, exp in expected.items():
        assert got[key]["n_samples"] == exp["n_samples"]
        assert got[key]["rho_spearman"] == pytest.approx(exp["rho"], abs=1e-12), key


def test_bh_family_larger_study(spark):
    # 6 genes, some noisy: verifies the BH window formulation against the
    # sequential oracle on a family with distinct and tied p-values
    import random

    rng = random.Random(7)
    samples = [f"S{i}" for i in range(12)]
    matrix = {}
    for g in range(1, 7):
        base = [rng.uniform(0, 10) for _ in samples]
        matrix[g] = {s: round(v + g * 0.3 * i, 3) for i, (s, v) in enumerate(zip(samples, base))}
    got = _run(spark, matrix)
    expected = {(s["gene_a_key"], s["gene_b_key"]): s for s in all_pairs(matrix)}
    assert set(got) == set(expected)
    for key, exp in expected.items():
        assert got[key]["rho_spearman"] == pytest.approx(exp["rho"], abs=1e-9), key
        if exp["q"] is None:
            assert got[key]["q_value"] is None, key
        else:
            assert got[key]["q_value"] == pytest.approx(exp["q"], abs=1e-6), key


def test_auto_mode_routes_dense_and_ragged(spark):
    """auto must equal exact on a mix of dense and ragged studies."""
    dense = {g: {f"S{i}": float((g * 7 + i * 3) % 11) for i in range(6)} for g in (1, 2, 3)}
    ragged = {
        1: {"S1": 1.0, "S2": 2.0, "S3": 3.0},
        2: {"S1": 4.0, "S2": 3.0},  # missing S3
    }
    df = _to_df(spark, dense, study_key=1).unionByName(_to_df(spark, ragged, study_key=2))
    exact = {
        (r["study_key"], r["gene_a_key"], r["gene_b_key"]): r.asDict()
        for r in compute_gene_pair_correlations(df, mode="exact").collect()
    }
    auto = {
        (r["study_key"], r["gene_a_key"], r["gene_b_key"]): r.asDict()
        for r in compute_gene_pair_correlations(df, mode="auto").collect()
    }
    assert set(exact) == set(auto)
    for k in exact:
        assert auto[k]["rho_spearman"] == pytest.approx(exact[k]["rho_spearman"], abs=1e-12)
        assert auto[k]["n_samples"] == exact[k]["n_samples"]


def test_randomized_matrices_match_oracle(spark):
    """Randomized sweep: engine output must match the reference-faithful
    pure-Python oracle on matrices with ties, raggedness, and constants."""
    import random

    rng = random.Random(2024)
    for trial in range(8):
        n_genes = rng.randint(2, 6)
        n_samples = rng.randint(2, 8)
        samples = [f"S{i}" for i in range(n_samples)]
        matrix = {}
        for g in range(1, n_genes + 1):
            covered = [s for s in samples if rng.random() > 0.2] or samples[:1]
            # small value domain → frequent ties; occasional constant gene
            domain = [1.0] if rng.random() < 0.15 else [1.0, 2.0, 3.0, 4.5]
            matrix[g] = {s: rng.choice(domain) for s in covered}
        got = _run(spark, matrix, mode="exact")
        expected = {
            (s["gene_a_key"], s["gene_b_key"]): s for s in all_pairs(matrix)
        }
        assert set(got) == set(expected), f"trial {trial}: pair sets differ"
        for key, exp in expected.items():
            g = got[key]
            assert g["n_samples"] == exp["n_samples"], (trial, key)
            assert g["rho_spearman"] == pytest.approx(exp["rho"], abs=1e-9), (trial, key)
            assert g["p_value"] == pytest.approx(exp["p_stored"], abs=2e-7), (trial, key)
            if exp["q"] is None:
                assert g["q_value"] is None, (trial, key)
            else:
                assert g["q_value"] == pytest.approx(exp["q"], abs=1e-6), (trial, key)


def test_multi_study_families_independent(spark):
    df1 = _to_df(spark, CANONICAL, study_key=1)
    noisy = {
        1: {"S1": 5.0, "S2": 1.0, "S3": 4.0, "S4": 2.0},
        2: {"S1": 2.0, "S2": 4.0, "S3": 1.0, "S4": 5.0},
    }
    df2 = _to_df(spark, noisy, study_key=2)
    out = compute_gene_pair_correlations(df1.unionByName(df2))
    by_study = {}
    for r in out.collect():
        by_study.setdefault(r["study_key"], []).append(r)
    assert len(by_study[1]) == 3 and len(by_study[2]) == 1
    # BH family for study 1 unaffected by study 2's rows
    exp1 = {(s["gene_a_key"], s["gene_b_key"]): s for s in all_pairs(CANONICAL)}
    for r in by_study[1]:
        exp = exp1[(r["gene_a_key"], r["gene_b_key"])]
        if exp["q"] is None:
            assert r["q_value"] is None
        else:
            assert r["q_value"] == pytest.approx(exp["q"], abs=1e-6)


# ---- block (bucketed) pair enumeration — SURVEY §7.4.7 beyond-envelope ----

def test_block_mode_identical_to_dense(spark):
    """mode="block" must be row-identical to mode="dense" on the same dense
    matrix — block enumeration only re-buckets the pair fan-out. 40 genes /
    4 blocks forces multi-gene blocks, diagonal pairs, and off-diagonal
    side-swaps (hash block of the smaller gene can exceed the larger's)."""
    rng_vals = [
        ((i * 37 + j * 11) % 29) + 0.25 * ((i + j) % 5) for i in range(40) for j in range(12)
    ]
    matrix = {
        g: {f"S{j:02d}": rng_vals[g * 12 + j] for j in range(12)}
        for g in range(40)
    }
    df = _to_df(spark, matrix)
    dense = compute_gene_pair_correlations(df, mode="dense", computed_at="x")
    block = compute_gene_pair_correlations(df, mode="block", n_blocks=4, computed_at="x")
    key = ["study_key", "gene_a_key", "gene_b_key"]
    d = {tuple(r[k] for k in key): r.asDict() for r in dense.collect()}
    b = {tuple(r[k] for k in key): r.asDict() for r in block.collect()}
    assert set(d) == set(b) and len(d) == 40 * 39 // 2
    for k in d:
        for col in ("n_samples", "rho_spearman", "p_value", "q_value"):
            assert d[k][col] == pytest.approx(b[k][col], abs=1e-12), (k, col)


def test_block_mode_single_block_degenerates_to_dense(spark):
    got_block = _run(spark, CANONICAL, mode="block")
    got_dense = _run(spark, CANONICAL, mode="dense")
    assert set(got_block) == set(got_dense)
    for k in got_dense:
        assert got_block[k]["rho_spearman"] == pytest.approx(
            got_dense[k]["rho_spearman"], abs=1e-12
        )


def test_block_join_is_keyed_by_block_columns(spark):
    """Plan shape: the block-mode join's equi-keys must include the block
    columns — that is the whole point (one (study, sample) hot key is spread
    over B(B+1)/2 reducers). Asserted on the optimized plan text."""
    df = _to_df(spark, CANONICAL)
    block = compute_gene_pair_correlations(df, mode="block", n_blocks=4, computed_at="x")
    plan = block._jdf.queryExecution().optimizedPlan().toString()
    assert "blk_a" in plan and "blk_b" in plan


def test_block_mode_bh_windows_are_bucket_partitioned(spark):
    """Plan shape: block mode's q-value step must NOT re-serialize the pair
    family into one window task — every window over the pair table that is
    partitioned by study_key alone is forbidden (the bucketed BH partitions
    by (study_key, __bkt) instead). Detected on the optimized plan text:
    a windowspecdefinition whose FIRST argument is study_key and whose
    SECOND argument is already a sort item (ASC/DESC) is a per-family
    single-partition window."""
    import re

    df = _to_df(spark, CANONICAL)
    block = compute_gene_pair_correlations(df, mode="block", n_blocks=4, computed_at="x")
    plan = block._jdf.queryExecution().optimizedPlan().toString()
    # guard-the-guard: if a Spark upgrade changes the plan-string format and
    # the windowspecdefinition pattern stops matching anything, the per-
    # family assertion below would pass vacuously — fail loudly instead
    all_specs = re.findall(
        r"windowspecdefinition\(([A-Za-z_][A-Za-z0-9_]*)#\d+",
        plan,
    )
    assert all_specs, "no windowspecdefinition parsed — plan format drifted"
    per_family_only = [
        m
        for m in re.findall(
            r"windowspecdefinition\((?:study_key|__bh_fk)#\d+L?,"
            r" ([A-Za-z_][A-Za-z0-9_]*)#\d+L? (?:ASC|DESC)",
            plan,
        )
        # windows over the tiny families×B bucket-count table sort by __bkt
        # and are bounded by construction; any other sort column means a
        # window over the quadratic pair table partitioned by family alone
        if m != "__bkt"
    ]
    assert not per_family_only, per_family_only
    # and the bucketed windows ARE present
    assert "__bkt" in plan and "__lj" in plan
    # the classic path keeps the cheap per-family window for reference-
    # envelope families (dense mode unchanged)
    dense = compute_gene_pair_correlations(df, mode="dense", computed_at="x")
    dplan = dense._jdf.queryExecution().optimizedPlan().toString()
    assert "__bkt" not in dplan


def test_auto_mode_routes_wide_dense_to_block(spark):
    """auto with a low wide_gene_threshold must route a dense study through
    the block plan and still equal exact-mode results; the dense-sized study
    keeps the dense route (threshold respected per study)."""
    wide = {g: {f"S{i}": float((g * 7 + i * 3) % 11) for i in range(4)} for g in range(12)}
    narrow = {g: {f"S{i}": float((g * 5 + i) % 7) for i in range(4)} for g in (1, 2, 3)}
    df = _to_df(spark, wide, study_key=1).unionByName(_to_df(spark, narrow, study_key=2))
    exact = {
        (r["study_key"], r["gene_a_key"], r["gene_b_key"]): r.asDict()
        for r in compute_gene_pair_correlations(
            df, mode="exact", computed_at="x"
        ).collect()
    }
    auto = {
        (r["study_key"], r["gene_a_key"], r["gene_b_key"]): r.asDict()
        for r in compute_gene_pair_correlations(
            df, mode="auto", computed_at="x",
            wide_gene_threshold=8, n_blocks=3,
        ).collect()
    }
    assert set(exact) == set(auto)
    for k in exact:
        assert auto[k]["rho_spearman"] == pytest.approx(
            exact[k]["rho_spearman"], abs=1e-12
        ), k
        assert auto[k]["n_samples"] == exact[k]["n_samples"]


def test_auto_mode_derives_n_blocks_from_widest_study(spark, monkeypatch):
    """n_blocks=None in auto mode must size blocks from the widest routed
    study (ceil(width/2000), min 2 — the round-8 envelope sweep's
    ~4M-rows-per-block-pair target), and an explicit n_blocks must still
    win. Pinned by spying on _block_pairs rather than re-running the 20k
    probe: the derivation is driver-side arithmetic on counts the router
    already paid for."""
    from etl_for_all_studies_spark.plans import correlation as corr_mod
    from etl_for_all_studies_spark.plans.correlation import _derive_n_blocks

    # the pure derivation: reference envelope (20k genes) => 10 blocks
    assert _derive_n_blocks(20_000) == 10
    assert _derive_n_blocks(20_001) == 11
    assert _derive_n_blocks(2_000) == 2   # min 2: one block = worse dense
    assert _derive_n_blocks(12) == 2

    wide = {g: {f"S{i}": float((g * 7 + i * 3) % 11) for i in range(4)} for g in range(12)}
    df = _to_df(spark, wide, study_key=1)

    seen = []
    real = corr_mod._block_pairs

    def spy(e, n_blocks):
        seen.append(n_blocks)
        return real(e, n_blocks)

    monkeypatch.setattr(corr_mod, "_block_pairs", spy)
    compute_gene_pair_correlations(
        df, mode="auto", computed_at="x", wide_gene_threshold=8
    ).collect()
    assert seen == [_derive_n_blocks(12)] == [2]

    seen.clear()
    compute_gene_pair_correlations(
        df, mode="auto", computed_at="x", wide_gene_threshold=8, n_blocks=3
    ).collect()
    assert seen == [3]

    # explicit block mode with the default keeps the historical 8
    seen.clear()
    compute_gene_pair_correlations(df, mode="block", computed_at="x").collect()
    assert seen == [8]


def test_router_threshold_pinned_to_measured_crossover():
    """The auto router's default wide_gene_threshold sits at the measured
    dense/block crossover (SCALE.md round-8 envelope series: dense wins at
    1k genes, block wins from 2k up, both regimes) — 1024 is the last
    power-of-two width where the dense plan's single-reducer-per-sample
    fan-out (~0.5M pairs) still beats block's B+1x input replication."""
    import inspect

    sig = inspect.signature(compute_gene_pair_correlations)
    assert sig.parameters["wide_gene_threshold"].default == 1024
    assert sig.parameters["n_blocks"].default is None
