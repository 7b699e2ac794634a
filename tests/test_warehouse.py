"""Warehouse durability tests: crash-safe dim swap recovery and the JDBC
retry/backoff contract (reference ``database.py:28-60``)."""
import pytest

from etl_for_all_studies_spark.sources.warehouse import (
    Warehouse,
    write_jdbc_with_retries,
)


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _dim(spark, rows):
    return spark.createDataFrame(rows, "gene_key long, ensembl_id string")


def _read_ids(wh):
    df = wh.read("dim_gene")
    assert df is not None
    return {r["ensembl_id"]: r["gene_key"] for r in df.collect()}


def test_overwrite_dim_roundtrip_and_residue_cleanup(spark, wh):
    wh.overwrite_dim("dim_gene", _dim(spark, [(1, "A"), (2, "B")]))
    assert _read_ids(wh) == {"A": 1, "B": 2}
    wh.overwrite_dim("dim_gene", _dim(spark, [(1, "A"), (2, "B"), (3, "C")]))
    assert _read_ids(wh) == {"A": 1, "B": 2, "C": 3}
    # no residue left behind after a completed swap
    assert not wh.exists("dim_gene__tmp")
    assert not wh.exists("dim_gene__old")


def test_crash_between_aside_and_promote_recovers_tmp(spark, wh):
    """Crash state: live renamed aside, tmp (the NEW copy) not yet promoted.
    read() must promote tmp — the newest complete copy — not lose the dim."""
    wh.overwrite_dim("dim_gene", _dim(spark, [(1, "A")]))
    new = _dim(spark, [(1, "A"), (2, "B")])
    new.write.mode("overwrite").parquet(wh.path("dim_gene") + "__tmp")
    wh._rename(wh.path("dim_gene"), wh.path("dim_gene") + "__old")
    assert _read_ids(wh) == {"A": 1, "B": 2}
    assert not wh.exists("dim_gene__old")


def test_crash_with_only_old_copy_restores_it(spark, wh):
    """Crash state: live renamed aside and tmp lost — restore __old so an
    existing dim is never silently re-keyed from scratch."""
    wh.overwrite_dim("dim_gene", _dim(spark, [(1, "A"), (2, "B")]))
    wh._rename(wh.path("dim_gene"), wh.path("dim_gene") + "__old")
    assert _read_ids(wh) == {"A": 1, "B": 2}


def test_overwrite_dim_reading_its_own_previous_version(spark, wh):
    """The df being written may lazily scan the live table (rebuild-from-self);
    the swap must materialize tmp before touching the live path."""
    wh.overwrite_dim("dim_gene", _dim(spark, [(1, "A")]))
    rebuilt = wh.read("dim_gene").unionByName(
        _dim(spark, [(2, "B")]).select("gene_key", "ensembl_id")
    )
    wh.overwrite_dim("dim_gene", rebuilt)
    assert _read_ids(wh) == {"A": 1, "B": 2}


# ---- JDBC sink retry/backoff (O-44) --------------------------------------


def test_jdbc_retry_backoff_then_success(spark, monkeypatch):
    """Two failures then success: the writer must be re-invoked per attempt
    with exponential backoff sleeps between (reference database.py:28-60)."""
    from pyspark.sql.readwriter import DataFrameWriter

    attempts = []
    sleeps = []

    def fake_jdbc(self, url=None, table=None, mode=None, properties=None):
        attempts.append((url, table, mode))
        if len(attempts) < 3:
            raise RuntimeError("connection refused")

    import types

    import etl_for_all_studies_spark.sources.warehouse as wh_mod

    monkeypatch.setattr(DataFrameWriter, "jdbc", fake_jdbc)
    # patch the warehouse module's time reference, NOT the global
    # time.sleep — Spark's own Python-side threads poll via time.sleep and
    # would spin unbounded with a no-op sleep
    monkeypatch.setattr(
        wh_mod, "time", types.SimpleNamespace(sleep=lambda s: sleeps.append(s))
    )

    df = spark.createDataFrame([(1,)], "x long")
    write_jdbc_with_retries(
        df, "jdbc:sqlserver://host;db=x", "facts",
        max_retries=5, retry_backoff_seconds=2.0,
    )
    assert len(attempts) == 3
    assert all(a == ("jdbc:sqlserver://host;db=x", "facts", "append") for a in attempts)
    assert sleeps == [2.0, 4.0]  # exponential: backoff * 2**attempt


def test_jdbc_retry_exhaustion_raises(spark, monkeypatch):
    from pyspark.sql.readwriter import DataFrameWriter

    calls = []

    def always_fail(self, url=None, table=None, mode=None, properties=None):
        calls.append(1)
        raise RuntimeError("deadlock victim")

    import types

    import etl_for_all_studies_spark.sources.warehouse as wh_mod

    monkeypatch.setattr(DataFrameWriter, "jdbc", always_fail)
    monkeypatch.setattr(wh_mod, "time", types.SimpleNamespace(sleep=lambda s: None))

    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(RuntimeError, match="failed after 3 attempts"):
        write_jdbc_with_retries(
            df, "jdbc:sqlserver://h", "facts", max_retries=3,
            retry_backoff_seconds=0.0,
        )
    assert len(calls) == 3


def _fact(spark, rows):
    return spark.createDataFrame(
        rows, "sample_key long, gene_key long, expression_value double, study_key long"
    )


def test_compact_fact_partitions(spark, wh):
    # 6 separate appends → ≥6 small files in study 1's partition
    for i in range(6):
        wh.append_fact(
            "fact_expression",
            _fact(spark, [(i * 10 + j, 1, 1.0, 1) for j in range(5)]),
            dedup_keys=["sample_key", "gene_key", "study_key"],
        )
    # study 2: one small append — below min_files_to_compact, must be left alone
    wh.append_fact(
        "fact_expression",
        _fact(spark, [(1, 2, 2.0, 2)]),
        dedup_keys=["sample_key", "gene_key", "study_key"],
    )
    before = wh.partition_file_stats("fact_expression")
    assert before[1][0] >= 6
    files_study2 = before[2][0]
    rows_before = sorted(
        map(tuple, wh.read("fact_expression").collect())
    )

    compacted = wh.compact_fact_partitions(
        "fact_expression", min_files_to_compact=4
    )
    assert compacted == [1]
    after = wh.partition_file_stats("fact_expression")
    assert after[1][0] < before[1][0]  # fewer files
    assert after[2][0] == files_study2  # untouched partition untouched
    # pure re-layout: identical rows
    assert sorted(map(tuple, wh.read("fact_expression").collect())) == rows_before

    # idempotent: a second call finds nothing to do
    assert wh.compact_fact_partitions("fact_expression", min_files_to_compact=4) == []


# ---- REAL JDBC round-trip (VERDICT r2 item 3) ----------------------------


def test_jdbc_real_roundtrip(spark, tmp_path):
    """Drives an ACTUAL ``df.write.jdbc`` (no stubs): a dim table goes
    through ``write_jdbc_with_retries`` into embedded Apache Derby (the
    JDBC database Spark ships in its own jars directory for the Hive
    metastore, so the driver is always on the session classpath) and is
    read back with ``spark.read.jdbc``. This exercises the reference's
    production sink contract (database.py:28-60) end-to-end: JDBC DDL,
    batch INSERTs from executor tasks, and type round-tripping — the last
    previously-untested I/O path."""
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    dim = spark.createDataFrame(
        [
            (1, "GSE9006", "diabetes in children", 163),
            (2, "GSE30550", "influenza challenge", 268),
            (3, "GSE00000", None, 0),  # NULL round-trip
        ],
        "study_key long, accession string, title string, n_samples long",
    )
    write_jdbc_with_retries(
        dim, url, "dim_study", mode="overwrite", properties=props
    )
    back = spark.read.jdbc(url=url, table="dim_study", properties=props)
    got = {r["study_key"]: r.asDict() for r in back.collect()}
    assert len(got) == 3
    assert got[1]["accession"] == "GSE9006" and got[1]["n_samples"] == 163
    assert got[3]["title"] is None
    assert set(back.columns) == set(dim.columns)

    # append mode lands additional rows in the same table
    write_jdbc_with_retries(
        spark.createDataFrame(
            [(4, "GSE1133", "tissue atlas", 158)], dim.schema
        ),
        url, "dim_study", mode="append", properties=props,
    )
    assert spark.read.jdbc(url=url, table="dim_study", properties=props).count() == 4
