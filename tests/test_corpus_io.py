"""Corpus source/sink tests: format parity and the bucketed shuffle-free
join contract (scale evidence: plan-level absence of Exchange)."""
import pytest
from pyspark.sql import functions as F

from etl_for_all_studies_spark.sources.corpus import (
    DOCUMENT_SCHEMA,
    read_documents,
    write_corpus_table,
)

ROWS = [
    (1, "alpha beta", "en", "src0", 10),
    (2, "gamma delta", "en", "src0", 11),
    (3, "der hund", "de", "src1", 8),
]


@pytest.fixture()
def pq_corpus(spark, tmp_path):
    df = spark.createDataFrame(ROWS, DOCUMENT_SCHEMA)
    p = str(tmp_path / "docs_pq")
    df.write.parquet(p)
    return p


def test_read_documents_format_parity(spark, tmp_path, pq_corpus):
    df = spark.createDataFrame(ROWS, DOCUMENT_SCHEMA)
    jl = str(tmp_path / "docs.jsonl")
    cv = str(tmp_path / "docs.csv")
    oc = str(tmp_path / "docs.orc")
    df.write.json(jl)
    df.write.option("header", "true").csv(cv)
    df.write.orc(oc)

    base = sorted(map(tuple, read_documents(spark, pq_corpus).collect()))
    for path, fmt in [(jl, "jsonl"), (cv, "csv"), (oc, "orc")]:
        got = read_documents(spark, path, fmt)
        assert got.schema == DOCUMENT_SCHEMA
        assert sorted(map(tuple, got.collect())) == base

    with pytest.raises(ValueError):
        read_documents(spark, pq_corpus, "avro")


def test_bucketed_join_has_no_exchange(spark, pq_corpus):
    docs = read_documents(spark, pq_corpus)
    write_corpus_table(docs, "corpus_a", n_buckets=4)
    write_corpus_table(docs.withColumn("n_chars", F.col("n_chars") + 1),
                       "corpus_b", n_buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (broadcast would trivially avoid the
        # shuffle on this tiny fixture and hide the bucketing contract —
        # at corpus scale neither side broadcasts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("corpus_a")
        b = spark.table("corpus_b").select("doc_id", F.col("n_chars").alias("nc2"))
        joined = a.join(b, "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: the join must not shuffle either side
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == len(ROWS)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS corpus_a")
        spark.sql("DROP TABLE IF EXISTS corpus_b")


def test_partitioned_write_prunes(spark, pq_corpus, tmp_path):
    docs = read_documents(spark, pq_corpus)
    write_corpus_table(docs, "corpus_p", partition_by="source", bucket_by=None)
    try:
        one = spark.table("corpus_p").where(F.col("source") == "src1")
        plan = one._jdf.queryExecution().executedPlan().toString()
        # partition pruning reaches the scan (only src1 read)
        assert one.count() == 1
        assert "PartitionFilters: [isnotnull(source" in plan or "source=src1" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS corpus_p")


def test_partitioned_table_prunes_partitions(spark, pq_corpus):
    docs = read_documents(spark, pq_corpus)
    try:
        write_corpus_table(
            docs, "corpus_part", bucket_by=None, partition_by="source"
        )
        q = spark.table("corpus_part").where(F.col("source") == "src1")
        plan = q._jdf.queryExecution().executedPlan().toString()
        # the source filter must reach the scan as a partition filter (no
        # data read outside the matching partition dirs) — at corpus scale
        # this is the difference between one stratum and a full-table scan
        assert "PartitionFilters" in plan
        assert "src1" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
        rows = q.collect()
        assert rows and all(r["source"] == "src1" for r in rows)
    finally:
        spark.sql("DROP TABLE IF EXISTS corpus_part")


def test_corpus_schema_evolution_reads(spark, tmp_path):
    """Corpus directories evolve: early shards predate columns, late shards
    add extras. The canonical read (explicit schema) must project both shard
    generations onto the contract — absent columns as NULL, extras ignored —
    and a mergeSchema read must surface the union for audits."""
    from pyspark.sql import functions as F

    from etl_for_all_studies_spark.sources.corpus import read_documents

    d = str(tmp_path / "corpus")
    # generation 1: no lang column yet
    spark.createDataFrame(
        [(1, "alpha text", "s1", 10)],
        "doc_id long, text string, source string, n_chars long",
    ).write.parquet(d + "/gen=1")
    # generation 2: adds a quality column beyond the contract
    spark.createDataFrame(
        [(2, "beta text", "en", "s2", 9, 0.8)],
        "doc_id long, text string, lang string, source string, n_chars long,"
        " quality double",
    ).write.parquet(d + "/gen=2")

    docs = read_documents(spark, d + "/*")
    rows = {r["doc_id"]: r.asDict() for r in docs.collect()}
    assert set(docs.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert rows[1]["lang"] is None and rows[1]["source"] == "s1"
    assert rows[2]["lang"] == "en"

    merged = spark.read.option("mergeSchema", "true").parquet(d + "/*")
    assert "quality" in merged.columns
    audit = {r["doc_id"]: r["quality"] for r in merged.select("doc_id", "quality").collect()}
    assert audit == {1: None, 2: 0.8}


def test_corpus_jsonl_malformed_rows_surface_as_nulls_not_failures(spark, tmp_path):
    """Crawl-scale JSONL always contains garbage lines; ingestion must not
    abort. With the explicit contract schema, Spark's PERMISSIVE mode maps
    unparseable lines to all-NULL rows (droppable by a doc_id filter) and
    type-mismatched fields to NULL — a 100 TB ingest survives its corrupt
    shards and the loss is auditable, not silent."""
    from etl_for_all_studies_spark.sources.corpus import read_documents

    p = tmp_path / "shard.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "good", "lang": "en", "source": "s", "n_chars": 4}',
                "this is not json at all {{{",
                '{"doc_id": "not-a-number", "text": "typed wrong", "lang": "en", "source": "s", "n_chars": 11}',
                '{"doc_id": 2, "text": "also good", "lang": "de", "source": "s", "n_chars": 9}',
            ]
        )
    )
    docs = read_documents(spark, str(p), fmt="jsonl")
    rows = docs.collect()
    assert len(rows) == 4  # nothing aborted
    good = {r["doc_id"]: r["text"] for r in rows if r["doc_id"] is not None}
    assert good == {1: "good", 2: "also good"}
    bad = [r for r in rows if r["doc_id"] is None]
    assert len(bad) == 2  # garbage line + type-mismatched id, both auditable
    kept = docs.where("doc_id IS NOT NULL")
    assert kept.count() == 2
