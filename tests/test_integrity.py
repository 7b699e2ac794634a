"""Warehouse integrity assertions: healthy after a real pipeline run, and
each check actually fires on corrupted data."""
from pyspark.sql import functions as F

from etl_for_all_studies_spark import run_correlation_job, run_pipeline
from etl_for_all_studies_spark.plans.integrity import run_integrity_report
from etl_for_all_studies_spark.sources.warehouse import Warehouse


def test_warehouse_healthy_after_pipeline(spark, app_config):
    run_pipeline(app_config, spark=spark)
    run_correlation_job(app_config, spark=spark)
    wh = Warehouse(spark, str(app_config.warehouse.path))
    report = run_integrity_report(wh)
    assert report.ok, report.violations
    # the checks exist (not vacuously ok because tables were missing)
    assert "fact_expression_grain_dupes" in report.violations
    assert "corr_value_ranges" in report.violations


def test_checks_fire_on_corruption(spark, app_config):
    run_pipeline(app_config, spark=spark)
    wh = Warehouse(spark, str(app_config.warehouse.path))
    # corrupt: duplicate a fact row and orphan its sample key
    fact = wh.read("fact_expression")
    bad = fact.limit(1).withColumn("sample_key", F.lit(999_999).cast("long"))
    bad.unionByName(bad).write.mode("append").partitionBy("study_key").parquet(
        wh.path("fact_expression")
    )
    report = run_integrity_report(wh)
    assert not report.ok
    assert report.violations["fact_expression_orphan_samples"] == 2
    assert report.violations["fact_expression_grain_dupes"] == 1


def test_quarantine_orphan_facts_repairs_and_audits(spark, app_config):
    from etl_for_all_studies_spark.plans.integrity import quarantine_orphan_facts

    run_pipeline(app_config, spark=spark)
    wh = Warehouse(spark, str(app_config.warehouse.path))
    n_before = wh.read("fact_expression").count()

    # corrupt: two rows with a dangling sample key, one with a dangling gene
    fact = wh.read("fact_expression")
    bad_s = (
        fact.limit(2)
        .withColumn("sample_key", F.lit(999_999).cast("long"))
        .withColumn("gene_key", F.col("gene_key") + 500)  # distinct grain
    )
    bad_g = (
        fact.limit(1)
        .withColumn("gene_key", F.lit(888_888).cast("long"))
    )
    bad_s.unionByName(bad_g).write.mode("append").partitionBy("study_key").parquet(
        wh.path("fact_expression")
    )
    assert not run_integrity_report(wh).ok

    stats = quarantine_orphan_facts(wh)
    assert stats["quarantined"] == 3 and stats["studies_rewritten"] >= 1

    # warehouse healthy again, valid rows untouched, orphans auditable
    report = run_integrity_report(wh)
    assert report.ok, report.violations
    assert wh.read("fact_expression").count() == n_before
    q = wh.read("fact_expression__quarantine")
    assert q.count() == 3
    assert q.where(F.col("sample_key") == 999_999).count() == 2

    # idempotent: a second pass finds nothing
    assert quarantine_orphan_facts(wh) == {"quarantined": 0, "studies_rewritten": 0}
