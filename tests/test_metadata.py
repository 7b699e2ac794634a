"""Metadata normalization tests (reference test shape:
``tests/test_metadata_processing.py``)."""
import pytest

from etl_for_all_studies_spark.operators.metadata_norm import (
    MetadataSchemaError,
    metadata_quality,
    normalize_metadata,
    resolve_field_columns,
)


def test_fuzzy_header_resolution_tiers():
    cols = ["characteristics_ch2_illness", "Refinebio_Sex", "refinebio_age"]
    # exact
    assert resolve_field_columns(cols, ["refinebio_age"]) == ["refinebio_age"]
    # casefold
    assert resolve_field_columns(cols, ["refinebio_sex"]) == ["Refinebio_Sex"]
    # digit-run stripped + casefold (ch2 satisfies ch1 mapping)
    assert resolve_field_columns(cols, ["characteristics_ch1_Illness"]) == [
        "characteristics_ch2_illness"
    ]
    # no match
    assert resolve_field_columns(cols, ["platform_id"]) == []


def test_normalize_metadata_semantics(spark, study_tree):
    from etl_for_all_studies_spark.sources.study_io import read_metadata_raw

    raw = read_metadata_raw(
        spark, str(study_tree["studies"] / "GSE1" / "metadata_GSE1.tsv")
    )
    md = normalize_metadata(raw, "GSE1")
    rows = {r["gsm_accession"]: r.asDict() for r in md.collect()}
    # blank GSM dropped
    assert set(rows) == {"S1", "S2", "S3"}
    # age coalesce: first non-empty candidate wins
    assert rows["S1"]["age"] == "16"
    assert rows["S2"]["age"] == "17 yrs"  # refinebio_age empty -> ch1_Age
    assert rows["S3"]["age"] == "25"
    # UNKNOWN fallbacks
    assert rows["S3"]["platform"] == "UNKNOWN"
    assert rows["S3"]["illness"] == "UNKNOWN"
    # accession override (O-18): S3's experiment_accession mismatches
    assert all(r["gse_accession"] == "GSE1" for r in rows.values())
    q = metadata_quality(md).collect()[0].asDict()
    assert q["sample_count"] == 3
    assert q["accession_mismatches"] == 1
    assert q["age_completion"] == 1.0


def test_required_columns_enforced(spark):
    df = spark.createDataFrame([("x",)], ["refinebio_accession_code"])
    with pytest.raises(MetadataSchemaError):
        normalize_metadata(df, "GSE1")
