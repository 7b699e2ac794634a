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


def test_same_tier_variant_columns_all_included():
    # Multiple actual columns match one candidate at the same (stripped) tier:
    # ALL must be in the coalesce, in schema order, so a row whose first
    # variant is blank falls through to the next variant — the reference's
    # per-row lookup only sees non-empty headers (metadata_processing.py:68-74)
    cols = ["characteristics_ch1_illness", "characteristics_ch2_illness", "other"]
    assert resolve_field_columns(cols, ["characteristics_ch1_Illness"]) == [
        "characteristics_ch1_illness",
        "characteristics_ch2_illness",
    ]
    # exact tier still leads even when casefold variants precede it in schema order
    cols2 = ["AGE", "Age"]
    assert resolve_field_columns(cols2, ["Age"]) == ["Age", "AGE"]


def test_variant_fallback_row_wise(spark):
    # Row 1: ch1 filled -> ch1 wins. Row 2: ch1 blank, ch2 filled -> ch2
    # value must survive (previously coalesced straight to UNKNOWN).
    df = spark.createDataFrame(
        [
            ("S1", "GSE9", "flu", ""),
            ("S2", "GSE9", "", "diabetes"),
            ("S3", "GSE9", "", ""),
        ],
        "refinebio_accession_code string, experiment_accession string, "
        "characteristics_ch1_illness string, characteristics_ch2_illness string",
    )
    md = normalize_metadata(df, "GSE9")
    rows = {r["gsm_accession"]: r["illness"] for r in md.collect()}
    assert rows == {"S1": "flu", "S2": "diabetes", "S3": "UNKNOWN"}


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


def test_configure_logging_parity(tmp_path):
    """Reference logging contract (logging_utils.py:12-34): rotated etl.log
    under log_directory + console handler, level from config; force-rebind
    so repeat calls don't stack handlers."""
    import logging

    from etl_for_all_studies_spark.config import config_from_dict
    from etl_for_all_studies_spark.logging_utils import configure_logging

    (tmp_path / "g.tsv").write_text("gene_symbol\tensembl_id\n")
    cfg = config_from_dict(
        {
            "warehouse": {"path": str(tmp_path / "wh")},
            "processing": {
                "input_directory": str(tmp_path),
                "gene_filter_file": str(tmp_path / "g.tsv"),
            },
            "logging": {"log_level": "WARNING", "log_directory": str(tmp_path / "logs")},
        }
    )
    configure_logging(cfg)
    configure_logging(cfg)  # idempotent: no handler accumulation
    root = logging.getLogger()
    assert root.level == logging.WARNING
    assert len(root.handlers) == 2
    logging.getLogger("parity-test").warning("hello etl")
    for h in root.handlers:
        h.flush()
    log_file = tmp_path / "logs" / "etl.log"
    assert log_file.exists()
    text = log_file.read_text()
    assert "hello etl" in text and "[WARNING] parity-test" in text
    # restore pytest's own logging state
    for h in list(root.handlers):
        root.removeHandler(h)
        h.close()
