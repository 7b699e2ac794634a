"""Expression operators tests (reference shape:
``tests/test_expression_processing.py``)."""
import pytest

from etl_for_all_studies_spark.operators.expression import (
    ExpressionSchemaError,
    expression_wide_to_long,
    filter_to_whitelist,
    intersect_sample_columns,
)
from etl_for_all_studies_spark.sources.study_io import (
    InputFormatError,
    read_expression_wide,
    read_gene_filter,
)


@pytest.fixture()
def wide(spark, study_tree):
    return read_expression_wide(
        spark, str(study_tree["studies"] / "GSE1" / "expression_GSE1.tsv")
    )


def test_first_column_validation(spark, tmp_path):
    bad = tmp_path / "bad.tsv"
    bad.write_text("notgene\tS1\nX\t1.0\n")
    with pytest.raises(InputFormatError):
        read_expression_wide(spark, str(bad))


def test_sample_intersection_drops_and_warns(wide):
    kept, missing = intersect_sample_columns(wide, ["S1", "S3", "S4"])
    assert kept == ["S1", "S3"]  # expression column order preserved; S9 pruned
    assert missing == ["S4"]


def test_no_surviving_samples_errors(wide):
    with pytest.raises(ExpressionSchemaError):
        expression_wide_to_long(wide, ["ZZZ"], "GSE1")


def test_unpivot_cast_drop_and_whitelist(spark, wide, study_tree):
    long = expression_wide_to_long(wide, ["S1", "S2", "S3"], "GSE1")
    rows = long.collect()
    # 5 genes x 3 samples = 15 cells, minus 1 unparseable "NA"
    assert len(rows) == 14
    assert all(r["gsm_accession"] != "S9" for r in rows)
    genes = read_gene_filter(spark, str(study_tree["genes"]))
    filtered = filter_to_whitelist(long, genes)
    assert filtered.where("ensembl_id = 'ENSGXX'").count() == 0
    assert filtered.count() == 11


def test_gene_filter_validation(spark, tmp_path):
    f = tmp_path / "genes.tsv"
    f.write_text("wrong_col\nX\n")
    with pytest.raises(InputFormatError):
        read_gene_filter(spark, str(f))
    f.write_text("ensembl_id\n\n   \n")
    with pytest.raises(InputFormatError):
        read_gene_filter(spark, str(f))
