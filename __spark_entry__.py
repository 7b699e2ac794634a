"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (all-pairs Spearman + BH FDR — the
same ``compute_gene_pair_correlations`` plan the genomic pipeline uses) on
sf0.001. ``queries()``/``oracle_sql()`` expose the full operator suite from
``etl_for_all_studies_spark.suite`` — every SURVEY §2 operator family plus the
beyond-reference LLM-data operators, each with a DuckDB oracle.
"""

from __future__ import annotations

import pathlib
import sys
from collections.abc import Callable

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from etl_for_all_studies_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return suite.q_spearman_suppliers(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ beyond-ref ops)."""
    return suite.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return suite.oracle_sql()
