"""Physical layout optimization: sort-on-write for data skipping.

Parquet stores per-row-group min/max statistics; readers skip whole row
groups whose stats can't satisfy a pushed predicate. Whether that helps is
decided at WRITE time: a column scattered randomly across row groups has
every group's [min, max] spanning the full domain (nothing skips), while
range-partitioned + sorted-within-partition layout gives each group a
narrow range (selective predicates touch only the groups they must).

At 100 TB this is the cheapest scan accelerator there is — no index, no
table format, just writing in the order your dominant predicates filter:
time for event logs, join key for fact tables (where it additionally
composes with bucketing — ``sources/corpus.py::write_corpus_table``).

``write_sorted`` = ``repartitionByRange(sort_cols)`` (one range-keyed
shuffle, sampled boundaries keep output files even-sized) +
``sortWithinPartitions`` (no extra shuffle) + parquet write. Measured in
``tests/test_scale_plans.py``: a 0.05%-selective key predicate scans 100×
fewer rows from the sorted layout than the scattered one.
"""
from __future__ import annotations

from pyspark.sql import DataFrame


def write_sorted(
    df: DataFrame,
    path: str,
    *,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on ``sort_cols`` so row-group
    min/max stats become selective for predicates on those columns."""
    parted = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    parted.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


__all__ = ["write_sorted"]
