"""Study-directory discovery (operators O-1/O-2).

Pure driver-side path logic; semantics match the reference
(``src/etl_for_all_studies/pipeline.py:52-98``):

* studies = immediate subdirectories of the input directory, sorted (O-1);
* within a study dir, the metadata file is the first sorted ``metadata_*.tsv``
  and the study accession is its filename stem after ``metadata_`` (the
  directory name is NOT authoritative);
* the expression file is resolved by preference chain:
  ``expression_<ACCESSION>.tsv`` → first sorted ``expression_*.tsv`` → any
  other ``*.tsv`` whose stem contains the accession (excluding the metadata
  file itself).
"""
from __future__ import annotations

import dataclasses
import pathlib


class StudyDiscoveryError(RuntimeError):
    """Raised when a study directory lacks required files."""


@dataclasses.dataclass(frozen=True)
class StudyFiles:
    """Resolved inputs for one study (reference ``pipeline.py:41-46``)."""

    accession: str
    metadata_path: pathlib.Path
    expression_path: pathlib.Path


def discover_study_files(study_dir: pathlib.Path) -> StudyFiles:
    """Resolve metadata/expression files for one study directory (O-2)."""
    metadata_candidates = sorted(study_dir.glob("metadata_*.tsv"))
    if not metadata_candidates:
        raise StudyDiscoveryError(f"No metadata_*.tsv found in {study_dir}")
    metadata_path = metadata_candidates[0]
    accession = metadata_path.stem[len("metadata_"):]
    if not accession:
        raise StudyDiscoveryError(f"Cannot derive accession from {metadata_path.name}")

    preferred = study_dir / f"expression_{accession}.tsv"
    if preferred.exists():
        return StudyFiles(accession, metadata_path, preferred)

    expression_candidates = sorted(study_dir.glob("expression_*.tsv"))
    if expression_candidates:
        return StudyFiles(accession, metadata_path, expression_candidates[0])

    fallbacks = sorted(
        p
        for p in study_dir.glob("*.tsv")
        if p != metadata_path and accession in p.stem
    )
    if fallbacks:
        return StudyFiles(accession, metadata_path, fallbacks[0])
    raise StudyDiscoveryError(f"No expression TSV found for {accession} in {study_dir}")


def discover_studies(input_directory: pathlib.Path) -> list[pathlib.Path]:
    """Enumerate study directories, sorted (O-1)."""
    if not input_directory.is_dir():
        raise StudyDiscoveryError(f"Input directory does not exist: {input_directory}")
    return sorted(p for p in input_directory.iterdir() if p.is_dir())


__all__ = ["StudyDiscoveryError", "StudyFiles", "discover_studies", "discover_study_files"]
