from .discovery import StudyFiles, discover_studies, discover_study_files
from .study_io import read_expression_wide, read_gene_filter, read_metadata_raw
from .warehouse import Warehouse

__all__ = [
    "StudyFiles",
    "discover_studies",
    "discover_study_files",
    "read_expression_wide",
    "read_gene_filter",
    "read_metadata_raw",
    "Warehouse",
]
