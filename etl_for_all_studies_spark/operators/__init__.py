from .metadata_norm import normalize_metadata, resolve_field_columns
from .expression import expression_wide_to_long

__all__ = [
    "normalize_metadata",
    "resolve_field_columns",
    "expression_wide_to_long",
]
