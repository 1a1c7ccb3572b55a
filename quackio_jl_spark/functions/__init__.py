from .compat import (
    DUCKDB_FUNCTIONS,
    list_cosine_similarity,
    list_dot_product,
    list_sum,
    regexp_matches,
    strftime,
    string_split,
)
from .exact import DEC, davg, dsum, dsum_w

__all__ = [
    "DUCKDB_FUNCTIONS",
    "strftime",
    "string_split",
    "list_sum",
    "list_dot_product",
    "list_cosine_similarity",
    "regexp_matches",
    "dsum",
    "davg",
    "dsum_w",
    "DEC",
]
