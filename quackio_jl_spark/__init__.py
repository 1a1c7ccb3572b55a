"""quackio_jl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of JuliaAPlavin/QuackIO.jl (reference studied
read-only at /root/reference; see SURVEY.md).

Reference surface -> Spark mapping (SURVEY.md §0):
- write_table / read_csv / read_parquet / read_json / read_file  -> sources/
- lazy SQLCollection handle -> the pyspark DataFrame itself (plans/)
- Parquet KV-metadata round-trip -> sources.metadata (pyarrow footer pass)
- DuckDB function spellings -> functions.compat
- driver-mandated LLM-pipeline operators -> operators/ (dedup, similarity,
  text, multimodal) and streaming/
"""

from .functions import (
    DUCKDB_FUNCTIONS,
    davg,
    dsum,
    list_cosine_similarity,
    list_dot_product,
    list_sum,
    strftime,
    string_split,
)
from .session import get_spark
from .sqlapi import register_tables, sql
from .operators.cluster import connected_components
from .operators.merge import scd2_apply, upsert
from .operators.skew import salted_join
from .sources import (
    UnknownOptionError,
    attach_kv_metadata,
    read_bucketed,
    materialize,
    read_csv,
    read_file,
    read_json,
    read_kv_metadata,
    read_orc,
    read_parquet,
    read_text,
    write_bucketed,
    write_sorted,
    write_table,
)

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "register_tables",
    "sql",
    "read_csv",
    "read_parquet",
    "read_json",
    "read_orc",
    "read_file",
    "read_text",
    "write_table",
    "write_bucketed",
    "write_sorted",
    "read_bucketed",
    "salted_join",
    "upsert",
    "scd2_apply",
    "connected_components",
    "materialize",
    "attach_kv_metadata",
    "read_kv_metadata",
    "dsum",
    "davg",
    "strftime",
    "string_split",
    "list_sum",
    "list_dot_product",
    "list_cosine_similarity",
    "DUCKDB_FUNCTIONS",
    "UnknownOptionError",
]
