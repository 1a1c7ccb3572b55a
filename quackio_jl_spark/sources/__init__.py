from .bucketing import read_bucketed, write_bucketed, write_sorted
from .metadata import attach_kv_metadata, read_kv_metadata
from .options import (
    UnknownOptionError,
    duckdb_schema_to_ddl,
    guess_format,
    normalize_format,
    translate_read_options,
    translate_write_options,
)
from .readers import (
    materialize,
    read_csv,
    read_file,
    read_json,
    read_orc,
    read_parquet,
    read_text,
)
from .writers import write_table

__all__ = [
    "read_csv",
    "write_bucketed",
    "read_bucketed",
    "write_sorted",
    "read_parquet",
    "read_json",
    "read_orc",
    "read_file",
    "read_text",
    "materialize",
    "write_table",
    "attach_kv_metadata",
    "read_kv_metadata",
    "normalize_format",
    "guess_format",
    "duckdb_schema_to_ddl",
    "translate_read_options",
    "translate_write_options",
    "UnknownOptionError",
]
