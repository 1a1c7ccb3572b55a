"""DuckDB-style reader/writer option translation.

The reference passes every kwarg straight through to DuckDB's
``read_csv``/``read_parquet``/``read_json``/``COPY`` (serialization machinery
at /root/reference/src/QuackIO.jl:100-121). Spark's readers use different
option names; this module is the compatibility table (SURVEY.md §4(b)).

Only *translation* lives here — no I/O.
"""

from __future__ import annotations

from typing import Any

__all__ = [
    "translate_read_options",
    "translate_write_options",
    "duckdb_schema_to_ddl",
    "normalize_format",
    "guess_format",
]

VALID_FORMATS = {"csv", "parquet", "json"}

# DuckDB type name -> Spark DDL type. Matches the reference's observed cast
# semantics (columns=(a="float",...) materializes as Float64/double —
# /root/reference/test/runtests.jl:67-71, FIXTURES.md F2).
_DUCKDB_TO_SPARK_TYPE = {
    "int": "bigint",
    "integer": "bigint",
    "int4": "int",
    "int8": "bigint",
    "bigint": "bigint",
    "smallint": "smallint",
    "tinyint": "tinyint",
    "hugeint": "decimal(38,0)",
    "float": "double",
    "float4": "float",
    "real": "float",
    "double": "double",
    "float8": "double",
    "varchar": "string",
    "text": "string",
    "string": "string",
    "bool": "boolean",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "datetime": "timestamp",
    "time": "string",
    "blob": "binary",
    "uuid": "string",
}


def normalize_format(fmt: Any) -> str:
    """Validate and lowercase-guard the format name.

    The reference *rejects* uppercase formats rather than folding them, as an
    injection guard (/root/reference/src/QuackIO.jl:34,92; test expects a
    throw at test/runtests.jl:35-36). We reproduce that contract.
    """
    s = str(fmt).lstrip(":")
    if s != s.lower():
        raise ValueError(f"format must be lowercase: {fmt!r}")
    if s not in VALID_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {sorted(VALID_FORMATS)}")
    return s


def guess_format(path: str) -> str:
    """Infer format from the filename, mirroring DuckDB's sniffing entry
    point used when ``filetype=nothing`` (/root/reference/src/QuackIO.jl:60-67,
    84-90; test/runtests.jl:116-126). Compression suffixes are peeled first."""
    name = path.rstrip("/").rsplit("/", 1)[-1].lower()
    for comp in (".gz", ".gzip", ".zst", ".zstd", ".bz2", ".br", ".lz4", ".snappy"):
        if name.endswith(comp):
            name = name[: -len(comp)]
            break
    for fmt, exts in (
        ("csv", (".csv", ".tsv")),
        ("parquet", (".parquet", ".pq")),
        ("json", (".json", ".ndjson", ".jsonl")),
    ):
        if name.endswith(exts):
            return fmt
    raise ValueError(f"cannot guess format from filename: {path!r}")


def duckdb_schema_to_ddl(columns: dict[str, str]) -> str:
    """``columns={'a': 'float', 'b': 'varchar'}`` -> Spark DDL schema string.

    Mirrors the reference's explicit-schema kwarg
    (/root/reference/test/runtests.jl:67-71)."""
    parts = []
    for name, duck_type in columns.items():
        spark_type = _DUCKDB_TO_SPARK_TYPE.get(str(duck_type).lower(), str(duck_type))
        parts.append(f"`{name}` {spark_type}")
    return ", ".join(parts)


def _bool_str(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def translate_read_options(fmt: str, opts: dict[str, Any]) -> dict[str, str]:
    """DuckDB read_csv/read_json option names -> Spark reader options.

    Unknown options pass through verbatim (Spark ignores unknown options),
    matching the reference's Tier-B pass-through posture."""
    out: dict[str, str] = {}
    for k, v in opts.items():
        lk = k.lower()
        if fmt == "csv":
            if lk in ("delim", "sep", "delimiter"):
                out["sep"] = str(v)
            elif lk == "header":
                out["header"] = _bool_str(v)
            elif lk == "quote":
                out["quote"] = str(v)
            elif lk == "escape":
                out["escape"] = str(v)
            elif lk in ("nullstr", "null_str"):
                out["nullValue"] = str(v)
            elif lk == "compression":
                # read side: Spark infers codec from extension; accept & drop
                continue
            elif lk == "dateformat":
                out["dateFormat"] = str(v)
            elif lk == "timestampformat":
                out["timestampFormat"] = str(v)
            elif lk == "sample_size":
                out["samplingRatio"] = "1.0"
            elif lk == "ignore_errors":
                out["mode"] = "DROPMALFORMED" if v else "FAILFAST"
            elif lk == "all_varchar":
                if v:
                    out["inferSchema"] = "false"
            else:
                out[k] = _bool_str(v)
        elif fmt == "json":
            if lk == "compression":
                continue
            if lk in ("format",):  # duckdb json 'format=newline_delimited|array'
                if str(v) in ("array",):
                    out["multiLine"] = "true"
            elif lk == "timestampformat":
                out["timestampFormat"] = str(v)
            else:
                out[k] = _bool_str(v)
        else:  # parquet
            out[k] = _bool_str(v)
    return out


_WRITE_CODEC = {
    "gzip": "gzip",
    "zstd": "zstd",
    "snappy": "snappy",
    "none": "none",
    "uncompressed": "none",
    "lz4": "lz4",
    "brotli": "brotli",
}


def translate_write_options(fmt: str, opts: dict[str, Any]) -> dict[str, str]:
    """DuckDB COPY options -> Spark writer options (SURVEY.md §2.1 list)."""
    out: dict[str, str] = {}
    for k, v in opts.items():
        lk = k.lower()
        if lk in ("delim", "sep", "delimiter") and fmt == "csv":
            out["sep"] = str(v)
        elif lk == "header" and fmt == "csv":
            out["header"] = _bool_str(v)
        elif lk == "compression":
            codec = _WRITE_CODEC.get(str(v).lstrip(":").lower(), str(v))
            out["compression"] = codec
        elif lk == "force_quote":
            # handled by writers.write_table (per-column pre-wrap; Spark CSV
            # itself only has global quoteAll)
            continue
        elif lk == "quote" and fmt == "csv":
            out["quote"] = str(v)
        elif lk == "nullstr" and fmt == "csv":
            out["nullValue"] = str(v)
        elif lk == "dateformat":
            out["dateFormat"] = str(v)
        elif lk == "timestampformat":
            out["timestampFormat"] = str(v)
        elif lk == "use_tmp_file":
            # Spark's FileOutputCommitter _temporary+rename protocol gives
            # atomic-ish writes unconditionally (SURVEY.md §4 row 6).
            continue
        elif lk == "kv_metadata":
            continue  # handled by sources.metadata, not the Spark writer
        else:
            out[k] = _bool_str(v)
    return out
