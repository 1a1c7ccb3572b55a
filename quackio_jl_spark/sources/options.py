"""DuckDB-style reader/writer option translation.

The reference passes every kwarg straight through to DuckDB's
``read_csv``/``read_parquet``/``read_json``/``COPY`` (serialization machinery
at /root/reference/src/QuackIO.jl:100-121), and DuckDB's binder *errors* on
unknown option names (the reference likewise throws on kwargs without a known
filetype, src/QuackIO.jl:85-89). Spark's readers use different option names
and silently IGNORE unknown ones — so a misspelled or untranslated DuckDB
option would silently read wrong data. This module is the compatibility
table (SURVEY.md §4(b)) and it reproduces DuckDB's fail-fast posture:
**unknown option names raise** ``UnknownOptionError``. Genuine Spark-native
options go through the documented ``spark_options={...}`` escape hatch on
``read_*``/``write_table`` instead.

Only *translation* lives here — no I/O.
"""

from __future__ import annotations

import difflib
from typing import Any

__all__ = [
    "translate_read_options",
    "translate_write_options",
    "duckdb_schema_to_ddl",
    "normalize_format",
    "guess_format",
    "UnknownOptionError",
]


class UnknownOptionError(ValueError):
    """Raised for option names with no DuckDB->Spark translation."""


def _reject(kind: str, fmt: str, key: str, known: set[str], reason: str | None = None) -> None:
    if reason is None:
        close = difflib.get_close_matches(key.lower(), sorted(known), n=1)
        hint = f" (did you mean {close[0]!r}?)" if close else ""
        reason = (
            f"no Spark translation{hint}; known {fmt} {kind} options: "
            f"{sorted(known)}. Pass genuine Spark options via spark_options={{...}}"
        )
    raise UnknownOptionError(f"{kind}_{fmt} option {key!r}: {reason}")

VALID_FORMATS = {"csv", "parquet", "json", "orc", "text"}

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
        ("orc", (".orc",)),
        ("text", (".txt", ".text")),
    ):
        if name.endswith(exts):
            return fmt
    raise ValueError(f"cannot guess format from filename: {path!r}")


def _split_top_level(s: str) -> list[str]:
    """Split on commas at paren/bracket nesting depth 0, respecting double
    quotes (DuckDB's hostile-identifier quoting)."""
    parts, depth, buf, in_q = [], 0, [], False
    for ch in s:
        if ch == '"':
            in_q = not in_q
            buf.append(ch)
        elif in_q:
            buf.append(ch)
        elif ch in "([<":
            depth += 1
            buf.append(ch)
        elif ch in ")]>":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf).strip())
    return parts


def _split_field(field: str) -> tuple[str, str]:
    """One DuckDB STRUCT field decl -> (name, type). The name is either a
    double-quoted identifier (may contain spaces/emoji — the reference's
    hostile-name precedent, /root/reference/test/runtests.jl:72-76) or a
    bare word; the rest is the type."""
    field = field.strip()
    if field.startswith('"'):
        end = field.index('"', 1)
        return field[1:end], field[end + 1 :].strip()
    name, _, typ = field.partition(" ")
    return name, typ.strip()


def duckdb_type_to_spark(duck_type: str) -> str:
    """DuckDB type -> Spark DDL type (used by ``columns=`` full schemas and
    ``types=`` partial overrides). Handles nested types recursively:
    ``STRUCT(a INTEGER, "weird name" VARCHAR)`` -> ``struct<a:bigint,...>``,
    ``MAP(VARCHAR, INTEGER)`` -> ``map<string,bigint>``, ``INTEGER[]`` ->
    ``array<bigint>``, ``DECIMAL(p,s)`` passes through."""
    t = str(duck_type).strip()
    lt = t.lower()
    if lt.endswith("[]"):
        return f"array<{duckdb_type_to_spark(t[:-2])}>"
    if lt.startswith("struct(") and t.endswith(")"):
        fields = _split_top_level(t[7:-1])
        inner = ",".join(
            f"`{name}`:{duckdb_type_to_spark(typ)}"
            for name, typ in (_split_field(f) for f in fields)
        )
        return f"struct<{inner}>"
    if lt.startswith("map(") and t.endswith(")"):
        k, v = _split_top_level(t[4:-1])
        return f"map<{duckdb_type_to_spark(k)},{duckdb_type_to_spark(v)}>"
    if lt.startswith("decimal(") or lt.startswith("numeric("):
        return "decimal" + t[t.index("(") :]
    return _DUCKDB_TO_SPARK_TYPE.get(lt, t)


def duckdb_schema_to_ddl(columns: dict[str, str]) -> str:
    """``columns={'a': 'float', 'b': 'varchar'}`` -> Spark DDL schema string.

    Mirrors the reference's explicit-schema kwarg
    (/root/reference/test/runtests.jl:67-71)."""
    parts = []
    for name, duck_type in columns.items():
        parts.append(f"`{name}` {duckdb_type_to_spark(duck_type)}")
    return ", ".join(parts)


def _bool_str(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


# Options that exist in DuckDB but have NO faithful Spark translation.
# Accepting-and-ignoring them is exactly the silent-wrong-data trap this
# module exists to close, so each raises with tailored guidance.
_READ_UNSUPPORTED: dict[str, dict[str, str]] = {
    "csv": {
        "decimal_separator": (
            "Spark's CSV parser has no decimal-separator knob; read the "
            "column as varchar and post-cast with replace(col, ',', '.')"
        ),
        "parallel": "Spark always reads splittable CSV in parallel",
        "buffer_size": "internal DuckDB tuning knob with no Spark analogue",
    },
    "json": {
        "maximum_object_size": "Spark's JSON parser has no per-object size cap",
        "records": (
            "Spark reads NDJSON records natively; for JSON arrays use "
            "format='array' (multiLine), for scalar-per-line files read as "
            "text"
        ),
    },
    "parquet": {
        "binary_as_string": (
            "Spark maps parquet BYTE_ARRAY to binary; cast(col as string) "
            "after the scan instead"
        ),
        "encryption_config": "Spark's parquet reader has no modular-encryption option surface here",
    },
}

# Known-name sets for typo suggestions ("skip"/"sample_size"/"filename"/
# "file_row_number" are handled by readers._read itself, before translation).
_READ_KNOWN: dict[str, set[str]] = {
    "csv": {
        "delim", "sep", "delimiter", "header", "quote", "escape", "nullstr",
        "null_str", "compression", "dateformat", "timestampformat",
        "ignore_errors", "all_varchar", "new_line", "encoding", "skip",
        "sample_size", "force_not_null",
    },
    "json": {
        "compression", "format", "timestampformat", "dateformat",
        "ignore_errors", "sample_size",
    },
    "parquet": {"compression", "filename", "file_row_number"},
    # beyond-reference, Spark-native columnar format (DuckDB has no ORC
    # scanner; the roundtrip oracle verifies content via the aggregate)
    "orc": {"compression"},
    # raw line/whole-file text (DuckDB read_text analogue)
    "text": {"compression"},
}


def translate_read_options(fmt: str, opts: dict[str, Any]) -> dict[str, str]:
    """DuckDB read_csv/read_json/read_parquet option names -> Spark reader
    options. Unknown names raise :class:`UnknownOptionError` (DuckDB binder
    parity) instead of passing through to Spark's silent-ignore."""
    out: dict[str, str] = {}
    known = _READ_KNOWN.get(fmt, set())
    unsupported = _READ_UNSUPPORTED.get(fmt, {})
    for k, v in opts.items():
        lk = k.lower()
        if lk in unsupported:
            _reject("read", fmt, k, known, unsupported[lk])
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
            elif lk == "encoding":
                out["encoding"] = str(v)
            elif lk == "new_line":
                nv = str(v)
                if nv == "\r\n":
                    continue  # univocity already splits on \r\n by default
                out["lineSep"] = nv
            elif lk == "ignore_errors":
                out["mode"] = "DROPMALFORMED" if v else "FAILFAST"
            elif lk == "all_varchar":
                if v:
                    out["inferSchema"] = "false"
            else:
                _reject("read", fmt, k, known)
        elif fmt == "json":
            if lk == "compression":
                continue
            elif lk == "format":  # duckdb json 'format=newline_delimited|array'
                if str(v) in ("array",):
                    out["multiLine"] = "true"
            elif lk == "timestampformat":
                out["timestampFormat"] = str(v)
            elif lk == "dateformat":
                out["dateFormat"] = str(v)
            elif lk == "ignore_errors":
                out["mode"] = "DROPMALFORMED" if v else "FAILFAST"
            else:
                _reject("read", fmt, k, known)
        else:  # parquet / orc
            if lk == "compression":
                continue  # columnar footers are self-describing on read
            else:
                _reject("read", fmt, k, known)
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


_WRITE_UNSUPPORTED: dict[str, dict[str, str]] = {
    "csv": {
        "prefix": "DuckDB COPY prefix/suffix framing has no Spark writer analogue",
        "suffix": "DuckDB COPY prefix/suffix framing has no Spark writer analogue",
    },
    "parquet": {
        "row_group_size": (
            "DuckDB counts ROWS per row group; Spark's parquet.block.size "
            "option counts BYTES — pass spark_options={'parquet.block.size': "
            "<bytes>} if byte-based sizing is acceptable"
        ),
        "field_ids": "Spark's parquet writer assigns field ids itself",
        "encryption_config": "no modular-encryption option surface on Spark's writer here",
    },
    "json": {
        "array": (
            "Spark writes NDJSON only; wrap post-hoc or use "
            "format='array' on the read side of the consumer"
        ),
    },
}

_WRITE_KNOWN: dict[str, set[str]] = {
    "csv": {
        "delim", "sep", "delimiter", "header", "compression", "force_quote",
        "quote", "escape", "nullstr", "dateformat", "timestampformat",
        "use_tmp_file", "new_line", "per_thread_output", "partition_by",
    },
    "json": {
        "compression", "dateformat", "timestampformat", "use_tmp_file",
        "per_thread_output", "partition_by",
    },
    "parquet": {
        "compression", "kv_metadata", "use_tmp_file", "per_thread_output",
        "partition_by",
    },
    "orc": {
        "compression", "use_tmp_file", "per_thread_output", "partition_by",
    },
    "text": {
        "compression", "use_tmp_file", "per_thread_output", "partition_by",
    },
}


def translate_write_options(fmt: str, opts: dict[str, Any]) -> dict[str, str]:
    """DuckDB COPY options -> Spark writer options (SURVEY.md §2.1 list).
    Unknown names raise :class:`UnknownOptionError` (DuckDB binder parity)."""
    out: dict[str, str] = {}
    known = _WRITE_KNOWN.get(fmt, set())
    unsupported = _WRITE_UNSUPPORTED.get(fmt, {})
    for k, v in opts.items():
        lk = k.lower()
        if lk in unsupported:
            _reject("write", fmt, k, known, unsupported[lk])
        if lk in ("delim", "sep", "delimiter") and fmt == "csv":
            out["sep"] = str(v)
        elif lk == "header" and fmt == "csv":
            out["header"] = _bool_str(v)
        elif lk == "compression":
            codec = _WRITE_CODEC.get(str(v).lstrip(":").lower(), str(v))
            if fmt == "orc" and codec == "gzip":
                codec = "zlib"  # ORC's DEFLATE codec is named zlib
            out["compression"] = codec
        elif lk == "force_quote":
            # handled by writers.write_table (per-column pre-wrap; Spark CSV
            # itself only has global quoteAll)
            continue
        elif lk == "quote" and fmt == "csv":
            out["quote"] = str(v)
        elif lk == "escape" and fmt == "csv":
            out["escape"] = str(v)
        elif lk == "nullstr" and fmt == "csv":
            out["nullValue"] = str(v)
        elif lk == "new_line" and fmt == "csv":
            nv = str(v)
            if nv != "\r\n":
                out["lineSep"] = nv
        elif lk == "per_thread_output":
            # DuckDB writes one file per thread; Spark's directory mode
            # (single_file=False) is the same contract — one part per task.
            continue
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
            _reject("write", fmt, k, known)
    return out
