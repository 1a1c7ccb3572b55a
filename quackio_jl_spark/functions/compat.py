"""DuckDB-named scalar-function compatibility layer (SURVEY.md §2.6).

The reference exposes DuckDB's whole function library implicitly through its
lazy SQL handle; its own code ships no function machinery. Here we provide a
thin table of DuckDB spellings -> Spark Column expressions so a user migrating
DuckDB-flavoured queries can keep their function names. All of these compile
to built-in JVM expressions (whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["strftime", "list_sum", "list_dot_product", "list_cosine_similarity",
           "string_split", "regexp_matches", "len_", "DUCKDB_FUNCTIONS"]

# DuckDB strftime specifiers -> Spark (java.time) datetime pattern letters.
_STRFTIME = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH",
    "%M": "mm", "%S": "ss", "%f": "SSSSSS", "%j": "DDD", "%a": "EEE",
    "%A": "EEEE", "%b": "MMM", "%B": "MMMM", "%%": "%",
}


def _strftime_to_spark_pattern(fmt: str) -> str:
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            out.append(_STRFTIME.get(tok, tok))
            i += 2
        else:
            ch = fmt[i]
            # literal letters must be quoted in java.time patterns
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)


def strftime(col: Column | str, fmt: str) -> Column:
    """DuckDB strftime(ts, '%Y-%m-%d') -> F.date_format with translated pattern."""
    return F.date_format(col, _strftime_to_spark_pattern(fmt))


def string_split(col: Column | str, sep: str) -> Column:
    """DuckDB string_split -> F.split (literal separator, regex-escaped)."""
    import re

    return F.split(col, re.escape(sep))


def list_sum(col: Column | str) -> Column:
    """DuckDB list_sum -> F.aggregate with a double accumulator."""
    return F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def list_dot_product(a: Column | str, b: Column | str) -> Column:
    """DuckDB list_dot_product -> zip_with multiply + aggregate sum.

    JVM-side (codegen'd higher-order functions); at scale this is the hot
    loop of similarity search, so no Python crossing here."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def list_cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """DuckDB list_cosine_similarity -> dot / (|a| * |b|)."""
    dot = list_dot_product(a, b)
    na = F.sqrt(list_dot_product(a, a))
    nb = F.sqrt(list_dot_product(b, b))
    return dot / (na * nb)


def regexp_matches(col: Column | str, pattern: str) -> Column:
    """DuckDB regexp_matches (find anywhere) -> rlike."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(pattern)


def len_(col: Column | str, df=None) -> Column:
    """DuckDB len(): string length on strings, element count on lists.

    A bare Column carries no type, so the polymorphic dispatch needs the
    owning DataFrame: pass ``df`` (and ``col`` by name) and array columns
    get ``F.size``, everything else ``F.length``. Without ``df`` this is
    string-``len`` only (``F.length`` raises on array columns at analysis
    time rather than silently miscounting)."""
    from pyspark.sql.types import ArrayType, MapType

    if df is not None and isinstance(col, str):
        dtype = df.schema[col].dataType
        if isinstance(dtype, (ArrayType, MapType)):
            return F.size(F.col(col))
        return F.length(F.col(col))
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


DUCKDB_FUNCTIONS = {
    "strftime": strftime,
    "string_split": string_split,
    "str_split": string_split,
    "list_sum": list_sum,
    "list_dot_product": list_dot_product,
    "list_cosine_similarity": list_cosine_similarity,
    "regexp_matches": regexp_matches,
    "len": len_,
}


def strptime(col: Column | str, fmt: str) -> Column:
    """DuckDB strptime(str, '%Y-%m-%d') -> F.to_timestamp with the
    translated pattern."""
    return F.to_timestamp(col, _strftime_to_spark_pattern(fmt))


_DATE_PARTS = {
    "year": F.year, "month": F.month, "day": F.dayofmonth, "hour": F.hour,
    "minute": F.minute, "second": F.second, "quarter": F.quarter,
    "week": F.weekofyear, "doy": F.dayofyear, "dow": F.dayofweek,
    "isodow": lambda c: F.when(F.dayofweek(c) == 1, 7).otherwise(F.dayofweek(c) - 1),
}


def date_part(part: str, col: Column | str) -> Column:
    """DuckDB date_part('hour', ts) — same part names incl. isodow
    (Monday=1..Sunday=7, which Spark's Sunday=1 dayofweek doesn't match
    directly)."""
    try:
        return _DATE_PARTS[part.lower()](col)
    except KeyError:
        raise ValueError(f"unsupported date part: {part!r}") from None


def epoch(col: Column | str) -> Column:
    """DuckDB epoch(ts) -> seconds since 1970 (bigint)."""
    return F.unix_timestamp(F.col(col) if isinstance(col, str) else col)


def epoch_ms(col: Column | str) -> Column:
    """DuckDB epoch_ms(ts) -> milliseconds since 1970."""
    return F.unix_millis(F.col(col) if isinstance(col, str) else col)


def list_contains(col: Column | str, value) -> Column:
    """DuckDB list_contains -> array_contains."""
    return F.array_contains(col, value)


def list_distinct(col: Column | str) -> Column:
    """DuckDB list_distinct -> array_distinct."""
    return F.array_distinct(col)


def list_unique(col: Column | str) -> Column:
    """DuckDB list_unique (COUNT of distinct elements) -> size(array_distinct)."""
    return F.size(F.array_distinct(col))


def list_transform(col: Column | str, fn) -> Column:
    """DuckDB list_transform -> F.transform."""
    return F.transform(col, fn)


def list_filter(col: Column | str, fn) -> Column:
    """DuckDB list_filter -> F.filter."""
    return F.filter(col, fn)


def array_to_string(col: Column | str, sep: str) -> Column:
    """DuckDB array_to_string(l, sep) -> array_join (null elements dropped
    by both engines)."""
    return F.array_join(col, sep)


def string_agg(col: Column | str, sep: str = ",") -> Column:
    """DuckDB string_agg aggregate -> array_join(collect_list(...)).
    Order is input order in both engines — add an ORDER BY/sort_array
    upstream for determinism at scale."""
    return F.array_join(F.collect_list(col), sep)


def levenshtein(a: Column | str, b: Column | str) -> Column:
    """DuckDB levenshtein -> same-named Spark builtin."""
    return F.levenshtein(a, b)


def starts_with(col: Column | str, prefix: str) -> Column:
    """DuckDB starts_with -> Column.startswith."""
    c = F.col(col) if isinstance(col, str) else col
    return c.startswith(prefix)


def regexp_replace_g(col: Column | str, pattern: str, replacement: str) -> Column:
    """DuckDB regexp_replace(..., 'g') — replace ALL matches (Spark's only
    mode). DuckDB's default first-match-only mode has no Spark builtin; use
    an anchored pattern if you need it."""
    return F.regexp_replace(
        F.col(col) if isinstance(col, str) else col, pattern, replacement
    )


DUCKDB_FUNCTIONS.update({
    "strptime": strptime,
    "date_part": date_part,
    "datepart": date_part,
    "epoch": epoch,
    "epoch_ms": epoch_ms,
    "list_contains": list_contains,
    "list_distinct": list_distinct,
    "list_unique": list_unique,
    "list_transform": list_transform,
    "list_filter": list_filter,
    "array_to_string": array_to_string,
    "string_agg": string_agg,
    "levenshtein": levenshtein,
    "starts_with": starts_with,
    "regexp_replace": regexp_replace_g,
})
