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


def len_(col: Column | str) -> Column:
    """DuckDB len() on strings or lists."""
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
