"""Eager/lazy file readers with DuckDB-compatible pushdown kwargs.

Reference surface (SURVEY.md §2.1, §2.2, §2.5):
  read_csv / read_parquet / read_json (fmt, file; select=, limit=, opts...)
    -> /root/reference/src/QuackIO.jl:45-51 -> _read_file :69-76
  read_file with format guessing -> /root/reference/src/QuackIO.jl:60-67,84-90
  multi-file list scan -> /root/reference/src/QuackIO.jl:115,121 (tests :78-82)
  select= projection + rename pairs -> /root/reference/src/QuackIO.jl:79-82
  limit= pushdown -> /root/reference/src/QuackIO.jl:96-97

Spark-first design: the returned ``DataFrame`` *is* the reference's lazy
``SQLCollection`` (ext/SQLCollectionsExt.jl:7-16) — an unexecuted relational
plan. ``select``/``limit`` become Catalyst ColumnPruning / LimitPushDown, which
land in the file scan exactly like the reference's string-assembled
``SELECT cols FROM read_csv(...) LIMIT n``. Materializer argument ``fmt``
mirrors Tables.materializer (src/QuackIO.jl:72-73): 'df' (lazy, default),
'pandas' (columntable analogue), 'rows' (rowtable analogue), 'arrow'.
"""

from __future__ import annotations

from typing import Any, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .options import (
    duckdb_schema_to_ddl,
    guess_format,
    normalize_format,
    translate_read_options,
)

__all__ = ["read_csv", "read_parquet", "read_json", "read_file", "read_text", "materialize"]


def _apply_select(df: DataFrame, select: Iterable[Any]) -> DataFrame:
    """``select=`` iterator of names or ``(old, new)`` rename pairs
    (reference renders ``"a" AS "c"`` — src/QuackIO.jl:79-82)."""
    cols = []
    for item in select:
        if isinstance(item, tuple):
            old, new = item
            cols.append(F.col(f"`{old}`").alias(str(new)))
        elif isinstance(item, dict):
            for old, new in item.items():
                cols.append(F.col(f"`{old}`").alias(str(new)))
        else:
            cols.append(F.col(f"`{item}`"))
    return df.select(*cols)


def _localize(p, suffix: str = "") -> str:
    """Resolve one path-like input to a local path Spark can scan.

    - file-like objects (the reference's IOBuffer support,
      src/QuackIO.jl:108-112): spilled to a temp file;
    - http(s) URLs (the reference's httpfs pass-through, README.md:43,53):
      fetched to a temp file. On a cluster you'd use Hadoop-FS URLs
      (s3a://, hdfs://) which Spark scans natively — plain http has no
      splittable FS connector, so fetch-to-temp matches DuckDB's behavior;
    - anything else: returned as-is.
    """
    if hasattr(p, "read"):
        import tempfile

        data = p.read()
        if isinstance(data, str):
            data = data.encode()
        f = tempfile.NamedTemporaryFile(suffix=suffix or ".dat", delete=False)
        f.write(data)
        f.close()
        return f.name
    s = str(p)
    if s.startswith(("http://", "https://")):
        import os
        import tempfile
        import urllib.request

        # Driver-side fetch is for modest side files (the reference's httpfs
        # use case); streamed in 1 MiB chunks — never the whole body in RAM —
        # and capped so a mistyped URL to a multi-TB object fails fast
        # instead of filling the driver's disk.
        max_bytes = int(
            os.environ.get("QUACKIO_HTTP_MAX_BYTES", 4 * 1024**3)
        )
        name = s.rstrip("/").rsplit("/", 1)[-1] or "download"
        f = tempfile.NamedTemporaryFile(suffix="_" + name, delete=False)
        written = 0
        with urllib.request.urlopen(s) as resp:
            while chunk := resp.read(1 << 20):
                written += len(chunk)
                if written > max_bytes:
                    f.close()
                    os.unlink(f.name)
                    raise ValueError(
                        f"http source exceeds QUACKIO_HTTP_MAX_BYTES="
                        f"{max_bytes} ({s}); use a distributed filesystem "
                        f"URL (s3a://, hdfs://) for large inputs"
                    )
                f.write(chunk)
        f.close()
        return f.name
    return s


def _paths(file, suffix: str = "") -> list[str]:
    if isinstance(file, (list, tuple)):
        return [_localize(p, suffix) for p in file]
    return [_localize(file, suffix)]


def _restrict_auto_types(df: DataFrame, candidates: Sequence[str]) -> DataFrame:
    """Emulate DuckDB's ``auto_type_candidates`` (test/runtests.jl:66):
    inferred column types not in the candidate list fall back to varchar."""
    allowed = set()
    for c in candidates:
        c = str(c).lower()
        if c in ("int", "integer", "bigint"):
            allowed.update(("int", "bigint"))
        elif c in ("float", "double", "real"):
            allowed.update(("float", "double"))
        elif c in ("varchar", "text", "string"):
            allowed.add("string")
        elif c in ("bool", "boolean"):
            allowed.add("boolean")
        elif c in ("timestamp", "datetime"):
            allowed.add("timestamp")
        elif c == "date":
            allowed.add("date")
        else:
            allowed.add(c)
    out = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t in allowed or "string" not in allowed:
            out.append(F.col(f"`{f.name}`"))
        else:
            out.append(F.col(f"`{f.name}`").cast("string").alias(f.name))
    return df.select(*out)


_SNIFF_DELIMS = (",", ";", "\t", "|")


def _sniff_delim(path: str) -> str | None:
    """CSV delimiter sniffing — the reference inherits DuckDB's dialect
    sniffer (read_csv with no ``delim=`` auto-detects the separator,
    src/QuackIO.jl pass-through to DuckDB read_csv_auto); Spark's reader
    silently assumes ','. Mirror the sniffer's core rule: the candidate
    delimiter that splits the sample's lines into the SAME field count
    (> 1) on every line, preferring the one yielding the most fields.
    Quote-aware (ignores delimiters inside double quotes), driver-side
    over the first 64 KiB of the first file only, and conservative: any
    ambiguity returns None and the ',' default stands."""
    import gzip
    import os

    if not os.path.isfile(path):
        return None
    try:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rb") as f:
            head = f.read(65536)
    except OSError:
        return None
    text = head.decode("utf-8", errors="replace")
    lines = text.split("\n")
    # drop a trailing partial line (sample cut mid-row)
    if len(lines) > 1 and not text.endswith("\n"):
        lines = lines[:-1]
    lines = [ln.rstrip("\r") for ln in lines if ln.strip()][:20]
    if len(lines) < 2:
        return None

    def fields(line: str, d: str) -> int:
        n, in_q = 1, False
        for ch in line:
            if ch == '"':
                in_q = not in_q
            elif ch == d and not in_q:
                n += 1
        return n

    best, best_n = None, 1
    for d in _SNIFF_DELIMS:
        counts = {fields(ln, d) for ln in lines}
        if len(counts) == 1:
            (n,) = counts
            if n > best_n:
                best, best_n = d, n
    return best


def _sniff_json_array(path: str) -> bool:
    """DuckDB read_json reads BOTH newline-delimited records and a
    top-level JSON array of records; Spark's reader needs multiLine=true
    for the array form (and would otherwise error or mis-parse). A leading
    '[' (first non-whitespace byte) is the array form."""
    import gzip
    import os

    if not os.path.isfile(path):
        return False
    try:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rb") as f:
            head = f.read(4096)
    except OSError:
        return False
    stripped = head.lstrip()
    return stripped.startswith(b"[")


_NUMERIC_RE = None


def _sniff_headerless(path: str, delim: str) -> bool:
    """Header sniffing, DuckDB-style: a purely NUMERIC field in the first
    row means that row is data, not a header (column names are never bare
    numbers) — DuckDB's sniffer then reads the file headerless and
    synthesizes column names. Spark's header=true would swallow the row as
    names. Conservative: a first row with no numeric field keeps the
    header=true default (all-string files are ambiguous for DuckDB too)."""
    import gzip
    import os
    import re

    global _NUMERIC_RE
    if _NUMERIC_RE is None:
        _NUMERIC_RE = re.compile(r"^-?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
    if not os.path.isfile(path):
        return False
    try:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rb") as f:
            head = f.read(8192)
    except OSError:
        return False
    first = head.decode("utf-8", errors="replace").split("\n", 1)[0].rstrip("\r")
    if not first.strip():
        return False
    # quote-aware split on the (already sniffed) delimiter
    parts, cur, in_q = [], [], False
    for ch in first:
        if ch == '"':
            in_q = not in_q
        elif ch == delim and not in_q:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return any(_NUMERIC_RE.match(p.strip()) for p in parts if p.strip())


def _estimate_rows(paths: Sequence[str]) -> int | None:
    """Cheap row-count estimate for honoring DuckDB's ``sample_size=N``
    (a row COUNT) through Spark's ``samplingRatio`` (a FRACTION): total
    bytes / average line length sampled from the first 64 KiB. Local
    paths only — distributed-FS URLs fall back to full-scan inference."""
    import os

    total = 0
    for p in paths:
        if not os.path.isfile(p):
            return None
        total += os.path.getsize(p)
    try:
        with open(paths[0], "rb") as f:
            head = f.read(65536)
    except OSError:
        return None
    lines = head.count(b"\n")
    if not lines or not total:
        return None
    return max(1, int(total / (len(head) / lines)))


def _skip_lines(spark: SparkSession, paths: Sequence[str], n: int):
    """DuckDB csv ``skip=N``: drop the first N lines of EACH file before
    parsing (preamble text ahead of the header). Spark's CSV reader has no
    such option, so we feed the parser an RDD of the surviving lines —
    ``zipWithIndex`` preserves file line order per input. One extra pass
    over the text; ``skip`` targets curated side files, not the 100 TB
    scan path (parquet has no preambles)."""
    sc = spark.sparkContext
    rdds = [
        sc.textFile(p)
        .zipWithIndex()
        .filter(lambda t, n=n: t[1] >= n)
        .map(lambda t: t[0])
        for p in paths
    ]
    return rdds[0] if len(rdds) == 1 else sc.union(rdds)


_GLOB_CHARS = ("*", "?", "[", "{")


def _glob_base(path: str) -> str:
    """Directory prefix of a glob pattern — everything before the first
    path segment containing a wildcard."""
    parts = str(path).split("/")
    keep = []
    for seg in parts:
        if any(c in seg for c in _GLOB_CHARS):
            break
        keep.append(seg)
    return "/".join(keep) or "."


def _read(
    spark: SparkSession,
    fmt: str,
    file: str | Sequence[str],
    *,
    select: Iterable[Any] | None = None,
    limit: int | None = None,
    columns: dict[str, str] | None = None,
    names: Sequence[str] | None = None,
    auto_type_candidates: Sequence[str] | None = None,
    hive_partitioning: bool | None = None,
    union_by_name: bool = False,
    types: dict[str, str] | None = None,
    force_not_null: Sequence[str] | str | None = None,
    skip: int | None = None,
    sample_size: int | None = None,
    filename: bool = False,
    file_row_number: bool = False,
    spark_options: dict[str, Any] | None = None,
    materializer: str = "df",
    **options: Any,
) -> Any:
    opts = translate_read_options(fmt, options)
    paths = _paths(file, suffix=f".{fmt}")
    if skip is not None and fmt != "csv":
        raise ValueError("skip= is a CSV option (DuckDB read_csv skip)")
    if sample_size is not None and fmt in ("csv", "json"):
        # DuckDB: number of rows used for sniffing (-1 = all). Spark:
        # samplingRatio fraction of rows used for schema inference.
        n = int(sample_size)
        if n <= 0:
            opts["samplingRatio"] = "1.0"
        else:
            est = _estimate_rows(paths)
            ratio = min(1.0, n / est) if est else 1.0
            opts["samplingRatio"] = f"{max(ratio, 1e-4):.6f}"
    if file_row_number and fmt != "parquet":
        # DuckDB: file_row_number is read_parquet-only; filename= exists on
        # read_csv/read_json too, and input_file_name() serves any format.
        raise ValueError(
            "file_row_number= is a parquet option (DuckDB read_parquet)"
        )
    reader = spark.read
    headerless = False
    if fmt == "csv" and "sep" not in opts:
        # Reference parity: DuckDB's sniffer auto-detects the delimiter
        # when none is given; Spark silently assumes ','.
        sniffed = _sniff_delim(paths[0])
        if sniffed is not None:
            opts["sep"] = sniffed
    if fmt == "json" and "multiLine" not in opts:
        # Reference parity: DuckDB read_json auto-detects a top-level
        # ARRAY of records vs NDJSON; Spark needs multiLine for arrays.
        if _sniff_json_array(paths[0]):
            opts["multiLine"] = "true"
    if fmt == "csv" and "header" not in opts and not columns and not names:
        # Reference parity: DuckDB's sniffer detects headerLESS files (an
        # all-numeric first row is data); Spark's header=true default
        # would swallow that row as column names.
        headerless = _sniff_headerless(paths[0], opts.get("sep", ","))
        if headerless:
            opts["header"] = "false"
    if columns:
        reader = reader.schema(duckdb_schema_to_ddl(columns))
        if fmt == "csv":
            opts.setdefault("header", "true")
    elif fmt == "csv":
        opts.setdefault("header", "true")
        opts.setdefault("inferSchema", "true")
    if fmt in ("csv", "json"):
        # DuckDB fails on malformed rows unless ignore_errors=true; Spark's
        # default is PERMISSIVE (malformed -> nulls, silently). Align the
        # DEFAULT to fail-fast; opt out via ignore_errors= or
        # spark_options={'mode': 'PERMISSIVE'}.
        opts.setdefault("mode", "FAILFAST")
    # DuckDB `hive_partitioning` (Tier B pass-through,
    # /root/reference/src/QuackIO.jl:100-121): key=value path segments
    # become columns. Spark discovers them natively on directory reads; a
    # GLOB that reaches the leaf files needs basePath so discovery knows
    # where the partition segments start. hive_partitioning=False disables
    # discovery (recursiveFileLookup reads leaves as plain files) — this
    # is what partition PRUNING hangs off, the #1 scan saver at 100 TB.
    if hive_partitioning is True and len(paths) == 1:
        opts.setdefault("basePath", _glob_base(paths[0]))
    elif hive_partitioning is False:
        opts.setdefault("recursiveFileLookup", "true")
    # DuckDB `union_by_name`: align multi-file schemas by column NAME
    # (missing columns -> NULL) instead of by position.
    if union_by_name and fmt == "parquet":
        opts.setdefault("mergeSchema", "true")  # Spark's native name-union
    if spark_options:
        # documented escape hatch: genuine Spark reader options, verbatim,
        # overriding any translated/default value
        opts.update({k: str(v) for k, v in spark_options.items()})
    reader = reader.options(**opts)
    if skip:
        df = reader.csv(_skip_lines(spark, paths, int(skip)))
    elif union_by_name and fmt != "parquet" and len(paths) > 1:
        # csv/json: infer each file independently, then name-union
        from functools import reduce

        parts_dfs = [getattr(spark.read.options(**opts), fmt)(p) for p in paths]
        df = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), parts_dfs
        )
    else:
        # DataFrameReader.parquet is varargs; csv/json take a path list
        df = reader.parquet(*paths) if fmt == "parquet" else getattr(reader, fmt)(paths)
    if headerless:
        # DuckDB names sniffed-headerless columns column0..columnN
        # (Spark: _c0..); match the reference's naming.
        df = df.toDF(*[f"column{i}" for i in range(len(df.columns))])
    if filename:
        # DuckDB read_csv/read_json/read_parquet(filename=true): which
        # file each row came from
        df = df.withColumn("filename", F.input_file_name())
    if file_row_number:
        # DuckDB read_parquet(file_row_number=true) -> Spark's hidden
        # _metadata.row_index (computed by the scan, no extra pass)
        df = df.select("*", F.col("_metadata.row_index").alias("file_row_number"))
    if names and not columns:
        # positional rename, reference `names=` (test/runtests.jl:72-76).
        # When BOTH names= and columns= are passed, DuckDB's read_csv (the
        # reference's kwarg pass-through target, src/QuackIO.jl:100-121)
        # lets columns= define the full schema and silently ignores names=
        # (verified against duckdb 1.0: columns={'p':...}, names=['u',...]
        # -> columns p/q/r) — mirrored here, independent of kwarg order.
        df = df.toDF(*[str(n) for n in names], *df.columns[len(list(names)):])
    if force_not_null:
        # DuckDB read_csv `force_not_null=[cols]`: empty CSV fields in the
        # listed columns read as '' instead of NULL (csv-only; map-side).
        if fmt != "csv":
            raise ValueError("force_not_null= is a CSV option (DuckDB read_csv)")
        cols = (
            [force_not_null]
            if isinstance(force_not_null, str)
            else [str(c) for c in force_not_null]
        )
        missing = [c for c in cols if c not in df.columns]
        if missing:
            raise ValueError(
                f"force_not_null= names columns not in the file: {missing}"
            )
        dtypes = dict(df.dtypes)
        bad = [c for c in cols if dtypes[c] != "string"]
        if bad:
            raise ValueError(
                f"force_not_null= requires varchar columns (DuckDB casts '' "
                f"and fails on non-text types); non-string: {bad}"
            )
        df = df.withColumns(
            {c: F.coalesce(F.col(f"`{c}`"), F.lit("")) for c in cols}
        )
    if types:
        # DuckDB read_csv `types=`: PARTIAL per-column type override on top
        # of inference (unlike `columns=`, which replaces the full schema).
        # Unknown column names error, as in DuckDB's binder.
        from .options import duckdb_type_to_spark

        missing = [c for c in types if c not in df.columns]
        if missing:
            raise ValueError(
                f"types= names columns not in the file: {missing}; "
                f"available: {df.columns}"
            )
        df = df.withColumns(
            {
                c: F.col(f"`{c}`").cast(duckdb_type_to_spark(t))
                for c, t in types.items()
            }
        )
    if auto_type_candidates:
        df = _restrict_auto_types(df, auto_type_candidates)
    if select is not None:
        df = _apply_select(df, select)
    if limit is not None:
        df = df.limit(int(limit))
    return materialize(df, materializer)


def materialize(df: DataFrame, fmt: str = "df"):
    """Edge materializers — the Tables.materializer analogue
    (src/QuackIO.jl:72-73). 'df' keeps the plan lazy (SQLCollection mode)."""
    if fmt in ("df", "lazy", "sqlcollection"):
        return df
    if fmt in ("pandas", "columntable"):
        return df.toPandas()
    if fmt in ("rows", "rowtable"):
        return df.collect()
    if fmt == "arrow":
        return df.toArrow()
    if callable(fmt):
        return fmt(df)
    raise ValueError(f"unknown materializer {fmt!r}")


def read_csv(spark: SparkSession, file, **kw) -> DataFrame:
    """CSV scan (S1). ``select=``/``limit=`` push into the scan via Catalyst."""
    return _read(spark, "csv", file, **kw)


def read_parquet(spark: SparkSession, file, with_metadata: bool = False, **kw):
    """Parquet scan (S2). With ``with_metadata=True`` also returns the
    file-level KV metadata dict — the reference's eager-read behavior of
    attaching parquet_kv_metadata to the materialized table
    (src/QuackIO.jl:74,134-147). Returns (result, metadata) in that case."""
    res = _read(spark, "parquet", file, **kw)
    if not with_metadata:
        return res
    from .metadata import read_kv_metadata

    meta: dict[str, str] = {}
    for p in _paths(file):
        meta.update(read_kv_metadata(p))
    return res, meta


def read_json(spark: SparkSession, file, **kw) -> DataFrame:
    """JSON scan (S3) — NDJSON by default, like DuckDB read_json."""
    return _read(spark, "json", file, **kw)


def read_orc(spark: SparkSession, file, **kw) -> DataFrame:
    """ORC scan — beyond-reference, Spark-native columnar format (DuckDB has
    no ORC scanner, so the reference cannot read it; kept for Spark-ecosystem
    interop). Same select=/limit= pushdown surface as read_parquet."""
    return _read(spark, "orc", file, **kw)


def read_file(spark: SparkSession, file, filetype: str | None = None, **kw) -> DataFrame:
    """Format-guessing scan (S4) — reference sniffs when filetype is nothing
    (src/QuackIO.jl:60-67). Kwargs besides select/limit are rejected when the
    format had to be guessed, matching src/QuackIO.jl:85-89."""
    if filetype is None:
        first = _paths(file)[0]
        fmt = guess_format(first)
        extra = {k for k in kw if k not in ("select", "limit", "materializer")}
        if extra:
            raise ValueError(
                f"options {sorted(extra)} require an explicit filetype= (format was guessed)"
            )
    else:
        fmt = normalize_format(filetype)
    if fmt == "text":
        # raw text routes to read_text's (filename, content) contract —
        # line mode (splittable) under format guessing; select/limit apply
        # on top of the returned DataFrame like any lazy projection
        df = read_text(spark, file, by_line=True)
        if kw.get("select") is not None:
            df = df.select(*[c for c in kw["select"]])
        if kw.get("limit") is not None:
            df = df.limit(int(kw["limit"]))
        return df
    return _read(spark, fmt, file, **kw)


def read_text(
    spark: SparkSession,
    file,
    *,
    by_line: bool = False,
    spark_options: dict[str, Any] | None = None,
    materializer: str = "df",
):
    """Raw text scan — DuckDB ``read_text`` parity: one row per FILE with
    columns ``(filename, content)``. The raw-.txt-shard ingestion path a
    corpus pipeline starts from.

    ``by_line=True`` switches to Spark's native line-record reader (one
    row per LINE, filename retained) — the scale default when files are
    line-oriented: whole-file mode makes each file a single task input
    (non-splittable, one row in memory per file), line mode splits on
    block boundaries like any other scan. Filenames are normalized to
    plain paths (Spark reports ``file:`` URIs; DuckDB reports the path
    as globbed)."""
    import glob as _glob

    paths = []
    for p_ in _paths(file, suffix=".txt"):
        # whole-file mode's input format does not glob-expand; resolve
        # local wildcards driver-side (DuckDB read_text globs the same way)
        if any(ch in p_ for ch in "*?[") and "://" not in p_:
            paths.extend(sorted(_glob.glob(p_)))
        else:
            paths.append(p_)
    reader = spark.read.options(**{k: str(v) for k, v in (spark_options or {}).items()})
    fname = F.regexp_replace(F.input_file_name(), "^file:(//)?", "")
    df = (
        # text()'s wholetext kwarg overwrites any option of the same name,
        # so it must be passed here, not via .option()
        reader.text(paths, wholetext=not by_line)
        .select(
            F.url_decode(fname).alias("filename"),
            F.col("value").alias("content"),
        )
    )
    return materialize(df, materializer)
