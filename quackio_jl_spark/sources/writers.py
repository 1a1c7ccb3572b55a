"""Table sink: write_table (COPY TO analogue).

Reference: ``write_table(file, tbl; format=..., kwargs...)`` registers the
table and executes ``COPY my_tbl TO 'file' (opts)``
(/root/reference/src/QuackIO.jl:33-42). Format inferred from the filename
when not given; lowercase-enforced (src/QuackIO.jl:34).

Spark-first: ``df.write.format(fmt).options(...).save``. Two modes:

- **single_file=True** (default, reference-parity): the reference's COPY
  writes exactly one file. Spark writes a directory of parts; we coalesce(1)
  into a temp dir and move the single part to the target path. Correct for
  result-set-sized outputs; NOT the scale path.
- **single_file=False** (scale path): plain directory write, all executors
  write their partitions in parallel — the only sane mode at 100 TB. Atomic
  via Spark's FileOutputCommitter (the reference's ``use_tmp_file`` for free).

Parquet KV metadata (src/QuackIO.jl:126-132): handled post-write by
sources.metadata via pyarrow, since Spark has no public file-level KV API.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
from typing import Any, Mapping

from pyspark.sql import DataFrame

from .options import guess_format, normalize_format, translate_write_options

__all__ = ["write_table"]

_EXT = {"csv": ".csv", "parquet": ".parquet", "json": ".json"}


def _apply_force_quote(df: DataFrame, cols, opts: dict) -> tuple[DataFrame, dict]:
    """DuckDB per-column ``force_quote`` (reference behavior
    /root/reference/test/runtests.jl:61-64: named columns quoted, nulls
    stay as unquoted empty fields). Spark CSV only offers global quoteAll,
    so we pre-wrap the chosen columns' values in the quote char and disable
    the writer's own quoting. Valid while values don't contain the
    delimiter/quote (the writer can no longer protect them — DuckDB parity
    for such values would need quoteAll instead)."""
    from pyspark.sql import functions as F

    qc = opts.get("quote", '"') or '"'
    if cols == "*":  # DuckDB FORCE_QUOTE * : quote every column
        names = list(df.columns)
    else:
        names = [cols] if isinstance(cols, str) else [str(c) for c in cols]
    exprs = []
    for c in df.columns:
        if c in names:
            exprs.append(
                F.when(
                    F.col(c).isNotNull(),
                    F.concat(F.lit(qc), F.col(c).cast("string"), F.lit(qc)),
                )
                .otherwise(F.lit(None))
                .alias(c)
            )
        else:
            exprs.append(F.col(c))
    out_opts = dict(opts)
    out_opts["quote"] = ""  # disable writer quoting; our wraps pass through
    return df.select(*exprs), out_opts


def write_table(
    df: DataFrame,
    file: str,
    format: str | None = None,
    *,
    single_file: bool = True,
    mode: str = "overwrite",
    kv_metadata: Mapping[str, Any] | None = None,
    partition_by: list[str] | None = None,
    spark_options: Mapping[str, Any] | None = None,
    **options: Any,
) -> str:
    """Write ``df`` to ``file``; returns the path written.

    Unknown DuckDB COPY option names raise (options.UnknownOptionError);
    genuine Spark writer options go through ``spark_options={...}``."""
    fmt = normalize_format(format) if format is not None else guess_format(file)
    # DuckDB COPY-style PARTITION_BY as a plain option (Tier B pass-through)
    pb = options.pop("partition_by", None)
    if partition_by is None and pb is not None:
        partition_by = [pb] if isinstance(pb, str) else [str(c) for c in pb]
    force_quote = options.pop("force_quote", None)
    opts = translate_write_options(fmt, options)
    if spark_options:
        opts.update({k: str(v) for k, v in spark_options.items()})
    if fmt == "csv":
        opts.setdefault("header", "true")
        # Spark's CSV writer TRIMS cell whitespace by default; DuckDB (and
        # the reference) preserve it. Found by tests/test_property_roundtrip.
        opts.setdefault("ignoreLeadingWhiteSpace", "false")
        opts.setdefault("ignoreTrailingWhiteSpace", "false")
        if force_quote:
            df, opts = _apply_force_quote(df, force_quote, opts)
    elif fmt == "json":
        # DuckDB/the reference write explicit nulls (test/runtests.jl:43);
        # Spark omits null fields unless told otherwise
        opts.setdefault("ignoreNullFields", "false")
    elif fmt == "text":
        data_cols = [
            f for f in df.schema.fields
            if f.name not in set(partition_by or [])
        ]
        if len(data_cols) != 1 or data_cols[0].dataType.typeName() != "string":
            raise ValueError(
                "text sink requires exactly ONE string data column "
                f"(besides partition columns); got {[(f.name, f.dataType.simpleString()) for f in data_cols]}. "
                "Select/cast the payload column first, or use csv/parquet "
                "for tabular data."
            )

    if not single_file or partition_by:
        writer = df.write.format(fmt).options(**opts).mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(file)
        if fmt == "parquet" and kv_metadata:
            from .metadata import attach_kv_metadata

            attach_kv_metadata(file, kv_metadata)
        return file

    # single-file mode: write to a scratch dir, move the one part file out.
    # The move replaces the target, so only modes with well-defined
    # single-file semantics are honored; 'append' would need a read-merge
    # pass and is rejected rather than silently clobbering.
    if mode in ("error", "errorifexists") and os.path.exists(file):
        raise FileExistsError(f"path already exists (mode={mode!r}): {file}")
    if mode == "ignore" and os.path.exists(file):
        return file
    if mode not in ("overwrite", "error", "errorifexists", "ignore"):
        raise ValueError(
            f"mode={mode!r} is not supported with single_file=True "
            "(single-file writes replace the target; use single_file=False for append)"
        )
    tmpdir = tempfile.mkdtemp(prefix="quackio_write_", dir=os.path.dirname(file) or ".")
    try:
        df.coalesce(1).write.format(fmt).options(**opts).mode("overwrite").save(tmpdir + "/out")
        parts = sorted(
            p
            for p in glob.glob(tmpdir + "/out/part-*")
            if not p.endswith(".crc")
        )
        if len(parts) != 1:
            raise RuntimeError(f"expected exactly one part file, got {parts}")
        if os.path.isdir(file):
            shutil.rmtree(file)
        elif os.path.exists(file):
            os.remove(file)
        shutil.move(parts[0], file)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)

    if fmt == "parquet" and kv_metadata:
        from .metadata import attach_kv_metadata

        attach_kv_metadata(file, kv_metadata)
    return file
