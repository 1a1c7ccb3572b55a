"""Round-trip queries: the write_table -> read_* path exercised UNDER the
driver's oracle gate (not just unit tests). The Spark side writes a real
file with the engine's own sink, reads it back with the engine's own scan,
and aggregates; the oracle computes the same aggregate straight from the
source parquet — so any loss/corruption in the sink or scan (type mangling,
null handling, quoting, compression) breaks the hash match.

Mirrors the reference's central invariant: isequal(read(write(tbl)), tbl)
(/root/reference/test/runtests.jl:18-26,40,44,56).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ..functions.exact import DEC
from ..sources.readers import read_csv, read_json
from ..sources.writers import write_table
from .registry import query, table

_ORACLE = """
    SELECT o_orderstatus,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total,
      CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    GROUP BY o_orderstatus
"""


def _agg(df):
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
        F.sum("o_orderkey").alias("key_sum"),
    )


def _roundtrip(spark, sf_dir, fmt, read_opts=None, **write_opts):
    src = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    path = os.path.join(
        tempfile.mkdtemp(prefix="quackio_rt_"), f"orders_rt.{fmt}" + write_opts.pop("suffix", "")
    )
    write_table(src, path, format=fmt, **write_opts)
    schema = {"o_orderkey": "bigint", "o_orderstatus": "varchar", "o_totalprice": "double"}
    reader = read_csv if fmt == "csv" else read_json
    back = reader(spark, path, columns=schema, **(read_opts or {}))
    return _agg(back)


@query("roundtrip_csv", oracle=_ORACLE)
def roundtrip_csv(spark, sf_dir):
    """orders -> engine CSV sink -> engine CSV scan (explicit schema) ->
    aggregate; must equal the oracle's direct-parquet aggregate."""
    return _roundtrip(spark, sf_dir, "csv")


@query("roundtrip_csv_gzip_delim", oracle=_ORACLE)
def roundtrip_csv_gzip_delim(spark, sf_dir):
    """Same, through gzip compression and a non-default delimiter."""
    return _roundtrip(
        spark, sf_dir, "csv",
        read_opts={"delim": "|"}, suffix=".gz", compression="gzip", delim="|",
    )


@query("roundtrip_json", oracle=_ORACLE)
def roundtrip_json(spark, sf_dir):
    """orders -> NDJSON sink -> JSON scan -> aggregate."""
    return _roundtrip(spark, sf_dir, "json")


@query(
    "roundtrip_hive_partitioned",
    oracle="""
    SELECT o_orderstatus,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderstatus
    """,
)
def roundtrip_hive_partitioned(spark, sf_dir):
    """orders -> hive-partitioned parquet write (partition_by=o_orderstatus,
    DuckDB COPY PARTITION_BY twin) -> partition-discovered read
    (hive_partitioning=True) -> filter to ONE partition -> aggregate.
    The filter must become partition PRUNING (asserted in
    tests/test_plans.py::test_hive_partition_pruning): at 100 TB the scan
    reads 1/3 of the files, not all of them with a post-filter. The oracle
    computes the same aggregate straight from the source parquet, so a
    partition value mangled in the dir-name round-trip breaks the hash."""
    import os
    import tempfile

    from ..sources.readers import read_parquet

    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="quackio_rt_"), "orders_hive")
    write_table(
        src, path, format="parquet", single_file=False, partition_by=["o_orderstatus"]
    )
    back = read_parquet(spark, path, hive_partitioning=True)
    return (
        back.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
        )
    )


@query("roundtrip_glob_scan", oracle=_ORACLE)
def roundtrip_glob_scan(spark, sf_dir):
    """orders split across two parquet files in one directory, read back
    with a GLOB pattern ('dir/*.parquet' — DuckDB accepts globs anywhere a
    path goes, reference pass-through src/QuackIO.jl:115,121; Spark's
    Hadoop glob syntax is the same). Aggregate must equal the straight
    oracle: the glob saw every file, each exactly once."""
    import os
    import tempfile

    from ..sources.readers import read_parquet

    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    d = tempfile.mkdtemp(prefix="quackio_rt_glob_")
    write_table(
        src.filter(F.col("o_orderkey") % 2 == 0),
        os.path.join(d, "even.parquet"),
    )
    write_table(
        src.filter(F.col("o_orderkey") % 2 == 1),
        os.path.join(d, "odd.parquet"),
    )
    return _agg(read_parquet(spark, os.path.join(d, "*.parquet")))


@query(
    "roundtrip_union_by_name",
    oracle="""
    SELECT COUNT(*) AS n,
      COUNT(o_totalprice) AS n_price,
      COUNT(o_orderstatus) AS n_status,
      CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM (
      SELECT o_orderkey, o_totalprice, NULL AS o_orderstatus
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, NULL, o_orderstatus
      FROM orders WHERE o_orderkey % 2 = 1
    )
    """,
)
def roundtrip_union_by_name(spark, sf_dir):
    """Two parquet files with DIFFERENT column subsets, read back with
    union_by_name=True (DuckDB's multi-file schema alignment; Spark twin is
    parquet mergeSchema) — columns align by NAME and files missing a column
    contribute NULLs, which the per-column COUNTs verify exactly."""
    import os
    import tempfile

    from ..sources.readers import read_parquet

    src = table(spark, sf_dir, "orders")
    d = tempfile.mkdtemp(prefix="quackio_rt_ubn_")
    write_table(
        src.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice"),
        os.path.join(d, "a.parquet"),
    )
    write_table(
        src.filter(F.col("o_orderkey") % 2 == 1).select("o_orderkey", "o_orderstatus"),
        os.path.join(d, "b.parquet"),
    )
    back = read_parquet(spark, os.path.join(d, "*.parquet"), union_by_name=True)
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_totalprice").alias("n_price"),
        F.count("o_orderstatus").alias("n_status"),
        F.sum("o_orderkey").alias("key_sum"),
    )


@query("roundtrip_parquet_zstd", oracle=_ORACLE)
def roundtrip_parquet_zstd(spark, sf_dir):
    """orders -> zstd-compressed parquet sink (directory mode, the scale
    path) -> parquet scan -> aggregate. Covers S8 for the columnar format;
    zstd is the production codec choice at 100 TB (better ratio than
    snappy at similar scan speed)."""
    import os
    import tempfile

    from ..sources.readers import read_parquet

    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="quackio_rt_"), "orders_rt_zstd")
    write_table(src, path, format="parquet", single_file=False, compression="zstd")
    return _agg(read_parquet(spark, path))
