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
