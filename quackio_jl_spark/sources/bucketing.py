"""Bucketed tables: pre-shuffled, co-located storage for repeated joins.

At 100 TB the dominant cost of a fact⋈fact join (lineitem⋈orders on
orderkey) is the shuffle of both sides. Bucketing pays that shuffle ONCE at
write time: both tables are hash-partitioned into the same number of
buckets on the join key (and optionally sorted within buckets), so every
subsequent join/aggregation on that key is Exchange-free — each task reads
bucket i of both sides and merges locally. This is Spark's native analogue
of the co-located join the reference delegates to DuckDB's single-node
locality (everything is "co-located" in one process; on a cluster you must
ask for it).

tests/test_scale_patterns.py asserts the Exchange-free join plan.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str] | str,
    n_buckets: int,
    sort_cols: list[str] | str | None = None,
    format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    ``n_buckets`` should be sized so one bucket of the LARGER table fits an
    executor's memory comfortably (at 100 TB / 1000 executors think
    thousands of buckets, not 8 — the local tests use small counts only to
    keep the plan shape identical)."""
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    if mode == "overwrite":
        # a table dropped in a PRIOR session leaves its managed location
        # behind; saveAsTable then refuses with LOCATION_ALREADY_EXISTS.
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS `{name}`")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        if warehouse.startswith("file:"):
            warehouse = warehouse[len("file:"):]
        leftover = os.path.join(warehouse, name.lower())
        if warehouse and os.path.isdir(leftover):
            shutil.rmtree(leftover, ignore_errors=True)
    w = (
        df.write.format(format)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        w = w.sortBy(*sort_cols)
    w.mode(mode).saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back; Spark's catalog carries the bucket spec,
    so joins/aggregations on the bucket key skip their Exchange."""
    return spark.table(name)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    n_files: int = 8,
    format: str = "parquet",
) -> str:
    """Range-partitioned, internally-sorted write: repartitionByRange
    splits the keyspace into ``n_files`` contiguous ranges and each file is
    sorted within. Parquet footers then carry TIGHT min/max statistics per
    row group, so any range predicate on ``sort_col`` prunes whole files
    and row groups at scan time (zone maps) — on 100 TB of time-series this
    is the difference between touching one day's files and all of them.
    The sort costs one range-exchange at write time, paid once."""
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.format(format)
        .mode("overwrite")
        .save(path)
    )
    return path
