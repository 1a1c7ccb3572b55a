"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship TPC-H-Q1-shaped query at sf0.001 (smoke).
queries()     -> every implemented operator from SURVEY.md §2 + the
                 LLM-pipeline extensions, as (spark, sf_dir) callables.
oracle_sql()  -> DuckDB-runnable ANSI SQL twins (column names aligned).

The real registry lives in quackio_jl_spark.registry; this module is the
thin driver-facing adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from quackio_jl_spark.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
