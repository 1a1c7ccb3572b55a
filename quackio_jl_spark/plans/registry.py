"""Query/oracle registry backing the driver contract (__spark_entry__.py).

Each registered query is a ``(spark, sf_dir) -> DataFrame`` callable; most
carry an equivalent DuckDB ANSI-SQL oracle string. Aliasing rule: every
computed column is aliased identically in the Spark plan and the oracle SQL
(the driver sorts columns by name and hash-compares values).

Registration is import-driven: importing ``quackio_jl_spark.registry``
pulls in every module that defines queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register a query and (optionally) its DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check —
    reserved for genuinely non-SQL-expressible operators."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table (TESTDATA.md contract).

    events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized parquet
    reader rejects; we read it as long (nanosAsLong) and truncate to
    microseconds with integer division — bit-identical to DuckDB's
    nanos->micros truncation. (Double division would lose precision: at
    1.7e18 ns a double's ulp is ~256 ns.)"""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
