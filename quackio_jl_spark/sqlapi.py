"""SQL front door over the star-schema tables.

The reference exposes its lazily-built relations to DuckDB SQL implicitly
(every QuackIO.jl handle IS a DuckDB relation; /root/reference/src/QuackIO.jl
builds `read_csv(...)` SQL strings). The Spark-first equivalent: register
each parquet table as a temp view (loaded through plans.registry.table so
timestamp normalization matches every other entry point) and hand the user
``spark.sql`` — Catalyst then applies the same pushdowns to a SQL string
that it applies to the DataFrame plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .plans.registry import table

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

__all__ = ["TABLES", "register_tables", "sql"]


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every star-schema table in ``sf_dir`` as a temp view.

    Returns the view names. Views are lazy — registering costs one schema
    read per table, no data scan."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TABLES)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run ANSI SQL against the star schema: registers the views (idempotent)
    and returns the lazy result DataFrame."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
