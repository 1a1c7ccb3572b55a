"""SparkSession factory for the quackio_jl_spark engine.

Reference parity note: QuackIO.jl opens a fresh in-memory DuckDB per call
(/root/reference/src/QuackIO.jl:37,73,141). On Spark a session is expensive,
so we keep one long-lived session; statelessness is preserved because the
engine registers no persistent catalog objects (every query builds its plan
from file paths).

Scale notes (100 TB target):
- AQE on: runtime partition coalescing, skew-join splitting, dynamic
  broadcast conversion.
- shuffle.partitions defaults to the local core count; on a real cluster
  this should be ~2-3x total executor cores (AQE coalesces the rest).
- Arrow enabled for any driver-edge materialization (toPandas/createDataFrame).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_CPUS"]

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "quackio_jl_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Config is chosen for a single-node ``local[N]`` run but every setting has
    a sensible cluster analogue; nothing here assumes local mode semantics.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # testdata events.parquet carries TIMESTAMP(NANOS); Spark reads it as
        # long with this flag, and plans.registry.table() converts to micros
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.extraJavaOptions",
            # derby.system.home also per-process: Derby holds an exclusive
            # db.lck on its home, so concurrent sessions sharing one path
            # fail metastore init
            f"-Djava.io.tmpdir=/tmp -Dderby.system.home=/tmp/quackio_derby_{os.getpid()}",
        )
        # bucketed tables (sources/bucketing.py) need a catalog location;
        # keep it out of the repo tree AND unique per process — concurrent
        # sessions (e.g. two gate runs side by side) otherwise race on the
        # same managed-table directories and corrupt each other's buckets
        .config("spark.sql.warehouse.dir", f"/tmp/quackio_warehouse_{os.getpid()}")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
