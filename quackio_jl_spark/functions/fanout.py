"""Scale-adaptive map-side parallelism for row-group-bound scans.

Parquet scans parallelize at row-group granularity. A table written as a
single row group (the testdata layout; also common for small dimension
exports at production scale) therefore arrives as ONE task, and
everything Spark plans into the scan stage — per-row arithmetic,
``explode`` tokenization, hashing, the whole map-side partial aggregation
— runs on one core no matter how many the session has. Split-size
configs (``maxPartitionBytes`` / ``openCostInBytes`` / ``minPartitionNum``)
cannot recover parallelism past the row-group count.

``fanout`` repairs exactly that case and nothing else: when (and only
when) the frame arrives in fewer partitions than the session's default
parallelism, hash-repartition it by a caller-named high-cardinality key
so downstream per-row work uses every core. The condition is evaluated at
plan-build time from the real scan partitioning, so at cluster scale —
where a 100 TB table arrives in thousands of row-group partitions — the
helper is the identity and adds NO exchange to the plan. When it does
fire, the shuffle moves only the (column-pruned) bytes the query reads,
and it fires precisely when the input is small enough for that to be
noise (guide §2: scale-adaptive partitioning, not a constant tuned for
either local mode or the cluster).

Determinism: hash partitioning by a data key is deterministic under
retries (unlike ``rand()``-derived keys, SPARK-38388), and every
registered query is partition-count-independent by construction (exact
decimal sums, integer micro-units — the repo-wide recipe), so results
are bit-identical with or without the repartition. The keyless form uses
round-robin ``repartition(n)``, which Spark makes retry-safe via its
sort-before-repartition pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

__all__ = ["fanout"]


def fanout(df: DataFrame, *keys: Column | str, n: int | None = None) -> DataFrame:
    """Hash-repartition ``df`` across the session's cores iff it arrives
    in fewer partitions than the session's default parallelism.

    ``keys`` should name a high-cardinality column (row id, order key) so
    the hash spreads evenly; with no key a round-robin repartition is
    used. ``n`` overrides the target partition count (defaults to the
    SparkContext's ``defaultParallelism``)."""
    sc = df.sparkSession.sparkContext
    target = n or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    # explicit numPartitions => REPARTITION_BY_NUM: AQE keeps the count
    # rather than coalescing the tiny shuffle back onto one core
    return df.repartition(target, *keys) if keys else df.repartition(target)
