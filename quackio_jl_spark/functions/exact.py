"""Order-independent (bit-reproducible) aggregation helpers — the
foundation of the DuckDB-oracle gate (SURVEY.md §5 test strategy).

Double-precision SUM/AVG depend on accumulation order, which differs between
Spark partitions and any oracle engine. At 100 TB (thousands of partitions)
this is not a rounding nicety — it is the difference between a reproducible
answer and one that changes per run. Recipe:

    per-row arithmetic in DOUBLE (deterministic IEEE, identical everywhere)
      -> cast to DECIMAL at the aggregation boundary (exact, associative)
      -> SUM in decimal
      -> cast the final scalar back to DOUBLE

The same recipe is emitted on the DuckDB-oracle side (see oracle SQL in
__spark_entry__.py), so Spark and the oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dsum", "davg", "dsum_w", "DEC"]

DEC = "decimal(28,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str) -> Column:
    """Exact, order-independent sum of a double expression -> double."""
    return F.sum(_c(col).cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / count, one double divide."""
    c = _c(col)
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).cast("double")


def dsum_w(col: Column | str, window) -> Column:
    """Windowed exact running sum -> double (frame order irrelevant)."""
    return F.sum(_c(col).cast(DEC)).over(window).cast("double")
