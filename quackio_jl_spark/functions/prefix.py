"""Distributed prefix sums without a single-reducer window.

The kernel behind every "global cumulative in key order" operator in the
package (contiguous_row_ids pioneered the shape; ks_test_click_vs_view,
quality_score_auc and peak_concurrent_sessions reuse it via this module):

1. bucket ids are a PURE FUNCTION of the ordering key — uniform ranges
   between the broadcast min/max, NOT spark_partition_id over
   repartitionByRange (whose sampled boundaries are only stable across
   plan branches while exchange-reuse holds);
2. per-bucket totals collapse to a <= n_buckets-row aggregate whose
   exclusive running sum (a tiny single-partition window) yields each
   bucket's starting offset;
3. offsets broadcast back and the in-bucket cumulative windows run in
   parallel, one partition per bucket.

Results are therefore identical for ANY partition count, and the only
single-partition window ever executed is over n_buckets rows. Key skew
degrades bucket balance (performance), never correctness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["bucketed_prefix_sums", "bucketed_prefix_max"]


def _with_bucket_ids(df: DataFrame, key: str, n_buckets: int) -> DataFrame:
    """Append ``_pid``: the pure-function uniform-range bucket id of ``key``
    between the broadcast min/max (step 1 of the module docstring).

    The input is persisted here (round-12, guide §5): the kernel
    evaluates it in THREE separate executions — the min/max range probe
    below is a broadcast build, the per-bucket offsets are another, and
    the main cumulative consumes it a third time — so an expensive input
    (a corpus aggregation, an Arrow-decode projection) otherwise
    recomputes three times per query. A no-op when the caller already
    persisted; the bench/gate harness frees foreign storage between
    queries."""
    df = df.persist()
    rng = F.broadcast(
        df.agg(F.min(key).alias("_lo"), F.max(key).alias("_hi"))
    )
    width = (F.col("_hi") - F.col("_lo")).cast("double") / n_buckets
    # Degenerate range (all keys equal) would make width 0 and the bucket
    # division an ANSI divide-by-zero: collapse to bucket 0 explicitly.
    return (
        df.crossJoin(rng)
        .withColumn(
            "_pid",
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor(
                        (F.col(key) - F.col("_lo")).cast("double") / width
                    ).cast("int"),
                )
            ),
        )
        .drop("_lo", "_hi")
    )


def bucketed_prefix_max(
    df: DataFrame,
    key: str,
    col: str,
    n_buckets: int = 16,
) -> DataFrame:
    """Append ``cum_<col>``: the inclusive running MAX of ``col`` in
    ascending ``key`` order over the WHOLE DataFrame — the high-water-mark
    scan — without ever sorting the full table into one partition.

    Same three-step shape as :func:`bucketed_prefix_sums` with (max, max)
    in place of (sum, sum): per-bucket maxes collapse to a <= n_buckets-row
    table whose EXCLUSIVE running max gives each bucket's carry-in, then
    the in-bucket running-max windows run one-partition-per-bucket. The
    first bucket's carry-in is NULL; ``greatest`` skips nulls, so the
    in-bucket max stands alone there.

    The in-bucket frame is RANGE (all key peers included), so equal keys
    get one deterministic value — a ROWS frame would make ties depend on
    peer processing order."""
    parts = _with_bucket_ids(df, key, n_buckets)
    w_off = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        parts.groupBy("_pid")
        .agg(F.max(col).alias("_b"))
        .select("_pid", F.max("_b").over(w_off).alias("_o"))
    )
    w_in = (
        W.partitionBy("_pid")
        .orderBy(F.col(key).asc())
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        parts.join(F.broadcast(offsets), "_pid")
        .withColumn(
            f"cum_{col}", F.greatest(F.col("_o"), F.max(col).over(w_in))
        )
        .drop("_pid", "_o")
    )


def bucketed_prefix_sums(
    df: DataFrame,
    key: str,
    cols: list[str],
    n_buckets: int = 16,
    tiebreak_desc: str | None = None,
) -> DataFrame:
    """Append inclusive running sums ``cum_<c>`` of each integer column in
    ``cols``, taken in ascending ``key`` order over the WHOLE DataFrame.

    ``tiebreak_desc`` optionally orders equal keys by that column
    DESCENDING inside the cumulative (the sweep-line "+1 before -1 at
    ties" rule). The helper columns (``_pid``) are dropped; input columns
    pass through."""
    parts = _with_bucket_ids(df, key, n_buckets)
    w_off = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        parts.groupBy("_pid")
        .agg(*[F.sum(c).alias(f"_b_{c}") for c in cols])
        .select(
            "_pid",
            *[F.sum(f"_b_{c}").over(w_off).alias(f"_o_{c}") for c in cols],
        )
        .fillna({f"_o_{c}": 0 for c in cols})
    )
    order: list[Column] = [F.col(key).asc()]
    if tiebreak_desc is not None:
        order.append(F.col(tiebreak_desc).desc())
    w_in = (
        W.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    out = parts.join(F.broadcast(offsets), "_pid")
    for c in cols:
        out = out.withColumn(
            f"cum_{c}", F.col(f"_o_{c}") + F.sum(c).over(w_in)
        )
    return out.drop("_pid", *[f"_o_{c}" for c in cols])
