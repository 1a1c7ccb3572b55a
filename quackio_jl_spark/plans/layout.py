"""Data-layout operators: z-order clustering and small-file compaction.

Beyond the reference's surface (/root/reference/src/QuackIO.jl is pure I/O),
driver-mandated 100 TB pipeline tooling. At scale, WHERE a row lands on disk
decides how much of the corpus a 2-D range query has to read: sorting by a
Morton (z-order) interleave of two quantized dimensions keeps rows that are
close in BOTH dimensions close in file order, so parquet row-group min/max
stats (and partition dirs on the z-prefix) prune most of the scan for
queries that filter on either or both dimensions. Compaction solves the
other layout killer — millions of tiny files from incremental ingest turn a
scan into an open()/footer-parse storm and blow up the driver's split
enumeration.

The z-value math is pure integer bit-twiddling, generated once as SQL text
for both engines (shiftleft/& in Spark, <</& in DuckDB) — exact, no floats,
hash-comparable.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ..sources.readers import read_parquet
from ..sources.writers import write_table
from .registry import query, table

Z_BITS = 16  # per-dimension quantized width; z-value spans 2*Z_BITS bits
Z_EPOCH = "1992-01-01"  # TPC-H date floor: o_orderdate - epoch fits 13 bits
Z_PRICE_STEP = 10  # price quantizer: ~600k range / 10 fits 16 bits


def _interleave_sql(x: str, y: str, shl: str) -> str:
    """Morton interleave of two Z_BITS-wide ints: x gets even bits, y odd.

    `shl` is the engine's shift-left spelling: 'shiftleft({v}, {n})' for
    Spark SQL, '({v} << {n})' for DuckDB. Inputs are CAST to BIGINT first so
    shifts past bit 30 can't overflow a 32-bit int in either engine."""
    terms = []
    for j in range(Z_BITS):
        terms.append(shl.format(v=f"((CAST({x} AS BIGINT) >> {j}) & 1)", n=2 * j))
        terms.append(shl.format(v=f"((CAST({y} AS BIGINT) >> {j}) & 1)", n=2 * j + 1))
    return " + ".join(terms)


_SPARK_SHL = "shiftleft({v}, {n})"
_DUCK_SHL = "({v} << {n})"


def _quant_sql(diff_days: str) -> tuple[str, str]:
    """(day_quant, price_quant) SQL, engine-neutral except date diff."""
    day = f"least(greatest({diff_days}, 0), {(1 << Z_BITS) - 1})"
    price = (
        f"least(CAST(floor(o_totalprice / {Z_PRICE_STEP}) AS BIGINT), "
        f"{(1 << Z_BITS) - 1})"
    )
    return day, price


_DUCK_DAY_DIFF = f"date_diff('day', DATE '{Z_EPOCH}', o_orderdate)"
_SPARK_DAY_DIFF = f"datediff(o_orderdate, DATE '{Z_EPOCH}')"


def _zval_exprs():
    dq, pq = _quant_sql(_SPARK_DAY_DIFF)
    spark_z = _interleave_sql(dq, pq, _SPARK_SHL)
    dq2, pq2 = _quant_sql(_DUCK_DAY_DIFF)
    duck_z = _interleave_sql(dq2, pq2, _DUCK_SHL)
    return spark_z, duck_z


_SPARK_Z, _DUCK_Z = _zval_exprs()


@query(
    "zorder_values",
    oracle=f"""
    SELECT o_orderkey, CAST({_DUCK_Z} AS BIGINT) AS zval
    FROM orders
    ORDER BY zval, o_orderkey
    LIMIT 1000
    """,
)
def zorder_values(spark, sf_dir):
    """Morton z-value per order over (order date, total price): the sort
    key a z-ordered table layout writes by. Map-side integer bit math in
    whole-stage codegen — the only shuffle is the demo's top-1000 sample
    (TakeOrderedAndProject, no global sort materialized)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.expr(_SPARK_Z).cast("bigint").alias("zval"))
        .orderBy("zval", "o_orderkey")
        .limit(1000)
    )


@query(
    "zorder_bucket_stats",
    oracle=f"""
    WITH z AS (
      SELECT o_orderkey, o_orderdate, o_totalprice,
        CAST({_DUCK_Z} AS BIGINT) AS zval
      FROM orders
    )
    SELECT CAST(zval >> {2 * Z_BITS - 6} AS INTEGER) AS zbucket,
      CAST(count(*) AS BIGINT) AS n,
      min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
      round(min(o_totalprice), 2) AS min_price,
      round(max(o_totalprice), 2) AS max_price
    FROM z
    GROUP BY zbucket
    """,
)
def zorder_bucket_stats(spark, sf_dir):
    """Locality evidence for the z-order layout: bucket rows by the top 6
    z-bits (the would-be file/partition boundary) and report each bucket's
    date and price envelope. A good interleave gives every bucket a small
    rectangle in (date x price) space — exactly what lets parquet min/max
    stats prune 2-D range scans. One partial-agg shuffle on a 64-value
    key."""
    o = table(spark, sf_dir, "orders")
    z = o.select(
        "o_orderdate",
        "o_totalprice",
        F.expr(_SPARK_Z).cast("bigint").alias("zval"),
    )
    return (
        z.groupBy(
            F.shiftright("zval", 2 * Z_BITS - 6).cast("int").alias("zbucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderdate").alias("min_date"),
            F.max("o_orderdate").alias("max_date"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@query(
    "roundtrip_zorder_pruned",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-07-01'
      AND o_totalprice < 50000
    """,
)
def roundtrip_zorder_pruned(spark, sf_dir):
    """orders -> z-sorted write partitioned by the z-prefix bucket ->
    2-D range read -> aggregate. The partition filter derives from the
    query's own date/price bounds: a (date, price) rectangle maps to a
    bounded set of z-prefix buckets, so the scan prunes whole partition
    dirs before opening a file (asserted in
    tests/test_plans.py::test_zorder_partition_pruning). The oracle
    aggregates straight from the source table — a row lost or duplicated
    by the layout round-trip breaks the hash."""
    o = table(spark, sf_dir, "orders")
    z = o.select(
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.expr(_SPARK_Z).cast("bigint").alias("zval"),
    ).withColumn("zbucket", F.shiftright("zval", 2 * Z_BITS - 6).cast("int"))
    path = os.path.join(tempfile.mkdtemp(prefix="quackio_rt_z_"), "orders_z")
    write_table(
        z.sortWithinPartitions("zval"),
        path,
        format="parquet",
        single_file=False,
        partition_by=["zbucket"],
    )
    back = read_parquet(spark, path, hive_partitioning=True)
    filt = (
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1995-07-01"))
        & (F.col("o_totalprice") < 50000)
    )
    zbuckets = rect_zorder_buckets("1995-01-01", "1995-07-01", 0.0, 50000.0)
    return (
        back.filter(F.col("zbucket").isin(zbuckets))
        .filter(filt)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("total"),
        )
    )


def _interleave_py(x: int, y: int) -> int:
    z = 0
    for j in range(Z_BITS):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


def _rect_bucket_bounds(d_lo: str, d_hi: str, p_lo: float, p_hi: float):
    """Conservative [min,max] z-prefix-bucket envelope of a query rectangle.

    The true z-range of a rectangle is a union of intervals (BIGMIN/LITMAX
    refinement); the single [corner_lo, corner_hi] envelope is a superset,
    so pruning with it is always sound — it just reads a few extra buckets.
    Driver-side arithmetic on 4 corner values, no data touched."""
    from datetime import date

    def days(s: str) -> int:
        y, m, d = map(int, s.split("-"))
        return (date(y, m, d) - date(1992, 1, 1)).days

    clamp = (1 << Z_BITS) - 1

    def q(v, step=1):
        return max(0, min(int(v // step), clamp))

    zlo = _interleave_py(q(days(d_lo)), q(p_lo, Z_PRICE_STEP))
    zhi = _interleave_py(q(days(d_hi) - 1), q(p_hi - 1e-9, Z_PRICE_STEP))
    shift = 2 * Z_BITS - 6
    return zlo >> shift, zhi >> shift


def _days_since_epoch(s: str) -> int:
    from datetime import date

    y, m, d = map(int, s.split("-"))
    return (date(y, m, d) - date(1992, 1, 1)).days


def rect_zorder_buckets(
    d_lo: str, d_hi: str, p_lo: float, p_hi: float, max_cells: int = 256
) -> list[int]:
    """EXACT z-prefix-bucket set of a query rectangle, via quadtree
    decomposition (the BIGMIN/LITMAX-family refinement of the corner
    envelope in _rect_bucket_bounds).

    Walk the implicit quadtree of the 2-D key space top-down: a cell fully
    inside the rectangle contributes its whole z-range; a disjoint cell is
    skipped; a straddling cell recurses into its 4 children (one more bit
    of each dimension). Recursion stops once the cell is smaller than a
    partition bucket (top-6 z-bits), so the walk visits O(perimeter)
    cells — driver-side integer arithmetic, no data touched. The result is
    the MINIMAL set of partition dirs that can hold rectangle rows; on a
    thin rectangle far from the z-curve's diagonal this reads a fraction
    of what the [corner_lo, corner_hi] envelope reads (the envelope is
    kept as the fallback when the cell budget trips). Soundness +
    minimality are asserted in
    tests/test_plans.py::test_zorder_quadtree_refinement."""
    clamp = (1 << Z_BITS) - 1
    x_lo = max(0, min(_days_since_epoch(d_lo), clamp))
    x_hi = max(0, min(_days_since_epoch(d_hi) - 1, clamp))
    y_lo = max(0, min(int(p_lo // Z_PRICE_STEP), clamp))
    y_hi = max(0, min(int((p_hi - 1e-9) // Z_PRICE_STEP), clamp))
    shift = 2 * Z_BITS - 6
    bucket_bits = 2 * Z_BITS - shift  # prefix bits that define a bucket
    buckets: set[int] = set()
    cells = 0

    # (level, cx, cy): cell = all points whose top `level` bits of each
    # dim equal (cx, cy); covers side 2^(Z_BITS-level) per dimension.
    stack = [(0, 0, 0)]
    while stack:
        level, cx, cy = stack.pop()
        cells += 1
        if cells > max_cells:
            lo, hi = _rect_bucket_bounds(d_lo, d_hi, p_lo, p_hi)
            return list(range(lo, hi + 1))
        side = Z_BITS - level
        cell_x_lo, cell_x_hi = cx << side, ((cx + 1) << side) - 1
        cell_y_lo, cell_y_hi = cy << side, ((cy + 1) << side) - 1
        if cell_x_lo > x_hi or cell_x_hi < x_lo or cell_y_lo > y_hi or cell_y_hi < y_lo:
            continue
        z_prefix = _interleave_py(cx, cy)  # top 2*level z-bits of the cell
        if 2 * level >= bucket_bits:
            # cell lies inside one bucket — no need to look closer
            buckets.add(z_prefix >> (2 * level - bucket_bits))
            continue
        if (
            cell_x_lo >= x_lo
            and cell_x_hi <= x_hi
            and cell_y_lo >= y_lo
            and cell_y_hi <= y_hi
        ):
            # fully inside: the cell's z-range covers whole buckets
            span_bits = bucket_bits - 2 * level
            base = z_prefix << span_bits
            buckets.update(range(base, base + (1 << span_bits)))
            continue
        for dx in (0, 1):
            for dy in (0, 1):
                stack.append((level + 1, (cx << 1) | dx, (cy << 1) | dy))
    return sorted(buckets)


@query(
    "roundtrip_compacted_files",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
      CAST(4 AS INTEGER) AS n_files,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
    FROM orders
    """,
)
def roundtrip_compacted_files(spark, sf_dir):
    """Small-file compaction: orders scattered across 64 tiny files ->
    repartition(4) rewrite -> read back. Returns the row count / checksum
    (nothing lost or duplicated) plus the actual post-compaction file count
    (a compactor that silently fails to coalesce breaks the hash against
    the oracle's expected 4). In production the target file count is
    bytes/target_file_size per partition; the repartition is the one shuffle
    compaction fundamentally needs (round-robin, no key, no skew)."""
    src = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    d_small = os.path.join(tempfile.mkdtemp(prefix="quackio_rt_c_"), "small")
    write_table(src.repartition(64), d_small, format="parquet", single_file=False)
    d_big = os.path.join(tempfile.mkdtemp(prefix="quackio_rt_c_"), "compacted")
    small = read_parquet(spark, d_small)
    write_table(small.repartition(4), d_big, format="parquet", single_file=False)
    n_files = len(
        [f for f in os.listdir(d_big) if f.endswith(".parquet")]
    )
    back = read_parquet(spark, d_big)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.lit(n_files).cast("int").alias("n_files"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .cast("double")
        .alias("total"),
    )
