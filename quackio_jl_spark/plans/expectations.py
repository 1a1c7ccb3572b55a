"""Data-quality expectations audit (dbt-test / Great-Expectations style).

The one report every production pipeline runs BEFORE analytics: referential
integrity, key uniqueness, domain/range membership, null contracts and
cross-column date ordering, emitted as one tidy violations table. The
reference (QuackIO.jl, src/QuackIO.jl:1-149) delegates such checks to ad-hoc
DuckDB SQL; here each check is a Spark-first plan arm unioned into a single
result (SURVEY.md §2.4 extension).

Scale shape: every check is a single scan + conditional partial aggregate
(map-side combine to ONE row), and the two referential-integrity checks are
LEFT ANTI equi-joins on the key — broadcastable when the dimension is small,
shuffle-hash otherwise (AQE decides); no check materializes violating rows,
only counts. The final UNION ALL glues 9 one-row arms — constant-size driver
output regardless of corpus size. Re-scanning per check is deliberate: arms
touch different tables/columns, so each scan prunes to the 1-3 columns it
needs (a shared cached scan would read the superset and spill at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query, table


def _arm(df, check, tbl, viol_col, total_col):
    return df.select(
        F.lit(check).alias("check_name"),
        F.lit(tbl).alias("tbl"),
        viol_col.cast("bigint").alias("violations"),
        total_col.cast("bigint").alias("total"),
    )


_ORACLE = """
    WITH checks AS (
      SELECT 'orders_custkey_fk' AS check_name, 'orders' AS tbl,
        CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT) AS violations,
        CAST(COUNT(*) AS BIGINT) AS total
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'lineitem_orderkey_fk', 'lineitem',
        CAST(COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT),
        CAST(COUNT(*) AS BIGINT)
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'orders_orderkey_unique', 'orders',
        CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
        CAST(COUNT(*) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'lineitem_quantity_range', 'lineitem',
        CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT),
        CAST(COUNT(*) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem_discount_range', 'lineitem',
        CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.10) AS BIGINT),
        CAST(COUNT(*) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'orders_status_domain', 'orders',
        CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')
                              OR o_orderstatus IS NULL) AS BIGINT),
        CAST(COUNT(*) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'lineitem_linenumber_unique', 'lineitem',
        CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
        CAST(COUNT(*) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'orders_orderdate_range', 'orders',
        CAST(COUNT(*) FILTER (WHERE o_orderdate < DATE '1992-01-01'
                              OR o_orderdate > DATE '1998-12-31') AS BIGINT),
        CAST(COUNT(*) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'customer_acctbal_not_null', 'customer',
        CAST(COUNT(*) FILTER (WHERE c_acctbal IS NULL) AS BIGINT),
        CAST(COUNT(*) AS BIGINT)
      FROM customer
      UNION ALL
      SELECT 'part_retailprice_positive', 'part',
        CAST(COUNT(*) FILTER (WHERE p_retailprice <= 0) AS BIGINT),
        CAST(COUNT(*) AS BIGINT)
      FROM part
    )
    SELECT check_name, tbl, violations, total, violations = 0 AS ok
    FROM checks
"""


@query("data_quality_expectations", oracle=_ORACLE)
def data_quality_expectations(spark, sf_dir):
    """Ten-check expectations suite over the star schema: FK integrity
    (orders->customer, lineitem->orders via LEFT ANTI counts), key
    uniqueness (count - count distinct, single and composite), range
    contracts (quantity in [1,50], discount in [0,0.10], retail price
    > 0, order date in the TPC-H window), a value-domain check (order
    status in O/F/P, null counted as violating) and a not-null contract
    (acctbal). One row per check: (check_name, tbl, violations, total,
    ok). On the synthetic fixtures two checks genuinely FIRE (line
    numbers repeat within an order; order dates run past 1998) — the
    audit reports them rather than assuming clean input, and the
    invariant test pins exactly which checks pass and which catch.

    Each arm prunes its scan to the checked columns; FK arms are key-only
    anti-joins (no payload shuffled); everything partial-aggregates to a
    single row before the union, so the plan's output is 9 rows at any
    scale."""
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    customer = table(spark, sf_dir, "customer")
    part = table(spark, sf_dir, "part")

    cnt = F.count(F.lit(1))

    def viol(cond):
        return F.sum(cond.cast("int"))

    fk_orders = _arm(
        orders.select("o_custkey")
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(cnt.alias("v"))
        .crossJoin(F.broadcast(orders.agg(cnt.alias("t")))),
        "orders_custkey_fk",
        "orders",
        F.col("v"),
        F.col("t"),
    )
    fk_lineitem = _arm(
        lineitem.select("l_orderkey")
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(cnt.alias("v"))
        .crossJoin(F.broadcast(lineitem.agg(cnt.alias("t")))),
        "lineitem_orderkey_fk",
        "lineitem",
        F.col("v"),
        F.col("t"),
    )
    pk_unique = _arm(
        orders.agg(
            (cnt - F.count_distinct(F.col("o_orderkey"))).alias("v"),
            cnt.alias("t"),
        ),
        "orders_orderkey_unique",
        "orders",
        F.col("v"),
        F.col("t"),
    )
    qty_range = _arm(
        lineitem.agg(
            viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias("v"),
            cnt.alias("t"),
        ),
        "lineitem_quantity_range",
        "lineitem",
        F.col("v"),
        F.col("t"),
    )
    disc_range = _arm(
        lineitem.agg(
            viol(
                (F.col("l_discount") < 0) | (F.col("l_discount") > F.lit(0.10))
            ).alias("v"),
            cnt.alias("t"),
        ),
        "lineitem_discount_range",
        "lineitem",
        F.col("v"),
        F.col("t"),
    )
    status_domain = _arm(
        orders.agg(
            viol(
                ~F.col("o_orderstatus").isin("O", "F", "P")
                | F.col("o_orderstatus").isNull()
            ).alias("v"),
            cnt.alias("t"),
        ),
        "orders_status_domain",
        "orders",
        F.col("v"),
        F.col("t"),
    )
    line_unique = _arm(
        lineitem.agg(
            (cnt - F.count_distinct("l_orderkey", "l_linenumber")).alias("v"),
            cnt.alias("t"),
        ),
        "lineitem_linenumber_unique",
        "lineitem",
        F.col("v"),
        F.col("t"),
    )
    date_range = _arm(
        orders.agg(
            viol(
                (F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
                | (F.col("o_orderdate") > F.lit("1998-12-31").cast("date"))
            ).alias("v"),
            cnt.alias("t"),
        ),
        "orders_orderdate_range",
        "orders",
        F.col("v"),
        F.col("t"),
    )
    acctbal_nn = _arm(
        customer.agg(viol(F.col("c_acctbal").isNull()).alias("v"), cnt.alias("t")),
        "customer_acctbal_not_null",
        "customer",
        F.col("v"),
        F.col("t"),
    )
    price_pos = _arm(
        part.agg(viol(F.col("p_retailprice") <= 0).alias("v"), cnt.alias("t")),
        "part_retailprice_positive",
        "part",
        F.col("v"),
        F.col("t"),
    )

    arms = [
        fk_orders,
        fk_lineitem,
        pk_unique,
        qty_range,
        disc_range,
        status_domain,
        line_unique,
        date_range,
        acctbal_nn,
        price_pos,
    ]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.withColumn("ok", F.col("violations") == 0)
