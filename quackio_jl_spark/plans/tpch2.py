"""TPC-H shapes 2: the remaining classic query forms adapted to this star
schema (it has no partsupp table and no commit/receipt dates, so q2/q9/q16
keep the SHAPE — correlated min, profit rollup, NOT-IN exclusion — with
lineitem as the part<->supplier link and p_retailprice as the cost proxy).

Beyond-reference (SURVEY.md §2.3: the reference has no joins).
Every query names its shuffles/broadcasts; all aggregates use the
order-independent decimal recipe from functions/exact.py so results are
bit-reproducible at any partition count (see that module's docstring).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exact import DEC, davg, dsum
from ..functions.fanout import fanout
from .registry import query, table

_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(28,6))) AS DOUBLE)"


def _d(x: str) -> str:
    return _DSUM.format(x=x)


def _davg(x: str) -> str:
    return f"({_d(x)} / COUNT({x}))"


_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           {_d(_REV)} AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: bilateral trade volume by year. nation broadcasts twice
    (supplier side, customer side); big shuffles on orderkey and custkey
    only. The nation-pair filter applies right after the broadcast joins,
    before the aggregation shuffle."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           {_d(f"CASE WHEN n1.n_name = 'NATION_1' THEN {_REV} ELSE 0 END")}
             / {_d(_REV)} AS mkt_share
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = n2.n_regionkey
    WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: NATION_1 suppliers' share of STANDARD-part revenue sold to
    ASIA customers, by order year. part/supplier/nation/region all
    broadcast; only orders and customer shuffle. Ratio-of-decimal-sums is
    order-independent."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_regionkey").alias("rk2"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation1_rev = F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .join(F.broadcast(r), F.col("rk2") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((dsum(nation1_rev) / dsum(rev)).alias("mkt_share"))
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           {_d(f"{_REV} - p_retailprice * l_quantity")} AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, o_year
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (no partsupp in this schema: p_retailprice stands in
    for ps_supplycost). Profit by supplier nation x order year for parts
    whose name contains 'gear'. part/supplier/nation broadcast; one shuffle on
    orderkey, one on the small (nation, year) aggregate."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(amount).alias("profit"))
    )


@query(
    "q11_important_parts",
    oracle=f"""
    SELECT l_partkey, {_d(_REV)} AS value
    FROM lineitem
    GROUP BY l_partkey
    HAVING {_d(_REV)} > (
      SELECT {_d(_REV)} / COUNT(DISTINCT l_partkey) * 1.3 FROM lineitem)
    """,
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: parts whose revenue exceeds a GLOBAL threshold
    (scalar subquery) — 1.3x the mean per-part revenue, which stays
    meaningful at any scale factor (a fixed share like TPC-H's 0.0001
    selects nothing once part cardinality grows past 1/share). The one-row
    threshold broadcasts into a nested-loop join — the per-part aggregate
    never re-shuffles. Exact-decimal sums keep the > comparison
    engine-independent."""
    l = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = l.groupBy("l_partkey").agg(dsum(rev).alias("value"))
    threshold = l.agg(
        (dsum(rev) / F.countDistinct("l_partkey") * F.lit(1.3)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) t
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: order-count histogram over customers, INCLUDING the
    zero-order customers (left outer join; COUNT(col) skips the nulls the
    join manufactures). Two shuffles: custkey join, then the tiny c_count
    histogram aggregate."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {_d(_REV)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue. The view
    is computed once and reused for the scalar MAX (Spark reuses the
    shuffle via ReusedExchange); MAX of bit-identical decimals makes the
    equality safe. supplier broadcasts."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    s = table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(rev).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_type <> 'PROMO'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_part_count(spark, sf_dir):
    """TPC-H Q16 shape (lineitem is the part<->supplier link): distinct
    supplier count per (brand, size), excluding blacklisted suppliers via
    an ANTI join against a broadcast-size subquery. COUNT(DISTINCT)
    expands to a two-phase aggregate — both shuffles are on the small
    (brand, size, suppkey) projection.

    Round-11: both broadcast joins and the first distinct-aggregate
    phase all plan into the scan stage, so a single-row-group input ran
    them on one core; the pruned 2-column fact side fans out first
    (functions/fanout.py — identity at cluster scale)."""
    l = fanout(
        table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey"),
        "l_partkey",
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_type") != "PROMO")
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT {_d('l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < 0.5 * (
        SELECT {_davg('l_quantity')}
        FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: revenue lost to small orders. The correlated per-part
    average decorrelates into a groupBy(l_partkey) aggregate joined back on
    partkey (what Catalyst does to the SQL form too). The average is
    exact-decimal-sum / count, so the 0.5x comparison matches any engine
    bit-for-bit. part broadcasts; one shuffle on partkey."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        davg("l_quantity").alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_qty, l.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


@query(
    "q22_lost_customers",
    oracle=f"""
    SELECT n_name AS nation, COUNT(*) AS numcust, {_d('c_acctbal')} AS totacctbal
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    WHERE c_acctbal > (SELECT {_davg('c_acctbal')} FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY n_name
    """,
)
def q22_lost_customers(spark, sf_dir):
    """TPC-H Q22 shape: well-funded customers with no RECENT orders (every
    customer in this dataset has some order, so the churn window makes the
    result non-trivial), by nation. Scalar-subquery average (broadcast
    one-row), ANTI join against the date-pruned orders (shuffle on
    custkey), nation broadcast. Exact-decimal average keeps the >
    comparison engine-independent."""
    c = table(spark, sf_dir, "customer")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    n = table(spark, sf_dir, "nation")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(davg("c_acctbal").alias("ab"))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal").alias("totacctbal"))
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    SELECT l_partkey, l_suppkey, unit_price
    FROM (
      SELECT l_partkey, l_suppkey,
             l_extendedprice / l_quantity AS unit_price,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY l_extendedprice / l_quantity, l_suppkey)
               AS rn
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE p_size = 5 AND r_name = 'ASIA'
    ) t WHERE rn = 1
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (lineitem as the part<->supplier link): per part, the
    ASIA supplier offering the lowest observed unit price. The correlated
    MIN decorrelates into a row_number window per partkey (ties broken by
    suppkey — deterministic). part/supplier/nation/region broadcast; the
    only big shuffle is the window's partkey partitioning. Per-row IEEE
    division is bit-identical across engines, so ordering agrees."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") == 5)
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    unit_price = (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    w = W.partitionBy("l_partkey").orderBy(
        F.col("l_extendedprice") / F.col("l_quantity"), F.col("l_suppkey")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", "l_suppkey", unit_price, F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("l_partkey", "l_suppkey", "unit_price")
    )


@query(
    "q20_potential_promotion",
    oracle=f"""
    WITH pq AS (
      SELECT l_partkey, l_suppkey, {_d('l_quantity')} AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    tot AS (SELECT l_partkey, SUM(qty) AS total FROM pq GROUP BY l_partkey)
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM pq
      JOIN tot USING (l_partkey)
      WHERE qty > 0.5 * total
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    )
    """,
)
def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape (no partsupp table: shipped quantity stands in for
    availqty): suppliers who moved MORE THAN HALF of some red part's 1996
    volume — promotion candidates. The nested-IN chain decorrelates into
    two aggregations on the SAME key prefix (partkey, suppkey) -> (partkey)
    — the second agg and the back-join both reuse the first shuffle's
    partitioning — then a LEFT SEMI join into supplier. part is broadcast
    for the partkey restriction; exact-decimal sums keep the 0.5x
    comparison engine-independent."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    pq = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity").alias("qty"))
    )
    tot = pq.groupBy("l_partkey").agg(F.sum("qty").alias("total"))
    winners = (
        pq.join(tot, "l_partkey")
        .filter(F.col("qty") > 0.5 * F.col("total"))
        .select("l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    return s.join(winners, s.s_suppkey == winners.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@query(
    "q21_suppliers_who_kept_orders_waiting",
    oracle="""
    WITH lo AS (
      SELECT l_orderkey, l_suppkey,
        CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END
          AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    ),
    po AS (
      SELECT l_orderkey,
        COUNT(DISTINCT l_suppkey) AS nsupp,
        COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS nlate
      FROM lo GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait FROM (
      SELECT DISTINCT lo.l_suppkey, lo.l_orderkey
      FROM lo JOIN po USING (l_orderkey)
      WHERE lo.late = 1 AND po.nlate = 1 AND po.nsupp >= 2
    ) t JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    """,
)
def q21_suppliers_who_kept_orders_waiting(spark, sf_dir):
    """TPC-H Q21 shape (no commit/receipt dates: "late" = shipped more than
    90 days after the order date): suppliers who were the SOLE late shipper
    on a finished multi-supplier order. The classic double EXISTS / NOT
    EXISTS decorrelates into ONE per-order aggregate (distinct suppliers,
    distinct late suppliers) joined back to the late rows — lineitem⋈orders,
    the per-order agg, and the back-join all hash on l_orderkey, so the
    whole middle of the plan rides a single shuffle partitioning; supplier
    is broadcast at the end. Every EXISTS-chain rewrite a 100 TB engine
    needs is in this one plan."""
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    lo = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .cast("int")
        .alias("late"),
    )
    po = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("nsupp"),
        F.countDistinct(
            F.when(F.col("late") == 1, F.col("l_suppkey"))
        ).alias("nlate"),
    )
    sole_late = (
        lo.filter(F.col("late") == 1)
        .join(po, "l_orderkey")
        .filter((F.col("nlate") == 1) & (F.col("nsupp") >= 2))
        .select("l_suppkey", "l_orderkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    return (
        sole_late.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
