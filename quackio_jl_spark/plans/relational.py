"""Core relational operator surface, each paired with a DuckDB oracle.

Covers SURVEY.md §2.2-§2.6: projection (P1-P3), filter (P4), limit (L1-L2),
aggregation (A1-A3), plus the star-schema operators the driver's oracle gate
checks (joins, windows, set ops, rollup/cube, pivot, scalar string/date/json/
array functions). Everything is built-in Spark SQL — no Python UDFs — so the
whole module stays inside whole-stage codegen.

Determinism contract: aggregates over doubles use the decimal-exact recipe
(functions/exact.py) on BOTH sides, so results are bit-reproducible at any
partition count; ordered/limited queries always carry a unique tie-break key.

Scale notes are inline per query (broadcast choices, shuffle keys).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exact import DEC, davg, dsum
from ..functions.fanout import fanout
from .registry import query, table

# --- shared oracle SQL fragments (kept textual so each oracle reads standalone)
_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(28,6))) AS DOUBLE)"


def _dsum_sql(x: str) -> str:
    return _DSUM.format(x=x)


# ---------------------------------------------------------------- aggregation

@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
      {_dsum_sql('l_quantity')} AS sum_qty,
      {_dsum_sql('l_extendedprice')} AS sum_base_price,
      {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
      {_dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
      {_dsum_sql('l_quantity')} / COUNT(l_quantity) AS avg_qty,
      {_dsum_sql('l_extendedprice')} / COUNT(l_extendedprice) AS avg_price,
      {_dsum_sql('l_discount')} / COUNT(l_discount) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape — the flagship scan+agg. One shuffle on the two
    low-cardinality group keys; partial aggregation map-side, so at 100 TB
    the shuffle carries ~6 rows per input partition.

    Round-11: the filtered scan fans out (functions/fanout.py — identity
    at cluster scale) so the eight wide-decimal partial aggregates run
    on every core instead of inside the one-task single-row-group scan;
    the shipdate predicate still pushes to the parquet scan below the
    repartition (plans/r11/q1_pricing_summary_after.txt)."""
    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        fanout(
            l.filter(F.col("l_shipdate") <= F.lit("1998-09-02")).select(
                "l_returnflag",
                "l_linestatus",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
            ),
            "l_extendedprice",
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "groupby_count_events",
    oracle="SELECT event_type, COUNT(*) AS n, "
    + _dsum_sql("value")
    + " AS total_value FROM events GROUP BY event_type",
)
def groupby_count_events(spark, sf_dir):
    """A2/A3: group-by + per-group count (test/runtests.jl:100-105 analogue)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value")
    )


@query(
    "count_distinct_segments",
    oracle="""
    SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
)
def count_distinct_segments(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@query(
    "agg_filtered_count",
    oracle="""
    SELECT COUNT(*) AS n_all,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders
    """,
)
def agg_filtered_count(spark, sf_dir):
    """A1: count with predicate (reference count(Returns(true)) analogue,
    test/runtests.jl:97) plus min/max (order-independent, no decimal needed)."""
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


# ------------------------------------------------- projection / filter / limit

@query("projection", oracle="SELECT p_partkey, p_name, p_retailprice FROM part")
def projection(spark, sf_dir):
    """P1: projection pushed into the parquet scan (ReadSchema pruning)."""
    return table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_retailprice")


@query(
    "projection_rename",
    oracle="SELECT o_orderkey AS id, o_totalprice AS price FROM orders",
)
def projection_rename(spark, sf_dir):
    """P2: select with rename — reference ``select=("a"=>"c",)``
    (src/QuackIO.jl:82)."""
    o = table(spark, sf_dir, "orders")
    return o.select(F.col("o_orderkey").alias("id"), F.col("o_totalprice").alias("price"))


@query(
    "filter_predicate",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def filter_predicate(spark, sf_dir):
    """P4: predicate lands in PushedFilters at the parquet scan."""
    l = table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07) & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")


@query(
    "limit_pushdown",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10",
)
def limit_pushdown(spark, sf_dir):
    """L1/L2: deterministic limit (ordered by unique key). Catalyst compiles
    orderBy+limit to TakeOrderedAndProject — no global sort at scale."""
    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").limit(10)


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def topk_orders(spark, sf_dir):
    """Top-K: per-partition heaps + driver merge (TakeOrderedAndProject),
    no full shuffle — the scale-safe form of ORDER BY ... LIMIT."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(15)
    )


@query("distinct_segments", oracle="SELECT DISTINCT c_mktsegment FROM customer")
def distinct_segments(spark, sf_dir):
    return table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


# ----------------------------------------------------------------------- joins

@query(
    "join_customer_nation_region",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_customers,
      """ + _dsum_sql("c_acctbal") + """ AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_customer_nation_region(spark, sf_dir):
    """Inner join through two tiny dims — both explicitly broadcast, so the
    fact side never shuffles for the join (only for the final group-by)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal").alias("total_acctbal"))
    )


@query(
    "join_left_orders_per_customer",
    oracle="""
    SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders,
      """ + _dsum_sql("o_totalprice") + """ AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_left_orders_per_customer(spark, sf_dir):
    """Left outer join, customer side broadcast-able only if small — here we
    let AQE decide (orders is the big side; shuffle key = custkey)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"), dsum("o_totalprice").alias("spend"))
    )


@query(
    "join_semi_big_spenders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def join_semi_big_spenders(spark, sf_dir):
    """Left-semi join == EXISTS. Filter pushed below the join so only
    qualifying orders shuffle."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti_quiet_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def join_anti_quiet_customers(spark, sf_dir):
    """Left-anti join == NOT EXISTS."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
      """ + _dsum_sql("l_extendedprice * (1 - l_discount)") + """ AS revenue,
      strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape. customer (filtered) broadcasts; orders⋈lineitem is the
    one real shuffle, on orderkey. Top-10 via TakeOrderedAndProject."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
      """ + _dsum_sql("l_extendedprice * (1 - l_discount)") + """ AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-table star join. supplier/nation/region broadcast;
    the only large shuffles are orders⋈customer (custkey) and
    lineitem⋈orders (orderkey)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"))
    )


# --------------------------------------------------------------------- windows

@query(
    "window_rank_acctbal",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, rnk FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                  ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rnk
      FROM customer) t
    WHERE rnk <= 3
    """,
)
def window_rank_acctbal(spark, sf_dir):
    """Top-3 per group via row_number — the scale-safe top-k-per-key pattern
    (single shuffle on the partition key, no global sort)."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        c.select("c_nationkey", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "window_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_spend(spark, sf_dir):
    """Running total per customer. Decimal accumulation makes the running
    sum independent of how DuckDB/Spark associate frame additions."""
    o = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
    )


@query(
    "window_lag_events",
    oracle="""
    SELECT event_id, user_id,
      value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM events
    """,
)
def window_lag_events(spark, sf_dir):
    """lag(): per-row double subtraction — deterministic given the unique
    (ts, event_id) ordering."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id", (F.col("value") - F.lag("value").over(w)).alias("delta")
    )


# --------------------------------------------------- rollup / cube / pivot

@query(
    "rollup_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      """ + _dsum_sql("l_quantity") + """ AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@query(
    "cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@query(
    "pivot_linestatus",
    oracle="""
    SELECT l_returnflag,
      CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_linestatus(spark, sf_dir):
    """Pivot == conditional aggregation; spelled with when() so the oracle
    mapping (and null-vs-zero behavior) is explicit."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_linestatus") == "O", 1).otherwise(0)).alias("n_open"),
        F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0)).alias("n_fulfilled"),
    )


# ------------------------------------------------------------------- set ops

@query(
    "union_all_price_bands",
    oracle="""
    SELECT o_orderkey, 'low' AS band FROM orders WHERE o_totalprice < 50000
    UNION ALL
    SELECT o_orderkey, 'high' AS band FROM orders WHERE o_totalprice > 450000
    """,
)
def union_all_price_bands(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    low = o.filter(F.col("o_totalprice") < 50000).select("o_orderkey", F.lit("low").alias("band"))
    high = o.filter(F.col("o_totalprice") > 450000).select(
        "o_orderkey", F.lit("high").alias("band")
    )
    return low.unionAll(high)


@query(
    "intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def intersect_nations(spark, sf_dir):
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def except_nations(spark, sf_dir):
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # subtract == EXCEPT DISTINCT (set semantics)


# ----------------------------------------------------------- scalar functions

@query(
    "case_when_price_band",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'large' END AS band,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def case_when_price_band(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("large")
    )
    return o.groupBy(band.alias("band")).agg(F.count(F.lit(1)).alias("n"))


@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
      UPPER(p_name) AS uname,
      SUBSTR(p_name, 1, 8) AS pfx,
      CAST(LENGTH(p_name) AS INTEGER) AS name_len,
      p_brand || '#' || p_type AS tag,
      p_type LIKE 'a%' AS starts_a
    FROM part
    """,
)
def string_functions(spark, sf_dir):
    """§2.6 — includes startswith, the reference's one demonstrated scalar
    function (README.md:68,81)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.substring("p_name", 1, 8).alias("pfx"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("#", "p_brand", "p_type").alias("tag"),
        F.col("p_type").startswith("a").alias("starts_a"),
    )


@query(
    "date_functions",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS y,
           CAST(MONTH(o_orderdate) AS INTEGER) AS m,
           COUNT(*) AS n,
      """ + _dsum_sql("o_totalprice") + """ AS revenue
    FROM orders GROUP BY 1, 2
    """,
)
def date_functions(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("revenue"))


@query(
    "json_extract_events",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events
    """,
)
def json_extract_events(spark, sf_dir):
    """JSON scalar access over events.props (SURVEY.md §2.6)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select("event_id", k.alias("k_str"), k.cast("bigint").alias("k_int"))


@query(
    "events_variant_agg",
    oracle="""
    SELECT event_type,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        AS sum_k,
      CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        AS max_k,
      CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
               THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM events GROUP BY event_type
    """,
)
def events_variant_agg(spark, sf_dir):
    """Semi-structured aggregation through VariantType (Spark 4): props is
    parsed ONCE into the binary variant encoding, then fields are extracted
    with variant_get — the scale path for repeated access into JSON columns
    (get_json_object re-parses the string per call; variant parses per row
    and shreds access into cheap binary probes). The oracle reaches the
    same values through DuckDB's JSON extraction, proving the variant
    round-trip is lossless for this access pattern."""
    e = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).alias("n_high"),
        )
    )


@query(
    "events_hourly_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS bucket,
           event_type, COUNT(*) AS n,
      """ + _dsum_sql("value") + """ AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly_window(spark, sf_dir):
    """Time-bucketed aggregation via F.window — the batch twin of the
    Structured Streaming tumbling window (streaming/events.py)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "events_sliding_window",
    oracle=f"""
    WITH starts AS (
      SELECT event_type, value, time_bucket(INTERVAL 30 MINUTE, ts) AS s FROM events
      UNION ALL
      SELECT event_type, value,
             time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE FROM events
    )
    SELECT strftime(s, '%Y-%m-%d %H:%M:%S') AS bucket, event_type,
           COUNT(*) AS n, {_dsum_sql('value')} AS total_value
    FROM starts GROUP BY 1, 2
    """,
)
def events_sliding_window(spark, sf_dir):
    """Sliding windows (1h length, 30min hop): each event lands in two
    overlapping windows — F.window handles the fan-out natively; the oracle
    reproduces it as a two-bucket UNION ALL. Batch twin of the streaming
    sliding-window aggregation."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "events_gapfill_ffill",
    oracle=f"""
    WITH hourly AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS h, event_type,
             COUNT(*) AS n, {_dsum_sql('value')} AS v
      FROM events GROUP BY h, event_type
    ),
    bounds AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM hourly),
    spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM bounds),
    grid AS (SELECT h, event_type FROM spine
             CROSS JOIN (SELECT DISTINCT event_type FROM events) t)
    SELECT strftime(g.h, '%Y-%m-%d %H:%M:%S') AS bucket, g.event_type,
      COALESCE(hourly.n, 0) AS n,
      last_value(hourly.v IGNORE NULLS) OVER (
        PARTITION BY g.event_type ORDER BY g.h
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
    FROM grid g LEFT JOIN hourly ON hourly.h = g.h AND hourly.event_type = g.event_type
    """,
)
def events_gapfill_ffill(spark, sf_dir):
    """Time-series gap-fill (the hypertable-rollup pattern): build the
    complete hourly spine x event-type grid, left-join the real hourly
    aggregates, then forward-fill missing values with the last observation
    (per-series ordered window, IGNORE NULLS). The spine generates from a
    broadcast 1-row bounds table — no driver-side loop; the only big
    shuffles are the hourly aggregate and the per-series window sort. At
    scale the spine is tiny (hours x types) and the join broadcasts IT,
    not the data."""
    e = table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("v"))
    )
    bounds = hourly.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = e.select("event_type").distinct()
    grid = F.broadcast(spine.crossJoin(types))
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(hourly, ["h", "event_type"], "left")
        .select(
            "h",
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("v", ignorenulls=True).over(w).alias("v_ffill"),
        )
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
            "n",
            "v_ffill",
        )
    )


@query(
    "integrity_checks",
    oracle="""
    SELECT 'orders_orphan_custkey' AS check_name,
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS violations
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'customer_dup_custkey',
           (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer
                                  GROUP BY c_custkey HAVING COUNT(*) > 1) t)
    UNION ALL
    SELECT 'orders_null_orderdate',
           (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL)
    UNION ALL
    SELECT 'lineitem_nonpositive_qty',
           (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
    """,
)
def integrity_checks(spark, sf_dir):
    """Data-quality suite as ONE query (the dbt-tests shape): referential
    integrity via ANTI joins (orphan orders/lineitems), key uniqueness via
    HAVING, null and domain constraints via filters — each check is a
    (name, violation_count) row, so the report unions cheaply and a
    downstream gate just asserts max(violations) == 0. Anti joins shuffle
    on the key; the dimension sides broadcast at dim scale."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    l = table(spark, sf_dir, "lineitem")

    def one(name, cnt_df):
        return cnt_df.select(
            F.lit(name).alias("check_name"), F.count(F.lit(1)).alias("violations")
        )

    orphan_orders = o.join(
        c.select("c_custkey"), o.o_custkey == c.c_custkey, "left_anti"
    )
    orphan_lines = l.join(
        o.select("o_orderkey"), l.l_orderkey == o.o_orderkey, "left_anti"
    )
    dup_cust = (
        c.groupBy("c_custkey").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
    )
    null_dates = o.filter(F.col("o_orderdate").isNull())
    bad_qty = l.filter(F.col("l_quantity") <= 0)
    return (
        one("orders_orphan_custkey", orphan_orders)
        .unionByName(one("lineitem_orphan_orderkey", orphan_lines))
        .unionByName(one("customer_dup_custkey", dup_cust))
        .unionByName(one("orders_null_orderdate", null_dates))
        .unionByName(one("lineitem_nonpositive_qty", bad_qty))
    )


@query(
    "intersect_all_segments",
    oracle="""
    SELECT c_mktsegment AS seg FROM customer WHERE c_acctbal > 0
    INTERSECT ALL
    SELECT c_mktsegment FROM customer WHERE c_acctbal <= 5000
    """,
)
def intersect_all_segments(spark, sf_dir):
    """Bag-semantics INTERSECT ALL (multiplicities = min of both sides) —
    the multiset twin of intersect_nations. Spark expands it to a
    count-and-replicate aggregate; one shuffle on the value."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 0).select(F.col("c_mktsegment").alias("seg"))
    b = c.filter(F.col("c_acctbal") <= 5000).select(F.col("c_mktsegment").alias("seg"))
    return a.intersectAll(b)


@query(
    "except_all_statuses",
    oracle="""
    SELECT o_orderstatus AS status FROM orders WHERE o_totalprice > 100000
    EXCEPT ALL
    SELECT o_orderstatus FROM orders WHERE o_totalprice > 400000
    """,
)
def except_all_statuses(spark, sf_dir):
    """Bag-semantics EXCEPT ALL (multiplicities subtract, floored at 0)."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_orderstatus").alias("status")
    )
    b = o.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_orderstatus").alias("status")
    )
    return a.exceptAll(b)


@query(
    "join_full_outer_click_purchase",
    oracle="""
    WITH c AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_clicks
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    p AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
      COALESCE(n_clicks, 0) AS n_clicks,
      COALESCE(n_purchases, 0) AS n_purchases,
      (c.user_id IS NULL) AS purchase_only,
      (p.user_id IS NULL) AS click_only
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    """,
)
def join_full_outer_click_purchase(spark, sf_dir):
    """FULL OUTER join (the one join type the suite didn't yet expose as a
    query): per-user click vs purchase activity with both unmatched sides
    kept and flagged. Shuffles both pre-aggregated key tables (users, not
    events) — a full-outer can't broadcast either side by definition, so
    the scale design is to aggregate BEFORE joining."""
    e = table(spark, sf_dir, "events")
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
        .withColumnRenamed("user_id", "cu")
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .withColumnRenamed("user_id", "pu")
    )
    j = c.join(p, F.col("cu") == F.col("pu"), "full_outer")
    return j.select(
        F.coalesce("cu", "pu").alias("user_id"),
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        F.col("cu").isNull().alias("purchase_only"),
        F.col("pu").isNull().alias("click_only"),
    )


@query(
    "null_safe_join_semantics",
    oracle="""
    WITH keyed AS (
      SELECT CASE WHEN o_orderkey % 10 = 0 THEN NULL
        ELSE o_orderkey % 97 END AS k
      FROM orders WHERE o_orderkey <= 5000
    ),
    c AS (SELECT k, COUNT(*) AS c FROM keyed GROUP BY k)
    SELECT
      CAST(SUM(CASE WHEN k IS NOT NULL THEN c * c ELSE 0 END) AS BIGINT)
        AS eq_join_rows,
      CAST(SUM(c * c) AS BIGINT) AS null_safe_join_rows,
      CAST(SUM(CASE WHEN k IS NULL THEN c ELSE 0 END) AS BIGINT)
        AS n_null_keys
    FROM c
    """,
)
def null_safe_join_semantics(spark, sf_dir):
    """NULL-join semantics, executed for real: a self-join under `=` drops
    every NULL-keyed row (SQL three-valued logic), under `<=>`
    (eqNullSafe / IS NOT DISTINCT FROM) the NULL group joins itself. The
    Spark side runs BOTH joins through the executor and counts; the
    oracle pins the closed forms (sum of c^2 over non-null groups vs all
    groups) — so an engine that ever started matching NULLs under `=`,
    or hashing NULL into a value bucket under `<=>`, breaks the gate.
    The one semantics corner every dedup-by-key pipeline with nullable
    keys hits."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    keyed = o.select(
        F.when(F.col("o_orderkey") % 10 == 0, None)
        .otherwise(F.col("o_orderkey") % 97)
        .alias("k")
    )
    a = keyed.select(F.col("k").alias("ka"))
    b = keyed.select(F.col("k").alias("kb"))
    eq = a.join(b, F.col("ka") == F.col("kb")).agg(
        F.count(F.lit(1)).cast("bigint").alias("eq_join_rows")
    )
    ns = a.join(b, F.col("ka").eqNullSafe(F.col("kb"))).agg(
        F.count(F.lit(1)).cast("bigint").alias("null_safe_join_rows")
    )
    nn = keyed.filter(F.col("k").isNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_null_keys")
    )
    return (
        eq.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(nn))
        .select("eq_join_rows", "null_safe_join_rows", "n_null_keys")
    )
