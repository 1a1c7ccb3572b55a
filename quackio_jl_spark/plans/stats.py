"""Statistical data-quality / time-series operators (round-5 extension).

Beyond-reference surface in the spirit of SURVEY.md §2.4/§2.7 extensions:
Pareto-skyline extraction, month-over-month deltas, inter-purchase gap
statistics, seasonality-adjusted anomaly detection and per-entity
distribution entropy — the report/diagnostic layer a training-data
pipeline runs next to dedup and quality scoring.

Reference parity note: the reference (QuackIO.jl, src/QuackIO.jl:1-149)
delegates all query semantics to DuckDB SQL; these operators express the
same results Spark-first (DataFrame plans, decimal-exact aggregation per
functions/exact.py) with the DuckDB SQL kept as the oracle.

Determinism engineering (same recipe as plans/analytics.py): per-row
arithmetic in double (IEEE-identical in both engines), order-independent
decimal sums at every aggregation boundary, and round-to-10-decimals
before summing entropy contributions so partitioning never changes a bit.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exact import DEC, dsum
from ..functions.fanout import fanout
from ..functions.prefix import bucketed_prefix_sums
from .registry import query, table

_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(28,6))) AS DOUBLE)"


def _d(x: str) -> str:
    return _DSUM.format(x=x)


# ------------------------------------------------------------ 2-D skyline

N_SKYLINE_BUCKETS = 16


@query(
    "part_skyline_pareto",
    oracle="""
    WITH pts AS (SELECT DISTINCT p_retailprice, p_size FROM part)
    SELECT p_retailprice, p_size FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
    )
    """,
)
def part_skyline_pareto(spark, sf_dir):
    """Pareto skyline minimizing (p_retailprice, p_size): the parts for
    which no other part is at-most-equal on both dimensions and strictly
    better on one.

    Scale shape (classic two-phase distributed skyline): on DISTINCT
    points ordered by (price asc, size asc), a point is dominated iff the
    running MIN of size over any preceding subset is <= its size — so a
    per-bucket window (parallel, any hash bucketing works) prunes to a
    local skyline whose union is a superset of the global skyline and is
    tiny (<= one survivor per distinct size per bucket). Phase 2 repeats
    the same window globally over only those survivors. NO all-pairs
    anti-join — the oracle's NOT EXISTS is quadratic and only viable at
    oracle scale."""
    pts = (
        table(spark, sf_dir, "part")
        .select("p_retailprice", "p_size")
        .distinct()
        .withColumn(
            "_b", F.pmod(F.hash("p_retailprice"), F.lit(N_SKYLINE_BUCKETS))
        )
    )

    def survivors(df, *partition):
        w = (
            W.partitionBy(*partition).orderBy("p_retailprice", "p_size")
            if partition
            else W.orderBy("p_retailprice", "p_size")
        ).rowsBetween(W.unboundedPreceding, -1)
        m = F.min("p_size").over(w)
        return (
            df.withColumn("_m", m)
            .filter(F.col("_m").isNull() | (F.col("_m") > F.col("p_size")))
            .drop("_m")
        )

    local = survivors(pts, "_b").drop("_b")
    return survivors(local)  # global pass over the tiny survivor set


# ------------------------------------------------- month-over-month delta


@query(
    "orders_mom_pct_change",
    oracle=f"""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        {_d('o_totalprice')} AS revenue,
        COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT month, revenue, CAST(n_orders AS BIGINT) AS n_orders,
      (revenue - lag(revenue) OVER (ORDER BY month))
        / lag(revenue) OVER (ORDER BY month) AS pct_change
    FROM m
    """,
)
def orders_mom_pct_change(spark, sf_dir):
    """Monthly revenue with month-over-month percent change — the
    canonical trend report. The heavy part is one partial-aggregated
    shuffle onto ~tens of month rows; the lag window then runs on that
    tiny aggregate (single partition over dozens of rows is fine — it is
    NOT a window over the raw fact table). Revenue is an exact decimal
    sum, so the pct division is bit-identical in any engine."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    prev = F.lag("revenue").over(W.orderBy("month"))
    return m.select(
        "month",
        "revenue",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        ((F.col("revenue") - prev) / prev).alias("pct_change"),
    )


# -------------------------------------------- inter-purchase gap metrics


@query(
    "customer_interpurchase_stats",
    oracle="""
    WITH g AS (
      SELECT o_custkey,
        date_diff('day',
          CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
          CAST(o_orderdate AS DATE)) AS gap
      FROM orders
    )
    SELECT o_custkey,
      CAST(COUNT(*) + 1 AS BIGINT) AS n_orders,
      CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS avg_gap_days,
      CAST(MAX(gap) AS BIGINT) AS max_gap_days
    FROM g WHERE gap IS NOT NULL
    GROUP BY o_custkey
    """,
)
def customer_interpurchase_stats(spark, sf_dir):
    """Days between consecutive orders per customer: order count, mean
    gap, max gap (repeat customers only). The lag window is partitioned
    by o_custkey — millions of small independent partitions, never a
    global sort — and the gap arithmetic is integer days, so the one
    double division (mean) is exact-input and engine-identical. Ties on
    order date are broken by o_orderkey for a deterministic lag."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff("o_orderdate", F.lag("o_orderdate").over(w))
    return (
        o.select("o_custkey", gap.alias("gap"))
        .filter(F.col("gap").isNotNull())
        .groupBy("o_custkey")
        .agg(
            (F.count(F.lit(1)) + 1).cast("bigint").alias("n_orders"),
            (F.sum("gap").cast("double") / F.count(F.lit(1))).alias(
                "avg_gap_days"
            ),
            F.max("gap").cast("bigint").alias("max_gap_days"),
        )
    )


# ---------------------------------------- seasonality-adjusted anomalies


@query(
    "events_seasonal_zscore",
    oracle=f"""
    WITH st AS (
      SELECT event_type, isodow(ts) - 1 AS dow, hour(ts) AS hr,
        COUNT(*) AS n,
        {_d('value')} / COUNT(*) AS mu,
        sqrt(({_d('value * value')} - {_d('value')} * {_d('value')} / COUNT(*))
             / (COUNT(*) - 1)) AS sigma
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_id, e.event_type,
      CAST(isodow(ts) - 1 AS INTEGER) AS dow,
      CAST(hour(ts) AS INTEGER) AS hr,
      (value - mu) / sigma AS z
    FROM events e
    JOIN st ON st.event_type = e.event_type
      AND st.dow = isodow(ts) - 1 AND st.hr = hour(ts)
    WHERE n >= 2 AND sigma > 0 AND abs((value - mu) / sigma) > 3.0
    """,
)
def events_seasonal_zscore(spark, sf_dir):
    """Seasonality-adjusted anomaly detection: z-scores against a
    per-(event_type, weekday, hour) baseline instead of the global
    per-type baseline of events_zscore_anomalies — a value that is normal
    on Saturday 03:00 can be anomalous on Tuesday 14:00. The baseline is
    a k x 7 x 24-row aggregate (exact decimal sums) BROADCAST back onto
    the stream; weekday uses Monday=0 on both sides (Spark weekday(),
    DuckDB isodow-1). Cells with n<2 or zero variance are excluded."""
    e = table(spark, sf_dir, "events").withColumns(
        {"dow": F.weekday("ts"), "hr": F.hour("ts")}
    )
    n = F.count(F.lit(1))
    sum_v = F.sum(F.col("value").cast(DEC)).cast("double")
    sum_v2 = F.sum((F.col("value") * F.col("value")).cast(DEC)).cast("double")
    st = e.groupBy("event_type", "dow", "hr").agg(
        n.alias("n"),
        (sum_v / n).alias("mu"),
        F.sqrt((sum_v2 - sum_v * sum_v / n) / (n - 1)).alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        e.join(F.broadcast(st), ["event_type", "dow", "hr"])
        .filter((F.col("n") >= 2) & (F.col("sigma") > 0) & (F.abs(z) > 3.0))
        .select(
            "event_id",
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            F.col("hr").cast("int").alias("hr"),
            z.alias("z"),
        )
    )


# ------------------------------------------- per-user event-type entropy


@query(
    "user_event_entropy",
    oracle="""
    WITH cnt AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type
    ),
    n AS (SELECT user_id, SUM(c) AS n FROM cnt GROUP BY user_id)
    SELECT cnt.user_id,
      CAST(SUM(CAST(round(-(cnt.c / CAST(n.n AS DOUBLE))
                    * ln(cnt.c / CAST(n.n AS DOUBLE)), 10)
               AS DECIMAL(28,10))) AS DOUBLE) AS type_entropy,
      CAST(MAX(n.n) AS BIGINT) AS n_events,
      CAST(COUNT(*) AS BIGINT) AS n_types
    FROM cnt JOIN n ON cnt.user_id = n.user_id
    GROUP BY cnt.user_id
    """,
)
def user_event_entropy(spark, sf_dir):
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity signal (entropy ~0 = single-action bots, high
    entropy = organic mixed usage). Same determinism recipe as
    text_token_entropy (operators/text.py): each -p*ln(p) contribution is
    IEEE-identical per row, rounded to 10 decimals and summed as DECIMAL
    so the per-user total is independent of partitioning. Two
    partial-aggregated shuffles on user_id; never a window."""
    e = table(spark, sf_dir, "events")
    cnt = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    n = cnt.groupBy("user_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    contrib = F.round(-p * F.log(p), 10).cast("decimal(28,10)")
    return (
        cnt.join(n, "user_id")
        .groupBy("user_id")
        .agg(
            F.sum(contrib).cast("double").alias("type_entropy"),
            F.max("n").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
        )
    )


# ------------------------------------- lang x source mutual information


@query(
    "lang_source_mutual_information",
    oracle="""
    WITH j AS (
      SELECT lang, source, COUNT(*) AS c FROM documents GROUP BY lang, source
    ),
    ml AS (SELECT lang, SUM(c) AS cl FROM j GROUP BY lang),
    ms AS (SELECT source, SUM(c) AS cs FROM j GROUP BY source),
    t AS (SELECT SUM(c) AS n FROM j)
    SELECT
      CAST(SUM(CAST(round(
          (j.c / CAST(n AS DOUBLE))
          * ln((CAST(j.c AS DOUBLE) * n) / (CAST(cl AS DOUBLE) * cs)), 10)
        AS DECIMAL(28,10))) AS DOUBLE) AS mi_nats,
      CAST(MAX(n) AS BIGINT) AS n_docs,
      CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM j
    JOIN ml USING (lang)
    JOIN ms USING (source)
    CROSS JOIN t
    """,
)
def lang_source_mutual_information(spark, sf_dir):
    """Mutual information (nats) between document language and source —
    the corpus-composition diagnostic: MI ~ 0 means sources share one
    language mix; high MI means language is concentrated per source (a
    sampling-bias warning before mixing). Everything reduces to a tiny
    |langs| x |sources| contingency table: one partial-aggregated shuffle
    builds the joint counts, marginals and the grand total are broadcast
    back, and each cell's p*ln(p/(pq)) contribution is rounded to 10
    decimals and decimal-summed (order-independent, both engines). All
    count products stay exact in int64 (< 2^53) before the one double
    division, so the logs see bit-identical inputs."""
    d = table(spark, sf_dir, "documents")
    j = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
    ml = j.groupBy("lang").agg(F.sum("c").alias("cl"))
    ms = j.groupBy("source").agg(F.sum("c").alias("cs"))
    t = j.agg(F.sum("c").alias("n"))
    cell = (
        j.join(F.broadcast(ml), "lang")
        .join(F.broadcast(ms), "source")
        .crossJoin(F.broadcast(t))
    )
    p = F.col("c") / F.col("n").cast("double")
    ratio = (F.col("c").cast("double") * F.col("n")) / (
        F.col("cl").cast("double") * F.col("cs")
    )
    contrib = F.round(p * F.log(ratio), 10).cast("decimal(28,10)")
    return cell.agg(
        F.sum(contrib).cast("double").alias("mi_nats"),
        F.max("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )


# -------------------------------------------------- Benford digit audit


@query(
    "benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(regexp_extract(CAST(o_totalprice AS VARCHAR), '[1-9]', 0)
                  AS INTEGER) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    t AS (SELECT COUNT(*) AS n FROM d)
    SELECT digit,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      COUNT(*) / CAST(MAX(t.n) AS DOUBLE) AS observed_frac,
      round(log10(1.0 + 1.0 / digit), 10) AS benford_frac,
      abs(COUNT(*) / CAST(MAX(t.n) AS DOUBLE)
          - round(log10(1.0 + 1.0 / digit), 10)) AS abs_dev
    FROM d CROSS JOIN t
    GROUP BY digit
    """,
)
def benford_first_digit(spark, sf_dir):
    """Benford's-law audit of order totals: observed first-significant-
    digit distribution vs log10(1 + 1/d) — the standard fabricated-data /
    corrupted-ingest screen. The first digit comes from a regexp over the
    engine's shortest-roundtrip double rendering (identical leading digit
    in both engines; avoids floor(log10(x)) whose last-ulp libm
    differences could flip a power-of-ten boundary). One 9-row group-by;
    the grand total is a broadcast 1-row aggregate. The expected fraction
    is rounded to 10 decimals on both sides so the comparison column is
    bit-stable."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.regexp_extract(F.col("o_totalprice").cast("string"), "[1-9]", 0)
        .cast("int")
        .alias("digit")
    )
    t = d.agg(F.count(F.lit(1)).alias("n"))
    benford = F.round(F.log10(1.0 + 1.0 / F.col("digit")), 10)
    frac = F.count(F.lit(1)) / F.max("n").cast("double")
    return (
        d.crossJoin(F.broadcast(t))
        .groupBy("digit")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            frac.alias("observed_frac"),
            benford.alias("benford_frac"),
            F.abs(frac - benford).alias("abs_dev"),
        )
    )


# ----------------------------------------------- weighted median (group)


@query(
    "weighted_median_price_by_flag",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS price,
        SUM(CAST(l_quantity AS DECIMAL(28,6))) OVER (
          PARTITION BY l_returnflag
          ORDER BY l_extendedprice, l_orderkey, l_linenumber
        ) AS cw,
        SUM(CAST(l_quantity AS DECIMAL(28,6))) OVER (
          PARTITION BY l_returnflag
        ) AS tot
      FROM lineitem
    )
    SELECT l_returnflag,
      MIN(price) AS weighted_median_price,
      CAST(MAX(tot) AS DOUBLE) AS total_qty
    FROM w WHERE 2 * cw >= tot
    GROUP BY l_returnflag
    """,
)
def weighted_median_price_by_flag(spark, sf_dir):
    """Quantity-weighted median extended price per return flag — the
    weighted quantile neither engine ships as a builtin: smallest price
    whose cumulative quantity reaches half the group total. Expressed as
    a per-group cumulative DECIMAL sum (exact, so the 2*cw >= tot cut is
    engine-independent) over a deterministic (price, orderkey,
    linenumber) order, then MIN over qualifying rows. The window is
    partitioned by the group key — parallel across groups, never a
    global sort. 100 TB note: for high-cardinality group keys this shape
    holds; for FEW huge groups the bucketed prefix-sum kernel of
    ks_test_click_vs_view is the scale path."""
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast(DEC)
    w_cum = (
        W.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_all = W.partitionBy("l_returnflag")
    x = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.sum(q).over(w_cum).alias("cw"),
        F.sum(q).over(w_all).alias("tot"),
    )
    return (
        x.filter(F.lit(2) * F.col("cw") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").alias("weighted_median_price"),
            F.max("tot").cast("double").alias("total_qty"),
        )
    )


# ------------------------------------------- two-sample KS (distributed)

N_KS_BUCKETS = 16


@query(
    "ks_test_click_vs_view",
    oracle="""
    WITH f AS (
      SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
      FROM events WHERE event_type IN ('click', 'view')
    ),
    pv AS (
      SELECT value, SUM(ia) AS a, SUM(1 - ia) AS b FROM f GROUP BY value
    ),
    t AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM pv),
    c AS (
      SELECT
        SUM(a) OVER (ORDER BY value) AS ca,
        SUM(b) OVER (ORDER BY value) AS cb
      FROM pv
    )
    SELECT
      MAX(abs(ca / CAST(na AS DOUBLE) - cb / CAST(nb AS DOUBLE))) AS ks_stat,
      CAST(MAX(na) AS BIGINT) AS n_click,
      CAST(MAX(nb) AS BIGINT) AS n_view
    FROM c CROSS JOIN t
    """,
)
def ks_test_click_vs_view(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov statistic between the value
    distributions of 'click' and 'view' events — the drift test run
    between data snapshots or corpus sources. D = max_x |F_a(x) -
    F_b(x)| needs a global cumulative count in value order; instead of a
    single-reducer window, the running sums use the bucketed prefix-sum
    kernel (contiguous_row_ids pattern, operators/pipeline.py): bucket
    ids are a PURE FUNCTION of value (uniform ranges between broadcast
    min/max), per-bucket totals roll into broadcast starting offsets,
    and the in-bucket windows run in parallel. All cumulative counts are
    exact integers; the two divisions and abs happen per distinct value
    identically in both engines, and MAX is order-free.

    Round-11: the filtered events scan fans out keyed on the group key
    (value) — the per-value flag-count's map side ran on the one-task
    single-row-group scan, and the fan-out IS the aggregation exchange
    at bench scale."""
    e = fanout(
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select("value", "event_type"),
        "value",
    )
    pv = e.groupBy("value").agg(
        F.sum((F.col("event_type") == "click").cast("bigint")).alias("a"),
        F.sum((F.col("event_type") == "view").cast("bigint")).alias("b"),
    )
    totals = F.broadcast(pv.agg(F.sum("a").alias("na"), F.sum("b").alias("nb")))
    c = bucketed_prefix_sums(pv, "value", ["a", "b"], N_KS_BUCKETS)
    d = F.abs(
        F.col("cum_a") / F.col("na").cast("double")
        - F.col("cum_b") / F.col("nb").cast("double")
    )
    return (
        c.crossJoin(totals)
        .select(d.alias("d"), "na", "nb")
        .agg(
            F.max("d").alias("ks_stat"),
            F.max("na").cast("bigint").alias("n_click"),
            F.max("nb").cast("bigint").alias("n_view"),
        )
    )


# --------------------------------------------- equi-depth histogram bins


@query(
    "orders_equidepth_histogram",
    oracle="""
    WITH b AS (
      SELECT
        quantile_cont(o_totalprice, 0.1) AS b1,
        quantile_cont(o_totalprice, 0.2) AS b2,
        quantile_cont(o_totalprice, 0.3) AS b3,
        quantile_cont(o_totalprice, 0.4) AS b4,
        quantile_cont(o_totalprice, 0.5) AS b5,
        quantile_cont(o_totalprice, 0.6) AS b6,
        quantile_cont(o_totalprice, 0.7) AS b7,
        quantile_cont(o_totalprice, 0.8) AS b8,
        quantile_cont(o_totalprice, 0.9) AS b9
      FROM orders
    )
    SELECT
      CAST(o_totalprice >= b1 AS INTEGER) + CAST(o_totalprice >= b2 AS INTEGER)
      + CAST(o_totalprice >= b3 AS INTEGER) + CAST(o_totalprice >= b4 AS INTEGER)
      + CAST(o_totalprice >= b5 AS INTEGER) + CAST(o_totalprice >= b6 AS INTEGER)
      + CAST(o_totalprice >= b7 AS INTEGER) + CAST(o_totalprice >= b8 AS INTEGER)
      + CAST(o_totalprice >= b9 AS INTEGER) AS bin,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      MIN(o_totalprice) AS bin_lo,
      MAX(o_totalprice) AS bin_hi
    FROM orders CROSS JOIN b
    GROUP BY 1
    """,
)
def orders_equidepth_histogram(spark, sf_dir):
    """Equi-DEPTH histogram (decile bins) of order totals — equal-count
    bins where totalprice_histogram's equal-WIDTH bins would collapse
    under skew. Boundaries are the exact deciles (F.percentile <->
    quantile_cont, the bit-identical interpolation pairing proven by
    percentiles_by_status), computed as ONE 1-row aggregate that
    broadcasts onto the scan; the bin id is just the count of boundaries
    <= value, so assignment is a map with no second shuffle beyond the
    10-row group-by. 100 TB note: swap F.percentile for percentile_approx
    when exactness isn't contractual — the plan shape is unchanged."""
    o = table(spark, sf_dir, "orders")
    b = o.agg(
        *[
            F.percentile("o_totalprice", i / 10.0).alias(f"b{i}")
            for i in range(1, 10)
        ]
    )
    bin_col = sum(
        (F.col("o_totalprice") >= F.col(f"b{i}")).cast("int")
        for i in range(1, 10)
    )
    return (
        o.crossJoin(F.broadcast(b))
        .groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.min("o_totalprice").alias("bin_lo"),
            F.max("o_totalprice").alias("bin_hi"),
        )
    )


# ------------------------------------------ first-order Markov transitions


@query(
    "events_markov_transitions",
    oracle="""
    WITH t AS (
      SELECT
        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS from_type,
        event_type AS to_type
      FROM events
    ),
    c AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM t WHERE from_type IS NOT NULL
      GROUP BY from_type, to_type
    ),
    r AS (SELECT from_type, SUM(n) AS tot FROM c GROUP BY from_type)
    SELECT c.from_type, c.to_type,
      CAST(n AS BIGINT) AS n_transitions,
      n / CAST(tot AS DOUBLE) AS prob
    FROM c JOIN r USING (from_type)
    """,
)
def events_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: P(next type | current type) — the behavioral model behind
    next-action prediction and bot detection (bots have near-
    deterministic rows). The lag window is partitioned by user_id
    (parallel, deterministic (ts, event_id) order); the matrix itself is
    a |types|^2 aggregate, with row totals joined back as a broadcast.
    Counts are exact integers; the single probability division is
    engine-identical."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    c = t.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    r = c.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(r), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n_transitions"),
        (F.col("n") / F.col("tot").cast("double")).alias("prob"),
    )


# --------------------------------------- autocorrelation of daily counts

ACF_MAX_LAG = 7


@query(
    "events_daily_autocorrelation",
    oracle=f"""
    WITH c AS (
      SELECT CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', ts)
                  AS BIGINT) AS d,
        COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    mu AS (SELECT CAST(SUM(c) AS DOUBLE) / COUNT(*) AS mu FROM c),
    den AS (
      SELECT CAST(SUM(CAST(round((c - mu) * (c - mu), 8) AS DECIMAL(28,10)))
                  AS DOUBLE) AS den
      FROM c CROSS JOIN mu
    ),
    num AS (
      SELECT k.lag AS lag,
        CAST(SUM(CAST(round((a.c - mu) * (b.c - mu), 8) AS DECIMAL(28,10)))
             AS DOUBLE) AS num,
        CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM c a
      CROSS JOIN (SELECT unnest(generate_series(1, {ACF_MAX_LAG})) AS lag) k
      JOIN c b ON b.d = a.d + k.lag
      CROSS JOIN mu
      GROUP BY k.lag
    )
    SELECT lag, num / den AS acf, n_pairs
    FROM num CROSS JOIN den
    """,
)
def events_daily_autocorrelation(spark, sf_dir):
    """Autocorrelation of the daily event-count series at lags 1..{ACF_MAX_LAG}
    — the weekly-seasonality detector (a spike at lag 7 says schedule
    rollups by week). The raw table collapses to one tiny day-count
    aggregate first; the lag alignment is an equi-join of that aggregate
    against itself shifted by an exploded lag grid (bounded, never
    per-event). Mean and denominator are broadcast 1-row aggregates;
    centered products are rounded to 8 decimals then decimal-summed so
    the series order never changes a bit."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy(
        F.datediff("ts", F.lit("1995-01-01")).cast("bigint").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    mu_df = c.agg((F.sum("c").cast("double") / F.count(F.lit(1))).alias("mu"))
    centered2 = F.round(
        (F.col("c") - F.col("mu")) * (F.col("c") - F.col("mu")), 8
    ).cast("decimal(28,10)")
    den_df = (
        c.crossJoin(F.broadcast(mu_df))
        .agg(F.sum(centered2).cast("double").alias("den"))
    )
    lags = F.explode(
        F.sequence(F.lit(1), F.lit(ACF_MAX_LAG))
    ).alias("lag")
    a = c.select(F.col("d").alias("da"), F.col("c").alias("ca")).crossJoin(
        spark.range(1).select(lags)
    )
    b = c.select(F.col("d").alias("db"), F.col("c").alias("cb"))
    prod = F.round(
        (F.col("ca") - F.col("mu")) * (F.col("cb") - F.col("mu")), 8
    ).cast("decimal(28,10)")
    num_df = (
        a.join(b, F.col("db") == F.col("da") + F.col("lag"))
        .crossJoin(F.broadcast(mu_df))
        .groupBy("lag")
        .agg(
            F.sum(prod).cast("double").alias("num"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )
    return num_df.crossJoin(F.broadcast(den_df)).select(
        "lag", (F.col("num") / F.col("den")).alias("acf"), "n_pairs"
    )


# ------------------------------------------------- k-anonymity report


K_ANON_THRESHOLD = 5


@query(
    "k_anonymity_report",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
        CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        COUNT(*) AS k
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_groups,
      CAST(SUM(k) AS BIGINT) AS n_rows,
      CAST(MIN(k) AS BIGINT) AS min_k,
      CAST(SUM(CASE WHEN k < {K_ANON_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
        AS unsafe_groups,
      CAST(SUM(CASE WHEN k < {K_ANON_THRESHOLD} THEN k ELSE 0 END) AS BIGINT)
        AS unsafe_rows,
      SUM(CASE WHEN k < {K_ANON_THRESHOLD} THEN k ELSE 0 END)
        / CAST(SUM(k) AS DOUBLE) AS unsafe_row_frac
    FROM g
    """,
)
def k_anonymity_report(spark, sf_dir):
    """k-anonymity audit over the quasi-identifier tuple (nation, market
    segment, account-balance band): how many equivalence classes fall
    below k={K_ANON_THRESHOLD}, and what fraction of rows they expose —
    the release-gate report privacy teams run before sharing derived
    tables (companion to the pii_scan/redact operators). One
    partial-aggregated shuffle onto the QI tuple, then a 1-row rollup;
    every figure is an exact integer except the final exposure fraction."""
    c = table(spark, sf_dir, "customer")
    g = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("k"))
    unsafe = F.col("k") < K_ANON_THRESHOLD
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("k").cast("bigint").alias("n_rows"),
        F.min("k").cast("bigint").alias("min_k"),
        F.sum(unsafe.cast("int")).cast("bigint").alias("unsafe_groups"),
        F.sum(F.when(unsafe, F.col("k")).otherwise(0))
        .cast("bigint")
        .alias("unsafe_rows"),
        (
            F.sum(F.when(unsafe, F.col("k")).otherwise(0))
            / F.sum("k").cast("double")
        ).alias("unsafe_row_frac"),
    )


# ----------------------------------------------------- rank-sum ROC AUC

N_AUC_BUCKETS = 16


@query(
    "quality_score_auc",
    oracle="""
    WITH pv AS (
      SELECT n_chars AS s,
        SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p,
        SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS q
      FROM documents GROUP BY n_chars
    ),
    t AS (SELECT SUM(p) AS np, SUM(q) AS nq FROM pv),
    c AS (
      SELECT p, q, SUM(q) OVER (ORDER BY s) - q AS qb FROM pv
    )
    SELECT
      CAST(SUM(2 * p * qb + p * q) AS DOUBLE)
        / (2.0 * MAX(np) * MAX(nq)) AS auc,
      CAST(MAX(np) AS BIGINT) AS n_pos,
      CAST(MAX(nq) AS BIGINT) AS n_neg
    FROM c CROSS JOIN t
    """,
)
def quality_score_auc(spark, sf_dir):
    """ROC AUC of a score against a binary label via the rank-sum
    (Mann-Whitney U) identity — the classifier-evaluation harness for
    any quality model, shown here scoring document length against the
    is-English label. AUC = sum over distinct scores of (pos_at *
    negs_below + pos_at*negs_at/2) / (P*N); everything stays in exact
    integers (doubled to absorb the tie half) until ONE final division.
    The cumulative negatives-below-score uses the bucketed prefix-sum
    kernel (same as ks_test_click_vs_view): bucket ids are a pure
    function of the score, per-bucket totals broadcast as offsets,
    in-bucket windows run in parallel — never a single-reducer window
    over the corpus."""
    d = table(spark, sf_dir, "documents")
    pv = d.groupBy(F.col("n_chars").alias("s")).agg(
        F.sum((F.col("lang") == "en").cast("bigint")).alias("p"),
        F.sum((F.col("lang") != "en").cast("bigint")).alias("q"),
    )
    totals = F.broadcast(pv.agg(F.sum("p").alias("np"), F.sum("q").alias("nq")))
    c = bucketed_prefix_sums(pv, "s", ["q"], N_AUC_BUCKETS)
    qb = F.col("cum_q") - F.col("q")
    return (
        c.select("p", "q", qb.alias("qb"))
        .crossJoin(totals)
        .agg(
            (
                F.sum(
                    2 * F.col("p") * F.col("qb") + F.col("p") * F.col("q")
                ).cast("double")
                / (2.0 * F.max("np") * F.max("nq"))
            ).alias("auc"),
            F.max("np").cast("bigint").alias("n_pos"),
            F.max("nq").cast("bigint").alias("n_neg"),
        )
    )


# ------------------------------------------------- calibration by decile


@query(
    "quality_calibration_bins",
    oracle="""
    WITH b AS (
      SELECT
        quantile_cont(n_chars, 0.1) AS b1, quantile_cont(n_chars, 0.2) AS b2,
        quantile_cont(n_chars, 0.3) AS b3, quantile_cont(n_chars, 0.4) AS b4,
        quantile_cont(n_chars, 0.5) AS b5, quantile_cont(n_chars, 0.6) AS b6,
        quantile_cont(n_chars, 0.7) AS b7, quantile_cont(n_chars, 0.8) AS b8,
        quantile_cont(n_chars, 0.9) AS b9
      FROM documents
    )
    SELECT
      CAST(n_chars >= b1 AS INTEGER) + CAST(n_chars >= b2 AS INTEGER)
      + CAST(n_chars >= b3 AS INTEGER) + CAST(n_chars >= b4 AS INTEGER)
      + CAST(n_chars >= b5 AS INTEGER) + CAST(n_chars >= b6 AS INTEGER)
      + CAST(n_chars >= b7 AS INTEGER) + CAST(n_chars >= b8 AS INTEGER)
      + CAST(n_chars >= b9 AS INTEGER) AS bin,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE)
        AS pos_rate,
      CAST(MIN(n_chars) AS BIGINT) AS bin_lo,
      CAST(MAX(n_chars) AS BIGINT) AS bin_hi
    FROM documents CROSS JOIN b
    GROUP BY 1
    """,
)
def quality_calibration_bins(spark, sf_dir):
    """Calibration curve for a score against a binary label (companion
    to quality_score_auc): decile bins of the score with the observed
    positive rate per bin — a well-calibrated scorer shows monotone
    rates; a cliff reveals threshold artifacts. Same plan shape as
    orders_equidepth_histogram: ONE broadcast 1-row decile aggregate
    (F.percentile <-> quantile_cont bit-pairing), bin id = count of
    boundaries passed, one 10-row group-by. Integer counts; one division
    per bin."""
    d = table(spark, sf_dir, "documents")
    b = d.agg(
        *[F.percentile("n_chars", i / 10.0).alias(f"b{i}") for i in range(1, 10)]
    )
    bin_col = sum(
        (F.col("n_chars") >= F.col(f"b{i}")).cast("int") for i in range(1, 10)
    )
    pos = (F.col("lang") == "en").cast("int")
    return (
        d.crossJoin(F.broadcast(b))
        .groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(pos).cast("bigint").alias("n_pos"),
            (F.sum(pos) / F.count(F.lit(1)).cast("double")).alias("pos_rate"),
            F.min("n_chars").cast("bigint").alias("bin_lo"),
            F.max("n_chars").cast("bigint").alias("bin_hi"),
        )
    )


# ------------------------------------------- dow seasonal decomposition


@query(
    "events_seasonal_decomposition",
    oracle="""
    WITH c AS (
      SELECT CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', ts)
                  AS BIGINT) AS d,
        COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    t AS (
      SELECT d, c,
        SUM(c) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
          AS s7,
        COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
          AS n7
      FROM c
    ),
    det AS (
      SELECT CAST((d + 6) % 7 AS INTEGER) AS dow,
        c - CAST(s7 AS DOUBLE) / 7 AS det
      FROM t WHERE n7 = 7
    )
    SELECT dow,
      CAST(SUM(CAST(round(det, 8) AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)
        AS seasonal_index,
      CAST(COUNT(*) AS BIGINT) AS n_days
    FROM det GROUP BY dow
    """,
)
def events_seasonal_decomposition(spark, sf_dir):
    """Classical additive seasonal decomposition of the daily event-count
    series: 7-day centered moving-average trend, detrended residuals,
    then the day-of-week seasonal index (mean residual per weekday,
    Monday=0) — the quantified version of what events_daily_
    autocorrelation only detects. The raw table collapses to the tiny
    day-count aggregate before any window; the centered MA runs over
    that aggregate (hundreds of rows, the documented small-aggregate
    exception to the no-global-window rule). Trend uses the exact
    integer 7-day sum; residuals are rounded then decimal-summed.
    Edge days without a full 7-row window are excluded (n7 = 7)."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy(
        F.datediff("ts", F.lit("1995-01-01")).cast("bigint").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    w7 = W.orderBy("d").rowsBetween(-3, 3)
    t = c.select(
        "d",
        "c",
        F.sum("c").over(w7).alias("s7"),
        F.count(F.lit(1)).over(w7).alias("n7"),
    ).filter(F.col("n7") == 7)
    det = t.select(
        ((F.col("d") + 6) % 7).cast("int").alias("dow"),
        (F.col("c") - F.col("s7").cast("double") / 7).alias("det"),
    )
    contrib = F.round("det", 8).cast("decimal(28,10)")
    return det.groupBy("dow").agg(
        (F.sum(contrib).cast("double") / F.count(F.lit(1))).alias(
            "seasonal_index"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )


# ------------------------------------------------------- churn reporting

CHURN_DAYS = 30


@query(
    "user_churn_report",
    oracle=f"""
    WITH mx AS (SELECT MAX(ts) AS corpus_max FROM events),
    u AS (
      SELECT user_id, COUNT(*) AS n_events, MAX(ts) AS last_ts
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events, last_ts,
      CAST(date_diff('day', CAST(last_ts AS DATE), CAST(corpus_max AS DATE))
           AS BIGINT) AS days_inactive,
      date_diff('day', CAST(last_ts AS DATE), CAST(corpus_max AS DATE))
        > {CHURN_DAYS} AS churned
    FROM u CROSS JOIN mx
    """,
)
def user_churn_report(spark, sf_dir):
    """Per-user churn status: event count, last activity, days inactive
    relative to the corpus high-water mark, and the churned flag
    (> {CHURN_DAYS} days quiet) — the retention denominator feeding
    cohort_retention and events_trailing_wau. One partial-aggregated
    user_id shuffle; the corpus max timestamp is a broadcast 1-row
    aggregate; day arithmetic is pure integers."""
    e = table(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("corpus_max"))
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("ts").alias("last_ts"),
    )
    days = F.datediff("corpus_max", "last_ts").cast("bigint")
    return u.crossJoin(F.broadcast(mx)).select(
        "user_id",
        "n_events",
        "last_ts",
        days.alias("days_inactive"),
        (days > CHURN_DAYS).alias("churned"),
    )


# --------------------------------------- per-source KL divergence (len)

KL_BIN_WIDTH = 50


@query(
    "source_length_kl_divergence",
    oracle=f"""
    WITH b AS (
      SELECT source, CAST(floor(n_chars / {KL_BIN_WIDTH}.0) AS BIGINT) AS bin
      FROM documents
    ),
    sb AS (SELECT source, bin, COUNT(*) AS c FROM b GROUP BY source, bin),
    gb AS (SELECT bin, COUNT(*) AS cg FROM b GROUP BY bin),
    ns AS (SELECT source, COUNT(*) AS n_docs FROM b GROUP BY source),
    tot AS (SELECT COUNT(*) AS nbins, SUM(cg) AS ng FROM gb),
    grid AS (
      SELECT ns.source, ns.n_docs, gb.bin, gb.cg, COALESCE(sb.c, 0) AS c
      FROM ns CROSS JOIN gb
      LEFT JOIN sb ON sb.source = ns.source AND sb.bin = gb.bin
    )
    SELECT source,
      CAST(SUM(CAST(round(
          ((c + 1) / CAST(n_docs + nbins AS DOUBLE))
          * ln(((c + 1) / CAST(n_docs + nbins AS DOUBLE))
               / ((cg + 1) / CAST(ng + nbins AS DOUBLE))), 10)
        AS DECIMAL(28,10))) AS DOUBLE) AS kl_nats,
      CAST(MAX(n_docs) AS BIGINT) AS n_docs
    FROM grid CROSS JOIN tot
    GROUP BY source
    """,
)
def source_length_kl_divergence(spark, sf_dir):
    """KL divergence (nats, Laplace-smoothed) of each source's document-
    length distribution from the corpus-wide distribution — the drift
    screen that flags a feed whose content shape silently changed. Length
    histograms use fixed {KL_BIN_WIDTH}-char bins; the source x bin grid
    (including zero cells, which smoothing makes finite) is a tiny
    broadcast cross of two small aggregates. Contributions are rounded
    then decimal-summed; counts stay exact integers until the two
    smoothing divisions."""
    d = table(spark, sf_dir, "documents")
    b = d.select(
        "source",
        F.floor(F.col("n_chars") / float(KL_BIN_WIDTH)).cast("bigint").alias("bin"),
    )
    sb = b.groupBy("source", "bin").agg(F.count(F.lit(1)).alias("c"))
    gb = b.groupBy("bin").agg(F.count(F.lit(1)).alias("cg"))
    ns = b.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = gb.agg(
        F.count(F.lit(1)).alias("nbins"), F.sum("cg").alias("ng")
    )
    grid = (
        ns.crossJoin(F.broadcast(gb))
        .join(sb, ["source", "bin"], "left")
        .fillna({"c": 0})
        .crossJoin(F.broadcast(tot))
    )
    p = (F.col("c") + 1) / (F.col("n_docs") + F.col("nbins")).cast("double")
    q = (F.col("cg") + 1) / (F.col("ng") + F.col("nbins")).cast("double")
    contrib = F.round(p * F.log(p / q), 10).cast("decimal(28,10)")
    return grid.groupBy("source").agg(
        F.sum(contrib).cast("double").alias("kl_nats"),
        F.max("n_docs").cast("bigint").alias("n_docs"),
    )


# ------------------------------------------------- Welch's two-sample t


@query(
    "ab_test_welch_click_vs_view",
    oracle=f"""
    WITH s AS (
      SELECT
        SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n1,
        SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n2,
        {_d("CASE WHEN event_type = 'click' THEN value ELSE 0 END")} AS s1,
        {_d("CASE WHEN event_type = 'view' THEN value ELSE 0 END")} AS s2,
        {_d("CASE WHEN event_type = 'click' THEN value * value ELSE 0 END")} AS q1,
        {_d("CASE WHEN event_type = 'view' THEN value * value ELSE 0 END")} AS q2
      FROM events WHERE event_type IN ('click', 'view')
    )
    SELECT
      CAST(n1 AS BIGINT) AS n_click,
      CAST(n2 AS BIGINT) AS n_view,
      s1 / n1 AS mean_click,
      s2 / n2 AS mean_view,
      (s1 / n1 - s2 / n2)
        / sqrt(((q1 - s1 * s1 / n1) / (n1 - 1)) / n1
               + ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2) AS t_stat,
      (((q1 - s1 * s1 / n1) / (n1 - 1)) / n1
       + ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2)
      * (((q1 - s1 * s1 / n1) / (n1 - 1)) / n1
         + ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2)
      / ((((q1 - s1 * s1 / n1) / (n1 - 1)) / n1)
         * (((q1 - s1 * s1 / n1) / (n1 - 1)) / n1) / (n1 - 1)
         + (((q2 - s2 * s2 / n2) / (n2 - 1)) / n2)
           * (((q2 - s2 * s2 / n2) / (n2 - 1)) / n2) / (n2 - 1)) AS welch_df
    FROM s
    """,
)
def ab_test_welch_click_vs_view(spark, sf_dir):
    """Welch's unequal-variance two-sample t-test between 'click' and
    'view' event values — the A/B significance readout (t statistic +
    Welch-Satterthwaite degrees of freedom; look up p externally, no
    distribution tables engine-side). ONE pass over the filtered stream:
    conditional counts and decimal-exact sums/squares collapse to a
    single row, and every derived double comes from the same closed-form
    expression tree in both engines — bit-identical with no tolerance."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    is1 = F.col("event_type") == "click"
    val = F.col("value")
    z = F.lit(0.0)
    s = e.agg(
        F.sum(is1.cast("bigint")).alias("n1"),
        F.sum((~is1).cast("bigint")).alias("n2"),
        F.sum(F.when(is1, val).otherwise(z).cast(DEC)).cast("double").alias("s1"),
        F.sum(F.when(~is1, val).otherwise(z).cast(DEC)).cast("double").alias("s2"),
        F.sum(F.when(is1, val * val).otherwise(z).cast(DEC))
        .cast("double")
        .alias("q1"),
        F.sum(F.when(~is1, val * val).otherwise(z).cast(DEC))
        .cast("double")
        .alias("q2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    s1, s2, q1, q2 = F.col("s1"), F.col("s2"), F.col("q1"), F.col("q2")
    v1 = ((q1 - s1 * s1 / n1) / (n1 - 1)) / n1
    v2 = ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2
    return s.select(
        n1.cast("bigint").alias("n_click"),
        n2.cast("bigint").alias("n_view"),
        (s1 / n1).alias("mean_click"),
        (s2 / n2).alias("mean_view"),
        ((s1 / n1 - s2 / n2) / F.sqrt(v1 + v2)).alias("t_stat"),
        (
            (v1 + v2) * (v1 + v2)
            / (v1 * v1 / (n1 - 1) + v2 * v2 / (n2 - 1))
        ).alias("welch_df"),
    )


# --------------------------------------- chi-square independence test


@query(
    "lang_source_chi2",
    oracle="""
    WITH j AS (
      SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY lang, source
    ),
    ml AS (SELECT lang, SUM(o) AS cl FROM j GROUP BY lang),
    ms AS (SELECT source, SUM(o) AS cs FROM j GROUP BY source),
    t AS (SELECT SUM(o) AS n FROM j),
    grid AS (
      SELECT ml.lang, ms.source, ml.cl, ms.cs, COALESCE(j.o, 0) AS o
      FROM ml CROSS JOIN ms
      LEFT JOIN j ON j.lang = ml.lang AND j.source = ms.source
    )
    SELECT
      CAST(SUM(CAST(round(
          (o - (cl * cs) / CAST(n AS DOUBLE))
          * (o - (cl * cs) / CAST(n AS DOUBLE))
          / ((cl * cs) / CAST(n AS DOUBLE)), 10)
        AS DECIMAL(28,10))) AS DOUBLE) AS chi2_stat,
      CAST((COUNT(DISTINCT grid.lang) - 1) * (COUNT(DISTINCT grid.source) - 1)
           AS BIGINT) AS dof,
      CAST(MAX(n) AS BIGINT) AS n_docs
    FROM grid CROSS JOIN t
    """,
)
def lang_source_chi2(spark, sf_dir):
    """Pearson chi-square test of independence between document language
    and source — the frequentist twin of lang_source_mutual_information
    (report both: MI quantifies association strength, chi2/dof gives the
    significance scale). The FULL |langs| x |sources| grid including
    zero-count cells comes from crossing the two marginal aggregates
    (zero cells still contribute (0-e)^2/e); per-cell contributions are
    rounded then decimal-summed. Expected counts keep the exact integer
    product cl*cs until one division by n."""
    d = table(spark, sf_dir, "documents")
    j = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    ml = j.groupBy("lang").agg(F.sum("o").alias("cl"))
    ms = j.groupBy("source").agg(F.sum("o").alias("cs"))
    t = j.agg(F.sum("o").alias("n"))
    grid = (
        ml.crossJoin(F.broadcast(ms))
        .join(j, ["lang", "source"], "left")
        .fillna({"o": 0})
        .crossJoin(F.broadcast(t))
    )
    e_cnt = (F.col("cl") * F.col("cs")) / F.col("n").cast("double")
    contrib = F.round(
        (F.col("o") - e_cnt) * (F.col("o") - e_cnt) / e_cnt, 10
    ).cast("decimal(28,10)")
    return grid.agg(
        F.sum(contrib).cast("double").alias("chi2_stat"),
        (
            (F.count_distinct(F.col("lang")) - 1)
            * (F.count_distinct(F.col("source")) - 1)
        )
        .cast("bigint")
        .alias("dof"),
        F.max("n").cast("bigint").alias("n_docs"),
    )


# ------------------------------------------- numeric correlation matrix

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_oracle() -> str:
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    sums = ",\n        ".join(
        f"{_d(c)} AS s_{c}, {_d(f'{c} * {c}')} AS q_{c}" for c in _CORR_COLS
    )
    cross = ",\n        ".join(
        f"{_d(f'{a} * {b}')} AS x_{a}_{b}" for a, b in pairs
    )
    sel = "\n      UNION ALL\n".join(
        f"""      SELECT '{a}' AS col_x, '{b}' AS col_y,
        round((n * x_{a}_{b} - s_{a} * s_{b})
          / sqrt((n * q_{a} - s_{a} * s_{a}) * (n * q_{b} - s_{b} * s_{b})), 8)
          AS pearson_r FROM s"""
        for a, b in pairs
    )
    return f"""
    WITH s AS (
      SELECT COUNT(*) AS n,
        {sums},
        {cross}
      FROM lineitem
    )
{sel}
    """


@query("lineitem_corr_matrix", oracle=_corr_oracle())
def lineitem_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation matrix over lineitem's numeric
    columns (quantity, extendedprice, discount, tax) — the feature-
    redundancy screen run before any modeling on tabular features. ONE
    scan computes every decimal-exact moment (sums, squares, cross
    products) in a single 1-row aggregate; the 6 upper-triangle
    correlations then unfold from that row with stack() — no second pass,
    no per-pair shuffle. The closed form (n*Sxy - SxSy)/sqrt(...) sees
    bit-identical inputs in both engines; the final r is rounded to 8
    decimals (sqrt-of-product ulp parity).

    The 15 wide-decimal moment sums are the whole cost, and a
    single-row-group input plans them into a ONE-TASK scan stage; the
    pruned 4-column input is fanned out first (scale-adaptive: identity
    on an already-parallel scan) so the partial aggregation runs on
    every core."""
    li = fanout(
        table(spark, sf_dir, "lineitem").select(*_CORR_COLS),
        "l_extendedprice",
    )
    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
    ]
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(F.col(c).cast(DEC)).cast("double").alias(f"s_{c}"))
        aggs.append(
            F.sum((F.col(c) * F.col(c)).cast(DEC)).cast("double").alias(f"q_{c}")
        )
    for a, b in pairs:
        aggs.append(
            F.sum((F.col(a) * F.col(b)).cast(DEC))
            .cast("double")
            .alias(f"x_{a}_{b}")
        )
    s = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', round((n * x_{a}_{b} - s_{a} * s_{b}) / "
        f"sqrt((n * q_{a} - s_{a} * s_{a}) * (n * q_{b} - s_{b} * s_{b})), 8)"
        for a, b in pairs
    )
    return s.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (col_x, col_y, pearson_r)"
    )


# ------------------------------------------------- Theil-Sen robust trend


@query(
    "events_theil_sen_trend",
    oracle="""
    WITH c AS (
      SELECT CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', ts)
                  AS BIGINT) AS d,
        COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    p AS (
      SELECT (b.c - a.c) / CAST(b.d - a.d AS DOUBLE) AS slope
      FROM c a JOIN c b ON b.d > a.d
    ),
    m AS (SELECT quantile_cont(slope, 0.5) AS ts_slope, COUNT(*) AS n_pairs
          FROM p)
    SELECT ts_slope,
      (SELECT quantile_cont(c - ts_slope * d, 0.5) FROM c) AS ts_intercept,
      CAST(n_pairs AS BIGINT) AS n_pairs
    FROM m
    """,
)
def events_theil_sen_trend(spark, sf_dir):
    """Theil-Sen robust trend of the daily event-count series: the MEDIAN
    of all pairwise slopes (up to ~29% of days can be corrupted — deploy
    spikes, outages — without moving the estimate, where least-squares
    (events_user_trend's closed form) chases every outlier). The O(days^2)
    pair set is generated AFTER collapsing the corpus to the tiny
    day-count aggregate — bounded by calendar length (even 30 years is
    ~10^8 pairs spread across the cluster), never by event volume. Medians
    use the exact-percentile pairing; slopes are exact-int differences
    with one division each."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy(
        F.datediff("ts", F.lit("1995-01-01")).cast("bigint").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    a = c.select(F.col("d").alias("da"), F.col("c").alias("ca"))
    b = c.select(F.col("d").alias("db"), F.col("c").alias("cb"))
    p = a.join(b, F.col("db") > F.col("da")).select(
        ((F.col("cb") - F.col("ca")) / (F.col("db") - F.col("da")).cast("double"))
        .alias("slope")
    )
    m = F.broadcast(
        p.agg(
            F.percentile("slope", 0.5).alias("ts_slope"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )
    return (
        c.crossJoin(m)
        .agg(
            F.first("ts_slope").alias("ts_slope"),
            F.percentile(
                F.col("c") - F.col("ts_slope") * F.col("d"), 0.5
            ).alias("ts_intercept"),
            F.first("n_pairs").alias("n_pairs"),
        )
    )


# --------------------------------------------------- Hill tail estimator

HILL_K = 100


@query(
    "order_value_hill_tail_index",
    oracle=f"""
    WITH topk AS (
      SELECT o_totalprice AS x FROM orders
      ORDER BY o_totalprice DESC LIMIT {HILL_K}
    ),
    mn AS (SELECT MIN(x) AS xk FROM topk)
    SELECT
      CAST(SUM(CAST(round(ln(x / xk), 10) AS DECIMAL(28,10))) AS DOUBLE)
        / ({HILL_K} - 1) AS hill_xi,
      ({HILL_K} - 1)
        / CAST(SUM(CAST(round(ln(x / xk), 10) AS DECIMAL(28,10))) AS DOUBLE)
        AS tail_alpha,
      CAST(COUNT(*) AS BIGINT) AS k,
      MAX(xk) AS x_k
    FROM topk CROSS JOIN mn
    """,
)
def order_value_hill_tail_index(spark, sf_dir):
    """Hill estimator of the right-tail index of order values over the
    top k={HILL_K} order statistics — the heavy-tail diagnostic that
    decides whether mean-based capacity planning is even meaningful
    (alpha <= 2: infinite variance, use quantiles). xi = mean ln(x_i/x_k);
    rows TIED with x_k contribute ln(1)=0, so the estimate depends only
    on the top-k VALUE multiset, which is deterministic under ties even
    though row identity isn't. Top-k compiles to TakeOrderedAndProject;
    the minimum broadcasts back over the k rows; log contributions are
    rounded then decimal-summed."""
    o = table(spark, sf_dir, "orders")
    topk = (
        o.select(F.col("o_totalprice").alias("x"))
        .orderBy(F.col("x").desc())
        .limit(HILL_K)
    )
    mn = F.broadcast(topk.agg(F.min("x").alias("xk")))
    contrib = F.round(F.log(F.col("x") / F.col("xk")), 10).cast(
        "decimal(28,10)"
    )
    s = F.sum(contrib).cast("double")
    return topk.crossJoin(mn).agg(
        (s / (HILL_K - 1)).alias("hill_xi"),
        ((HILL_K - 1) / s).alias("tail_alpha"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.max("xk").alias("x_k"),
    )


# ---------------------------------------------- daily percentile bands


@query(
    "events_daily_percentile_bands",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      quantile_cont(value, 0.1) AS p10,
      quantile_cont(value, 0.5) AS p50,
      quantile_cont(value, 0.9) AS p90
    FROM events GROUP BY 1
    """,
)
def events_daily_percentile_bands(spark, sf_dir):
    """Daily p10/p50/p90 bands of the event value — the operations
    dashboard series behind anomaly triage (a day whose p90 jumps while
    p50 holds = tail regression, not a level shift). One partial-
    aggregated shuffle onto days; exact percentiles per group (the
    F.percentile <-> quantile_cont bit-pairing). At 100 TB with years of
    days this stays a group-by, never a global window; swap in
    percentile_approx when exactness isn't contractual."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.percentile("value", 0.1).alias("p10"),
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.9).alias("p90"),
    )


# --------------------------------------- population stability index

PSI_SPLIT = "1998-07-01"


@query(
    "orders_psi_first_vs_second_half",
    oracle=f"""
    WITH ref AS (
      SELECT o_totalprice AS x FROM orders
      WHERE o_orderdate < TIMESTAMP '{PSI_SPLIT} 00:00:00'
    ),
    cur AS (
      SELECT o_totalprice AS x FROM orders
      WHERE o_orderdate >= TIMESTAMP '{PSI_SPLIT} 00:00:00'
    ),
    b AS (
      SELECT
        quantile_cont(x, 0.1) AS b1, quantile_cont(x, 0.2) AS b2,
        quantile_cont(x, 0.3) AS b3, quantile_cont(x, 0.4) AS b4,
        quantile_cont(x, 0.5) AS b5, quantile_cont(x, 0.6) AS b6,
        quantile_cont(x, 0.7) AS b7, quantile_cont(x, 0.8) AS b8,
        quantile_cont(x, 0.9) AS b9
      FROM ref
    ),
    rb AS (
      SELECT CAST(x >= b1 AS INTEGER) + CAST(x >= b2 AS INTEGER)
        + CAST(x >= b3 AS INTEGER) + CAST(x >= b4 AS INTEGER)
        + CAST(x >= b5 AS INTEGER) + CAST(x >= b6 AS INTEGER)
        + CAST(x >= b7 AS INTEGER) + CAST(x >= b8 AS INTEGER)
        + CAST(x >= b9 AS INTEGER) AS bin, COUNT(*) AS cr
      FROM ref CROSS JOIN b GROUP BY 1
    ),
    cb AS (
      SELECT CAST(x >= b1 AS INTEGER) + CAST(x >= b2 AS INTEGER)
        + CAST(x >= b3 AS INTEGER) + CAST(x >= b4 AS INTEGER)
        + CAST(x >= b5 AS INTEGER) + CAST(x >= b6 AS INTEGER)
        + CAST(x >= b7 AS INTEGER) + CAST(x >= b8 AS INTEGER)
        + CAST(x >= b9 AS INTEGER) AS bin, COUNT(*) AS cc
      FROM cur CROSS JOIN b GROUP BY 1
    ),
    t AS (
      SELECT (SELECT SUM(cr) FROM rb) AS nr, (SELECT SUM(cc) FROM cb) AS nc
    ),
    g AS (
      SELECT rb.bin, rb.cr, COALESCE(cb.cc, 0) AS cc
      FROM rb LEFT JOIN cb USING (bin)
    )
    SELECT
      CAST(SUM(CAST(round(
          ((cr + 1) / CAST(nr + 10 AS DOUBLE)
           - (cc + 1) / CAST(nc + 10 AS DOUBLE))
          * ln(((cr + 1) / CAST(nr + 10 AS DOUBLE))
               / ((cc + 1) / CAST(nc + 10 AS DOUBLE))), 10)
        AS DECIMAL(28,10))) AS DOUBLE) AS psi,
      CAST(MAX(nr) AS BIGINT) AS n_ref,
      CAST(MAX(nc) AS BIGINT) AS n_cur
    FROM g CROSS JOIN t
    """,
)
def orders_psi_first_vs_second_half(spark, sf_dir):
    """Population Stability Index of the order-value distribution, second
    half of the history scored against decile bins fitted on the FIRST
    half — the standard model-monitoring drift number (rule of thumb:
    psi > 0.25 = retrain). Reference deciles are one broadcast 1-row
    aggregate; both periods bin with the same boundaries-passed
    expression; (p-q)ln(p/q) contributions are Laplace-smoothed (zero
    bins stay finite), rounded, and decimal-summed. Scale shape: two
    scans + two 10-row group-bys."""
    o = table(spark, sf_dir, "orders")
    split = F.lit(PSI_SPLIT).cast("timestamp")
    ref = o.filter(F.col("o_orderdate") < split).select(
        F.col("o_totalprice").alias("x")
    )
    cur = o.filter(F.col("o_orderdate") >= split).select(
        F.col("o_totalprice").alias("x")
    )
    b = ref.agg(
        *[F.percentile("x", i / 10.0).alias(f"b{i}") for i in range(1, 10)]
    )
    bin_col = sum((F.col("x") >= F.col(f"b{i}")).cast("int") for i in range(1, 10))
    rb = (
        ref.crossJoin(F.broadcast(b))
        .groupBy(bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cr"))
    )
    cb = (
        cur.crossJoin(F.broadcast(b))
        .groupBy(bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cc"))
    )
    t = F.broadcast(
        rb.agg(F.sum("cr").alias("nr")).crossJoin(
            cb.agg(F.sum("cc").alias("nc"))
        )
    )
    g = rb.join(cb, "bin", "left").fillna({"cc": 0}).crossJoin(t)
    p = (F.col("cr") + 1) / (F.col("nr") + 10).cast("double")
    q = (F.col("cc") + 1) / (F.col("nc") + 10).cast("double")
    contrib = F.round((p - q) * F.log(p / q), 10).cast("decimal(28,10)")
    return g.agg(
        F.sum(contrib).cast("double").alias("psi"),
        F.max("nr").cast("bigint").alias("n_ref"),
        F.max("nc").cast("bigint").alias("n_cur"),
    )


# --------------------------------------------------- cohort LTV curve


@query(
    "cohort_ltv_curve",
    oracle=f"""
    WITH first_order AS (
      SELECT o_custkey,
        MIN(year(o_orderdate) * 12 + month(o_orderdate)) AS cm
      FROM orders GROUP BY o_custkey
    ),
    x AS (
      SELECT f.cm,
        (year(o.o_orderdate) * 12 + month(o.o_orderdate)) - f.cm AS offset_m,
        o.o_totalprice AS rev
      FROM orders o JOIN first_order f ON f.o_custkey = o.o_custkey
    ),
    m AS (
      SELECT cm, offset_m, {_d('rev')} AS revenue, COUNT(*) AS n_orders
      FROM x GROUP BY cm, offset_m
    )
    SELECT
      CAST(make_timestamp((cm - 1) // 12, (cm - 1) % 12 + 1, 1, 0, 0, 0.0)
           AS TIMESTAMP) AS cohort_month,
      CAST(offset_m AS INTEGER) AS offset_m,
      CAST(SUM(CAST(revenue AS DECIMAL(28,6))) OVER (
        PARTITION BY cm ORDER BY offset_m) AS DOUBLE) AS cum_revenue,
      CAST(n_orders AS BIGINT) AS n_orders
    FROM m
    """,
)
def cohort_ltv_curve(spark, sf_dir):
    """Cohort lifetime-value curves: for each first-purchase cohort month,
    cumulative revenue by months-since-first-purchase — the curve whose
    flattening point prices acquisition (companion to cohort_retention's
    headcount view). Month arithmetic is pure integers (year*12+month) on
    both engines; per-cell revenue is a decimal-exact sum and the
    cumulative window (partitioned by cohort, over the tiny cohort x
    offset aggregate) re-sums those exact decimals, so every point on
    the curve is bit-stable. Two shuffles: first-order lookup join +
    cell aggregation."""
    o = table(spark, sf_dir, "orders")
    om = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("om")
    first = o.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("cm")
    )
    x = o.select("o_custkey", om, F.col("o_totalprice").alias("rev")).join(
        first, "o_custkey"
    )
    m = x.groupBy(
        "cm", (F.col("om") - F.col("cm")).alias("offset_m")
    ).agg(
        F.sum(F.col("rev").cast(DEC)).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = W.partitionBy("cm").orderBy("offset_m")
    cohort_ts = F.make_timestamp(
        ((F.col("cm") - 1) / 12).cast("int").cast("int"),
        ((F.col("cm") - 1) % 12 + 1).cast("int"),
        F.lit(1), F.lit(0), F.lit(0), F.lit(0),
    )
    return m.select(
        cohort_ts.cast("timestamp").alias("cohort_month"),
        F.col("offset_m").cast("int").alias("offset_m"),
        F.sum(F.col("revenue").cast(DEC)).over(w).cast("double").alias(
            "cum_revenue"
        ),
        F.col("n_orders").cast("bigint").alias("n_orders"),
    )


# ------------------------------------------------ event-type trigrams

TRIGRAM_TOPK = 20


@query(
    "top_event_trigrams",
    oracle=f"""
    WITH s AS (
      SELECT
        lag(event_type, 2) OVER w AS t1,
        lag(event_type, 1) OVER w AS t2,
        event_type AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
    FROM s WHERE t1 IS NOT NULL
    GROUP BY t1, t2, t3
    ORDER BY n DESC, t1, t2, t3
    LIMIT {TRIGRAM_TOPK}
    """,
)
def top_event_trigrams(spark, sf_dir):
    """Most frequent 3-step behavioral paths (event-type trigrams per
    user) — the second-order sequel to events_markov_transitions that
    surfaces actual funnels rather than one-step hops. Two lags share
    ONE per-user window sort; counting is a partial-aggregated shuffle
    on the (t1,t2,t3) triple; top-k with full lexicographic tiebreak."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        F.lag("event_type", 2).over(w).alias("t1"),
        F.lag("event_type", 1).over(w).alias("t2"),
        F.col("event_type").alias("t3"),
    ).filter(F.col("t1").isNotNull())
    return (
        s.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "t1", "t2", "t3")
        .limit(TRIGRAM_TOPK)
    )


# ------------------------------------------- peak concurrency sweep

CONC_GAP_MIN = 30
N_SWEEP_BUCKETS = 16


@query(
    "peak_concurrent_sessions",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts,
        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  IS NULL
          OR epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id))
             > {CONC_GAP_MIN} * 60 * 1000000
        THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    sess AS (
      SELECT user_id, sid, MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM (
        SELECT user_id, ts,
          SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
        FROM g
      ) GROUP BY user_id, sid
    ),
    pts AS (
      SELECT epoch_us(s_start) AS t, 1 AS delta FROM sess
      UNION ALL
      SELECT epoch_us(s_end) AS t, -1 AS delta FROM sess
    ),
    c AS (
      SELECT t, SUM(delta) OVER (ORDER BY t, delta DESC
                                 ROWS UNBOUNDED PRECEDING) AS conc
      FROM pts
    )
    SELECT CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
      CAST(min_by(t, CASE WHEN conc = (SELECT MAX(conc) FROM c)
                          THEN t END) AS BIGINT) AS peak_at_us,
      CAST((SELECT COUNT(*) FROM sess) AS BIGINT) AS n_sessions
    FROM c
    """,
)
def peak_concurrent_sessions(spark, sf_dir):
    """Peak number of simultaneously open sessions (30-min-gap
    sessionization) and when it happened — the capacity-planning number.
    Classic sweep line: sessions become +1/-1 boundary points, the
    running sum over time order is the live concurrency, its max is the
    peak. The running sum uses the bucketed prefix-sum kernel (pure-
    function time buckets from the broadcast min/max, per-bucket offsets,
    parallel in-bucket windows) — the same no-single-reducer shape as
    ks_test_click_vs_view, with +1 ordered before -1 at timestamp ties
    (touching sessions count as overlapping)."""
    e = table(spark, sf_dir, "events")
    gap_us = CONC_GAP_MIN * 60 * 1_000_000
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    g = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(wu).isNull()
            | (us - F.unix_micros(F.lag("ts").over(wu)) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = (
        g.select(
            "user_id",
            "ts",
            F.sum("new_s")
            .over(wu.rowsBetween(W.unboundedPreceding, 0))
            .alias("sid"),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    pts = sess.select(
        F.unix_micros("s_start").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        sess.select(F.unix_micros("s_end").alias("t"), F.lit(-1).alias("delta"))
    )
    n_sess = F.broadcast(sess.agg(F.count(F.lit(1)).alias("n_sessions")))
    c = bucketed_prefix_sums(
        pts, "t", ["delta"], N_SWEEP_BUCKETS, tiebreak_desc="delta"
    ).select("t", F.col("cum_delta").alias("conc"))
    peak = F.broadcast(c.agg(F.max("conc").alias("peak")))
    return (
        c.crossJoin(peak)
        .crossJoin(n_sess)
        .agg(
            F.max("peak").cast("bigint").alias("peak_concurrency"),
            F.min(F.when(F.col("conc") == F.col("peak"), F.col("t")))
            .cast("bigint")
            .alias("peak_at_us"),
            F.max("n_sessions").cast("bigint").alias("n_sessions"),
        )
    )


# ----------------------------------------------- min-max feature scaling


@query(
    "minmax_scale_value_by_type",
    oracle="""
    WITH st AS (
      SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type,
      (value - lo) / (hi - lo) AS value_scaled
    FROM events e JOIN st USING (event_type)
    WHERE hi > lo
    """,
)
def minmax_scale_value_by_type(spark, sf_dir):
    """Per-group min-max feature scaling to [0,1] — the normalization
    map applied before mixing heterogeneous feature columns. Group
    extrema come from one partial-aggregated shuffle and BROADCAST back
    onto the stream (never a window over the fact table); min/max are
    order-free exact selections, so the one affine transform per row is
    engine-identical. Degenerate constant groups are excluded."""
    e = table(spark, sf_dir, "events")
    st = e.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    return (
        e.join(F.broadcast(st), "event_type")
        .filter(F.col("hi") > F.col("lo"))
        .select(
            "event_id",
            "event_type",
            ((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo"))).alias(
                "value_scaled"
            ),
        )
    )


# ----------------------------- exact global percentiles, no global sort


@query(
    "global_percentiles_no_sort",
    oracle="""
    SELECT quantile_cont(value, 0.5) AS p50,
      quantile_cont(value, 0.9) AS p90,
      quantile_cont(value, 0.99) AS p99,
      CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    """,
)
def global_percentiles_no_sort(spark, sf_dir):
    """EXACT corpus-wide percentiles computed as distributed order-
    statistic selection — the scale path where F.percentile (which packs
    the whole column into one aggregation buffer) stops being an option.
    Value frequencies collapse to one distinct-value table; the bucketed
    prefix-sum kernel turns them into ranks in parallel; each target
    quantile then selects its two bracketing order statistics with
    conditional MINs and interpolates as lo*(1-frac) + hi*frac —
    quantile_cont's exact arithmetic (NOT lo + (hi-lo)*frac, which
    rounds differently in the last ulp). Matches DuckDB's quantile_cont bit-for-bit with
    no single-reducer sort anywhere (the only global window is over
    n_buckets rows inside the kernel)."""
    e = table(spark, sf_dir, "events")
    pv = e.groupBy("value").agg(F.count(F.lit(1)).alias("c"))
    tot = F.broadcast(pv.agg(F.sum("c").alias("n")))
    cum = bucketed_prefix_sums(pv, "value", ["c"]).crossJoin(tot)
    aggs = [F.max("n").cast("bigint").alias("n")]
    outs = []
    for tag, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        pos = (F.col("n") - 1) * F.lit(q)
        k = F.floor(pos)
        frac = pos - k
        lo = F.min(F.when(F.col("cum_c") >= k + 1, F.col("value")))
        hi = F.min(F.when(F.col("cum_c") >= k + 2, F.col("value")))
        aggs += [
            lo.alias(f"_lo_{tag}"),
            hi.alias(f"_hi_{tag}"),
            F.max(frac).alias(f"_f_{tag}"),
        ]
        outs.append(
            (
                F.col(f"_lo_{tag}") * (1 - F.col(f"_f_{tag}"))
                + F.coalesce(f"_hi_{tag}", f"_lo_{tag}") * F.col(f"_f_{tag}")
            ).alias(tag)
        )
    return cum.agg(*aggs).select(*outs, "n")


# --------------------------------------------- session duration stats


@query(
    "session_duration_stats",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts, event_id,
        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  IS NULL
          OR epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id))
             > {CONC_GAP_MIN} * 60 * 1000000
        THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    sess AS (
      SELECT user_id, sid,
        epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us,
        COUNT(*) AS n_events
      FROM (
        SELECT user_id, ts,
          SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
        FROM g
      ) GROUP BY user_id, sid
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
      CAST(SUM(dur_us) AS DOUBLE) / COUNT(*) / 1000000.0 AS mean_duration_s,
      quantile_cont(dur_us, 0.5) / 1000000.0 AS p50_s,
      quantile_cont(dur_us, 0.9) / 1000000.0 AS p90_s,
      CAST(MAX(dur_us) AS DOUBLE) / 1000000.0 AS max_s,
      CAST(SUM(n_events) AS BIGINT) AS n_events
    FROM sess
    """,
)
def session_duration_stats(spark, sf_dir):
    """Session-length distribution under the same 30-min-gap
    sessionization as peak_concurrent_sessions: count, mean, p50/p90 and
    max durations — the engagement summary next to sessionize_events'
    per-session rows. Durations are exact integer microseconds until the
    final /1e6 renders; mean divides an exact bigint sum. The session
    table is orders of magnitude smaller than events; its exact
    percentiles use F.percentile here (single aggregation buffer over
    sessions) — for billions of sessions swap in the
    global_percentiles_no_sort kernel shape unchanged."""
    e = table(spark, sf_dir, "events")
    gap_us = CONC_GAP_MIN * 60 * 1_000_000
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    g = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(wu).isNull()
            | (us - F.unix_micros(F.lag("ts").over(wu)) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = (
        g.select(
            "user_id",
            "ts",
            F.sum("new_s")
            .over(wu.rowsBetween(W.unboundedPreceding, 0))
            .alias("sid"),
        )
        .groupBy("user_id", "sid")
        .agg(
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "dur_us"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return sess.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        (
            F.sum("dur_us").cast("double") / F.count(F.lit(1)) / 1_000_000.0
        ).alias("mean_duration_s"),
        (F.percentile("dur_us", 0.5) / 1_000_000.0).alias("p50_s"),
        (F.percentile("dur_us", 0.9) / 1_000_000.0).alias("p90_s"),
        (F.max("dur_us").cast("double") / 1_000_000.0).alias("max_s"),
        F.sum("n_events").cast("bigint").alias("n_events"),
    )


# ------------------------------------------ shingle sharing coverage

SHINGLE_N = 8


@query(
    "doc_shingle_dup_coverage",
    oracle=f"""
    WITH ds AS (
      SELECT DISTINCT doc_id,
        md5(array_to_string(w[i:i + {SHINGLE_N - 1}], ' ')) AS sh
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
            FROM documents),
        UNNEST(generate_series(1, len(w) - {SHINGLE_N - 1})) AS u(i)
    ),
    df AS (SELECT sh, COUNT(*) AS n_docs_sh FROM ds GROUP BY sh),
    t AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT
      CAST(MAX(n_docs) AS BIGINT) AS n_docs,
      CAST(COUNT(DISTINCT CASE WHEN n_docs_sh > 1 THEN doc_id END) AS BIGINT)
        AS docs_with_shared_shingle,
      COUNT(DISTINCT CASE WHEN n_docs_sh > 1 THEN doc_id END)
        / CAST(MAX(n_docs) AS DOUBLE) AS coverage_frac,
      CAST(SUM(CASE WHEN n_docs_sh > 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_shared_shingle_slots
    FROM ds JOIN df USING (sh) CROSS JOIN t
    """,
)
def doc_shingle_dup_coverage(spark, sf_dir):
    """Corpus near-duplication pressure gauge: what fraction of documents
    share at least one {SHINGLE_N}-word shingle with another document —
    the single number that decides whether running the full MinHash
    pipeline is worth it, and the denominator for its recall. Shingles
    move as md5 keys (16 bytes, never text); document-frequency is one
    shuffle over distinct (doc, shingle) pairs; the final report is a
    1-row rollup."""
    d = table(spark, sf_dir, "documents")
    ds = (
        d.select(F.col("doc_id"), F.split(F.lower("text"), " ").alias("w"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"CASE WHEN size(w) >= {SHINGLE_N} THEN "
                    f"transform(sequence(1, size(w) - {SHINGLE_N - 1}), "
                    f"i -> md5(array_join(slice(w, i, {SHINGLE_N}), ' '))) "
                    f"ELSE array() END"
                )
            ).alias("sh"),
        )
        .distinct()
    )
    df_ = ds.groupBy("sh").agg(F.count(F.lit(1)).alias("n_docs_sh"))
    t = F.broadcast(d.agg(F.count(F.lit(1)).alias("n_docs")))
    shared_doc = F.when(F.col("n_docs_sh") > 1, F.col("doc_id"))
    return (
        ds.join(df_, "sh")
        .crossJoin(t)
        .agg(
            F.max("n_docs").cast("bigint").alias("n_docs"),
            F.count_distinct(shared_doc)
            .cast("bigint")
            .alias("docs_with_shared_shingle"),
            (
                F.count_distinct(shared_doc) / F.max("n_docs").cast("double")
            ).alias("coverage_frac"),
            F.sum((F.col("n_docs_sh") > 1).cast("int"))
            .cast("bigint")
            .alias("n_shared_shingle_slots"),
        )
    )


# ------------------------------------------------- event-rate spikes


@query(
    "events_rate_spikes",
    oracle=f"""
    WITH c AS (
      SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
        COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    st AS (
      SELECT COUNT(*) AS n,
        CAST(SUM(c) AS DOUBLE) / COUNT(*) AS mu,
        sqrt((CAST(SUM(c * c) AS DOUBLE)
              - CAST(SUM(c) AS DOUBLE) * SUM(c) / COUNT(*))
             / (COUNT(*) - 1)) AS sigma
      FROM c
    )
    SELECT minute, CAST(c AS BIGINT) AS n_events,
      (c - mu) / sigma AS z
    FROM c CROSS JOIN st
    WHERE sigma > 0 AND (c - mu) / sigma > 3.0
    """,
)
def events_rate_spikes(spark, sf_dir):
    """Traffic burst detection: minutes whose event RATE sits more than
    3 sigma above the per-minute mean — the volume-anomaly complement to
    the value-anomaly detectors (events_zscore_anomalies watches what
    events say; this watches how many arrive). The raw stream collapses
    to minute counts first (one partial-aggregated shuffle); mean/sigma
    assemble from exact integer count sums in a broadcast 1-row
    aggregate; one filter pass flags the spikes."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy(F.date_trunc("minute", "ts").alias("minute")).agg(
        F.count(F.lit(1)).alias("c")
    )
    n = F.count(F.lit(1))
    sc = F.sum("c").cast("double")
    sc2 = F.sum(F.col("c") * F.col("c")).cast("double")
    st = c.agg(
        (sc / n).alias("mu"),
        F.sqrt((sc2 - sc * F.sum("c") / n) / (n - 1)).alias("sigma"),
    )
    z = (F.col("c") - F.col("mu")) / F.col("sigma")
    return (
        c.crossJoin(F.broadcast(st))
        .filter((F.col("sigma") > 0) & (z > 3.0))
        .select("minute", F.col("c").cast("bigint").alias("n_events"), z.alias("z"))
    )


# -------------------------------------------- market concentration (HHI)


@query(
    "parttype_supplier_hhi",
    oracle=f"""
    WITH rev AS (
      SELECT p.p_type, l.l_suppkey, {_d('l.l_extendedprice')} AS r
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_type, l.l_suppkey
    ),
    tot AS (
      SELECT p_type, CAST(SUM(CAST(r AS DECIMAL(28,6))) AS DOUBLE) AS t,
        COUNT(*) AS n_suppliers
      FROM rev GROUP BY p_type
    )
    SELECT rev.p_type,
      CAST(SUM(CAST(round((r / t) * (r / t), 10) AS DECIMAL(28,10)))
           AS DOUBLE) AS hhi,
      CAST(MAX(n_suppliers) AS BIGINT) AS n_suppliers,
      MAX(t) AS total_revenue
    FROM rev JOIN tot USING (p_type)
    GROUP BY rev.p_type
    """,
)
def parttype_supplier_hhi(spark, sf_dir):
    """Herfindahl-Hirschman concentration index of supplier revenue
    within each part type — the supply-chain-risk twin of
    order_value_gini (HHI > 0.25 = concentrated: one supplier failure
    takes out the category). Revenue cells are decimal-exact sums; group
    totals re-sum those decimals so shares divide exact numbers; share^2
    contributions are rounded then decimal-summed. The part dimension
    broadcasts onto lineitem; two partial-aggregated shuffles total."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("r"))
    )
    tot = rev.groupBy("p_type").agg(
        F.sum(F.col("r").cast(DEC)).cast("double").alias("t"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    share = F.col("r") / F.col("t")
    contrib = F.round(share * share, 10).cast("decimal(28,10)")
    return (
        rev.join(F.broadcast(tot), "p_type")
        .groupBy("p_type")
        .agg(
            F.sum(contrib).cast("double").alias("hhi"),
            F.max("n_suppliers").cast("bigint").alias("n_suppliers"),
            F.max("t").alias("total_revenue"),
        )
    )


# ------------------------------------------------ burstiness by type


@query(
    "events_burstiness_by_type",
    oracle="""
    WITH g AS (
      SELECT event_type,
        epoch_us(ts) - epoch_us(lag(ts) OVER (
          PARTITION BY event_type ORDER BY ts, event_id)) AS gap
      FROM events
    ),
    s AS (
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(gap) AS BIGINT) AS sg,
        CAST(SUM(CAST(gap AS DECIMAL(38,0)) * CAST(gap AS DECIMAL(38,0)))
             AS DOUBLE) AS sg2
      FROM g WHERE gap IS NOT NULL GROUP BY event_type
    )
    SELECT event_type,
      CAST(n AS BIGINT) AS n_gaps,
      CAST(sg AS DOUBLE) / n / 1000000.0 AS mean_gap_s,
      sqrt((sg2 - CAST(sg AS DOUBLE) * sg / n) / (n - 1))
        / (CAST(sg AS DOUBLE) / n) AS cv,
      (sqrt((sg2 - CAST(sg AS DOUBLE) * sg / n) / (n - 1))
       - CAST(sg AS DOUBLE) / n)
      / (sqrt((sg2 - CAST(sg AS DOUBLE) * sg / n) / (n - 1))
         + CAST(sg AS DOUBLE) / n) AS burstiness
    FROM s WHERE n >= 2
    """,
)
def events_burstiness_by_type(spark, sf_dir):
    """Interarrival burstiness per event type: coefficient of variation
    of the gaps and the Goh-Barabasi burstiness index B =
    (sigma-mu)/(sigma+mu) — B ~ 0 is Poisson traffic, B -> 1 is bursty
    (retry storms, batch jobs behind a user-shaped event type), B < 0 is
    pacemaker-regular. Gaps are exact integer microseconds from one
    per-type lag window; the first moment is an exact int64 sum and the
    second moment is an exact DECIMAL(38,0) sum (microsecond gaps square
    past int64 — the functions/exact.py recipe, wide enough for
    century-scale gaps), so both engines feed sqrt identical doubles.
    One shuffle."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    g = e.select("event_type", gap.alias("gap")).filter(
        F.col("gap").isNotNull()
    )
    s = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap").cast("bigint").alias("sg"),
        F.sum(
            F.col("gap").cast("decimal(38,0)")
            * F.col("gap").cast("decimal(38,0)")
        )
        .cast("double")
        .alias("sg2"),
    )
    n, sg, sg2 = F.col("n"), F.col("sg"), F.col("sg2")
    mu = sg.cast("double") / n
    sigma = F.sqrt((sg2 - sg.cast("double") * sg / n) / (n - 1))
    return s.filter(n >= 2).select(
        "event_type",
        n.cast("bigint").alias("n_gaps"),
        (mu / 1_000_000.0).alias("mean_gap_s"),
        (sigma / mu).alias("cv"),
        ((sigma - mu) / (sigma + mu)).alias("burstiness"),
    )


# --------------------------------------------- daily composition share


@query(
    "events_type_share_daily",
    oracle="""
    WITH c AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
        COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT day, SUM(n) AS tot FROM c GROUP BY day)
    SELECT c.day, c.event_type,
      CAST(n AS BIGINT) AS n_events,
      n / CAST(tot AS DOUBLE) AS share
    FROM c JOIN t USING (day)
    """,
)
def events_type_share_daily(spark, sf_dir):
    """Daily event-type composition shares — the stacked-area dashboard
    series, and the input a composition-drift monitor diffs day-over-day
    (a feed silently dropping one event type shows up here first). One
    (day, type) aggregate; day totals rejoin as a broadcast; integer
    counts with one division per cell."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy(
        F.date_trunc("day", "ts").alias("day"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("day").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(t), "day").select(
        "day",
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        (F.col("n") / F.col("tot").cast("double")).alias("share"),
    )


# ------------------------------------------------ per-doc n-gram novelty


@query(
    "ngram_novelty_score",
    oracle=f"""
    WITH ds AS (
      SELECT DISTINCT doc_id,
        md5(array_to_string(w[i:i + {SHINGLE_N - 1}], ' ')) AS sh
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
            FROM documents),
        UNNEST(generate_series(1, len(w) - {SHINGLE_N - 1})) AS u(i)
    ),
    df AS (SELECT sh, COUNT(*) AS n_docs_sh FROM ds GROUP BY sh)
    SELECT doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_shingles,
      CAST(SUM(CASE WHEN n_docs_sh > 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_shared,
      1.0 - SUM(CASE WHEN n_docs_sh > 1 THEN 1 ELSE 0 END)
            / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM ds JOIN df USING (sh)
    GROUP BY doc_id
    """,
)
def ngram_novelty_score(spark, sf_dir):
    """Per-document novelty: the fraction of a document's {SHINGLE_N}-word
    shingles that appear in NO other document — the document-level drill-
    down of doc_shingle_dup_coverage and the ranking signal that keeps
    the most-original copy when near-dup clusters pick a survivor.
    Shingle document-frequency is one md5-key shuffle; the per-doc
    rollup is the second; integer counts, one division."""
    d = table(spark, sf_dir, "documents")
    ds = (
        d.select(F.col("doc_id"), F.split(F.lower("text"), " ").alias("w"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"CASE WHEN size(w) >= {SHINGLE_N} THEN "
                    f"transform(sequence(1, size(w) - {SHINGLE_N - 1}), "
                    f"i -> md5(array_join(slice(w, i, {SHINGLE_N}), ' '))) "
                    f"ELSE array() END"
                )
            ).alias("sh"),
        )
        .distinct()
    )
    df_ = ds.groupBy("sh").agg(F.count(F.lit(1)).alias("n_docs_sh"))
    shared = (F.col("n_docs_sh") > 1).cast("int")
    return (
        ds.join(df_, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(shared).cast("bigint").alias("n_shared"),
            (1.0 - F.sum(shared) / F.count(F.lit(1)).cast("double")).alias(
                "novelty"
            ),
        )
    )


# ---------------------------------------------- basket size histogram


@query(
    "order_basket_size_hist",
    oracle="""
    WITH b AS (
      SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(n_items AS INTEGER) AS basket_size,
      CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM b GROUP BY n_items
    """,
)
def order_basket_size_hist(spark, sf_dir):
    """Basket-size histogram (line items per order) — the fan-out profile
    that sizes the orders-lineitem join at capacity-planning time and
    feeds market-basket support thresholds. Two partial-aggregated
    shuffles, the second over the handful of distinct basket sizes."""
    li = table(spark, sf_dir, "lineitem")
    b = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_items"))
    return b.groupBy(
        F.col("n_items").cast("int").alias("basket_size")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))


# ------------------------------------------- session entry/exit pairs


@query(
    "session_entry_exit_types",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  IS NULL
          OR epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id))
             > {CONC_GAP_MIN} * 60 * 1000000
        THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ),
    ee AS (
      SELECT user_id, sid,
        min_by(event_type, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
               || '|' || lpad(CAST(event_id AS VARCHAR), 20, '0'))
          AS entry_type,
        max_by(event_type, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
               || '|' || lpad(CAST(event_id AS VARCHAR), 20, '0'))
          AS exit_type
      FROM s GROUP BY user_id, sid
    )
    SELECT entry_type, exit_type, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM ee GROUP BY entry_type, exit_type
    """,
)
def session_entry_exit_types(spark, sf_dir):
    """Entry/exit behavior: how sessions begin and end, counted over the
    (first event type, last event type) pair per 30-min-gap session —
    the landing/abandonment matrix product teams read next to the funnel
    ops. First/last are deterministic min_by/max_by on the (ts, event_id)
    order key (a struct in Spark, a zero-padded string in the oracle —
    the same total order); sessionization shares the established per-user window;
    the final matrix is a |types|^2 aggregate."""
    e = table(spark, sf_dir, "events")
    gap_us = CONC_GAP_MIN * 60 * 1_000_000
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    g = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(wu).isNull()
            | (us - F.unix_micros(F.lag("ts").over(wu)) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    s = g.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("new_s").over(wu.rowsBetween(W.unboundedPreceding, 0)).alias("sid"),
    )
    key = F.struct("ts", "event_id")
    ee = s.groupBy("user_id", "sid").agg(
        F.min_by("event_type", key).alias("entry_type"),
        F.max_by("event_type", key).alias("exit_type"),
    )
    return ee.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )


# ----------------------------------------------- business-rule checks


@query(
    "business_rule_violations",
    oracle="""
    SELECT 'lineitem_discount_range' AS rule,
      CAST(COUNT(*) AS BIGINT) AS n_checked,
      CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
               THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
      SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
        / CAST(COUNT(*) AS DOUBLE) AS violation_rate
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_tax_range',
      CAST(COUNT(*) AS BIGINT),
      CAST(SUM(CASE WHEN l_tax < 0 OR l_tax > 0.08 THEN 1 ELSE 0 END)
           AS BIGINT),
      SUM(CASE WHEN l_tax < 0 OR l_tax > 0.08 THEN 1 ELSE 0 END)
        / CAST(COUNT(*) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_quantity_range',
      CAST(COUNT(*) AS BIGINT),
      CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
           AS BIGINT),
      SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
        / CAST(COUNT(*) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'orders_positive_total',
      CAST(COUNT(*) AS BIGINT),
      CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
      SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
        / CAST(COUNT(*) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'ship_not_before_order',
      CAST(COUNT(*) AS BIGINT),
      CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
           AS BIGINT),
      SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
        / CAST(COUNT(*) AS DOUBLE)
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    """,
)
def business_rule_violations(spark, sf_dir):
    """Declarative data-quality rule report (the dbt-test / Great-
    Expectations shape): each business rule — range constraints on
    discount/tax/quantity/price plus the cross-table temporal rule
    "ship date never precedes order date" — contributes one row of
    checked/violated counts. Single-table rules are conditional sums
    inside ONE scan each (Catalyst merges the three lineitem rules'
    scans under exchange reuse when unioned); the temporal rule is the
    only join. Extending the rulebook = appending a (name, predicate)
    row — the report schema never changes."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")

    def rule(name, df, bad):
        return df.agg(
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            F.sum(bad.cast("int")).cast("bigint").alias("n_violations"),
            (F.sum(bad.cast("int")) / F.count(F.lit(1)).cast("double")).alias(
                "violation_rate"
            ),
        ).select("rule", "n_checked", "n_violations", "violation_rate")

    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    return (
        rule(
            "lineitem_discount_range",
            li,
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1),
        )
        .unionAll(
            rule(
                "lineitem_tax_range",
                li,
                (F.col("l_tax") < 0) | (F.col("l_tax") > 0.08),
            )
        )
        .unionAll(
            rule(
                "lineitem_quantity_range",
                li,
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
            )
        )
        .unionAll(rule("orders_positive_total", o, F.col("o_totalprice") <= 0))
        .unionAll(
            rule(
                "ship_not_before_order",
                joined,
                F.col("l_shipdate") < F.col("o_orderdate"),
            )
        )
    )


# ------------------------------------------- multi-touch attribution

ATTR_WINDOW_MIN = 60


@query(
    "attribution_linear_multitouch",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS pts, value
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'
    )
    SELECT purchase_id,
      CAST(COUNT(*) AS BIGINT) AS n_touches,
      MAX(value) AS purchase_value,
      MAX(value) / COUNT(*) AS credit_per_touch
    FROM p JOIN c ON c.user_id = p.user_id
      AND c.cts <= p.pts
      AND c.cts > p.pts - INTERVAL {ATTR_WINDOW_MIN} MINUTES
    GROUP BY purchase_id
    """,
)
def attribution_linear_multitouch(spark, sf_dir):
    """Linear multi-touch attribution: each purchase's value splits
    equally across every click by the same user in the preceding
    {ATTR_WINDOW_MIN} minutes — the many-touch generalization of
    asof_join_purchase_click's last-touch model. The range join is an
    equi-join on user_id with the time band as a post-join filter
    (co-partitioned by the user shuffle, never a cartesian; at scale add
    coarse time-bucket keys to the join like range_join_close_events).
    Counts are exact; one division yields the per-touch credit."""
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("pts"),
        "value",
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    win = F.expr(f"INTERVAL {ATTR_WINDOW_MIN} MINUTES")
    j = p.join(
        c,
        (p.user_id == c.user_id)
        & (c.cts <= p.pts)
        & (c.cts > p.pts - win),
    )
    return j.groupBy("purchase_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.max("value").alias("purchase_value"),
        (F.max("value") / F.count(F.lit(1))).alias("credit_per_touch"),
    )


# ------------------------------------------------- timezone rendering


@query(
    "timezone_pack",
    oracle="""
    SELECT event_id,
      CAST(hour(ts) AS INTEGER) AS hr_utc,
      CAST(hour(CAST(ts AS TIMESTAMPTZ) AT TIME ZONE 'America/New_York')
           AS INTEGER) AS hr_nyc,
      CAST(hour(CAST(ts AS TIMESTAMPTZ) AT TIME ZONE 'Asia/Tokyo')
           AS INTEGER) AS hr_tokyo,
      CAST(CAST(ts AS TIMESTAMPTZ) AT TIME ZONE 'America/New_York'
           AS TIMESTAMP) AS ts_nyc
    FROM events WHERE event_id % 100 = 0
    """,
)
def timezone_pack(spark, sf_dir):
    """Timezone-rendering parity: the same UTC instant rendered in
    UTC / New York / Tokyo wall-clock (hour extraction + full local
    timestamp). Both engines resolve zones through the IANA tzdb —
    Spark's from_utc_timestamp == DuckDB's ::TIMESTAMPTZ AT TIME ZONE
    under the pinned-UTC sessions (session.py; the oracle connection
    inherits the container's UTC). Winter dates exercise the EST offset;
    zone rules, not arithmetic, are the thing under test. Pure map,
    sampled 1-in-100 by key for a bounded result."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 100 == 0)
    nyc = F.from_utc_timestamp("ts", "America/New_York")
    tokyo = F.from_utc_timestamp("ts", "Asia/Tokyo")
    return e.select(
        "event_id",
        F.hour("ts").cast("int").alias("hr_utc"),
        F.hour(nyc).cast("int").alias("hr_nyc"),
        F.hour(tokyo).cast("int").alias("hr_tokyo"),
        nyc.alias("ts_nyc"),
    )


# ------------------------------------------ k-anonymity generalization


@query(
    "k_anonymity_ladder",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
        CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS b1,
        CAST(floor(c_acctbal / 5000.0) AS BIGINT) AS b5
      FROM customer
    ),
    g0 AS (SELECT c_nationkey, c_mktsegment, b1, COUNT(*) AS k0
           FROM c GROUP BY 1, 2, 3),
    g1 AS (SELECT c_nationkey, c_mktsegment, b5, COUNT(*) AS k1
           FROM c GROUP BY 1, 2, 3),
    g2 AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS k2
           FROM c GROUP BY 1, 2),
    g3 AS (SELECT c_mktsegment, COUNT(*) AS k3 FROM c GROUP BY 1),
    lv AS (
      SELECT c.c_custkey,
        CASE WHEN k0 >= {K_ANON_THRESHOLD} THEN 0
             WHEN k1 >= {K_ANON_THRESHOLD} THEN 1
             WHEN k2 >= {K_ANON_THRESHOLD} THEN 2
             WHEN k3 >= {K_ANON_THRESHOLD} THEN 3
             ELSE 4 END AS level
      FROM c
      JOIN g0 USING (c_nationkey, c_mktsegment, b1)
      JOIN g1 USING (c_nationkey, c_mktsegment, b5)
      JOIN g2 USING (c_nationkey, c_mktsegment)
      JOIN g3 USING (c_mktsegment)
    )
    SELECT CAST(level AS INTEGER) AS level,
      CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lv GROUP BY level
    """,
)
def k_anonymity_ladder(spark, sf_dir):
    """k-anonymity generalization ladder: each row gets the FINEST
    quasi-identifier granularity at which its equivalence class reaches
    k={K_ANON_THRESHOLD} — level 0 = (nation, segment, $1k balance
    band), 1 = $5k band, 2 = drop the balance, 3 = segment only, 4 =
    never safe. This is the actionable sequel to k_anonymity_report:
    instead of "X% of rows are exposed", it says exactly how much
    coarsening each row needs. Four group-size aggregates broadcast back
    onto the row stream; the level pick is one CASE; output is the
    5-row adoption histogram."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("b1"),
        F.floor(F.col("c_acctbal") / 5000.0).cast("bigint").alias("b5"),
    )
    g0 = c.groupBy("c_nationkey", "c_mktsegment", "b1").agg(
        F.count(F.lit(1)).alias("k0")
    )
    g1 = c.groupBy("c_nationkey", "c_mktsegment", "b5").agg(
        F.count(F.lit(1)).alias("k1")
    )
    g2 = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("k2")
    )
    g3 = c.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("k3"))
    k = K_ANON_THRESHOLD
    level = (
        F.when(F.col("k0") >= k, 0)
        .when(F.col("k1") >= k, 1)
        .when(F.col("k2") >= k, 2)
        .when(F.col("k3") >= k, 3)
        .otherwise(4)
    )
    lv = (
        c.join(F.broadcast(g0), ["c_nationkey", "c_mktsegment", "b1"])
        .join(F.broadcast(g1), ["c_nationkey", "c_mktsegment", "b5"])
        .join(F.broadcast(g2), ["c_nationkey", "c_mktsegment"])
        .join(F.broadcast(g3), ["c_mktsegment"])
        .select(level.alias("level"))
    )
    return lv.groupBy(F.col("level").cast("int").alias("level")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )


# ------------------------------------- recency-weighted engagement

DECAY_HALF_LIFE_DAYS = 7.0


@query(
    "user_recency_weighted_engagement",
    oracle=f"""
    WITH mx AS (SELECT MAX(ts) AS m FROM events)
    SELECT user_id,
      CAST(SUM(CAST(round(value * exp(-ln(2)
          * date_diff('day', CAST(ts AS DATE), CAST(m AS DATE))
          / {DECAY_HALF_LIFE_DAYS}), 8) AS DECIMAL(28,10))) AS DOUBLE)
        AS engagement,
      CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events CROSS JOIN mx
    GROUP BY user_id
    """,
)
def user_recency_weighted_engagement(spark, sf_dir):
    """Exponentially time-decayed engagement score per user (half-life
    {DECAY_HALF_LIFE_DAYS} days against the corpus high-water mark) —
    the recency-aware ranking feature feeding recommendation and churn
    models, where a raw SUM over-credits ancient activity. Age is
    integer days; each value*2^(-age/hl) contribution is IEEE-computed
    per row, rounded, and decimal-summed (exp's last-ulp engine
    differences are absorbed by the rounding — same recipe as the
    entropy ops). One broadcast max + one user rollup."""
    e = table(spark, sf_dir, "events")
    mx = F.broadcast(e.agg(F.max("ts").alias("m")))
    age = F.datediff("m", "ts")
    import math

    w = F.exp(-math.log(2) * age / DECAY_HALF_LIFE_DAYS)
    contrib = F.round(F.col("value") * w, 8).cast("decimal(28,10)")
    return (
        e.crossJoin(mx)
        .groupBy("user_id")
        .agg(
            F.sum(contrib).cast("double").alias("engagement"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )


# ------------------------------------------------ daily KPI scorecard


@query(
    "events_daily_scorecard",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      {_d('value')} AS total_value,
      SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        / CAST(COUNT(*) AS DOUBLE) AS error_share,
      SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        / CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS purchases_per_user
    FROM events GROUP BY 1
    """,
)
def events_daily_scorecard(spark, sf_dir):
    """The daily KPI scorecard row: volume, unique users, exact total
    value, error share, purchases per active user — the one aggregate a
    morning dashboard reads. COUNT(DISTINCT) is exact per day here; at
    whale scale the same plan swaps in approx_count_distinct (HLL) with
    the error bound gated in tests. One shuffle on day (the distinct
    expands it to two internally); decimal-exact value sum."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        (
            F.sum((F.col("event_type") == "error").cast("int"))
            / F.count(F.lit(1)).cast("double")
        ).alias("error_share"),
        (
            F.sum((F.col("event_type") == "purchase").cast("int"))
            / F.count_distinct("user_id").cast("double")
        ).alias("purchases_per_user"),
    )


# --------------------------------------------- distribution windows


@query(
    "window_dist_family",
    oracle="""
    SELECT c_custkey, c_mktsegment,
      round(PERCENT_RANK() OVER w, 10) AS pr,
      round(CUME_DIST() OVER w, 10) AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_dist_family(spark, sf_dir):
    """The distribution-window pair missing from window_rank_family:
    percent_rank ((rank-1)/(n-1)) and cume_dist (rows <= current / n)
    per market segment — the normalized-position features fed to
    cross-segment comparisons. The (c_acctbal, c_custkey) order key is
    unique, so both functions are deterministic; the single division
    each is engine-identical and rounded to 10 for ulp safety. One
    per-segment window sort."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 10).alias("pr"),
        F.round(F.cume_dist().over(w), 10).alias("cd"),
    )


# ---------------------------------------- two-level exact stats merge


@query(
    "two_level_variance_merge",
    oracle=f"""
    WITH shard AS (
      SELECT source, COUNT(*) AS n,
        {_d('n_chars')} AS s1,
        {_d('n_chars * n_chars')} AS s2
      FROM documents GROUP BY source
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n,
      CAST(SUM(CAST(s1 AS DECIMAL(28,6))) AS DOUBLE) / SUM(n) AS mean,
      (CAST(SUM(CAST(s2 AS DECIMAL(28,6))) AS DOUBLE)
       - CAST(SUM(CAST(s1 AS DECIMAL(28,6))) AS DOUBLE)
         * SUM(CAST(s1 AS DECIMAL(28,6))) / SUM(n))
      / (SUM(n) - 1) AS variance,
      CAST(COUNT(*) AS BIGINT) AS n_shards
    FROM shard
    """,
)
def two_level_variance_merge(spark, sf_dir):
    """Mergeable statistics, demonstrated: per-shard (per-source) exact
    decimal moment sums combine into the global mean/variance with NO
    loss — the property that makes the functions/exact.py recipe a
    100 TB design rather than a nicety (any shard/executor/partition
    split re-merges to the same bits; naive float moments do not). The
    oracle computes the same closed form from the same two-level
    aggregation; tests additionally pin this equal to the single-level
    stats_moments path."""
    d = table(spark, sf_dir, "documents")
    shard = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("n_chars").cast(DEC)).cast("double").alias("s1"),
        F.sum((F.col("n_chars") * F.col("n_chars")).cast(DEC))
        .cast("double")
        .alias("s2"),
    )
    n = F.sum("n")
    s1 = F.sum(F.col("s1").cast(DEC)).cast("double")
    s2 = F.sum(F.col("s2").cast(DEC)).cast("double")
    return shard.agg(
        n.cast("bigint").alias("n"),
        (s1 / n).alias("mean"),
        ((s2 - s1 * F.sum(F.col("s1").cast(DEC)) / n) / (n - 1)).alias(
            "variance"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_shards"),
    )


# ----------------------------------------------- revenue waterfall


@query(
    "revenue_waterfall",
    oracle=f"""
    SELECT
      {_d('l_extendedprice')} AS gross_revenue,
      {_d('l_extendedprice * l_discount')} AS discount_given,
      {_d('l_extendedprice * (1 - l_discount)')} AS net_revenue,
      {_d('l_extendedprice * (1 - l_discount) * l_tax')} AS tax_collected,
      {_d('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}
        AS charged_total,
      CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem
    """,
)
def revenue_waterfall(spark, sf_dir):
    """The revenue waterfall in one row: gross -> discounts -> net ->
    tax -> charged, each an exact decimal sum over the same single scan
    (the q1 aggregate family reshaped as the finance bridge report).
    Per-row products are IEEE-identical; the five decimal sums are
    order-free; one partial-aggregated pass, no shuffle beyond the
    1-row combine."""
    li = table(spark, sf_dir, "lineitem")
    p, d_, t = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")

    def ds(x):
        return F.sum(x.cast(DEC)).cast("double")

    return li.agg(
        ds(p).alias("gross_revenue"),
        ds(p * d_).alias("discount_given"),
        ds(p * (1 - d_)).alias("net_revenue"),
        ds(p * (1 - d_) * t).alias("tax_collected"),
        ds(p * (1 - d_) * (1 + t)).alias("charged_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
    )


# ------------------------------------------ trailing 28-day revenue


@query(
    "orders_trailing_28d_revenue",
    oracle=f"""
    WITH m AS (
      SELECT CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
                            o_orderdate) AS BIGINT) AS d,
        {_d('o_totalprice')} AS rev
      FROM orders GROUP BY 1
    )
    SELECT d,
      rev AS day_revenue,
      CAST(SUM(CAST(rev AS DECIMAL(28,6))) OVER (
        ORDER BY d RANGE BETWEEN 27 PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS trailing_28d_revenue
    FROM m
    """,
)
def orders_trailing_28d_revenue(spark, sf_dir):
    """Trailing 28-day revenue per day — the smoothed topline series
    (month-over-month's rolling cousin, immune to month-length
    artifacts). A RANGE frame over the integer day index handles
    calendar gaps correctly where a 28-ROW frame would silently span
    more days; the window re-sums per-day DECIMAL-exact revenue, so the
    series is bit-stable. Runs on the tiny day aggregate (the documented
    small-aggregate window exception)."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.datediff("o_orderdate", F.lit("1995-01-01")).cast("bigint").alias("d")
    ).agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("rev"))
    w = W.orderBy("d").rangeBetween(-27, 0)
    return m.select(
        "d",
        F.col("rev").alias("day_revenue"),
        F.sum(F.col("rev").cast(DEC)).over(w).cast("double").alias(
            "trailing_28d_revenue"
        ),
    )


# --------------------------------------- closed-form OLS (regr_* family)

_DS = "CAST(SUM(CAST({x} AS DECIMAL(28,6))) AS DOUBLE)"


@query(
    "lineitem_ols_regression",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag, l_linestatus,
        CAST(COUNT(*) AS DOUBLE) AS n,
        {_DS.format(x='l_quantity')} AS sx,
        {_DS.format(x='l_extendedprice')} AS sy,
        {_DS.format(x='l_quantity * l_quantity')} AS sxx,
        {_DS.format(x='l_extendedprice * l_extendedprice')} AS syy,
        {_DS.format(x='l_quantity * l_extendedprice')} AS sxy
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, CAST(n AS BIGINT) AS n_rows,
      round((n * sxy - sx * sy) / (n * sxx - sx * sx), 8) AS slope,
      round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 8)
        AS intercept,
      round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
        / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 8) AS r2
    FROM s
    """,
)
def lineitem_ols_regression(spark, sf_dir):
    """Per-group simple linear regression (the regr_slope / regr_intercept
    / regr_r2 aggregate family) of extended price on quantity, computed
    closed-form from exact decimal power sums instead of the engines'
    native regr_* aggregates.

    Why not regr_slope directly: both Spark and DuckDB implement it over
    order-dependent double accumulation (and with different covariance
    update algorithms), so the last bits differ per run and per engine.
    The functions/exact.py recipe — per-row double arithmetic, decimal
    sums at the aggregation boundary, one final double evaluation of the
    normal equations — is bit-reproducible on both sides and at any
    partition count; this query is the oracle-pinned proof.

    Scale shape: one partial-aggregated shuffle carrying six numbers per
    group per map partition — the same footprint as TPC-H Q1."""
    l = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")

    def ds(c):
        return F.sum(c.cast(DEC)).cast("double")

    s = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        ds(x).alias("sx"),
        ds(y).alias("sy"),
        ds(x * x).alias("sxx"),
        ds(y * y).alias("syy"),
        ds(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    return s.select(
        "l_returnflag",
        "l_linestatus",
        n.cast("bigint").alias("n_rows"),
        F.round(slope, 8).alias("slope"),
        F.round((sy - slope * sx) / n, 8).alias("intercept"),
        F.round((cov_n * cov_n) / (var_x * var_y), 8).alias("r2"),
    )


# ------------------------------------ cumulative distinct users per day


@query(
    "events_cumulative_distinct_users",
    oracle="""
    WITH fs AS (
      SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT first_day AS day, COUNT(*) AS new_users FROM fs GROUP BY first_day
    )
    SELECT day, CAST(new_users AS BIGINT) AS new_users,
      CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
    FROM daily
    """,
)
def events_cumulative_distinct_users(spark, sf_dir):
    """Running count of distinct users ever seen, per day — the growth
    curve every DAU/MAU dashboard needs. The naive plan (per-day COUNT
    DISTINCT over an expanding window) rescans the whole history per day;
    this is the first-seen reduction instead: one user-keyed min-reduce
    (combines map-side), a per-day count, and a cumulative sum over the
    handful of day rows. The unpartitioned window is over days, not
    events — ~365 rows/year, driver-trivial at any corpus size."""
    e = table(spark, sf_dir, "events")
    fs = (
        e.select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("first_day"))
    )
    daily = fs.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        "day",
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


# ------------------------------------------ 2-D Mahalanobis outliers


@query(
    "lineitem_mahalanobis_outliers",
    oracle=f"""
    WITH s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        {_DS.format(x='l_quantity')} AS sx,
        {_DS.format(x='l_extendedprice')} AS sy,
        {_DS.format(x='l_quantity * l_quantity')} AS sxx,
        {_DS.format(x='l_extendedprice * l_extendedprice')} AS syy,
        {_DS.format(x='l_quantity * l_extendedprice')} AS sxy
      FROM lineitem
    ),
    m AS (
      SELECT n, sx / n AS mx, sy / n AS my,
        sxx / n - (sx / n) * (sx / n) AS vx,
        syy / n - (sy / n) * (sy / n) AS vy,
        sxy / n - (sx / n) * (sy / n) AS cxy
      FROM s
    )
    SELECT l_orderkey, l_linenumber,
      round(((l_quantity - mx) * (l_quantity - mx) * vy
           - 2 * (l_quantity - mx) * (l_extendedprice - my) * cxy
           + (l_extendedprice - my) * (l_extendedprice - my) * vx)
           / (vx * vy - cxy * cxy), 8) AS d2
    FROM lineitem CROSS JOIN m
    ORDER BY d2 DESC, l_orderkey, l_linenumber LIMIT 20
    """,
)
def lineitem_mahalanobis_outliers(spark, sf_dir):
    """Top-20 bivariate outliers by Mahalanobis distance over (quantity,
    extended price) — the correlation-aware generalization of the
    per-column z-score screens: a row can be unremarkable on each axis
    yet far off the joint distribution's ridge.

    The 2x2 covariance comes from one exact-decimal-sum aggregate
    (functions/exact.py recipe — bit-identical at any partition count),
    the inverse is closed-form, and the per-row distance is a broadcast
    of five scalars into a map stage. Top-20 executes as
    TakeOrderedAndProject: per-partition heaps, never a global sort.

    Both passes over lineitem are fanned out (single-row-group input =
    one-task scan stage otherwise): the moment aggregate carries the
    wide-decimal sums, the distance pass the per-row math + heap."""
    l = fanout(
        table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
        ),
        "l_orderkey",
    )
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")

    def ds(c):
        return F.sum(c.cast(DEC)).cast("double")

    s = F.broadcast(
        l.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            ds(x).alias("sx"),
            ds(y).alias("sy"),
            ds(x * x).alias("sxx"),
            ds(y * y).alias("syy"),
            ds(x * y).alias("sxy"),
        ).select(
            (F.col("sx") / F.col("n")).alias("mx"),
            (F.col("sy") / F.col("n")).alias("my"),
            (F.col("sxx") / F.col("n")
             - (F.col("sx") / F.col("n")) * (F.col("sx") / F.col("n"))).alias("vx"),
            (F.col("syy") / F.col("n")
             - (F.col("sy") / F.col("n")) * (F.col("sy") / F.col("n"))).alias("vy"),
            (F.col("sxy") / F.col("n")
             - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n"))).alias("cxy"),
        )
    )
    dx = x - F.col("mx")
    dy = y - F.col("my")
    d2 = (
        dx * dx * F.col("vy") - 2 * dx * dy * F.col("cxy") + dy * dy * F.col("vx")
    ) / (F.col("vx") * F.col("vy") - F.col("cxy") * F.col("cxy"))
    return (
        l.crossJoin(s)
        .select("l_orderkey", "l_linenumber", F.round(d2, 8).alias("d2"))
        .orderBy(F.col("d2").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
    )


L_DIVERSITY_THRESHOLD = 3


@query(
    "l_diversity_report",
    oracle=f"""
    WITH sv AS (
      SELECT c_nationkey, c_mktsegment,
        CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS sens,
        COUNT(*) AS c
      FROM customer GROUP BY 1, 2, 3
    ),
    sp AS (
      SELECT sv.*, CAST(SUM(c) OVER (PARTITION BY c_nationkey,
        c_mktsegment) AS DOUBLE) AS tot
      FROM sv
    ),
    g AS (
      SELECT c_nationkey, c_mktsegment,
        CAST(SUM(c) AS BIGINT) AS n_rows,
        CAST(COUNT(*) AS BIGINT) AS l_distinct,
        round(exp(SUM(-(c / tot) * ln(c / tot))), 8) AS entropy_l
      FROM sp GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment, n_rows, l_distinct, entropy_l,
      l_distinct >= {L_DIVERSITY_THRESHOLD} AS meets_l
    FROM g
    """,
)
def l_diversity_report(spark, sf_dir):
    """l-diversity audit (Machanavajjhala et al. 2007), the companion to
    k_anonymity_report: a group can be k-large yet still leak if every
    member shares the same sensitive value. Per quasi-identifier class
    (nation, market segment) against the balance-band sensitive
    attribute: distinct-l, entropy-l (exp of the sensitive-value
    entropy — punishes 99:1 skews that distinct-l misses), and the
    l>={L_DIVERSITY_THRESHOLD} release flag.

    Two keyed aggregations — (QI, sensitive) counts, then per-QI rollup
    — both partial-aggregated; the entropy sums over at most
    |sensitive-domain| terms per group, never over rows."""
    c = table(spark, sf_dir, "customer")
    sv = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("sens"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wq = W.partitionBy("c_nationkey", "c_mktsegment")
    p = F.col("c") / F.sum("c").over(wq).cast("double")
    g = sv.select(
        "c_nationkey", "c_mktsegment", "c", (-p * F.ln(p)).alias("h")
    ).groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("l_distinct"),
        F.round(F.exp(F.sum("h")), 8).alias("entropy_l"),
    )
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "n_rows",
        "l_distinct",
        "entropy_l",
        (F.col("l_distinct") >= L_DIVERSITY_THRESHOLD).alias("meets_l"),
    )


# ---------------- join-size estimation (planner statistics surface)


@query(
    "join_cardinality_estimate",
    oracle="""
    WITH ca AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
    cb AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
    j AS (SELECT ca.c AS ca, cb.c AS cb FROM ca JOIN cb USING (k))
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM ca) AS n_keys_orders,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM cb) AS n_keys_lineitem,
      CAST(COUNT(*) AS BIGINT) AS n_keys_common,
      CAST(SUM(ca * cb) AS BIGINT) AS join_rows,
      CAST(MAX(ca * cb) AS BIGINT) AS max_key_fanout
    FROM j
    """,
)
def join_cardinality_estimate(spark, sf_dir):
    """Exact join-size statistic WITHOUT executing the join: |A JOIN B on k|
    = sum over keys of cA(k)*cB(k), from two per-key count aggregates and
    a key-level merge — the number a cost-based planner (or a human
    deciding broadcast vs shuffle vs salting) needs, at the cost of two
    partial-aggregated count shuffles over KEYS instead of materializing
    the join's output rows. max_key_fanout is the skew headline: it is
    the largest single-key output and the first thing to check before
    enabling a salted join (operators/skew.py)."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    ca = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    cb = l.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    na = F.broadcast(ca.agg(F.count(F.lit(1)).alias("n_keys_orders")))
    nb = F.broadcast(cb.agg(F.count(F.lit(1)).alias("n_keys_lineitem")))
    j = ca.join(cb, "k")
    return (
        j.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys_common"),
            F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("join_rows"),
            F.max(F.col("ca") * F.col("cb"))
            .cast("bigint")
            .alias("max_key_fanout"),
        )
        .crossJoin(na)
        .crossJoin(nb)
        .select(
            "n_keys_orders",
            "n_keys_lineitem",
            "n_keys_common",
            "join_rows",
            "max_key_fanout",
        )
    )


# --------------------- mix-shift (share vs rate) decomposition


@query(
    "orders_mix_shift_decomposition",
    oracle=f"""
    WITH tagged AS (
      SELECT o_orderpriority AS seg,
        CASE WHEN year(o_orderdate) < 1998 THEN 1 ELSE 2 END AS half,
        o_totalprice
      FROM orders
    ),
    seg AS (
      SELECT seg, half, CAST(COUNT(*) AS DOUBLE) AS n,
        {_DS.format(x='o_totalprice')} AS s
      FROM tagged GROUP BY seg, half
    ),
    tot AS (
      SELECT half, CAST(SUM(n) AS DOUBLE) AS nt FROM seg GROUP BY half
    ),
    w AS (
      SELECT seg,
        MAX(CASE WHEN s1.half = 1 THEN n / nt END) AS share1,
        MAX(CASE WHEN s1.half = 2 THEN n / nt END) AS share2,
        MAX(CASE WHEN s1.half = 1 THEN s / n END) AS rate1,
        MAX(CASE WHEN s1.half = 2 THEN s / n END) AS rate2
      FROM seg s1 JOIN tot USING (half) GROUP BY seg
    )
    SELECT seg, round(share1, 8) AS share1, round(share2, 8) AS share2,
      round(rate1, 8) AS rate1, round(rate2, 8) AS rate2,
      round((share2 - share1) * rate1, 8) AS mix_effect,
      round(share2 * (rate2 - rate1), 8) AS rate_effect,
      round(share2 * rate2 - share1 * rate1, 8) AS total_effect
    FROM w
    """,
)
def orders_mix_shift_decomposition(spark, sf_dir):
    """Mix-shift decomposition of average order value between the pre-1998
    and 1998+ halves, per priority segment: how much of the change in the
    overall mean is composition (segment shares moving) vs behavior
    (per-segment means moving). mix + rate = total per segment, and the
    segment totals sum exactly to the overall delta — the additivity a
    BI audience expects from this report.

    All inputs come from ONE partial-aggregated (segment, half) pass with
    exact decimal sums; shares divide by broadcast half totals; the pivot
    to side-by-side halves is a 10-row aggregate."""
    o = table(spark, sf_dir, "orders")
    tagged = o.select(
        F.col("o_orderpriority").alias("seg"),
        F.when(F.year("o_orderdate") < 1998, 1).otherwise(2).alias("half"),
        "o_totalprice",
    )
    seg = tagged.groupBy("seg", "half").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("s"),
    )
    tot = seg.groupBy("half").agg(F.sum("n").alias("nt"))
    j = seg.join(F.broadcast(tot), "half")
    w = j.groupBy("seg").agg(
        F.max(F.when(F.col("half") == 1, F.col("n") / F.col("nt"))).alias("share1"),
        F.max(F.when(F.col("half") == 2, F.col("n") / F.col("nt"))).alias("share2"),
        F.max(F.when(F.col("half") == 1, F.col("s") / F.col("n"))).alias("rate1"),
        F.max(F.when(F.col("half") == 2, F.col("s") / F.col("n"))).alias("rate2"),
    )
    return w.select(
        "seg",
        F.round("share1", 8).alias("share1"),
        F.round("share2", 8).alias("share2"),
        F.round("rate1", 8).alias("rate1"),
        F.round("rate2", 8).alias("rate2"),
        F.round((F.col("share2") - F.col("share1")) * F.col("rate1"), 8).alias(
            "mix_effect"
        ),
        F.round(F.col("share2") * (F.col("rate2") - F.col("rate1")), 8).alias(
            "rate_effect"
        ),
        F.round(
            F.col("share2") * F.col("rate2") - F.col("share1") * F.col("rate1"), 8
        ).alias("total_effect"),
    )


# ------------------------- Kaplan-Meier survival (customer lifetime)

KM_CENSOR_DAYS = 365  # last order within this window of corpus max => censored


@query(
    "customer_survival_km",
    oracle=f"""
    WITH life AS (
      SELECT o_custkey,
        datediff('day', MIN(o_orderdate), MAX(o_orderdate)) AS dur,
        MAX(o_orderdate) AS last_d
      FROM orders GROUP BY o_custkey
    ),
    mx AS (SELECT MAX(o_orderdate) AS m FROM orders),
    obs AS (
      SELECT dur,
        CASE WHEN datediff('day', last_d, m) <= {KM_CENSOR_DAYS}
          THEN 0 ELSE 1 END AS event
      FROM life CROSS JOIN mx
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM obs),
    byt AS (
      SELECT dur, CAST(SUM(event) AS BIGINT) AS d,
        CAST(COUNT(*) AS BIGINT) AS leave
      FROM obs GROUP BY dur
    ),
    risk AS (
      SELECT dur, d,
        n - COALESCE(SUM(leave) OVER (ORDER BY dur
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      FROM byt CROSS JOIN tot
    )
    SELECT dur AS t_days, d AS n_churned, CAST(n_risk AS BIGINT) AS n_at_risk,
      CASE WHEN MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER w = 1
        THEN 0.0
        ELSE round(exp(SUM(CASE WHEN d < n_risk
          THEN ln(1.0 - d / CAST(n_risk AS DOUBLE)) ELSE 0.0 END) OVER w), 8)
      END AS survival
    FROM risk WHERE d > 0
    WINDOW w AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def customer_survival_km(spark, sf_dir):
    """Kaplan-Meier survival curve of customer ordering lifetime (days
    between first and last order), right-censored for customers still
    active within {KM_CENSOR_DAYS} days of the corpus end — the
    censoring-correct way to answer "how long does a customer stay?"
    when many haven't left yet (a naive mean lifetime is biased low).

    S(t) = prod over event times (1 - d_i/n_i), computed as exp of a
    RUNNING ln-sum: the window's ORDER BY t fixes the summation order,
    so both engines add the same doubles in the same sequence —
    deterministic without decimal tricks. At-risk counts come from one
    duration-keyed aggregate and a prefix sum over the handful of
    distinct durations; the only corpus-scale shuffle is the per-customer
    min/max."""
    o = table(spark, sf_dir, "orders")
    life = o.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("dur"),
        F.max("o_orderdate").alias("last_d"),
    )
    mx = F.broadcast(o.agg(F.max("o_orderdate").alias("m")))
    obs = life.crossJoin(mx).select(
        "dur",
        F.when(F.datediff("m", "last_d") <= KM_CENSOR_DAYS, 0)
        .otherwise(1)
        .alias("event"),
    )
    return km_curve(obs)


def km_curve(obs):
    """Kaplan-Meier estimator over an (dur, event) observation DataFrame
    (event=1 churn, 0 censored) — see customer_survival_km. Property-
    tested against a pure-Python KM in tests/test_property_roundtrip.py."""
    tot = F.broadcast(obs.agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    byt = obs.groupBy("dur").agg(
        F.sum("event").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("leave"),
    )
    w_prev = W.orderBy("dur").rowsBetween(W.unboundedPreceding, -1)
    w_run = W.orderBy("dur").rowsBetween(W.unboundedPreceding, 0)
    risk = byt.crossJoin(tot).select(
        "dur",
        "d",
        (
            F.col("n")
            - F.coalesce(F.sum("leave").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    ln_term = F.when(
        F.col("d") < F.col("n_risk"),
        F.ln(1.0 - F.col("d") / F.col("n_risk").cast("double")),
    ).otherwise(0.0)
    hit_zero = F.max(
        (F.col("d") >= F.col("n_risk")).cast("int")
    ).over(w_run)
    survival = F.when(hit_zero == 1, 0.0).otherwise(
        F.round(F.exp(F.sum(ln_term).over(w_run)), 8)
    )
    return (
        risk.select(
            F.col("dur").alias("t_days"),
            F.col("d").alias("n_churned"),
            F.col("n_risk").cast("bigint").alias("n_at_risk"),
            survival.alias("survival"),
            "d",
        )
        .filter(F.col("d") > 0)
        .drop("d")
    )


ATTR_DECAY_HALFLIFE_MIN = 10.0


@query(
    "attribution_time_decay",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS pts, value
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, event_id AS click_id, ts AS cts
      FROM events WHERE event_type = 'click'
    ),
    touch AS (
      SELECT purchase_id, click_id, value,
        round(exp(-ln(2) * (epoch_us(pts) - epoch_us(cts))
          / ({ATTR_DECAY_HALFLIFE_MIN} * 60 * 1000000)), 8) AS w
      FROM p JOIN c ON c.user_id = p.user_id
        AND c.cts <= p.pts
        AND c.cts > p.pts - INTERVAL {ATTR_WINDOW_MIN} MINUTES
    ),
    norm AS (
      SELECT purchase_id,
        CAST(SUM(CAST(w AS DECIMAL(28,8))) AS DOUBLE) AS wsum,
        CAST(COUNT(*) AS BIGINT) AS n_touches,
        MAX(value) AS purchase_value
      FROM touch GROUP BY purchase_id
    )
    SELECT t.purchase_id, t.click_id, n_touches,
      round(t.w / wsum, 8) AS credit_share,
      round(purchase_value * t.w / wsum, 6) AS credit_value
    FROM touch t JOIN norm USING (purchase_id)
    """,
)
def attribution_time_decay(spark, sf_dir):
    """Time-decay multi-touch attribution: clicks closer to the purchase
    earn exponentially more credit (half-life {ATTR_DECAY_HALFLIFE_MIN}
    min), normalized so each purchase's credits sum to its value — the
    recency-weighted sibling of attribution_linear_multitouch, sharing
    its user-keyed range join.

    Determinism engineering: per-touch decay weights are pure per-row
    double arithmetic ROUNDED to 8 before the normalizer, and the
    normalizer itself sums in DECIMAL(28,8) — so per-purchase shares are
    bit-identical at any partition count (the round-then-decimal-sum
    recipe from user_recency_weighted_engagement)."""
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
        "value",
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    win = F.expr(f"INTERVAL {ATTR_WINDOW_MIN} MINUTES")
    hl_us = ATTR_DECAY_HALFLIFE_MIN * 60 * 1_000_000
    w = F.round(
        F.exp(
            -F.lit(float(__import__("math").log(2)))
            * (F.unix_micros("pts") - F.unix_micros("cts"))
            / hl_us
        ),
        8,
    )
    touch = p.join(
        c,
        (p.user_id == F.col("cu"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") > F.col("pts") - win),
    ).select("purchase_id", "click_id", "value", w.alias("w"))
    norm = touch.groupBy("purchase_id").agg(
        F.sum(F.col("w").cast("decimal(28,8)")).cast("double").alias("wsum"),
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.max("value").alias("purchase_value"),
    )
    return touch.join(norm, "purchase_id").select(
        "purchase_id",
        "click_id",
        "n_touches",
        F.round(F.col("w") / F.col("wsum"), 8).alias("credit_share"),
        F.round(
            F.col("purchase_value") * F.col("w") / F.col("wsum"), 6
        ).alias("credit_value"),
    )


@query(
    "supplier_scorecard",
    oracle=f"""
    SELECT l_suppkey AS suppkey,
      CAST(COUNT(*) AS BIGINT) AS n_lines,
      CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      {_DS.format(x='l_extendedprice * (1 - l_discount)')} AS revenue,
      round(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        / CAST(COUNT(*) AS DOUBLE), 8) AS return_rate,
      {_DS.format(x='l_discount')} / COUNT(*) AS avg_discount
    FROM lineitem GROUP BY l_suppkey
    """,
)
def supplier_scorecard(spark, sf_dir):
    """Per-supplier operations scorecard: volume, assortment breadth,
    discounted revenue, return rate, mean discount — the dimension
    profile a procurement dashboard keys on (and the input
    parttype_supplier_hhi aggregates into concentration). One
    partial-aggregated shuffle on l_suppkey; the distinct-part count is
    the only state heavier than a scalar and is bounded by assortment
    size per supplier."""
    l = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.count_distinct("l_partkey").cast("bigint").alias("n_parts"),
        F.sum(rev.cast(DEC)).cast("double").alias("revenue"),
        F.round(
            F.sum((F.col("l_returnflag") == "R").cast("int"))
            / F.count(F.lit(1)).cast("double"),
            8,
        ).alias("return_rate"),
        (F.sum(F.col("l_discount").cast(DEC)).cast("double") / F.count(F.lit(1)))
        .alias("avg_discount"),
    )


@query(
    "orders_monthly_seasonality_index",
    oracle=f"""
    WITH m AS (
      SELECT CAST(month(o_orderdate) AS INTEGER) AS mon,
        CAST(COUNT(*) AS BIGINT) AS n_orders,
        {_DS.format(x='o_totalprice')} AS rev
      FROM orders GROUP BY mon
    ),
    t AS (
      SELECT SUM(rev) / SUM(n_orders) AS overall_aov,
        SUM(n_orders) / 12.0 AS mean_monthly_orders
      FROM m
    )
    SELECT mon, n_orders, round(rev, 2) AS revenue,
      round((rev / n_orders) / overall_aov, 8) AS aov_index,
      round(n_orders / mean_monthly_orders, 8) AS volume_index
    FROM m CROSS JOIN t
    """,
)
def orders_monthly_seasonality_index(spark, sf_dir):
    """Classic retail seasonality indices by calendar month: each month's
    order volume and average order value relative to the overall level
    (index 1.0 = typical month) — the multiplicative-seasonality view
    that complements the growth series (MoM/YoY) and the additive
    decomposition on events. Twelve-row aggregate from one scan; the
    normalizers are a broadcast 1-row rollup of the month table itself,
    so the indices average to 1 exactly by construction."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(F.month("o_orderdate").alias("mon")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("rev"),
    )
    t = F.broadcast(
        m.agg(
            (F.sum("rev") / F.sum("n_orders")).alias("overall_aov"),
            (F.sum("n_orders") / 12.0).alias("mean_monthly_orders"),
        )
    )
    return m.crossJoin(t).select(
        "mon",
        "n_orders",
        F.round("rev", 2).alias("revenue"),
        F.round((F.col("rev") / F.col("n_orders")) / F.col("overall_aov"), 8)
        .alias("aov_index"),
        F.round(F.col("n_orders") / F.col("mean_monthly_orders"), 8)
        .alias("volume_index"),
    )


ERROR_SLO = 0.25  # error-rate objective (synthetic corpus runs ~20% errors)


@query(
    "events_error_budget_burn",
    oracle=f"""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_err
      FROM events GROUP BY day
    )
    SELECT day, n, n_err,
      round(n_err / CAST(n AS DOUBLE), 8) AS error_rate,
      round(n_err / CAST(n AS DOUBLE) / {ERROR_SLO}, 8) AS burn_rate,
      CAST(SUM(n_err - CAST(round(n * {ERROR_SLO}) AS BIGINT)) OVER
        (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        AS BIGINT) AS cum_budget_overrun,
      n_err > CAST(round(n * {ERROR_SLO}) AS BIGINT) AS slo_violated
    FROM d
    """,
)
def events_error_budget_burn(spark, sf_dir):
    """SRE error-budget accounting against a {ERROR_SLO:.0%} error-rate
    SLO: per day the error rate, the burn rate (rate / objective — >1
    means the budget depletes faster than it accrues), the CUMULATIVE
    overrun in absolute events, and the violation flag. Integer budget
    arithmetic end-to-end (the only doubles are the reported ratios), so
    the running overrun is exact. One day-keyed partial-agg shuffle plus
    a window over day rows."""
    e = table(spark, sf_dir, "events")
    d = e.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("event_type") == "error").cast("int"))
        .cast("bigint")
        .alias("n_err"),
    )
    budget = F.round(F.col("n") * ERROR_SLO).cast("bigint")
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return d.select(
        "day",
        "n",
        "n_err",
        F.round(F.col("n_err") / F.col("n").cast("double"), 8).alias(
            "error_rate"
        ),
        F.round(
            F.col("n_err") / F.col("n").cast("double") / ERROR_SLO, 8
        ).alias("burn_rate"),
        F.sum(F.col("n_err") - budget).over(w).cast("bigint").alias(
            "cum_budget_overrun"
        ),
        (F.col("n_err") > budget).alias("slo_violated"),
    )


@query(
    "customer_segment_migration",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
        CASE WHEN year(o_orderdate) < 1998 THEN 1 ELSE 2 END AS half,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS s
      FROM orders GROUP BY o_custkey, half
    ),
    seg AS (
      SELECT o_custkey, half,
        CASE NTILE(3) OVER (PARTITION BY half ORDER BY s, o_custkey)
          WHEN 1 THEN 'low' WHEN 2 THEN 'mid' ELSE 'high' END AS seg
      FROM spend
    ),
    h1 AS (SELECT o_custkey, seg FROM seg WHERE half = 1),
    h2 AS (SELECT o_custkey, seg FROM seg WHERE half = 2)
    SELECT COALESCE(h1.seg, 'none') AS segment_before,
      COALESCE(h2.seg, 'none') AS segment_after,
      CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM h1 FULL OUTER JOIN h2 ON h1.o_custkey = h2.o_custkey
    GROUP BY 1, 2
    """,
)
def customer_segment_migration(spark, sf_dir):
    """Customer segment migration matrix: spend terciles (low/mid/high)
    computed independently in the pre-1998 and 1998+ halves, full-outer
    joined per customer so appearances ('none' -> low) and churn
    (high -> 'none') land in the matrix alongside up/down moves — the
    CRM transition table behind 'where did our high-value customers
    go?'.

    Determinism: spend is decimal-exact, NTILE orders by (spend,
    custkey) so tercile boundaries cannot flip between engines; the
    per-half rank windows partition by half (two parallel sorts, at
    scale range-partitioned). One full-outer join on custkey, then a
    16-cell rollup."""
    o = table(spark, sf_dir, "orders")
    spend = o.groupBy(
        "o_custkey",
        F.when(F.year("o_orderdate") < 1998, 1).otherwise(2).alias("half"),
    ).agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("s"))
    w = W.partitionBy("half").orderBy("s", "o_custkey")
    seg = spend.select(
        "o_custkey",
        "half",
        F.when(F.ntile(3).over(w) == 1, "low")
        .when(F.ntile(3).over(w) == 2, "mid")
        .otherwise("high")
        .alias("seg"),
    )
    h1 = seg.filter("half = 1").select(
        F.col("o_custkey").alias("k1"), F.col("seg").alias("s1")
    )
    h2 = seg.filter("half = 2").select(
        F.col("o_custkey").alias("k2"), F.col("seg").alias("s2")
    )
    return (
        h1.join(h2, F.col("k1") == F.col("k2"), "full_outer")
        .groupBy(
            F.coalesce("s1", F.lit("none")).alias("segment_before"),
            F.coalesce("s2", F.lit("none")).alias("segment_after"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
    )


@query(
    "orders_ship_aging_buckets",
    oracle="""
    WITH age AS (
      SELECT o.o_orderkey, o.o_orderpriority,
        datediff('day', o.o_orderdate, MIN(l.l_shipdate)) AS days_to_ship
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority AS priority,
      CASE
        WHEN days_to_ship <= 7 THEN 'a_0_7'
        WHEN days_to_ship <= 30 THEN 'b_8_30'
        WHEN days_to_ship <= 90 THEN 'c_31_90'
        ELSE 'd_over_90' END AS aging_bucket,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(MIN(days_to_ship) AS BIGINT) AS min_days,
      CAST(MAX(days_to_ship) AS BIGINT) AS max_days
    FROM age GROUP BY 1, 2
    """,
)
def orders_ship_aging_buckets(spark, sf_dir):
    """Receivables-style aging report for fulfillment: days from order to
    FIRST shipment, bucketed 0-7 / 8-30 / 31-90 / 90+ per priority class
    — the ops-review table that complements the latency percentiles with
    absolute SLA bands (bucket labels carry a sort prefix so every
    consumer orders them identically). One orderkey-keyed min-reduce
    over lineitem (co-partitioned with the orders join), then a
    bounded-cardinality rollup."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    age = (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(
            F.datediff(F.min("l_shipdate"), F.col("o_orderdate")).alias(
                "days_to_ship"
            )
        )
    )
    bucket = (
        F.when(F.col("days_to_ship") <= 7, "a_0_7")
        .when(F.col("days_to_ship") <= 30, "b_8_30")
        .when(F.col("days_to_ship") <= 90, "c_31_90")
        .otherwise("d_over_90")
    )
    return age.groupBy(
        F.col("o_orderpriority").alias("priority"), bucket.alias("aging_bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.min("days_to_ship").cast("bigint").alias("min_days"),
        F.max("days_to_ship").cast("bigint").alias("max_days"),
    )


@query(
    "events_new_vs_returning_value",
    oracle="""
    WITH fs AS (
      SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day
      FROM events GROUP BY user_id
    )
    SELECT CAST(date_trunc('day', e.ts) AS DATE) AS day,
      CASE WHEN CAST(date_trunc('day', e.ts) AS DATE) = fs.first_day
        THEN 'new' ELSE 'returning' END AS cohort,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
      CAST(SUM(CAST(e.value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM events e JOIN fs ON fs.user_id = e.user_id
    GROUP BY 1, 2
    """,
)
def events_new_vs_returning_value(spark, sf_dir):
    """Daily value split between NEW users (first-ever-seen that day) and
    RETURNING users — the first cut of any acquisition-vs-retention
    revenue question. The first-seen table is the same user-keyed
    min-reduce the growth operators share (persist it once in
    production); tagging is a user-keyed join, totals are decimal-exact,
    and the daily rollup is bounded by |days| x 2 rows."""
    e = table(spark, sf_dir, "events")
    fs = (
        e.select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("first_day"))
    )
    day = F.to_date(F.date_trunc("day", "ts"))
    return (
        e.join(fs, "user_id")
        .groupBy(
            day.alias("day"),
            F.when(day == F.col("first_day"), "new")
            .otherwise("returning")
            .alias("cohort"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
    )


@query(
    "events_anomaly_consensus",
    oracle="""
    WITH h AS (
      SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, hr
    ),
    stats AS (
      SELECT event_type,
        AVG(n) AS mu,
        CASE WHEN COUNT(*) > 1 THEN
          sqrt(SUM((n - mu2) * (n - mu2)) / (COUNT(*) - 1)) ELSE 0 END AS sd,
        med, mad
      FROM h
      JOIN (SELECT event_type AS et2, AVG(n) AS mu2,
              median(n) AS med FROM h GROUP BY 1) t2
        ON t2.et2 = h.event_type
      JOIN (SELECT h2.event_type AS et3,
              median(abs(h2.n - t3.med3)) AS mad
            FROM h h2 JOIN (SELECT event_type AS et4, median(n) AS med3
                            FROM h GROUP BY 1) t3 ON t3.et4 = h2.event_type
            GROUP BY 1) t4
        ON t4.et3 = h.event_type
      GROUP BY event_type, med, mad
    ),
    flagged AS (
      SELECT h.event_type, h.hr, h.n,
        CASE WHEN sd > 0 AND (h.n - mu) / sd > 3 THEN 1 ELSE 0 END AS f_z,
        CASE WHEN mad > 0 AND 0.6745 * (h.n - med) / mad > 3.5
          THEN 1 ELSE 0 END AS f_mad,
        CASE WHEN prev24 > 0 AND h.n > 2 * prev24 THEN 1 ELSE 0 END
          AS f_spike
      FROM (
        SELECT h.*, AVG(h.n) OVER (PARTITION BY event_type ORDER BY hr
          ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS prev24
        FROM h
      ) h JOIN stats USING (event_type)
    )
    SELECT event_type, hr, n,
      CAST(f_z + f_mad + f_spike AS INTEGER) AS n_detectors
    FROM flagged WHERE f_z + f_mad + f_spike >= 2
    """,
)
def events_anomaly_consensus(spark, sf_dir):
    """Ensemble anomaly detection on hourly volumes: an hour pages only
    when at least TWO independent detectors agree — parametric z-score
    (> 3 sigma), robust MAD z (> 3.5, the outlier-immune twin) and a
    trailing-24h rate spike (> 2x) — the consensus rule that kills the
    single-detector false-positive pages. Per-type global moments are
    tiny broadcast aggregates; the trailing baseline is a type-
    partitioned window; all three flags evaluate in one pass over the
    hourly rollup."""
    e = table(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type",
        F.floor(F.unix_micros("ts") / 3_600_000_000).cast("bigint").alias("hr"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    stats = h.groupBy("event_type").agg(
        F.avg("n").alias("mu"),
        F.stddev_samp("n").alias("sd"),
        F.percentile("n", 0.5).alias("med"),
    )
    mad = (
        h.join(stats.select("event_type", "med"), "event_type")
        .groupBy("event_type")
        .agg(F.percentile(F.abs(F.col("n") - F.col("med")), 0.5).alias("mad"))
    )
    w24 = (
        W.partitionBy("event_type").orderBy("hr").rowsBetween(-24, -1)
    )
    base = h.select(
        "event_type", "hr", "n", F.avg("n").over(w24).alias("prev24")
    )
    j = base.join(F.broadcast(stats), "event_type").join(
        F.broadcast(mad), "event_type"
    )
    f_z = (
        (F.col("sd") > 0)
        & ((F.col("n") - F.col("mu")) / F.col("sd") > 3)
    ).cast("int")
    f_mad = (
        (F.col("mad") > 0)
        & (0.6745 * (F.col("n") - F.col("med")) / F.col("mad") > 3.5)
    ).cast("int")
    f_spike = (
        (F.col("prev24") > 0) & (F.col("n") > 2 * F.col("prev24"))
    ).cast("int")
    return (
        j.select(
            "event_type",
            "hr",
            "n",
            (f_z + f_mad + f_spike).cast("int").alias("n_detectors"),
        )
        .filter(F.col("n_detectors") >= 2)
    )


@query(
    "ab_sample_ratio_mismatch",
    oracle="""
    WITH assign AS (
      SELECT user_id,
        CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
          AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    c AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM assign
    )
    SELECT n_a, n_b,
      round(n_a / CAST(n_a + n_b AS DOUBLE), 8) AS frac_a,
      round(pow(n_a - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
          + pow(n_b - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0), 8)
        AS chi2,
      (pow(n_a - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
          + pow(n_b - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0))
        > 3.841 AS srm_detected
    FROM c
    """,
)
def ab_sample_ratio_mismatch(spark, sf_dir):
    """Sample-ratio-mismatch guardrail (the first thing every experiment
    platform checks): users are hash-assigned 50/50 (deterministic md5,
    the same assignment a real bucketing service computes), the arm
    counts are chi-square-tested against the design ratio, and
    srm_detected fires at the 1-dof 5% critical value (3.841). An SRM
    means the assignment or logging pipeline is broken and every
    downstream metric comparison (ab_test_welch_*) is void — which is
    why this runs FIRST. One distinct-users reduce, one 2-cell rollup."""
    e = table(spark, sf_dir, "events")
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 2 == 0,
        "A",
    ).otherwise("B")
    assign = e.select("user_id").distinct().select(arm.alias("arm"))
    c = assign.agg(
        F.sum((F.col("arm") == "A").cast("int")).cast("bigint").alias("n_a"),
        F.sum((F.col("arm") == "B").cast("int")).cast("bigint").alias("n_b"),
    )
    half = (F.col("n_a") + F.col("n_b")) / 2.0
    chi2 = (
        F.pow(F.col("n_a") - half, 2) / half
        + F.pow(F.col("n_b") - half, 2) / half
    )
    return c.select(
        "n_a",
        "n_b",
        F.round(
            F.col("n_a") / (F.col("n_a") + F.col("n_b")).cast("double"), 8
        ).alias("frac_a"),
        F.round(chi2, 8).alias("chi2"),
        (chi2 > 3.841).alias("srm_detected"),
    )


@query(
    "moods_median_test_returnflag",
    oracle="""
    WITH med AS (
      SELECT median(l_extendedprice) AS m FROM lineitem
    ),
    c AS (
      SELECT l_returnflag AS flag,
        CAST(SUM(CASE WHEN l_extendedprice > m THEN 1 ELSE 0 END)
          AS BIGINT) AS n_above,
        CAST(SUM(CASE WHEN l_extendedprice <= m THEN 1 ELSE 0 END)
          AS BIGINT) AS n_below
      FROM lineitem CROSS JOIN med GROUP BY l_returnflag
    ),
    t AS (
      SELECT SUM(n_above) AS ta, SUM(n_below) AS tb,
        SUM(n_above + n_below) AS n
      FROM c
    )
    SELECT flag, n_above, n_below,
      round((n_above + n_below) * ta / CAST(n AS DOUBLE), 8)
        AS expected_above,
      round(pow(n_above - (n_above + n_below) * ta / CAST(n AS DOUBLE), 2)
          / ((n_above + n_below) * ta / CAST(n AS DOUBLE))
        + pow(n_below - (n_above + n_below) * tb / CAST(n AS DOUBLE), 2)
          / ((n_above + n_below) * tb / CAST(n AS DOUBLE)), 8)
        AS chi2_contrib
    FROM c CROSS JOIN t
    """,
)
def moods_median_test_returnflag(spark, sf_dir):
    """Mood's median test (the nonparametric location test next to the
    parametric Welch t): each return-flag group's counts above/below the
    GLOBAL median price, with expected counts and per-group chi-square
    contributions under the no-difference null — robust to the heavy
    price tails that invalidate a t-test's normality lean.

    The global median is one exact percentile aggregate (typed sort
    buffers, partial-merged), broadcast into a pure-map classification;
    counts are exact integers and only the expected/chi2 columns are
    doubles. Sum the contributions and compare to chi2(k-1) to finish
    the test."""
    l = table(spark, sf_dir, "lineitem")
    med = F.broadcast(l.agg(F.percentile("l_extendedprice", 0.5).alias("m")))
    c = (
        l.crossJoin(med)
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum((F.col("l_extendedprice") > F.col("m")).cast("int"))
            .cast("bigint")
            .alias("n_above"),
            F.sum((F.col("l_extendedprice") <= F.col("m")).cast("int"))
            .cast("bigint")
            .alias("n_below"),
        )
    )
    t = F.broadcast(
        c.agg(
            F.sum("n_above").alias("ta"),
            F.sum("n_below").alias("tb"),
            F.sum(F.col("n_above") + F.col("n_below")).alias("n"),
        )
    )
    row_n = F.col("n_above") + F.col("n_below")
    exp_a = row_n * F.col("ta") / F.col("n").cast("double")
    exp_b = row_n * F.col("tb") / F.col("n").cast("double")
    return c.crossJoin(t).select(
        "flag",
        "n_above",
        "n_below",
        F.round(exp_a, 8).alias("expected_above"),
        F.round(
            F.pow(F.col("n_above") - exp_a, 2) / exp_a
            + F.pow(F.col("n_below") - exp_b, 2) / exp_b,
            8,
        ).alias("chi2_contrib"),
    )


# ------------------------------------------- Mann-Whitney U (rank-sum test)


@query(
    "mannwhitney_u_click_vs_view",
    oracle="""
    WITH e AS (
      SELECT value, event_type FROM events
      WHERE event_type IN ('click', 'view')
    ),
    v AS (
      SELECT value,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
          AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
          AS BIGINT) AS n2
      FROM e GROUP BY value
    ),
    r AS (
      SELECT n1, n2, n1 + n2 AS n,
        SUM(n1 + n2) OVER (
          ORDER BY value
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM v
    ),
    s AS (
      SELECT SUM(n1) AS big_n1, SUM(n2) AS big_n2,
        SUM(n1 * (2 * (cum - n) + n + 1)) AS two_r1,
        SUM(n * n * n - n) AS tsum
      FROM r
    )
    SELECT CAST(big_n1 AS BIGINT) AS n_click,
      CAST(big_n2 AS BIGINT) AS n_view,
      round(CAST(two_r1 AS DOUBLE) / 2.0
        - CAST(big_n1 AS DOUBLE) * (big_n1 + 1) / 2.0, 4) AS u_stat,
      round((CAST(two_r1 AS DOUBLE) / 2.0
          - CAST(big_n1 AS DOUBLE) * (big_n1 + 1) / 2.0
          - CAST(big_n1 AS DOUBLE) * big_n2 / 2.0)
        / sqrt(CAST(big_n1 AS DOUBLE) * big_n2 / 12.0
          * ((big_n1 + big_n2 + 1)
            - CAST(tsum AS DOUBLE)
              / (CAST(big_n1 + big_n2 AS DOUBLE)
                 * (big_n1 + big_n2 - 1)))), 8) AS z_score
    FROM s
    """,
)
def mannwhitney_u_click_vs_view(spark, sf_dir):
    """Mann-Whitney U rank-sum test of click vs view event values — the
    nonparametric two-sample sibling of ab_test_welch_click_vs_view
    (median-shift, not mean-shift; immune to the heavy tails that break
    the t-test). Reports U for the click sample and the tie-corrected
    normal-approximation z.

    Scale shape: NO global row-level ranking. Rows collapse to the
    distinct-value table first (one groupBy), average ranks come from a
    cumulative count over distinct values via the bucketed prefix-sum
    kernel (functions/prefix.py — the only single-partition window is
    over n_buckets rows), and every statistic is an exact integer sum:
    2*R1 = sum n1*(2*cum_below + n + 1) stays integral, so both engines
    divide the same exact integers into doubles at the very end. Tie
    correction sum(t^3 - t) rides the same aggregate. The distinct-value
    collapse fans out of the one-task scan, hash-partitioned on the
    group key (value)."""
    e = fanout(
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select("value", "event_type"),
        "value",
    )
    v = e.groupBy("value").agg(
        F.sum((F.col("event_type") == "click").cast("int"))
        .cast("bigint")
        .alias("n1"),
        F.sum((F.col("event_type") == "view").cast("int"))
        .cast("bigint")
        .alias("n2"),
    )
    v = v.withColumn("n", F.col("n1") + F.col("n2"))
    r = bucketed_prefix_sums(v, "value", ["n"])
    s = r.agg(
        F.sum("n1").alias("big_n1"),
        F.sum("n2").alias("big_n2"),
        F.sum(
            F.col("n1")
            * (2 * (F.col("cum_n") - F.col("n")) + F.col("n") + 1)
        ).alias("two_r1"),
        F.sum(
            F.col("n") * F.col("n") * F.col("n") - F.col("n")
        ).alias("tsum"),
    )
    n1d = F.col("big_n1").cast("double")
    n2d = F.col("big_n2").cast("double")
    u1 = F.col("two_r1").cast("double") / 2.0 - n1d * (
        F.col("big_n1") + 1
    ) / 2.0
    big_n = F.col("big_n1") + F.col("big_n2")
    sigma = F.sqrt(
        n1d
        * F.col("big_n2")
        / 12.0
        * (
            (big_n + 1)
            - F.col("tsum").cast("double")
            / (big_n.cast("double") * (big_n - 1))
        )
    )
    return s.select(
        F.col("big_n1").alias("n_click"),
        F.col("big_n2").alias("n_view"),
        F.round(u1, 4).alias("u_stat"),
        F.round((u1 - n1d * n2d / 2.0) / sigma, 8).alias("z_score"),
    )


# ------------------------------------- Kruskal-Wallis H (k-sample ranks)


@query(
    "kruskal_wallis_ship_latency",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority,
        CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS delay_d
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    pv AS (
      SELECT o_orderpriority, delay_d, COUNT(*)::BIGINT AS c
      FROM d GROUP BY o_orderpriority, delay_d
    ),
    v AS (
      SELECT delay_d, SUM(c)::BIGINT AS n FROM pv GROUP BY delay_d
    ),
    r AS (
      SELECT delay_d, n,
        SUM(n) OVER (ORDER BY delay_d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM v
    ),
    g AS (
      SELECT o_orderpriority, SUM(c) AS n_g,
        SUM(c * (2 * (cum - n) + n + 1)) AS two_r
      FROM pv JOIN r USING (delay_d) GROUP BY o_orderpriority
    ),
    tot AS (
      SELECT SUM(n) AS big_n, SUM(n * n * n - n) AS tsum FROM r
    ),
    h AS (
      SELECT SUM(CAST(round(
          CAST(two_r AS DOUBLE) * two_r / 4.0 / n_g, 4)
        AS DECIMAL(38,6))) AS ssum
      FROM g
    )
    SELECT o_orderpriority, CAST(n_g AS BIGINT) AS n_items,
      round(CAST(two_r AS DOUBLE) / 2.0, 2) AS rank_sum,
      round(CAST(two_r AS DOUBLE) / 2.0 / n_g, 6) AS mean_rank,
      round(12.0 / (CAST(big_n AS DOUBLE) * (big_n + 1))
          * CAST(ssum AS DOUBLE) - 3.0 * (big_n + 1), 8) AS h_stat,
      round((12.0 / (CAST(big_n AS DOUBLE) * (big_n + 1))
          * CAST(ssum AS DOUBLE) - 3.0 * (big_n + 1))
        / (1.0 - CAST(tsum AS DOUBLE)
          / (CAST(big_n AS DOUBLE) * big_n * big_n - big_n)), 8)
        AS h_tie_corrected
    FROM g CROSS JOIN tot CROSS JOIN h
    """,
)
def kruskal_wallis_ship_latency(spark, sf_dir):
    """Kruskal-Wallis H test: do order-to-ship latencies differ across
    the five order priorities? The k-sample generalization of
    mannwhitney_u_click_vs_view — one rank-based ANOVA on the latency
    distribution, tie-corrected (integer day deltas tie heavily).

    Scale shape: rows collapse to (priority, delay) counts, then to the
    distinct-delay table (bounded — day deltas span ~4 months), so the
    ranking window runs over a few hundred rows regardless of corpus
    size. Rank sums stay exact integers (2*R_g), the per-group R^2/n
    contributions are rounded then decimal-summed (order-independent),
    and both engines assemble H from the same exact pieces.

    Both scan sides fan out hash-partitioned on the join key (identity
    at cluster scale): the 32-way partitionings co-satisfy the join's
    distribution requirement, so the fan-out adds no exchange beyond
    the ones the join needed anyway while the datediff + count map work
    leaves the one-task scan stage."""
    l = fanout(
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate"),
        "l_orderkey",
    )
    o = fanout(
        table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate", "o_orderpriority"
        ),
        "o_orderkey",
    )
    d = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("delay_d"),
    )
    # persist the collapsed (priority, delay) count table (a few hundred
    # rows at any scale): its consumers live in SEPARATE executions (the
    # r/tot/h broadcast builds below), where AQE exchange reuse cannot
    # reach — without the persist the 600k-row lineitem⋈orders pipeline
    # re-executed 5x per action (5 lineitem + 5 orders scans in the
    # round-12 before plan; guide §5, the lp-eval lesson — the harness
    # frees the frame between queries via release_foreign_storage).
    pv = d.groupBy("o_orderpriority", "delay_d").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).persist()
    v = pv.groupBy("delay_d").agg(F.sum("c").cast("bigint").alias("n"))
    w = W.orderBy("delay_d").rowsBetween(W.unboundedPreceding, 0)
    r = v.withColumn("cum", F.sum("n").over(w))
    g = (
        pv.join(F.broadcast(r), "delay_d")
        .groupBy("o_orderpriority")
        .agg(
            F.sum("c").alias("n_g"),
            F.sum(
                F.col("c")
                * (2 * (F.col("cum") - F.col("n")) + F.col("n") + 1)
            ).alias("two_r"),
        )
    )
    tot = F.broadcast(
        r.agg(
            F.sum("n").alias("big_n"),
            F.sum(F.col("n") * F.col("n") * F.col("n") - F.col("n")).alias(
                "tsum"
            ),
        )
    )
    h = F.broadcast(
        g.agg(
            F.sum(
                F.round(
                    F.col("two_r").cast("double")
                    * F.col("two_r")
                    / 4.0
                    / F.col("n_g"),
                    4,
                ).cast("decimal(38,6)")
            ).alias("ssum")
        )
    )
    bn = F.col("big_n").cast("double")
    h_stat = (
        12.0 / (bn * (F.col("big_n") + 1)) * F.col("ssum").cast("double")
        - 3.0 * (F.col("big_n") + 1)
    )
    h_corr = h_stat / (
        1.0
        - F.col("tsum").cast("double")
        / (bn * F.col("big_n") * F.col("big_n") - F.col("big_n"))
    )
    return (
        g.crossJoin(tot)
        .crossJoin(h)
        .select(
            "o_orderpriority",
            F.col("n_g").cast("bigint").alias("n_items"),
            F.round(F.col("two_r").cast("double") / 2.0, 2).alias("rank_sum"),
            F.round(
                F.col("two_r").cast("double") / 2.0 / F.col("n_g"), 6
            ).alias("mean_rank"),
            F.round(h_stat, 8).alias("h_stat"),
            F.round(h_corr, 8).alias("h_tie_corrected"),
        )
    )


# --------------------------------- Theil inequality decomposition


@query(
    "theil_index_nation_spend",
    oracle="""
    WITH x AS (
      SELECT o_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS spend
      FROM orders GROUP BY o_custkey
    ),
    xn AS (
      SELECT n_name, spend
      FROM x JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
    ),
    tot AS (
      SELECT CAST(SUM(CAST(spend AS DECIMAL(28,6))) AS DOUBLE) AS big_x,
             COUNT(*)::BIGINT AS big_n
      FROM xn
    ),
    g AS (
      SELECT n_name, COUNT(*)::BIGINT AS n_g,
        CAST(SUM(CAST(spend AS DECIMAL(28,6))) AS DOUBLE) AS x_g,
        CAST(SUM(CAST(round(
            spend * ln(spend), 6) AS DECIMAL(38,10))) AS DOUBLE) AS sxlx
      FROM xn GROUP BY n_name
    ),
    per AS (
      SELECT n_name, n_g, x_g, big_x, big_n,
        x_g / big_x AS share,
        (sxlx / x_g) - ln(x_g / n_g) AS t_within,
        (x_g / big_x) * ln((x_g / n_g) / (big_x / big_n)) AS t_between
      FROM g CROSS JOIN tot
    ),
    total AS (
      SELECT CAST(SUM(CAST(round(
          t_between + share * t_within, 10) AS DECIMAL(38,12)))
        AS DOUBLE) AS theil_total
      FROM per
    )
    SELECT n_name, n_g AS n_customers,
      round(share, 8) AS income_share,
      round(t_within, 8) AS theil_within,
      round(t_between, 8) AS between_contrib,
      round(theil_total, 8) AS theil_total
    FROM per CROSS JOIN total
    """,
)
def theil_index_nation_spend(spark, sf_dir):
    """Theil-T inequality index of customer lifetime spend, decomposed
    by nation: T = sum_g share_g*ln(mu_g/mu) (between) + sum_g share_g *
    T_within_g — the additive inequality decomposition Gini cannot do
    (order_value_gini is the sibling). Answers "is spend inequality a
    between-market or within-market phenomenon?".

    Determinism recipe (functions/exact.py): per-customer spend is a
    decimal-exact sum; the only transcendental, x*ln(x), is computed
    per row in double (rounded to 6 before the decimal sum, absorbing
    any last-ulp libm difference), and T_within_g = E[x ln x]/mu_g -
    ln(mu_g) uses one algebraic form in both engines. Three aggregates
    total: per-customer, per-nation, one 25-row rollup — the grand
    totals broadcast back, so nothing beyond the orders groupBy
    shuffles at scale.

    Round-11: the orders scan fans out keyed on the group key — the
    per-customer decimal sum's map side ran on the one-task
    single-row-group scan, and the fan-out IS the aggregation exchange
    at bench scale."""
    o = fanout(
        table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        "o_custkey",
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    x = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("spend")
    )
    xn = (
        x.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "spend")
    )
    tot = F.broadcast(
        xn.agg(
            F.sum(F.col("spend").cast(DEC)).cast("double").alias("big_x"),
            F.count(F.lit(1)).cast("bigint").alias("big_n"),
        )
    )
    g = xn.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(F.col("spend").cast(DEC)).cast("double").alias("x_g"),
        F.sum(
            F.round(F.col("spend") * F.log(F.col("spend")), 6).cast(
                "decimal(38,10)"
            )
        )
        .cast("double")
        .alias("sxlx"),
    )
    share = F.col("x_g") / F.col("big_x")
    t_within = (F.col("sxlx") / F.col("x_g")) - F.log(
        F.col("x_g") / F.col("n_g")
    )
    t_between = share * F.log(
        (F.col("x_g") / F.col("n_g")) / (F.col("big_x") / F.col("big_n"))
    )
    per = g.crossJoin(tot).select(
        "n_name",
        "n_g",
        share.alias("share"),
        t_within.alias("t_within"),
        t_between.alias("t_between"),
    )
    total = F.broadcast(
        per.agg(
            F.sum(
                F.round(
                    F.col("t_between") + F.col("share") * F.col("t_within"),
                    10,
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("theil_total")
        )
    )
    return per.crossJoin(total).select(
        "n_name",
        F.col("n_g").alias("n_customers"),
        F.round("share", 8).alias("income_share"),
        F.round("t_within", 8).alias("theil_within"),
        F.round("t_between", 8).alias("between_contrib"),
        F.round("theil_total", 8).alias("theil_total"),
    )


# ------------------------------------------------- t-closeness audit

T_CLOSENESS_T = 0.2


@query(
    "t_closeness_report",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
        CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
        COUNT(*)::BIGINT AS c
      FROM customer GROUP BY 1, 2, 3
    ),
    qi AS (
      SELECT c_nationkey, c_mktsegment, SUM(c)::BIGINT AS n_g
      FROM g GROUP BY 1, 2
    ),
    gb AS (SELECT band, SUM(c)::BIGINT AS cb FROM g GROUP BY 1),
    tot AS (
      SELECT SUM(c)::BIGINT AS n, COUNT(DISTINCT band)::BIGINT AS k FROM g
    ),
    grid AS (
      SELECT qi.c_nationkey, qi.c_mktsegment, qi.n_g, gb.band, gb.cb,
        tot.n, tot.k, COALESCE(g.c, 0) AS c
      FROM qi CROSS JOIN gb CROSS JOIN tot
      LEFT JOIN g ON g.c_nationkey = qi.c_nationkey
        AND g.c_mktsegment = qi.c_mktsegment AND g.band = gb.band
    ),
    cum AS (
      SELECT c_nationkey, c_mktsegment, n_g, n, k,
        SUM(c * n - cb * n_g) OVER (
          PARTITION BY c_nationkey, c_mktsegment ORDER BY band
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
      FROM grid
    ),
    t AS (
      SELECT c_nationkey, c_mktsegment, n_g,
        SUM(ABS(cn)) AS s, MAX(n) AS n, MAX(k) AS k
      FROM cum GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, c_mktsegment, n_g AS n_rows,
      round(CAST(s AS DOUBLE) / (CAST(k - 1 AS DOUBLE) * n_g * n), 8)
        AS t_closeness,
      (CAST(s AS DOUBLE) / (CAST(k - 1 AS DOUBLE) * n_g * n))
        > {T_CLOSENESS_T} AS exceeds_t
    FROM t
    """,
)
def t_closeness_report(spark, sf_dir):
    """t-closeness audit (Li et al.) — the distributional upgrade of
    k_anonymity_report: for each quasi-identifier group (nation, market
    segment), the ordered-bucket Earth Mover's Distance between the
    group's sensitive-attribute distribution (account-balance band) and
    the global one. k-anonymous groups can still leak ("everyone in
    this group is broke"); t-closeness catches exactly that.

    EMD over ordered buckets = (1/(k-1)) * sum_b |cumulative
    (p_b - q_b)|. The plan keeps it EXACT until the last divide: the
    per-band difference c/n_g - C_b/N becomes the integer numerator
    c*N - C_b*n_g, cumulated by a window whose partitions are bounded
    by the band count, so t = sum|cum| / ((k-1)*n_g*N) is one integer
    division per group. Zero-count cells come from a tiny QI x band
    grid fanned out of broadcast marginals."""
    c = table(spark, sf_dir, "customer")
    g = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("band"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    qi = g.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("c").cast("bigint").alias("n_g")
    )
    gb = g.groupBy("band").agg(F.sum("c").cast("bigint").alias("cb"))
    tot = g.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count_distinct("band").cast("bigint").alias("k"),
    )
    grid = (
        qi.crossJoin(F.broadcast(gb))
        .crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(g), ["c_nationkey", "c_mktsegment", "band"], "left"
        )
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )
    w = (
        W.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = grid.withColumn(
        "cn",
        F.sum(F.col("c") * F.col("n") - F.col("cb") * F.col("n_g")).over(w),
    )
    t = cum.groupBy("c_nationkey", "c_mktsegment", "n_g").agg(
        F.sum(F.abs("cn")).alias("s"),
        F.max("n").alias("n"),
        F.max("k").alias("k"),
    )
    tval = F.col("s").cast("double") / (
        (F.col("k") - 1).cast("double") * F.col("n_g") * F.col("n")
    )
    return t.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("n_g").alias("n_rows"),
        F.round(tval, 8).alias("t_closeness"),
        (tval > T_CLOSENESS_T).alias("exceeds_t"),
    )


# --------------------------------------- Spearman rank correlation


@query(
    "spearman_qty_discount",
    oracle="""
    WITH pv AS (
      SELECT l_quantity AS x, l_discount AS y, COUNT(*)::BIGINT AS c
      FROM lineitem GROUP BY 1, 2
    ),
    vx AS (
      SELECT x, n, 2 * (cum - n) + n + 1 AS two_rx FROM (
        SELECT x, SUM(c)::BIGINT AS n,
          SUM(SUM(c)) OVER (ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM pv GROUP BY x)
    ),
    vy AS (
      SELECT y, n, 2 * (cum - n) + n + 1 AS two_ry FROM (
        SELECT y, SUM(c)::BIGINT AS n,
          SUM(SUM(c)) OVER (ORDER BY y
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM pv GROUP BY y)
    ),
    s AS (
      SELECT SUM(c) AS n,
        CAST(SUM(c * two_rx) AS DOUBLE) AS sx,
        CAST(SUM(c * two_ry) AS DOUBLE) AS sy,
        CAST(SUM(c * two_rx * two_rx) AS DOUBLE) AS sxx,
        CAST(SUM(c * two_ry * two_ry) AS DOUBLE) AS syy,
        CAST(SUM(c * two_rx * two_ry) AS DOUBLE) AS sxy
      FROM pv JOIN vx USING (x) JOIN vy USING (y)
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
      round((CAST(n AS DOUBLE) * sxy - sx * sy)
        / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
             * (CAST(n AS DOUBLE) * syy - sy * sy)), 8) AS spearman_rho
    FROM s
    """,
)
def spearman_qty_discount(spark, sf_dir):
    """Spearman rank correlation between line-item quantity and
    discount — the monotonic-association sibling of the Pearson
    lineitem_corr_matrix (ties handled by average ranks, as the
    tie-heavy integer/centile columns demand).

    Scale shape: NO global row ranking. Rows collapse to the
    (quantity, discount) pair-count table; average ranks come from each
    marginal's cumulative count (windows over the bounded distinct-value
    lists), and rho is Pearson over doubled ranks (2r stays integral) —
    six exact sums cast to double once, at the end. At 100 TB the only
    real shuffle is the first pair-count aggregate."""
    l = table(spark, sf_dir, "lineitem")
    pv = l.groupBy(
        F.col("l_quantity").alias("x"), F.col("l_discount").alias("y")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))

    def marginal(col, rank_name):
        w = W.orderBy(col).rowsBetween(W.unboundedPreceding, 0)
        m = pv.groupBy(col).agg(F.sum("c").cast("bigint").alias("n"))
        m = m.withColumn("cum", F.sum("n").over(w))
        return m.select(
            col,
            (2 * (F.col("cum") - F.col("n")) + F.col("n") + 1).alias(
                rank_name
            ),
        )

    j = pv.join(F.broadcast(marginal("x", "two_rx")), "x").join(
        F.broadcast(marginal("y", "two_ry")), "y"
    )
    s = j.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("two_rx")).cast("double").alias("sx"),
        F.sum(F.col("c") * F.col("two_ry")).cast("double").alias("sy"),
        F.sum(F.col("c") * F.col("two_rx") * F.col("two_rx"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("c") * F.col("two_ry") * F.col("two_ry"))
        .cast("double")
        .alias("syy"),
        F.sum(F.col("c") * F.col("two_rx") * F.col("two_ry"))
        .cast("double")
        .alias("sxy"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(
            (nd * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (nd * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (nd * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            8,
        ).alias("spearman_rho"),
    )


# ------------------------------------- categorical effect-size pack


@query(
    "events_type_dow_effect_size",
    oracle="""
    WITH o AS (
      SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
        COUNT(*)::BIGINT AS c
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, SUM(c)::BIGINT AS rn FROM o GROUP BY 1),
    ct AS (SELECT dow, SUM(c)::BIGINT AS cn FROM o GROUP BY 1),
    tot AS (
      SELECT SUM(c)::BIGINT AS n,
        COUNT(DISTINCT event_type)::BIGINT AS r,
        COUNT(DISTINCT dow)::BIGINT AS k
      FROM o
    ),
    grid AS (
      SELECT rt.rn, ct.cn, tot.n, tot.r, tot.k, COALESCE(o.c, 0) AS c
      FROM rt CROSS JOIN ct CROSS JOIN tot
      LEFT JOIN o ON o.event_type = rt.event_type AND o.dow = ct.dow
    ),
    chi AS (
      SELECT MAX(n) AS n, MAX(r) AS r, MAX(k) AS k,
        CAST(SUM(CAST(round(
          pow(c - CAST(rn AS DOUBLE) * cn / n, 2)
            / (CAST(rn AS DOUBLE) * cn / n), 8) AS DECIMAL(38,10)))
          AS DOUBLE) AS chi2
      FROM grid
    )
    SELECT CAST(n AS BIGINT) AS n_rows, r AS n_types, k AS n_days,
      round(chi2, 6) AS chi2,
      round(sqrt(chi2 / (n * (CASE WHEN r < k THEN r ELSE k END - 1))), 8)
        AS cramers_v,
      round(sqrt(chi2 / (n * sqrt(CAST((r - 1) * (k - 1) AS DOUBLE)))), 8)
        AS tschuprow_t,
      round(sqrt(chi2 / (chi2 + n)), 8) AS contingency_coef
    FROM chi
    """,
)
def events_type_dow_effect_size(spark, sf_dir):
    """Effect-size pack for the event-type x day-of-week association:
    chi-square plus the three normalized strengths — Cramér's V,
    Tschuprow's T, Pearson's contingency coefficient. lang_source_chi2
    answers "is there any association?"; at 100 TB-scale row counts
    EVERYTHING is significant, so the effect size is the number an
    analyst can actually act on.

    One (type, dow) count aggregate; marginals and the zero-cell-safe
    grid are broadcast-bounded; per-cell chi-square contributions are
    rounded then decimal-summed (order-independent). dayofweek() and
    Spark's dayofweek agree on 1=Sunday."""
    e = table(spark, sf_dir, "events")
    o = e.groupBy(
        "event_type", F.dayofweek("ts").cast("bigint").alias("dow")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    rt = o.groupBy("event_type").agg(F.sum("c").cast("bigint").alias("rn"))
    ct = o.groupBy("dow").agg(F.sum("c").cast("bigint").alias("cn"))
    tot = o.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count_distinct("event_type").cast("bigint").alias("r"),
        F.count_distinct("dow").cast("bigint").alias("k"),
    )
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(o), ["event_type", "dow"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )
    e_cell = F.col("rn").cast("double") * F.col("cn") / F.col("n")
    chi = grid.agg(
        F.max("n").alias("n"),
        F.max("r").alias("r"),
        F.max("k").alias("k"),
        F.sum(
            F.round(F.pow(F.col("c") - e_cell, 2) / e_cell, 8).cast(
                "decimal(38,10)"
            )
        )
        .cast("double")
        .alias("chi2"),
    )
    mind = F.when(F.col("r") < F.col("k"), F.col("r")).otherwise(F.col("k"))
    return chi.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("r").alias("n_types"),
        F.col("k").alias("n_days"),
        F.round("chi2", 6).alias("chi2"),
        F.round(F.sqrt(F.col("chi2") / (F.col("n") * (mind - 1))), 8).alias(
            "cramers_v"
        ),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("n")
                    * F.sqrt(
                        ((F.col("r") - 1) * (F.col("k") - 1)).cast("double")
                    )
                )
            ),
            8,
        ).alias("tschuprow_t"),
        F.round(F.sqrt(F.col("chi2") / (F.col("chi2") + F.col("n"))), 8).alias(
            "contingency_coef"
        ),
    )


# ------------------------------------- per-brand log-log price elasticity


@query(
    "price_elasticity_by_brand",
    oracle="""
    WITH xy AS (
      SELECT p_brand,
        round(ln(l_extendedprice / l_quantity), 10) AS x,
        round(ln(l_quantity), 10) AS y
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    s AS (
      SELECT p_brand, COUNT(*)::BIGINT AS n,
        CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(round(x * x, 10) AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(round(y * y, 10) AS DECIMAL(28,12))) AS DOUBLE) AS syy,
        CAST(SUM(CAST(round(x * y, 10) AS DECIMAL(28,12))) AS DOUBLE) AS sxy
      FROM xy GROUP BY p_brand
    )
    SELECT p_brand, n AS n_items,
      round((n * sxy - sx * sy) / (n * sxx - sx * sx), 8) AS elasticity,
      round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 8)
        AS intercept,
      round(pow(n * sxy - sx * sy, 2)
        / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 8) AS r2
    FROM s
    """,
)
def price_elasticity_by_brand(spark, sf_dir):
    """Per-brand log-log demand regression: slope of ln(quantity) on
    ln(unit price) — the price-elasticity estimate a pricing team runs
    per catalog brand (grouped OLS; the corpus-wide
    lineitem_ols_regression is the single-model sibling). Also reports
    intercept and R^2 so inelastic-but-noisy brands are visible.

    Scale shape: the fact-to-part equi-join is the only real shuffle;
    the five OLS sufficient statistics are per-row doubles rounded to
    10 decimals then decimal-summed per brand (order-independent,
    absorbs libm ulp skew), and the closed-form slope uses one
    expression order in both engines."""
    l = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    xy = l.join(p, F.col("l_partkey") == F.col("p_partkey")).select(
        "p_brand",
        F.round(
            F.log(F.col("l_extendedprice") / F.col("l_quantity")), 10
        ).alias("x"),
        F.round(F.log("l_quantity"), 10).alias("y"),
    )
    D = "decimal(28,12)"
    s = xy.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(D)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(D)).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 10).cast(D))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("y") * F.col("y"), 10).cast(D))
        .cast("double")
        .alias("syy"),
        F.sum(F.round(F.col("x") * F.col("y"), 10).cast(D))
        .cast("double")
        .alias("sxy"),
    )
    nd = F.col("n")
    slope = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "p_brand",
        F.col("n").alias("n_items"),
        F.round(slope, 8).alias("elasticity"),
        F.round((F.col("sy") - slope * F.col("sx")) / nd, 8).alias(
            "intercept"
        ),
        F.round(
            F.pow(nd * F.col("sxy") - F.col("sx") * F.col("sy"), 2)
            / (
                (nd * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (nd * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            8,
        ).alias("r2"),
    )


# --------------------------------------- Nelson-Aalen cumulative hazard


@query(
    "customer_hazard_nelson_aalen",
    oracle=f"""
    WITH life AS (
      SELECT o_custkey,
        datediff('day', MIN(o_orderdate), MAX(o_orderdate)) AS dur,
        MAX(o_orderdate) AS last_d
      FROM orders GROUP BY o_custkey
    ),
    mx AS (SELECT MAX(o_orderdate) AS m FROM orders),
    obs AS (
      SELECT dur,
        CASE WHEN datediff('day', last_d, m) <= {KM_CENSOR_DAYS}
          THEN 0 ELSE 1 END AS event
      FROM life CROSS JOIN mx
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM obs),
    byt AS (
      SELECT dur, CAST(SUM(event) AS BIGINT) AS d,
        CAST(COUNT(*) AS BIGINT) AS leave
      FROM obs GROUP BY dur
    ),
    risk AS (
      SELECT dur, d,
        n - COALESCE(SUM(leave) OVER (ORDER BY dur
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      FROM byt CROSS JOIN tot
    )
    SELECT dur AS t_days, d AS n_churned,
      CAST(n_risk AS BIGINT) AS n_at_risk,
      round(SUM(d / CAST(n_risk AS DOUBLE)) OVER w, 8) AS cum_hazard,
      round(SUM(d / (CAST(n_risk AS DOUBLE) * n_risk)) OVER w, 10)
        AS hazard_var,
      round(exp(-SUM(d / CAST(n_risk AS DOUBLE)) OVER w), 8) AS survival_fh
    FROM risk WHERE d > 0
    WINDOW w AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def customer_hazard_nelson_aalen(spark, sf_dir):
    """Nelson-Aalen cumulative hazard H(t) = sum d_i/n_i over event
    times, with its Poisson variance and the Fleming-Harrington
    survival exp(-H) — the estimator-of-choice companion to
    customer_survival_km when hazard RATES (not just survival levels)
    are the question, and better-behaved than KM in small risk sets.

    Same censoring rule and risk-set machinery as the KM curve (one
    per-customer min/max shuffle, then prefix sums over the bounded
    distinct-duration table); each d/n increment is rounded before the
    ordered running sum so both engines accumulate identical doubles
    in an identical order."""
    o = table(spark, sf_dir, "orders")
    life = o.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("dur"),
        F.max("o_orderdate").alias("last_d"),
    )
    mx = F.broadcast(o.agg(F.max("o_orderdate").alias("m")))
    obs = life.crossJoin(mx).select(
        "dur",
        F.when(F.datediff("m", "last_d") <= KM_CENSOR_DAYS, 0)
        .otherwise(1)
        .alias("event"),
    )
    tot = F.broadcast(obs.agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    byt = obs.groupBy("dur").agg(
        F.sum("event").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("leave"),
    )
    w_prev = W.orderBy("dur").rowsBetween(W.unboundedPreceding, -1)
    w_run = W.orderBy("dur").rowsBetween(W.unboundedPreceding, 0)
    risk = byt.crossJoin(tot).select(
        "dur",
        "d",
        (
            F.col("n") - F.coalesce(F.sum("leave").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    nrd = F.col("n_risk").cast("double")
    haz = F.sum(F.col("d") / nrd).over(w_run)
    var = F.sum(F.col("d") / (nrd * F.col("n_risk"))).over(w_run)
    return (
        risk.select(
            F.col("dur").alias("t_days"),
            F.col("d").alias("n_churned"),
            F.col("n_risk").cast("bigint").alias("n_at_risk"),
            F.round(haz, 8).alias("cum_hazard"),
            F.round(var, 10).alias("hazard_var"),
            F.round(F.exp(-haz), 8).alias("survival_fh"),
            "d",
        )
        .filter(F.col("d") > 0)
        .drop("d")
    )


# --------------------------------------- Neyman stratified allocation

NEYMAN_BUDGET = 10_000


@query(
    "stratified_neyman_allocation",
    oracle=f"""
    WITH s AS (
      SELECT source, COUNT(*)::BIGINT AS n_h,
        SUM(n_chars) AS sy, SUM(n_chars * n_chars) AS syy
      FROM documents GROUP BY source
    ),
    sd AS (
      SELECT source, n_h,
        sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n_h) / n_h)
          AS sigma
      FROM s
    ),
    tot AS (
      SELECT CAST(SUM(CAST(round(n_h * sigma, 6) AS DECIMAL(38,8)))
        AS DOUBLE) AS denom, SUM(n_h) AS big_n
      FROM sd
    )
    SELECT source, n_h AS n_docs, round(sigma, 6) AS stddev_chars,
      round(n_h * sigma / denom, 8) AS alloc_share,
      CAST(round({NEYMAN_BUDGET} * n_h * sigma / denom, 0) AS BIGINT)
        AS alloc_n,
      CAST(round({NEYMAN_BUDGET} * n_h / CAST(big_n AS DOUBLE), 0) AS BIGINT)
        AS proportional_n
    FROM sd CROSS JOIN tot
    """,
)
def stratified_neyman_allocation(spark, sf_dir):
    """Neyman-optimal stratified sample allocation over document
    sources: n_h proportional to N_h * sigma_h (stratum size times
    length stddev), side-by-side with naive proportional allocation —
    the design table behind every audit/eval sample drawn from a
    heterogeneous corpus (high-variance sources earn more of the
    {NEYMAN_BUDGET}-row budget; mixture_sample_by_source is the
    executor this table parameterizes).

    One per-source aggregate of exact integer sums (n_chars is BIGINT,
    so sum and sum-of-squares are exact); sigma is a single sqrt of
    those integers in double, the 20-row denominator is a
    round-then-decimal sum, and everything broadcasts."""
    d = table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum("n_chars").alias("sy"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("syy"),
    )
    sigma = F.sqrt(
        (
            F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy") / F.col("n_h")
        )
        / F.col("n_h")
    )
    sd = s.select("source", "n_h", sigma.alias("sigma"))
    tot = F.broadcast(
        sd.agg(
            F.sum(
                F.round(F.col("n_h") * F.col("sigma"), 6).cast(
                    "decimal(38,8)"
                )
            )
            .cast("double")
            .alias("denom"),
            F.sum("n_h").alias("big_n"),
        )
    )
    return sd.crossJoin(tot).select(
        "source",
        F.col("n_h").alias("n_docs"),
        F.round("sigma", 6).alias("stddev_chars"),
        F.round(F.col("n_h") * F.col("sigma") / F.col("denom"), 8).alias(
            "alloc_share"
        ),
        F.round(
            NEYMAN_BUDGET * F.col("n_h") * F.col("sigma") / F.col("denom"), 0
        )
        .cast("bigint")
        .alias("alloc_n"),
        F.round(
            NEYMAN_BUDGET * F.col("n_h") / F.col("big_n").cast("double"), 0
        )
        .cast("bigint")
        .alias("proportional_n"),
    )


# ------------------------------------- single-changepoint detection


@query(
    "orders_revenue_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS y
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT d, y,
        ROW_NUMBER() OVER (ORDER BY d) AS k,
        CAST(SUM(CAST(y AS DECIMAL(28,6))) OVER (ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cy
      FROM daily
    ),
    tot AS (
      SELECT COUNT(*)::BIGINT AS n,
        CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy
      FROM daily
    ),
    gain AS (
      SELECT d, k, n, cy, sy,
        cy * cy / k + (sy - cy) * (sy - cy) / (n - k) - sy * sy / n AS g
      FROM idx CROSS JOIN tot WHERE k < n
    ),
    best AS (SELECT MAX(g) AS mg FROM gain),
    pick AS (
      SELECT MIN(d) AS split_day FROM gain JOIN best ON gain.g = best.mg
    )
    SELECT gain.d AS split_day, CAST(n AS BIGINT) AS n_days,
      round(g, 4) AS sse_gain,
      round(cy / k, 4) AS mean_before,
      round((sy - cy) / (n - k), 4) AS mean_after
    FROM gain JOIN pick ON gain.d = pick.split_day
    """,
)
def orders_revenue_changepoint(spark, sf_dir):
    """Single most-likely changepoint in the daily-revenue series by
    binary segmentation: the split day maximizing the between-segment
    SSE reduction (SL + SR vs pooled), i.e. the first step of the
    classic recursive changepoint algorithm — the "when did the level
    shift?" answer behind events_value_cusum_drift's "did it drift?".

    The candidate scan is closed-form over running sums: gain(k) =
    CL^2/k + CR^2/(n-k) - C^2/n needs only the day-ordered decimal
    prefix sum, so all n-1 candidates are scored in one window pass
    over the bounded daily table (days, not rows — at 100 TB the daily
    collapse happens first). Argmax ties break to the earliest day via
    an explicit max-then-min, never engine argmax."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("y")
    )
    w_run = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    idx = daily.select(
        "d",
        F.row_number().over(W.orderBy("d")).alias("k"),
        F.sum(F.col("y").cast(DEC)).over(w_run).cast("double").alias("cy"),
    )
    tot = F.broadcast(
        daily.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("y").cast(DEC)).cast("double").alias("sy"),
        )
    )
    g = F.when(
        F.col("k") < F.col("n"),
        F.col("cy") * F.col("cy") / F.col("k")
        + (F.col("sy") - F.col("cy"))
        * (F.col("sy") - F.col("cy"))
        / (F.col("n") - F.col("k"))
        - F.col("sy") * F.col("sy") / F.col("n"),
    )
    gain = (
        idx.crossJoin(tot)
        .filter(F.col("k") < F.col("n"))
        .withColumn("g", g)
    )
    best = F.broadcast(gain.agg(F.max("g").alias("mg")))
    pick = F.broadcast(
        gain.join(best, F.col("g") == F.col("mg")).agg(
            F.min("d").alias("split_day")
        )
    )
    return gain.join(pick, F.col("d") == F.col("split_day")).select(
        F.col("d").alias("split_day"),
        F.col("n").cast("bigint").alias("n_days"),
        F.round("g", 4).alias("sse_gain"),
        F.round(F.col("cy") / F.col("k"), 4).alias("mean_before"),
        F.round(
            (F.col("sy") - F.col("cy")) / (F.col("n") - F.col("k")), 4
        ).alias("mean_after"),
    )


# --------------------------------------------- precision-recall AUC


@query(
    "quality_pr_auc",
    oracle="""
    WITH pv AS (
      SELECT n_chars AS s,
        SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS p,
        SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS q
      FROM documents GROUP BY n_chars
    ),
    t AS (SELECT SUM(p)::BIGINT AS np, SUM(q)::BIGINT AS nq FROM pv),
    c AS (
      SELECT s, p, q,
        SUM(p) OVER (ORDER BY s) AS cum_p,
        SUM(q) OVER (ORDER BY s) AS cum_q
      FROM pv
    ),
    pr AS (
      SELECT s,
        (np - cum_p + p) AS tp, (nq - cum_q + q) AS fp, np
      FROM c CROSS JOIN t
    ),
    curve AS (
      SELECT s,
        CAST(tp AS DOUBLE) / (tp + fp) AS prec,
        CAST(tp AS DOUBLE) / np AS rec
      FROM pr
    ),
    seg AS (
      SELECT prec, rec,
        COALESCE(LAG(rec) OVER (ORDER BY s DESC), 0.0) AS rec0,
        COALESCE(LAG(prec) OVER (ORDER BY s DESC), prec) AS prec0
      FROM curve
    )
    SELECT
      round(CAST(SUM(CAST(round(
        (rec - rec0) * (prec + prec0) / 2.0, 12) AS DECIMAL(38,14)))
        AS DOUBLE), 8) AS pr_auc,
      CAST(MAX(np) AS BIGINT) AS n_pos
    FROM seg CROSS JOIN t
    """,
)
def quality_pr_auc(spark, sf_dir):
    """Trapezoidal area under the precision-recall curve for the same
    score/label pair as quality_score_auc (document length vs
    is-English) — the metric that actually matters when positives are
    rare: ROC AUC stays rosy under class imbalance, PR AUC does not.

    The curve needs descending-threshold cumulative TP/FP; both come
    from the ascending prefix sums (desc_cum = total - cum + at), so
    the corpus-scale part reuses the same one-aggregate-per-distinct-
    score shape as the ROC op, and only the bounded distinct-score
    table feeds the lag window that pairs consecutive thresholds.
    Trapezoid increments are rounded then decimal-summed."""
    d = table(spark, sf_dir, "documents")
    pv = d.groupBy(F.col("n_chars").alias("s")).agg(
        F.sum((F.col("lang") == "en").cast("bigint")).alias("p"),
        F.sum((F.col("lang") != "en").cast("bigint")).alias("q"),
    )
    t = F.broadcast(
        pv.agg(
            F.sum("p").cast("bigint").alias("np"),
            F.sum("q").cast("bigint").alias("nq"),
        )
    )
    c = bucketed_prefix_sums(pv, "s", ["p", "q"], N_AUC_BUCKETS)
    pr = c.crossJoin(t).select(
        "s",
        (F.col("np") - F.col("cum_p") + F.col("p")).alias("tp"),
        (F.col("nq") - F.col("cum_q") + F.col("q")).alias("fp"),
        "np",
    )
    curve = pr.select(
        "s",
        (F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))).alias(
            "prec"
        ),
        (F.col("tp").cast("double") / F.col("np")).alias("rec"),
    )
    w = W.orderBy(F.col("s").desc())
    seg = curve.select(
        "prec",
        "rec",
        F.coalesce(F.lag("rec").over(w), F.lit(0.0)).alias("rec0"),
        F.coalesce(F.lag("prec").over(w), F.col("prec")).alias("prec0"),
    )
    return seg.crossJoin(t).agg(
        F.round(
            F.sum(
                F.round(
                    (F.col("rec") - F.col("rec0"))
                    * (F.col("prec") + F.col("prec0"))
                    / 2.0,
                    12,
                ).cast("decimal(38,14)")
            ).cast("double"),
            8,
        ).alias("pr_auc"),
        F.max("np").cast("bigint").alias("n_pos"),
    )


# --------------------------------------- Wilcoxon signed-rank test


@query(
    "wilcoxon_signed_rank_spend",
    oracle="""
    WITH rng AS (
      SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
        CAST(MIN(o_orderdate) AS DATE)
          + CAST(floor(datediff('day', MIN(o_orderdate),
              MAX(o_orderdate)) / 2) AS INTEGER) AS mid
      FROM orders
    ),
    pc AS (
      SELECT o_custkey,
        SUM(CASE WHEN CAST(o_orderdate AS DATE) <= mid
          THEN CAST(o_totalprice AS DECIMAL(28,6)) ELSE 0 END) AS h1,
        SUM(CASE WHEN CAST(o_orderdate AS DATE) > mid
          THEN CAST(o_totalprice AS DECIMAL(28,6)) ELSE 0 END) AS h2
      FROM orders CROSS JOIN rng GROUP BY o_custkey
    ),
    dd AS (
      SELECT h2 - h1 AS d, abs(h2 - h1) AS ad FROM pc WHERE h2 <> h1
    ),
    v AS (
      SELECT ad, COUNT(*)::BIGINT AS n,
        SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END)::BIGINT AS p
      FROM dd GROUP BY ad
    ),
    r AS (
      SELECT n, p,
        SUM(n) OVER (ORDER BY ad
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM v
    ),
    s AS (
      SELECT SUM(n) AS big_n,
        SUM(p * (2 * (cum - n) + n + 1)) AS two_wp,
        SUM(n * n * n - n) AS tsum
      FROM r
    )
    SELECT CAST(big_n AS BIGINT) AS n_pairs,
      round(CAST(two_wp AS DOUBLE) / 2.0, 2) AS w_plus,
      round((CAST(two_wp AS DOUBLE) / 2.0
          - CAST(big_n AS DOUBLE) * (big_n + 1) / 4.0)
        / sqrt(CAST(big_n AS DOUBLE) * (big_n + 1) * (2 * big_n + 1) / 24.0
          - CAST(tsum AS DOUBLE) / 48.0), 8) AS z_score
    FROM s
    """,
)
def wilcoxon_signed_rank_spend(spark, sf_dir):
    """Wilcoxon signed-rank test: did per-customer spend shift between
    the first and second half of the corpus date range? The PAIRED
    nonparametric test (each customer is their own control) completing
    the family with mannwhitney_u (independent two-sample) and
    kruskal_wallis (k-sample). Zero-difference customers drop, ties in
    |d| get average ranks, and the tie-corrected normal z is reported.

    Determinism: half-year sums and their differences stay DECIMAL
    (exact, order-independent), so |d| groups exactly in both engines;
    ranks come from the bucketed prefix-sum kernel over the distinct
    |d| table, and 2*W+ stays an exact integer until the final
    division. The per-customer half-sum aggregate fans out of the
    one-task scan (hash on the group key, so the fan-out IS the
    aggregation exchange at bench scale)."""
    o = table(spark, sf_dir, "orders")
    oc = fanout(
        o.select("o_custkey", "o_orderdate", "o_totalprice"), "o_custkey"
    )
    rng = F.broadcast(
        o.agg(
            F.date_add(
                F.to_date(F.min("o_orderdate")),
                F.floor(
                    F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))
                    / 2
                ).cast("int"),
            ).alias("mid")
        )
    )
    pc = (
        oc.crossJoin(rng)
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(
                    F.to_date("o_orderdate") <= F.col("mid"),
                    F.col("o_totalprice").cast(DEC),
                ).otherwise(F.lit(0).cast(DEC))
            ).alias("h1"),
            F.sum(
                F.when(
                    F.to_date("o_orderdate") > F.col("mid"),
                    F.col("o_totalprice").cast(DEC),
                ).otherwise(F.lit(0).cast(DEC))
            ).alias("h2"),
        )
    )
    dd = pc.filter(F.col("h2") != F.col("h1")).select(
        (F.col("h2") - F.col("h1")).alias("d"),
        F.abs(F.col("h2") - F.col("h1")).alias("ad"),
    )
    v = dd.groupBy("ad").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("d") > 0).cast("int")).cast("bigint").alias("p"),
    )
    r = bucketed_prefix_sums(v, "ad", ["n"])
    s = r.agg(
        F.sum("n").alias("big_n"),
        F.sum(
            F.col("p")
            * (2 * (F.col("cum_n") - F.col("n")) + F.col("n") + 1)
        ).alias("two_wp"),
        F.sum(F.col("n") * F.col("n") * F.col("n") - F.col("n")).alias(
            "tsum"
        ),
    )
    bn = F.col("big_n").cast("double")
    wp = F.col("two_wp").cast("double") / 2.0
    return s.select(
        F.col("big_n").cast("bigint").alias("n_pairs"),
        F.round(wp, 2).alias("w_plus"),
        F.round(
            (wp - bn * (F.col("big_n") + 1) / 4.0)
            / F.sqrt(
                bn * (F.col("big_n") + 1) * (2 * F.col("big_n") + 1) / 24.0
                - F.col("tsum").cast("double") / 48.0
            ),
            8,
        ).alias("z_score"),
    )


# ------------------------------- distribution-free median CI

MEDIAN_CI_Z = 1.959964


@query(
    "median_ci_order_stats",
    oracle=f"""
    WITH pv AS (
      SELECT o_totalprice AS v, COUNT(*)::BIGINT AS c
      FROM orders GROUP BY 1
    ),
    t AS (SELECT SUM(c)::BIGINT AS n FROM pv),
    cum AS (
      SELECT v, c,
        SUM(c) OVER (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c
      FROM pv
    ),
    ranks AS (
      SELECT n,
        GREATEST(CAST(floor(n / 2.0 - {MEDIAN_CI_Z} * sqrt(n) / 2.0)
          AS BIGINT), 1) AS lo_rank,
        LEAST(CAST(ceil(n / 2.0 + {MEDIAN_CI_Z} * sqrt(n) / 2.0)
          AS BIGINT) + 1, n) AS hi_rank,
        CAST(floor((n - 1) * 0.5) AS BIGINT) AS mk,
        (n - 1) * 0.5 - floor((n - 1) * 0.5) AS mfrac
      FROM t
    )
    SELECT MAX(n) AS n_rows,
      MIN(CASE WHEN cum_c >= mk + 1 THEN v END) * (1 - MAX(mfrac))
        + COALESCE(MIN(CASE WHEN cum_c >= mk + 2 THEN v END),
                   MIN(CASE WHEN cum_c >= mk + 1 THEN v END))
          * MAX(mfrac) AS median,
      MIN(CASE WHEN cum_c >= lo_rank THEN v END) AS ci_lo,
      MIN(CASE WHEN cum_c >= hi_rank THEN v END) AS ci_hi,
      MAX(lo_rank) AS lo_rank, MAX(hi_rank) AS hi_rank
    FROM cum CROSS JOIN ranks
    """,
)
def median_ci_order_stats(spark, sf_dir):
    """Distribution-free 95% confidence interval for the median order
    value via the binomial order-statistic bounds (ranks n/2 -+
    z*sqrt(n)/2) — the nonparametric CI that needs no normality and no
    bootstrap resampling (bootstrap_mean_ci is the resampling sibling
    for the mean). Reports the exact interpolated median plus the two
    exact order statistics bracketing it.

    Rank selection rides the bucketed prefix-sum kernel: value
    frequencies collapse to a distinct-value table, cumulative counts
    give every rank in parallel, and each bound is one conditional MIN
    — no global sort, no per-row rank materialization. sqrt is
    IEEE-correctly-rounded so both engines compute identical rank
    cutoffs."""
    o = table(spark, sf_dir, "orders")
    pv = o.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = F.broadcast(pv.agg(F.sum("c").cast("bigint").alias("n")))
    cum = bucketed_prefix_sums(pv, "v", ["c"]).crossJoin(tot)
    nd = F.col("n").cast("double")
    lo_rank = F.greatest(
        F.floor(nd / 2.0 - MEDIAN_CI_Z * F.sqrt(nd) / 2.0).cast("bigint"),
        F.lit(1).cast("bigint"),
    )
    hi_rank = F.least(
        F.ceil(nd / 2.0 + MEDIAN_CI_Z * F.sqrt(nd) / 2.0).cast("bigint")
        + 1,
        F.col("n"),
    )
    pos = (F.col("n") - 1) * F.lit(0.5)
    mk = F.floor(pos)
    mfrac = pos - mk
    withr = cum.select(
        "v", "cum_c", "n",
        lo_rank.alias("lo_rank"), hi_rank.alias("hi_rank"),
        mk.alias("mk"), mfrac.alias("mfrac"),
    )
    med_lo = F.min(F.when(F.col("cum_c") >= F.col("mk") + 1, F.col("v")))
    med_hi = F.min(F.when(F.col("cum_c") >= F.col("mk") + 2, F.col("v")))
    return withr.agg(
        F.max("n").alias("n_rows"),
        (
            med_lo * (1 - F.max("mfrac"))
            + F.coalesce(med_hi, med_lo) * F.max("mfrac")
        ).alias("median"),
        F.min(
            F.when(F.col("cum_c") >= F.col("lo_rank"), F.col("v"))
        ).alias("ci_lo"),
        F.min(
            F.when(F.col("cum_c") >= F.col("hi_rank"), F.col("v"))
        ).alias("ci_hi"),
        F.max("lo_rank").alias("lo_rank"),
        F.max("hi_rank").alias("hi_rank"),
    )


# --------------------------------------------- periodogram peak

PERIODOGRAM_MIN_P = 2
PERIODOGRAM_MAX_P = 30


@query(
    "events_periodogram_peak",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*)::BIGINT AS y
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT y, ROW_NUMBER() OVER (ORDER BY d) - 1 AS t FROM daily
    ),
    m AS (
      SELECT COUNT(*)::BIGINT AS n,
        CAST(SUM(y) AS DOUBLE) / COUNT(*) AS mu
      FROM idx
    ),
    grid AS (
      SELECT p FROM UNNEST(range({PERIODOGRAM_MIN_P},
        {PERIODOGRAM_MAX_P} + 1)) AS u(p)
    ),
    terms AS (
      SELECT g.p, i.t, i.y - m.mu AS yc
      FROM grid g CROSS JOIN idx i CROSS JOIN m
    ),
    pw AS (
      SELECT p,
        CAST(SUM(CAST(round(yc * cos(2 * pi() * t / p), 8)
          AS DECIMAL(38,10))) AS DOUBLE) AS cs,
        CAST(SUM(CAST(round(yc * sin(2 * pi() * t / p), 8)
          AS DECIMAL(38,10))) AS DOUBLE) AS sn
      FROM terms GROUP BY p
    ),
    pow AS (
      SELECT p, round((cs * cs + sn * sn) / 1.0, 6) AS power FROM pw
    ),
    best AS (SELECT MAX(power) AS mp FROM pow)
    SELECT p AS period_days, power,
      (SELECT MIN(p) FROM pow JOIN best ON power = mp) AS dominant_period
    FROM pow
    """,
)
def events_periodogram_peak(spark, sf_dir):
    """Schuster periodogram of the daily event-count series over
    candidate periods {PERIODOGRAM_MIN_P}..{PERIODOGRAM_MAX_P} days:
    spectral power |sum (y_t - mu) e^(-2pi i t/p)|^2 per period plus
    the argmax — the detector that TELLS you the season length the
    seasonal-decomposition/seasonal-naive ops assume (a weekly cycle
    should peak at p=7).

    The corpus collapses to the bounded daily table first; the
    candidate grid (29 periods) fans out of a broadcast range, so the
    cos/sin reductions are one grouped aggregate over days x periods
    with round-then-decimal sums. pi() and libm cos/sin agree to the
    rounding precision; the argmax tie-breaks to the shortest
    period."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    idx = daily.select(
        "y", (F.row_number().over(W.orderBy("d")) - 1).alias("t")
    )
    m = F.broadcast(
        idx.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.sum("y").cast("double") / F.count(F.lit(1))).alias("mu"),
        )
    )
    grid = F.broadcast(
        idx.sparkSession.range(
            PERIODOGRAM_MIN_P, PERIODOGRAM_MAX_P + 1
        ).select(F.col("id").cast("bigint").alias("p"))
    )
    terms = grid.crossJoin(idx).crossJoin(m).select(
        "p", "t", (F.col("y") - F.col("mu")).alias("yc")
    )
    ang = 2 * F.lit(3.141592653589793) * F.col("t") / F.col("p")
    pw = terms.groupBy("p").agg(
        F.sum(F.round(F.col("yc") * F.cos(ang), 8).cast("decimal(38,10)"))
        .cast("double")
        .alias("cs"),
        F.sum(F.round(F.col("yc") * F.sin(ang), 8).cast("decimal(38,10)"))
        .cast("double")
        .alias("sn"),
    )
    pow_ = pw.select(
        "p",
        F.round(
            (F.col("cs") * F.col("cs") + F.col("sn") * F.col("sn")) / 1.0, 6
        ).alias("power"),
    )
    best = F.broadcast(pow_.agg(F.max("power").alias("mp")))
    dom = F.broadcast(
        pow_.join(best, F.col("power") == F.col("mp")).agg(
            F.min("p").alias("dominant_period")
        )
    )
    return pow_.crossJoin(dom).select(
        F.col("p").alias("period_days"), "power", "dominant_period"
    )


# ------------------------------------- Simpson's paradox detector


@query(
    "discount_quantity_simpson_check",
    oracle="""
    WITH xy AS (
      SELECT p_brand AS g, l_discount AS x, l_quantity AS y
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    pg AS (
      SELECT g, COUNT(*)::BIGINT AS n,
        CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(round(x * x, 10) AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(round(x * y, 10) AS DECIMAL(28,12))) AS DOUBLE) AS sxy
      FROM xy GROUP BY g
    ),
    tot AS (
      SELECT SUM(n) AS n,
        CAST(SUM(CAST(sx AS DECIMAL(28,6))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(sy AS DECIMAL(28,6))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(sxx AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(sxy AS DECIMAL(28,12))) AS DOUBLE) AS sxy
      FROM pg
    ),
    slopes AS (
      SELECT g, n,
        (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
      FROM pg
    ),
    overall AS (
      SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS oslope,
        n AS total_n
      FROM tot
    )
    SELECT round(oslope, 8) AS overall_slope,
      CAST(total_n AS BIGINT) AS n_rows,
      COUNT(*)::BIGINT AS n_groups,
      SUM(CASE WHEN sign(slope) <> sign(oslope) THEN 1 ELSE 0 END)::BIGINT
        AS n_reversed_groups,
      round(CAST(SUM(CASE WHEN sign(slope) <> sign(oslope) THEN n ELSE 0 END)
        AS DOUBLE) / total_n, 8) AS reversed_row_frac
    FROM slopes CROSS JOIN overall
    GROUP BY oslope, total_n
    """,
)
def discount_quantity_simpson_check(spark, sf_dir):
    """Simpson's-paradox detector for the discount -> quantity
    relationship: the pooled OLS slope next to the count of brands
    whose WITHIN-group slope has the opposite sign (and the row share
    they cover). A pooled trend that reverses inside most groups is a
    confounded trend — the one-row report every "discounts drive
    volume" dashboard should ship with
    (price_elasticity_by_brand gives the per-group detail).

    The group-level sufficient statistics aggregate once and ROLL UP
    to the pooled statistics by exact decimal re-summation — pooled
    and per-group slopes come from the same numbers, one fact-to-part
    join, no second corpus pass."""
    l = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_discount"
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    D6, D12 = "decimal(28,6)", "decimal(28,12)"
    xy = l.join(p, F.col("l_partkey") == F.col("p_partkey")).select(
        F.col("p_brand").alias("g"),
        F.col("l_discount").alias("x"),
        F.col("l_quantity").alias("y"),
    )
    pg = xy.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(D6)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(D6)).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 10).cast(D12))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("y"), 10).cast(D12))
        .cast("double")
        .alias("sxy"),
    )
    tot = F.broadcast(
        pg.agg(
            F.sum("n").alias("tn"),
            F.sum(F.col("sx").cast(D6)).cast("double").alias("tsx"),
            F.sum(F.col("sy").cast(D6)).cast("double").alias("tsy"),
            F.sum(F.col("sxx").cast(D12)).cast("double").alias("tsxx"),
            F.sum(F.col("sxy").cast(D12)).cast("double").alias("tsxy"),
        )
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    oslope = (F.col("tn") * F.col("tsxy") - F.col("tsx") * F.col("tsy")) / (
        F.col("tn") * F.col("tsxx") - F.col("tsx") * F.col("tsx")
    )
    s = pg.select("g", "n", slope.alias("slope")).crossJoin(
        tot.select(oslope.alias("oslope"), F.col("tn").alias("total_n"))
    )
    rev = F.signum("slope") != F.signum("oslope")
    return s.groupBy("oslope", "total_n").agg(
        F.round(F.first("oslope"), 8).alias("overall_slope"),
        F.first("total_n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(rev.cast("int")).cast("bigint").alias("n_reversed_groups"),
        F.round(
            F.sum(F.when(rev, F.col("n")).otherwise(0)).cast("double")
            / F.first("total_n"),
            8,
        ).alias("reversed_row_frac"),
    ).drop("oslope", "total_n")


# --------------------------------------- Laspeyres price index


@query(
    "monthly_price_index_laspeyres",
    oracle="""
    WITH pm AS (
      SELECT l_partkey AS pk, strftime(l_shipdate, '%Y-%m') AS m,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
          / CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS p,
        CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    base_m AS (SELECT MIN(m) AS bm FROM pm),
    base AS (
      SELECT pk, p AS p0, q AS q0 FROM pm JOIN base_m ON pm.m = base_m.bm
    ),
    j AS (
      SELECT pm.m, pm.pk, pm.p, base.p0, base.q0
      FROM pm JOIN base ON pm.pk = base.pk
    ),
    idx AS (
      SELECT m, COUNT(*)::BIGINT AS n_parts,
        CAST(SUM(CAST(round(p * q0, 6) AS DECIMAL(38,8))) AS DOUBLE) AS num,
        CAST(SUM(CAST(round(p0 * q0, 6) AS DECIMAL(38,8))) AS DOUBLE) AS den
      FROM j GROUP BY m
    )
    SELECT m AS month, n_parts, round(num / den, 8) AS laspeyres_index
    FROM idx
    """,
)
def monthly_price_index_laspeyres(spark, sf_dir):
    """Laspeyres price index per ship-month: sum(p_m * q_base) /
    sum(p_base * q_base) over the parts traded in both periods, with
    base-month quantities as fixed weights — the standard "is pricing
    inflating?" index that orders_mom_pct_change (revenue deltas)
    cannot answer because revenue confounds price and volume.

    Unit prices are ratios of decimal-exact sums, the base table joins
    back on the natural l_partkey shuffle key, and each month's
    numerator/denominator pair is a round-then-decimal sum over its
    matched part set (so months with partial catalogs stay
    internally consistent).

    The fact pass (decimal unit-price sums in the (part, month) partial
    aggregate) is fanned out of the one-task single-row-group scan."""
    l = fanout(
        table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_shipdate", "l_extendedprice", "l_quantity"
        ),
        "l_partkey",
    )
    pm = l.groupBy(
        F.col("l_partkey").alias("pk"),
        F.date_format("l_shipdate", "yyyy-MM").alias("m"),
    ).agg(
        (
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
            / F.sum(F.col("l_quantity").cast(DEC)).cast("double")
        ).alias("p"),
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("q"),
    )
    base_m = F.broadcast(pm.agg(F.min("m").alias("bm")))
    base = (
        pm.crossJoin(base_m)
        .filter(F.col("m") == F.col("bm"))
        .select("pk", F.col("p").alias("p0"), F.col("q").alias("q0"))
    )
    j = pm.join(base, "pk").select("m", "p", "p0", "q0")
    idx = j.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(F.round(F.col("p") * F.col("q0"), 6).cast("decimal(38,8)"))
        .cast("double")
        .alias("num"),
        F.sum(F.round(F.col("p0") * F.col("q0"), 6).cast("decimal(38,8)"))
        .cast("double")
        .alias("den"),
    )
    return idx.select(
        F.col("m").alias("month"),
        "n_parts",
        F.round(F.col("num") / F.col("den"), 8).alias("laspeyres_index"),
    )


# --------------------------------------- Markov chain entropy rate


@query(
    "events_markov_entropy_rate",
    oracle="""
    WITH t AS (
      SELECT
        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS from_type,
        event_type AS to_type
      FROM events
    ),
    c AS (
      SELECT from_type, to_type, COUNT(*)::BIGINT AS n
      FROM t WHERE from_type IS NOT NULL
      GROUP BY from_type, to_type
    ),
    r AS (SELECT from_type, SUM(n)::BIGINT AS tot FROM c GROUP BY from_type),
    big AS (
      SELECT SUM(n)::BIGINT AS big_n,
        COUNT(DISTINCT from_type)::BIGINT AS k
      FROM c
    ),
    h AS (
      SELECT
        CAST(SUM(CAST(round(
          -(n / CAST(big_n AS DOUBLE))
            * ln(n / CAST(tot AS DOUBLE)), 12) AS DECIMAL(38,14)))
          AS DOUBLE) AS rate
      FROM c JOIN r USING (from_type) CROSS JOIN big
    )
    SELECT big_n AS n_transitions, k AS n_states,
      round(rate, 8) AS entropy_rate_nats,
      round(ln(CAST(k AS DOUBLE)), 8) AS max_entropy_nats,
      round(rate / ln(CAST(k AS DOUBLE)), 8) AS normalized_rate
    FROM h CROSS JOIN big
    """,
)
def events_markov_entropy_rate(spark, sf_dir):
    """Entropy rate of the first-order behavioral Markov chain,
    H = -sum_i pi_i sum_j p_ij ln p_ij with the empirical from-state
    distribution as pi — the single number summarizing how predictable
    user behavior is (bots/scripted traffic -> near 0; the per-cell
    matrix is events_markov_transitions, this is its information-
    theoretic rollup; user_event_entropy is the per-user marginal
    version that ignores sequence order).

    Same lag-window + |types|^2 aggregate as the transition matrix;
    per-cell -p ln p contributions are rounded then decimal-summed
    over the bounded cell table, and the normalization by ln k makes
    the rate comparable across taxonomies."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    c = t.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    r = c.groupBy("from_type").agg(F.sum("n").cast("bigint").alias("tot"))
    big = F.broadcast(
        c.agg(
            F.sum("n").cast("bigint").alias("big_n"),
            F.count_distinct("from_type").cast("bigint").alias("k"),
        )
    )
    cell = (
        -(F.col("n") / F.col("big_n").cast("double"))
        * F.log(F.col("n") / F.col("tot").cast("double"))
    )
    h = (
        c.join(F.broadcast(r), "from_type")
        .crossJoin(big)
        .agg(
            F.sum(F.round(cell, 12).cast("decimal(38,14)"))
            .cast("double")
            .alias("rate")
        )
    )
    kd = F.col("k").cast("double")
    return h.crossJoin(big).select(
        F.col("big_n").alias("n_transitions"),
        F.col("k").alias("n_states"),
        F.round("rate", 8).alias("entropy_rate_nats"),
        F.round(F.log(kd), 8).alias("max_entropy_nats"),
        F.round(F.col("rate") / F.log(kd), 8).alias("normalized_rate"),
    )


# --------------------------------------- A/B power / MDE calculator

POWER_Z_ALPHA = 1.959964  # two-sided alpha = 0.05
POWER_Z_BETA = 0.841621  # power = 0.8


@query(
    "ab_test_power_mde",
    oracle=f"""
    WITH arms AS (
      SELECT event_type AS arm, COUNT(*)::BIGINT AS n,
        CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS s,
        CAST(SUM(CAST(round(value * value, 8) AS DECIMAL(38,10)))
          AS DOUBLE) AS ss
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY event_type
    ),
    v AS (
      SELECT arm, n, s / n AS mean,
        (ss - s * s / n) / (n - 1) AS var
      FROM arms
    )
    SELECT arm, n, round(mean, 6) AS mean,
      round(sqrt(var), 6) AS stddev,
      round(({POWER_Z_ALPHA} + {POWER_Z_BETA}) * sqrt(2.0 * var / n), 8)
        AS mde_abs,
      round(({POWER_Z_ALPHA} + {POWER_Z_BETA}) * sqrt(2.0 * var / n)
        / mean, 8) AS mde_rel,
      CAST(ceil(2.0 * pow(({POWER_Z_ALPHA} + {POWER_Z_BETA})
          / (0.01 * mean), 2) * var) AS BIGINT) AS n_needed_for_1pct
    FROM v
    """,
)
def ab_test_power_mde(spark, sf_dir):
    """Experiment power calculator from observed arm variance: the
    minimum detectable effect (absolute and relative) at alpha=0.05 /
    power=0.8 for the CURRENT sample size, and the per-arm n needed to
    detect a 1% lift — the pre-test sibling of ab_test_welch (which
    judges after) and ab_sample_ratio_mismatch (which gates before).
    MDE = (z_a + z_b) * sqrt(2 sigma^2 / n).

    One filtered pass accumulates decimal-exact sum and sum-of-squares
    per arm; every derived figure is closed-form from those three
    exact numbers with one expression order in both engines."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    arms = e.groupBy(F.col("event_type").alias("arm")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("s"),
        F.sum(
            F.round(F.col("value") * F.col("value"), 8).cast(
                "decimal(38,10)"
            )
        )
        .cast("double")
        .alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )
    v = arms.select("arm", "n", mean.alias("mean"), var.alias("var"))
    zsum = POWER_Z_ALPHA + POWER_Z_BETA
    mde = zsum * F.sqrt(2.0 * F.col("var") / F.col("n"))
    return v.select(
        "arm",
        "n",
        F.round("mean", 6).alias("mean"),
        F.round(F.sqrt("var"), 6).alias("stddev"),
        F.round(mde, 8).alias("mde_abs"),
        F.round(mde / F.col("mean"), 8).alias("mde_rel"),
        F.ceil(
            2.0
            * F.pow(F.lit(zsum) / (0.01 * F.col("mean")), 2)
            * F.col("var")
        )
        .cast("bigint")
        .alias("n_needed_for_1pct"),
    )


# --------------------------------------------- ABC-XYZ classification

ABC_A_SHARE = 0.8
ABC_B_SHARE = 0.95
XYZ_X_CV = 0.5
XYZ_Y_CV = 1.0


@query(
    "part_abc_xyz_matrix",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey AS pk,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS r
      FROM lineitem GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(CAST(r AS DECIMAL(28,6))) AS DOUBLE) AS tr FROM rev
    ),
    cum AS (
      SELECT pk, r,
        CAST(SUM(CAST(r AS DECIMAL(28,6))) OVER (ORDER BY r DESC, pk
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS cr
      FROM rev
    ),
    abc AS (
      SELECT pk, r,
        CASE WHEN cr / tr <= {ABC_A_SHARE} THEN 'A'
             WHEN cr / tr <= {ABC_B_SHARE} THEN 'B'
             ELSE 'C' END AS abc
      FROM cum CROSS JOIN tot
    ),
    mq AS (
      SELECT l_partkey AS pk, strftime(l_shipdate, '%Y-%m') AS m,
        CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    cv AS (
      SELECT pk, COUNT(*)::BIGINT AS n,
        CAST(SUM(CAST(q AS DECIMAL(28,6))) AS DOUBLE) AS s,
        CAST(SUM(CAST(round(q * q, 6) AS DECIMAL(38,8))) AS DOUBLE) AS ss
      FROM mq GROUP BY pk
    ),
    xyz AS (
      SELECT pk,
        CASE WHEN n <= 1 THEN 'Z'
             WHEN sqrt((ss - s * s / n) / n) / (s / n) <= {XYZ_X_CV}
               THEN 'X'
             WHEN sqrt((ss - s * s / n) / n) / (s / n) <= {XYZ_Y_CV}
               THEN 'Y'
             ELSE 'Z' END AS xyz
      FROM cv
    )
    SELECT abc, xyz, COUNT(*)::BIGINT AS n_parts,
      round(CAST(SUM(CAST(r AS DECIMAL(28,6))) AS DOUBLE)
        / MAX(tr), 8) AS revenue_share
    FROM abc JOIN xyz USING (pk) CROSS JOIN tot
    GROUP BY abc, xyz
    """,
)
def part_abc_xyz_matrix(spark, sf_dir):
    """ABC-XYZ inventory classification matrix: parts classed by
    cumulative revenue contribution (A <= {ABC_A_SHARE:.0%} of revenue,
    B <= {ABC_B_SHARE:.0%}, C = tail — the Pareto cut
    customer_pareto_abc applies to customers) crossed with monthly
    demand variability (X: CV <= {XYZ_X_CV}, Y: CV <= {XYZ_Y_CV},
    Z: erratic or single-month). The 9-cell counts + revenue shares
    are THE standard stocking-policy segmentation (AX = automate,
    CZ = discontinue).

    Two independent part-keyed aggregates (revenue, monthly CV) join
    on the natural l_partkey key; the descending revenue cumulative
    rides bucketed_prefix_sums over revenue-range buckets (the part
    table is scale-factor-proportional, so the previous global ordered
    window would single-partition-sort billions of parts at 100x SF);
    population CV comes from exact sum/sum-of-squares."""
    from quackio_jl_spark.functions.prefix import bucketed_prefix_sums

    l = table(spark, sf_dir, "lineitem")
    rev = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("r")
    )
    tot = F.broadcast(
        rev.agg(F.sum(F.col("r").cast(DEC)).cast("double").alias("tr"))
    )
    base = rev.select(
        "pk",
        "r",
        (-F.col("r")).alias("_negr"),
        (-F.col("pk")).alias("_negpk"),
        F.col("r").cast(DEC).alias("_r_dec"),
    )
    cum = (
        bucketed_prefix_sums(base, "_negr", ["_r_dec"], tiebreak_desc="_negpk")
        .withColumn("cr", F.col("cum__r_dec").cast("double"))
        .drop("_negr", "_negpk", "_r_dec", "cum__r_dec")
    )
    abc = cum.crossJoin(tot).select(
        "pk",
        "r",
        "tr",
        F.when(F.col("cr") / F.col("tr") <= ABC_A_SHARE, "A")
        .when(F.col("cr") / F.col("tr") <= ABC_B_SHARE, "B")
        .otherwise("C")
        .alias("abc"),
    )
    mq = l.groupBy(
        F.col("l_partkey").alias("pk"),
        F.date_format("l_shipdate", "yyyy-MM").alias("m"),
    ).agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("q"))
    cv = mq.groupBy("pk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("q").cast(DEC)).cast("double").alias("s"),
        F.sum(F.round(F.col("q") * F.col("q"), 6).cast("decimal(38,8)"))
        .cast("double")
        .alias("ss"),
    )
    cv_expr = F.sqrt(
        (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / F.col("n")
    ) / (F.col("s") / F.col("n"))
    xyz = cv.select(
        "pk",
        F.when(F.col("n") <= 1, "Z")
        .when(cv_expr <= XYZ_X_CV, "X")
        .when(cv_expr <= XYZ_Y_CV, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return (
        abc.join(xyz, "pk")
        .groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(
                F.sum(F.col("r").cast(DEC)).cast("double") / F.max("tr"), 8
            ).alias("revenue_share"),
        )
    )


# --------------------------------------- difference-in-differences


@query(
    "discount_did_quantity",
    oracle="""
    WITH bd AS (
      SELECT p_brand,
        CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE)
          / COUNT(*) AS avg_disc
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
    ),
    gd AS (
      SELECT CAST(SUM(CAST(avg_disc AS DECIMAL(28,8))) AS DOUBLE)
        / COUNT(*) AS g
      FROM bd
    ),
    mid AS (
      SELECT CAST(MIN(l_shipdate) AS DATE)
        + CAST(floor(datediff('day', MIN(l_shipdate),
            MAX(l_shipdate)) / 2) AS INTEGER) AS md
      FROM lineitem
    ),
    rows_ AS (
      SELECT
        CASE WHEN bd.avg_disc > gd.g THEN 1 ELSE 0 END AS treated,
        CASE WHEN CAST(l_shipdate AS DATE) > mid.md THEN 1 ELSE 0 END
          AS post,
        l_quantity AS y
      FROM lineitem JOIN part ON l_partkey = p_partkey
      JOIN bd ON bd.p_brand = part.p_brand
      CROSS JOIN gd CROSS JOIN mid
    ),
    cells AS (
      SELECT treated, post, COUNT(*)::BIGINT AS n,
        CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS s,
        CAST(SUM(CAST(round(y * y, 6) AS DECIMAL(38,8))) AS DOUBLE) AS ss
      FROM rows_ GROUP BY treated, post
    ),
    m AS (
      SELECT
        MAX(CASE WHEN treated = 1 AND post = 0 THEN s / n END) AS t0,
        MAX(CASE WHEN treated = 1 AND post = 1 THEN s / n END) AS t1,
        MAX(CASE WHEN treated = 0 AND post = 0 THEN s / n END) AS c0,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN s / n END) AS c1,
        CAST(SUM(CAST(round(
          ((ss - s * s / n) / (n - 1)) / n, 10) AS DECIMAL(38,12)))
          AS DOUBLE) AS var_sum,
        SUM(n) AS n_rows
      FROM cells
    )
    SELECT round(t0, 6) AS treated_pre, round(t1, 6) AS treated_post,
      round(c0, 6) AS control_pre, round(c1, 6) AS control_post,
      round((t1 - t0) - (c1 - c0), 8) AS did_estimate,
      round(sqrt(var_sum), 8) AS std_error,
      round(((t1 - t0) - (c1 - c0)) / sqrt(var_sum), 8) AS t_stat,
      CAST(n_rows AS BIGINT) AS n_rows
    FROM m
    """,
)
def discount_did_quantity(spark, sf_dir):
    """Difference-in-differences: did quantities move differently for
    high-discount brands after the corpus midpoint, net of the common
    trend? DiD = (treated_post - treated_pre) - (control_post -
    control_pre), with the standard four-cell SE sqrt(sum var_i/n_i)
    and its t — the panel-data causal estimator the A/B pack
    (randomized) cannot replace when assignment isn't random.
    Treatment = brands whose mean discount exceeds the brand-level
    average; period split = ship-date midpoint.

    One brand classification aggregate broadcasts back onto a single
    corpus pass that bins every row into the 2x2 design; cell means
    and variances come from decimal-exact sums, so the whole estimator
    is closed-form from 12 exact numbers."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    lp = l.join(p, F.col("l_partkey") == F.col("p_partkey"))
    bd = lp.groupBy("p_brand").agg(
        (
            F.sum(F.col("l_discount").cast(DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_disc")
    )
    gd = F.broadcast(
        bd.agg(
            (
                F.sum(F.col("avg_disc").cast("decimal(28,8)")).cast("double")
                / F.count(F.lit(1))
            ).alias("g")
        )
    )
    mid = F.broadcast(
        l.agg(
            F.date_add(
                F.to_date(F.min("l_shipdate")),
                F.floor(
                    F.datediff(F.max("l_shipdate"), F.min("l_shipdate")) / 2
                ).cast("int"),
            ).alias("md")
        )
    )
    rows_ = (
        lp.join(F.broadcast(bd), "p_brand")
        .crossJoin(gd)
        .crossJoin(mid)
        .select(
            (F.col("avg_disc") > F.col("g")).cast("int").alias("treated"),
            (F.to_date("l_shipdate") > F.col("md")).cast("int").alias("post"),
            F.col("l_quantity").alias("y"),
        )
    )
    cells = rows_.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("s"),
        F.sum(F.round(F.col("y") * F.col("y"), 6).cast("decimal(38,8)"))
        .cast("double")
        .alias("ss"),
    )

    def cell(t, q):
        return F.max(
            F.when(
                (F.col("treated") == t) & (F.col("post") == q),
                F.col("s") / F.col("n"),
            )
        )

    var_i = ((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )) / F.col("n")
    m = cells.agg(
        cell(1, 0).alias("t0"),
        cell(1, 1).alias("t1"),
        cell(0, 0).alias("c0"),
        cell(0, 1).alias("c1"),
        F.sum(F.round(var_i, 10).cast("decimal(38,12)"))
        .cast("double")
        .alias("var_sum"),
        F.sum("n").cast("bigint").alias("n_rows"),
    )
    did = (F.col("t1") - F.col("t0")) - (F.col("c1") - F.col("c0"))
    return m.select(
        F.round("t0", 6).alias("treated_pre"),
        F.round("t1", 6).alias("treated_post"),
        F.round("c0", 6).alias("control_pre"),
        F.round("c1", 6).alias("control_post"),
        F.round(did, 8).alias("did_estimate"),
        F.round(F.sqrt("var_sum"), 8).alias("std_error"),
        F.round(did / F.sqrt("var_sum"), 8).alias("t_stat"),
        F.col("n_rows"),
    )


# --------------------------------------------- bot-likeness report

BOT_MIN_EVENTS = 20
BOT_GAP_CV_MAX = 0.3
BOT_TOP_TRANSITION_MIN = 0.9


@query(
    "events_bot_likeness_report",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev_type,
        epoch_us(ts) - epoch_us(lag(ts) OVER (
          PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      FROM events
    ),
    per_user AS (
      SELECT user_id, COUNT(*)::BIGINT AS n_events,
        SUM(CASE WHEN gap_us IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS ng,
        SUM(COALESCE(gap_us, 0)) AS sg,
        SUM(CAST(round(COALESCE(gap_us, 0) / 1000000.0
              * (COALESCE(gap_us, 0) / 1000000.0), 6)
            AS DECIMAL(38,8))) AS sgg
      FROM seq GROUP BY user_id
    ),
    trans AS (
      SELECT user_id, prev_type, event_type, COUNT(*)::BIGINT AS c
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY user_id, prev_type, event_type
    ),
    toptr AS (
      SELECT user_id, MAX(c) AS mx, SUM(c) AS tot
      FROM trans GROUP BY user_id
    ),
    joined AS (
      SELECT p.user_id, p.n_events,
        CASE WHEN p.ng > 1 THEN
          sqrt((CAST(p.sgg AS DOUBLE)
              - (p.sg / 1000000.0) * (p.sg / 1000000.0) / p.ng) / p.ng)
            / (p.sg / 1000000.0 / p.ng)
        END AS gap_cv,
        CAST(t.mx AS DOUBLE) / t.tot AS top_transition_share
      FROM per_user p JOIN toptr t ON t.user_id = p.user_id
      WHERE p.n_events >= {BOT_MIN_EVENTS}
    )
    SELECT user_id, n_events,
      round(gap_cv, 6) AS gap_cv,
      round(top_transition_share, 6) AS top_transition_share,
      (gap_cv <= {BOT_GAP_CV_MAX}
        OR top_transition_share >= {BOT_TOP_TRANSITION_MIN}) AS bot_flag
    FROM joined
    """,
)
def events_bot_likeness_report(spark, sf_dir):
    """Per-user bot-likeness diagnostics for heavy users
    (n >= {BOT_MIN_EVENTS}): coefficient of variation of inter-event
    gaps (metronome-regular timing -> CV near 0) and the share of the
    single most common event-type transition (scripted flows repeat one
    edge) — the entity-level drill-down under the corpus-level
    events_markov_entropy_rate, flagged at CV <= {BOT_GAP_CV_MAX} or
    top-edge share >= {BOT_TOP_TRANSITION_MIN}.

    One per-user lag window (parallel, deterministic (ts, event_id)
    order) feeds both signals; gap moments are exact integer micro
    sums plus one rounded-decimal sum of squares; the transition max
    and total reduce per user without materializing the matrix."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    )
    gap0 = F.coalesce(F.col("gap_us"), F.lit(0))
    per_user = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("gap_us").isNotNull().cast("int"))
        .cast("bigint")
        .alias("ng"),
        F.sum(gap0).alias("sg"),
        F.sum(
            F.round(
                gap0 / 1000000.0 * (gap0 / 1000000.0), 6
            ).cast("decimal(38,8)")
        ).alias("sgg"),
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("user_id", "prev_type", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    toptr = trans.groupBy("user_id").agg(
        F.max("c").alias("mx"), F.sum("c").alias("tot")
    )
    mean_s = F.col("sg") / 1000000.0 / F.col("ng")
    gap_cv = F.when(
        F.col("ng") > 1,
        F.sqrt(
            (
                F.col("sgg").cast("double")
                - (F.col("sg") / 1000000.0)
                * (F.col("sg") / 1000000.0)
                / F.col("ng")
            )
            / F.col("ng")
        )
        / mean_s,
    )
    joined = (
        per_user.join(toptr, "user_id")
        .filter(F.col("n_events") >= BOT_MIN_EVENTS)
        .select(
            "user_id",
            "n_events",
            gap_cv.alias("gap_cv"),
            (F.col("mx").cast("double") / F.col("tot")).alias(
                "top_transition_share"
            ),
        )
    )
    return joined.select(
        "user_id",
        "n_events",
        F.round("gap_cv", 6).alias("gap_cv"),
        F.round("top_transition_share", 6).alias("top_transition_share"),
        (
            (F.col("gap_cv") <= BOT_GAP_CV_MAX)
            | (F.col("top_transition_share") >= BOT_TOP_TRANSITION_MIN)
        ).alias("bot_flag"),
    )


# --------------------------------------------- daily peak detection

PEAK_NEIGHBORHOOD = 3


@query(
    "events_daily_peaks",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*)::BIGINT AS y
      FROM events GROUP BY 1
    ),
    ctx AS (
      SELECT d, y,
        MAX(y) OVER (ORDER BY d
          ROWS BETWEEN {PEAK_NEIGHBORHOOD} PRECEDING AND 1 PRECEDING)
          AS lmax,
        MAX(y) OVER (ORDER BY d
          ROWS BETWEEN 1 FOLLOWING AND {PEAK_NEIGHBORHOOD} FOLLOWING)
          AS rmax,
        COUNT(*) OVER (ORDER BY d
          ROWS BETWEEN {PEAK_NEIGHBORHOOD} PRECEDING AND 1 PRECEDING)
          AS ln_,
        COUNT(*) OVER (ORDER BY d
          ROWS BETWEEN 1 FOLLOWING AND {PEAK_NEIGHBORHOOD} FOLLOWING)
          AS rn_
      FROM daily
    )
    SELECT d AS peak_day, y AS n_events,
      CAST(GREATEST(lmax, rmax) AS BIGINT) AS neighborhood_max,
      CAST(y - GREATEST(lmax, rmax) AS BIGINT) AS prominence
    FROM ctx
    WHERE ln_ = {PEAK_NEIGHBORHOOD} AND rn_ = {PEAK_NEIGHBORHOOD}
      AND y > lmax AND y > rmax
    """,
)
def events_daily_peaks(spark, sf_dir):
    """Local-peak detection on the daily event-count series: days
    strictly above every neighbor within +-{PEAK_NEIGHBORHOOD} days,
    with a window-bounded prominence (height over the tallest
    neighbor) — the discrete "what were the spike days?" report that
    complements the continuous detectors (z-score, MAD, CUSUM), which
    flag regions rather than summits. Boundary days without a full
    neighborhood are excluded rather than half-compared.

    The corpus collapses to the bounded daily table first; the four
    frame windows share one ordered pass over days, and all outputs
    are exact integers — no floats anywhere."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    wl = W.orderBy("d").rowsBetween(-PEAK_NEIGHBORHOOD, -1)
    wr = W.orderBy("d").rowsBetween(1, PEAK_NEIGHBORHOOD)
    ctx = daily.select(
        "d",
        "y",
        F.max("y").over(wl).alias("lmax"),
        F.max("y").over(wr).alias("rmax"),
        F.count("y").over(wl).alias("ln_"),
        F.count("y").over(wr).alias("rn_"),
    )
    nmax = F.greatest("lmax", "rmax")
    return (
        ctx.filter(
            (F.col("ln_") == PEAK_NEIGHBORHOOD)
            & (F.col("rn_") == PEAK_NEIGHBORHOOD)
            & (F.col("y") > F.col("lmax"))
            & (F.col("y") > F.col("rmax"))
        )
        .select(
            F.col("d").alias("peak_day"),
            F.col("y").alias("n_events"),
            nmax.cast("bigint").alias("neighborhood_max"),
            (F.col("y") - nmax).cast("bigint").alias("prominence"),
        )
    )


# --------------------------------------------- perfect-order rate

PERFECT_MAX_DELAY_DAYS = 60


@query(
    "orders_perfect_order_rate",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey,
        MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS any_return,
        MAX(date_diff('day', o_orderdate, l_shipdate)) AS worst_delay
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_orderkey
    ),
    o AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
        CASE WHEN any_return = 0
              AND worst_delay <= {PERFECT_MAX_DELAY_DAYS}
             THEN 1 ELSE 0 END AS perfect
      FROM orders JOIN li ON l_orderkey = o_orderkey
    )
    SELECT month, COUNT(*)::BIGINT AS n_orders,
      SUM(perfect)::BIGINT AS n_perfect,
      round(CAST(SUM(perfect) AS DOUBLE) / COUNT(*), 8) AS perfect_rate
    FROM o GROUP BY month
    """,
)
def orders_perfect_order_rate(spark, sf_dir):
    """Perfect-order rate per month: orders with NO returned line items
    AND every line shipped within {PERFECT_MAX_DELAY_DAYS} days — the
    composite fulfillment KPI (a line-level AND across the whole
    order, which is why it needs the per-order rollup and cannot be
    averaged from line-level rates). Companion to
    orders_ship_aging_buckets (latency detail) and supplier_scorecard
    (return detail).

    One fact-to-orders equi-join on the natural orderkey, a per-order
    MAX rollup of the two defect flags, and a monthly count — exact
    integers until the final rate division."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    li = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.max((F.col("l_returnflag") == "R").cast("int")).alias(
                "any_return"
            ),
            F.max(F.datediff("l_shipdate", "o_orderdate")).alias(
                "worst_delay"
            ),
        )
    )
    perfect = (
        (F.col("any_return") == 0)
        & (F.col("worst_delay") <= PERFECT_MAX_DELAY_DAYS)
    ).cast("int")
    oo = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        perfect.alias("perfect"),
    )
    return oo.groupBy("month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("perfect").cast("bigint").alias("n_perfect"),
        F.round(
            F.sum("perfect").cast("double") / F.count(F.lit(1)), 8
        ).alias("perfect_rate"),
    )


# --------------------------------------------- single-source risk


@query(
    "part_single_source_risk",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS pk,
        COUNT(DISTINCT l_suppkey)::BIGINT AS n_suppliers,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (
      SELECT CAST(SUM(CAST(rev AS DECIMAL(28,6))) AS DOUBLE) AS tr FROM ps
    )
    SELECT n_suppliers AS supplier_count,
      COUNT(*)::BIGINT AS n_parts,
      round(CAST(SUM(CAST(rev AS DECIMAL(28,6))) AS DOUBLE) / MAX(tr), 8)
        AS revenue_share
    FROM ps CROSS JOIN tot
    GROUP BY 1
    """,
)
def part_single_source_risk(spark, sf_dir):
    """Supply-concentration risk report: the distribution of parts by
    how many distinct suppliers actually shipped them
    with the revenue share riding on each level — the "how much of
    our revenue dies with one supplier?" histogram that
    parttype_supplier_hhi summarizes per type and this makes
    actionable at the sourcing-policy level (the mass at count 1-2 is
    the risk register).

    One partkey aggregate with a COUNT(DISTINCT suppkey) (partial
    distinct aggregation — supplier sets per part are tiny), the
    grand total broadcasts, and the rollup is bounded by the supplier
    count."""
    l = table(spark, sf_dir, "lineitem")
    ps = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count_distinct("l_suppkey").cast("bigint").alias("n_suppliers"),
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("rev"),
    )
    tot = F.broadcast(
        ps.agg(F.sum(F.col("rev").cast(DEC)).cast("double").alias("tr"))
    )
    return (
        ps.crossJoin(tot)
        .groupBy(F.col("n_suppliers").alias("supplier_count"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(
                F.sum(F.col("rev").cast(DEC)).cast("double") / F.max("tr"),
                8,
            ).alias("revenue_share"),
        )
    )


# --------------------------------------------- CUPED adjustment


@query(
    "ab_test_cuped_adjustment",
    oracle="""
    WITH rng AS (
      SELECT CAST(MIN(ts) AS DATE)
        + CAST(floor(datediff('day', MIN(ts), MAX(ts)) / 2) AS INTEGER)
          AS mid
      FROM events
    ),
    per_user AS (
      SELECT user_id, user_id % 2 AS arm,
        CAST(SUM(CASE WHEN CAST(ts AS DATE) <= mid
          THEN CAST(value AS DECIMAL(28,6)) ELSE 0 END) AS DOUBLE) AS x,
        CAST(SUM(CASE WHEN CAST(ts AS DATE) > mid
          THEN CAST(value AS DECIMAL(28,6)) ELSE 0 END) AS DOUBLE) AS y
      FROM events CROSS JOIN rng GROUP BY user_id
    ),
    mom AS (
      SELECT COUNT(*)::BIGINT AS n,
        CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
        CAST(SUM(CAST(round(y * y, 6) AS DECIMAL(38,8))) AS DOUBLE) AS syy
      FROM per_user
    ),
    th AS (
      SELECT n, sx / n AS mx,
        (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta,
        (syy - sy * sy / n) / (n - 1) AS var_y,
        ((syy - sy * sy / n)
          - pow(sxy - sx * sy / n, 2) / (sxx - sx * sx / n)) / (n - 1)
          AS var_adj
      FROM mom
    ),
    arms AS (
      SELECT arm, COUNT(*)::BIGINT AS n_users,
        CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS asy,
        CAST(SUM(CAST(round(y - (x - mx) * theta, 6)
          AS DECIMAL(38,8))) AS DOUBLE) AS adj
      FROM per_user CROSS JOIN th GROUP BY arm
    )
    SELECT arm, n_users,
      round(asy / n_users, 6) AS mean_raw,
      round(adj / n_users, 6) AS mean_cuped,
      round(theta, 8) AS theta,
      round(1.0 - var_adj / var_y, 8) AS variance_reduction
    FROM arms CROSS JOIN th
    """,
)
def ab_test_cuped_adjustment(spark, sf_dir):
    """CUPED (Controlled-experiment Using Pre-Experiment Data): adjust
    each user's post-period metric by theta*(pre-period covariate -
    its mean), theta = cov(x,y)/var(x) — the industry-standard
    variance-reduction trick that shrinks A/B confidence intervals
    without touching the treatment effect (Deng et al., WSDM'13).
    Reports raw vs adjusted arm means, theta, and the achieved
    variance reduction (= the squared pre/post correlation); arms are
    the same hash assignment ab_sample_ratio_mismatch audits.

    One per-user aggregate splits each user's value stream at the
    corpus midpoint into covariate x and metric y (decimal-exact);
    theta and the variances come from one 6-number moment rollup that
    broadcasts back onto the bounded per-user table.

    Round-11: the events scan fans out keyed on the group key — the
    per-user split-sum's map side ran on the one-task single-row-group
    scan, and the fan-out IS the aggregation exchange at bench scale."""
    e = fanout(table(spark, sf_dir, "events"), "user_id")
    rng = F.broadcast(
        e.agg(
            F.date_add(
                F.to_date(F.min("ts")),
                F.floor(F.datediff(F.max("ts"), F.min("ts")) / 2).cast(
                    "int"
                ),
            ).alias("mid")
        )
    )
    per_user = (
        e.crossJoin(rng)
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.to_date("ts") <= F.col("mid"),
                    F.col("value").cast(DEC),
                ).otherwise(F.lit(0).cast(DEC))
            )
            .cast("double")
            .alias("x"),
            F.sum(
                F.when(
                    F.to_date("ts") > F.col("mid"),
                    F.col("value").cast(DEC),
                ).otherwise(F.lit(0).cast(DEC))
            )
            .cast("double")
            .alias("y"),
        )
        .withColumn("arm", F.col("user_id") % 2)
    )
    D8 = "decimal(38,8)"
    mom = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast(D8))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast(D8))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("y") * F.col("y"), 6).cast(D8))
        .cast("double")
        .alias("syy"),
    )
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    th = F.broadcast(
        mom.select(
            "n",
            (F.col("sx") / F.col("n")).alias("mx"),
            (cxy / cxx).alias("theta"),
            (cyy / (F.col("n") - 1)).alias("var_y"),
            ((cyy - F.pow(cxy, 2) / cxx) / (F.col("n") - 1)).alias(
                "var_adj"
            ),
        )
    )
    arms = (
        per_user.crossJoin(th)
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum(F.col("y").cast(DEC)).cast("double").alias("asy"),
            F.sum(
                F.round(
                    F.col("y") - (F.col("x") - F.col("mx")) * F.col("theta"),
                    6,
                ).cast(D8)
            )
            .cast("double")
            .alias("adj"),
        )
    )
    return arms.crossJoin(th).select(
        "arm",
        "n_users",
        F.round(F.col("asy") / F.col("n_users"), 6).alias("mean_raw"),
        F.round(F.col("adj") / F.col("n_users"), 6).alias("mean_cuped"),
        F.round("theta", 8).alias("theta"),
        F.round(1.0 - F.col("var_adj") / F.col("var_y"), 8).alias(
            "variance_reduction"
        ),
    )


# --------------------------------------------- log-rank test


@query(
    "survival_logrank_by_segment",
    oracle=f"""
    WITH life AS (
      SELECT o_custkey,
        datediff('day', MIN(o_orderdate), MAX(o_orderdate)) AS dur,
        MAX(o_orderdate) AS last_d
      FROM orders GROUP BY o_custkey
    ),
    mx AS (SELECT MAX(o_orderdate) AS m FROM orders),
    obs AS (
      SELECT c_mktsegment AS seg, dur,
        CASE WHEN datediff('day', last_d, m) <= {{C}}
          THEN 0 ELSE 1 END AS event
      FROM life CROSS JOIN mx
      JOIN customer ON o_custkey = c_custkey
    ),
    gt AS (
      SELECT seg, dur, SUM(event)::BIGINT AS d,
        COUNT(*)::BIGINT AS leave
      FROM obs GROUP BY seg, dur
    ),
    ng AS (SELECT seg, SUM(leave)::BIGINT AS n_g FROM gt GROUP BY seg),
    riskg AS (
      SELECT gt.seg, dur, d,
        n_g - COALESCE(SUM(leave) OVER (PARTITION BY gt.seg ORDER BY dur
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nr_g
      FROM gt JOIN ng ON ng.seg = gt.seg
    ),
    riskt AS (
      SELECT dur, SUM(d) AS dt, SUM(nr_g) AS nt
      FROM riskg GROUP BY dur HAVING SUM(d) > 0
    ),
    contrib AS (
      SELECT riskg.seg,
        SUM(riskg.d)::BIGINT AS observed,
        CAST(SUM(CAST(round(riskt.dt * riskg.nr_g
          / CAST(riskt.nt AS DOUBLE), 10) AS DECIMAL(38,12)))
          AS DOUBLE) AS expected
      FROM riskg JOIN riskt ON riskt.dur = riskg.dur
      GROUP BY riskg.seg
    ),
    tot AS (
      SELECT CAST(SUM(CAST(round(
          pow(observed - expected, 2) / expected, 10) AS DECIMAL(38,12)))
        AS DOUBLE) AS chi2
      FROM contrib
    )
    SELECT c.seg AS segment, n_g AS n_customers, observed,
      round(expected, 6) AS expected,
      round(pow(observed - expected, 2) / expected, 8) AS chi2_contrib,
      round(chi2, 8) AS chi2_approx
    FROM contrib c JOIN ng ON ng.seg = c.seg CROSS JOIN tot
    """.replace("{C}", str(KM_CENSOR_DAYS)),
)
def survival_logrank_by_segment(spark, sf_dir):
    """Log-rank comparison of customer-lifetime survival across market
    segments: per-segment observed vs expected event counts under the
    pooled-hazard null (E_g = sum_t d_t * n_gt / n_t) and the
    conservative chi-square approximation sum (O-E)^2/E — the
    "do these cohorts actually churn differently?" test that the
    per-curve customer_survival_km cannot answer by eyeballing.

    The per-(segment, duration) aggregate is bounded (segments x
    distinct durations); per-segment risk sets come from partitioned
    prefix windows over that table; event-time terms are rounded then
    decimal-summed. Same censoring rule as the KM/Nelson-Aalen ops.
    The per-customer lifetime aggregate fans out of the one-task scan
    on the group key."""
    o = table(spark, sf_dir, "orders")
    oc = fanout(
        o.select("o_custkey", "o_orderdate"), "o_custkey"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    life = oc.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("dur"),
        F.max("o_orderdate").alias("last_d"),
    )
    mx = F.broadcast(o.agg(F.max("o_orderdate").alias("m")))
    obs = (
        life.crossJoin(mx)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("seg"),
            "dur",
            F.when(F.datediff("m", "last_d") <= KM_CENSOR_DAYS, 0)
            .otherwise(1)
            .alias("event"),
        )
    )
    gt = obs.groupBy("seg", "dur").agg(
        F.sum("event").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("leave"),
    )
    ng = gt.groupBy("seg").agg(F.sum("leave").cast("bigint").alias("n_g"))
    w_prev = (
        W.partitionBy("seg")
        .orderBy("dur")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    riskg = gt.join(F.broadcast(ng), "seg").select(
        "seg",
        "dur",
        "d",
        (
            F.col("n_g")
            - F.coalesce(F.sum("leave").over(w_prev), F.lit(0))
        ).alias("nr_g"),
    )
    riskt = (
        riskg.groupBy("dur")
        .agg(F.sum("d").alias("dt"), F.sum("nr_g").alias("nt"))
        .filter(F.col("dt") > 0)
    )
    contrib = (
        riskg.join(F.broadcast(riskt), "dur")
        .groupBy("seg")
        .agg(
            F.sum("d").cast("bigint").alias("observed"),
            F.sum(
                F.round(
                    F.col("dt") * F.col("nr_g") / F.col("nt").cast("double"),
                    10,
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("expected"),
        )
    )
    tot = F.broadcast(
        contrib.agg(
            F.sum(
                F.round(
                    F.pow(F.col("observed") - F.col("expected"), 2)
                    / F.col("expected"),
                    10,
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("chi2")
        )
    )
    return (
        contrib.join(F.broadcast(ng), "seg")
        .crossJoin(tot)
        .select(
            F.col("seg").alias("segment"),
            F.col("n_g").alias("n_customers"),
            "observed",
            F.round("expected", 6).alias("expected"),
            F.round(
                F.pow(F.col("observed") - F.col("expected"), 2)
                / F.col("expected"),
                8,
            ).alias("chi2_contrib"),
            F.round("chi2", 8).alias("chi2_approx"),
        )
    )


# --------------------------------------------- two-proportion z-test

PROP_MIN_PURCHASES = 14


@query(
    "ab_test_proportion_z",
    oracle=f"""
    WITH u AS (
      SELECT user_id, user_id % 2 AS arm,
        CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          >= {PROP_MIN_PURCHASES} THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT arm, COUNT(*)::BIGINT AS n, SUM(converted)::BIGINT AS x
      FROM u GROUP BY arm
    ),
    w AS (
      SELECT arm, n, x, CAST(x AS DOUBLE) / n AS p,
        (CAST(x AS DOUBLE) / n + {MEDIAN_CI_Z} * {MEDIAN_CI_Z} / (2 * n))
          / (1 + {MEDIAN_CI_Z} * {MEDIAN_CI_Z} / n) AS wc,
        {MEDIAN_CI_Z} / (1 + {MEDIAN_CI_Z} * {MEDIAN_CI_Z} / n)
          * sqrt(CAST(x AS DOUBLE) / n * (1 - CAST(x AS DOUBLE) / n) / n
            + {MEDIAN_CI_Z} * {MEDIAN_CI_Z} / (4.0 * n * n)) AS wh
      FROM arms
    ),
    z AS (
      SELECT
        (MAX(CASE WHEN arm = 1 THEN p END)
         - MAX(CASE WHEN arm = 0 THEN p END))
        / sqrt(CAST(SUM(x) AS DOUBLE) / SUM(n)
          * (1 - CAST(SUM(x) AS DOUBLE) / SUM(n))
          * (1.0 / MAX(CASE WHEN arm = 0 THEN n END)
             + 1.0 / MAX(CASE WHEN arm = 1 THEN n END))) AS zstat
      FROM w
    )
    SELECT arm, n AS n_users, x AS n_converted,
      round(p, 8) AS conversion_rate,
      round(wc - wh, 8) AS wilson_lo,
      round(wc + wh, 8) AS wilson_hi,
      round(zstat, 8) AS z_score
    FROM w CROSS JOIN z
    """,
)
def ab_test_proportion_z(spark, sf_dir):
    """Two-proportion z-test on user-level conversion (>=
    {PROP_MIN_PURCHASES} purchases — a frequent-buyer flag, since
    everyone in this corpus buys at least once) between the
    hash-assigned arms, with a Wilson
    score interval per arm — the binary-outcome member of the A/B
    family (Welch handles continuous metrics, this handles rates; the
    Wilson CI stays inside [0,1] and behaves at small counts where
    the naive Wald interval collapses).

    One per-user MAX collapses events to a conversion flag (so heavy
    users don't overweight the rate), a 2-row arm aggregate, and
    closed-form z from pooled variance — exact integers until the
    final divisions."""
    e = table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int"))
            >= PROP_MIN_PURCHASES
        )
        .cast("int")
        .alias("converted")
    ).withColumn("arm", F.col("user_id") % 2)
    arms = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("x"),
    )
    z = MEDIAN_CI_Z
    p = F.col("x").cast("double") / F.col("n")
    wc = (p + z * z / (2 * F.col("n"))) / (1 + z * z / F.col("n"))
    wh = (
        z
        / (1 + z * z / F.col("n"))
        * F.sqrt(
            p * (1 - p) / F.col("n")
            + z * z / (4.0 * F.col("n") * F.col("n"))
        )
    )
    w = arms.select(
        "arm", "n", "x", p.alias("p"), wc.alias("wc"), wh.alias("wh")
    )
    pp = F.sum("x").cast("double") / F.sum("n")
    zstat = (
        F.max(F.when(F.col("arm") == 1, F.col("p")))
        - F.max(F.when(F.col("arm") == 0, F.col("p")))
    ) / F.sqrt(
        pp
        * (1 - pp)
        * (
            1.0 / F.max(F.when(F.col("arm") == 0, F.col("n")))
            + 1.0 / F.max(F.when(F.col("arm") == 1, F.col("n")))
        )
    )
    zt = F.broadcast(w.agg(zstat.alias("zstat")))
    return w.crossJoin(zt).select(
        "arm",
        F.col("n").alias("n_users"),
        F.col("x").alias("n_converted"),
        F.round("p", 8).alias("conversion_rate"),
        F.round(F.col("wc") - F.col("wh"), 8).alias("wilson_lo"),
        F.round(F.col("wc") + F.col("wh"), 8).alias("wilson_hi"),
        F.round("zstat", 8).alias("z_score"),
    )


# --------------------------------------------- overdispersion test


@query(
    "events_overdispersion_test",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, COUNT(*)::BIGINT AS y
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT COUNT(*)::BIGINT AS n, SUM(y) AS sy, SUM(y * y) AS syy
      FROM hourly
    )
    SELECT CAST(n AS BIGINT) AS n_hours,
      round(CAST(sy AS DOUBLE) / n, 6) AS mean_per_hour,
      round((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
        / (n - 1), 6) AS variance,
      round(((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1))
        / (CAST(sy AS DOUBLE) / n), 8) AS dispersion_index,
      round((n - 1)
        * (((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1))
           / (CAST(sy AS DOUBLE) / n)), 6) AS chi2_stat
    FROM s
    """,
)
def events_overdispersion_test(spark, sf_dir):
    """Poisson overdispersion test on hourly arrival counts: the
    dispersion index var/mean (1 under Poisson) and the chi-square
    dispersion statistic (n-1)*D ~ chi2(n-1) under the null — the
    capacity-planning sanity check that decides whether Poisson
    queueing math applies to this traffic or bursts
    (events_burstiness_by_type drills into which types) invalidate
    it.

    One hourly aggregate, then a single exact-integer moment rollup
    (counts are integers, so sum and sum-of-squares are exact) — the
    entire test is closed-form from three numbers."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    s = hourly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    mean = F.col("sy").cast("double") / F.col("n")
    var = (
        F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy") / F.col("n")
    ) / (F.col("n") - 1)
    return s.select(
        F.col("n").cast("bigint").alias("n_hours"),
        F.round(mean, 6).alias("mean_per_hour"),
        F.round(var, 6).alias("variance"),
        F.round(var / mean, 8).alias("dispersion_index"),
        F.round((F.col("n") - 1) * (var / mean), 6).alias("chi2_stat"),
    )


# --------------------------------------------- effect-size pack


@query(
    "ab_test_effect_size_pack",
    oracle="""
    WITH e AS (
      SELECT value, event_type FROM events
      WHERE event_type IN ('click', 'view')
    ),
    v AS (
      SELECT value,
        SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n1,
        SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n2
      FROM e GROUP BY value
    ),
    r AS (
      SELECT value, n1, n2,
        SUM(n2) OVER (ORDER BY value
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n2
          AS cum2_below
      FROM v
    ),
    mom AS (
      SELECT
        SUM(n1) AS m1, SUM(n2) AS m2,
        CAST(SUM(CAST(round(value * n1, 6) AS DECIMAL(38,8))) AS DOUBLE)
          AS s1,
        CAST(SUM(CAST(round(value * n2, 6) AS DECIMAL(38,8))) AS DOUBLE)
          AS s2,
        CAST(SUM(CAST(round(value * value * n1, 6) AS DECIMAL(38,8)))
          AS DOUBLE) AS ss1,
        CAST(SUM(CAST(round(value * value * n2, 6) AS DECIMAL(38,8)))
          AS DOUBLE) AS ss2,
        SUM(n1 * cum2_below) AS gt,
        SUM(n1 * n2) AS eq
      FROM r
    )
    SELECT CAST(m1 AS BIGINT) AS n_click, CAST(m2 AS BIGINT) AS n_view,
      round((s1 / m1 - s2 / m2)
        / sqrt(((ss1 - s1 * s1 / m1) + (ss2 - s2 * s2 / m2))
          / (m1 + m2 - 2)), 8) AS cohens_d,
      round((s1 / m1 - s2 / m2)
        / sqrt(((ss1 - s1 * s1 / m1) + (ss2 - s2 * s2 / m2))
          / (m1 + m2 - 2))
        * (1.0 - 3.0 / (4.0 * (m1 + m2) - 9.0)), 8) AS hedges_g,
      round((CAST(gt AS DOUBLE) + 0.5 * eq)
        / (CAST(m1 AS DOUBLE) * m2), 8) AS common_language_es
    FROM mom
    """,
)
def ab_test_effect_size_pack(spark, sf_dir):
    """Effect sizes for the click-vs-view value comparison: Cohen's d
    (pooled-SD standardized mean difference), Hedges' g (the
    small-sample-corrected d), and the common-language effect size
    P(click > view) + P(tie)/2 — the numbers that give the Welch/
    Mann-Whitney verdicts a magnitude ("significant" at 100 TB row
    counts is guaranteed; HOW different is the question). CLES is
    computed exactly from the same distinct-value rank table as the U
    statistic (sum n1*cum2_below + half the tie mass), never by
    sampling pairs.

    One distinct-value aggregate carries all five moment sums
    (rounded-decimal, order-independent) plus the exact integer
    pair-count sums; every statistic is closed-form from that row."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    v = e.groupBy("value").agg(
        F.sum((F.col("event_type") == "click").cast("int"))
        .cast("bigint")
        .alias("n1"),
        F.sum((F.col("event_type") == "view").cast("int"))
        .cast("bigint")
        .alias("n2"),
    )
    r = bucketed_prefix_sums(v, "value", ["n2"]).withColumn(
        "cum2_below", F.col("cum_n2") - F.col("n2")
    )
    D8 = "decimal(38,8)"
    mom = r.agg(
        F.sum("n1").alias("m1"),
        F.sum("n2").alias("m2"),
        F.sum(F.round(F.col("value") * F.col("n1"), 6).cast(D8))
        .cast("double")
        .alias("s1"),
        F.sum(F.round(F.col("value") * F.col("n2"), 6).cast(D8))
        .cast("double")
        .alias("s2"),
        F.sum(
            F.round(F.col("value") * F.col("value") * F.col("n1"), 6).cast(
                D8
            )
        )
        .cast("double")
        .alias("ss1"),
        F.sum(
            F.round(F.col("value") * F.col("value") * F.col("n2"), 6).cast(
                D8
            )
        )
        .cast("double")
        .alias("ss2"),
        F.sum(F.col("n1") * F.col("cum2_below")).alias("gt"),
        F.sum(F.col("n1") * F.col("n2")).alias("eq"),
    )
    mean_diff = F.col("s1") / F.col("m1") - F.col("s2") / F.col("m2")
    pooled = F.sqrt(
        (
            (F.col("ss1") - F.col("s1") * F.col("s1") / F.col("m1"))
            + (F.col("ss2") - F.col("s2") * F.col("s2") / F.col("m2"))
        )
        / (F.col("m1") + F.col("m2") - 2)
    )
    d_ = mean_diff / pooled
    return mom.select(
        F.col("m1").cast("bigint").alias("n_click"),
        F.col("m2").cast("bigint").alias("n_view"),
        F.round(d_, 8).alias("cohens_d"),
        F.round(
            d_ * (1.0 - 3.0 / (4.0 * (F.col("m1") + F.col("m2")) - 9.0)), 8
        ).alias("hedges_g"),
        F.round(
            (F.col("gt").cast("double") + 0.5 * F.col("eq"))
            / (F.col("m1").cast("double") * F.col("m2")),
            8,
        ).alias("common_language_es"),
    )


# --------------------------------------------- Durbin-Watson


@query(
    "orders_daily_trend_durbin_watson",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS y
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t
      FROM daily
    ),
    mom AS (
      SELECT COUNT(*)::BIGINT AS n, SUM(t) AS st, SUM(t * t) AS stt,
        CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(round(t * y, 4) AS DECIMAL(38,6))) AS DOUBLE) AS sty
      FROM idx
    ),
    fit AS (
      SELECT n,
        (n * sty - st * sy) / (n * stt - st * st) AS slope,
        (sy - (n * sty - st * sy) / (n * stt - st * st) * st) / n
          AS intercept
      FROM mom
    ),
    resid AS (
      SELECT t, y - (intercept + slope * t) AS e,
        LAG(y - (intercept + slope * t)) OVER (ORDER BY t) AS e_prev
      FROM idx CROSS JOIN fit
    ),
    s AS (
      SELECT
        CAST(SUM(CAST(round(e * e, 4) AS DECIMAL(38,6))) AS DOUBLE) AS see,
        CAST(SUM(CASE WHEN e_prev IS NULL THEN CAST(0 AS DECIMAL(38,6))
          ELSE CAST(round((e - e_prev) * (e - e_prev), 4)
            AS DECIMAL(38,6)) END) AS DOUBLE) AS sdd,
        COUNT(*)::BIGINT AS n
      FROM resid
    )
    SELECT n AS n_days, round(sdd / see, 8) AS durbin_watson,
      round(1.0 - (sdd / see) / 2.0, 8) AS lag1_autocorr_approx
    FROM s
    """,
)
def orders_daily_trend_durbin_watson(spark, sf_dir):
    """Durbin-Watson serial-correlation diagnostic on the residuals of
    the daily-revenue linear trend: DW = sum(e_t - e_{t-1})^2 /
    sum(e_t^2), ~2 under independence, <2 positive autocorrelation —
    the econometrics check that says whether trend-line confidence
    intervals (and every i.i.d.-assuming test on this series) are
    trustworthy, complementing events_daily_autocorrelation (raw ACF,
    no trend removal) and events_theil_sen_trend (robust slope).

    The OLS fit is closed-form from four moment sums over the bounded
    daily table; residuals and their lag difference ride one ordered
    window; all sums are rounded-decimal (order-independent)."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("y")
    )
    idx = daily.select(
        "y", F.row_number().over(W.orderBy("d")).cast("bigint").alias("t")
    )
    mom = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").alias("st"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("sy"),
        F.sum(F.round(F.col("t") * F.col("y"), 4).cast("decimal(38,6)"))
        .cast("double")
        .alias("sty"),
    )
    slope = (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")) / (
        F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    )
    fit = F.broadcast(
        mom.select(
            "n",
            slope.alias("slope"),
            ((F.col("sy") - slope * F.col("st")) / F.col("n")).alias(
                "intercept"
            ),
        )
    )
    e = F.col("y") - (F.col("intercept") + F.col("slope") * F.col("t"))
    resid = idx.crossJoin(fit).select(
        "t",
        e.alias("e"),
        F.lag(e).over(W.orderBy("t")).alias("e_prev"),
    )
    s = resid.agg(
        F.sum(F.round(F.col("e") * F.col("e"), 4).cast("decimal(38,6)"))
        .cast("double")
        .alias("see"),
        F.sum(
            F.when(
                F.col("e_prev").isNull(), F.lit(0).cast("decimal(38,6)")
            ).otherwise(
                F.round(
                    (F.col("e") - F.col("e_prev"))
                    * (F.col("e") - F.col("e_prev")),
                    4,
                ).cast("decimal(38,6)")
            )
        )
        .cast("double")
        .alias("sdd"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return s.select(
        F.col("n").alias("n_days"),
        F.round(F.col("sdd") / F.col("see"), 8).alias("durbin_watson"),
        F.round(1.0 - (F.col("sdd") / F.col("see")) / 2.0, 8).alias(
            "lag1_autocorr_approx"
        ),
    )


# --------------------------------------------- split-conformal intervals

CONFORMAL_ALPHA = 0.05


@query(
    "orders_conformal_interval_by_priority",
    oracle=f"""
    WITH base AS (
      SELECT o_orderpriority AS prio, o_totalprice AS y,
        o_orderkey % 2 = 0 AS is_cal
      FROM orders
    ),
    mu AS (
      SELECT prio,
        CAST(SUM(CASE WHEN is_cal
          THEN CAST(y AS DECIMAL(28,6)) ELSE 0 END) AS DOUBLE)
          / SUM(CASE WHEN is_cal THEN 1 ELSE 0 END) AS m
      FROM base GROUP BY prio
    ),
    cal AS (
      SELECT base.prio, abs(y - m) AS r
      FROM base JOIN mu ON mu.prio = base.prio WHERE is_cal
    ),
    q AS (
      SELECT prio, COUNT(*)::BIGINT AS n_cal,
        list_sort(list(r))[
          LEAST(CAST(ceil((COUNT(*) + 1) * (1 - {CONFORMAL_ALPHA}))
            AS BIGINT), COUNT(*))] AS qhat
      FROM cal GROUP BY prio
    ),
    test AS (
      SELECT base.prio,
        COUNT(*)::BIGINT AS n_test,
        SUM(CASE WHEN abs(y - m) <= qhat THEN 1 ELSE 0 END)::BIGINT
          AS n_covered
      FROM base JOIN mu ON mu.prio = base.prio
      JOIN q ON q.prio = base.prio
      WHERE NOT is_cal GROUP BY base.prio
    )
    SELECT q.prio AS priority, n_cal, round(qhat, 4) AS qhat_radius,
      n_test, round(CAST(n_covered AS DOUBLE) / n_test, 8)
        AS empirical_coverage
    FROM q JOIN test ON test.prio = q.prio
    """,
)
def orders_conformal_interval_by_priority(spark, sf_dir):
    """Split-conformal prediction intervals for order value per
    priority: calibrate the absolute-residual quantile q-hat (the
    ceil((n+1)(1-alpha))-th order statistic — the finite-sample-valid
    conformal rank, not a plug-in percentile) on the even-orderkey
    half, then report EMPIRICAL coverage on the held-out odd half —
    distribution-free ~{int((1 - CONFORMAL_ALPHA) * 100)}% intervals
    with their own audit built in (coverage far from nominal means
    the exchangeability assumption broke).

    The deterministic orderkey-parity split needs no RNG; per-group
    exact order statistics use the bounded-group sorted-array recipe
    (5 priorities — swap in the prefix-sum kernel for unbounded group
    counts); means are decimal-exact."""
    o = table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").alias("y"),
        (F.col("o_orderkey") % 2 == 0).alias("is_cal"),
    )
    mu = base.groupBy("prio").agg(
        (
            F.sum(
                F.when(F.col("is_cal"), F.col("y").cast(DEC)).otherwise(
                    F.lit(0).cast(DEC)
                )
            ).cast("double")
            / F.sum(F.col("is_cal").cast("int"))
        ).alias("m")
    )
    cal = (
        base.filter("is_cal")
        .join(F.broadcast(mu), "prio")
        .select("prio", F.abs(F.col("y") - F.col("m")).alias("r"))
    )
    q = cal.groupBy("prio").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cal"),
        F.element_at(
            F.sort_array(F.collect_list("r")),
            F.least(
                F.ceil(
                    (F.count(F.lit(1)) + 1) * (1 - CONFORMAL_ALPHA)
                ).cast("int"),
                F.count(F.lit(1)).cast("int"),
            ),
        ).alias("qhat"),
    )
    test = (
        base.filter(~F.col("is_cal"))
        .join(F.broadcast(mu), "prio")
        .join(F.broadcast(q), "prio")
        .groupBy("prio")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                (F.abs(F.col("y") - F.col("m")) <= F.col("qhat")).cast(
                    "int"
                )
            )
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    return q.join(test, "prio").select(
        F.col("prio").alias("priority"),
        "n_cal",
        F.round("qhat", 4).alias("qhat_radius"),
        "n_test",
        F.round(
            F.col("n_covered").cast("double") / F.col("n_test"), 8
        ).alias("empirical_coverage"),
    )


# --------------------------------------- stratified standardization


@query(
    "discount_effect_stratified",
    oracle="""
    WITH bd AS (
      SELECT p_brand,
        CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE)
          / COUNT(*) AS avg_disc
      FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand
    ),
    gd AS (
      SELECT CAST(SUM(CAST(avg_disc AS DECIMAL(28,8))) AS DOUBLE)
        / COUNT(*) AS g FROM bd
    ),
    rows_ AS (
      SELECT CASE WHEN bd.avg_disc > gd.g THEN 1 ELSE 0 END AS treated,
        CASE WHEN p_size <= 10 THEN 0 WHEN p_size <= 20 THEN 1
             WHEN p_size <= 30 THEN 2 WHEN p_size <= 40 THEN 3
             ELSE 4 END AS stratum,
        l_quantity AS y
      FROM lineitem JOIN part ON l_partkey = p_partkey
      JOIN bd ON bd.p_brand = part.p_brand CROSS JOIN gd
    ),
    cells AS (
      SELECT stratum, treated, COUNT(*)::BIGINT AS n,
        CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS s
      FROM rows_ GROUP BY stratum, treated
    ),
    strata AS (
      SELECT stratum, SUM(n)::BIGINT AS n_s,
        MAX(CASE WHEN treated = 1 THEN s / n END) AS y1,
        MAX(CASE WHEN treated = 0 THEN s / n END) AS y0,
        MAX(CASE WHEN treated = 1 THEN n END) AS n1,
        MAX(CASE WHEN treated = 0 THEN n END) AS n0
      FROM cells GROUP BY stratum
    ),
    tot AS (SELECT SUM(n_s)::BIGINT AS n FROM strata),
    ate AS (
      SELECT CAST(SUM(CAST(round(
          (y1 - y0) * n_s, 6) AS DECIMAL(38,8))) AS DOUBLE)
        / MAX(tot.n) AS adj_effect
      FROM strata CROSS JOIN tot
    )
    SELECT stratum, n_s AS n_rows, CAST(n1 AS BIGINT) AS n_treated,
      CAST(n0 AS BIGINT) AS n_control,
      round(y1, 6) AS mean_treated, round(y0, 6) AS mean_control,
      round(y1 - y0, 8) AS stratum_effect,
      round(adj_effect, 8) AS standardized_effect
    FROM strata CROSS JOIN ate
    """,
)
def discount_effect_stratified(spark, sf_dir):
    """Stratified standardization (the direct-adjustment causal
    estimator): the treated-vs-control quantity gap within each
    part-size stratum, averaged with population stratum weights —
    the confounder-adjusted effect when treatment (high-discount
    brand, as in discount_did_quantity) correlates with part size.
    Per-stratum effects exposing effect heterogeneity ride along;
    DiD adjusts for time-stable confounding, this for the measured
    covariate — run both.

    One brand classification broadcast onto a single corpus pass
    binned into (stratum x treated) cells; the standardized effect is
    a 5-term weighted decimal sum over the cell table."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    lp = l.join(p, F.col("l_partkey") == F.col("p_partkey"))
    bd = lp.groupBy("p_brand").agg(
        (
            F.sum(F.col("l_discount").cast(DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_disc")
    )
    gd = F.broadcast(
        bd.agg(
            (
                F.sum(F.col("avg_disc").cast("decimal(28,8)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("g")
        )
    )
    stratum = (
        F.when(F.col("p_size") <= 10, 0)
        .when(F.col("p_size") <= 20, 1)
        .when(F.col("p_size") <= 30, 2)
        .when(F.col("p_size") <= 40, 3)
        .otherwise(4)
    )
    rows_ = (
        lp.join(F.broadcast(bd), "p_brand")
        .crossJoin(gd)
        .select(
            (F.col("avg_disc") > F.col("g")).cast("int").alias("treated"),
            stratum.alias("stratum"),
            F.col("l_quantity").alias("y"),
        )
    )
    cells = rows_.groupBy("stratum", "treated").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("s"),
    )
    strata = cells.groupBy("stratum").agg(
        F.sum("n").cast("bigint").alias("n_s"),
        F.max(
            F.when(F.col("treated") == 1, F.col("s") / F.col("n"))
        ).alias("y1"),
        F.max(
            F.when(F.col("treated") == 0, F.col("s") / F.col("n"))
        ).alias("y0"),
        F.max(F.when(F.col("treated") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("treated") == 0, F.col("n"))).alias("n0"),
    )
    tot = F.broadcast(strata.agg(F.sum("n_s").cast("bigint").alias("n")))
    ate = F.broadcast(
        strata.crossJoin(tot).agg(
            (
                F.sum(
                    F.round(
                        (F.col("y1") - F.col("y0")) * F.col("n_s"), 6
                    ).cast("decimal(38,8)")
                ).cast("double")
                / F.max("n")
            ).alias("adj_effect")
        )
    )
    return strata.crossJoin(ate).select(
        "stratum",
        F.col("n_s").alias("n_rows"),
        F.col("n1").cast("bigint").alias("n_treated"),
        F.col("n0").cast("bigint").alias("n_control"),
        F.round("y1", 6).alias("mean_treated"),
        F.round("y0", 6).alias("mean_control"),
        F.round(F.col("y1") - F.col("y0"), 8).alias("stratum_effect"),
        F.round("adj_effect", 8).alias("standardized_effect"),
    )


# --------------------------------------- empirical-Bayes shrinkage


@query(
    "user_purchase_rate_shrunk",
    oracle="""
    WITH u AS (
      SELECT user_id, COUNT(*)::BIGINT AS n,
        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
          AS x
      FROM events GROUP BY user_id
    ),
    r AS (SELECT user_id, n, x, CAST(x AS DOUBLE) / n AS p FROM u),
    mom AS (
      SELECT COUNT(*)::BIGINT AS k,
        CAST(SUM(CAST(round(p, 10) AS DECIMAL(28,12))) AS DOUBLE) AS sp,
        CAST(SUM(CAST(round(p * p, 10) AS DECIMAL(28,12))) AS DOUBLE)
          AS spp,
        CAST(SUM(CAST(round(1.0 / n, 10) AS DECIMAL(28,12))) AS DOUBLE)
          AS sinv
      FROM r
    ),
    prior AS (
      SELECT sp / k AS mu,
        GREATEST(
          ((spp - sp * sp / k) / (k - 1)
            - (sp / k) * (1 - sp / k) * (sinv / k))
          / NULLIF((sp / k) * (1 - sp / k) - ((spp - sp * sp / k) / (k - 1)
            - (sp / k) * (1 - sp / k) * (sinv / k)), 0),
          1.0) AS m
      FROM mom
    )
    SELECT user_id, n AS n_events, x AS n_purchases,
      round(p, 8) AS raw_rate,
      round((x + m * mu) / (n + m), 8) AS shrunk_rate,
      round(m * mu, 6) AS prior_alpha,
      round(m * (1 - mu), 6) AS prior_beta
    FROM r CROSS JOIN prior
    """,
)
def user_purchase_rate_shrunk(spark, sf_dir):
    """Empirical-Bayes shrunk per-user purchase rates: beta-binomial
    method-of-moments fits the prior Beta(m*mu, m*(1-mu)) from the
    observed rate distribution, then every user's rate shrinks to
    (x + m*mu)/(n + m) — the fix for small-sample leaderboards where
    a 1-for-2 user outranks a 40-for-100 user (same machinery as
    baseball batting-average shrinkage). The prior strength m is
    floored at 1 so a degenerate moment estimate never yields
    anti-shrinkage.

    One per-user count aggregate; the three prior moments are
    rounded-decimal sums over the user table; the shrunk rate is one
    map-side expression under the broadcast prior."""
    e = table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("bigint")
        .alias("x"),
    )
    r = u.select(
        "user_id", "n", "x", (F.col("x").cast("double") / F.col("n")).alias("p")
    )
    D12 = "decimal(28,12)"
    mom = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.round("p", 10).cast(D12)).cast("double").alias("sp"),
        F.sum(F.round(F.col("p") * F.col("p"), 10).cast(D12))
        .cast("double")
        .alias("spp"),
        F.sum(F.round(1.0 / F.col("n"), 10).cast(D12))
        .cast("double")
        .alias("sinv"),
    )
    mu = F.col("sp") / F.col("k")
    var_p = (F.col("spp") - F.col("sp") * F.col("sp") / F.col("k")) / (
        F.col("k") - 1
    )
    noise = mu * (1 - mu) * (F.col("sinv") / F.col("k"))
    signal = var_p - noise
    m = F.greatest(
        signal / F.nullif(mu * (1 - mu) - signal, F.lit(0.0)), F.lit(1.0)
    )
    prior = F.broadcast(mom.select(mu.alias("mu"), m.alias("m")))
    return r.crossJoin(prior).select(
        "user_id",
        F.col("n").alias("n_events"),
        F.col("x").alias("n_purchases"),
        F.round("p", 8).alias("raw_rate"),
        F.round(
            (F.col("x") + F.col("m") * F.col("mu")) / (F.col("n") + F.col("m")),
            8,
        ).alias("shrunk_rate"),
        F.round(F.col("m") * F.col("mu"), 6).alias("prior_alpha"),
        F.round(F.col("m") * (1 - F.col("mu")), 6).alias("prior_beta"),
    )


# --------------------------------------------- Weibull gap fit


@query(
    "events_gap_weibull_fit",
    oracle="""
    WITH seq AS (
      SELECT CAST(ceil((epoch_us(ts) - epoch_us(lag(ts) OVER (
          PARTITION BY user_id ORDER BY ts, event_id))) / 1000000.0)
        AS BIGINT) AS gap_s
      FROM events
    ),
    v AS (
      SELECT gap_s, COUNT(*)::BIGINT AS c FROM seq
      WHERE gap_s IS NOT NULL AND gap_s > 0 GROUP BY gap_s
    ),
    tot AS (SELECT SUM(c)::BIGINT AS n FROM v),
    surv AS (
      SELECT gap_s,
        1.0 - (SUM(c) OVER (ORDER BY gap_s
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          / CAST(n AS DOUBLE)) AS s
      FROM v CROSS JOIN tot
    ),
    pts AS (
      SELECT round(ln(CAST(gap_s AS DOUBLE)), 10) AS lx,
        round(ln(-ln(s)), 10) AS ly
      FROM surv WHERE s > 0.001 AND s < 0.999
    ),
    mom AS (
      SELECT COUNT(*)::BIGINT AS m,
        CAST(SUM(CAST(lx AS DECIMAL(28,12))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(ly AS DECIMAL(28,12))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(round(lx * lx, 10) AS DECIMAL(28,12))) AS DOUBLE)
          AS sxx,
        CAST(SUM(CAST(round(lx * ly, 10) AS DECIMAL(28,12))) AS DOUBLE)
          AS sxy
      FROM pts
    )
    SELECT CAST(m AS BIGINT) AS n_grid_points,
      round((m * sxy - sx * sy) / (m * sxx - sx * sx), 8)
        AS weibull_shape,
      round(exp(-((sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx)
        / m) / ((m * sxy - sx * sy) / (m * sxx - sx * sx))), 6)
        AS weibull_scale_s
    FROM mom
    """,
)
def events_gap_weibull_fit(spark, sf_dir):
    """Weibull fit of inter-event gap times via the linearized
    survival regression: for Weibull, ln(-ln S(t)) = k*ln t - k*ln
    lambda, so the OLS slope over the empirical survival curve IS the
    shape k (k < 1 = bursty/heavy-tailed arrivals, k = 1 =
    memoryless/exponential, k > 1 = regular) and the intercept gives
    the scale — the distributional sequel to
    events_overdispersion_test's scalar verdict.

    Gaps collapse to integer-second distinct values (bounded), the
    survival curve is one ordered cumulative over that table, tail
    points (S outside [0.001, 0.999]) are trimmed before the
    regression, and the four OLS moments are rounded-decimal sums."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.ceil(
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
            / 1000000.0
        )
        .cast("bigint")
        .alias("gap_s")
    )
    v = (
        seq.filter(F.col("gap_s").isNotNull() & (F.col("gap_s") > 0))
        .groupBy("gap_s")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = F.broadcast(v.agg(F.sum("c").cast("bigint").alias("n")))
    w_run = W.orderBy("gap_s").rowsBetween(W.unboundedPreceding, 0)
    surv = v.crossJoin(tot).select(
        "gap_s",
        (
            1.0 - F.sum("c").over(w_run) / F.col("n").cast("double")
        ).alias("s"),
    )
    pts = surv.filter((F.col("s") > 0.001) & (F.col("s") < 0.999)).select(
        F.round(F.log(F.col("gap_s").cast("double")), 10).alias("lx"),
        F.round(F.log(-F.log("s")), 10).alias("ly"),
    )
    D12 = "decimal(28,12)"
    mom = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.col("lx").cast(D12)).cast("double").alias("sx"),
        F.sum(F.col("ly").cast(D12)).cast("double").alias("sy"),
        F.sum(F.round(F.col("lx") * F.col("lx"), 10).cast(D12))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("lx") * F.col("ly"), 10).cast(D12))
        .cast("double")
        .alias("sxy"),
    )
    slope = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("m")
    return mom.select(
        F.col("m").cast("bigint").alias("n_grid_points"),
        F.round(slope, 8).alias("weibull_shape"),
        F.round(F.exp(-intercept / slope), 6).alias("weibull_scale_s"),
    )


# --------------------------------------------- quantile shift function


def _qshift_oracle() -> str:
    cells = ",\n      ".join(
        f"quantile_cont(CASE WHEN event_type = '{arm}' THEN value END,"
        f" {p / 10.0}) AS {arm}_p{p}"
        for arm in ("click", "view")
        for p in range(1, 10)
    )
    rows = ",\n      ".join(
        f"({p / 10.0}, click_p{p}, view_p{p})" for p in range(1, 10)
    )
    return f"""
    WITH q AS (
      SELECT
      {cells}
      FROM events WHERE event_type IN ('click', 'view')
    )
    SELECT CAST(p AS DOUBLE) AS quantile, round(qc, 6) AS click_q,
      round(qv, 6) AS view_q, round(qv - qc, 8) AS shift
    FROM q, (VALUES
      {rows}) AS t(p, qc, qv)
    """


@query("ab_quantile_shift_function", oracle=_qshift_oracle())
def ab_quantile_shift_function(spark, sf_dir):
    """Doksum shift function between the click and view value
    distributions: the view-minus-click difference at each decile —
    WHERE in the distribution the two samples differ (a constant shift
    means a pure location effect; a fanning shift means the tails
    moved, which the single-number Mann-Whitney/KS verdicts cannot
    distinguish).

    Both arms' nine deciles come from ONE conditional-percentile
    aggregate (typed sort buffers, partial-merged — the
    F.percentile <-> quantile_cont bit-pairing established by
    quality_calibration_bins); the decile grid then unpivots from
    that 1-row table, so the corpus is scanned exactly once."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    aggs = [
        F.percentile(
            F.when(F.col("event_type") == arm, F.col("value")), p / 10.0
        ).alias(f"{arm}_p{p}")
        for arm in ("click", "view")
        for p in range(1, 10)
    ]
    q = e.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(p / 10.0).alias("p"),
                F.col(f"click_p{p}").alias("qc"),
                F.col(f"view_p{p}").alias("qv"),
            )
            for p in range(1, 10)
        ]
    )
    return (
        q.select(F.explode(pairs).alias("r"))
        .select(
            F.col("r.p").alias("quantile"),
            F.round("r.qc", 6).alias("click_q"),
            F.round("r.qv", 6).alias("view_q"),
            F.round(F.col("r.qv") - F.col("r.qc"), 8).alias("shift"),
        )
    )


# ------------------------------------------- sequential pattern mining

N_TRIGRAMS = 10


@query(
    "events_frequent_trigrams",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
        lead(event_type, 1) OVER w AS e2,
        lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tri AS (
      SELECT e1, e2, e3,
        CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      GROUP BY e1, e2, e3
    )
    SELECT e1, e2, e3, n_occurrences, n_users
    FROM tri
    ORDER BY n_occurrences DESC, e1, e2, e3
    LIMIT {N_TRIGRAMS}
    """,
)
def events_frequent_trigrams(spark, sf_dir):
    """Top contiguous event-type trigrams across user timelines
    (PrefixSpan-lite sequential patterns, length pinned to 3): the
    behavioral motifs one step beyond events_markov_transitions' bigrams.
    Ordering within a user is (ts, event_id) — event_id breaks timestamp
    ties so both engines walk identical sequences.

    Scale shape: ONE shuffle partitions timelines by user; the two leads
    are in-partition; the trigram rollup partial-aggregates (k^3 bounded
    keys for k event types) and the top-10 is TakeOrderedAndProject —
    no global sort materializes."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    tri = seq.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct("user_id").alias("n_users"),
    )
    return tri.orderBy(
        F.col("n_occurrences").desc(), "e1", "e2", "e3"
    ).limit(N_TRIGRAMS)


# ------------------------------------------- deterministic Poisson bootstrap

BOOT_R = 200
# Poisson(1) CDF at k = 0..6; u >= the last threshold caps the weight at 7.
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
)


def _boot_w_sql(u: str) -> str:
    branches = "".join(
        f" WHEN {u} < {c!r} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"(CASE{branches} ELSE 7 END)"


@query(
    "bootstrap_revenue_ci",
    oracle=f"""
    WITH blocks AS (
      SELECT b.b, o.o_totalprice,
        md5('boot:' || CAST(b.b AS VARCHAR) || ':'
            || CAST(o.o_orderkey AS VARCHAR)) AS h
      FROM orders o
      CROSS JOIN (SELECT unnest(range({BOOT_R // 4})) AS b) b
    ),
    expanded AS (
      SELECT b * 4 + w.w AS r, o_totalprice,
        ('0x' || substr(h, 1 + 8 * w.w, 8))::BIGINT / 4294967296.0 AS u
      FROM blocks CROSS JOIN (SELECT unnest(range(4)) AS w) w
    ),
    reps AS (
      SELECT r,
        CAST(SUM(CAST({_boot_w_sql('u')} * o_totalprice AS DECIMAL(28,6)))
          AS DOUBLE) AS wsum,
        CAST(SUM({_boot_w_sql('u')}) AS BIGINT) AS wcnt
      FROM expanded GROUP BY r
    ),
    means AS (
      SELECT r, wsum / wcnt AS m,
        ROW_NUMBER() OVER (ORDER BY wsum / wcnt, r) AS rn
      FROM reps
    ),
    point AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
          / COUNT(*) AS mean_revenue
      FROM orders
    )
    SELECT
      CAST({BOOT_R} AS BIGINT) AS n_replicates,
      round(point.mean_revenue, 6) AS mean_revenue,
      round(CAST(SUM(CAST(round(m, 9) AS DECIMAL(28,12))) AS DOUBLE)
        / {BOOT_R}, 6) AS boot_mean,
      round(MIN(CASE WHEN rn = {BOOT_R // 40} THEN m END), 6) AS ci_lo,
      round(MIN(CASE WHEN rn = {BOOT_R - BOOT_R // 40 + 1} THEN m END), 6)
        AS ci_hi
    FROM means CROSS JOIN point
    GROUP BY point.mean_revenue
    """,
)
def bootstrap_revenue_ci(spark, sf_dir):
    """Percentile-bootstrap 95% CI for mean order revenue with
    DETERMINISTIC Poisson(1) resampling weights (Chamandy et al.'s
    streaming bootstrap): replicate r draws each order with weight
    w ~ Poisson(1) via an inverse-CDF lookup on the md5('boot:'||r||':'||
    key) uniform, so both engines — and any two cluster runs — see the
    same resamples. Replicate means are exact (integer weight x
    decimal(12,2) price, decimal-summed before ONE division); the CI is
    the 5th / 196th order statistic of the 200 replicate means
    (rank ties broken by replicate id).

    Scale shape: the orders x 200 expansion is map-side (explode of a
    literal range — no shuffle, no materialization) and immediately
    partial-aggregates to 200 groups, so the only shuffle moves
    200 x n_partitions pre-combined rows; the rank window runs on 200
    rows. This is the one-pass alternative to actually resampling a
    100 TB fact table 200 times."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    w = F.lit(7)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(F.col("u") < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(w)
    # One md5 per (order, replicate-BLOCK): a digest is 32 hex chars = four
    # independent 32-bit uniforms, so hash cost drops 4x vs per-replicate
    # hashing with identical portability and weight quality.
    # Repartition BEFORE the 200x expansion: the fact scan may arrive in
    # few (even one) input partitions at small scale, and the explode
    # multiplies density 200x — spread it across the cluster first (a tiny
    # shuffle of the base rows buys full parallelism for the heavy map).
    o = o.repartition(spark.sparkContext.defaultParallelism)
    blocks = o.select(
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_R // 4 - 1))).alias("b"),
        "o_orderkey",
        "o_totalprice",
    ).withColumn(
        "h",
        F.md5(
            F.concat(
                F.lit("boot:"),
                F.col("b").cast("string"),
                F.lit(":"),
                F.col("o_orderkey").cast("string"),
            )
        ),
    )
    expanded = blocks.select(
        "b",
        "o_totalprice",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("wd"),
    ).select(
        (F.col("b") * 4 + F.col("wd")).alias("r"),
        "o_totalprice",
        (
            F.conv(
                F.substring(F.col("h"), F.lit(1) + F.lit(8) * F.col("wd"), F.lit(8)),
                16,
                10,
            ).cast("bigint")
            / F.lit(4294967296.0)
        ).alias("u"),
    )
    reps = (
        expanded.withColumn("w", w)
        .groupBy("r")
        .agg(
            F.sum((F.col("w") * F.col("o_totalprice")).cast(DEC))
            .cast("double")
            .alias("wsum"),
            F.sum("w").cast("bigint").alias("wcnt"),
        )
    )
    means = reps.select(
        "r",
        (F.col("wsum") / F.col("wcnt")).alias("m"),
    ).withColumn(
        "rn", F.row_number().over(W.orderBy("m", "r"))
    )
    point = o.agg(
        (F.sum(F.col("o_totalprice").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
            "mean_revenue"
        )
    )
    return (
        means.crossJoin(F.broadcast(point))
        .groupBy("mean_revenue")
        .agg(
            F.lit(BOOT_R).cast("bigint").alias("n_replicates"),
            F.round(
                F.sum(F.round(F.col("m"), 9).cast("decimal(28,12)")).cast("double")
                / BOOT_R,
                6,
            ).alias("boot_mean"),
            F.round(
                F.min(F.when(F.col("rn") == BOOT_R // 40, F.col("m"))), 6
            ).alias("ci_lo"),
            F.round(
                F.min(
                    F.when(F.col("rn") == BOOT_R - BOOT_R // 40 + 1, F.col("m"))
                ),
                6,
            ).alias("ci_hi"),
        )
        .select(
            "n_replicates",
            F.round("mean_revenue", 6).alias("mean_revenue"),
            "boot_mean",
            "ci_lo",
            "ci_hi",
        )
    )


# ------------------------------------------- always-valid sequential test

MSPRT_TAU2 = 0.01


@query(
    "ab_test_msprt",
    oracle=f"""
    WITH assign AS (
      SELECT user_id,
        CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
          AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS BIGINT) AS x
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT
        CAST(COUNT(*) FILTER (WHERE arm = 'A') AS BIGINT) AS n_a,
        CAST(COUNT(*) FILTER (WHERE arm = 'B') AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN arm = 'A' THEN x ELSE 0 END) AS BIGINT) AS s_a,
        CAST(SUM(CASE WHEN arm = 'B' THEN x ELSE 0 END) AS BIGINT) AS s_b,
        CAST(SUM(CASE WHEN arm = 'A' THEN x * x ELSE 0 END) AS BIGINT) AS q_a,
        CAST(SUM(CASE WHEN arm = 'B' THEN x * x ELSE 0 END) AS BIGINT) AS q_b
      FROM assign
    ),
    stats AS (
      SELECT n_a, n_b,
        s_b / CAST(n_b AS DOUBLE) - s_a / CAST(n_a AS DOUBLE) AS delta,
        (q_a - s_a * (s_a / CAST(n_a AS DOUBLE))) / (n_a - 1) / n_a
          + (q_b - s_b * (s_b / CAST(n_b AS DOUBLE))) / (n_b - 1) / n_b AS v
      FROM arms
    )
    SELECT n_a, n_b,
      round(delta, 8) AS delta,
      round(v, 10) AS var_delta,
      round(sqrt(v / (v + {MSPRT_TAU2!r}))
        * exp(delta * delta * {MSPRT_TAU2!r}
              / (2 * v * (v + {MSPRT_TAU2!r}))), 8) AS lambda_stat,
      round(LEAST(1.0, 1.0 / (sqrt(v / (v + {MSPRT_TAU2!r}))
        * exp(delta * delta * {MSPRT_TAU2!r}
              / (2 * v * (v + {MSPRT_TAU2!r}))))), 8) AS p_always_valid,
      LEAST(1.0, 1.0 / (sqrt(v / (v + {MSPRT_TAU2!r}))
        * exp(delta * delta * {MSPRT_TAU2!r}
              / (2 * v * (v + {MSPRT_TAU2!r}))))) < 0.05 AS reject_at_5pct
    FROM stats
    """,
)
def ab_test_msprt(spark, sf_dir):
    """Always-valid sequential test (mixture SPRT, Johari et al.'s
    "peeking" fix) on hash-assigned per-user purchase counts: with
    delta = mean_B - mean_A and V = s_a^2/n_a + s_b^2/n_b (sample
    variances from EXACT integer sum / sum-of-squares aggregates), the
    normal-mixture likelihood ratio Lambda = sqrt(V/(V+tau^2)) *
    exp(delta^2 tau^2 / (2 V (V+tau^2))) with fixed mixing variance
    tau^2 = 0.01 gives p_av = min(1, 1/Lambda), valid at EVERY interim
    look — the missing member of the experimentation pack next to the
    fixed-horizon Welch/z tests and the SRM guardrail.

    Scale shape: one user-grain rollup (partial-aggregated), one 6-cell
    integer reduce, then closed-form scalar math — the statistic costs
    the same at any corpus size, and the integer sufficient statistics
    make it bit-reproducible across engines and partitionings."""
    e = table(spark, sf_dir, "events")
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    assign = (
        e.groupBy("user_id")
        .agg(
            F.sum((F.col("event_type") == "purchase").cast("int"))
            .cast("bigint")
            .alias("x")
        )
        .select(arm.alias("arm"), "x")
    )
    arms = assign.agg(
        F.sum((F.col("arm") == "A").cast("int")).cast("bigint").alias("n_a"),
        F.sum((F.col("arm") == "B").cast("int")).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("arm") == "A", F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("s_a"),
        F.sum(F.when(F.col("arm") == "B", F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("s_b"),
        F.sum(F.when(F.col("arm") == "A", F.col("x") * F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("q_a"),
        F.sum(F.when(F.col("arm") == "B", F.col("x") * F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("q_b"),
    )
    mean_a = F.col("s_a") / F.col("n_a").cast("double")
    mean_b = F.col("s_b") / F.col("n_b").cast("double")
    s = arms.select(
        "n_a",
        "n_b",
        (mean_b - mean_a).alias("delta"),
        (
            (F.col("q_a") - F.col("s_a") * mean_a) / (F.col("n_a") - 1) / F.col("n_a")
            + (F.col("q_b") - F.col("s_b") * mean_b) / (F.col("n_b") - 1) / F.col("n_b")
        ).alias("v"),
    )
    lam = F.sqrt(F.col("v") / (F.col("v") + MSPRT_TAU2)) * F.exp(
        F.col("delta")
        * F.col("delta")
        * MSPRT_TAU2
        / (2 * F.col("v") * (F.col("v") + MSPRT_TAU2))
    )
    p_av = F.least(F.lit(1.0), 1.0 / F.col("lambda_stat"))
    return (
        s.withColumn("lambda_stat", lam)
        .select(
            "n_a",
            "n_b",
            F.round("delta", 8).alias("delta"),
            F.round("v", 10).alias("var_delta"),
            F.round("lambda_stat", 8).alias("lambda_stat"),
            F.round(p_av, 8).alias("p_always_valid"),
            (p_av < 0.05).alias("reject_at_5pct"),
        )
    )


# ------------------------------------- multiple testing: BH-FDR control

FDR_Q = 0.05
# Abramowitz-Stegun 7.1.26 erf constants (shared verbatim by both engines)
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_INV_SQRT2 = 0.7071067811865476


def _erfc_sql(x: str) -> str:
    """Two-sided normal tail 2*(1-Phi(|z|)) = erfc(|z|/sqrt(2)) via the
    A&S 7.1.26 polynomial — identical literal arithmetic in both engines."""
    t = f"(1.0 / (1.0 + {_AS_P!r} * {x}))"
    a1, a2, a3, a4, a5 = _AS_A
    y = (
        f"((((({_AS_A[4]!r} * {t} + {_AS_A[3]!r}) * {t} + {_AS_A[2]!r}) * {t} "
        f"+ {_AS_A[1]!r}) * {t} + {_AS_A[0]!r}) * {t})"
    )
    return f"({y} * exp(-({x}) * ({x})))"


def _erfc_col(x):
    t = 1.0 / (1.0 + _AS_P * x)
    y = (
        (((_AS_A[4] * t + _AS_A[3]) * t + _AS_A[2]) * t + _AS_A[1]) * t + _AS_A[0]
    ) * t
    return y * F.exp(-x * x)


@query(
    "nation_acctbal_fdr_bh",
    oracle=f"""
    WITH percust AS (
      SELECT c.c_nationkey, n.n_name, c.c_acctbal AS x
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    bynat AS (
      SELECT n_name,
        CAST(COUNT(*) AS BIGINT) AS n_k,
        {_d('x')} AS s_k,
        {_d('x * x')} AS q_k
      FROM percust GROUP BY n_name
    ),
    gall AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
        {_d('x')} AS s_all, {_d('x * x')} AS q_all
      FROM percust
    ),
    zs AS (
      SELECT n_name, n_k,
        s_k / n_k AS mean_k,
        ((s_k / n_k) - ((s_all - s_k) / (n_all - n_k)))
        / sqrt(
            ((q_k - s_k * (s_k / n_k)) / (n_k - 1)) / n_k
            + (((q_all - q_k) - (s_all - s_k) * ((s_all - s_k) / (n_all - n_k)))
               / ((n_all - n_k) - 1)) / (n_all - n_k)
          ) AS z
      FROM bynat CROSS JOIN gall
    ),
    ps AS (
      SELECT n_name, n_k, mean_k, z,
        {_erfc_sql(f'({_INV_SQRT2!r} * abs(z))')} AS p
      FROM zs
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY p, n_name) AS p_rank,
        COUNT(*) OVER () AS m
      FROM ps
    ),
    cut AS (
      SELECT *, MAX(CASE WHEN p <= p_rank * {FDR_Q!r} / m THEN p_rank END)
        OVER () AS max_pass
      FROM ranked
    )
    SELECT n_name, n_k, round(mean_k, 6) AS mean_acctbal,
      round(z, 8) AS z, round(p, 10) AS p_value,
      CAST(p_rank AS BIGINT) AS p_rank,
      round(p_rank * {FDR_Q!r} / m, 10) AS bh_threshold,
      p_rank <= COALESCE(max_pass, 0) AS discovery
    FROM cut
    """,
)
def nation_acctbal_fdr_bh(spark, sf_dir):
    """Benjamini-Hochberg FDR control over the 25-nation battery of
    two-sample z-tests (each nation's customer account balance vs the
    rest of the corpus): the multiple-testing governance the rest of the
    per-segment test family (Welch, Mood, KW) deliberately leaves to the
    caller. p-values come from the Abramowitz-Stegun 7.1.26 erfc
    polynomial evaluated with IDENTICAL literal arithmetic in Spark and
    DuckDB; the step-up cutoff is the largest rank whose p <= rank*q/m,
    computed with two windows over the 25-row test table.

    Scale shape: one partial-aggregated rollup per nation (exact decimal
    sum/sum-of-squares sufficient statistics), a broadcast scalar for
    the complement ("rest") moments via subtraction, then all BH logic
    on m rows = number of tests, independent of corpus size."""
    c = table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    n = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    percust = c.join(F.broadcast(n), "c_nationkey").select(
        "n_name", F.col("c_acctbal").alias("x")
    )
    bynat = percust.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_k"),
        dsum("x").alias("s_k"),
        dsum(F.col("x") * F.col("x")).alias("q_k"),
    )
    glob = percust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        dsum("x").alias("s_all"),
        dsum(F.col("x") * F.col("x")).alias("q_all"),
    )
    mean_k = F.col("s_k") / F.col("n_k")
    n_r = F.col("n_all") - F.col("n_k")
    s_r = F.col("s_all") - F.col("s_k")
    q_r = F.col("q_all") - F.col("q_k")
    mean_r = s_r / n_r
    var_k = (F.col("q_k") - F.col("s_k") * mean_k) / (F.col("n_k") - 1)
    var_r = (q_r - s_r * mean_r) / (n_r - 1)
    zs = bynat.crossJoin(F.broadcast(glob)).select(
        "n_name",
        "n_k",
        mean_k.alias("mean_k"),
        ((mean_k - mean_r) / F.sqrt(var_k / F.col("n_k") + var_r / n_r)).alias("z"),
    )
    ps = zs.withColumn("p", _erfc_col(F.lit(_INV_SQRT2) * F.abs(F.col("z"))))
    ranked = ps.withColumn(
        "p_rank", F.row_number().over(W.orderBy("p", "n_name"))
    ).withColumn("m", F.count(F.lit(1)).over(W.partitionBy()))
    bh = F.col("p_rank") * FDR_Q / F.col("m")
    cut = ranked.withColumn(
        "max_pass",
        F.max(F.when(F.col("p") <= bh, F.col("p_rank"))).over(W.partitionBy()),
    )
    return cut.select(
        "n_name",
        "n_k",
        F.round("mean_k", 6).alias("mean_acctbal"),
        F.round("z", 8).alias("z"),
        F.round("p", 10).alias("p_value"),
        F.col("p_rank").cast("bigint").alias("p_rank"),
        F.round(bh, 10).alias("bh_threshold"),
        (F.col("p_rank") <= F.coalesce(F.col("max_pass"), F.lit(0))).alias(
            "discovery"
        ),
    )


# ------------------------------------- survey calibration: raking (IPF)

_RK_SUM = 'CAST(SUM(CAST(round(w, 9) AS DECIMAL(28,12))) AS DOUBLE)'


def _rk_adjust(prev: str, out: str, key: str, tgt: str) -> str:
    return f"""
    {out}_m AS (
      SELECT {key}, {_RK_SUM} AS s FROM {prev} GROUP BY {key}
    ),
    {out} AS (
      SELECT p.n_name, p.segment, p.n_cell,
        p.w * ((CAST(tot.n_all AS DOUBLE) / tot.{tgt}) / m.s) AS w
      FROM {prev} p JOIN {out}_m m USING ({key}) CROSS JOIN tot
    )"""


@query(
    "customer_raking_weights",
    oracle=f"""
    WITH cells AS (
      SELECT n.n_name, c.c_mktsegment AS segment,
        CAST(COUNT(*) AS BIGINT) AS n_cell
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, c.c_mktsegment
    ),
    tot AS (
      SELECT CAST(SUM(n_cell) AS BIGINT) AS n_all,
        CAST(COUNT(DISTINCT n_name) AS BIGINT) AS n_nat,
        CAST(COUNT(DISTINCT segment) AS BIGINT) AS n_seg
      FROM cells
    ),
    w0 AS (SELECT n_name, segment, n_cell, CAST(n_cell AS DOUBLE) AS w FROM cells),
    {_rk_adjust('w0', 'w1', 'n_name', 'n_nat')},
    {_rk_adjust('w1', 'w2', 'segment', 'n_seg')},
    {_rk_adjust('w2', 'w3', 'n_name', 'n_nat')},
    {_rk_adjust('w3', 'w4', 'segment', 'n_seg')}
    SELECT n_name, segment, n_cell, round(w, 8) AS weight,
      round(w / n_cell, 8) AS unit_weight
    FROM w4
    """,
)
def customer_raking_weights(spark, sf_dir):
    """Survey-calibration raking (iterative proportional fitting, 2 full
    rounds) of the customer nation x market-segment table onto UNIFORM
    nation and segment margins: alternately scale cell weights so each
    nation's total hits N/n_nations, then each segment's hits
    N/n_segments. unit_weight is the per-customer calibration weight a
    downstream weighted estimator would apply — the standard fix when a
    corpus over-represents some strata (the deterministic sibling of
    stratified_neyman_allocation, which allocates a SAMPLE instead of
    reweighting the population).

    Scale shape: after ONE partial-aggregated rollup to the
    nations x segments cell table, every IPF adjustment is a margin
    aggregate over the cell table joined back broadcast — per-round cost
    is bounded by the contingency table, not the corpus. Margin sums use
    the round-then-decimal-sum recipe so each round is bit-reproducible
    under any partitioning."""
    c = table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment")
    n = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    cells = (
        c.join(F.broadcast(n), "c_nationkey")
        .groupBy("n_name", F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cell"))
    )
    tot = F.broadcast(
        cells.agg(
            F.sum("n_cell").cast("bigint").alias("n_all"),
            F.count_distinct("n_name").cast("bigint").alias("n_nat"),
            F.count_distinct("segment").cast("bigint").alias("n_seg"),
        )
    )
    w = cells.withColumn("w", F.col("n_cell").cast("double")).crossJoin(tot)

    def rdsum9(col):
        return F.sum(F.round(col, 9).cast("decimal(28,12)")).cast("double")

    for key, tgt in (("n_name", "n_nat"), ("segment", "n_seg")) * 2:
        m = w.groupBy(key).agg(rdsum9(F.col("w")).alias("s"))
        w = (
            w.join(F.broadcast(m), key)
            .withColumn(
                "w",
                F.col("w")
                * ((F.col("n_all").cast("double") / F.col(tgt)) / F.col("s")),
            )
            .drop("s")
        )
    return w.select(
        "n_name",
        "segment",
        "n_cell",
        F.round("w", 8).alias("weight"),
        F.round(F.col("w") / F.col("n_cell"), 8).alias("unit_weight"),
    )


# ------------------------------------- robust trend: Theil-Sen estimator


@query(
    "orders_monthly_theil_sen_trend",
    oracle="""
    WITH monthly AS (
      SELECT CAST(date_part('year', o_orderdate) * 12
           + date_part('month', o_orderdate) - 1 AS BIGINT) AS t,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS y
      FROM orders GROUP BY t
    ),
    slopes AS (
      SELECT (b.y - a.y) / (b.t - a.t) AS s
      FROM monthly a JOIN monthly b ON a.t < b.t
    ),
    sl AS (SELECT quantile_cont(s, 0.5) AS slope FROM slopes),
    ic AS (
      SELECT quantile_cont(m.y - sl.slope * m.t, 0.5) AS intercept
      FROM monthly m CROSS JOIN sl
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM monthly) AS n_points,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM slopes) AS n_pairs,
      round(sl.slope, 8) AS ts_slope,
      round(ic.intercept, 6) AS ts_intercept
    FROM sl CROSS JOIN ic
    """,
)
def orders_monthly_theil_sen_trend(spark, sf_dir):
    """Theil-Sen robust trend of monthly revenue: the MEDIAN of all
    pairwise slopes (and the median residual intercept) — a 29%-
    breakdown-point alternative to the OLS trend line that one
    anomalous month cannot drag (the robust sibling of the
    linear-trend + Durbin-Watson family; compare the two slopes to see
    whether outlier months are steering the narrative).

    Scale shape: the corpus reduces to a SERIES-sized monthly rollup
    (partial-aggregated decimal-exact sums) before the pairwise
    self-join, so the O(n^2) pair table is months-squared — bounded by
    calendar length, never by order volume; medians come from the
    established F.percentile <-> quantile_cont bit-pairing."""
    o = table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("bigint")
            .alias("t")
        )
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("y"))
        .persist()
    )
    a = monthly.select(F.col("t").alias("ta"), F.col("y").alias("ya"))
    b = monthly.select(F.col("t").alias("tb"), F.col("y").alias("yb"))
    slopes = a.join(b, F.col("ta") < F.col("tb")).select(
        ((F.col("yb") - F.col("ya")) / (F.col("tb") - F.col("ta"))).alias("s")
    )
    sl = F.broadcast(slopes.agg(F.percentile("s", 0.5).alias("slope")))
    ic = F.broadcast(
        monthly.crossJoin(sl).agg(
            F.percentile(F.col("y") - F.col("slope") * F.col("t"), 0.5).alias(
                "intercept"
            )
        )
    )
    counts = monthly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    ).crossJoin(F.broadcast(slopes.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))))
    return (
        counts.crossJoin(sl)
        .crossJoin(ic)
        .select(
            "n_points",
            "n_pairs",
            F.round("slope", 8).alias("ts_slope"),
            F.round("intercept", 6).alias("ts_intercept"),
        )
    )


# --------------------------------- negative-binomial count-model fit

NB_KMAX = 19  # observed/expected table covers k = 0..19 plus a >=20 tail


def _nb_pmf_expr(k: int) -> str:
    """NB pmf written as one closed-form expression over named columns
    (r, q, base = (1-q)^r): base * prod_{{j<k}}(r+j) / k! * q^k. The
    SAME string is evaluated by Spark (F.expr) and DuckDB, so the IEEE
    operation order is identical by construction."""
    import math

    poly = " * ".join(f"(r + {j})" if j else "(r)" for j in range(k)) or "1.0"
    fact = float(math.factorial(k))
    return f"(((base * {poly}) / {fact!r}) * pow(q, {k}))"


_NB_OBS = ", ".join(
    f"CAST(SUM(CASE WHEN x = {k} THEN 1 ELSE 0 END) AS BIGINT) AS obs{k}"
    for k in range(NB_KMAX + 1)
)
_NB_PMF = ", ".join(f"{_nb_pmf_expr(k)} AS pmf{k}" for k in range(NB_KMAX + 1))
_NB_PSUM = " + ".join(f"pmf{k}" for k in range(NB_KMAX + 1))
_NB_ROWS = " UNION ALL ".join(
    f"""SELECT {k} AS k, obs{k} AS observed, n * pmf{k} AS expected,
        r AS r_hat, q AS q_hat FROM pmf"""
    for k in range(NB_KMAX + 1)
)


@query(
    "customer_order_count_negbin_fit",
    oracle=f"""
    WITH peruser AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS x FROM orders
      GROUP BY o_custkey
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(x) AS BIGINT) AS s,
        CAST(SUM(x * x) AS BIGINT) AS qq,
        {_NB_OBS},
        CAST(SUM(CASE WHEN x > {NB_KMAX} THEN 1 ELSE 0 END) AS BIGINT)
          AS obs_tail
      FROM peruser
    ),
    c1 AS (SELECT *, s / CAST(n AS DOUBLE) AS m FROM agg),
    c2 AS (SELECT *, (qq - s * m) / (n - 1) AS v FROM c1),
    c3 AS (SELECT *, (m * m) / (v - m) AS r FROM c2),
    c4 AS (SELECT *, m / (m + r) AS q FROM c3),
    c5 AS (SELECT *, exp(r * ln(1 - q)) AS base FROM c4),
    pmf AS (SELECT *, {_NB_PMF} FROM c5),
    rows_ AS (
      {_NB_ROWS}
      UNION ALL
      SELECT {NB_KMAX + 1}, obs_tail, n * (1 - ({_NB_PSUM})), r, q FROM pmf
    )
    SELECT k, observed, round(expected, 6) AS expected,
      round((observed - expected) * (observed - expected) / expected, 8)
        AS chi2_contrib,
      round(r_hat, 6) AS r_hat, round(q_hat, 8) AS q_hat
    FROM rows_
    """,
)
def customer_order_count_negbin_fit(spark, sf_dir):
    """Negative-binomial fit of orders-per-customer by method of moments
    (r = m^2/(v - m), q = m/(m + r)) with an observed-vs-expected
    frequency table for k = 0..{NB_KMAX} plus a tail bucket and per-row
    chi-square contributions — the parametric count MODEL on top of the
    events_overdispersion_test verdict (NB nests Poisson as r -> inf, so
    a huge r_hat says "Poisson is fine", while a small one quantifies
    clumping). Every pmf value is one closed-form expression over the
    fitted (r, q) evaluated from the SAME string in Spark and DuckDB, so
    the recursion-free unrolling is bit-identical.

    Scale shape: one per-customer rollup, then a single 20+3-column
    integer reduce; the pmf table is computed on that one row and
    exploded to {NB_KMAX + 2} output rows — constant work after the
    first aggregate at any corpus size."""
    per = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("qq"),
        *[
            F.sum((F.col("x") == k).cast("int")).cast("bigint").alias(f"obs{k}")
            for k in range(NB_KMAX + 1)
        ],
        F.sum((F.col("x") > NB_KMAX).cast("int")).cast("bigint").alias("obs_tail"),
    )
    pmf = (
        agg.withColumn("m", F.col("s") / F.col("n").cast("double"))
        .withColumn("v", (F.col("qq") - F.col("s") * F.col("m")) / (F.col("n") - 1))
        .withColumn("r", (F.col("m") * F.col("m")) / (F.col("v") - F.col("m")))
        .withColumn("q", F.col("m") / (F.col("m") + F.col("r")))
        .withColumn("base", F.exp(F.col("r") * F.log(1 - F.col("q"))))
    )
    for k in range(NB_KMAX + 1):
        pmf = pmf.withColumn(f"pmf{k}", F.expr(_nb_pmf_expr(k)))
    structs = [
        F.struct(
            F.lit(k).alias("k"),
            F.col(f"obs{k}").alias("observed"),
            (F.col("n") * F.col(f"pmf{k}")).alias("expected"),
        )
        for k in range(NB_KMAX + 1)
    ] + [
        F.struct(
            F.lit(NB_KMAX + 1).alias("k"),
            F.col("obs_tail").alias("observed"),
            (F.col("n") * (1 - F.expr(_NB_PSUM))).alias("expected"),
        )
    ]
    return (
        pmf.select("r", "q", F.explode(F.array(*structs)).alias("w"))
        .select(
            F.col("w.k").alias("k"),
            F.col("w.observed").alias("observed"),
            F.round("w.expected", 6).alias("expected"),
            F.round(
                (F.col("w.observed") - F.col("w.expected"))
                * (F.col("w.observed") - F.col("w.expected"))
                / F.col("w.expected"),
                8,
            ).alias("chi2_contrib"),
            F.round("r", 6).alias("r_hat"),
            F.round("q", 8).alias("q_hat"),
        )
    )


# --------------------------------- delete-one-group jackknife


@query(
    "jackknife_mean_acctbal",
    oracle="""
    WITH bynat AS (
      SELECT c_nationkey,
        CAST(COUNT(*) AS BIGINT) AS n_i,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS s_i
      FROM customer GROUP BY c_nationkey
    ),
    gall AS (
      SELECT CAST(SUM(n_i) AS BIGINT) AS n_all,
        CAST(SUM(CAST(round(s_i, 9) AS DECIMAL(28,12))) AS DOUBLE) AS s_all,
        CAST(COUNT(*) AS BIGINT) AS g
      FROM bynat
    ),
    thetas AS (
      SELECT (s_all - s_i) / (n_all - n_i) AS theta_i, g,
        s_all / n_all AS theta
      FROM bynat CROSS JOIN gall
    ),
    tbar AS (
      SELECT CAST(SUM(CAST(round(theta_i, 9) AS DECIMAL(28,12))) AS DOUBLE)
        / MAX(g) AS tb, MAX(g) AS g, MAX(theta) AS theta
      FROM thetas
    )
    SELECT g, round(theta, 6) AS theta,
      round(sqrt((g - 1.0) / g
        * (SELECT CAST(SUM(CAST(round((theta_i - tbar.tb) * (theta_i - tbar.tb), 9)
            AS DECIMAL(28,12))) AS DOUBLE) FROM thetas)), 8) AS jk_se,
      round((g - 1.0) * (tb - theta), 8) AS jk_bias
    FROM tbar
    """,
)
def jackknife_mean_acctbal(spark, sf_dir):
    """Delete-one-GROUP jackknife of the global mean account balance,
    with nations as the deletion groups: theta_(i) recomputed from the
    complement sums, SE = sqrt((G-1)/G * sum (theta_(i) - theta_bar)^2)
    and the (G-1)-scaled bias estimate. The design-based uncertainty
    companion to bootstrap_revenue_ci: where the bootstrap resamples
    ROWS (right when rows are independent), the grouped jackknife
    respects CLUSTERED sampling — nations here standing in for the
    crawl-host/shard clustering a real corpus has.

    Scale shape: one per-group rollup of exact decimal sums; every
    theta_(i) is complement arithmetic on broadcast scalars, so the
    jackknife costs one G-row pass after the group aggregate regardless
    of corpus size."""
    c = table(spark, sf_dir, "customer")
    bynat = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("s_i"),
    )

    def rsum(col):
        return F.sum(F.round(col, 9).cast("decimal(28,12)")).cast("double")

    gall = F.broadcast(
        bynat.agg(
            F.sum("n_i").cast("bigint").alias("n_all"),
            rsum(F.col("s_i")).alias("s_all"),
            F.count(F.lit(1)).cast("bigint").alias("g"),
        )
    )
    thetas = bynat.crossJoin(gall).select(
        ((F.col("s_all") - F.col("s_i")) / (F.col("n_all") - F.col("n_i"))).alias(
            "theta_i"
        ),
        "g",
        (F.col("s_all") / F.col("n_all")).alias("theta"),
    )
    tbar = F.broadcast(
        thetas.agg(
            (rsum(F.col("theta_i")) / F.max("g")).alias("tb"),
            F.max("g").alias("g"),
            F.max("theta").alias("theta"),
        )
    )
    dev = thetas.crossJoin(tbar.select(F.col("tb").alias("tb2"))).agg(
        rsum(
            (F.col("theta_i") - F.col("tb2")) * (F.col("theta_i") - F.col("tb2"))
        ).alias("ss")
    )
    return (
        tbar.crossJoin(F.broadcast(dev))
        .select(
            "g",
            F.round("theta", 6).alias("theta"),
            F.round(
                F.sqrt((F.col("g") - 1.0) / F.col("g") * F.col("ss")), 8
            ).alias("jk_se"),
            F.round((F.col("g") - 1.0) * (F.col("tb") - F.col("theta")), 8).alias(
                "jk_bias"
            ),
        )
    )


# --------------------------------- deterministic permutation test

PERM_B = 199


@query(
    "ab_permutation_test",
    oracle=f"""
    WITH peruser AS (
      SELECT user_id,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 2 AS arm,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS BIGINT) AS x
      FROM events GROUP BY user_id
    ),
    expanded AS (
      SELECT b.b,
        CASE WHEN b.b = 0 THEN arm
          ELSE CAST(('0x' || substr(md5('perm:' || CAST(b.b AS VARCHAR) || ':'
            || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 END AS arm_b,
        x
      FROM peruser CROSS JOIN (SELECT unnest(range({PERM_B} + 1)) AS b) b
    ),
    diffs AS (
      SELECT b,
        CAST(SUM(CASE WHEN arm_b = 1 THEN x ELSE 0 END) AS DOUBLE)
          / SUM(CASE WHEN arm_b = 1 THEN 1 ELSE 0 END)
        - CAST(SUM(CASE WHEN arm_b = 0 THEN x ELSE 0 END) AS DOUBLE)
          / SUM(CASE WHEN arm_b = 0 THEN 1 ELSE 0 END) AS d
      FROM expanded GROUP BY b
    ),
    obs AS (SELECT d AS d_obs FROM diffs WHERE b = 0)
    SELECT round(obs.d_obs, 8) AS d_obs,
      CAST({PERM_B} AS BIGINT) AS n_perms,
      CAST(SUM(CASE WHEN diffs.b > 0 AND abs(diffs.d) >= abs(obs.d_obs)
        THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
      round((1 + SUM(CASE WHEN diffs.b > 0 AND abs(diffs.d) >= abs(obs.d_obs)
        THEN 1 ELSE 0 END)) / CAST({PERM_B} + 1 AS DOUBLE), 6) AS p_value
    FROM diffs CROSS JOIN obs
    GROUP BY obs.d_obs
    """,
)
def ab_permutation_test(spark, sf_dir):
    """Permutation test of the arm difference in per-user purchase counts
    with {PERM_B} DETERMINISTIC label permutations (md5('perm:'||b||user)
    reassignments — the same resamples on any engine, any partitioning,
    any rerun): p = (1 + #{{|d_b| >= |d_obs|}}) / (B+1). The
    assumption-free member of the experimentation pack — exact under the
    null of exchangeable labels where Welch/mSPRT lean on normality.

    Scale shape: the user-grain rollup happens ONCE; the B+1-fold
    expansion is a map-side explode that immediately partial-aggregates
    to B+1 integer-sum groups (the same one-pass trick as
    bootstrap_revenue_ci), and the decision is a B+1-row reduce against
    the broadcast observed difference."""
    e = table(spark, sf_dir, "events")
    peruser = (
        e.groupBy("user_id")
        .agg(
            F.sum((F.col("event_type") == "purchase").cast("int"))
            .cast("bigint")
            .alias("x")
        )
        .select(
            "user_id",
            "x",
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
                ).cast("bigint")
                % 2
            ).alias("arm"),
        )
    )
    arm_b = F.when(F.col("b") == 0, F.col("arm")).otherwise(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("perm:"),
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    expanded = peruser.select(
        F.explode(F.sequence(F.lit(0), F.lit(PERM_B))).alias("b"),
        "user_id",
        "arm",
        "x",
    ).select("b", arm_b.alias("arm_b"), "x")
    diffs = expanded.groupBy("b").agg(
        (
            F.sum(F.when(F.col("arm_b") == 1, F.col("x")).otherwise(0)).cast("double")
            / F.sum((F.col("arm_b") == 1).cast("int"))
            - F.sum(F.when(F.col("arm_b") == 0, F.col("x")).otherwise(0)).cast(
                "double"
            )
            / F.sum((F.col("arm_b") == 0).cast("int"))
        ).alias("d")
    )
    obs = F.broadcast(diffs.filter(F.col("b") == 0).select(F.col("d").alias("d_obs")))
    extreme = F.sum(
        (
            (F.col("b") > 0) & (F.abs(F.col("d")) >= F.abs(F.col("d_obs")))
        ).cast("int")
    ).cast("bigint")
    return (
        diffs.crossJoin(obs)
        .groupBy("d_obs")
        .agg(
            F.lit(PERM_B).cast("bigint").alias("n_perms"),
            extreme.alias("n_extreme"),
            F.round((1 + extreme) / F.lit(float(PERM_B + 1)), 6).alias("p_value"),
        )
        .select(
            F.round("d_obs", 8).alias("d_obs"),
            "n_perms",
            "n_extreme",
            "p_value",
        )
    )


# --------------------------------- Kendall tau-b from the value grid


@query(
    "kendall_tau_qty_discount",
    oracle="""
    WITH grid AS (
      SELECT l_quantity AS q, l_discount AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY l_quantity, l_discount
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM grid),
    cd AS (
      SELECT
        CAST(SUM(CASE WHEN (a.q < b.q AND a.d < b.d)
                        OR (a.q > b.q AND a.d > b.d)
                 THEN a.c * b.c ELSE 0 END) / 2 AS BIGINT) AS conc,
        CAST(SUM(CASE WHEN (a.q < b.q AND a.d > b.d)
                        OR (a.q > b.q AND a.d < b.d)
                 THEN a.c * b.c ELSE 0 END) / 2 AS BIGINT) AS disc
      FROM grid a CROSS JOIN grid b
    ),
    ties AS (
      SELECT
        (SELECT CAST(SUM(cq * (cq - 1) / 2) AS BIGINT) FROM
          (SELECT SUM(c) AS cq FROM grid GROUP BY q)) AS t_q,
        (SELECT CAST(SUM(cdd * (cdd - 1) / 2) AS BIGINT) FROM
          (SELECT SUM(c) AS cdd FROM grid GROUP BY d)) AS t_d
    )
    SELECT tot.n, cd.conc, cd.disc, ties.t_q, ties.t_d,
      round((cd.conc - cd.disc)
        / sqrt((CAST(tot.n AS DOUBLE) * (tot.n - 1) / 2 - ties.t_q)
             * (CAST(tot.n AS DOUBLE) * (tot.n - 1) / 2 - ties.t_d)), 8)
        AS tau_b
    FROM cd CROSS JOIN ties CROSS JOIN tot
    """,
)
def kendall_tau_qty_discount(spark, sf_dir):
    """Kendall tau-b rank correlation between line quantity and discount,
    computed EXACTLY from the bounded (quantity x discount) contingency
    grid: concordant/discordant pair counts are integer sums over grid
    cell pairs, tie corrections come from the marginals, and only the
    final ratio touches floating point. The concordance-probability
    sibling of spearman_qty_discount (tau-b estimates P(concordant) -
    P(discordant); Spearman is a moment correlation on ranks — report
    both and disagreement flags curve-shaped association).

    Scale shape: the corpus reduces to the value grid (|distinct qty| x
    |distinct discount| cells — bounded by the DOMAIN, not the row
    count); the grid self-join is cells-squared on a broadcast-sized
    table and every count is exact integer arithmetic."""
    l = table(spark, sf_dir, "lineitem")
    grid = (
        l.groupBy(F.col("l_quantity").alias("q"), F.col("l_discount").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .persist()
    )
    tot = grid.agg(F.sum("c").cast("bigint").alias("n"))
    a = grid.select(
        F.col("q").alias("qa"), F.col("d").alias("da"), F.col("c").alias("ca")
    )
    b = grid.select(
        F.col("q").alias("qb"), F.col("d").alias("db"), F.col("c").alias("cb")
    )
    conc_case = (
        ((F.col("qa") < F.col("qb")) & (F.col("da") < F.col("db")))
        | ((F.col("qa") > F.col("qb")) & (F.col("da") > F.col("db")))
    )
    disc_case = (
        ((F.col("qa") < F.col("qb")) & (F.col("da") > F.col("db")))
        | ((F.col("qa") > F.col("qb")) & (F.col("da") < F.col("db")))
    )
    cd = a.crossJoin(F.broadcast(b)).agg(
        (
            F.sum(F.when(conc_case, F.col("ca") * F.col("cb")).otherwise(0)) / 2
        )
        .cast("bigint")
        .alias("conc"),
        (
            F.sum(F.when(disc_case, F.col("ca") * F.col("cb")).otherwise(0)) / 2
        )
        .cast("bigint")
        .alias("disc"),
    )
    t_q = (
        grid.groupBy("q")
        .agg(F.sum("c").alias("cq"))
        .agg(
            F.sum(F.col("cq") * (F.col("cq") - 1) / 2).cast("bigint").alias("t_q")
        )
    )
    t_d = (
        grid.groupBy("d")
        .agg(F.sum("c").alias("cdd"))
        .agg(
            F.sum(F.col("cdd") * (F.col("cdd") - 1) / 2).cast("bigint").alias("t_d")
        )
    )
    half = F.col("n").cast("double") * (F.col("n") - 1) / 2
    return (
        cd.crossJoin(F.broadcast(t_q))
        .crossJoin(F.broadcast(t_d))
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "conc",
            "disc",
            "t_q",
            "t_d",
            F.round(
                (F.col("conc") - F.col("disc"))
                / F.sqrt((half - F.col("t_q")) * (half - F.col("t_d"))),
                8,
            ).alias("tau_b"),
        )
    )


# --------------------------------- Hurst exponent via rescaled range

HURST_WINDOWS = (12, 24, 48, 96)  # hours


def _hurst_w_sql(w: int) -> str:
    return f"""
    b{w} AS (
      SELECT CAST(floor(CAST(t AS DOUBLE) / {w}) AS BIGINT) AS blk, t, y
      FROM series
    ),
    bm{w} AS (
      SELECT blk, CAST(COUNT(*) AS BIGINT) AS nb,
        CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(y * y) AS BIGINT) AS qy
      FROM b{w} GROUP BY blk
    ),
    cd{w} AS (
      SELECT b.blk, b.t,
        SUM(b.y - m.sy / CAST({w} AS DOUBLE)) OVER (PARTITION BY b.blk
          ORDER BY b.t ROWS UNBOUNDED PRECEDING) AS cdev,
        m.sy, m.qy
      FROM b{w} b JOIN bm{w} m ON b.blk = m.blk AND m.nb = {w}
    ),
    rs{w} AS (
      SELECT blk,
        (MAX(cdev) - MIN(cdev))
          / sqrt((MAX(qy) - {w} * (MAX(sy) / CAST({w} AS DOUBLE))
            * (MAX(sy) / CAST({w} AS DOUBLE))) / {w}) AS rs
      FROM cd{w} GROUP BY blk
      HAVING (MAX(qy) - {w} * (MAX(sy) / CAST({w} AS DOUBLE))
            * (MAX(sy) / CAST({w} AS DOUBLE))) > 0
    ),
    p{w} AS (
      SELECT CAST({w} AS BIGINT) AS w, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        CAST(SUM(CAST(round(rs, 9) AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)
          AS mean_rs
      FROM rs{w}
    )"""


@query(
    "events_hurst_exponent",
    oracle=f"""
    WITH hours AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) / 3600 AS h,
        CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY h
    ),
    lo AS (SELECT MIN(h) AS h0 FROM hours),
    series AS (SELECT h - h0 AS t, y FROM hours CROSS JOIN lo),
    {",".join(_hurst_w_sql(w) for w in HURST_WINDOWS)},
    pts AS ({" UNION ALL ".join(f"SELECT * FROM p{w}" for w in HURST_WINDOWS)}),
    ll AS (SELECT ln(CAST(w AS DOUBLE)) AS x, ln(mean_rs) AS yy,
           w, n_blocks, mean_rs FROM pts WHERE mean_rs IS NOT NULL),
    fit AS (
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(round(x, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(round(yy, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(round(x * x, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(round(x * yy, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sxy
      FROM ll
    )
    SELECT ll.w, ll.n_blocks, round(ll.mean_rs, 8) AS mean_rs,
      CASE WHEN fit.n < 2 OR fit.sxx - fit.sx * fit.sx / fit.n = 0 THEN NULL
        ELSE round((fit.sxy - fit.sx * fit.sy / fit.n)
          / (fit.sxx - fit.sx * fit.sx / fit.n), 8) END AS hurst_h
    FROM ll CROSS JOIN fit
    """,
)
def events_hurst_exponent(spark, sf_dir):
    """Hurst exponent of the hourly event-arrival series by rescaled-range
    (R/S) analysis: for block sizes {HURST_WINDOWS}, each complete block
    contributes (max - min cumulative deviation) / population-sd, and H
    is the log-log OLS slope of mean R/S vs block size. H near 0.5 means
    memoryless traffic; H >> 0.5 means long-range dependence — bursts
    cluster across scales, so capacity planning from the Poisson-ish
    dispersion verdict (events_overdispersion_test) would understate
    queue tails. Output: one row per block size plus the shared H.

    Scale shape: the corpus reduces to the HOURS-sized series (one
    partial-aggregated rollup); every blockwise window and the final
    4-point regression run on that bounded series, with
    round-then-decimal-sum at the two cross-block reductions."""
    e = table(spark, sf_dir, "events")
    hours = e.groupBy(
        (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).cast("bigint") / 3600)
        .cast("bigint")
        .alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    lo = F.broadcast(hours.agg(F.min("h").alias("h0")))
    series = hours.crossJoin(lo).select(
        (F.col("h") - F.col("h0")).alias("t"), "y"
    ).persist()

    def rsum(col):
        return F.sum(F.round(col, 9).cast("decimal(28,12)")).cast("double")

    pts = None
    for w in HURST_WINDOWS:
        b = series.select(
            F.floor(F.col("t").cast("double") / w).cast("bigint").alias("blk"),
            "t",
            "y",
        )
        bm = b.groupBy("blk").agg(
            F.count(F.lit(1)).cast("bigint").alias("nb"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("qy"),
        )
        win = W.partitionBy("blk").orderBy("t").rowsBetween(W.unboundedPreceding, 0)
        cd = (
            b.join(bm.filter(F.col("nb") == w), "blk")
            .withColumn(
                "cdev",
                F.sum(F.col("y") - F.col("sy") / float(w)).over(win),
            )
        )
        m = F.max("sy") / float(w)
        var = (F.max("qy") - w * m * m) / w
        rs = (
            cd.groupBy("blk")
            .agg(
                ((F.max("cdev") - F.min("cdev")) / F.sqrt(var)).alias("rs"),
                var.alias("v"),
            )
            .filter(F.col("v") > 0)
        )
        p = rs.agg(
            F.lit(w).cast("bigint").alias("w"),
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            (rsum(F.col("rs")) / F.count(F.lit(1))).alias("mean_rs"),
        )
        pts = p if pts is None else pts.unionByName(p)
    ll = (
        pts.filter(F.col("mean_rs").isNotNull())
        .select(
            "w",
            "n_blocks",
            "mean_rs",
            F.log(F.col("w").cast("double")).alias("x"),
            F.log("mean_rs").alias("yy"),
        )
        .persist()
    )
    fit = F.broadcast(
        ll.agg(
            F.count(F.lit(1)).alias("n"),
            rsum(F.col("x")).alias("sx"),
            rsum(F.col("yy")).alias("sy"),
            rsum(F.col("x") * F.col("x")).alias("sxx"),
            rsum(F.col("x") * F.col("yy")).alias("sxy"),
        )
    )
    denom = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    return ll.crossJoin(fit).select(
        "w",
        "n_blocks",
        F.round("mean_rs", 8).alias("mean_rs"),
        F.when((F.col("n") < 2) | (denom == 0), F.lit(None))
        .otherwise(
            F.round(
                (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / denom, 8
            )
        )
        .alias("hurst_h"),
    )


# --------------------------------- integral distribution distances

WDIST_BINS = 256


@query(
    "events_wasserstein_click_view",
    oracle=f"""
    WITH vals AS (
      SELECT event_type, value FROM events
      WHERE event_type IN ('click', 'view')
    ),
    rng AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM vals),
    binned AS (
      SELECT LEAST({WDIST_BINS} - 1,
          CAST(floor({WDIST_BINS} * (value - lo) / (hi - lo)) AS INTEGER)) AS b,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
          AS ca,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
          AS cb
      FROM vals CROSS JOIN rng GROUP BY b
    ),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
        MAX(hi - lo) AS width
      FROM binned CROSS JOIN rng
    ),
    cum AS (
      SELECT b,
        SUM(ca) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cca,
        SUM(cb) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS ccb
      FROM binned
    ),
    terms AS (
      SELECT abs(cca / CAST(na AS DOUBLE) - ccb / CAST(nb AS DOUBLE))
          * (width / {WDIST_BINS}) AS w1_term,
        (cca / CAST(na AS DOUBLE) - ccb / CAST(nb AS DOUBLE))
          * (cca / CAST(na AS DOUBLE) - ccb / CAST(nb AS DOUBLE))
          * (width / {WDIST_BINS}) AS cvm_term
      FROM cum CROSS JOIN tot
    )
    SELECT
      (SELECT na FROM tot) AS n_click,
      (SELECT nb FROM tot) AS n_view,
      CAST({WDIST_BINS} AS BIGINT) AS n_bins,
      round(CAST(SUM(CAST(round(w1_term, 12) AS DECIMAL(28,15))) AS DOUBLE), 8)
        AS wasserstein_1,
      round(CAST(SUM(CAST(round(cvm_term, 12) AS DECIMAL(28,15))) AS DOUBLE), 8)
        AS cramer_von_mises
    FROM terms
    """,
)
def events_wasserstein_click_view(spark, sf_dir):
    """Integral distribution distances between the click and view value
    distributions on a {WDIST_BINS}-bin grid: 1-D Wasserstein-1 (area
    between the CDFs — HOW MUCH mass must move, in value units) and a
    Cramer-von-Mises-style integral of the squared CDF gap. The drift
    pair to the existing sup-norm KS statistic: KS sees the single worst
    point, W1 sees total displacement — a fat tail shift that KS
    underweights shows up here first. (The binned form is the one a
    production drift monitor ships: fixed memory, mergeable per bin.)

    Scale shape: min/max broadcast, one conditional-count rollup to
    {WDIST_BINS} bins (partial-aggregated), cumulative windows and the
    two weighted sums on the bin table only."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    rng = F.broadcast(
        e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    binned = (
        e.crossJoin(rng)
        .groupBy(
            F.least(
                F.lit(WDIST_BINS - 1),
                F.floor(
                    WDIST_BINS * (F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo"))
                ).cast("int"),
            ).alias("b")
        )
        .agg(
            F.sum((F.col("event_type") == "click").cast("int"))
            .cast("bigint")
            .alias("ca"),
            F.sum((F.col("event_type") == "view").cast("int"))
            .cast("bigint")
            .alias("cb"),
        )
        .persist()
    )
    tot = F.broadcast(
        binned.crossJoin(rng).agg(
            F.sum("ca").cast("bigint").alias("na"),
            F.sum("cb").cast("bigint").alias("nb"),
            F.max(F.col("hi") - F.col("lo")).alias("width"),
        )
    )
    w = W.orderBy("b").rowsBetween(W.unboundedPreceding, 0)
    cum = binned.select(
        "b",
        F.sum("ca").over(w).alias("cca"),
        F.sum("cb").over(w).alias("ccb"),
    )
    gap = F.col("cca") / F.col("na").cast("double") - F.col("ccb") / F.col(
        "nb"
    ).cast("double")
    binw = F.col("width") / WDIST_BINS
    terms = cum.crossJoin(tot).select(
        (F.abs(gap) * binw).alias("w1_term"),
        (gap * gap * binw).alias("cvm_term"),
        "na",
        "nb",
    )

    def rsum(col):
        return F.sum(F.round(col, 12).cast("decimal(28,15)")).cast("double")

    return terms.groupBy("na", "nb").agg(
        F.round(rsum(F.col("w1_term")), 8).alias("wasserstein_1"),
        F.round(rsum(F.col("cvm_term")), 8).alias("cramer_von_mises"),
    ).select(
        F.col("na").alias("n_click"),
        F.col("nb").alias("n_view"),
        F.lit(WDIST_BINS).cast("bigint").alias("n_bins"),
        "wasserstein_1",
        "cramer_von_mises",
    )


# --------------------------------- STL-lite decomposition strength

STL_HALF = 12  # centered 25-hour trend window


@query(
    "events_hourly_decomposition_strength",
    oracle=f"""
    WITH hours AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) / 3600 AS h,
        CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY h
    ),
    lo AS (SELECT MIN(h) AS h0 FROM hours),
    series AS (SELECT h - h0 AS t, y FROM hours CROSS JOIN lo),
    tr AS (
      SELECT t, y,
        CASE WHEN COUNT(*) OVER w = {2 * STL_HALF + 1}
          THEN SUM(y) OVER w / CAST({2 * STL_HALF + 1} AS DOUBLE) END AS trend
      FROM series
      WINDOW w AS (ORDER BY t ROWS BETWEEN {STL_HALF} PRECEDING
        AND {STL_HALF} FOLLOWING)
    ),
    det AS (
      SELECT t, y, trend, y - trend AS detr,
        CAST(t % 24 AS INTEGER) AS hod
      FROM tr WHERE trend IS NOT NULL
    ),
    seas AS (
      SELECT hod,
        CAST(SUM(CAST(round(detr, 9) AS DECIMAL(28,12))) AS DOUBLE)
          / COUNT(*) AS s
      FROM det GROUP BY hod
    ),
    comp AS (
      SELECT det.t, det.y, det.trend, det.detr, seas.s,
        det.detr - seas.s AS rem
      FROM det JOIN seas ON det.hod = seas.hod
    ),
    v AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(round(rem * rem, 9) AS DECIMAL(28,12))) AS DOUBLE)
          AS ss_rem,
        CAST(SUM(CAST(round(rem, 9) AS DECIMAL(28,12))) AS DOUBLE) AS s_rem,
        CAST(SUM(CAST(round(detr * detr, 9) AS DECIMAL(28,12))) AS DOUBLE)
          AS ss_detr,
        CAST(SUM(CAST(round(detr, 9) AS DECIMAL(28,12))) AS DOUBLE) AS s_detr,
        CAST(SUM(CAST(round((y - s) * (y - s), 9) AS DECIMAL(28,12))) AS DOUBLE)
          AS ss_desea,
        CAST(SUM(CAST(round(y - s, 9) AS DECIMAL(28,12))) AS DOUBLE) AS s_desea
      FROM comp
    )
    SELECT n,
      round(GREATEST(0.0, 1.0 - (ss_rem - s_rem * s_rem / n)
        / (ss_detr - s_detr * s_detr / n)), 8) AS seasonal_strength,
      round(GREATEST(0.0, 1.0 - (ss_rem - s_rem * s_rem / n)
        / (ss_desea - s_desea * s_desea / n)), 8) AS trend_strength
    FROM v
    """,
)
def events_hourly_decomposition_strength(spark, sf_dir):
    """STL-lite decomposition of the hourly arrival series — centered
    25-hour moving-average trend (complete windows only), hour-of-day
    seasonal means of the detrended series, remainder — summarized as
    Hyndman's strength statistics: seasonal_strength =
    max(0, 1 - Var(rem)/Var(detrended)) and trend_strength =
    max(0, 1 - Var(rem)/Var(deseasonalized)). The one-row verdict that
    says WHICH structure dominates the traffic before picking a
    forecast baseline (seasonal-naive vs drift) — the decomposition
    companion to the periodogram's period detector.

    Scale shape: the corpus reduces to the hours-sized series once; the
    rolling window, hour-of-day rollup and variance sums all run on
    that bounded series with round-then-decimal-sum reductions."""
    e = table(spark, sf_dir, "events")
    hours = e.groupBy(
        (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).cast("bigint") / 3600)
        .cast("bigint")
        .alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    lo = F.broadcast(hours.agg(F.min("h").alias("h0")))
    series = hours.crossJoin(lo).select((F.col("h") - F.col("h0")).alias("t"), "y")
    win = W.orderBy("t").rowsBetween(-STL_HALF, STL_HALF)
    tr = series.select(
        "t",
        "y",
        F.when(
            F.count(F.lit(1)).over(win) == 2 * STL_HALF + 1,
            F.sum("y").over(win) / float(2 * STL_HALF + 1),
        ).alias("trend"),
    )
    det = tr.filter(F.col("trend").isNotNull()).select(
        "t",
        "y",
        "trend",
        (F.col("y") - F.col("trend")).alias("detr"),
        (F.col("t") % 24).cast("int").alias("hod"),
    )

    def rsum(col):
        return F.sum(F.round(col, 9).cast("decimal(28,12)")).cast("double")

    seas = det.groupBy("hod").agg(
        (rsum(F.col("detr")) / F.count(F.lit(1))).alias("s")
    )
    comp = det.join(F.broadcast(seas), "hod").select(
        "y", "detr", "s", (F.col("detr") - F.col("s")).alias("rem")
    )
    v = comp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        rsum(F.col("rem") * F.col("rem")).alias("ss_rem"),
        rsum(F.col("rem")).alias("s_rem"),
        rsum(F.col("detr") * F.col("detr")).alias("ss_detr"),
        rsum(F.col("detr")).alias("s_detr"),
        rsum((F.col("y") - F.col("s")) * (F.col("y") - F.col("s"))).alias("ss_desea"),
        rsum(F.col("y") - F.col("s")).alias("s_desea"),
    )
    var_rem = F.col("ss_rem") - F.col("s_rem") * F.col("s_rem") / F.col("n")
    var_detr = F.col("ss_detr") - F.col("s_detr") * F.col("s_detr") / F.col("n")
    var_desea = F.col("ss_desea") - F.col("s_desea") * F.col("s_desea") / F.col("n")
    return v.select(
        "n",
        F.round(F.greatest(F.lit(0.0), 1.0 - var_rem / var_detr), 8).alias(
            "seasonal_strength"
        ),
        F.round(F.greatest(F.lit(0.0), 1.0 - var_rem / var_desea), 8).alias(
            "trend_strength"
        ),
    )


# --------------------------------- restricted mean survival time

RMST_TAU = 400  # days


def _rmst_oracle() -> str:
    from .registry import ORACLES

    return f"""
    WITH km AS ({ORACLES["customer_survival_km"]}),
    seg AS (
      SELECT t_days, survival,
        ROW_NUMBER() OVER (ORDER BY t_days) AS rn,
        LEAD(t_days) OVER (ORDER BY t_days) AS t_next
      FROM km WHERE t_days < {RMST_TAU}
    ),
    parts AS (
      SELECT CASE WHEN rn = 1 THEN CAST(t_days AS DOUBLE) ELSE 0.0 END
        + survival * (LEAST(COALESCE(t_next, {RMST_TAU}), {RMST_TAU}) - t_days)
        AS contrib
      FROM seg
    )
    SELECT CAST({RMST_TAU} AS BIGINT) AS tau_days,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM seg) AS n_event_times,
      round(CAST(SUM(CAST(round(contrib, 9) AS DECIMAL(28,12))) AS DOUBLE), 6)
        AS rmst_days
    FROM parts
    """


@query("customer_survival_rmst", oracle=_rmst_oracle())
def customer_survival_rmst(spark, sf_dir):
    """Restricted mean survival time at tau = {RMST_TAU} days: the area
    under the Kaplan-Meier curve up to tau — "expected active days per
    customer within the first {RMST_TAU}", the modern scalar summary
    recommended over median survival when curves cross or censoring is
    heavy. Built directly on customer_survival_km's step function:
    S = 1 carries the first segment, each event time carries its S until
    the next step, the last segment truncates at tau.

    Scale shape: everything after the KM rollup runs on the handful of
    distinct event times (lead + one decimal-rounded sum)."""
    from pyspark.sql import Window as PW

    km = customer_survival_km(spark, sf_dir).filter(F.col("t_days") < RMST_TAU)
    w = PW.orderBy("t_days")
    seg = km.select(
        "t_days",
        "survival",
        F.row_number().over(w).alias("rn"),
        F.lead("t_days").over(w).alias("t_next"),
    )
    contrib = F.when(F.col("rn") == 1, F.col("t_days").cast("double")).otherwise(
        0.0
    ) + F.col("survival") * (
        F.least(F.coalesce("t_next", F.lit(RMST_TAU)), F.lit(RMST_TAU))
        - F.col("t_days")
    )
    n_times = F.broadcast(
        seg.agg(F.count(F.lit(1)).cast("bigint").alias("n_event_times"))
    )
    return (
        seg.select(contrib.alias("contrib"))
        .agg(
            F.round(
                F.sum(F.round(F.col("contrib"), 9).cast("decimal(28,12)")).cast(
                    "double"
                ),
                6,
            ).alias("rmst_days")
        )
        .crossJoin(n_times)
        .select(
            F.lit(RMST_TAU).cast("bigint").alias("tau_days"),
            "n_event_times",
            "rmst_days",
        )
    )


# --------------------------------- intraclass correlation + design effect


@query(
    "customer_acctbal_icc_deff",
    oracle="""
    WITH bynat AS (
      SELECT c_nationkey,
        CAST(COUNT(*) AS BIGINT) AS n_i,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS s_i,
        CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS q_i
      FROM customer GROUP BY c_nationkey
    ),
    gall AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS g,
        CAST(SUM(n_i) AS BIGINT) AS n,
        CAST(SUM(CAST(round(s_i, 9) AS DECIMAL(28,12))) AS DOUBLE) AS s,
        CAST(SUM(CAST(round(q_i - s_i * (s_i / n_i), 9) AS DECIMAL(28,12)))
          AS DOUBLE) AS ssw,
        CAST(SUM(CAST(round(s_i * (s_i / n_i), 9) AS DECIMAL(28,12)))
          AS DOUBLE) AS sb_raw,
        CAST(SUM(n_i * n_i) AS BIGINT) AS sn2
      FROM bynat
    ),
    ms AS (
      SELECT g, n,
        ssw / (n - g) AS msw,
        (sb_raw - s * (s / n)) / (g - 1) AS msb,
        (n - sn2 / CAST(n AS DOUBLE)) / (g - 1) AS n0
      FROM gall
    )
    SELECT g, n, round(n0, 4) AS n0,
      round((msb - msw) / (msb + (n0 - 1) * msw), 8) AS icc,
      round(1 + (CAST(n AS DOUBLE) / g - 1)
        * ((msb - msw) / (msb + (n0 - 1) * msw)), 6) AS deff
    FROM ms
    """,
)
def customer_acctbal_icc_deff(spark, sf_dir):
    """Intraclass correlation of account balance within nations (one-way
    random-effects ANOVA estimator) and the survey design effect
    DEFF = 1 + (m-1)*ICC: how much clustering inflates the variance of a
    mean estimated from nation-clustered data — the quantitative
    justification for the grouped jackknife (jackknife_mean_acctbal) and
    the raking weights over per-row bootstrap methods. DEFF near 1 =
    clusters don't matter; DEFF >> 1 = effective sample size is
    n / DEFF, plan accordingly.

    Scale shape: one per-group rollup of exact decimal sufficient
    statistics, then closed-form scalar ANOVA algebra on the G-row
    table with round-then-decimal-sum cross-group reductions."""
    c = table(spark, sf_dir, "customer")
    bynat = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("s_i"),
        F.sum((F.col("c_acctbal") * F.col("c_acctbal")).cast(DEC))
        .cast("double")
        .alias("q_i"),
    )

    def rsum(col):
        return F.sum(F.round(col, 9).cast("decimal(28,12)")).cast("double")

    gall = bynat.agg(
        F.count(F.lit(1)).cast("bigint").alias("g"),
        F.sum("n_i").cast("bigint").alias("n"),
        rsum(F.col("s_i")).alias("s"),
        rsum(F.col("q_i") - F.col("s_i") * (F.col("s_i") / F.col("n_i"))).alias(
            "ssw"
        ),
        rsum(F.col("s_i") * (F.col("s_i") / F.col("n_i"))).alias("sb_raw"),
        F.sum(F.col("n_i") * F.col("n_i")).cast("bigint").alias("sn2"),
    )
    msw = F.col("ssw") / (F.col("n") - F.col("g"))
    msb = (F.col("sb_raw") - F.col("s") * (F.col("s") / F.col("n"))) / (
        F.col("g") - 1
    )
    n0 = (F.col("n") - F.col("sn2") / F.col("n").cast("double")) / (F.col("g") - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    return gall.select(
        "g",
        "n",
        F.round(n0, 4).alias("n0"),
        F.round(icc, 8).alias("icc"),
        F.round(1 + (F.col("n").cast("double") / F.col("g") - 1) * icc, 6).alias(
            "deff"
        ),
    )


@query(
    "ab_ucb_bandit_scores",
    oracle="""
    WITH arms AS (
      SELECT event_type AS arm,
        CAST(count(*) AS BIGINT) AS pulls,
        CAST(sum(CASE WHEN "value" > 100 THEN 1 ELSE 0 END) AS BIGINT)
          AS successes
      FROM events GROUP BY 1
    ),
    tot AS (SELECT sum(pulls) AS n_total FROM arms),
    scored AS (
      SELECT arm, pulls, successes,
        round(CAST(successes AS DOUBLE) / pulls, 8) AS mean_reward,
        round(CAST(successes AS DOUBLE) / pulls
          + sqrt(2 * round(ln(CAST(n_total AS DOUBLE)), 8) / pulls), 6)
          AS ucb_score
      FROM arms CROSS JOIN tot
    )
    SELECT arm, pulls, successes, mean_reward, ucb_score,
      CASE WHEN ucb_score = (SELECT max(ucb_score) FROM scored)
           THEN 1 ELSE 0 END AS is_next_arm
    FROM scored
    """,
)
def ab_ucb_bandit_scores(spark, sf_dir):
    """UCB1 multi-armed-bandit arm ranking: arms = event types, reward =
    value > 100, score = mean_reward + sqrt(2 ln N / n_arm) (Auer et al.
    2002). `is_next_arm` marks the arm a UCB policy pulls next — the
    exploration bonus shrinks as an arm accumulates pulls, so the flagged
    arm is not necessarily the best-mean arm.

    Offline-evaluation shape: one partial-aggregated count per arm, a
    1-row total broadcast back, scoring as a projection, and the argmax
    via a broadcast of the 5-row scored table's max — nothing scales with
    the event count except the first aggregate. ln(N) is rounded to 8 dp
    before the sqrt (cross-engine transcendental contract); sqrt and
    division are IEEE-exact."""
    e = table(spark, sf_dir, "events")
    arms = e.groupBy(F.col("event_type").alias("arm")).agg(
        F.count(F.lit(1)).cast("bigint").alias("pulls"),
        F.sum(F.when(F.col("value") > 100, 1).otherwise(0))
        .cast("bigint")
        .alias("successes"),
    )
    tot = F.broadcast(arms.agg(F.sum("pulls").alias("n_total")))
    scored = (
        arms.crossJoin(tot)
        .withColumn(
            "mean_reward",
            F.round(F.col("successes").cast("double") / F.col("pulls"), 8),
        )
        .withColumn(
            "ucb_score",
            F.round(
                F.col("successes").cast("double") / F.col("pulls")
                + F.sqrt(
                    2
                    * F.round(F.log(F.col("n_total").cast("double")), 8)
                    / F.col("pulls")
                ),
                6,
            ),
        )
        .drop("n_total")
    )
    best = F.broadcast(scored.agg(F.max("ucb_score").alias("_best")))
    return scored.crossJoin(best).select(
        "arm",
        "pulls",
        "successes",
        "mean_reward",
        "ucb_score",
        F.when(F.col("ucb_score") == F.col("_best"), 1).otherwise(0).alias("is_next_arm"),
    )


@query(
    "events_sax_daily_motifs",
    oracle="""
    WITH paa AS (
      SELECT CAST(ts AS DATE) AS day,
        CAST(sum(CASE WHEN extract(hour FROM ts) < 6 THEN 1 ELSE 0 END) AS DOUBLE) AS c0,
        CAST(sum(CASE WHEN extract(hour FROM ts) BETWEEN 6 AND 11 THEN 1 ELSE 0 END) AS DOUBLE) AS c1,
        CAST(sum(CASE WHEN extract(hour FROM ts) BETWEEN 12 AND 17 THEN 1 ELSE 0 END) AS DOUBLE) AS c2,
        CAST(sum(CASE WHEN extract(hour FROM ts) >= 18 THEN 1 ELSE 0 END) AS DOUBLE) AS c3
      FROM events GROUP BY 1
    ),
    norm AS (
      SELECT day, c0, c1, c2, c3,
        (c0 + c1 + c2 + c3) / 4.0 AS mu,
        sqrt((
          (c0 - (c0+c1+c2+c3)/4.0) * (c0 - (c0+c1+c2+c3)/4.0) +
          (c1 - (c0+c1+c2+c3)/4.0) * (c1 - (c0+c1+c2+c3)/4.0) +
          (c2 - (c0+c1+c2+c3)/4.0) * (c2 - (c0+c1+c2+c3)/4.0) +
          (c3 - (c0+c1+c2+c3)/4.0) * (c3 - (c0+c1+c2+c3)/4.0)) / 4.0) AS sd
      FROM paa
    ),
    words AS (
      SELECT day,
        concat(
          CASE WHEN sd = 0 THEN 'b'
               WHEN round((c0 - mu) / sd, 8) < -0.6745 THEN 'a'
               WHEN round((c0 - mu) / sd, 8) < 0 THEN 'b'
               WHEN round((c0 - mu) / sd, 8) < 0.6745 THEN 'c' ELSE 'd' END,
          CASE WHEN sd = 0 THEN 'b'
               WHEN round((c1 - mu) / sd, 8) < -0.6745 THEN 'a'
               WHEN round((c1 - mu) / sd, 8) < 0 THEN 'b'
               WHEN round((c1 - mu) / sd, 8) < 0.6745 THEN 'c' ELSE 'd' END,
          CASE WHEN sd = 0 THEN 'b'
               WHEN round((c2 - mu) / sd, 8) < -0.6745 THEN 'a'
               WHEN round((c2 - mu) / sd, 8) < 0 THEN 'b'
               WHEN round((c2 - mu) / sd, 8) < 0.6745 THEN 'c' ELSE 'd' END,
          CASE WHEN sd = 0 THEN 'b'
               WHEN round((c3 - mu) / sd, 8) < -0.6745 THEN 'a'
               WHEN round((c3 - mu) / sd, 8) < 0 THEN 'b'
               WHEN round((c3 - mu) / sd, 8) < 0.6745 THEN 'c' ELSE 'd' END
        ) AS sax_word
      FROM norm
    )
    SELECT sax_word,
      CAST(count(*) AS BIGINT) AS n_days,
      CAST(min(day) AS VARCHAR) AS first_day
    FROM words GROUP BY 1
    """,
)
def events_sax_daily_motifs(spark, sf_dir):
    """SAX motif discovery over daily activity shapes (Lin et al. 2003):
    each day's hourly arrivals are PAA-reduced to 4 six-hour segments,
    z-normalized WITHIN the day, binned at the alphabet-4 Gaussian
    breakpoints (-0.6745, 0, 0.6745) into a 4-letter word, and identical
    words across days are counted — recurring words are motifs (e.g. the
    standard workday shape), rare words are discord days.

    Determinism: segment counts are integers, the day mean (/4) and the
    deviations are exact in double, sqrt/divide are IEEE-identical, and z
    is rounded to 8 dp before breakpoint comparison so a boundary day
    symbolizes the same way in both engines. Flat days (sd = 0) map to
    'bbbb' by definition.

    Scale shape: one shuffle to (day) — 4 conditional partial aggregates —
    then a shuffle on the tiny word key; nothing is per-event after the
    first aggregate. 100 TB of events is ~10^4 day-rows after stage one."""
    e = table(spark, sf_dir, "events")
    hour = F.hour("ts")
    segs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("double").alias(f"c{i}")
        for i, cond in enumerate(
            [hour < 6, (hour >= 6) & (hour < 12), (hour >= 12) & (hour < 18), hour >= 18]
        )
    ]
    paa = e.groupBy(F.to_date("ts").alias("day")).agg(*segs)
    cs = [F.col(f"c{i}") for i in range(4)]
    mu = (cs[0] + cs[1] + cs[2] + cs[3]) / 4.0
    sd = F.sqrt(
        sum((c - mu) * (c - mu) for c in cs) / 4.0
    )
    norm = paa.withColumn("mu", mu).withColumn("sd", sd)

    def sym(c):
        z = F.round((c - F.col("mu")) / F.col("sd"), 8)
        return (
            F.when(F.col("sd") == 0, "b")
            .when(z < -0.6745, "a")
            .when(z < 0, "b")
            .when(z < 0.6745, "c")
            .otherwise("d")
        )

    words = norm.select(
        "day", F.concat(*[sym(c) for c in cs]).alias("sax_word")
    )
    return words.groupBy("sax_word").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.min("day").cast("string").alias("first_day"),
    )


@query(
    "discount_ipw_ate",
    oracle="""
    WITH bd AS (
      SELECT p_brand,
        CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / count(*)
          AS avg_disc
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY 1
    ),
    g AS (
      SELECT CAST(sum(CAST(avg_disc AS DECIMAL(28,8))) AS DOUBLE) / count(*)
        AS gmean FROM bd
    ),
    rows_ AS (
      SELECT
        CASE WHEN bd.avg_disc > (SELECT gmean FROM g) THEN 1 ELSE 0 END AS t,
        CAST(l.l_quantity AS DOUBLE) AS y,
        least(0.95, greatest(0.05,
          round(1.0 / (1.0 + exp(-(-0.4 + 1.6 * (p.p_size / 50.0)))), 6)
        )) AS ps
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN bd ON bd.p_brand = p.p_brand
    ),
    acc AS (
      SELECT
        CAST(sum(CASE WHEN t = 1 THEN CAST(round(y / ps, 8) AS DECIMAL(38,10)) END) AS DOUBLE) AS ty,
        CAST(sum(CASE WHEN t = 1 THEN CAST(round(1.0 / ps, 8) AS DECIMAL(38,10)) END) AS DOUBLE) AS tw,
        CAST(sum(CASE WHEN t = 0 THEN CAST(round(y / (1 - ps), 8) AS DECIMAL(38,10)) END) AS DOUBLE) AS cy,
        CAST(sum(CASE WHEN t = 0 THEN CAST(round(1.0 / (1 - ps), 8) AS DECIMAL(38,10)) END) AS DOUBLE) AS cw,
        CAST(sum(t) AS BIGINT) AS n_treated,
        CAST(sum(1 - t) AS BIGINT) AS n_control
      FROM rows_
    )
    SELECT n_treated, n_control,
      round(ty / tw, 6) AS treated_mean_ipw,
      round(cy / cw, 6) AS control_mean_ipw,
      round(ty / tw - cy / cw, 6) AS ate_ipw
    FROM acc
    """,
)
def discount_ipw_ate(spark, sf_dir):
    """Inverse-propensity-weighted (Hajek) average treatment effect of the
    high-discount-brand treatment on quantity, completing the causal
    triptych: DiD (discount_did_quantity) adjusts time-stable confounding,
    stratified standardization (discount_effect_stratified) adjusts a
    binned covariate, IPW adjusts a CONTINUOUS propensity — here a
    frozen-weight logistic of part size (the same frozen-model convention
    as quality_model_filter; swapping in trained weights changes only the
    scoring expression). Propensities are clipped to [0.05, 0.95]
    (standard overlap trimming) and each row's y/ps contribution is
    rounded to 8 dp then decimal-summed, so the estimate is
    order/partition independent.

    Plan shape: two broadcast joins (brand table, global mean) onto one
    fact pass, then a single 1-row aggregate — no shuffle keyed on
    anything bigger than p_brand. Both fact passes (brand propensity
    aggregate, IPW accumulator) fan out of the one-task scan so the
    decimal accumulation parallelizes."""
    l = fanout(
        table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_discount", "l_quantity"
        ),
        "l_partkey",
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    lp = l.join(p, F.col("l_partkey") == F.col("p_partkey"))
    bd = lp.groupBy("p_brand").agg(
        (
            F.sum(F.col("l_discount").cast(DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_disc")
    )
    gd = F.broadcast(
        bd.agg(
            (
                F.sum(F.col("avg_disc").cast("decimal(28,8)")).cast("double")
                / F.count(F.lit(1))
            ).alias("gmean")
        )
    )
    ps = F.least(
        F.lit(0.95),
        F.greatest(
            F.lit(0.05),
            F.round(
                1.0 / (1.0 + F.exp(-(-0.4 + 1.6 * (F.col("p_size") / 50.0)))), 6
            ),
        ),
    )
    rows_ = (
        lp.join(F.broadcast(bd), "p_brand")
        .crossJoin(gd)
        .select(
            (F.col("avg_disc") > F.col("gmean")).cast("int").alias("t"),
            F.col("l_quantity").cast("double").alias("y"),
            ps.alias("ps"),
        )
    )
    d38 = "decimal(38,10)"
    acc = rows_.agg(
        F.sum(F.when(F.col("t") == 1, F.round(F.col("y") / F.col("ps"), 8).cast(d38)))
        .cast("double")
        .alias("ty"),
        F.sum(F.when(F.col("t") == 1, F.round(1.0 / F.col("ps"), 8).cast(d38)))
        .cast("double")
        .alias("tw"),
        F.sum(F.when(F.col("t") == 0, F.round(F.col("y") / (1 - F.col("ps")), 8).cast(d38)))
        .cast("double")
        .alias("cy"),
        F.sum(F.when(F.col("t") == 0, F.round(1.0 / (1 - F.col("ps")), 8).cast(d38)))
        .cast("double")
        .alias("cw"),
        F.sum("t").cast("bigint").alias("n_treated"),
        F.sum(1 - F.col("t")).cast("bigint").alias("n_control"),
    )
    return acc.select(
        "n_treated",
        "n_control",
        F.round(F.col("ty") / F.col("tw"), 6).alias("treated_mean_ipw"),
        F.round(F.col("cy") / F.col("cw"), 6).alias("control_mean_ipw"),
        F.round(F.col("ty") / F.col("tw") - F.col("cy") / F.col("cw"), 6).alias(
            "ate_ipw"
        ),
    )


@query(
    "discount_psm_caliper_att",
    oracle="""
    WITH bd AS (
      SELECT p_brand,
        CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / count(*)
          AS avg_disc
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY 1
    ),
    g AS (
      SELECT CAST(sum(CAST(avg_disc AS DECIMAL(28,8))) AS DOUBLE) / count(*)
        AS gmean FROM bd
    ),
    rows_ AS (
      SELECT
        CASE WHEN bd.avg_disc > (SELECT gmean FROM g) THEN 1 ELSE 0 END AS t,
        CAST(l.l_quantity AS DOUBLE) AS y,
        round(1.0 / (1.0 + exp(-(-0.4 + 1.6 * (p.p_size / 50.0)))), 6) AS ps
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN bd ON bd.p_brand = p.p_brand
    ),
    cells AS (
      SELECT t, ps, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(round(y, 6) AS DECIMAL(28,8))) AS DOUBLE) AS sy
      FROM rows_ GROUP BY 1, 2
    ),
    matched AS (
      SELECT tr.ps, tr.n AS n_t, tr.sy AS sy_t,
        sum(co.n) AS n_c, CAST(sum(CAST(co.sy AS DECIMAL(28,8))) AS DOUBLE) AS sy_c
      FROM (SELECT * FROM cells WHERE t = 1) tr
      JOIN (SELECT * FROM cells WHERE t = 0) co
        ON abs(tr.ps - co.ps) <= 0.05
      GROUP BY 1, 2, 3
    ),
    att AS (
      SELECT
        CAST(sum(n_t) AS BIGINT) AS n_treated_matched,
        round(CAST(sum(CAST(round(sy_t - n_t * (sy_c / n_c), 6)
                      AS DECIMAL(28,8))) AS DOUBLE)
              / sum(n_t), 6) AS att_caliper
      FROM matched
    )
    SELECT
      (SELECT CAST(sum(n) AS BIGINT) FROM cells WHERE t = 1)
        AS n_treated_total,
      n_treated_matched, att_caliper
    FROM att
    """,
)
def discount_psm_caliper_att(spark, sf_dir):
    """Propensity-score radius (caliper) matching, ATT estimand: every
    treated row is compared with the weighted mean outcome of ALL control
    rows whose propensity lies within +/-0.05 — radius matching
    (Dehejia & Wahba 2002), which unlike greedy 1:1 nearest-neighbor
    matching is order-independent and therefore reproducible across
    engines and partitionings. Treated rows with no control inside the
    caliper drop out (n_treated_matched vs n_treated_total reports the
    common-support loss). Completes the causal family: DiD, direct
    standardization, IPW, and now matching.

    Scale insight: the propensity is a function of p_size, so it takes
    <= 50 distinct values — aggregate outcomes per (arm, ps) FIRST
    (one small shuffle), then the caliper join runs on the tiny ps-level
    tables, never row x row. Per-cell sums are decimal-exact; the
    caliper comparison uses 6-dp-rounded propensities so the boundary
    is engine-stable."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    lp = l.join(p, F.col("l_partkey") == F.col("p_partkey"))
    bd = lp.groupBy("p_brand").agg(
        (
            F.sum(F.col("l_discount").cast(DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_disc")
    )
    gd = F.broadcast(
        bd.agg(
            (
                F.sum(F.col("avg_disc").cast("decimal(28,8)")).cast("double")
                / F.count(F.lit(1))
            ).alias("gmean")
        )
    )
    ps = F.round(1.0 / (1.0 + F.exp(-(-0.4 + 1.6 * (F.col("p_size") / 50.0)))), 6)
    rows_ = (
        lp.join(F.broadcast(bd), "p_brand")
        .crossJoin(gd)
        .select(
            (F.col("avg_disc") > F.col("gmean")).cast("int").alias("t"),
            F.col("l_quantity").cast("double").alias("y"),
            ps.alias("ps"),
        )
    )
    cells = rows_.groupBy("t", "ps").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round(F.col("y"), 6).cast("decimal(28,8)")).cast("double").alias("sy"),
    )
    tr = cells.filter(F.col("t") == 1).select(
        F.col("ps").alias("ps_t"), F.col("n").alias("n_t"), F.col("sy").alias("sy_t")
    )
    co = cells.filter(F.col("t") == 0).select(
        F.col("ps").alias("ps_c"), F.col("n").alias("n_c0"), F.col("sy").alias("sy_c0")
    )
    matched = (
        tr.join(F.broadcast(co), F.abs(F.col("ps_t") - F.col("ps_c")) <= 0.05)
        .groupBy("ps_t", "n_t", "sy_t")
        .agg(
            F.sum("n_c0").alias("n_c"),
            F.sum(F.col("sy_c0").cast("decimal(28,8)")).cast("double").alias("sy_c"),
        )
    )
    att = matched.agg(
        F.sum("n_t").cast("bigint").alias("n_treated_matched"),
        F.round(
            F.sum(
                F.round(
                    F.col("sy_t") - F.col("n_t") * (F.col("sy_c") / F.col("n_c")), 6
                ).cast("decimal(28,8)")
            ).cast("double")
            / F.sum("n_t"),
            6,
        ).alias("att_caliper"),
    )
    n_tot = F.broadcast(
        cells.filter(F.col("t") == 1).agg(
            F.sum("n").cast("bigint").alias("n_treated_total")
        )
    )
    return att.crossJoin(n_tot).select(
        "n_treated_total", "n_treated_matched", "att_caliper"
    )


_CMS_D = 4
_CMS_W = 256


@query(
    "cms_heavy_hitters",
    oracle=f"""
    WITH probes AS (
      SELECT user_id, r,
        CAST(('0x' || substr(md5('cms' || r || ':' || CAST(user_id AS VARCHAR)),
                             1, 8)) AS BIGINT) % {_CMS_W} AS col
      FROM events CROSS JOIN (SELECT unnest(range(1, {_CMS_D} + 1)) AS r)
    ),
    cells AS (
      SELECT r, col, CAST(count(*) AS BIGINT) AS c
      FROM probes GROUP BY 1, 2
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    uprobe AS (
      SELECT user_id, r,
        CAST(('0x' || substr(md5('cms' || r || ':' || CAST(user_id AS VARCHAR)),
                             1, 8)) AS BIGINT) % {_CMS_W} AS col
      FROM users CROSS JOIN (SELECT unnest(range(1, {_CMS_D} + 1)) AS r)
    ),
    est AS (
      SELECT u.user_id, min(c.c) AS est_count
      FROM uprobe u JOIN cells c ON c.r = u.r AND c.col = u.col
      GROUP BY 1
    ),
    truec AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS true_count
      FROM events GROUP BY 1
    )
    SELECT est.user_id, est.est_count, truec.true_count,
      est.est_count - truec.true_count AS overestimate
    FROM est JOIN truec ON est.user_id = truec.user_id
    ORDER BY est.est_count DESC, est.user_id
    LIMIT 20
    """,
)
def cms_heavy_hitters(spark, sf_dir):
    """Count-min sketch heavy hitters: a 4x256 counter grid
    (seeded md5 hashing, so both engines build the IDENTICAL sketch), each
    key's estimate = min over its 4 cells — one-sided error
    (never underestimates; `overestimate` >= 0 always, bounded by e*N/w in
    expectation). The top-20 by estimate are the sketch's heavy-hitter
    report; true counts ride along as the evaluation column.

    This is the mergeable-sketch path for 100 TB frequency queries: the
    grid is 1024 counters regardless of key cardinality,
    partial-aggregates map-side, and merges by cell-wise addition across
    shards/streams — where an exact per-key count would shuffle the full
    keyspace (the exact column here is the EVAL harness, dropped in
    production exactly like ann_ivf_recall_at_k's brute-force side).

    Plan: one shuffle on 1024 cells, one on distinct users
    (eval only), a broadcast join of the 1k-cell grid onto user probes.

    Round-11: the events scan fans out of the one-task single-row-group
    layout — the 4-hash probe of every event ran single-core."""
    e = fanout(table(spark, sf_dir, "events").select("user_id"), "user_id")

    def probe(df):
        return df.select(
            "user_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            (
                                F.conv(
                                    F.substring(
                                        F.md5(
                                            F.concat(
                                                F.lit(f"cms{r}:"),
                                                F.col("user_id").cast("string"),
                                            )
                                        ),
                                        1,
                                        8,
                                    ),
                                    16,
                                    10,
                                ).cast("long")
                                % _CMS_W
                            ).alias("col"),
                        )
                        for r in range(1, _CMS_D + 1)
                    ]
                )
            ).alias("p"),
        ).select("user_id", "p.r", "p.col")

    cells = (
        probe(e)
        .groupBy("r", "col")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    users = e.distinct()
    est = (
        probe(users)
        .join(F.broadcast(cells), ["r", "col"])
        .groupBy("user_id")
        .agg(F.min("c").alias("est_count"))
    )
    truec = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    return (
        est.join(truec, "user_id")
        .select(
            "user_id",
            "est_count",
            "true_count",
            (F.col("est_count") - F.col("true_count")).alias("overestimate"),
        )
        .orderBy(F.col("est_count").desc(), "user_id")
        .limit(20)
    )


_TE_FOLDS = 5
_TE_SMOOTH = 20.0


@query(
    "target_encode_brand_oof",
    oracle=f"""
    WITH rows_ AS (
      SELECT p.p_brand,
        CAST(('0x' || substr(md5('te:' || CAST(l.l_orderkey AS VARCHAR) || ':'
              || CAST(l.l_linenumber AS VARCHAR) || ':'
              || CAST(l.l_partkey AS VARCHAR)), 1, 8)) AS BIGINT)
          % {_TE_FOLDS} AS fold,
        CAST(l.l_quantity AS DECIMAL(28,6)) AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    cells AS (
      SELECT p_brand, fold, CAST(count(*) AS BIGINT) AS n,
        sum(y) AS sy
      FROM rows_ GROUP BY 1, 2
    ),
    brands AS (
      SELECT p_brand, sum(n) AS n_b, sum(sy) AS sy_b FROM cells GROUP BY 1
    ),
    prior AS (
      SELECT CAST(sum(sy) AS DOUBLE) / sum(n) AS mu FROM cells
    )
    SELECT c.p_brand, c.fold, c.n AS n_rows,
      round((CAST(b.sy_b - c.sy AS DOUBLE) + {_TE_SMOOTH} * p.mu)
            / (b.n_b - c.n + {_TE_SMOOTH}), 6) AS oof_encoding
    FROM cells c
    JOIN brands b ON b.p_brand = c.p_brand
    CROSS JOIN prior p
    """,
)
def target_encode_brand_oof(spark, sf_dir):
    """Out-of-fold target encoding of p_brand against quantity: each
    (brand, fold) cell is encoded with the mean computed from the OTHER
    folds only — the standard leakage guard (a row never contributes to
    its own encoding) — shrunk toward the global prior with strength 20
    (CatBoost/vw-style smoothing; also keeps the denominator positive when
    a brand lives entirely in one fold). Folds are a salted md5 of the
    line identity, so the assignment is reproducible across engines, runs
    and partitionings.

    Scale shape: ONE fact shuffle on the (brand, fold) key; brand totals
    and the prior re-aggregate the tiny cell table; the encode step is a
    broadcast join over ~|brands| x folds rows. Applying the encoding to
    training rows is then a map-side broadcast-hash lookup. The per-row
    md5 fold assignment + broadcast join fan out of the one-task scan."""
    l = fanout(
        table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
        ),
        "l_orderkey",
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    fold = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit("te"),
                        F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"),
                        F.col("l_partkey").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _TE_FOLDS
    )
    rows_ = l.join(p, F.col("l_partkey") == F.col("p_partkey")).select(
        "p_brand",
        fold.alias("fold"),
        F.col("l_quantity").cast("decimal(28,6)").alias("y"),
    )
    cells = rows_.groupBy("p_brand", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").alias("sy"),
    )
    brands = cells.groupBy("p_brand").agg(
        F.sum("n").alias("n_b"), F.sum("sy").alias("sy_b")
    )
    prior = F.broadcast(
        cells.agg(
            (F.sum("sy").cast("double") / F.sum("n")).alias("mu")
        )
    )
    return (
        cells.join(F.broadcast(brands), "p_brand")
        .crossJoin(prior)
        .select(
            "p_brand",
            "fold",
            F.col("n").alias("n_rows"),
            F.round(
                ((F.col("sy_b") - F.col("sy")).cast("double") + _TE_SMOOTH * F.col("mu"))
                / (F.col("n_b") - F.col("n") + _TE_SMOOTH),
                6,
            ).alias("oof_encoding"),
        )
    )


# ------------------------------------------ Holt linear-trend (exact fold)

HOLT_ALPHA = 0.5  # level smoothing (binary-exact constant)
HOLT_BETA = 0.25  # trend smoothing (binary-exact constant)


@query(
    "orders_monthly_holt_trend",
    oracle=f"""
    WITH RECURSIVE bins AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
        round(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 6) AS y
      FROM orders GROUP BY 1
    ),
    months AS (
      SELECT ROW_NUMBER() OVER (ORDER BY mon) AS t, y FROM bins
    ),
    nn AS (SELECT MAX(t) AS n FROM months),
    rec(t, l, b, sae) AS (
      SELECT CAST(1 AS BIGINT),
        CAST((SELECT y FROM months WHERE t = 1) AS DOUBLE),
        CAST(round((SELECT y FROM months WHERE t = 2)
              - (SELECT y FROM months WHERE t = 1), 8) AS DOUBLE),
        CAST(0.0 AS DOUBLE)
      UNION ALL
      SELECT m.t,
        round({HOLT_ALPHA} * m.y + {1 - HOLT_ALPHA} * (rec.l + rec.b), 8),
        round({HOLT_BETA} * (round({HOLT_ALPHA} * m.y
              + {1 - HOLT_ALPHA} * (rec.l + rec.b), 8) - rec.l)
              + {1 - HOLT_BETA} * rec.b, 8),
        rec.sae + round(abs(m.y - (rec.l + rec.b)), 8)
      FROM rec JOIN months m ON m.t = rec.t + 1
    )
    SELECT CAST(nn.n AS BIGINT) AS n_months,
      rec.l AS level, rec.b AS trend,
      round(rec.sae / (nn.n - 1), 8) AS mae_one_step,
      round(rec.l + 1 * rec.b, 6) AS forecast_1,
      round(rec.l + 2 * rec.b, 6) AS forecast_2,
      round(rec.l + 3 * rec.b, 6) AS forecast_3
    FROM rec CROSS JOIN nn WHERE rec.t = nn.n
    """,
)
def orders_monthly_holt_trend(spark, sf_dir):
    """Holt linear-trend smoothing (double exponential smoothing) of the
    monthly revenue series, with 1-3 month forecasts and the in-sample
    one-step MAE. Unlike the truncated-lag EWMA, Holt's recurrence has
    UNBOUNDED memory — so it's computed as an EXACT SEQUENTIAL FOLD, made
    declarative with `F.aggregate` over the months array: the corpus
    collapses to a ~bounded rollup (one row per month) first, then the
    recursion runs in-row over that model-sized series. The DuckDB twin is
    a recursive CTE walking the same rollup.

    Determinism: y values are decimal-summed then rounded to 6 decimals;
    level/trend are re-rounded to 8 decimals at every step; alpha=1/2 and
    beta=1/4 are binary-exact — both engines iterate identical doubles, so
    the fitted state and forecasts hash-match exactly. Scale shape: one
    partial-agg month rollup (the only shuffle), one 1-row collect_list of
    ~bounded months; the fold is O(months), driver-free, and the 100 TB of
    order rows never leave the scan-aggregate stage."""
    o = table(spark, sf_dir, "orders")
    bins = o.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(dsum("o_totalprice").cast("double"), 6).alias("y")
    )
    series = bins.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("mon", "y"))),
            lambda r: r["y"],
        ).alias("ys")
    )
    n = F.size("ys")
    y1 = F.element_at("ys", 1)
    y2 = F.element_at("ys", 2)
    init = F.struct(
        y1.alias("l"),
        F.round(y2 - y1, 8).alias("b"),
        F.lit(0.0).alias("sae"),
    )

    def step(acc, y):
        pred = acc["l"] + acc["b"]
        l_new = F.round(
            F.lit(HOLT_ALPHA) * y + F.lit(1 - HOLT_ALPHA) * pred, 8
        )
        b_new = F.round(
            F.lit(HOLT_BETA) * (l_new - acc["l"])
            + F.lit(1 - HOLT_BETA) * acc["b"],
            8,
        )
        return F.struct(
            l_new.alias("l"),
            b_new.alias("b"),
            (acc["sae"] + F.round(F.abs(y - pred), 8)).alias("sae"),
        )

    fitted = series.select(
        n.cast("bigint").alias("n_months"),
        F.aggregate(F.slice("ys", 2, n - 1), init, step).alias("st"),
    )
    return fitted.select(
        "n_months",
        F.col("st.l").alias("level"),
        F.col("st.b").alias("trend"),
        F.round(F.col("st.sae") / (F.col("n_months") - 1), 8).alias(
            "mae_one_step"
        ),
        *[
            F.round(F.col("st.l") + h * F.col("st.b"), 6).alias(f"forecast_{h}")
            for h in (1, 2, 3)
        ],
    )


# --------------------------------------- watermark lateness audit (events)

WM_BUCKETS_MIN = (0, 1, 5, 15, 60, 240)  # lateness buckets, minutes


@query(
    "events_watermark_lateness_audit",
    oracle=f"""
    WITH arr AS (
      SELECT event_id, ts,
        -- RANGE (peer-inclusive), matching bucketed_prefix_max's in-bucket
        -- frame: with duplicate event_ids a ROWS frame is tie-order
        -- nondeterministic on BOTH engines; peer-inclusive MAX is the one
        -- well-defined semantics (ADVICE r6).
        MAX(ts) OVER (ORDER BY event_id
          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hwm
      FROM events
    ),
    late AS (
      SELECT CAST(date_diff('second', ts, hwm) AS BIGINT) AS late_s
      FROM arr
    ),
    bucketed AS (
      SELECT CASE
        {" ".join(
          f"WHEN late_s <= {m * 60} THEN {m}"
          for m in WM_BUCKETS_MIN
        )}
        ELSE -1 END AS wm_minutes,
        COUNT(*) AS n
      FROM late GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS total FROM bucketed)
    SELECT wm_minutes, n,
      round(CAST(SUM(n) OVER (ORDER BY CASE WHEN wm_minutes = -1
                 THEN 999999 ELSE wm_minutes END) AS DOUBLE)
            / tot.total, 8) AS kept_fraction
    FROM bucketed CROSS JOIN tot
    """,
)
def events_watermark_lateness_audit(spark, sf_dir):
    """Watermark tuning evidence: per event, lateness = high-water-mark of
    event time over everything that ARRIVED earlier (arrival order =
    event_id) minus its own event time; bucketed into candidate watermark
    delays with the cumulative fraction of events each delay would keep.
    This is THE number a streaming deployment needs before setting
    ``withWatermark`` — too small silently drops the late tail, too large
    bloats every stateful operator's store.

    Scale shape: the global arrival-order running max runs through
    ``bucketed_prefix_max`` (functions/prefix.py) — event_id ranges bucket
    the scan, per-bucket maxes collapse to a <= 16-row carry-in table, and
    the in-bucket high-water-mark windows run one-partition-per-bucket, so
    NO row-level window ever executes unpartitioned (round-5 VERDICT item
    3). Output is bucket-sized; the -1 bucket is "later than every
    candidate" (would need a bigger watermark).

    Round-11: the events scan fans out of the one-task single-row-group
    layout — the bucket-id map stage and the map sides of the prefix-max
    kernel's two exchanges ran single-core; one fanned exchange is shared
    by both kernel branches."""
    from quackio_jl_spark.functions.prefix import bucketed_prefix_max

    e = table(spark, sf_dir, "events")
    arr = bucketed_prefix_max(
        fanout(e.select("event_id", "ts"), "event_id"), "event_id", "ts"
    ).withColumnRenamed("cum_ts", "hwm")
    late = arr.select(
        (F.unix_timestamp("hwm") - F.unix_timestamp("ts")).alias("late_s")
    )
    bucket = None
    for m in WM_BUCKETS_MIN:
        cond = F.col("late_s") <= m * 60
        bucket = F.when(cond, F.lit(m)) if bucket is None else bucket.when(cond, F.lit(m))
    bucket = bucket.otherwise(F.lit(-1))
    bucketed = late.groupBy(bucket.alias("wm_minutes")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = F.broadcast(bucketed.agg(F.sum("n").alias("total")))
    order_key = F.when(F.col("wm_minutes") == -1, F.lit(999999)).otherwise(
        F.col("wm_minutes")
    )
    cum = F.sum("n").over(
        W.orderBy(order_key).rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return bucketed.crossJoin(tot).select(
        "wm_minutes",
        "n",
        F.round(cum.cast("double") / F.col("total"), 8).alias("kept_fraction"),
    )


# --------------------------------------------- Huber robust regression

HUBER_DELTA = 10000.0  # residual scale where downweighting starts ($ units)
_HUB_DS = "CAST(SUM(CAST(round({x}, 8) AS DECIMAL(38,12))) AS DOUBLE)"


@query(
    "lineitem_huber_irls_regression",
    oracle=f"""
    WITH s0 AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        {_HUB_DS.format(x='l_quantity')} AS sx,
        {_HUB_DS.format(x='l_extendedprice')} AS sy,
        {_HUB_DS.format(x='l_quantity * l_quantity')} AS sxx,
        {_HUB_DS.format(x='l_quantity * l_extendedprice')} AS sxy
      FROM lineitem
    ),
    fit0 AS (
      SELECT n,
        round((n * sxy - sx * sy) / (n * sxx - sx * sx), 8) AS b0,
        round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 8)
          AS a0
      FROM s0
    ),
    wrows AS (
      SELECT l_quantity AS x, l_extendedprice AS y,
        round(least(1.0, {HUBER_DELTA}
          / greatest(abs(l_extendedprice - (fit0.a0 + fit0.b0 * l_quantity)),
                     1e-9)), 8) AS w
      FROM lineitem CROSS JOIN fit0
    ),
    s1 AS (
      SELECT
        {_HUB_DS.format(x='w')} AS sw,
        {_HUB_DS.format(x='w * x')} AS swx,
        {_HUB_DS.format(x='w * y')} AS swy,
        {_HUB_DS.format(x='w * x * x')} AS swxx,
        {_HUB_DS.format(x='w * x * y')} AS swxy,
        CAST(SUM(CASE WHEN w < 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down
      FROM wrows
    )
    SELECT CAST(fit0.n AS BIGINT) AS n_rows,
      fit0.b0 AS slope_ols, fit0.a0 AS intercept_ols,
      round((sw * swxy - swx * swy) / (sw * swxx - swx * swx), 8)
        AS slope_huber,
      round((swy - (sw * swxy - swx * swy) / (sw * swxx - swx * swx) * swx)
        / sw, 8) AS intercept_huber,
      n_down AS n_downweighted
    FROM s1 CROSS JOIN fit0
    """,
)
def lineitem_huber_irls_regression(spark, sf_dir):
    """Huber robust regression by one IRLS round: fit OLS closed-form from
    exact decimal power sums, compute per-row Huber weights
    w = min(1, delta/|residual|) against the ROUNDED first fit (both
    engines downweight from bit-identical coefficients), and re-solve the
    weighted normal equations — the outlier-resistant trend every metric
    with a heavy tail needs (OLS chases the tail; Huber caps each row's
    influence at delta). Output: both fits plus how many rows were
    downweighted; further IRLS rounds repeat the same two-pass shape.

    Scale shape: two full scans, each collapsing to a handful of decimal
    power sums via map-side partial aggregation (the TPC-H Q1 footprint);
    the 1-row first fit broadcasts. No window, no libm in the hashed
    dataflow — weights are min/abs/divide on basic-ops residuals."""
    l = table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")

    def ds(c):
        return F.sum(F.round(c, 8).cast("decimal(38,12)")).cast("double")

    s0 = l.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        ds(x).alias("sx"),
        ds(y).alias("sy"),
        ds(x * x).alias("sxx"),
        ds(x * y).alias("sxy"),
    )
    n, sx, sy, sxx, sxy = [F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy")]
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    fit0 = F.broadcast(
        s0.select(
            "n",
            F.round(slope, 8).alias("b0"),
            F.round((sy - slope * sx) / n, 8).alias("a0"),
        )
    )
    w = F.round(
        F.least(
            F.lit(1.0),
            F.lit(HUBER_DELTA)
            / F.greatest(
                F.abs(y - (F.col("a0") + F.col("b0") * x)), F.lit(1e-9)
            ),
        ),
        8,
    )
    wr = l.crossJoin(fit0).select(x.alias("x"), y.alias("y"), w.alias("w"))
    xx, yy, ww = F.col("x"), F.col("y"), F.col("w")
    s1 = wr.agg(
        ds(ww).alias("sw"),
        ds(ww * xx).alias("swx"),
        ds(ww * yy).alias("swy"),
        ds(ww * xx * xx).alias("swxx"),
        ds(ww * xx * yy).alias("swxy"),
        F.sum(F.when(ww < 1.0, 1).otherwise(0)).cast("bigint").alias("n_down"),
    )
    sw, swx, swy, swxx, swxy = [
        F.col(c) for c in ("sw", "swx", "swy", "swxx", "swxy")
    ]
    sl1 = (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
    return s1.crossJoin(fit0).select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("b0").alias("slope_ols"),
        F.col("a0").alias("intercept_ols"),
        F.round(sl1, 8).alias("slope_huber"),
        F.round((swy - sl1 * swx) / sw, 8).alias("intercept_huber"),
        F.col("n_down").alias("n_downweighted"),
    )


# ------------------------------------ Holt-Winters additive seasonal

HW_M = 12  # season length (months)

# The entire recursion runs in INTEGER 1e-4 units (y4 = round(y * 1e4)):
# alpha = 1/2, beta = gamma = 1/4 become explicit floor divisions, so no
# floating-point number ever enters the state. A rounded-double recursion
# at this magnitude (~1e7) is NOT cross-engine stable: round(x, d) ties
# land beyond double precision and the engines' rounding paths diverge
# mid-recursion (observed at both 8 and 4 dp before this formulation).
#   l' = floor((y4 - s1 + l + b) / 2)
#   b' = floor((l' - l + 3 b) / 4)
#   s' = floor((y4 - l' + 3 s1) / 4)
#   sae' = sae + |y4 - (l + b + s1)|
# floor() of an exact-integer-valued double division (< 2^53) is exact
# and identical in both engines.


@query(
    "orders_monthly_holt_winters",
    oracle=f"""
    WITH RECURSIVE bins AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
        CAST(round(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                   * 1e4) AS BIGINT) AS y4
      FROM orders GROUP BY 1
    ),
    months AS (
      SELECT ROW_NUMBER() OVER (ORDER BY mon) AS t, y4 FROM bins
    ),
    nn AS (SELECT MAX(t) AS n FROM months),
    i1 AS (SELECT CAST(SUM(y4) AS BIGINT) AS s1 FROM months WHERE t <= {HW_M}),
    i2 AS (SELECT CAST(SUM(y4) AS BIGINT) AS s2 FROM months
           WHERE t > {HW_M} AND t <= 2 * {HW_M}),
    init AS (
      SELECT CAST(floor(CAST(i1.s1 AS DOUBLE) / {HW_M}) AS BIGINT) AS l0,
        CAST(floor(CAST(i2.s2 - i1.s1 AS DOUBLE)
                   / ({HW_M} * {HW_M})) AS BIGINT) AS b0
      FROM i1 CROSS JOIN i2
    ),
    s0 AS (
      SELECT list(y4 - init.l0 ORDER BY t) AS s0
      FROM months CROSS JOIN init WHERE t <= {HW_M}
    ),
    rec(t, l, b, s, sae) AS (
      SELECT CAST({HW_M} AS BIGINT), init.l0, init.b0, s0.s0,
        CAST(0 AS BIGINT)
      FROM init CROSS JOIN s0
      UNION ALL
      SELECT m.t,
        CAST(floor(CAST(m.y4 - rec.s[1] + rec.l + rec.b AS DOUBLE) / 2)
             AS BIGINT),
        CAST(floor(CAST(
            CAST(floor(CAST(m.y4 - rec.s[1] + rec.l + rec.b AS DOUBLE) / 2)
                 AS BIGINT) - rec.l + 3 * rec.b AS DOUBLE) / 4) AS BIGINT),
        list_append(rec.s[2:{HW_M}],
          CAST(floor(CAST(m.y4
            - CAST(floor(CAST(m.y4 - rec.s[1] + rec.l + rec.b AS DOUBLE) / 2)
                   AS BIGINT)
            + 3 * rec.s[1] AS DOUBLE) / 4) AS BIGINT)),
        rec.sae + abs(m.y4 - (rec.l + rec.b + rec.s[1]))
      FROM rec JOIN months m ON m.t = rec.t + 1
    )
    SELECT CAST(nn.n AS BIGINT) AS n_months,
      rec.l AS level_e4, rec.b AS trend_e4,
      rec.sae AS sae_e4,
      rec.l + 1 * rec.b + rec.s[1] AS forecast_1_e4,
      rec.l + 2 * rec.b + rec.s[2] AS forecast_2_e4,
      rec.l + 3 * rec.b + rec.s[3] AS forecast_3_e4
    FROM rec CROSS JOIN nn WHERE rec.t = nn.n
    """,
)
def orders_monthly_holt_winters(spark, sf_dir):
    """Holt-Winters ADDITIVE seasonal smoothing (triple exponential) of
    monthly revenue with a HW_M-month season: level/trend as in Holt plus
    a rotating seasonal-index array — the standard seasonal forecaster,
    with 1-3 month forecasts including the seasonal component and the
    in-sample sum of absolute one-step errors. Initialization is the
    textbook one (level = season-1 mean, trend = seasonal mean
    difference / m, indices = season-1 deviations).

    Determinism: the WHOLE recursion is integer arithmetic in 1e-4 units
    (alpha = 1/2, beta = gamma = 1/4 as exact floor divisions; see the
    module comment above — rounded-double state at ~1e7 magnitude is
    provably cross-engine unstable), so every state component and output
    is an exact BIGINT. Scale shape: same as orders_monthly_holt_trend —
    one month rollup (the only shuffle), then an in-row F.aggregate fold
    carrying the seasonal array in the accumulator struct; the oracle
    replays the identical recursion as a recursive CTE."""
    o = table(spark, sf_dir, "orders")
    bins = o.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(dsum("o_totalprice").cast("double") * 1e4)
        .cast("bigint")
        .alias("y4")
    )
    series = bins.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("mon", "y4"))),
            lambda r: r["y4"],
        ).alias("ys")
    )
    n = F.size("ys")

    def isum(start):
        return F.aggregate(
            F.slice("ys", start, HW_M),
            F.lit(0).cast("bigint"),
            lambda a, y: a + y,
        )

    def fdiv(num, den):
        return F.floor(num.cast("double") / den).cast("bigint")

    l0 = fdiv(isum(1), HW_M)
    b0 = fdiv(isum(HW_M + 1) - isum(1), HW_M * HW_M)
    init = F.struct(
        l0.alias("l"),
        b0.alias("b"),
        F.transform(F.slice("ys", 1, HW_M), lambda y: y - l0).alias("s"),
        F.lit(0).cast("bigint").alias("sae"),
    )

    def step(acc, y):
        s1 = F.element_at(acc["s"], 1)
        l_new = fdiv(y - s1 + acc["l"] + acc["b"], 2)
        b_new = fdiv(l_new - acc["l"] + 3 * acc["b"], 4)
        s_new = fdiv(y - l_new + 3 * s1, 4)
        return F.struct(
            l_new.alias("l"),
            b_new.alias("b"),
            F.concat(
                F.slice(acc["s"], 2, HW_M - 1), F.array(s_new)
            ).alias("s"),
            (acc["sae"] + F.abs(y - (acc["l"] + acc["b"] + s1))).alias("sae"),
        )

    fitted = series.select(
        n.cast("bigint").alias("n_months"),
        F.aggregate(F.slice("ys", HW_M + 1, n - HW_M), init, step).alias("st"),
    )
    return fitted.select(
        "n_months",
        F.col("st.l").alias("level_e4"),
        F.col("st.b").alias("trend_e4"),
        F.col("st.sae").alias("sae_e4"),
        *[
            (
                F.col("st.l")
                + h * F.col("st.b")
                + F.element_at(F.col("st.s"), h)
            ).alias(f"forecast_{h}_e4")
            for h in (1, 2, 3)
        ],
    )


# ------------------------------------ trimmed / winsorized segment means

TRIM_FRAC = 0.05


@query(
    "orders_trimmed_winsorized_means",
    oracle=f"""
    WITH r AS (
      SELECT o_orderpriority AS seg, o_totalprice AS v,
        ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey) AS rk,
        COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    ),
    kk AS (
      SELECT seg, v, rk, n, CAST(floor({TRIM_FRAC} * n) AS BIGINT) AS k
      FROM r
    ),
    bounds AS (
      SELECT seg,
        MIN(CASE WHEN rk = k + 1 THEN v END) AS lo,
        MIN(CASE WHEN rk = n - k THEN v END) AS hi
      FROM kk GROUP BY seg
    )
    SELECT kk.seg, CAST(MAX(kk.n) AS BIGINT) AS n,
      CAST(MAX(kk.k) AS BIGINT) AS k,
      CAST(SUM(CAST(kk.v AS DECIMAL(28,6))) AS DOUBLE) / MAX(kk.n) AS mean,
      CAST(SUM(CASE WHEN kk.rk > kk.k AND kk.rk <= kk.n - kk.k
               THEN CAST(kk.v AS DECIMAL(28,6)) END) AS DOUBLE)
        / (MAX(kk.n) - 2 * MAX(kk.k)) AS trimmed_mean,
      CAST(SUM(CAST(least(greatest(kk.v, b.lo), b.hi) AS DECIMAL(28,6)))
           AS DOUBLE) / MAX(kk.n) AS winsorized_mean
    FROM kk JOIN bounds b USING (seg)
    GROUP BY kk.seg
    """,
)
def orders_trimmed_winsorized_means(spark, sf_dir):
    """Robust segment means: per order priority, the plain mean of
    o_totalprice next to the {TRIM_FRAC:.0%}-TRIMMED mean (drop the k
    smallest and k largest, k = floor({TRIM_FRAC} n)) and the
    {TRIM_FRAC:.0%}-WINSORIZED mean (clamp to the (k+1)-th and (n-k)-th
    order statistics) — the outlier-robust location estimates a spend
    report actually wants when a few whale orders drag the mean. The gap
    between mean and trimmed mean IS the outlier-influence measurement.

    Determinism: rank-based, never interpolated — ROW_NUMBER over the
    total (value, orderkey) order makes the trim cut and the clamp
    bounds exact order statistics both engines agree on (interpolated
    percentiles have engine-specific tie/lerp semantics); sums are
    decimal-exact.

    Scale shape: one partitioned rank window per segment (scales out on
    the segment key), a 5-row bounds table joined back broadcast-sized,
    one aggregate. No global sort, no percentile sketch."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("seg"),
        F.col("o_totalprice").alias("v"),
        "o_orderkey",
    )
    w = W.partitionBy("seg").orderBy("v", "o_orderkey")
    # persist the ranked frame (round-12, guide §2.4/§5): its two
    # consumers — the bounds BROADCAST build and the main aggregation —
    # are separate executions, so the rank sort + windows executed twice
    # (the round-12 before plan shows the Exchange+Sort+Window chain
    # duplicated under the BroadcastExchange). One sorted window pass now
    # feeds both; the harness frees the frame between queries.
    r = o.select(
        "seg",
        "v",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy("seg")).alias("n"),
    ).withColumn("k", F.floor(F.lit(TRIM_FRAC) * F.col("n")).cast("bigint")).persist()
    bounds = (
        r.groupBy("seg")
        .agg(
            F.min(F.when(F.col("rk") == F.col("k") + 1, F.col("v"))).alias("lo"),
            F.min(F.when(F.col("rk") == F.col("n") - F.col("k"), F.col("v"))).alias(
                "hi"
            ),
        )
    )
    j = r.join(F.broadcast(bounds), "seg")
    clamped = F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
    return (
        j.groupBy("seg")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.max("k").cast("bigint").alias("k"),
            (F.sum(F.col("v").cast(DEC)).cast("double") / F.max("n")).alias("mean"),
            (
                F.sum(
                    F.when(
                        (F.col("rk") > F.col("k"))
                        & (F.col("rk") <= F.col("n") - F.col("k")),
                        F.col("v").cast(DEC),
                    )
                ).cast("double")
                / (F.max("n") - 2 * F.max("k"))
            ).alias("trimmed_mean"),
            (F.sum(clamped.cast(DEC)).cast("double") / F.max("n")).alias(
                "winsorized_mean"
            ),
        )
    )
