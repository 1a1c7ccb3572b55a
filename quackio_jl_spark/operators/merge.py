"""Upsert (MERGE INTO) as a composition of DataFrame ops.

Beyond-reference capability (the reference is read/write-only I/O,
/root/reference/src/QuackIO.jl:33-42 COPY TO — no update semantics).
Spark's file sources have no transactional MERGE (that's the table-format
layer: Delta/Iceberg/Hudi). The relational semantics, though, are exactly a
full-outer join + per-column COALESCE with the update side winning — which
is what those formats execute under the hood, minus the commit protocol.

Scale: the merge shuffles both sides on the key — with the base stored
BUCKETED on the key (sources/bucketing.py), only the (much smaller) update
side shuffles. Matched rows take the update's non-null columns; unmatched
base rows survive; unmatched update rows insert.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import DEC
from ..functions.fanout import fanout
from ..lineage import audit_rounds, truncate as _truncate_lineage
from ..plans.registry import query, table

__all__ = ["upsert"]


def upsert(base: DataFrame, updates: DataFrame, keys: list[str] | str) -> DataFrame:
    """MERGE semantics: WHEN MATCHED update (update's non-null columns win,
    column-level), WHEN NOT MATCHED insert. Updates must share the base's
    key columns; other update columns must be a subset of the base's."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    b, u = base.alias("b"), updates.alias("u")
    cond = reduce(
        lambda a, c: a & c, [F.col(f"b.{k}") == F.col(f"u.{k}") for k in keys]
    )
    joined = b.join(u, cond, "full_outer")
    out = []
    for c in base.columns:
        if c in updates.columns:
            out.append(F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c))
        else:
            out.append(F.col(f"b.{c}").alias(c))
    return joined.select(*out)


@query(
    "upsert_orders",
    oracle=f"""
    WITH updates AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             o_totalprice * 1.1 AS o_totalprice
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, 'N', o_totalprice
      FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           COALESCE(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
           COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice,
           b.o_custkey
    FROM orders b FULL OUTER JOIN updates u ON b.o_orderkey = u.o_orderkey
    """,
)
def upsert_orders(spark, sf_dir):
    """MERGE INTO exercised end-to-end: ~10% of orders updated (status 'U',
    price x1.1), plus inserts at offset keys — the oracle is the equivalent
    full-outer-join SQL, so matched/unmatched-base/unmatched-update paths
    are all hash-verified. Columns absent from the update set (o_custkey)
    pass through and are NULL on inserts, as MERGE leaves them."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_custkey"
    )
    upd = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
    )
    ins = o.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.col("o_totalprice"),
    )
    return upsert(o, upd.unionByName(ins), "o_orderkey")


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    ts_col: str = "valid_from",
    open_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: one micro-batch of updates against
    a versioned history table (columns = key, attrs..., valid_from,
    valid_to with NULL meaning 'current').

    - closed rows pass through untouched;
    - current rows whose key receives an update close (valid_to := the
      update's timestamp);
    - each update inserts a new current row.

    At most one update per key per batch (the standard micro-batch
    contract; chain batches for more). Cost: one shuffle of the (small)
    update side against the history key — with history bucketed on the
    key, the history side never re-shuffles."""
    upd_ts = updates.select(
        F.col(key), F.col(ts_col).alias("__new_from")
    )
    closed_or_kept = (
        history.join(F.broadcast(upd_ts), key, "left")
        .withColumn(
            open_col,
            F.when(
                F.col(open_col).isNull() & F.col("__new_from").isNotNull(),
                F.col("__new_from"),
            ).otherwise(F.col(open_col)),
        )
        .drop("__new_from")
    )
    inserts = updates.withColumn(open_col, F.lit(None).cast(
        dict(history.dtypes)[open_col]
    ))
    return closed_or_kept.unionByName(inserts.select(*history.columns))


@query(
    "scd2_customer_history",
    oracle="""
    WITH hist AS (
      SELECT c_custkey, c_acctbal,
             TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM customer
    ),
    upd AS (
      SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal,
             TIMESTAMP '2000-06-01 00:00:00' AS valid_from
      FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT h.c_custkey, h.c_acctbal, h.valid_from,
           CASE WHEN u.c_custkey IS NOT NULL THEN u.valid_from END AS valid_to
    FROM hist h LEFT JOIN upd u ON u.c_custkey = h.c_custkey
    UNION ALL
    SELECT c_custkey, c_acctbal, valid_from, CAST(NULL AS TIMESTAMP)
    FROM upd
    """,
)
def scd2_customer_history(spark, sf_dir):
    """SCD-2 exercised end-to-end: seed a history from customer, apply one
    update batch (~14% of keys get a new acctbal), and hash-verify all
    three row classes — untouched current rows, closed-out rows with
    valid_to stamped, and the inserted new versions."""
    c = table(spark, sf_dir, "customer")
    hist = c.select(
        "c_custkey",
        "c_acctbal",
        F.lit("1995-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    upd = (
        c.filter(F.col("c_custkey") % 7 == 0)
        .select(
            "c_custkey",
            (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
            F.lit("2000-06-01 00:00:00").cast("timestamp").alias("valid_from"),
        )
    )
    return scd2_apply(hist, upd, "c_custkey")


def scd2_apply_multi(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    ts_col: str = "valid_from",
    open_col: str = "valid_to",
) -> DataFrame:
    """SCD-2 accepting SEVERAL updates per key in one batch: updates chain
    in timestamp order (each version closes at the next version's
    valid_from; the latest stays open), and the previously-current history
    row closes at the key's EARLIEST update. Ties on the timestamp are
    not allowed (versioning needs a total order per key)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(key).orderBy(ts_col)
    chained = updates.withColumn(open_col, F.lead(ts_col).over(w))
    first_ts = updates.groupBy(key).agg(F.min(ts_col).alias("__new_from"))
    closed_or_kept = (
        history.join(F.broadcast(first_ts), key, "left")
        .withColumn(
            open_col,
            F.when(
                F.col(open_col).isNull() & F.col("__new_from").isNotNull(),
                F.col("__new_from"),
            ).otherwise(F.col(open_col)),
        )
        .drop("__new_from")
    )
    return closed_or_kept.unionByName(chained.select(*history.columns))


@query(
    "scd2_multi_update_history",
    oracle="""
    WITH hist AS (
      SELECT c_custkey, c_acctbal,
             TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM customer
    ),
    upd AS (
      SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal,
             TIMESTAMP '2000-06-01 00:00:00' AS valid_from
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey, c_acctbal + 200.0,
             TIMESTAMP '2001-01-01 00:00:00'
      FROM customer WHERE c_custkey % 14 = 0
    ),
    chained AS (
      SELECT c_custkey, c_acctbal, valid_from,
        LEAD(valid_from) OVER (PARTITION BY c_custkey ORDER BY valid_from)
          AS valid_to
      FROM upd
    ),
    first_ts AS (SELECT c_custkey, MIN(valid_from) AS nf FROM upd GROUP BY c_custkey)
    SELECT h.c_custkey, h.c_acctbal, h.valid_from,
           CASE WHEN f.c_custkey IS NOT NULL THEN f.nf END AS valid_to
    FROM hist h LEFT JOIN first_ts f ON f.c_custkey = h.c_custkey
    UNION ALL
    SELECT c_custkey, c_acctbal, valid_from, valid_to FROM chained
    """,
)
def scd2_multi_update_history(spark, sf_dir):
    """SCD-2 with a batch containing TWO updates for half the updated keys:
    the mid-version must close at the later version's start (lead window),
    the later stays open, and the original row closes at the EARLIEST
    update — chain integrity hash-verified."""
    c = table(spark, sf_dir, "customer")
    hist = c.select(
        "c_custkey",
        "c_acctbal",
        F.lit("1995-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    u1 = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("2000-06-01 00:00:00").cast("timestamp").alias("valid_from"),
    )
    u2 = c.filter(F.col("c_custkey") % 14 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + 200.0).alias("c_acctbal"),
        F.lit("2001-01-01 00:00:00").cast("timestamp").alias("valid_from"),
    )
    return scd2_apply_multi(hist, u1.unionByName(u2), "c_custkey")


@query(
    "pit_join_orders_customer_version",
    oracle="""
    WITH hist AS (
      SELECT c_custkey, c_acctbal,
             TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM customer
    ),
    upd AS (
      SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal,
             TIMESTAMP '2000-06-01 00:00:00' AS valid_from
      FROM customer WHERE c_custkey % 7 = 0
    ),
    versions AS (
      SELECT h.c_custkey, h.c_acctbal, h.valid_from,
             CASE WHEN u.c_custkey IS NOT NULL THEN u.valid_from END AS valid_to
      FROM hist h LEFT JOIN upd u ON u.c_custkey = h.c_custkey
      UNION ALL
      SELECT c_custkey, c_acctbal, valid_from, CAST(NULL AS TIMESTAMP) FROM upd
    )
    SELECT o.o_orderkey, o.o_custkey, v.c_acctbal AS acctbal_at_order
    FROM orders o LEFT JOIN versions v
      ON v.c_custkey = o.o_custkey
     AND v.valid_from <= o.o_orderdate
     AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
    """,
)
def pit_join_orders_customer_version(spark, sf_dir):
    """Point-in-time (temporal) join: each order attached to the customer
    SCD-2 version that was valid at the order date — the lookup every
    feature-store / training-label pipeline needs to avoid leakage from
    future attribute values. Orders before the first version match nothing
    (NULL), proving the temporal bound really filters.

    Implemented as a backward as-of join on (custkey, valid_from <=
    o_orderdate): ONE union+window shuffle regardless of version count —
    the interval-overlap formulation the oracle uses would be a range
    join; on contiguous SCD-2 history the as-of pick IS the valid version,
    so the cheap shape is also the correct one."""
    from .asof import asof_join

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_custkey").alias("c_custkey"),
        "o_orderdate",
    )
    versions = scd2_customer_history(spark, sf_dir).select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal_at_order"),
        "valid_from",
    )
    res = asof_join(
        o,
        versions,
        by=["c_custkey"],
        left_on="o_orderdate",
        right_on="valid_from",
        right_values=["acctbal_at_order"],
        tiebreak="o_orderkey",
    )
    return res.select("o_orderkey", "o_custkey", "acctbal_at_order")


# ----------------------------------------------------------- CDC snapshot diff

@query(
    "snapshot_diff_cdc",
    oracle="""
    WITH a AS (SELECT doc_id, md5(text) AS h FROM documents),
    b AS (
      SELECT doc_id,
        CASE WHEN doc_id % 13 = 0 THEN md5(upper(text)) ELSE md5(text) END AS h
      FROM documents WHERE doc_id % 17 <> 0
    )
    SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
      CASE WHEN b.doc_id IS NULL THEN 'deleted'
           WHEN a.doc_id IS NULL THEN 'added'
           ELSE 'updated' END AS change_type
    FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    WHERE b.doc_id IS NULL OR a.doc_id IS NULL OR a.h <> b.h
    """,
)
def snapshot_diff_cdc(spark, sf_dir):
    """Change-data-capture diff between two corpus snapshots: full-outer
    join on the key, rows classified added/deleted/updated by md5 content
    hash (unchanged rows are filtered out BEFORE leaving the join — at
    100 TB the diff output is change-sized, not corpus-sized, and the
    hashes mean no text ever shuffles twice). Snapshot B is simulated
    deterministically from the fixture (every 17th doc deleted, every
    13th edited) so the oracle reproduces it; in production both sides
    are real snapshot scans — ideally bucketed by the key so the
    full-outer is exchange-free (sources/bucketing.py). The downstream
    consumers are upsert (apply the diff) and scd2_apply (keep history)."""
    d = table(spark, sf_dir, "documents")
    a = d.select("doc_id", F.md5("text").alias("h"))
    b = (
        d.filter(F.col("doc_id") % 17 != 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 13 == 0, F.md5(F.upper("text")))
            .otherwise(F.md5("text"))
            .alias("h"),
        )
        .withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("h", "b_h")
    )
    j = a.join(b, F.col("doc_id") == F.col("b_id"), "full_outer")
    return (
        j.filter(
            F.col("b_id").isNull()
            | F.col("doc_id").isNull()
            | (F.col("h") != F.col("b_h"))
        )
        .select(
            F.coalesce("doc_id", "b_id").alias("doc_id"),
            F.when(F.col("b_id").isNull(), "deleted")
            .when(F.col("doc_id").isNull(), "added")
            .otherwise("updated")
            .alias("change_type"),
        )
    )


# --------------- fuzzy duplicate detection on structured records

DUP_INV_PRICE_TOL = 10.0
DUP_INV_DAY_TOL = 90
_DUP_INV_BAND = 20.0  # band width: > tolerance, so +-1 band suffices


@query(
    "orders_duplicate_invoices",
    oracle=f"""
    SELECT a.o_custkey AS custkey,
      a.o_orderkey AS orderkey_a, b.o_orderkey AS orderkey_b,
      round(abs(a.o_totalprice - b.o_totalprice), 2) AS price_diff,
      CAST(abs(datediff('day', a.o_orderdate, b.o_orderdate)) AS BIGINT)
        AS day_diff
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
     AND abs(a.o_totalprice - b.o_totalprice) <= {DUP_INV_PRICE_TOL}
     AND abs(datediff('day', a.o_orderdate, b.o_orderdate))
         <= {DUP_INV_DAY_TOL}
    """,
)
def orders_duplicate_invoices(spark, sf_dir):
    """Fuzzy duplicate detection on STRUCTURED records — the
    double-billing screen: order pairs of the same customer whose totals
    agree within {DUP_INV_PRICE_TOL} and dates within
    {DUP_INV_DAY_TOL} days. The record-linkage counterpart of the text
    near-dup family: blocking key + exact verify, never an unblocked
    self-join.

    Blocking is (custkey, price band) with the probe side exploded into
    the three adjacent bands (band width {_DUP_INV_BAND} > 2x tolerance
    is NOT needed — width > tolerance with +-1 bands guarantees recall);
    band identity makes each candidate pair meet exactly once, so no
    distinct pass. Per-key work scales with band occupancy, not with
    orders-per-customer squared."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.to_date("o_orderdate").alias("d"),
    )
    return banded_duplicate_pairs(o, DUP_INV_PRICE_TOL, DUP_INV_DAY_TOL, _DUP_INV_BAND)


def banded_duplicate_pairs(o, price_tol, day_tol, band_width):
    """Core blocked fuzzy-pair join over (o_orderkey, o_custkey,
    o_totalprice, d) — see orders_duplicate_invoices. Requires
    band_width > price_tol (checked) so +-1 bands guarantee recall;
    property-tested against brute force in tests/test_property_roundtrip.py.

    Round-11: the input fans out of the one-task single-row-group scan —
    the x3 band explode and the hash map side of both join exchanges ran
    single-core; one fanned exchange is shared by the a/b branches."""
    assert band_width > price_tol, "band width must exceed the tolerance"
    o = fanout(o, "o_orderkey")
    W_ = band_width
    band = F.floor(F.col("o_totalprice") / W_)
    a = o.select(
        F.col("o_orderkey").alias("ka"),
        F.col("o_custkey").alias("ca"),
        F.col("o_totalprice").alias("pa"),
        F.col("d").alias("da"),
        F.explode(F.array(band - 1, band, band + 1)).alias("band"),
    )
    b = o.select(
        F.col("o_orderkey").alias("kb"),
        F.col("o_custkey").alias("cb"),
        F.col("o_totalprice").alias("pb"),
        F.col("d").alias("db"),
        band.alias("band_b"),
    )
    return (
        a.join(
            b,
            (F.col("ca") == F.col("cb")) & (F.col("band") == F.col("band_b")),
        )
        .filter(
            (F.col("ka") < F.col("kb"))
            & (F.abs(F.col("pa") - F.col("pb")) <= price_tol)
            & (
                F.abs(F.datediff("da", "db")) <= day_tol
            )
        )
        .select(
            F.col("ca").alias("custkey"),
            F.col("ka").alias("orderkey_a"),
            F.col("kb").alias("orderkey_b"),
            F.round(F.abs(F.col("pa") - F.col("pb")), 2).alias("price_diff"),
            F.abs(F.datediff("da", "db")).cast("bigint").alias("day_diff"),
        )
    )


# ------------- catalog substitution candidates (relative-tolerance ER)

SUBST_REL_TOL = 0.02     # prices within 2% count as substitutable
_SUBST_LOG_BAND = 1.05   # log-band base: ln(1.05) width > ln(1.02) tolerance


@query(
    "part_substitution_candidates",
    oracle=f"""
    SELECT a.p_partkey AS partkey_a, b.p_partkey AS partkey_b,
      a.p_type AS type, CAST(a.p_size AS INTEGER) AS size,
      a.p_brand AS brand_a, b.p_brand AS brand_b,
      round(abs(a.p_retailprice - b.p_retailprice)
        / least(a.p_retailprice, b.p_retailprice), 8) AS price_gap_rel
    FROM part a JOIN part b
      ON a.p_type = b.p_type AND a.p_size = b.p_size
     AND a.p_brand <> b.p_brand
     AND a.p_partkey < b.p_partkey
     AND abs(a.p_retailprice - b.p_retailprice)
         <= {SUBST_REL_TOL} * least(a.p_retailprice, b.p_retailprice)
    """,
)
def part_substitution_candidates(spark, sf_dir):
    """Catalog substitution candidates: same type and size, different
    brand, retail price within {SUBST_REL_TOL:.0%} — the
    assortment-rationalization / competitor-matching screen, i.e. record
    linkage on STRUCTURED catalog attributes with a RELATIVE price
    tolerance.

    Relative tolerance needs multiplicative blocking: the band is
    floor(ln(price) / ln({_SUBST_LOG_BAND})), whose width (≈4.9%)
    strictly exceeds the 2% tolerance, so exploding one side into
    {{band-1, band, band+1}} guarantees recall and band identity makes
    each pair meet once (same emit discipline as
    orders_duplicate_invoices, different geometry: log-space bands for
    ratio predicates, linear bands for absolute ones)."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size", "p_retailprice"
    )
    lb = F.floor(
        F.ln("p_retailprice") / float(__import__("math").log(_SUBST_LOG_BAND))
    )
    a = p.select(
        F.col("p_partkey").alias("ka"),
        F.col("p_brand").alias("ba"),
        F.col("p_type").alias("ta"),
        F.col("p_size").alias("sa"),
        F.col("p_retailprice").alias("pa"),
        F.explode(F.array(lb - 1, lb, lb + 1)).alias("band"),
    )
    b = p.select(
        F.col("p_partkey").alias("kb"),
        F.col("p_brand").alias("bb"),
        F.col("p_type").alias("tb"),
        F.col("p_size").alias("sb"),
        F.col("p_retailprice").alias("pb"),
        lb.alias("band_b"),
    )
    gap = F.abs(F.col("pa") - F.col("pb"))
    lo = F.least("pa", "pb")
    return (
        a.join(
            b,
            (F.col("ta") == F.col("tb"))
            & (F.col("sa") == F.col("sb"))
            & (F.col("band") == F.col("band_b")),
        )
        .filter(
            (F.col("ka") < F.col("kb"))
            & (F.col("ba") != F.col("bb"))
            & (gap <= SUBST_REL_TOL * lo)
        )
        .select(
            F.col("ka").alias("partkey_a"),
            F.col("kb").alias("partkey_b"),
            F.col("ta").alias("type"),
            F.col("sa").cast("int").alias("size"),
            F.col("ba").alias("brand_a"),
            F.col("bb").alias("brand_b"),
            F.round(gap / lo, 8).alias("price_gap_rel"),
        )
    )


# ------------------------------------------ incremental aggregate maintenance

@query(
    "incremental_agg_maintenance",
    oracle="""
    SELECT o_custkey,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_spend,
      MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_custkey
    """,
)
def incremental_agg_maintenance(spark, sf_dir):
    """Materialized-aggregate maintenance: merge a STORED per-customer
    aggregate (count / exact-decimal sum / max over ~90% of orders,
    written to parquet and read back — the materialized view) with a
    late-arriving delta batch by combining partial states, WITHOUT
    re-scanning the base fact table. Must equal the oracle's full
    recompute over all orders.

    Scale shape: this is the algebraic-aggregate contract that makes
    incremental view maintenance work at 100 TB — count/sum/max are
    mergeable, so refreshing the view costs O(|delta| + |affected keys|),
    not a corpus re-scan. The decimal sum keeps the merge bit-exact in any
    merge order (same recipe as the roundtrip queries)."""
    import os
    import tempfile

    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    base = o.filter(F.col("o_orderkey") % 10 != 0)
    delta = o.filter(F.col("o_orderkey") % 10 == 0)

    def partial(df):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("total_dec"),
            F.max("o_totalprice").alias("max_price"),
        )

    store = os.path.join(tempfile.mkdtemp(prefix="quackio_mv_"), "agg_base")
    partial(base).write.mode("overwrite").parquet(store)
    stored = spark.read.parquet(store)
    return (
        stored.unionByName(partial(delta))
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("total_dec").cast("double").alias("total_spend"),
            F.max("max_price").alias("max_price"),
        )
    )


# ------------------------------------ Fellegi-Sunter linkage weights

_FS_FIELDS = ("o_orderpriority", "o_orderstatus", "order_month")


def _fs_field_sql(f: str) -> str:
    return f"""
    SELECT '{f}' AS field, st.n_pairs,
      st.agree_{f} AS n_agree,
      fu_{f}.u_num, fu_{f}.u_den,
      CAST(round(log2(
          ((st.agree_{f} + 0.5) / (st.n_pairs + 1.0))
          / (CAST(fu_{f}.u_num AS DOUBLE) / fu_{f}.u_den)) * 1e6) AS BIGINT)
        AS w_agree_e6,
      CAST(round(log2(
          ((st.n_pairs - st.agree_{f} + 0.5) / (st.n_pairs + 1.0))
          / (1.0 - CAST(fu_{f}.u_num AS DOUBLE) / fu_{f}.u_den)) * 1e6)
        AS BIGINT) AS w_disagree_e6
    FROM st CROSS JOIN fu_{f}"""


_FS_PRELUDE_SQL = f"""ofld AS (
      SELECT o_orderkey, o_orderpriority, o_orderstatus,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month
      FROM orders
    ),
    cand AS (
      SELECT a.o_orderkey AS ka, b.o_orderkey AS kb
      FROM orders a JOIN orders b
        ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
       AND abs(a.o_totalprice - b.o_totalprice) <= {DUP_INV_PRICE_TOL}
       AND abs(datediff('day', a.o_orderdate, b.o_orderdate))
           <= {DUP_INV_DAY_TOL}
    ),
    st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        {", ".join(
          f"CAST(COALESCE(SUM(CASE WHEN oa.{f} = ob.{f} THEN 1 ELSE 0 END), 0)"
          f" AS BIGINT) AS agree_{f}" for f in _FS_FIELDS)}
      FROM cand
      JOIN ofld oa ON oa.o_orderkey = cand.ka
      JOIN ofld ob ON ob.o_orderkey = cand.kb
    ),
    {",".join(
      f'''fu_{f} AS (
      SELECT CAST(SUM(nv * nv) AS BIGINT) AS u_num,
        CAST(SUM(nv) * SUM(nv) AS BIGINT) AS u_den
      FROM (SELECT COUNT(*) AS nv FROM ofld GROUP BY {f})
    )''' for f in _FS_FIELDS)},
    fsw AS (
      {" UNION ALL ".join(_fs_field_sql(f) for f in _FS_FIELDS)}
    )"""


@query(
    "linkage_fellegi_sunter_weights",
    oracle=f"""
    WITH {_FS_PRELUDE_SQL}
    SELECT field, n_pairs, n_agree, u_num, u_den, w_agree_e6, w_disagree_e6
    FROM fsw
    """,
)
def linkage_fellegi_sunter_weights(spark, sf_dir):
    """Fellegi-Sunter record-linkage field weights (the Splink/probabilistic
    record-linkage core): for each comparison field, the agreement
    log-odds a pair scores when the field matches (w_agree = log2(m/u))
    and when it doesn't (w_disagree) — m estimated from the banded
    duplicate-invoice candidate pairs (add-half smoothed so no weight is
    ever infinite), u from the field's random-agreement probability
    sum(n_v^2)/N^2 (the classical frequency-based u). Pair scoring is then
    one broadcast of this 3-row table.

    Scale shape: candidates come from the blocked band join (never an
    unblocked self-join); field agreement is one aggregate over the
    candidate pairs; the u probabilities are per-field value histograms
    emitted as EXACT integer fractions (u_num/u_den), with only the final
    log2 weights rounded once to micro-units."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.to_date("o_orderdate").alias("d"),
    )
    pairs = banded_duplicate_pairs(
        o, DUP_INV_PRICE_TOL, DUP_INV_DAY_TOL, _DUP_INV_BAND
    ).select("orderkey_a", "orderkey_b")
    full = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderstatus",
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
    )
    oa = full.select(
        F.col("o_orderkey").alias("orderkey_a"),
        *[F.col(f).alias(f"a_{f}") for f in _FS_FIELDS],
    )
    ob = full.select(
        F.col("o_orderkey").alias("orderkey_b"),
        *[F.col(f).alias(f"b_{f}") for f in _FS_FIELDS],
    )
    # Round-12 (guide §7.3 driver cost, the FS-EM/F.expr recipe): the
    # aggregate list and the per-field weight rows parse from SQL strings
    # — one py4j round-trip per column instead of ~25 Column-method calls
    # each (FS-weights builder: 3151 -> ~800 calls; pinned in
    # tests/test_driver_cost.py). Literals that the Column form created
    # as Python-float doubles carry an explicit D suffix (0.5D, 1.0D) so
    # the SQL text types them DOUBLE too, never DECIMAL — the arithmetic
    # tree and results are bit-identical (oracle hash gate + 7-part
    # re-run green).
    st = (
        pairs.join(oa, "orderkey_a")
        .join(ob, "orderkey_b")
        .agg(
            F.expr("CAST(count(1) AS BIGINT) AS n_pairs"),
            *[
                F.expr(
                    f"CAST(coalesce(SUM(CAST((a_{f} = b_{f}) AS INT)), 0)"
                    f" AS BIGINT) AS agree_{f}"
                )
                for f in _FS_FIELDS
            ],
        )
    )
    out = None
    for f in _FS_FIELDS:
        fu = (
            full.groupBy(f)
            .agg(F.count(F.lit(1)).alias("nv"))
            .agg(
                F.expr("CAST(SUM(nv * nv) AS BIGINT) AS u_num"),
                F.expr("CAST(SUM(nv) * SUM(nv) AS BIGINT) AS u_den"),
            )
        )
        u_sql = "CAST(u_num AS DOUBLE) / u_den"
        m_sql = f"((agree_{f} + 0.5D) / (n_pairs + 1.0D))"
        md_sql = f"((n_pairs - agree_{f} + 0.5D) / (n_pairs + 1.0D))"
        row = st.crossJoin(F.broadcast(fu)).selectExpr(
            f"'{f}' AS field",
            "n_pairs",
            f"agree_{f} AS n_agree",
            "u_num",
            "u_den",
            f"CAST(round(log2({m_sql} / ({u_sql})) * 1E6) AS BIGINT)"
            " AS w_agree_e6",
            f"CAST(round(log2({md_sql} / (1.0D - {u_sql})) * 1E6) AS BIGINT)"
            " AS w_disagree_e6",
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------- entity resolution via FS scores


@query(
    "linkage_entity_clusters",
    oracle=f"""
    WITH RECURSIVE {_FS_PRELUDE_SQL},
    scored AS (
      SELECT cand.ka, cand.kb,
        {" + ".join(
          f"(SELECT CASE WHEN oa.{f} = ob.{f} THEN w_agree_e6"
          f" ELSE w_disagree_e6 END FROM fsw WHERE field = '{f}')"
          for f in _FS_FIELDS)} AS score_e6
      FROM cand
      JOIN ofld oa ON oa.o_orderkey = cand.ka
      JOIN ofld ob ON ob.o_orderkey = cand.kb
    ),
    match_edges AS (SELECT ka, kb FROM scored WHERE score_e6 > 0),
    nodes AS (
      SELECT DISTINCT id FROM (
        SELECT ka AS id FROM match_edges
        UNION ALL SELECT kb FROM match_edges
      )
    ),
    sym AS (
      SELECT ka AS a, kb AS b FROM match_edges
      UNION ALL SELECT kb, ka FROM match_edges
    ),
    walk(id, label) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT sym.a, w.label FROM walk w JOIN sym ON sym.b = w.id
    ),
    comp AS (SELECT id, MIN(label) AS entity FROM walk GROUP BY id)
    SELECT entity, CAST(COUNT(*) AS BIGINT) AS n_records
    FROM comp GROUP BY entity
    """,
)
def linkage_entity_clusters(spark, sf_dir):
    """Entity resolution end-to-end: the Fellegi-Sunter field weights score
    every blocked candidate pair (sum of per-field agree/disagree
    log-odds, exact micro-units); pairs with net-positive evidence become
    match edges; connected components over those edges collapse records
    into ENTITIES (the transitive-closure step every dedupe-the-CRM
    pipeline ends with — A~B and B~C must land in one entity even when
    A and C never met in a block). One row per entity with its record
    count.

    Scale shape: candidates from the banded block join, a broadcast 3-row
    weight table for scoring, then the checkpointed large-star/small-star
    component loop (O(log^2 n) rounds) — the same machinery as
    dedup_clusters, on record keys instead of doc ids. The oracle runs
    the identical closure as a recursive CTE, so multi-hop merges are
    value-checked, not assumed."""
    from .cluster import connected_components

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.to_date("o_orderdate").alias("d"),
    )
    pairs = banded_duplicate_pairs(
        o, DUP_INV_PRICE_TOL, DUP_INV_DAY_TOL, _DUP_INV_BAND
    ).select(
        F.col("orderkey_a").alias("ka"), F.col("orderkey_b").alias("kb")
    )
    w = F.broadcast(linkage_fellegi_sunter_weights(spark, sf_dir))
    full = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderstatus",
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
    )
    oa = full.select(
        F.col("o_orderkey").alias("ka"),
        *[F.col(f).alias(f"a_{f}") for f in _FS_FIELDS],
    )
    ob = full.select(
        F.col("o_orderkey").alias("kb"),
        *[F.col(f).alias(f"b_{f}") for f in _FS_FIELDS],
    )
    j = pairs.join(oa, "ka").join(ob, "kb")
    # round-12: the per-field CASE sum parses from one SQL string (the
    # FS-EM/F.expr builder-chatter recipe; integer terms, order exact).
    for f in _FS_FIELDS:
        wf = w.filter(F.col("field") == f).selectExpr(
            f"w_agree_e6 AS wa_{f}", f"w_disagree_e6 AS wd_{f}"
        )
        j = j.crossJoin(F.broadcast(wf))
    score_sql = " + ".join(
        f"(CASE WHEN a_{f} = b_{f} THEN wa_{f} ELSE wd_{f} END)"
        for f in _FS_FIELDS
    )
    edges = (
        j.selectExpr("ka", "kb", f"{score_sql} AS score_e6")
        .filter(F.col("score_e6") > 0)
        .select("ka", "kb")
        .persist()
    )
    nodes = (
        edges.select(F.col("ka").alias("id"))
        .unionAll(edges.select(F.col("kb").alias("id")))
        .distinct()
    )
    comp = connected_components(nodes, edges, id_col="id", src="ka", dst="kb")
    return comp.groupBy(F.col("cluster").alias("entity")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_records")
    )


# --------------------------------------- FS EM refinement (one round)

_EM_DSUM = "CAST(SUM(CAST(round({x}, 12) AS DECIMAL(38,12))) AS DOUBLE)"


@query(
    "linkage_fs_em_refinement",
    oracle=f"""
    WITH {_FS_PRELUDE_SQL},
    pat AS (
      SELECT {", ".join(
        f"CASE WHEN oa.{f} = ob.{f} THEN 1 ELSE 0 END AS g_{f}"
        for f in _FS_FIELDS)},
        CAST(COUNT(*) AS BIGINT) AS n
      FROM cand
      JOIN ofld oa ON oa.o_orderkey = cand.ka
      JOIN ofld ob ON ob.o_orderkey = cand.kb
      GROUP BY {", ".join(f"g_{f}" for f in _FS_FIELDS)}
    ),
    init AS (
      SELECT {", ".join(
        f"(st.agree_{f} + 0.5) / (st.n_pairs + 1.0) AS m_{f}, "
        f"CAST(fu_{f}.u_num AS DOUBLE) / fu_{f}.u_den AS u_{f}"
        for f in _FS_FIELDS)}
      FROM st {" ".join(f"CROSS JOIN fu_{f}" for f in _FS_FIELDS)}
    ),
    ew AS (
      SELECT pat.*, round(
        0.5 * {" * ".join(
          f"(CASE WHEN g_{f} = 1 THEN m_{f} ELSE 1 - m_{f} END)"
          for f in _FS_FIELDS)}
        / (0.5 * {" * ".join(
          f"(CASE WHEN g_{f} = 1 THEN m_{f} ELSE 1 - m_{f} END)"
          for f in _FS_FIELDS)}
         + 0.5 * {" * ".join(
          f"(CASE WHEN g_{f} = 1 THEN u_{f} ELSE 1 - u_{f} END)"
          for f in _FS_FIELDS)}), 12) AS w
      FROM pat CROSS JOIN init
    ),
    msums AS (
      SELECT {_EM_DSUM.format(x='n * w')} AS sw,
        {_EM_DSUM.format(x='n * (1 - w)')} AS su,
        CAST(SUM(n) AS BIGINT) AS ntot,
        {", ".join(
          f"{_EM_DSUM.format(x=f'n * w * g_{f}')} AS swg_{f}, "
          f"{_EM_DSUM.format(x=f'n * (1 - w) * g_{f}')} AS sug_{f}"
          for f in _FS_FIELDS)}
      FROM ew
    )
    {" UNION ALL ".join(
      f'''SELECT '{f}' AS field,
      CAST(round(init.m_{f} * 1e8) AS BIGINT) AS m0_e8,
      CAST(round(msums.swg_{f} / msums.sw * 1e8) AS BIGINT) AS m1_e8,
      CAST(round(init.u_{f} * 1e8) AS BIGINT) AS u0_e8,
      CAST(round(msums.sug_{f} / msums.su * 1e8) AS BIGINT) AS u1_e8,
      CAST(round(msums.sw / msums.ntot * 1e8) AS BIGINT) AS lambda1_e8
    FROM msums CROSS JOIN init''' for f in _FS_FIELDS)}
    """,
)
def linkage_fs_em_refinement(spark, sf_dir):
    """One EM round of the Fellegi-Sunter m/u/lambda parameters over the
    candidate pairs' comparison-vector histogram (<= 2^3 patterns): the
    E-step scores each agreement pattern's match posterior under the
    frequency-initialized parameters, the M-step re-estimates m_f, u_f and
    the match prevalence lambda from the posterior-weighted pattern
    counts — the unsupervised refinement Splink/classical record linkage
    runs until convergence (one round here keeps the oracle a finite
    expression; further rounds repeat the same bounded arithmetic).
    Estimated over the BLOCKED candidate space, so u-parameters are
    conditional on blocking — the documented caveat of every blocked EM.

    Scale shape: the only corpus-sized work is the one candidate-pair
    aggregate building the <= 8-row pattern histogram; the entire EM is
    arithmetic on that bounded table (decimal-exact weighted sums, 12-dp
    posterior rounding, micro-unit integer outputs — libm-free, so every
    value is bit-identical across engines)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.to_date("o_orderdate").alias("d"),
    )
    pairs = banded_duplicate_pairs(
        o, DUP_INV_PRICE_TOL, DUP_INV_DAY_TOL, _DUP_INV_BAND
    ).select(
        F.col("orderkey_a").alias("ka"), F.col("orderkey_b").alias("kb")
    )
    full = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderstatus",
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
    )
    oa = full.select(
        F.col("o_orderkey").alias("ka"),
        *[F.col(f).alias(f"a_{f}") for f in _FS_FIELDS],
    )
    ob = full.select(
        F.col("o_orderkey").alias("kb"),
        *[F.col(f).alias(f"b_{f}") for f in _FS_FIELDS],
    )
    # Round-11: the pattern histogram is the ONLY candidate-pair
    # aggregate; the agreement stats st are an exact integer rollup of it
    # (n_pairs = sum(n), agree_f = sum(n * g_f) — g_f is the same 0/1
    # indicator st used to re-sum over every pair), so the pair join is
    # built and scanned exactly once and needs no persist.
    j = pairs.join(oa, "ka").join(ob, "kb")
    pat = (
        j
        .groupBy(
            *[
                (F.col(f"a_{f}") == F.col(f"b_{f}"))
                .cast("int")
                .alias(f"g_{f}")
                for f in _FS_FIELDS
            ]
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    st = pat.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_pairs"),
        *[
            F.coalesce(F.sum(F.col("n") * F.col(f"g_{f}")), F.lit(0))
            .cast("bigint")
            .alias(f"agree_{f}")
            for f in _FS_FIELDS
        ],
    )
    init = st
    for f in _FS_FIELDS:
        fu = (
            full.groupBy(f)
            .agg(F.count(F.lit(1)).alias("nv"))
            .agg(
                F.sum(F.col("nv") * F.col("nv")).cast("bigint").alias(f"un_{f}"),
                (F.sum("nv") * F.sum("nv")).cast("bigint").alias(f"ud_{f}"),
            )
        )
        init = init.crossJoin(F.broadcast(fu))
    init = init.select(
        *[
            ((F.col(f"agree_{f}") + 0.5) / (F.col("n_pairs") + 1.0)).alias(f"m_{f}")
            for f in _FS_FIELDS
        ],
        *[
            (F.col(f"un_{f}").cast("double") / F.col(f"ud_{f}")).alias(f"u_{f}")
            for f in _FS_FIELDS
        ],
    ).persist()  # 1 row, read by ew and all three output branches

    def prod(pfx):
        out = F.lit(0.5)
        for f in _FS_FIELDS:
            term = F.when(
                F.col(f"g_{f}") == 1, F.col(f"{pfx}_{f}")
            ).otherwise(F.lit(1.0) - F.col(f"{pfx}_{f}"))
            out = out * term
        return out

    ew = pat.crossJoin(F.broadcast(init)).withColumn(
        "w", F.round(prod("m") / (prod("m") + prod("u")), 12)
    )
    DEC = "decimal(38,12)"

    def dsum(x):
        return F.sum(F.round(x, 12).cast(DEC)).cast("double")

    msums = ew.agg(
        dsum(F.col("n") * F.col("w")).alias("sw"),
        dsum(F.col("n") * (1 - F.col("w"))).alias("su"),
        F.sum("n").cast("bigint").alias("ntot"),
        *[
            x
            for f in _FS_FIELDS
            for x in (
                dsum(F.col("n") * F.col("w") * F.col(f"g_{f}")).alias(f"swg_{f}"),
                dsum(
                    F.col("n") * (1 - F.col("w")) * F.col(f"g_{f}")
                ).alias(f"sug_{f}"),
            )
        ],
    )
    # 1 row; the three per-field output selects would otherwise re-run
    # the whole candidate pipeline each
    base = msums.crossJoin(F.broadcast(init)).persist()
    out = None
    for f in _FS_FIELDS:
        row = base.select(
            F.lit(f).alias("field"),
            F.round(F.col(f"m_{f}") * 1e8).cast("bigint").alias("m0_e8"),
            F.round(F.col(f"swg_{f}") / F.col("sw") * 1e8)
            .cast("bigint")
            .alias("m1_e8"),
            F.round(F.col(f"u_{f}") * 1e8).cast("bigint").alias("u0_e8"),
            F.round(F.col(f"sug_{f}") / F.col("su") * 1e8)
            .cast("bigint")
            .alias("u1_e8"),
            F.round(F.col("sw") / F.col("ntot") * 1e8)
            .cast("bigint")
            .alias("lambda1_e8"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------- FS EM multi-round convergence

_EM_ROUNDS = 3
_EM_W_SCALE = 1_000_000_000  # posterior w quantizer (1e-9 resolution)


def _fs_em_oracle() -> str:
    """Unrolled 3-round EM CTE chain. Determinism posture (same as the
    round-7 PCA rebuild): every parameter and posterior is floor-quantized
    to integer micro-units between steps (m/u/lambda at 1e-8, posterior w
    at 1e-9), every sum is over exact integers, and each double-valued op
    is a single correctly-rounded IEEE expression on identical inputs — no
    round(double, N) anywhere, so the recursion cannot drift cross-engine
    at any scale factor."""
    fields = _FS_FIELDS
    pat = f"""
    pat AS MATERIALIZED (
      SELECT {", ".join(
        f"CASE WHEN oa.{f} = ob.{f} THEN 1 ELSE 0 END AS g_{f}"
        for f in fields)},
        CAST(COUNT(*) AS BIGINT) AS n
      FROM cand
      JOIN ofld oa ON oa.o_orderkey = cand.ka
      JOIN ofld ob ON ob.o_orderkey = cand.kb
      GROUP BY {", ".join(f"g_{f}" for f in fields)}
    ),
    p0 AS MATERIALIZED (
      SELECT {", ".join(
        f"CAST(floor((st.agree_{f} + 0.5) / (st.n_pairs + 1.0) * 1e8) AS BIGINT) AS m_{f}, "
        f"CAST(floor(CAST(fu_{f}.u_num AS DOUBLE) / fu_{f}.u_den * 1e8) AS BIGINT) AS u_{f}"
        for f in fields)},
        CAST(50000000 AS BIGINT) AS lam
      FROM st {" ".join(f"CROSS JOIN fu_{f}" for f in fields)}
    )"""
    rounds = []
    for r in range(1, _EM_ROUNDS + 1):
        p = f"p{r - 1}"
        prod_m = " * ".join(
            f"(CASE WHEN g_{f} = 1 THEN {p}.m_{f} / 1e8"
            f" ELSE 1 - {p}.m_{f} / 1e8 END)"
            for f in fields
        )
        prod_u = " * ".join(
            f"(CASE WHEN g_{f} = 1 THEN {p}.u_{f} / 1e8"
            f" ELSE 1 - {p}.u_{f} / 1e8 END)"
            for f in fields
        )
        rounds.append(f"""
    ew{r} AS (
      SELECT pat.*, CAST(floor(
        ({p}.lam / 1e8 * {prod_m})
        / ({p}.lam / 1e8 * {prod_m} + (1 - {p}.lam / 1e8) * {prod_u})
        * {_EM_W_SCALE}) AS BIGINT) AS w
      FROM pat CROSS JOIN {p}
    ),
    s{r} AS (
      SELECT CAST(SUM(n * w) AS BIGINT) AS sw,
        CAST(SUM(n * ({_EM_W_SCALE} - w)) AS BIGINT) AS su,
        CAST(SUM(n) AS BIGINT) AS ntot,
        {", ".join(
          f"CAST(SUM(n * w * g_{f}) AS BIGINT) AS swg_{f}, "
          f"CAST(SUM(n * ({_EM_W_SCALE} - w) * g_{f}) AS BIGINT) AS sug_{f}"
          for f in fields)}
      FROM ew{r}
    ),
    p{r} AS MATERIALIZED (
      SELECT {", ".join(
        f"CAST(floor(CAST(swg_{f} AS DOUBLE) / CAST(sw AS DOUBLE) * 1e8) AS BIGINT) AS m_{f}, "
        f"CAST(floor(CAST(sug_{f} AS DOUBLE) / CAST(su AS DOUBLE) * 1e8) AS BIGINT) AS u_{f}"
        for f in fields)},
        CAST(floor(CAST(sw AS DOUBLE) / {_EM_W_SCALE} / CAST(ntot AS DOUBLE) * 1e8) AS BIGINT) AS lam
      FROM s{r}
    )""")
    last = _EM_ROUNDS
    finals = " UNION ALL ".join(
        f"""SELECT '{f}' AS field,
      p{last}.m_{f} AS m_final_e8, p{last}.u_{f} AS u_final_e8,
      p1.lam AS lambda1_e8, p2.lam AS lambda2_e8, p{last}.lam AS lambda3_e8
    FROM p{last} CROSS JOIN p1 CROSS JOIN p2"""
        for f in fields
    )
    return (
        "WITH "
        + _FS_PRELUDE_SQL
        + ","
        + pat
        + ","
        + ",".join(rounds)
        + "\n    "
        + finals
    )


@query("linkage_fs_em_converged", oracle=_fs_em_oracle())
def linkage_fs_em_converged(spark, sf_dir):
    """Three EM rounds of the Fellegi-Sunter m/u/lambda parameters over the
    blocked candidate pairs' comparison-vector histogram — the multi-round
    convergence run the one-round linkage_fs_em_refinement previews
    (SURVEY round-7 item): each E-step scores every agreement pattern's
    match posterior under the CURRENT parameters (including the evolving
    prevalence lambda, unlike the fixed-0.5 single-round demo), each
    M-step re-estimates m_f / u_f / lambda from posterior-weighted pattern
    counts. Output: final per-field m/u plus lambda after every round —
    the per-round prevalence trajectory IS the convergence evidence
    (successive deltas shrink).

    Determinism: parameters are floor-quantized BIGINT micro-units (1e-8)
    between rounds and posteriors BIGINT 1e-9 units, so all sums are exact
    integers and the recursion is bit-identical across engines at any SF
    (the round-7 PCA posture — no round(double, N) inside the iteration).
    Posterior sums stay under int64 up to ~9e9 candidate pairs.

    Scale shape: ONE corpus-sized aggregate (the <= 2^3-row pattern
    histogram, persisted); all three EM rounds are arithmetic on that
    bounded table with 1-row parameter frames localCheckpointed per round
    (the fs-em lineage-collapse lesson — left lazy, each round re-embeds
    every prior round's plan)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.to_date("o_orderdate").alias("d"),
    )
    pairs = banded_duplicate_pairs(
        o, DUP_INV_PRICE_TOL, DUP_INV_DAY_TOL, _DUP_INV_BAND
    ).select(
        F.col("orderkey_a").alias("ka"), F.col("orderkey_b").alias("kb")
    )
    full = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderstatus",
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
    )
    oa = full.select(
        F.col("o_orderkey").alias("ka"),
        *[F.col(f).alias(f"a_{f}") for f in _FS_FIELDS],
    )
    ob = full.select(
        F.col("o_orderkey").alias("kb"),
        *[F.col(f).alias(f"b_{f}") for f in _FS_FIELDS],
    )
    j = pairs.join(oa, "ka").join(ob, "kb")
    pat = (
        j.groupBy(
            *[
                (F.col(f"a_{f}") == F.col(f"b_{f}")).cast("int").alias(f"g_{f}")
                for f in _FS_FIELDS
            ]
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .persist()
    )
    # Round-11: st rolls up from the persisted pattern histogram (exact
    # integer identity: n_pairs = sum(n), agree_f = sum(n * g_f)) instead
    # of re-running the whole pair join a second time.
    st = pat.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_pairs"),
        *[
            F.coalesce(F.sum(F.col("n") * F.col(f"g_{f}")), F.lit(0))
            .cast("bigint")
            .alias(f"agree_{f}")
            for f in _FS_FIELDS
        ],
    )
    init = st
    for f in _FS_FIELDS:
        fu = (
            full.groupBy(f)
            .agg(F.count(F.lit(1)).alias("nv"))
            .agg(
                F.sum(F.col("nv") * F.col("nv")).cast("bigint").alias(f"un_{f}"),
                (F.sum("nv") * F.sum("nv")).cast("bigint").alias(f"ud_{f}"),
            )
        )
        init = init.crossJoin(F.broadcast(fu))
    params = init.select(
        *[
            x
            for f in _FS_FIELDS
            for x in (
                F.floor(
                    (F.col(f"agree_{f}") + 0.5)
                    / (F.col("n_pairs") + 1.0)
                    * F.lit(1e8)
                )
                .cast("bigint")
                .alias(f"m_{f}"),
                F.floor(
                    F.col(f"un_{f}").cast("double")
                    / F.col(f"ud_{f}")
                    * F.lit(1e8)
                )
                .cast("bigint")
                .alias(f"u_{f}"),
            )
        ],
        F.lit(50000000).cast("bigint").alias("lam"),
    )
    params = _truncate_lineage(params)

    # The round's EM arithmetic builds as SQL STRINGS (one F.expr py4j
    # round-trip per column) instead of per-operator Column composition:
    # the loop was ~9.8k py4j round-trips / ~2.5 s of pure driver chatter
    # per build, and the bench times the builder (round-11 guide §7.3
    # driver-side cost). The strings are the ORACLE's own expression text,
    # so association is preserved verbatim — SQL parses
    # `lam / 1e8 * (t1) * (t2) * (t3)` left-to-right, (((lam*t1)*t2)*t3),
    # exactly the fold the Column form built (FP multiplication is
    # non-associative; a regrouping can differ by one ulp on boundary
    # patterns and flip the floor-quantized w — ADVICE r7). Exponent
    # literals (1E8, 1E9) parse as DOUBLE, matching the old F.lit(1e8)
    # (a dotted literal like 100000000.0 would parse as DECIMAL).
    def _prod_sql(pfx: str, init_sql: str) -> str:
        out = init_sql
        for f in _FS_FIELDS:
            out += (
                f" * (CASE WHEN g_{f} = 1 THEN {pfx}_{f} / 1E8"
                f" ELSE 1.0 - {pfx}_{f} / 1E8 END)"
            )
        return out

    _W = "1E9"
    assert float(_W.replace("E", "e")) == float(_EM_W_SCALE)
    lam_by_round = {}
    for r in range(1, _EM_ROUNDS + 1):
        ew = pat.crossJoin(F.broadcast(params))
        num = _prod_sql("m", "lam / 1E8")
        den = _prod_sql("u", "(1.0 - lam / 1E8)")
        ew = ew.withColumn(
            "w",
            F.expr(
                f"CAST(FLOOR(({num}) / (({num}) + ({den})) * {_W}) AS BIGINT)"
            ),
        )
        s = ew.agg(
            F.expr("CAST(SUM(n * w) AS BIGINT) AS sw"),
            F.expr(f"CAST(SUM(n * ({_EM_W_SCALE} - w)) AS BIGINT) AS su"),
            F.expr("CAST(SUM(n) AS BIGINT) AS ntot"),
            *[
                F.expr(x)
                for f in _FS_FIELDS
                for x in (
                    f"CAST(SUM(n * w * g_{f}) AS BIGINT) AS swg_{f}",
                    f"CAST(SUM(n * ({_EM_W_SCALE} - w) * g_{f}) AS BIGINT)"
                    f" AS sug_{f}",
                )
            ],
        )
        params = s.select(
            *[
                F.expr(x)
                for f in _FS_FIELDS
                for x in (
                    f"CAST(FLOOR(CAST(swg_{f} AS DOUBLE) / CAST(sw AS DOUBLE)"
                    f" * 1E8) AS BIGINT) AS m_{f}",
                    f"CAST(FLOOR(CAST(sug_{f} AS DOUBLE) / CAST(su AS DOUBLE)"
                    f" * 1E8) AS BIGINT) AS u_{f}",
                )
            ],
            F.expr(
                f"CAST(FLOOR(CAST(sw AS DOUBLE) / {_W}"
                " / CAST(ntot AS DOUBLE) * 1E8) AS BIGINT) AS lam"
            ),
        )
        params = _truncate_lineage(params)
        lam_by_round[r] = params.select(F.col("lam").alias(f"lambda{r}_e8"))

    out = None
    for f in _FS_FIELDS:
        row = (
            params.select(
                F.lit(f).alias("field"),
                F.col(f"m_{f}").alias("m_final_e8"),
                F.col(f"u_{f}").alias("u_final_e8"),
            )
            .crossJoin(F.broadcast(lam_by_round[1]))
            .crossJoin(F.broadcast(lam_by_round[2]))
            .crossJoin(F.broadcast(lam_by_round[3]))
        )
        out = row if out is None else out.unionByName(row)
    return out
