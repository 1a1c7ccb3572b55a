"""Upsert (MERGE INTO) as a composition of DataFrame ops.

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
