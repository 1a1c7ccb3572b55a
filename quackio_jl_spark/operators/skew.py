"""Skew-resistant join: salting for hot keys.

Beyond-reference scale tooling (single-process DuckDB has no shuffle,
so the reference has no skew problem to solve — SURVEY.md §3).
A shuffled equi-join sends every row of key k to one reducer. At 100 TB a
hot key (the empty-string document, the null user, the one viral item) can
put 100 GB on a single task — the job runs at the speed of that straggler
or OOMs. Two mitigations, both shipped here:

1. **AQE skew-join splitting** (on by default in session.py): Spark splits
   oversized shuffle blocks at runtime and replicates the matching side.
   Zero code, works for sort-merge joins; the first thing to rely on.
2. **Explicit salting** (this module): when AQE can't help (broadcast-less
   joins feeding further stages, deterministic plan requirements, engines
   without AQE), spray each big-side row into one of ``n_salts`` sub-keys
   and replicate the small side once per salt. The hot key's reducer
   becomes ``n_salts`` even reducers; the join result is IDENTICAL.

The salt must vary WITHIN a key's rows (else it renames the problem);
``spark_partition_id() % n_salts`` is deterministic, free, and spreads a
hot key over as many salts as it has input partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["salted_join"]

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column(s) ``on``, skew-protected.

    Semantics match ``big.join(small, on, how)`` for ``inner`` and ``left``
    joins (the salt spreads big-side rows; every salt sees the full small
    side, so no match is lost and none duplicates — each big row joins
    exactly the small rows of its key, once).

    Cost model: small side is written ``n_salts``× into the shuffle
    (acceptable when |small| << |big|, the situation where skew hurts);
    big side shuffles once on (key, salt)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    big_s = big.withColumn(_SALT, F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(_SALT)
    small_s = small.select("*", salts)
    out = big_s.join(small_s, keys + [_SALT], how)
    return out.drop(_SALT)


from ..plans.registry import query, table  # noqa: E402
from ..functions.exact import dsum  # noqa: E402

_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(28,6))) AS DOUBLE)"


@query(
    "salted_join_user_spend",
    oracle=f"""
    WITH spend AS (
      SELECT user_id, {_DSUM.format(x='value')} AS total_spend
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, s.total_spend
    FROM events e JOIN spend s ON s.user_id = e.user_id
    WHERE e.event_type = 'click'
    """,
)
def salted_join_user_spend(spark, sf_dir):
    """Every click annotated with the user's total purchase spend, joined
    THROUGH salted_join — the oracle is the plain SQL join, so the gate
    proves salting is semantics-preserving while the big side's hot keys
    spread over 16 sub-keys."""
    e = table(spark, sf_dir, "events")
    spend = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(dsum("value").alias("total_spend"))
    )
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id")
    return salted_join(clicks, spend, "user_id", n_salts=16).select(
        "event_id", "user_id", "total_spend"
    )


SKEW_TOP_KEYS = 20


@query(
    "key_skew_report",
    oracle=f"""
    WITH kc AS MATERIALIZED (
      SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    ),
    tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(cnt) AS DOUBLE) / count(*) AS avg_cnt
      FROM kc
    )
    SELECT user_id, cnt,
      round(cnt / avg_cnt, 8) AS skew_ratio,
      round(100.0 * cnt / total, 8) AS pct_of_total,
      n_keys, CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT user_id, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rnk
      FROM kc) r CROSS JOIN tot
    WHERE rnk <= {SKEW_TOP_KEYS}
    """,
)
def key_skew_report(spark, sf_dir):
    """Join/agg-key skew diagnostics: the top heavy-hitter keys with their
    share of all rows and ratio to the mean key frequency — the report you
    run BEFORE picking a join strategy at 100 TB (skew_ratio >> 1 on the
    planned key means salting / AQE skew-join, see salted_join). One
    partial-aggregated count by key; the heavy-hitter ranking happens on
    the already-aggregated key table (keys, not rows) and the 1-row
    totals attach by broadcast."""
    e = table(spark, sf_dir, "events")
    kc = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    tot = kc.agg(
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        (F.sum("cnt").cast("double") / F.count(F.lit(1))).alias("avg_cnt"),
    )
    wr = W.orderBy(F.col("cnt").desc(), "user_id")
    return (
        kc.select("user_id", "cnt", F.row_number().over(wr).alias("rnk"))
        .filter(F.col("rnk") <= SKEW_TOP_KEYS)
        .crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "cnt",
            F.round(F.col("cnt") / F.col("avg_cnt"), 8).alias("skew_ratio"),
            F.round(F.lit(100.0) * F.col("cnt") / F.col("total"), 8).alias(
                "pct_of_total"
            ),
            "n_keys",
            "rnk",
        )
    )


# --------------------------------------------- salting plan

SALT_TARGET_ROWS_PER_TASK = 50  # demo-scale; set to rows-per-reducer (1e6+) on a cluster


@query(
    "skew_salt_plan",
    oracle=f"""
    WITH kc AS MATERIALIZED (
      SELECT user_id, count(*)::BIGINT AS cnt FROM events GROUP BY user_id
    ),
    med AS (
      SELECT median(cnt) AS med_cnt, COUNT(*)::BIGINT AS n_keys FROM kc
    )
    SELECT user_id, cnt,
      CAST(ceil(cnt / {SALT_TARGET_ROWS_PER_TASK}.0) AS BIGINT)
        AS salt_factor,
      round(cnt / CAST(ceil(cnt / {SALT_TARGET_ROWS_PER_TASK}.0) AS DOUBLE),
        4) AS rows_per_salted_key,
      round(cnt / med_cnt, 8) AS skew_vs_median
    FROM kc CROSS JOIN med
    WHERE cnt > {SALT_TARGET_ROWS_PER_TASK}
    """,
)
def skew_salt_plan(spark, sf_dir):
    """Actionable salting plan from the key-frequency table: every key
    whose row count exceeds the {SALT_TARGET_ROWS_PER_TASK}-row
    per-task target gets an explicit salt factor ceil(cnt/target) —
    the number you feed to salted_join's salt column (hot key k
    becomes k#0..k#(s-1), the small side replicates s ways). Keys
    under the target keep salt_factor queries out of the plan
    entirely; key_skew_report says WHETHER to salt, this says BY HOW
    MUCH.

    Same single partial-aggregated count-by-key; the exact median key
    frequency (one typed percentile over the key table, not the row
    table) broadcasts as the skew denominator."""
    e = table(spark, sf_dir, "events")
    kc = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    med = F.broadcast(
        kc.agg(
            F.percentile("cnt", 0.5).alias("med_cnt"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        )
    )
    salt = F.ceil(F.col("cnt") / float(SALT_TARGET_ROWS_PER_TASK)).cast(
        "bigint"
    )
    return (
        kc.crossJoin(med)
        .filter(F.col("cnt") > SALT_TARGET_ROWS_PER_TASK)
        .select(
            "user_id",
            "cnt",
            salt.alias("salt_factor"),
            F.round(F.col("cnt") / salt.cast("double"), 4).alias(
                "rows_per_salted_key"
            ),
            F.round(F.col("cnt") / F.col("med_cnt"), 8).alias(
                "skew_vs_median"
            ),
        )
    )
