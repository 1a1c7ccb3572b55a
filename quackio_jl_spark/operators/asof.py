"""As-of join and bucketized range join — operators Spark lacks natively,
built as compositions of existing DataFrame ops (preference (a) from the
build contract; no Pandas UDF needed).

As-of join (union + window fill):
  Tag right rows 0 and left rows 1, union them, sort within each ``by``
  partition on (time, side, tiebreak), and forward-fill the right-side
  payload with last(ignorenulls) over an unbounded-preceding frame. Left
  rows then carry the most recent right row with t_right <= t_left.
  Cost: ONE shuffle on the by-key + a per-partition sort — same complexity
  as a sort-merge join, no range explosion, no per-group pandas. This is
  the at-scale shape (pd.merge_asof per group would bottleneck on the
  largest key).

Range join (bucketize + equi-join):
  |t_a - t_b| <= R becomes an equi-join on bucket = floor(t / R) after
  exploding one side into {bucket-1, bucket, bucket+1}, then an exact
  filter. Shuffle key = (by, bucket): work fans out by time bucket instead
  of concentrating on the by-key alone — the standard trick for interval
  joins at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..plans.registry import query, table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    right_values: list[str],
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_on`` <= ``left_on`` within the same ``by`` group (backward
    as-of; ties at equal time resolve to the right row, matching DuckDB's
    ``ASOF JOIN ... ON l.t >= r.t``). ``direction="forward"`` attaches the
    SMALLEST ``right_on`` >= ``left_on`` instead (DuckDB
    ``ON l.t <= r.t``); same union + window mechanics with the frame
    flipped to (currentRow, unboundedFollowing)."""
    lcols = [c for c in left.columns]
    L = left.select(
        *lcols,
        F.col(left_on).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_values],
    )
    R = right.select(
        *by,
        F.col(right_on).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_values],
    )
    for c in lcols:
        if c not in by:
            R = R.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = L.unionByName(R.select(*L.columns))
    if direction == "backward":
        order = [F.col("_t").asc(), F.col("_side").asc()]
        frame = (W.unboundedPreceding, W.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    elif direction == "forward":
        # left rows sort BEFORE right rows at equal time so an inclusive
        # following frame sees equal-time right rows
        order = [F.col("_t").asc(), F.col("_side").desc()]
        frame = (W.currentRow, W.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if tiebreak:
        order.append(F.col(tiebreak).asc_nulls_first())
    w = W.partitionBy(*by).orderBy(*order).rowsBetween(*frame)
    filled = u.select(
        *[c for c in lcols],
        "_side",
        *[pick(f"_r_{c}").over(w).alias(c) for c in right_values],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


@query(
    "asof_join_purchase_click",
    oracle="""
    SELECT p.event_id, p.user_id, c.event_id AS click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_join_purchase_click(spark, sf_dir):
    """For every purchase, the user's most recent preceding click (NULL if
    none) — oracle-checked against DuckDB's native ASOF LEFT JOIN."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
    )
    res = asof_join(
        purchases,
        clicks,
        by=["user_id"],
        left_on="ts",
        right_on="ts",
        right_values=["click_id"],
        tiebreak="event_id",
    )
    return res.select("event_id", "user_id", "click_id")


@query(
    "range_join_close_events",
    oracle="""
    SELECT a.event_id AS id_a, b.event_id AS id_b
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.event_id <> a.event_id
     AND b.ts >= a.ts
     AND b.ts - a.ts <= INTERVAL 10 MINUTE
     AND (b.ts > a.ts OR b.event_id > a.event_id)
    """,
)
def range_join_close_events(spark, sf_dir):
    """Pairs of same-user events within 10 minutes (a before-or-equal b).
    Implemented as a bucketized equi-join: a explodes into {bucket, bucket+1}
    candidate buckets, the join key is (user_id, bucket), and the exact
    interval predicate filters after — no O(n^2) per user, no
    broadcast-nested-loop."""
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("t")
    )
    r_us = 10 * 60 * 1_000_000
    a = e.select(
        F.col("event_id").alias("id_a"),
        "user_id",
        F.col("t").alias("ta"),
        F.explode(
            F.array(F.floor(F.col("t") / r_us), F.floor(F.col("t") / r_us) + 1)
        ).alias("bucket"),
    )
    b = e.select(
        F.col("event_id").alias("id_b"),
        F.col("user_id").alias("user_b"),
        F.col("t").alias("tb"),
        F.floor(F.col("t") / r_us).alias("bucket_b"),
    )
    return (
        a.join(b, (F.col("user_id") == F.col("user_b")) & (F.col("bucket") == F.col("bucket_b")))
        .filter(
            (F.col("id_b") != F.col("id_a"))
            & (F.col("tb") >= F.col("ta"))
            & (F.col("tb") - F.col("ta") <= r_us)
            & ((F.col("tb") > F.col("ta")) | (F.col("id_b") > F.col("id_a")))
        )
        .select("id_a", "id_b")
    )


@query(
    "asof_join_next_click",
    oracle="""
    SELECT p.event_id, p.user_id, c.event_id AS click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
)
def asof_join_next_click(spark, sf_dir):
    """Forward as-of: for every purchase, the user's NEXT click at-or-after
    it (NULL if none) — the attribution mirror of the backward join,
    oracle-checked against DuckDB's native forward ASOF LEFT JOIN. Same
    single-shuffle union+window plan with the frame flipped."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
    )
    res = asof_join(
        purchases,
        clicks,
        by=["user_id"],
        left_on="ts",
        right_on="ts",
        right_values=["click_id"],
        tiebreak="event_id",
        direction="forward",
    )
    return res.select("event_id", "user_id", "click_id")


@query(
    "asof_join_nearest_click",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    x AS (
      SELECT p.event_id, p.user_id, p.ts,
        (SELECT {'ts': c.ts, 'id': c.event_id} FROM c
          WHERE c.user_id = p.user_id AND c.ts <= p.ts
          ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS b,
        (SELECT {'ts': c.ts, 'id': c.event_id} FROM c
          WHERE c.user_id = p.user_id AND c.ts > p.ts
          ORDER BY c.ts ASC, c.event_id ASC LIMIT 1) AS f
      FROM p
    )
    SELECT event_id, user_id,
      CASE WHEN b IS NULL AND f IS NULL THEN NULL
           WHEN f IS NULL THEN b.id
           WHEN b IS NULL THEN f.id
           WHEN epoch_us(ts) - epoch_us(b.ts) <= epoch_us(f.ts) - epoch_us(ts)
             THEN b.id
           ELSE f.id END AS click_id
    FROM x
    """,
)
def asof_join_nearest_click(spark, sf_dir):
    """Nearest-direction as-of join: each purchase matched to the
    temporally CLOSEST same-user click, before or after (ties prefer the
    preceding click; equal-time clicks count as preceding with the largest
    event_id winning, and equal-distance following picks the smallest).

    Both directions resolve in ONE shuffle + ONE per-partition sort: the
    union stream is sorted once on (t, side, click_id), a
    backward-looking last(ignorenulls) window and a forward-looking
    first(ignorenulls) window each fill their candidate over the same
    sort, and a final map-side CASE picks the closer one. Running the
    backward/forward asof_join twice and joining would cost 3 shuffles;
    this is the at-scale shape. The oracle spells the same semantics with
    per-row scalar subqueries (fine at oracle SF, quadratic at scale —
    which is the point of the windowed plan)."""
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("t_us")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.col("event_id").alias("click_id"),
    )
    u = p.withColumn("click_id", F.lit(None).cast("long")).withColumn(
        "_side", F.lit(1)
    ).unionByName(c.withColumn("_side", F.lit(0)))
    cand = F.when(
        F.col("_side") == 0, F.struct(F.col("t_us").alias("t"), F.col("click_id").alias("id"))
    )
    order = [F.col("t_us").asc(), F.col("_side").asc(), F.col("click_id").asc_nulls_last()]
    wb = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    filled = u.select(
        "event_id",
        "user_id",
        "t_us",
        "_side",
        F.last(cand, ignorenulls=True).over(wb).alias("b"),
        F.first(cand, ignorenulls=True).over(wf).alias("f"),
    ).filter(F.col("_side") == 1)
    b, f, t = F.col("b"), F.col("f"), F.col("t_us")
    click = (
        F.when(b.isNull() & f.isNull(), F.lit(None).cast("long"))
        .when(f.isNull(), b["id"])
        .when(b.isNull(), f["id"])
        .when((t - b["t"]) <= (f["t"] - t), b["id"])
        .otherwise(f["id"])
    )
    return filled.select("event_id", "user_id", click.alias("click_id"))
