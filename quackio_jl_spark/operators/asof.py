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


# -------------------- interval x interval overlap join (binned)

OVERLAP_GAP_US = 48 * 3600 * 1_000_000  # sessionization gap
OVERLAP_BIN_US = 24 * 3600 * 1_000_000  # time-axis bin width


def _typed_sessions(e, etype):
    """Per-user sessions (48 h gap) of one event type -> intervals [s, e]
    in epoch micros. Windows are user-partitioned: parallel across users,
    never a global sort."""
    from pyspark.sql import Window as W

    x = e.filter(F.col("event_type") == etype).select(
        "user_id", F.unix_micros("ts").alias("t"), "event_id"
    )
    wu = W.partitionBy("user_id").orderBy("t", "event_id")
    new_s = (
        F.when(
            F.lag("t").over(wu).isNull()
            | (F.col("t") - F.lag("t").over(wu) > OVERLAP_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("new_s")
    )
    return (
        x.select("user_id", "t", "event_id", new_s)
        .select(
            "user_id",
            "t",
            F.sum("new_s").over(wu.rowsBetween(W.unboundedPreceding, 0)).alias("sid"),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("t").alias("s"), F.max("t").alias("e"))
    )


_SESSION_SQL = """
  SELECT user_id, MIN(t) AS s, MAX(t) AS e FROM (
    SELECT user_id, t,
      SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id) AS sid
    FROM (
      SELECT user_id, epoch_us(ts) AS t, event_id,
        CASE WHEN lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
             OR epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               > {gap} THEN 1 ELSE 0 END AS new_s
      FROM events WHERE event_type = '{etype}'
    )
  ) GROUP BY user_id, sid
"""


@query(
    "interval_overlap_join_binned",
    oracle=f"""
    WITH s1 AS ({_SESSION_SQL.format(gap=OVERLAP_GAP_US, etype="click")}),
    s2 AS ({_SESSION_SQL.format(gap=OVERLAP_GAP_US, etype="error")})
    SELECT s1.user_id,
      CAST(greatest(s1.s, s2.s) AS BIGINT) AS overlap_start_us,
      CAST(least(s1.e, s2.e) AS BIGINT) AS overlap_end_us,
      CAST(least(s1.e, s2.e) - greatest(s1.s, s2.s) AS BIGINT) AS overlap_us
    FROM s1 JOIN s2
      ON s1.user_id = s2.user_id AND s1.s <= s2.e AND s2.s <= s1.e
    """,
)
def interval_overlap_join_binned(spark, sf_dir):
    """Interval x interval overlap join — click-activity sessions against
    error-activity sessions of the same user — via time-axis binning, the
    scale pattern for overlap joins that Spark would otherwise plan as a
    sort-merge with a full per-key cross product (or, keyless, a
    broadcast-nested-loop).

    Each interval explodes into the 24 h bins it covers, candidates meet
    in an equi-join on (user_id, bin), and the exact overlap predicate
    filters after. A pair of long intervals shares MANY bins, so each
    surviving pair is emitted exactly once with the no-dedup rule: it
    counts only in the bin that contains the overlap's start,
    floor(max(start_a, start_b) / BIN) == bin — eliminating the distinct
    shuffle entirely. Work scales with interval-length/BIN, not with
    per-key session counts squared."""
    e = table(spark, sf_dir, "events")
    return overlap_join_intervals(
        _typed_sessions(e, "click"),
        _typed_sessions(e, "error"),
        OVERLAP_BIN_US,
    )


def overlap_join_intervals(s1, s2, bin_width):
    """Core binned overlap join over two (user_id, s, e) interval sets —
    see interval_overlap_join_binned for the algorithm. Property-tested
    against a brute-force overlap in tests/test_property_roundtrip.py."""
    B = bin_width
    a = s1.select(
        "user_id",
        F.col("s").alias("sa"),
        F.col("e").alias("ea"),
        F.explode(
            F.sequence(F.floor(F.col("s") / B), F.floor(F.col("e") / B))
        ).alias("bin"),
    )
    b = s2.select(
        F.col("user_id").alias("user_b"),
        F.col("s").alias("sb"),
        F.col("e").alias("eb"),
        F.explode(
            F.sequence(F.floor(F.col("s") / B), F.floor(F.col("e") / B))
        ).alias("bin_b"),
    )
    ov_start = F.greatest("sa", "sb")
    ov_end = F.least("ea", "eb")
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("user_b"))
            & (F.col("bin") == F.col("bin_b")),
        )
        .filter(
            (F.col("sa") <= F.col("eb"))
            & (F.col("sb") <= F.col("ea"))
            & (F.floor(ov_start / B) == F.col("bin"))
        )
        .select(
            "user_id",
            ov_start.cast("bigint").alias("overlap_start_us"),
            ov_end.cast("bigint").alias("overlap_end_us"),
            (ov_end - ov_start).cast("bigint").alias("overlap_us"),
        )
    )
