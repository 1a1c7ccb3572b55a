"""Structured Streaming surface over the events table.

The reference has zero streaming constructs (SURVEY.md §2.7) — this is the
driver-mandated extension. The batch twin of the tumbling-window aggregation
(plans/relational.py::events_hourly_window) is oracle-checked; here we run
the SAME logical aggregation as a real streaming query with a watermark, so
the engine demonstrably handles the streaming execution mode.

Scale notes: in production the source is Kafka/files-on-arrival; the state
store holds one row per (window, event_type); the watermark bounds state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import DEC


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table.

    The schema is probed from the static file (the file stream source wants
    a directory; glob-filter to the one table). Two timestamp encodings are
    normalized to plain TIMESTAMP, matching plans.registry.table():
    TIMESTAMP(NANOS) arrives as long under nanosAsLong and is truncated to
    micros; naive micros arrive as TIMESTAMP_NTZ, which watermarks reject
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and is cast under the UTC
    session timezone — the same naive-as-UTC instant."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def hourly_event_counts_stream(
    spark: SparkSession, sf_dir: str, queryName: str = "hourly_events"
) -> DataFrame:
    """Run the hourly tumbling-window count as a Structured Streaming query
    over the events parquet (file source), draining it synchronously into a
    memory sink; returns the materialized result as a DataFrame."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(
        f"SELECT date_format(w.start, 'yyyy-MM-dd HH:mm:ss') AS bucket, "
        f"event_type, n, total_value FROM {queryName}"
    )


def stateful_session_counts(spark: SparkSession, sf_dir: str, gap_minutes: int = 30):
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user session counting with an explicit state object (last event
    time + open session count), the streaming twin of
    plans/analytics.py::sessionize_events.

    State is one row per user (bounded by user cardinality); at scale the
    state store shards by the groupBy key across executors."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = _events_stream(spark, sf_dir)

    gap_us = gap_minutes * 60 * 1_000_000

    def count_sessions(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            last_us, n_sessions = state.get
        else:
            last_us, n_sessions = None, 0
        ts = []
        for pdf in pdfs:
            ts.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        ts.sort()
        for t in ts:
            if last_us is None or t - last_us > gap_us:
                n_sessions += 1
            last_us = t
        state.update((last_us, n_sessions))
        yield pd.DataFrame({"user_id": [user_id], "n_sessions": [n_sessions]})

    out = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            count_sessions,
            outputStructType="user_id bigint, n_sessions bigint",
            stateStructType="last_us bigint, n_sessions bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # 'update' mode may emit several rows per user across batches; the last
    # wins — with one input batch there is exactly one row per user
    return spark.sql(
        "SELECT user_id, MAX(n_sessions) AS n_sessions FROM stateful_sessions GROUP BY user_id"
    )


def purchase_click_join_stream(
    spark: SparkSession, sf_dir: str, queryName: str = "pc_join"
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding 30 minutes. Both sides carry watermarks
    so the join state is EVICTABLE — without the time bound + watermarks a
    stream-stream join would buffer both streams forever; with them Spark
    drops click state older than (watermark - 30 min). This is the
    streaming twin of the batch range join (range_join_close_events) /
    as-of family. Returns the matched (click_id, purchase_id) pairs."""
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + INTERVAL 30 MINUTES"
        ),
    ).select("click_id", "purchase_id")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT click_id, purchase_id FROM {queryName}")


def dedup_events_stream(
    spark: SparkSession, sf_dir: str, queryName: str = "dedup_stream"
) -> DataFrame:
    """Streaming deduplication: first event per (user_id, event_type),
    state bounded by the watermark (dropDuplicatesWithinWatermark evicts
    keys older than the horizon — the only way streaming dedup survives an
    unbounded stream). Batch twin: dropDuplicates on the same keys."""
    events = _events_stream(spark, sf_dir).withWatermark("ts", "24 hours")
    deduped = events.dropDuplicatesWithinWatermark(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT user_id, event_type FROM {queryName}")


def streaming_upsert_user_totals(
    spark: SparkSession, sf_dir: str, dest: str
) -> DataFrame:
    """foreachBatch sink: maintain an upserted per-user spend table from a
    stream. Each micro-batch aggregates its slice and MERGEs it into the
    parquet state via operators.merge.upsert (add-to-existing semantics),
    writing atomically by full rewrite — the pattern a table format
    (Delta/Iceberg) optimizes with file-level merge, expressed here on
    plain parquet. foreachBatch is the escape hatch for sinks Structured
    Streaming lacks natively: any batch writer becomes a streaming sink."""
    import os

    from ..operators.merge import upsert
    from ..sources.writers import write_table

    stream = _events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")

    def apply_batch(batch_df, batch_id: int) -> None:
        upd = batch_df.groupBy("user_id").agg(
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_spend")
        )
        if os.path.exists(dest):
            base = batch_df.sparkSession.read.parquet(dest)
            merged = (
                base.unionByName(upd)
                .groupBy("user_id")
                .agg(
                    F.sum(F.col("total_spend").cast(DEC))
                    .cast("double")
                    .alias("total_spend")
                )
            )
        else:
            merged = upsert(upd.limit(0), upd, "user_id")
        merged = merged.localCheckpoint()  # cut lineage before overwriting dest
        write_table(merged, dest, format="parquet", single_file=False)

    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(apply_batch)
        .option("checkpointLocation", dest + "_ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(dest)


def pii_scrub_stream(
    spark: SparkSession, sf_dir: str, queryName: str = "pii_scrub"
) -> DataFrame:
    """Streaming twin of operators/privacy.py::pii_redact_customers: the
    same synthesize->redact->count projection applied to a customer file
    STREAM (append mode, no state, no watermark — a stateless scrub is the
    easiest possible streaming operator, which is the point: the batch
    column expressions transfer verbatim). In production this is the
    shape of a scrub-on-ingest hook: new corpus files land, redacted rows
    flow out, per-microbatch audit counts feed monitoring; throughput
    scales with source parallelism because there is no shuffle at all."""
    from ..operators.privacy import EMAIL_RE, PHONE_RE, _notes_col

    schema = spark.read.parquet(f"{sf_dir}/customer.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "customer.parquet")
        .load(sf_dir)
    )
    raw = _notes_col()
    redacted = F.regexp_replace(
        F.regexp_replace(raw, PHONE_RE, "[PHONE]"), EMAIL_RE, "[EMAIL]"
    )
    out = stream.select(
        "c_custkey",
        redacted.alias("redacted"),
        F.size(F.regexp_extract_all(raw, F.lit(PHONE_RE), F.lit(0))).alias("n_phone"),
        F.size(F.regexp_extract_all(raw, F.lit(EMAIL_RE), F.lit(0))).alias("n_email"),
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {queryName}")


def sliding_event_counts_stream(
    spark: SparkSession, sf_dir: str, queryName: str = "sliding_events"
) -> DataFrame:
    """Streaming twin of plans/relational.py::events_sliding_window:
    1-hour windows hopping every 30 minutes — each event updates TWO
    overlapping window states; the watermark bounds how long each window
    stays open. Same aggregation expressions as the batch query, drained
    synchronously into a memory sink."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(
        f"SELECT date_format(w.start, 'yyyy-MM-dd HH:mm:ss') AS bucket, "
        f"event_type, n, total_value FROM {queryName}"
    )


def enriched_purchases_stream(
    spark: SparkSession, sf_dir: str, queryName: str = "enriched_purchases"
) -> DataFrame:
    """Stream-static join: the purchase event stream enriched with the
    STATIC customer dimension (joined on user_id = c_custkey). The static
    side is planned per micro-batch as an ordinary batch relation — no
    watermark, no join state to evict (only stream-stream joins buffer),
    and Spark broadcasts the dimension exactly as it would in batch. This
    is the bread-and-butter enrichment topology: facts stream in,
    dimensions sit in the warehouse."""
    purchases = _events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    customers = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )
    joined = purchases.join(
        customers, purchases.user_id == customers.c_custkey, "left"
    ).select("event_id", "user_id", "c_mktsegment", "value")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(
        f"SELECT event_id, user_id, c_mktsegment, value FROM {queryName}"
    )


def session_window_stream(
    spark: SparkSession, sf_dir: str, queryName: str = "session_stream"
) -> DataFrame:
    """Native session_window running as a TRUE streaming aggregation —
    dynamic-gap windows whose state merges adjacent sessions as events
    arrive, closed and emitted once the watermark passes the gap. This is
    the operator the batch twin (plans/analytics.py::
    events_session_window_agg) promises is streaming-native; here that
    promise is executed. Complete output mode drains the final merged
    sessions for comparison."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(
        f"SELECT date_format(sw.start, 'yyyy-MM-dd HH:mm:ss') AS session_start, "
        f"date_format(sw.end, 'yyyy-MM-dd HH:mm:ss') AS session_end, "
        f"user_id, n, total_value FROM {queryName}"
    )


def gap_fill_stream(spark: SparkSession, sf_dir: str):
    """Streaming twin of plans/analytics.py::events_gap_fill_6h — per-user
    resample + forward fill as a custom stateful operator
    (applyInPandasWithState). State is (last emitted bucket, last value):
    each micro-batch emits the dense grid rows from the bucket after the
    last emitted one through the batch's max observed bucket, carrying the
    last value across gaps.

    State is one scalar per user (bounded by user cardinality, sharded by
    the groupBy key). Batches must be time-ordered per user (the same
    contract as stateful_session_counts); late rows below the emitted
    frontier are ignored — production would pair this with a watermark and
    a small reorder buffer in state."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..plans.analytics import GAP_BUCKET_SEC

    stream = _events_stream(spark, sf_dir)
    w_us = GAP_BUCKET_SEC * 1_000_000

    def fill(key, pdfs, state: GroupState):
        (user_id,) = key
        rows = []
        for pdf in pdfs:
            for ts, eid, val in zip(
                pd.to_datetime(pdf["ts"]), pdf["event_id"], pdf["value"]
            ):
                us = int(ts.value // 1000)
                rows.append((us // w_us, us, int(eid), float(val)))
        if not rows:
            return
        rows.sort()  # (bucket, ts_us, event_id, value): per-bucket last wins
        per_bucket = {}
        for b, _us, _eid, val in rows:
            per_bucket[b] = val
        last_b, last_v = state.get if state.exists else (None, None)
        start = min(per_bucket) if last_b is None else last_b + 1
        out_b, out_v, out_gap = [], [], []
        for b in range(start, max(per_bucket) + 1):
            if b in per_bucket:
                last_v = per_bucket[b]
                gap = False
            else:
                gap = True
            out_b.append(b)
            out_v.append(last_v)
            out_gap.append(gap)
            last_b = b
        state.update((last_b, last_v))
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "bucket_id": out_b,
                "value_filled": out_v,
                "is_gap": out_gap,
            }
        )

    out = stream.groupBy("user_id").applyInPandasWithState(
        fill,
        outputStructType=(
            "user_id bigint, bucket_id bigint, value_filled double, is_gap boolean"
        ),
        stateStructType="last_b bigint, last_v double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("gap_fill_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(
        "SELECT user_id, bucket_id, value_filled, is_gap FROM gap_fill_stream"
    )


def ohlc_stream(
    spark: SparkSession, sf_dir: str, queryName: str = "ohlc_stream"
) -> DataFrame:
    """Streaming twin of events_ohlc_15min: OHLC bars computed as a
    Structured Streaming tumbling-window aggregate. Open/close use the same
    min/max-over-(epoch, event_id, value)-struct trick as the batch query —
    ordered aggregates with a deterministic tie-break are exactly what
    survives the unordered, incremental arrival of a stream; first()/last()
    would be micro-batch-order-dependent. Complete mode + memory sink for
    the drain-and-compare harness; a production run would use update mode
    with the watermark closing bars."""
    stream = _events_stream(spark, sf_dir)
    key = F.struct(
        F.unix_micros("ts").alias("t"),
        F.col("event_id").alias("i"),
        F.col("value").alias("v"),
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.min(key)["v"].alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(key)["v"].alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(
        f"SELECT date_format(w.start, 'yyyy-MM-dd HH:mm:ss') AS bucket, "
        f"event_type, open, high, low, close, n FROM {queryName}"
    )


MG_CAPACITY = 8  # Misra-Gries counters per group


def heavy_hitters_stream(spark: SparkSession, sf_dir: str):
    """Streaming heavy hitters via a Misra-Gries summary held in
    applyInPandasWithState: per event_type, at most MG_CAPACITY
    (user_id -> count) counters survive in state regardless of stream
    length — the bounded-memory answer to "top users right now" that an
    exact streaming groupBy can't give without unbounded state.

    Guarantee (the classic MG bound, asserted in tests): every user with
    true frequency > N/(capacity+1) is present in the summary, and each
    reported count understates the true count by at most N/(capacity+1).
    State is capacity rows per group key — at scale the state store
    shards by event_type (or a finer salt) across executors."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = _events_stream(spark, sf_dir)

    def summarize(key, pdfs, state: GroupState):
        (event_type,) = key
        counters: dict[int, int] = {}
        if state.exists:
            (ids, counts) = state.get
            counters = dict(zip(ids, counts))
        for pdf in pdfs:
            for uid in pdf["user_id"]:
                uid = int(uid)
                if uid in counters:
                    counters[uid] += 1
                elif len(counters) < MG_CAPACITY:
                    counters[uid] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    counters = {u: c - 1 for u, c in counters.items() if c > 1}
        ids = list(counters.keys())
        state.update((ids, [counters[u] for u in ids]))
        yield pd.DataFrame(
            {
                "event_type": [event_type] * len(ids),
                "user_id": ids,
                "mg_count": [counters[u] for u in ids],
            }
        )

    out = (
        stream.groupBy("event_type")
        .applyInPandasWithState(
            summarize,
            outputStructType="event_type string, user_id bigint, mg_count bigint",
            stateStructType="ids array<bigint>, counts array<bigint>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("mg_hh")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode re-emits per micro-batch; keep the LAST emission per key
    return spark.sql(
        "SELECT event_type, user_id, mg_count FROM ("
        " SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, user_id"
        " ORDER BY mg_count DESC) rn FROM mg_hh) WHERE rn = 1"
    )


def markov_transitions_stream(spark: SparkSession, sf_dir: str):
    """Streaming first-order transition counting via applyInPandasWithState:
    per-user state carries the LAST seen event type so a transition
    spanning two micro-batches is still counted exactly once —
    the streaming twin of plans/stats.py::events_markov_transitions'
    count core (the batch side derives probabilities from the same
    counts). Within a batch events sort by (ts, event_id), matching the
    batch window's deterministic order.

    State is one scalar per user (bounded by user cardinality, sharded
    by the groupBy key across executors); emitted rows are per-batch
    transition count deltas, summed downstream — so 'update' mode output
    composes additively across any number of micro-batches."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = _events_stream(spark, sf_dir)

    def count_transitions(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            (last_type,) = state.get
        else:
            last_type = None
        rows = []
        for pdf in pdfs:
            for _, r in (
                pdf.sort_values(["ts", "event_id"]).iterrows()
            ):
                rows.append((r["event_type"],))
        counts: dict[tuple[str, str], int] = {}
        for (etype,) in rows:
            if last_type is not None:
                k = (last_type, etype)
                counts[k] = counts.get(k, 0) + 1
            last_type = etype
        state.update((last_type,))
        if counts:
            yield pd.DataFrame(
                {
                    "from_type": [k[0] for k in counts],
                    "to_type": [k[1] for k in counts],
                    "n": list(counts.values()),
                }
            )

    out = stream.groupBy("user_id").applyInPandasWithState(
        count_transitions,
        outputStructType="from_type string, to_type string, n bigint",
        stateStructType="last_type string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("markov_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(
        "SELECT from_type, to_type, CAST(SUM(n) AS BIGINT) AS n_transitions "
        "FROM markov_stream GROUP BY from_type, to_type"
    )


def _documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table (schema probed from the
    static file, glob-filtered to the one table)."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def quality_gate_stream(
    spark: SparkSession, sf_dir: str, queryName: str = "quality_gate"
) -> DataFrame:
    """The Gopher quality gate as a streaming operator: documents arrive on
    a file stream and every signal + the keep verdict is computed in a
    stateless map (operators/text.py::gopher_flags_stateless) — append
    output mode, no watermark, no state store. This is the shape of an
    ingest-time filter on a live corpus firehose: each micro-batch is
    gated independently, so the operator backpressures like any stateless
    projection. Drained synchronously into a memory sink and returned."""
    from ..operators.text import gopher_flags_stateless

    flags = gopher_flags_stateless(_documents_stream(spark, sf_dir))
    q = (
        flags.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {queryName}")


def cumulative_users_stream(
    spark: SparkSession, sf_dir: str, dest: str
) -> DataFrame:
    """foreachBatch sink: maintain the user -> first-seen-day table from a
    stream, then report new + cumulative distinct users per day — the
    streaming twin of events_cumulative_distinct_users. The merge keeps
    MIN(first_day) per user across batches (idempotent under replays, so
    exactly-once per checkpoint semantics suffice), and the growth curve
    is recomputed from the compact per-user state — never by re-counting
    distincts over history. State size is |users|, the same table the
    batch operator's first-seen reduction materializes once."""
    import os

    from pyspark.sql import Window as W

    stream = _events_stream(spark, sf_dir)

    def apply_batch(batch_df, batch_id: int) -> None:
        upd = (
            batch_df.select(
                "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
            )
            .groupBy("user_id")
            .agg(F.min("d").alias("first_day"))
        )
        if os.path.exists(dest):
            base = batch_df.sparkSession.read.parquet(dest)
            merged = (
                base.unionByName(upd)
                .groupBy("user_id")
                .agg(F.min("first_day").alias("first_day"))
            )
        else:
            merged = upd
        merged = merged.localCheckpoint()  # cut lineage before overwrite
        merged.write.mode("overwrite").parquet(dest)

    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(apply_batch)
        .option("checkpointLocation", dest + "_ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    daily = (
        spark.read.parquet(dest)
        .groupBy(F.col("first_day").alias("day"))
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        "day",
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


def evasion_dedup_stream(
    spark: SparkSession, sf_dir: str, queryName: str = "evasion_dedup"
) -> DataFrame:
    """Ingest-time corpus dedup on the evasion-robust key
    (operators/dedup.py::_evasion_normalize): documents arrive on a file
    stream, each is reduced map-side to a 16-byte normalized digest, and
    ``dropDuplicates`` keeps the first arrival per digest — zero-width /
    homoglyph / case perturbed re-submissions are rejected at the door
    instead of surviving until the next batch dedup pass.

    State design: the store holds ONE digest per distinct document —
    key-sized state, linear in the distinct corpus (the same table a batch
    exact-dedup shuffles), backed by the state store (RocksDB in
    production) rather than executor memory. No watermark: corpus identity
    dedup is intentionally unbounded in TIME (a duplicate a month later is
    still a duplicate) while bounded in SIZE by distinct documents. The
    batch twin is dedup_evasion_robust_groups; the equivalence test checks
    the kept set covers exactly one representative per normalized group."""
    from ..operators.dedup import _evasion_normalize

    docs = _documents_stream(spark, sf_dir)
    keyed = docs.select(
        "doc_id",
        "lang",
        "source",
        F.md5(_evasion_normalize(F.col("text"))).alias("norm_key"),
    )
    deduped = keyed.dropDuplicates(["norm_key"])
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {queryName}")


def shard_mixing_stream(
    spark: SparkSession, sf_dir: str, dest: str
) -> DataFrame:
    """foreachBatch sink: the streaming twin of shard_source_mixing_report
    (SURVEY round-7 item). Documents arrive on a file stream; each batch
    MIN-merges its (doc_id -> source) rows into a compact parquet state
    table (idempotent under replays — exactly-once per checkpoint
    suffices, the cumulative_users_stream recipe).

    The global-rank caveat, stated honestly: a document's SHARD is a
    function of its rank in the md5 epoch order over the WHOLE corpus, so
    shard ids are NOT per-row computable at ingest (any doc arriving later
    can shift every rank). The stream therefore keeps only the per-doc
    state (|docs| rows of 16-byte key material — the same table the batch
    op scans) and defers the rank + shard + histogram to the report step,
    which runs the identical bucketed numbering kernel and report body the
    batch query uses. Ingest stays incremental; the deferred step is one
    bounded batch job over the compact state, re-runnable at any
    watermark."""
    import os

    from ..operators.pipeline import (
        SHUFFLE_SALT,
        _number_in_bucket_order,
        shard_mixing_from_assignments,
    )

    stream = _documents_stream(spark, sf_dir).select("doc_id", "source")

    def apply_batch(batch_df, batch_id: int) -> None:
        upd = batch_df.groupBy("doc_id").agg(F.min("source").alias("source"))
        if os.path.exists(dest):
            base = batch_df.sparkSession.read.parquet(dest)
            merged = (
                base.unionByName(upd)
                .groupBy("doc_id")
                .agg(F.min("source").alias("source"))
            )
        else:
            merged = upd
        merged = merged.localCheckpoint()  # cut lineage before overwrite
        merged.write.mode("overwrite").parquet(dest)

    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(apply_batch)
        .option("checkpointLocation", dest + "_ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = spark.read.parquet(dest)
    key = F.md5(F.concat(F.lit(SHUFFLE_SALT), F.col("doc_id").cast("string")))
    parts = state.withColumn("_key", key).withColumn(
        "_pid", F.conv(F.substring("_key", 1, 2), 16, 10).cast("int")
    )
    ranked = _number_in_bucket_order(
        parts, ["_key", "doc_id"], ["doc_id", "source"], "pos"
    )  # the kernel emits `shard` = pos // SHARD_SIZE alongside the position
    return shard_mixing_from_assignments(ranked.select("shard", "source"))


def cdc_chunk_dedup_stream(
    spark: SparkSession, sf_dir: str, queryName: str = "cdc_stream",
    dest: str | None = None,
) -> DataFrame:
    """Ingest-time content-defined-chunk dedup: documents arrive on a file
    stream, each is CDC-chunked IN-ROW (operators/dedup.py::
    _cdc_chunks_inrow — the window-free form of the batch kernel, since
    per-doc lag windows are unsupported on streams), and every micro-batch
    keeps one DETERMINISTIC representative per distinct chunk — the
    rsync/backup-ingest shape where a re-uploaded document costs only its
    genuinely-new chunks. Within a batch the representative is the least
    (doc_id, chunk_idx) via min(struct(...)) — streaming dropDuplicates
    keeps an ARBITRARY in-batch row (ADVICE r7), so the reduction happens
    in foreachBatch before the cross-batch anti-join against the persisted
    hash state; across batches the first-arriving batch wins (file order,
    deterministic under replay). State = one 16-byte digest + its
    representative per distinct chunk; no watermark by design — chunk
    identity dedup is unbounded in time, bounded in size by distinct
    content. Batch twin: dedup_cdc_chunks' distinct-hash set; the
    equivalence test pins the kept set to exactly one representative per
    distinct chunk hash."""
    import tempfile

    from ..operators.dedup import _cdc_chunks_inrow

    if dest is None:
        dest = tempfile.mkdtemp(prefix="cdc_dedup_") + "/state"
    docs = _documents_stream(spark, sf_dir)
    chunks = _cdc_chunks_inrow(docs.select("doc_id", "text"))

    def apply_batch(batch_df, batch_id):
        rep = (
            batch_df.groupBy("chunk_hash")
            .agg(
                F.min(
                    F.struct("doc_id", "chunk_idx", "chunk_len")
                ).alias("r")
            )
            .select("chunk_hash", "r.doc_id", "r.chunk_idx", "r.chunk_len")
        )
        sess = batch_df.sparkSession
        try:
            seen = sess.read.parquet(dest).select("chunk_hash")
        except Exception:  # first batch: no state yet
            seen = None
        # plain left_anti: the hash state outgrows broadcast at scale and
        # AQE broadcasts it while small, so no hint either way
        new = rep if seen is None else rep.join(seen, "chunk_hash", "left_anti")
        new.select(
            "doc_id", "chunk_idx", "chunk_len", "chunk_hash"
        ).write.mode("append").parquet(dest)

    q = (
        chunks.writeStream.outputMode("append")
        .foreachBatch(apply_batch)
        .option("checkpointLocation", dest + "_ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(dest).select(
        "doc_id", "chunk_idx", "chunk_len", "chunk_hash"
    )


def incremental_dedup_stream(
    spark: SparkSession, sf_dir: str, queryName: str = "incdedup_stream"
) -> DataFrame:
    """Streaming twin #14 (round-7 VERDICT "next" #7): ingest-time LSH
    dedup against a PERSISTED index — the daily-ingestion deployment
    shape of dedup_incremental_vs_index. "Today's crawl" (doc_id %
    BATCH_MOD == 0) arrives on a file stream; the corpus index (everything
    else) is a static band table, skew-capped exactly like the batch
    operator. The stream side computes its MinHash signature IN-ROW
    (array_min over transform of the shingle array — the same min the
    batch groupBy takes, but stateless so the stream needs no aggregation
    state), explodes its band keys, stream-static joins the capped index
    buckets, dedups candidate pairs (unbounded-in-time by design, bounded
    by distinct pairs), and verifies exact Jaccard against the static
    shingle-set table. Every join is stream-static inner — supported in
    append mode with no watermark.

    Scale shape: per micro-batch cost is O(batch bands) — the index never
    re-shuffles (bucketed storage in production, sources/bucketing.py),
    which is the whole point of the asymmetric design."""
    from ..operators.dedup import (
        BATCH_MOD,
        JACCARD_THRESHOLD,
        LSH_BAND_SIZE,
        LSH_MAX_BUCKET,
        N_MINHASH,
        SHINGLE_K,
        minhash_signatures,
        shingles_all,
    )

    d_static = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_bands = N_MINHASH // LSH_BAND_SIZE
    sig = minhash_signatures(d_static)
    bands_static = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat(
                            *[
                                F.col(f"h{b * LSH_BAND_SIZE + j}")
                                for j in range(LSH_BAND_SIZE)
                            ]
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    ib = bands_static.filter(F.col("doc_id") % BATCH_MOD != 0).persist()
    iok = (
        ib.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= LSH_MAX_BUCKET)
        .select("band", "key")
        .persist()
    )
    sets_ = (
        shingles_all(d_static)
        .select("doc_id", F.substring(F.md5("shingle"), 1, 16).alias("h"))
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("s"))
        .persist()
    )

    docs = _documents_stream(spark, sf_dir).filter(
        F.col("doc_id") % BATCH_MOD == 0
    )
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= SHINGLE_K
    )
    sh_arr = F.transform(
        F.sequence(F.lit(0), F.size("t") - SHINGLE_K),
        lambda i: F.concat_ws(" ", F.slice("t", i + 1, SHINGLE_K)),
    )
    with_sh = toks.select("doc_id", sh_arr.alias("sh"))
    def _slice_fn(g, j):
        # closure factory: default-arg lambdas confuse PySpark's HOF arity
        # inspection (it sees 3 params and binds a 3-arg lambda)
        return lambda s: F.substring(
            F.md5(F.concat(F.lit(f"{g}:"), s)), 8 * j + 1, 8
        )

    sig_cols = []
    for i in range(N_MINHASH):
        g, j = divmod(i, 4)
        sig_cols.append(
            F.array_min(
                F.transform(F.col("sh"), _slice_fn(g, j))
            ).alias(f"h{i}")
        )
    ssig = with_sh.select("doc_id", *sig_cols)
    sbands = ssig.select(
        F.col("doc_id").alias("new_doc"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat(
                            *[
                                F.col(f"h{b * LSH_BAND_SIZE + j}")
                                for j in range(LSH_BAND_SIZE)
                            ]
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("new_doc", "bk.band", "bk.key")
    cand = (
        sbands.join(iok, ["band", "key"])
        .join(
            ib.select(F.col("doc_id").alias("dup_of"), "band", "key"),
            ["band", "key"],
        )
        .select("new_doc", "dup_of")
        .dropDuplicates(["new_doc", "dup_of"])
    )
    s1 = sets_.select(F.col("doc_id").alias("new_doc"), F.col("s").alias("s1"))
    s2 = sets_.select(F.col("doc_id").alias("dup_of"), F.col("s").alias("s2"))
    c = F.size(F.array_intersect("s1", "s2"))
    jac = c.cast("double") / (F.size("s1") + F.size("s2") - c)
    verified = (
        cand.join(s1, "new_doc")
        .join(s2, "dup_of")
        .select("new_doc", "dup_of", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    q = (
        verified.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT new_doc, dup_of, jaccard FROM {queryName}")


def incremental_cluster_assign_stream(
    spark: SparkSession, sf_dir: str, dest: str | None = None
) -> DataFrame:
    """Streaming twin #15: ingest-time near-dup CLUSTER ASSIGNMENT — the
    foreachBatch deployment of
    operators.cluster.dedup_incremental_cluster_assign. The index side
    (signatures, capped band buckets, cluster map) is the SAME session
    fragment the batch operator consumes (lsh_ingest_index — round-9
    VERDICT "next" #1; fragment-cache-owned persistence also closes the
    round-9 ADVICE unpersist leak: this function no longer persists
    anything itself). In production it is the stored, bucketed LSH
    index; the stream carries "today's crawl" (doc_id % BATCH_MOD == 0).
    Each micro-batch signs its own docs (a doc arrives in exactly ONE
    batch, so its whole signature/probe/assign chain is batch-local — no
    cross-batch stream aggregation, no watermark needed), probes the
    static capped buckets, takes the smallest matched index cluster (or
    itself, is_new = 1), and appends batch-sized assignment rows.
    Equivalence-tested against the batch operator."""
    import tempfile

    from ..operators.cluster import lsh_ingest_index
    from ..operators.dedup import (
        BATCH_MOD,
        bands_from_signatures,
        minhash_signatures,
    )

    if dest is None:
        dest = tempfile.mkdtemp(prefix="cluster_assign_") + "/out"
    comp_ix, bands_ix, iok = lsh_ingest_index(spark, sf_dir)
    comp_ix.count(), bands_ix.count(), iok.count()  # materialize once

    docs = _documents_stream(spark, sf_dir).filter(
        F.col("doc_id") % BATCH_MOD == 0
    )

    def apply_batch(batch_df, batch_id):
        sig_nb = minhash_signatures(docs=batch_df.select("doc_id", "text"))
        bands_nb = bands_from_signatures(sig_nb).withColumnRenamed(
            "doc_id", "new_doc"
        )
        mt = (
            bands_nb.join(iok, ["band", "key"])
            .join(bands_ix, ["band", "key"])
            .select("new_doc", "ix_doc")
            .distinct()
        )
        asg = (
            mt.join(comp_ix, "ix_doc")
            .groupBy("new_doc")
            .agg(
                F.min("cluster").alias("cl"),
                F.countDistinct("ix_doc").alias("n_matched"),
            )
        )
        out = (
            batch_df.select(F.col("doc_id").alias("new_doc"))
            .join(asg, "new_doc", "left")
            .select(
                "new_doc",
                F.coalesce("cl", "new_doc").cast("bigint").alias(
                    "assigned_cluster"
                ),
                F.coalesce("n_matched", F.lit(0)).cast("bigint").alias(
                    "n_matched"
                ),
                F.when(F.col("cl").isNull(), 1).otherwise(0).alias(
                    "is_new"
                ),
            )
        )
        out.write.mode("append").parquet(dest)

    q = (
        docs.writeStream.outputMode("append")
        .foreachBatch(apply_batch)
        .option("checkpointLocation", dest + "_ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(dest).select(
        "new_doc", "assigned_cluster", "n_matched", "is_new"
    )
