"""Scale-pattern tests: bucketed co-located joins, partition-pruned reads,
salted skew joins. These verify the 100-TB design levers work and produce
the intended plans, at test scale."""

from __future__ import annotations

import pytest

from conftest import SF_DIR
from test_plans import count_exchanges, plan_of

from pyspark.sql import functions as F

from quackio_jl_spark.operators.skew import salted_join
from quackio_jl_spark.plans.registry import table
from quackio_jl_spark.sources.bucketing import read_bucketed, write_bucketed
from quackio_jl_spark.sources.writers import write_table
from quackio_jl_spark.sources.readers import read_parquet


def test_bucketed_join_is_exchange_free(spark):
    """Bucket lineitem and orders on orderkey; the join must then run with
    ZERO Exchange nodes — the write-time shuffle is reused by every
    subsequent join on the key."""
    l = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    try:
        write_bucketed(l, "li_b", "l_orderkey", 8, sort_cols="l_orderkey")
        write_bucketed(o, "ord_b", "o_orderkey", 8, sort_cols="o_orderkey")
        lb, ob = read_bucketed(spark, "li_b"), read_bucketed(spark, "ord_b")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        p = plan_of(joined)
        assert count_exchanges(p) == 0, p
        # same answer as the straight join
        plain = l.join(o, l.l_orderkey == o.o_orderkey)
        assert joined.count() == plain.count()
        # and a groupBy on the bucket key also skips its shuffle
        agg = lb.groupBy("l_orderkey").agg(F.sum("l_quantity"))
        assert count_exchanges(plan_of(agg)) == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_partitioned_write_prunes_on_read(tmp_path, spark):
    """write_table(partition_by=...) + a filter on the partition column
    must show PartitionFilters (directory pruning — at 100 TB this is the
    difference between scanning one partition and the whole lake) and scan
    fewer files than the full dataset."""
    src = table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    dest = str(tmp_path / "orders_part")
    write_table(src, dest, format="parquet", single_file=False,
                partition_by=["o_orderstatus"])
    back = read_parquet(spark, dest).filter(F.col("o_orderstatus") == "F")
    p = plan_of(back)
    pf_line = next(ln for ln in p.splitlines() if "PartitionFilters" in ln)
    assert "o_orderstatus" in pf_line, p
    expected = src.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == expected


def test_salted_join_matches_plain_join(spark):
    """salted_join must return exactly the rows of the plain join — same
    multiset — while spreading each key over n_salts sub-keys."""
    e = table(spark, SF_DIR, "events").select("user_id", "event_type", "value")
    users = (
        table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    salted = salted_join(e, users, "user_id", n_salts=8)
    plain = e.join(users, "user_id")
    assert salted.count() == plain.count()
    a = {tuple(r) for r in salted.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_events").alias("s")).collect()}
    b = {tuple(r) for r in plain.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_events").alias("s")).collect()}
    assert a == b


def test_salted_left_join_keeps_unmatched(spark):
    """Left salted join: big-side rows with no match must survive exactly
    once, as in a plain left join."""
    e = table(spark, SF_DIR, "events").select("user_id", "event_id")
    # a small side that deliberately misses most users
    few = (
        table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .limit(3)
        .withColumn("flag", F.lit(1))
    )
    salted = salted_join(e, few, "user_id", n_salts=8, how="left")
    plain = e.join(few, "user_id", "left")
    assert salted.count() == plain.count()
    assert (
        salted.filter(F.col("flag").isNull()).count()
        == plain.filter(F.col("flag").isNull()).count()
    )


def test_salted_join_rejects_unsupported_how(spark):
    e = table(spark, SF_DIR, "events")
    with pytest.raises(ValueError):
        salted_join(e, e, "user_id", how="full")


def test_upsert_null_update_preserves_base(spark):
    """Column-level merge: a NULL in an update column must NOT clobber the
    base value (MERGE's UPDATE SET col = COALESCE(src.col, tgt.col) idiom)."""
    from quackio_jl_spark.operators.merge import upsert

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, s string, v double"
    )
    upd = spark.createDataFrame(
        [(1, None, 99.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    got = {r["k"]: (r["s"], r["v"]) for r in upsert(base, upd, "k").collect()}
    assert got == {1: ("a", 99.0), 2: ("b", 20.0), 3: ("c", 30.0)}


def test_sorted_write_produces_tight_zone_maps(tmp_path, spark):
    """write_sorted must produce parquet files whose min/max statistics are
    non-overlapping ranges (verified via pyarrow footers) — the physical
    property that makes predicate pushdown skip row groups."""
    import glob

    import pyarrow.parquet as pq

    from quackio_jl_spark.sources.bucketing import write_sorted

    src = table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    dest = str(tmp_path / "sorted")
    write_sorted(src, dest, "o_orderkey", n_files=4)

    ranges = []
    for f in glob.glob(f"{dest}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.statistics is not None and col.statistics.has_min_max
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) == 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {ranges}"
    # and the data is intact
    back = spark.read.parquet(dest)
    assert back.count() == src.count()


def test_bucketed_verify_sets_never_shuffle(spark):
    """neardup_verify_bucketed reads shingle sets + LSH candidates from
    co-bucketed tables: with broadcast disabled, the whole verify join
    plan has exactly ONE Exchange — the pair-sized stream redistributed
    for the doc2 side. The corpus-sized sets table never shuffles."""
    import __spark_entry__ as entry

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = entry.queries()["neardup_verify_bucketed"](spark, SF_DIR)
        p = plan_of(q)
        n = count_exchanges(p)
        assert n <= 1, f"expected <=1 Exchange in bucketed verify, saw {n}:\n{p}"
        assert "SortMergeJoin" in p
        # and the answer matches the broadcast-path query bit for bit
        base = {
            (r["doc1"], r["doc2"], round(r["jaccard"], 12))
            for r in entry.queries()["neardup_ngram_jaccard"](spark, SF_DIR).collect()
        }
        got = {(r["doc1"], r["doc2"], round(r["jaccard"], 12)) for r in q.collect()}
        assert got == base
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_observe_metrics_single_pass(spark):
    """Pipeline observability: df.observe() collects data-quality counters
    DURING the action — no second scan, no separate count() jobs. At 100 TB
    a monitoring pass that re-reads the corpus doubles the bill; observe()
    rides the existing job. Checks the collected metrics against directly
    computed values."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from quackio_jl_spark.operators.pipeline import corpus_prep_pipeline

    obs = Observation("corpus_prep_metrics")
    out = corpus_prep_pipeline(spark, SF_DIR).observe(
        obs,
        F.count(F.lit(1)).alias("rows_out"),
        F.sum("n_tokens").alias("tokens_out"),
        # DISTINCT aggregates are disallowed in observed metrics;
        # HLL++ is exact at this cardinality (sparse mode, 4 langs)
        F.approx_count_distinct("lang").alias("n_langs"),
    )
    collected = out.collect()  # one action drives both result and metrics
    m = obs.get
    assert m["rows_out"] == len(collected)
    assert m["tokens_out"] == sum(r["n_tokens"] for r in collected)
    assert m["n_langs"] == len({r["lang"] for r in collected})


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime bloom-filter join pruning: with a selective predicate on the
    dimension side of a shuffle join, Spark builds a bloom filter from the
    filtered keys and injects might_contain() into the FACT side's scan —
    rows that cannot match are dropped before the shuffle. At 100 TB this
    is the difference between shuffling the whole fact table and shuffling
    the ~1% that survives the dimension filter. (Thresholds are tuned for
    cluster-sized inputs — the application side must look big enough, hence
    the scan-size threshold override here.)"""
    from pyspark.sql import functions as F

    from quackio_jl_spark.plans.registry import table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        l = table(spark, SF_DIR, "lineitem")
        o = table(spark, SF_DIR, "orders").filter(F.col("o_totalprice") > 500000)
        j = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        p = buf.getvalue()
        assert "might_contain" in p, p
        # and the filter sits on the fact (lineitem) side's scan condition
        assert "l_orderkey" in next(
            ln for ln in p.splitlines() if "might_contain" in ln
        )
        # answers unchanged by the rewrite
        plain = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_numbering_kernel_partition_invariance(spark):
    """The contiguous-numbering kernel (and everything built on it) must
    produce IDENTICAL output under different shuffle-partition counts —
    the property that makes its results trustworthy on any cluster size.
    Exercised at 3 vs the suite's default partitions for the three
    kernel consumers."""
    import __spark_entry__ as entry

    names = ["length_grouped_batches", "quality_rank_percentile", "contiguous_row_ids"]
    qs = entry.queries()
    default = spark.conf.get("spark.sql.shuffle.partitions")
    baseline = {n: sorted(map(tuple, qs[n](spark, SF_DIR).collect())) for n in names}
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        for n in names:
            got = sorted(map(tuple, qs[n](spark, SF_DIR).collect()))
            assert got == baseline[n], n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)


def test_bucketed_prefix_sums_matches_global_window(spark):
    """The distributed prefix-sum kernel must equal a single global
    cumulative window on the same data, for any bucket count, including
    the tiebreak-desc (sweep-line) variant."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from quackio_jl_spark.functions.prefix import bucketed_prefix_sums

    df = (
        spark.range(500)
        .select(
            (F.hash(F.col("id").cast("string")) % 1000).alias("k"),
            (F.col("id") % 7).cast("bigint").alias("a"),
            ((F.col("id") * 3) % 5 - 2).cast("bigint").alias("d"),
        )
        # duplicate keys exercise the tie path
        .union(
            spark.range(50).select(
                (F.hash(F.col("id").cast("string")) % 1000).alias("k"),
                F.lit(1).cast("bigint").alias("a"),
                F.lit(-1).cast("bigint").alias("d"),
            )
        )
    )
    # distinct keys: plain ascending cumulative
    pv = df.groupBy("k").agg(F.sum("a").alias("a"))
    want = {
        r["k"]: r["cum"]
        for r in pv.select(
            "k",
            F.sum("a")
            .over(W.orderBy("k").rowsBetween(W.unboundedPreceding, 0))
            .alias("cum"),
        ).collect()
    }
    for nb in (1, 4, 16):
        got = {
            r["k"]: r["cum_a"]
            for r in bucketed_prefix_sums(pv, "k", ["a"], nb).collect()
        }
        assert got == want, f"n_buckets={nb}"

    # tiebreak-desc variant vs explicit window with the same order
    want2 = sorted(
        (r["k"], r["d"], r["cum"])
        for r in df.select(
            "k",
            "d",
            F.sum("d")
            .over(
                W.orderBy(F.col("k").asc(), F.col("d").desc()).rowsBetween(
                    W.unboundedPreceding, 0
                )
            )
            .alias("cum"),
        ).collect()
    )
    got2 = sorted(
        (r["k"], r["d"], r["cum_d"])
        for r in bucketed_prefix_sums(
            df, "k", ["d"], 8, tiebreak_desc="d"
        ).collect()
    )
    assert got2 == want2


def test_bucketed_prefix_max_matches_global_window(spark):
    """The distributed prefix-MAX kernel (the high-water-mark scan behind
    events_watermark_lateness_audit) must equal a single global running-max
    window on the same data, for any bucket count, on numeric AND
    timestamp payloads."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from quackio_jl_spark.functions.prefix import bucketed_prefix_max

    df = spark.range(500).select(
        (F.hash(F.col("id").cast("string")) % 100000).alias("k"),
        ((F.col("id") * 37) % 211).cast("bigint").alias("v"),
        F.timestamp_seconds(
            F.lit(1700000000) + (F.col("id") * 9973) % 86400
        ).alias("ts"),
    )
    # RANGE frame: duplicate keys (hash % 100000 collides) must get one
    # deterministic peer-inclusive value in the reference, as in the kernel.
    w = W.orderBy("k").rangeBetween(W.unboundedPreceding, W.currentRow)
    want = {
        (r["k"], r["v"]): (r["cv"], r["ct"])
        for r in df.select(
            "k", "v",
            F.max("v").over(w).alias("cv"),
            F.max("ts").over(w).alias("ct"),
        ).collect()
    }
    for nb in (1, 4, 16):
        via_v = bucketed_prefix_max(df, "k", "v", nb)
        via_t = bucketed_prefix_max(df, "k", "ts", nb)
        got_v = {(r["k"], r["v"]): r["cum_v"] for r in via_v.collect()}
        got_t = {(r["k"], r["v"]): r["cum_ts"] for r in via_t.collect()}
        for key, (cv, ct) in want.items():
            assert got_v[key] == cv, f"n_buckets={nb} key={key}"
            assert got_t[key] == ct, f"n_buckets={nb} key={key}"


def test_dynamic_partition_pruning_from_dim_filter(tmp_path, spark):
    """Dynamic partition pruning: when the fact table is partitioned on the
    join key and the dimension side carries a selective filter, Spark must
    inject a runtime `dynamicpruning` subquery into the fact scan's
    PartitionFilters — at 100 TB this prunes fact partitions using a filter
    the optimizer only learns at runtime (the classic star-schema date-dim
    pattern). Verified both in the plan and by result equality."""
    fact = table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    dest = str(tmp_path / "orders_by_priority")
    write_table(fact, dest, format="parquet", single_file=False,
                partition_by=["o_orderpriority"])
    dim = spark.createDataFrame(
        [("1-URGENT", "keep"), ("2-HIGH", "drop"), ("3-MEDIUM", "drop"),
         ("4-NOT SPECIFIED", "drop"), ("5-LOW", "drop")],
        "prio string, tag string",
    )
    back = read_parquet(spark, dest)
    joined = back.join(
        dim.filter(F.col("tag") == "keep"),
        back.o_orderpriority == dim.prio,
    )
    p = plan_of(joined)
    assert "dynamicpruning" in p.lower(), p
    expected = fact.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert joined.count() == expected
