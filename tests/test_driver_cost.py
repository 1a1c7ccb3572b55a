"""Round-11 driver-cost optimizations: the table plan-handle cache and
fanout's scan-probe parameter. These changed builder internals; the tests
pin (a) the cache returns one handle per (session, sf_dir, name) and is
plan-reuse only — every action recomputes from parquet; (b) probe=
decides the repartition from the probed frame, not df, without changing
what fanout returns."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from quackio_jl_spark.functions.fanout import fanout
from quackio_jl_spark.plans.registry import clear_table_cache, table
from quackio_jl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def _spark():
    return get_spark(app_name="test_driver_cost")


def test_table_cache_returns_same_handle_per_session():
    spark = _spark()
    clear_table_cache()
    a = table(spark, SF_DIR, "orders")
    b = table(spark, SF_DIR, "orders")
    assert a is b, "same (session, sf_dir, name) must reuse the plan handle"
    c = table(spark, SF_DIR, "customer")
    assert c is not a
    clear_table_cache()
    d = table(spark, SF_DIR, "orders")
    assert d is not a, "clear_table_cache() must drop the handle"


def test_table_cache_is_plan_reuse_not_result_reuse():
    """Two actions on the cached handle both scan parquet: the handle is
    lazy, carries no materialized rows, and per-action results agree with
    a fresh uncached read."""
    spark = _spark()
    clear_table_cache()
    h = table(spark, SF_DIR, "orders")
    n1 = h.count()
    n2 = h.filter(F.col("o_totalprice") > 0).count()
    clear_table_cache()
    fresh = table(spark, SF_DIR, "orders")
    assert fresh is not h
    assert fresh.count() == n1
    assert n2 <= n1
    # the handle is not persisted storage — nothing in the block manager
    assert not h.storageLevel.useMemory and not h.storageLevel.useDisk


def test_fanout_probe_decides_from_probed_frame():
    spark = _spark()
    target = spark.sparkContext.defaultParallelism
    scan = table(spark, SF_DIR, "orders").select("o_orderkey")
    scan_parts = scan.rdd.getNumPartitions()
    assert scan_parts < target, "testdata scans must arrive row-group-bound"
    # a frame that already matches the target: probing IT suppresses the
    # repartition even when df is the row-group-bound scan
    wide = scan.repartition(target, "o_orderkey")
    out_suppressed = fanout(scan, "o_orderkey", probe=wide)
    assert out_suppressed is scan
    # probing the scan fires the repartition for a derived df
    derived = scan.distinct()
    out_fired = fanout(derived, "o_orderkey", probe=scan)
    assert out_fired is not derived
    assert out_fired.rdd.getNumPartitions() == target


def test_fanout_default_probe_unchanged():
    spark = _spark()
    target = spark.sparkContext.defaultParallelism
    scan = table(spark, SF_DIR, "orders").select("o_orderkey")
    out = fanout(scan, "o_orderkey")
    assert out.rdd.getNumPartitions() == target


def test_fanout_always_repartitions_unconditionally():
    """ADVICE r11: byte-tiny compute-dense frames (type tables, edge
    lists) must keep parallelism independent of how WIDE the base scan
    arrived — `always=True` repartitions even when a probe would say the
    input is already parallel."""
    spark = _spark()
    target = spark.sparkContext.defaultParallelism
    scan = table(spark, SF_DIR, "orders").select("o_orderkey")
    wide = scan.repartition(target, "o_orderkey")
    # a probe of `wide` would suppress the fanout; always must not
    out = fanout(scan, "o_orderkey", probe=wide, always=True)
    assert out is not scan
    assert out.rdd.getNumPartitions() == target


def test_builder_py4j_call_counts_stay_collapsed():
    """Round-12 builder-chatter pins (round-11 VERDICT "next" #5): the
    F.expr/selectExpr rewrites collapse plan-construction round-trips;
    these ceilings catch a regression back to per-Column chatter.
    Counts are host-independent (they depend only on the code path).
    Measured after the rewrites: logreg 718 (was 6810), fs_weights 1245
    (was 3151); ceilings leave ~2x headroom for legitimate drift."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from py4j_count import count_build

    from quackio_jl_spark.registry import QUERIES

    spark = _spark()
    ceilings = {
        "logreg_gd_training_curve": 1500,
        "linkage_fellegi_sunter_weights": 2500,
    }
    for name, ceiling in ceilings.items():
        QUERIES[name](spark, SF_DIR)  # warm fragments/table cache
        n, _dt = count_build(spark, SF_DIR, name)
        assert n <= ceiling, (
            f"{name} builder makes {n} py4j calls (ceiling {ceiling}) — "
            "per-Column chatter crept back; use the F.expr recipe"
        )


def test_table_cache_keyed_by_session_not_context():
    """ADVICE r11: a DataFrame is bound to its SparkSession — two
    sessions over one context must not share cached handles."""
    spark = _spark()
    clear_table_cache()
    h1 = table(spark, SF_DIR, "orders")
    other = spark.newSession()
    h2 = table(other, SF_DIR, "orders")
    assert h2 is not h1, "newSession() must get its own plan handle"
    assert table(other, SF_DIR, "orders") is h2
    clear_table_cache()
