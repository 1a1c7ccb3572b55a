"""DuckDB-compat function layer and exact-aggregation helpers."""

import math

from pyspark.sql import functions as F

from quackio_jl_spark.functions import (
    davg,
    dsum,
    list_cosine_similarity,
    list_dot_product,
    list_sum,
    strftime,
    string_split,
)
from quackio_jl_spark.functions.compat import _strftime_to_spark_pattern


def test_strftime_pattern_translation():
    assert _strftime_to_spark_pattern("%Y-%m-%d") == "yyyy-MM-dd"
    assert _strftime_to_spark_pattern("%H:%M:%S") == "HH:mm:ss"


def test_strftime(spark):
    df = spark.sql("SELECT timestamp '2020-03-04 05:06:07' AS ts")
    assert df.select(strftime("ts", "%Y-%m-%d %H").alias("s")).first()["s"] == "2020-03-04 05"


def test_list_functions(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0])], schema="a array<double>, b array<double>"
    )
    r = df.select(
        list_sum("a").alias("s"),
        list_dot_product("a", "b").alias("d"),
        list_cosine_similarity("a", "b").alias("c"),
        string_split(F.lit("x y z"), " ").alias("sp"),
    ).first()
    assert r["s"] == 3.0
    assert r["d"] == 11.0
    assert abs(r["c"] - 0.9838699100999074) < 1e-12
    assert r["sp"] == ["x", "y", "z"]


def test_exact_sum_order_independent(spark):
    """dsum must not vary with partitioning — the whole point."""
    vals = [(float(f"{i}.{i % 97:02d}"),) for i in range(1, 5000)]
    df1 = spark.createDataFrame(vals, schema="v double").repartition(1)
    df32 = spark.createDataFrame(vals, schema="v double").repartition(32)
    s1 = df1.agg(dsum("v").alias("s"), davg("v").alias("a")).first()
    s32 = df32.agg(dsum("v").alias("s"), davg("v").alias("a")).first()
    assert s1["s"] == s32["s"]
    assert s1["a"] == s32["a"]
    assert math.isclose(s1["s"], sum(v for (v,) in vals), rel_tol=1e-9)
