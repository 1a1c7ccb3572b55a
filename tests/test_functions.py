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


def test_len_dispatches_on_column_type(spark):
    """DuckDB len() is polymorphic: string length on varchar, element count
    on lists. With the owning DataFrame, len_ dispatches; without it,
    strings only."""
    from quackio_jl_spark.functions.compat import len_

    df = spark.createDataFrame(
        [("abc", [1, 2, 3, 4])], schema="s string, arr array<int>"
    )
    r = df.select(
        len_("s", df).alias("ls"), len_("arr", df).alias("la")
    ).first()
    assert r["ls"] == 3
    assert r["la"] == 4


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


def test_compat_functions_match_duckdb(spark):
    """Each new compat mapping produces the same value DuckDB produces."""
    import duckdb

    from quackio_jl_spark.functions.compat import (
        array_to_string,
        date_part,
        epoch,
        epoch_ms,
        levenshtein,
        list_contains,
        list_distinct,
        list_unique,
        starts_with,
        strptime,
    )

    con = duckdb.connect()
    dk = con.execute("""
      SELECT strptime('2020-03-04 05:06', '%Y-%m-%d %H:%M') AS ts,
             date_part('hour', TIMESTAMP '2020-03-04 05:06:07') AS h,
             date_part('isodow', TIMESTAMP '2020-03-08 00:00:00') AS iso,
             epoch(TIMESTAMP '2020-03-04 05:06:07') AS ep,
             epoch_ms(TIMESTAMP '2020-03-04 05:06:07') AS epms,
             list_contains([1, 2, 3], 2) AS lc,
             list_distinct([1, 2, 2, 3]) AS ld,
             list_unique([1, 2, 2, 3]) AS lu,
             array_to_string(['a', 'b'], '-') AS ats,
             levenshtein('kitten', 'sitting') AS lev,
             starts_with('foobar', 'foo') AS sw
    """).fetchone()

    df = spark.sql(
        "SELECT TIMESTAMP '2020-03-04 05:06:07' AS t, "
        "TIMESTAMP '2020-03-08 00:00:00' AS sun, "
        "array(1, 2, 2, 3) AS l, 'kitten' AS s1, 'sitting' AS s2"
    )
    r = df.select(
        strptime(F.lit("2020-03-04 05:06"), "%Y-%m-%d %H:%M").alias("ts"),
        date_part("hour", "t").alias("h"),
        date_part("isodow", "sun").alias("iso"),
        epoch("t").alias("ep"),
        epoch_ms("t").alias("epms"),
        list_contains(F.array(F.lit(1), F.lit(2), F.lit(3)), 2).alias("lc"),
        list_distinct("l").alias("ld"),
        list_unique("l").alias("lu"),
        array_to_string(F.array(F.lit("a"), F.lit("b")), "-").alias("ats"),
        levenshtein("s1", "s2").alias("lev"),
        starts_with(F.lit("foobar"), "foo").alias("sw"),
    ).first()

    assert r["ts"] == dk[0]
    assert r["h"] == dk[1]
    assert r["iso"] == dk[2]
    assert r["ep"] == dk[3]
    assert r["epms"] == dk[4]
    assert r["lc"] == dk[5]
    assert sorted(r["ld"]) == sorted(dk[6])
    assert r["lu"] == dk[7]
    assert r["ats"] == dk[8]
    assert r["lev"] == dk[9]
    assert r["sw"] == dk[10]


def test_python_udtf_sentence_splitter(spark):
    """Python UDTF (Spark 4 §2.8 surface): a table function exploding each
    document into numbered sentence rows. UDTFs are the sanctioned shape
    for one-row-to-many-rows Python logic (tokenizers, parsers) — the
    lateral-join analogue of the reference's materializer extension point.
    Cross-checked against the pure-JVM posexplode equivalent."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="part_id int, sentence string")
    class SentenceSplit:
        def eval(self, text: str):
            for i, s in enumerate(text.split(". ")):
                if s:
                    yield i, s

    spark.udtf.register("sentence_split", SentenceSplit)
    spark.createDataFrame(
        [(1, "a b. c d. e"), (2, "solo")], "doc_id long, text string"
    ).createOrReplaceTempView("udtf_docs")
    got = {
        (r.doc_id, r.part_id, r.sentence)
        for r in spark.sql(
            "SELECT d.doc_id, s.part_id, s.sentence "
            "FROM udtf_docs d, LATERAL sentence_split(d.text) s"
        ).collect()
    }
    expect = {
        (r.doc_id, r.part_id, r.sentence)
        for r in spark.sql(
            "SELECT doc_id, posexplode(split(text, '\\\\. ')) AS (part_id, sentence) "
            "FROM udtf_docs"
        ).collect()
    }
    assert got == expect and (1, 1, "c d") in got


def test_pandas_grouped_agg_udaf(spark):
    """Grouped-aggregate pandas UDF (Arrow-vectorized UDAF): geometric mean
    per group, checked against the closed-form exp(avg(ln)) computed with
    built-in JVM expressions."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v).mean()))

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 4.0), ("a", 16.0), ("b", 9.0), ("b", 1.0)],
        "g string, x double",
    )
    got = {r.g: r.gm for r in df.groupBy("g").agg(geo_mean("x").alias("gm")).collect()}
    ref = {
        r.g: r.gm
        for r in df.groupBy("g")
        .agg(F.exp(F.avg(F.log("x"))).alias("gm"))
        .collect()
    }
    assert set(got) == {"a", "b"}
    for g in got:
        assert math.isclose(got[g], ref[g], rel_tol=1e-12), (g, got[g], ref[g])


def test_sql_front_door_matches_dataframe_plan(spark):
    """sqlapi.sql over the registered views must agree with the DataFrame
    query registry on the same question."""
    import os

    from quackio_jl_spark import sql
    from quackio_jl_spark.registry import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    got = sql(
        spark,
        sf_dir,
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus",
    ).collect()
    want = (
        QUERIES["projection"](spark, sf_dir).sparkSession.read.parquet(
            f"{sf_dir}/orders.parquet"
        )
        .groupBy("o_orderstatus")
        .count()
        .collect()
    )
    assert {(r["o_orderstatus"], r["n"]) for r in got} == {
        (r["o_orderstatus"], r["count"]) for r in want
    }


def test_seq_asc_empty_when_descending(spark):
    """functions/seq.py::seq_asc — DuckDB range() emptiness semantics:
    empty when hi < lo (Spark's 2-arg sequence would descend), ascending
    run otherwise, NULL-propagating on NULL bounds."""
    from pyspark.sql import functions as F

    from quackio_jl_spark.functions.seq import seq_asc

    df = spark.createDataFrame([(1, 3), (3, 3), (5, 2), (None, 4)], "lo int, hi int")
    rows = {
        (r["lo"], r["hi"]): r["s"]
        for r in df.select(
            "lo", "hi", seq_asc(F.col("lo"), F.col("hi")).alias("s")
        ).collect()
    }
    assert rows[(1, 3)] == [1, 2, 3]
    assert rows[(3, 3)] == [3]
    assert rows[(5, 2)] == []
    assert rows[(None, 4)] is None
