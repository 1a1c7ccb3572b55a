"""Round-6 late-wave invariants: unigram-LM Viterbi segmentation."""

from __future__ import annotations

import pytest

from quackio_jl_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_unigram_viterbi_doc_rollup_and_bounds(spark):
    from pyspark.sql import functions as F

    from quackio_jl_spark.operators.text import UNI_MAXPIECE, UNI_MAXWORD

    rows = QUERIES["unigram_lm_viterbi_segmentation"](spark, SF).collect()
    tok = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(
            (F.length("w") >= 1) & (F.length("w") <= UNI_MAXWORD)
        )
    )
    n_words = tok.count()
    assert sum(r.n_words for r in rows) == n_words
    total_chars = tok.selectExpr("sum(length(w))").collect()[0][0]
    total_pieces = sum(r.n_pieces for r in rows)
    # every word segments into [ceil(len/MAXPIECE), len] pieces
    assert total_pieces <= total_chars
    assert total_pieces * UNI_MAXPIECE >= total_chars
    for r in rows:
        assert r.n_pieces >= r.n_words  # at least one piece per word
        assert r.nll_e6 > 0


def test_unigram_viterbi_prefers_learned_pieces(spark):
    """A document made of one high-frequency word must segment into FEWER
    pieces per word than single characters (the learned multi-char pieces
    actually get used)."""
    from pyspark.sql import functions as F

    rows = QUERIES["unigram_lm_viterbi_segmentation"](spark, SF).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    total_chars = sum(
        sum(len(w) for w in t.split(" ") if 1 <= len(w) <= 64)
        for t in docs.values()
    )
    total_pieces = sum(r.n_pieces for r in rows)
    # corpus-wide fertility strictly beats char-level tokenization
    assert total_pieces < total_chars


def test_huber_downweights_and_shrinks_slope_influence(spark):
    (r,) = QUERIES["lineitem_huber_irls_regression"](spark, SF).collect()
    assert r.n_rows > 0
    assert 0 < r.n_downweighted < r.n_rows  # heavy tail exists, not everything
    # the robust fit differs from OLS (outliers had influence to remove)
    assert (r.slope_huber, r.intercept_huber) != (r.slope_ols, r.intercept_ols)


def test_temperature_scaling_argmin_unique_and_interior(spark):
    rows = sorted(
        QUERIES["quality_temperature_scaling"](spark, SF).collect(),
        key=lambda r: r.t_pct,
    )
    from quackio_jl_spark.operators.learn import TEMP_GRID_PCT

    assert [r.t_pct for r in rows] == list(TEMP_GRID_PCT)
    best = [r for r in rows if r.is_best]
    assert len(best) == 1
    assert best[0].nll_e6 == min(r.nll_e6 for r in rows)
    for r in rows:
        assert r.nll_e6 > 0


def test_holt_winters_matches_python_reference(spark):
    """The integer HW recursion pinned against a literal python
    reimplementation over the same month rollup."""
    from pyspark.sql import functions as F

    from quackio_jl_spark.functions.exact import DEC
    from quackio_jl_spark.operators.text import __name__ as _  # noqa: F401
    from quackio_jl_spark.plans.registry import table
    from quackio_jl_spark.plans.stats import HW_M

    o = table(spark, SF, "orders")
    rows = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double") * 1e4
            )
            .cast("bigint")
            .alias("y4")
        )
        .orderBy("mon")
        .collect()
    )
    ys = [r.y4 for r in rows]
    import math

    l = math.floor(sum(ys[:HW_M]) / HW_M)
    b = math.floor((sum(ys[HW_M : 2 * HW_M]) - sum(ys[:HW_M])) / (HW_M * HW_M))
    s = [y - l for y in ys[:HW_M]]
    sae = 0
    for y in ys[HW_M:]:
        s1 = s[0]
        sae += abs(y - (l + b + s1))
        l_new = math.floor((y - s1 + l + b) / 2)
        b_new = math.floor((l_new - l + 3 * b) / 4)
        s_new = math.floor((y - l_new + 3 * s1) / 4)
        l, b, s = l_new, b_new, s[1:] + [s_new]
    (r,) = QUERIES["orders_monthly_holt_winters"](spark, SF).collect()
    assert r.n_months == len(ys)
    assert (r.level_e4, r.trend_e4, r.sae_e4) == (l, b, sae)
    for h in (1, 2, 3):
        assert getattr(r, f"forecast_{h}_e4") == l + h * b + s[h - 1]


def test_prefix_max_degenerate_equal_keys(spark):
    """All ordering keys equal: the bucket width-0 branch must collapse to
    one bucket and every row must get the global max (RANGE frame: all
    peers included)."""
    from pyspark.sql import functions as F

    from quackio_jl_spark.functions.prefix import bucketed_prefix_max

    df = spark.range(50).select(
        F.lit(7).alias("k"), (F.col("id") % 13).cast("bigint").alias("v")
    )
    out = bucketed_prefix_max(df, "k", "v", n_buckets=8).collect()
    assert len(out) == 50
    assert {r["cum_v"] for r in out} == {12}


def test_cdc_string_boundary_equals_mod64():
    """The round-6 CDC fix: the hex-string predicate substr(md5,7,2) in
    {'00','40','80','c0'} must equal the original first-32-bits %64 == 0
    test for every possible byte value (the equivalence the oracle now
    relies on instead of an engine-sensitive hex cast)."""
    import hashlib

    for i in range(5000):
        h = hashlib.md5(f"probe-{i}".encode()).hexdigest()
        as_int = int(h[:8], 16)
        assert (as_int % 64 == 0) == (h[6:8] in ("00", "40", "80", "c0")), h
