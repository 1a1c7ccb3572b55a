"""Static oracle-determinism lint wired into the suite (tools/oracle_lint.py).

Round 5's one driver-red query was an oracle construct that behaves
differently across DuckDB builds; these rules keep the corpus free of the
known-hazard constructs. The runtime near-boundary rule (R3) needs a data
dir and a DuckDB pass per round() site, so it runs from the CLI
(`python tools/oracle_lint.py <sf_dir>`) rather than per-test-run — but its
rewriter is unit-tested here so the CLI sweep can be trusted.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "tools")

from oracle_lint import (  # noqa: E402
    WAIVED,
    _blank_line_comments,
    _final_select_pos,
    _inside_aggregate,
    _round_spans,
    lint_correlated_lambdas,
    lint_hex_casts,
    lint_locale_regex,
    lint_output_types,
)


def _oracles():
    from quackio_jl_spark.registry import ORACLES

    return ORACLES


def test_no_unbounded_hex_casts():
    found = {k: v for k, v in lint_hex_casts(_oracles()).items() if k not in WAIVED}
    assert not found, f"hex casts outside the bounded <=8-char idiom: {found}"


def test_no_locale_dependent_regex():
    found = {k: v for k, v in lint_locale_regex(_oracles()).items() if k not in WAIVED}
    assert not found, f"locale-dependent regex constructs: {found}"


def test_no_correlated_list_lambdas():
    """R4: the construct class behind the two-round driver-env divergence —
    list lambdas capturing an outer column. Both prior hits
    (dedup_cdc_chunks, phrase_search_positional) were rewritten to
    UNNEST(range)+WHERE in round 7; nothing may reintroduce the pattern."""
    found = {
        k: v
        for k, v in lint_correlated_lambdas(_oracles()).items()
        if k not in WAIVED
    }
    assert not found, f"correlated list lambdas (rewrite as UNNEST+WHERE): {found}"


def test_correlated_lambda_detector():
    hit = "SELECT list_filter(range(1, 9), i -> substr(text, i, 2) = 'ab') FROM t"
    ok_uncorrelated = "SELECT list_filter(range(1, 9), i -> i % 2 = 0) FROM t"
    # transform arithmetic lambdas are exempt (driver-proven green)
    ok_transform = "SELECT list_transform(range(1, 9), i -> emb[i] * 2) FROM t"
    assert lint_correlated_lambdas({"q": hit})
    assert not lint_correlated_lambdas({"q": ok_uncorrelated})
    assert not lint_correlated_lambdas({"q": ok_transform})


def test_no_non_spark_output_types():
    """R5: DESCRIBE every oracle and ban HUGEINT/unsigned output columns.
    duckdb 1.0.0 fetchdf() renders a HUGEINT sum as float64 (117740 ->
    117740.0) while Spark emits BIGINT — rows+schema match, value hash
    diverges: the demonstrated mechanism behind three driver-red rounds of
    dedup_cdc_chunks (round-7 VERDICT #1). DESCRIBE binds without scanning,
    so the corpus-wide sweep is cheap enough for pytest."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.001")
    found = {
        k: v
        for k, v in lint_output_types(_oracles(), sf_dir).items()
        if k not in WAIVED
    }
    assert not found, f"non-Spark-mappable output types (add CAST): {found}"


def test_output_type_detector():
    assert lint_output_types(
        {"q": "SELECT SUM(r_regionkey) AS s FROM region"},
        "/root/testdata/sf0.001",
    ), "uncast SUM(INT) yields HUGEINT and must be flagged"
    assert not lint_output_types(
        {"q": "SELECT CAST(SUM(r_regionkey) AS BIGINT) AS s FROM region"},
        "/root/testdata/sf0.001",
    )


def test_blank_line_comments_quote_aware():
    """ADVICE r7: an apostrophe inside a -- comment must not open a string
    (it desynced the R3 anchor and R4 paren scan), and -- inside a string
    literal must survive."""
    sql = "SELECT a, -- kernel's offsets\n  '--not a comment' AS s FROM t"
    blanked = _blank_line_comments(sql)
    assert len(blanked) == len(sql)
    assert "kernel" not in blanked
    assert "'--not a comment'" in blanked
    # the desync case: comment apostrophe before the final SELECT
    sql2 = "WITH a AS (SELECT 1 AS x) -- prefix_max's anchor\nSELECT round(x, 3) AS r FROM a"
    pos = _final_select_pos(_blank_line_comments(sql2))
    assert sql2[pos : pos + 6] == "SELECT" and pos > sql2.index(")")


def test_final_select_pos_is_paren_depth_aware():
    """ADVICE r6: the anchor must not land inside a scalar subquery of the
    output projection (previously: LAST 'SELECT' substring)."""
    sql = (
        "WITH a AS (SELECT 1 AS x FROM t) "
        "SELECT round(y, 8) AS r, (SELECT max(x) FROM a) AS mx FROM a"
    )
    pos = _final_select_pos(sql)
    # lands on the top-level SELECT, before BOTH rounds/subqueries
    assert sql[pos : pos + 6] == "SELECT" and pos > sql.index(")")
    assert pos < sql.index("round(y")
    spans = _round_spans(sql, pos)
    assert len(spans) == 1 and spans[0][3] == 8


def test_round_span_parser():
    sql = "WITH a AS (SELECT round(x, 3) FROM t) SELECT round(y / (z + round(w, 2)), 8) AS r FROM a"
    spans = _round_spans(sql, sql.rindex("SELECT"))
    # outermost only: the nested round(w, 2) is inside the first span
    assert len(spans) == 1
    _, _, expr, d = spans[0]
    assert d == 8 and "round(w, 2)" in expr


def test_inside_aggregate_detection():
    sql = "SELECT SUM(CAST(round(v, 8) AS DECIMAL(28,10))) AS s, round(u, 6) AS r FROM t"
    start = 0
    inner = sql.index("round(v")
    outer = sql.index("round(u")
    assert _inside_aggregate(sql, start, inner)
    assert not _inside_aggregate(sql, start, outer)
