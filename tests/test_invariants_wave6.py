"""Structural invariants of the round-5 wave-6 operators (expectations
audit, deterministic bootstrap, mSPRT, trigram mining, TextRank, grid
DBSCAN), checked on the sf0.001 fixture. The DuckDB oracle gate proves
Spark and DuckDB agree; these prove the shared formulation is
self-consistent (CI brackets the point estimate, DBSCAN roles partition
the point set, PageRank mass is conserved, ...)."""

from __future__ import annotations

import pytest

from quackio_jl_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q(spark):
    def run(name):
        return QUERIES[name](spark, SF).collect()

    return run


def test_expectations_report_consistent(q):
    rows = q("data_quality_expectations")
    assert len(rows) == 10
    assert all(r["ok"] == (r["violations"] == 0) for r in rows)
    assert all(0 <= r["violations"] <= r["total"] for r in rows)
    assert all(r["total"] > 0 for r in rows)
    status = {r["check_name"]: r["ok"] for r in rows}
    # contracts the generated fixture genuinely satisfies must pass ...
    for clean in (
        "orders_custkey_fk",
        "lineitem_orderkey_fk",
        "orders_orderkey_unique",
        "orders_status_domain",
        "customer_acctbal_not_null",
        "part_retailprice_positive",
    ):
        assert status[clean], clean
    # ... and the audit must CATCH the fixture's real contract breaks:
    # line numbers repeat within an order, and order dates run past 1998
    assert not status["lineitem_linenumber_unique"]
    assert not status["orders_orderdate_range"]


def test_bootstrap_ci_brackets_point_estimate(q):
    (r,) = q("bootstrap_revenue_ci")
    assert r["n_replicates"] == 200
    assert r["ci_lo"] <= r["boot_mean"] <= r["ci_hi"]
    # percentile CI of the mean stays near the point estimate
    assert r["ci_lo"] <= r["mean_revenue"] <= r["ci_hi"]
    assert r["ci_lo"] < r["ci_hi"]


def test_msprt_p_value_in_unit_interval(q):
    (r,) = q("ab_test_msprt")
    assert 0.0 < r["p_always_valid"] <= 1.0
    assert r["lambda_stat"] > 0.0
    assert r["var_delta"] > 0.0
    assert r["reject_at_5pct"] == (r["p_always_valid"] < 0.05)


def test_trigrams_ranked_and_positive(q):
    rows = q("events_frequent_trigrams")
    assert 0 < len(rows) <= 10
    counts = [r["n_occurrences"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["n_users"] <= r["n_occurrences"] for r in rows)


def test_textrank_mass_conserved(q):
    rows = q("textrank_keywords")
    assert len(rows) == 20
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # symmetric graph, no dangling nodes: every rank exceeds the
    # teleport floor (1-d)/n, and the top-k is a subset of a
    # distribution that sums to 1 so no score can reach 1
    assert all(0.0 < s < 1.0 for s in scores)
    assert all(len(r["term"]) >= 4 for r in rows)


def test_dbscan_roles_partition_points(q):
    rows = q("embedding_dbscan_grid")
    by_role = {}
    for r in rows:
        by_role.setdefault(r["role"], []).append(r)
    assert set(by_role) <= {"core", "border", "noise"}
    # every point labeled exactly once
    assert len({r["vec_id"] for r in rows}) == len(rows)
    # noise is -1; core/border carry a real cluster (= some core's id)
    core_ids = {r["vec_id"] for r in by_role.get("core", [])}
    for r in by_role.get("noise", []):
        assert r["cluster"] == -1
    for r in by_role.get("core", []) + by_role.get("border", []):
        assert r["cluster"] in core_ids
    # cluster label is the component minimum: no core's cluster exceeds its id
    for r in by_role.get("core", []):
        assert r["cluster"] <= r["vec_id"]
