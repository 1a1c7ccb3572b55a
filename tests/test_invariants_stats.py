"""Structural invariants of the continuation-wave operators, checked on
the sf0.001 fixture: identities that must hold for ANY data (shares sum
to 1, base-period indices pin to 1, partitions cover the universe).
These complement the DuckDB oracle gate: the oracle proves Spark and
DuckDB agree; these prove the shared formulation is self-consistent."""

from __future__ import annotations

import math

import pytest

from quackio_jl_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q(spark):
    def run(name):
        return QUERIES[name](spark, SF).collect()

    return run


def test_laspeyres_base_month_is_one(q):
    rows = {r["month"]: r for r in q("monthly_price_index_laspeyres")}
    base = min(rows)
    assert rows[base]["laspeyres_index"] == pytest.approx(1.0, abs=1e-9)


def test_abc_xyz_partitions_parts_and_revenue(q):
    rows = q("part_abc_xyz_matrix")
    assert sum(r["revenue_share"] for r in rows) == pytest.approx(
        1.0, abs=1e-6
    )
    assert {r["abc"] for r in rows} <= {"A", "B", "C"}
    assert {r["xyz"] for r in rows} <= {"X", "Y", "Z"}


def test_gains_table_reaches_full_capture(q):
    rows = sorted(q("quality_gains_lift_table"), key=lambda r: r["decile"])
    assert rows[-1]["cum_capture"] == pytest.approx(1.0, abs=1e-9)
    assert rows[-1]["cum_lift"] == pytest.approx(1.0, abs=1e-6)
    # cumulative capture is monotone
    caps = [r["cum_capture"] for r in rows]
    assert caps == sorted(caps)


def test_theil_total_consistent(q):
    rows = q("theil_index_nation_spend")
    total = rows[0]["theil_total"]
    assert total >= -1e-9
    recomposed = sum(
        r["between_contrib"] + r["income_share"] * r["theil_within"]
        for r in rows
    )
    assert recomposed == pytest.approx(total, abs=1e-6)
    assert sum(r["income_share"] for r in rows) == pytest.approx(
        1.0, abs=1e-6
    )


def test_silhouette_bounds(q):
    for r in q("embedding_simplified_silhouette"):
        assert -1.0 - 1e-9 <= r["mean_silhouette"] <= 1.0 + 1e-9
        assert r["mean_intra_dist"] >= 0
        assert r["mean_nearest_other_dist"] >= 0


def test_js_divergence_bounded_by_ln2(q):
    for r in q("source_js_divergence"):
        assert -1e-9 <= r["jsd_nats"] <= math.log(2) + 1e-9


def test_effect_size_cles_matches_mannwhitney_u(q):
    es = q("ab_test_effect_size_pack")[0]
    mw = q("mannwhitney_u_click_vs_view")[0]
    # CLES = U1 / (n1*n2) by definition — two independent formulations
    assert es["common_language_es"] == pytest.approx(
        mw["u_stat"] / (mw["n_click"] * mw["n_view"]), abs=1e-6
    )


def test_brier_decomposition_identity(q):
    r = q("quality_brier_decomposition")[0]
    assert r["brier"] == pytest.approx(
        r["reliability"] - r["resolution"] + r["uncertainty"]
        + r["within_bin_term"],
        abs=1e-6,
    )
    assert 0 <= r["uncertainty"] <= 0.25 + 1e-9


def test_logrank_observed_equals_expected_total(q):
    rows = q("survival_logrank_by_segment")
    # sum of expected events over groups == total observed events
    assert sum(r["expected"] for r in rows) == pytest.approx(
        sum(r["observed"] for r in rows), abs=1e-3
    )


def test_wilson_interval_contains_rate(q):
    for r in q("ab_test_proportion_z"):
        assert (
            r["wilson_lo"] - 1e-9
            <= r["conversion_rate"]
            <= r["wilson_hi"] + 1e-9
        )
        assert 0 <= r["wilson_lo"] and r["wilson_hi"] <= 1


def test_mmr_first_pick_is_top_relevance(q):
    rows = sorted(q("retrieval_mmr_diversified"), key=lambda r: r["rnk"])
    assert rows[0]["mmr_score"] == pytest.approx(
        0.7 * rows[0]["relevance"], abs=1e-6
    )
    assert rows[0]["relevance"] == max(r["relevance"] for r in rows)


def test_salt_plan_targets(q):
    from quackio_jl_spark.operators.skew import SALT_TARGET_ROWS_PER_TASK

    for r in q("skew_salt_plan"):
        assert r["cnt"] > SALT_TARGET_ROWS_PER_TASK
        assert r["rows_per_salted_key"] <= SALT_TARGET_ROWS_PER_TASK
        assert r["salt_factor"] == math.ceil(
            r["cnt"] / SALT_TARGET_ROWS_PER_TASK
        )
