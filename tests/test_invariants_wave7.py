"""Structural invariants for the round-5 wave-7 operators (multiple
testing, calibration weighting, robust/rank statistics, resampling
inference, corpus laws, span dedup, uplift, long-range dependence) on the
sf0.001 fixture — self-consistency identities complementing the DuckDB
oracle gate."""

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


def test_bh_fdr_ranks_and_prefix_discovery(q):
    rows = sorted(q("nation_acctbal_fdr_bh"), key=lambda r: r["p_rank"])
    m = len(rows)
    assert [r["p_rank"] for r in rows] == list(range(1, m + 1))
    ps = [r["p_value"] for r in rows]
    assert ps == sorted(ps)
    assert all(0.0 <= p <= 1.0 for p in ps)
    # thresholds rise linearly with rank; discoveries form a rank prefix
    ths = [r["bh_threshold"] for r in rows]
    assert ths == sorted(ths)
    flags = [r["discovery"] for r in rows]
    if any(flags):
        last_true = max(i for i, f in enumerate(flags) if f)
        assert all(flags[: last_true + 1])
        assert not any(flags[last_true + 1 :])


def test_raking_calibrates_segment_margins(q):
    rows = q("customer_raking_weights")
    n_all = sum(r["n_cell"] for r in rows)
    segs = {r["segment"] for r in rows}
    by_seg = {s: sum(r["weight"] for r in rows if r["segment"] == s) for s in segs}
    target = n_all / len(segs)
    # the final IPF pass scaled segment margins: they must hit target
    for s, tot in by_seg.items():
        assert tot == pytest.approx(target, rel=1e-6), s
    assert all(r["weight"] > 0 for r in rows)
    assert sum(by_seg.values()) == pytest.approx(n_all, rel=1e-6)


def test_theil_sen_pair_count(q):
    (r,) = q("orders_monthly_theil_sen_trend")
    n = r["n_points"]
    assert r["n_pairs"] == n * (n - 1) // 2


def test_burrows_delta_full_pair_grid(q):
    rows = q("source_burrows_delta")
    sources = {r["source1"] for r in rows} | {r["source2"] for r in rows}
    assert len(rows) == len(sources) * (len(sources) - 1) // 2
    assert all(r["delta_e9"] >= 0 for r in rows)
    assert all(r["n_terms"] >= 1 for r in rows)
    assert all(r["source1"] < r["source2"] for r in rows)


def test_negbin_fit_accounting(q):
    rows = q("customer_order_count_negbin_fit")
    n_obs = sum(r["observed"] for r in rows)
    n_exp = sum(r["expected"] for r in rows)
    # observed column is a partition of the population; expected sums to N
    assert n_exp == pytest.approx(n_obs, rel=1e-6)
    assert all(r["chi2_contrib"] >= 0 for r in rows if r["chi2_contrib"] is not None)
    assert rows[0]["r_hat"] > 0
    assert 0 < rows[0]["q_hat"] < 1


def test_good_turing_bounds(q):
    rows = q("bigram_good_turing_estimates")
    assert len(rows) == 10
    assert all(0.0 <= r["p_unseen"] <= 1.0 for r in rows)
    assert all(r["n_r"] >= 0 and r["n_r_plus_1"] >= 0 for r in rows)
    for r in rows:
        if r["r_star"] is not None:
            assert r["r_star"] >= 0


def test_capture_recapture_consistency(q):
    (r,) = q("corpus_capture_recapture")
    assert r["n_overlap"] <= min(r["n_a"], r["n_b"])
    assert r["n_hat"] > 0
    assert r["se_hat"] >= 0
    # Chapman is consistent: the estimate lands within a few SE of truth
    assert abs(r["n_hat"] - r["n_true"]) <= max(6 * r["se_hat"], 0.5 * r["n_true"])


def test_jackknife_positive_se(q):
    (r,) = q("jackknife_mean_acctbal")
    assert r["jk_se"] > 0
    assert r["g"] == 25


def test_embedding_geometry_bounds(q):
    (r,) = q("embedding_geometry_report")
    assert r["n_pairs"] > 0
    assert -1.0 <= r["min_cos"] <= r["mean_cos"] <= r["max_cos"] <= 1.0
    for f in ("frac_near_dup", "frac_negative"):
        assert 0.0 <= r[f] <= 1.0


def test_permutation_p_value_range(q):
    (r,) = q("ab_permutation_test")
    assert 0 < r["p_value"] <= 1.0
    assert 0 <= r["n_extreme"] <= r["n_perms"]
    assert r["p_value"] == pytest.approx(
        (1 + r["n_extreme"]) / (r["n_perms"] + 1), abs=1e-6
    )


def test_kendall_tau_bounds(q):
    (r,) = q("kendall_tau_qty_discount")
    assert -1.0 <= r["tau_b"] <= 1.0
    n0 = r["n"] * (r["n"] - 1) // 2
    assert r["conc"] + r["disc"] <= n0
    assert r["t_q"] <= n0 and r["t_d"] <= n0


def test_qini_curve_endpoints(q):
    rows = sorted(q("ab_qini_uplift_curve"), key=lambda r: r["decile"])
    # tied-score groups may skip deciles on a small fixture, but the ids
    # are distinct, in range, and the curve always ends at decile 10
    decs = [r["decile"] for r in rows]
    assert decs == sorted(set(decs))
    assert all(1 <= d <= 10 for d in decs)
    assert decs[-1] == 10
    nt = sum(r["n_treated"] for r in rows)
    nc = sum(r["n_control"] for r in rows)
    pt = sum(r["conv_treated"] for r in rows)
    pc = sum(r["conv_control"] for r in rows)
    # last cumulative point covers the whole population
    assert rows[-1]["qini"] == pytest.approx(pt - pc * nt / nc, abs=1e-4)


def test_hurst_shared_slope_and_positive_rs(q):
    rows = q("events_hurst_exponent")
    assert len(rows) == len({r["w"] for r in rows})
    h = rows[0]["hurst_h"]
    assert all(r["hurst_h"] == h for r in rows)
    # the sparse sf0.001 hourly series leaves a single usable block size,
    # where the slope is deliberately NULL (under-determined fit); block
    # sizes with no complete block are excluded from the output entirely
    assert h is None or math.isfinite(h)
    assert all(r["mean_rs"] > 0 for r in rows)
    assert all(r["n_blocks"] > 0 for r in rows)


def test_duplicated_span_fraction_bounds(q):
    rows = q("doc_duplicated_span_fraction")
    for r in rows:
        assert 0 <= r["dup_tokens"] <= r["n_tokens"]
        assert 0.0 <= r["dup_fraction"] <= 1.0
    assert any(r["dup_tokens"] > 0 for r in rows)  # fixture has known dups


def test_bpe_pairs_ranked_two_chars(q):
    rows = q("bpe_top_merge_pairs")
    counts = [r["n_occurrences"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r["pair"]) == 2 for r in rows)


def test_heaps_fit_sane(q):
    (r,) = q("corpus_heaps_law_fit")
    assert 0.0 < r["heaps_beta"] <= 1.0
    assert r["vocab_total"] <= r["tokens_total"]
    assert r["heaps_k"] > 0


def test_quantile_map_monotone_within_source(q):
    rows = q("source_length_quantile_map")
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs = sorted(rs, key=lambda r: r["decile"])
        assert len(rs) == 9, src
        qs = [r["source_q"] for r in rs]
        assert qs == sorted(qs), src
        pq = [r["pooled_q"] for r in rs]
        assert pq == sorted(pq)
        for r in rs:
            assert r["shift"] == pytest.approx(
                r["source_q"] - r["pooled_q"], abs=1e-6
            )
