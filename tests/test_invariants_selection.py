"""Structural invariants of the data-selection operators
(quackio_jl_spark/operators/selection.py), checked on the sf0.001 fixture.
These complement the DuckDB oracle gate: the oracle proves Spark and
DuckDB agree; these prove the shared formulation is self-consistent."""

from __future__ import annotations

import pytest

from quackio_jl_spark.operators.selection import (
    BLOCK_THRESHOLD,
    CONTAIN_THRESHOLD,
    SCRUB_MIN_DOCS,
)
from quackio_jl_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q(spark):
    def run(name):
        return QUERIES[name](spark, SF).collect()

    return run


def test_dsir_covers_corpus_and_target_skews_positive(q, spark):
    rows = q("dsir_importance_weights")
    n_docs = (
        spark.read.parquet(f"{SF}/documents.parquet").count()
    )
    assert len(rows) == n_docs  # every document gets a weight
    assert all(r["n_toks"] > 0 for r in rows)
    # The target slice IS part of the raw corpus, so target documents must
    # average a higher importance weight than non-target ones.
    langs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    tgt = [r["log_iw"] / r["n_toks"] for r in rows if langs[r["doc_id"]] == "en"]
    rest = [r["log_iw"] / r["n_toks"] for r in rows if langs[r["doc_id"]] != "en"]
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_blocklist_score_bounds_and_keep_flag(q):
    rows = q("blocklist_filter_report")
    for r in rows:
        assert 0 <= r["n_flagged"] <= r["n_toks"]
        # max lexicon weight is 1.0 per token -> score bounded by hit rate
        # (tolerance: flag_score is rounded to 8 decimals, so it may sit
        # up to 5e-9 above the exact bound)
        assert 0.0 <= r["flag_score"] <= r["n_flagged"] / r["n_toks"] + 1e-8
        assert r["keep"] == (r["flag_score"] < BLOCK_THRESHOLD)
    # the threshold must split the corpus non-trivially
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)


def test_scrub_fraction_consistent_with_counts(q):
    rows = q("boilerplate_scrub_report")
    for r in rows:
        assert 0 <= r["n_scrubbed"] <= r["n_segments"]
        assert r["frac_scrubbed"] == pytest.approx(
            r["n_scrubbed"] / r["n_segments"], abs=1e-8
        )
    assert SCRUB_MIN_DOCS >= 2  # a 1-doc threshold would scrub everything


def test_containment_bounds_and_flag(q):
    rows = q("decontamination_containment")
    for r in rows:
        assert 0 < r["containment"] <= 1.0 + 1e-9
        assert r["n_shared"] >= 1
        assert r["flagged"] == (r["containment"] >= CONTAIN_THRESHOLD)
        # a train doc never pairs with itself (bench/train are disjoint)
        assert r["train_doc"] != r["bench_doc"]


def test_doremi_weights_normalize_and_order_by_kl(q):
    rows = q("doremi_domain_weights")
    assert sum(r["weight"] for r in rows) == pytest.approx(1.0, abs=1e-6)
    for r in rows:
        assert r["kl_nats"] >= -1e-9  # KL is non-negative
    # weights are a monotone function of KL (uniform baseline, eta > 0)
    by_kl = sorted(rows, key=lambda r: r["kl_nats"])
    ws = [r["weight"] for r in by_kl]
    assert ws == sorted(ws)


def test_epoch_plan_conserves_budget_and_decay_bounds(q, spark):
    rows = q("token_budget_epoch_plan")
    total_u = sum(r["u_tokens"] for r in rows)
    total_b = sum(r["budget_tokens"] for r in rows)
    # floor-rounding loses at most |sources| * (u_total * 1e-8 + 1) tokens
    assert total_b <= 4 * total_u
    assert total_b >= 4 * total_u * 0.999
    for r in rows:
        # effective tokens: at least the unique set (if repeated at all),
        # never more than the budget actually spent
        assert r["eff_tokens"] <= r["budget_tokens"] + 1e-6
        if r["epochs"] >= 1:
            assert r["eff_tokens"] >= r["u_tokens"] - 1e-6
        assert 0 < r["efficiency"] <= 1.0 + 1e-9
        assert r["diminishing"] == (r["efficiency"] < 0.75)
    # T=2 temperature: smaller sources get MORE epochs
    by_u = sorted(rows, key=lambda r: r["u_tokens"])
    eps = [r["epochs"] for r in by_u]
    assert eps == sorted(eps, reverse=True)


def test_packing_report_fill_bounds(q):
    rows = q("packing_efficiency_report")
    assert rows  # at least one language stream
    for r in rows:
        assert r["n_contexts"] >= 1
        avg_fill = r["total_tokens"] / (r["n_contexts"] * 256)
        assert 0 < r["min_fill"] <= avg_fill <= r["max_fill"]
        assert 0 <= r["n_overfull"] <= r["n_contexts"]
        # cumsum packing can overfill only by one straddling chunk
        # (chunk <= 32 tokens on a 256 budget)
        assert r["max_fill"] <= 1.0 + 32.0 / 256.0 + 1e-9


def test_preference_pairs_margins_positive_and_ranked(q):
    rows = q("preference_pairs_by_quality")
    by_lang = {}
    for r in rows:
        assert r["margin"] > 0  # chosen strictly better (equal pairs filtered)
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["pair_rank"])
        margins = [r["margin"] for r in rs]
        # pair 1 = best-vs-worst: margins shrink as ranks meet in the middle
        assert margins == sorted(margins, reverse=True)
        chosen = {r["chosen_doc"] for r in rs}
        rejected = {r["rejected_doc"] for r in rs}
        assert len(chosen) == len(rs) and len(rejected) == len(rs)


def test_stage_fingerprints_monotone_and_stable(q, spark):
    rows = {r["stage"]: r for r in q("corpus_stage_fingerprints")}
    assert set(rows) == {"1_raw", "2_exact_dedup", "3_quality", "4_blocklist"}
    n_raw = rows["1_raw"]["n_docs"]
    for stage, r in rows.items():
        assert 0 < r["n_docs"] <= n_raw  # every stage is a subset of raw
        assert r["fingerprint"] > 0
    # rerun must reproduce identical fingerprints (determinism contract)
    again = {r["stage"]: r for r in q("corpus_stage_fingerprints")}
    assert {s: (r["n_docs"], r["fingerprint"]) for s, r in rows.items()} == {
        s: (r["n_docs"], r["fingerprint"]) for s, r in again.items()
    }


def test_ensemble_votes_consistent(q, spark):
    rows = q("quality_ensemble_vote")
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n_docs  # inner joins must not drop documents
    for r in rows:
        votes = sum(
            r[v] for v in ("v_logistic", "v_gopher", "v_ccnet", "v_blocklist")
        )
        assert r["n_keep_votes"] == votes
        assert r["consensus_keep"] == (votes >= 3)
    kept = sum(r["consensus_keep"] for r in rows)
    assert 0 < kept < len(rows)  # the consensus splits non-trivially


def test_caption_pairs_budget_and_quality_gates(q):
    rows = q("multimodal_caption_pairs")
    assert rows
    for r in rows:
        assert r["image_doc"] % 3 == 0  # image-typed side only
        assert r["caption_doc"] == r["image_doc"] + 1  # pairing key
        assert r["caption_tokens"] <= 64
        assert r["caption_quality"] >= 0.5
        assert r["n_bytes"] > 0


def test_length_octave_weights_inverse_to_share(q):
    rows = q("length_bucket_resample_weights")
    assert sum(r["actual_share"] for r in rows) == pytest.approx(1.0, abs=1e-6)
    k = len(rows)
    for r in rows:
        # weight * actual_share == 1/k (uniform target), up to rounding
        assert r["weight"] * r["actual_share"] == pytest.approx(
            1.0 / k, rel=1e-4
        )
        assert r["min_tokens"] <= r["max_tokens"]
        # octave really is the bit length - 1
        assert (1 << r["octave"]) <= r["max_tokens"] < (1 << (r["octave"] + 1))
        assert (1 << r["octave"]) <= r["min_tokens"]
