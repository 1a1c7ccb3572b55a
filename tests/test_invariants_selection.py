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
