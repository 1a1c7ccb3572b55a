"""Artifact-only regression guards (no Spark, no DuckDB).

The driver samples ~50 of the registered queries per grading round, so a
regression on a driver-visible row could hide for many rounds between
samples. tools/sample_sim.py replays every driver sample ever committed
against the newest full-gate artifact; this test wires it into pytest so
the invariant holds on every run (round-7 VERDICT "next" #9).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "tools")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_driver_sampled_queries_stay_in_full_gate_and_green():
    from sample_sim import run

    problems = run(_REPO)
    assert not problems, "\n".join(problems)


def test_schema_vectors_artifact_has_zero_mismatches():
    """SCHEMA_VECTORS.json (tools/schema_vectors.py — regenerate after
    adding queries) must show 0 cross-engine output-type mismatches: any
    DECIMAL-vs-DOUBLE / HUGEINT-vs-BIGINT drift in an oracle's output is
    a latent driver-red even when values compare equal row-by-row."""
    import json

    for artifact in ("SCHEMA_VECTORS.json", "SCHEMA_VECTORS_SF0.01.json"):
        path = os.path.join(_REPO, artifact)
        assert os.path.exists(path), (
            f"run: python tools/schema_vectors.py <sf_dir> {artifact}"
        )
        s = json.load(open(path))["_summary"]
        assert s["mismatches"] == 0, (artifact, s)


def test_survey_round_close_numbers_match_committed_artifacts():
    """Round-9 VERDICT "next" #5: SURVEY.md's round-close numbers must be
    GENERATED from the committed artifacts, never hand-typed (r9's prose
    quoted 189.6 s against a committed 172.246 s). The pinned snippet
    between the SURVEY_SNIPPET markers must equal what bench.py derives
    from the artifacts right now — regenerate with
    `python bench.py --survey-snippet` after any artifact change."""
    import bench

    snippet = bench.survey_snippet(_REPO)
    text = open(os.path.join(_REPO, "SURVEY.md")).read()
    assert bench._SNIPPET_START in text and bench._SNIPPET_END in text
    block = text.split(bench._SNIPPET_START)[1].split(bench._SNIPPET_END)[0]
    assert block.strip() == snippet, (
        "SURVEY.md round-close numbers drifted from the committed "
        "artifacts — run `python bench.py --survey-snippet`"
    )


def test_movers_table_thresholds(tmp_path):
    """The per-query movers table (round-9 VERDICT "next" #6) flags only
    >1.5x AND >0.5 s movers, labels direction, and lands between its
    markers."""
    import bench

    (tmp_path / "BASELINE.md").write_text("# scratch\n")
    prev = {"a": 1.0, "b": 2.0, "c": 0.1, "d": 5.0, "e": 0.0}
    cur = {"a": 2.0, "b": 2.1, "c": 0.3, "d": 1.0, "e": 1.0}
    bench.update_movers_table(str(tmp_path), prev, cur, "test artifacts")
    t = (tmp_path / "BASELINE.md").read_text()
    assert bench._MOVERS_START in t and bench._MOVERS_END in t
    assert "| a | 1.000 | 2.000 | 2.00x | REGRESSION — adjudicate |" in t
    assert "| d | 5.000 | 1.000 | 0.20x | improvement |" in t
    assert "| b |" not in t  # 1.05x: under the ratio threshold
    assert "| c |" not in t  # +0.2 s: under the absolute threshold
    assert "| e |" not in t  # zero/new baseline: not comparable
