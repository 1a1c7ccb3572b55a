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
