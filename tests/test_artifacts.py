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


def test_noise_sentinel_builders_unchanged():
    """The movers-table noise controls (bench.NOISE_SENTINELS) must be
    queries the current round did NOT optimize — round 11 optimized all
    21 headline "controls", which broke the normalization premise and
    inflated every extended query's normalized ratio ~1.56x (round-11
    VERDICT "what's wrong" #2). Each sentinel builder's source is pinned
    here: touching one reddens this test until the sentinel is
    consciously rotated out (update bench.NOISE_SENTINELS AND
    tests/sentinel_hashes.json in the same change, with rationale)."""
    import hashlib
    import inspect
    import json

    import bench
    from quackio_jl_spark.registry import QUERIES

    pinned = json.load(open(os.path.join(_REPO, "tests", "sentinel_hashes.json")))
    assert sorted(pinned) == sorted(bench.NOISE_SENTINELS)
    for name, want in pinned.items():
        got = hashlib.sha256(inspect.getsource(QUERIES[name]).encode()).hexdigest()
        assert got == want, (
            f"noise sentinel {name} builder changed — rotate it out of"
            " bench.NOISE_SENTINELS or re-pin consciously"
        )


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
    normalized >1.5x AND >0.5 s movers, labels direction, and lands
    between its markers. With no headline control overlap the noise
    factor is 1.0, so normalized == raw."""
    import bench

    (tmp_path / "BASELINE.md").write_text("# scratch\n")
    prev = {"a": 1.0, "b": 2.0, "c": 0.1, "d": 5.0, "e": 0.0}
    cur = {"a": 2.0, "b": 2.1, "c": 0.3, "d": 1.0, "e": 1.0}
    bench.update_movers_table(str(tmp_path), prev, cur, "test artifacts")
    t = (tmp_path / "BASELINE.md").read_text()
    assert bench._MOVERS_START in t and bench._MOVERS_END in t
    assert (
        "| a | 1.000 | 2.000 | 2.00x | 2.00x | REGRESSION — adjudicate |"
        in t
    )
    assert "| d | 5.000 | 1.000 | 0.20x | 0.20x | improvement |" in t
    assert "| b |" not in t  # 1.05x: under the ratio threshold
    assert "| c |" not in t  # +0.2 s: under the absolute threshold
    assert "| e |" not in t  # zero/new baseline: not comparable


def test_movers_table_normalizes_out_host_drift(tmp_path):
    """Round-10 VERDICT "next" #2: a query that drifted WITH the host
    (same ratio as the reserved sentinel control set) must divide out
    to ~1.0x and not be flagged; a query that outran the host drift
    keeps its normalized excess and is flagged."""
    import bench

    (tmp_path / "BASELINE.md").write_text("# scratch\n")
    controls = bench.NOISE_SENTINELS
    # the whole host got 2x slower...
    prev = {c: 1.0 for c in controls}
    prev.update({"drifted_with_host": 2.0, "really_regressed": 1.0})
    cur = {c: 2.0 for c in controls}
    cur.update({"drifted_with_host": 4.0, "really_regressed": 4.0})
    assert abs(bench.noise_factor(prev, cur) - 2.0) < 1e-9
    bench.update_movers_table(str(tmp_path), prev, cur, "test artifacts")
    t = (tmp_path / "BASELINE.md").read_text()
    # 2x raw == exactly the host factor -> normalized 1.0x, not flagged
    assert "drifted_with_host" not in t
    # 4x raw / 2x host = 2x normalized -> flagged, normalized shown
    assert (
        "| really_regressed | 1.000 | 4.000 | 4.00x | 2.00x |"
        " REGRESSION — adjudicate |" in t
    )
    # the controls themselves (2x raw, 1.0x normalized) are not flagged
    for c in controls:
        assert f"| {c} |" not in t


def _init_artifact_repo(tmp_path):
    """A minimal git repo with one committed round of bench/gate
    artifacts, for exercising the committed-only resolution."""
    import json
    import subprocess

    def git(*args):
        subprocess.run(
            ["git", *args],
            cwd=tmp_path,
            check=True,
            capture_output=True,
            env={
                **os.environ,
                "GIT_AUTHOR_NAME": "t",
                "GIT_AUTHOR_EMAIL": "t@t",
                "GIT_COMMITTER_NAME": "t",
                "GIT_COMMITTER_EMAIL": "t@t",
            },
        )

    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps(
            {
                "n": 1,
                "parsed": {
                    "value": 10.0,
                    "sf": 0.1,
                    "extended_total_sec": 100.0,
                    "n_queries_registered": 558,
                    "queries": {"q1_pricing_summary": 1.5},
                },
            }
        )
    )
    (tmp_path / "BENCH_EXTENDED.json").write_text(
        json.dumps(
            {
                "extended_queries": {"x": 1.0},
                "extended_total_sec": 100.0,
                "sf": 0.1,
            }
        )
    )
    (tmp_path / "CORRECTNESS_FULL_r01.json").write_text(
        json.dumps({"q1": {"err": None}, "_env": {}})
    )
    git("init", "-q")
    git("add", "-A")
    git("commit", "-qm", "artifacts")
    return git


def test_survey_snippet_immune_to_driver_artifact_drop(tmp_path):
    """Round-10 VERDICT "what's wrong" #1 / "next" #1: the driver's
    post-close bench run drops an UNTRACKED BENCH_r{N}.json and rewrites
    the tracked BENCH_EXTENDED.json in place without committing; the
    snippet (and hence the SURVEY pinning test) must not move."""
    import json

    import bench

    _init_artifact_repo(tmp_path)
    before = bench.survey_snippet(str(tmp_path))
    assert "BENCH_r01.json" in before and "100.0 s" in before
    # the driver's post-close drop: newer untracked artifact + in-place
    # rewrite of a tracked one
    (tmp_path / "BENCH_r99.json").write_text(
        json.dumps({"n": 99, "parsed": {"value": 999.0, "sf": 0.1}})
    )
    ext = json.loads((tmp_path / "BENCH_EXTENDED.json").read_text())
    ext["extended_total_sec"] = 999.0
    (tmp_path / "BENCH_EXTENDED.json").write_text(json.dumps(ext))
    assert bench.survey_snippet(str(tmp_path)) == before
    # and the previous-round resolution for the movers table ignores
    # both too (ADVICE r10: never compare a run against its own output)
    prev, label = bench._prev_committed_queries(str(tmp_path))
    assert prev == {"x": 1.0, "q1_pricing_summary": 1.5}
    assert "BENCH_r01.json" in label


def test_artifact_resolution_falls_back_outside_git(tmp_path):
    """A `git archive` export has no .git: resolution degrades to the
    filesystem glob + working-tree read instead of failing."""
    import json

    import bench

    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"n": 1, "parsed": {"value": 10.0, "sf": 0.1}})
    )
    assert bench._tracked_artifacts(str(tmp_path), "BENCH_r[0-9]*.json") == [
        "BENCH_r01.json"
    ]
    d = bench._read_committed_json(str(tmp_path), "BENCH_r01.json")
    assert d["parsed"]["value"] == 10.0
