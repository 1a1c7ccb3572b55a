"""Replay the driver's per-round sample against the last committed FULL
correctness artifact (round-7 VERDICT "next" #9).

The driver samples ~50 of the registered queries per round — ~10x more
rounds than full samplings of any given query — so a regression on a
driver-visible row can hide for rounds between samples. This tool makes
that impossible to miss locally:

1. Collect every query name that has EVER appeared in a driver sample
   (`CORRECTNESS_r0*.json`), and specifically every row that was ever
   driver-RED (any of rows/schema/hash false, or err set).
2. Load the newest committed `CORRECTNESS_FULL_r0*.json` (the builder's
   own full-gate artifact, env-stamped).
3. FAIL if any ever-sampled name is missing from the full artifact (a
   query the driver grades was dropped from the registry or waived out
   of the gate), or any ever-red name is not fully green there.

Pure artifact analysis — no Spark, no DuckDB — so it runs in pytest on
every test invocation (tests/test_artifacts.py).

Usage: python tools/sample_sim.py   (exit 1 on findings)
"""

from __future__ import annotations

import glob
import json
import os
import sys

_META = ("_env",)


def _green(rec: dict) -> bool:
    return bool(
        rec.get("rows_match")
        and rec.get("schema_match")
        and rec.get("hash_match")
        and not rec.get("err")
    )


def run(repo: str = ".") -> list[str]:
    samples = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r0*.json")))
    fulls = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_FULL_r0*.json")))
    problems: list[str] = []
    if not fulls:
        return ["no CORRECTNESS_FULL_r0*.json committed — run the full gate"]
    full = {
        k: v
        for k, v in json.load(open(fulls[-1])).items()
        if k not in _META
    }
    ever_sampled: set[str] = set()
    ever_red: dict[str, str] = {}
    for path in samples:
        for name, rec in json.load(open(path)).items():
            if name in _META:
                continue
            ever_sampled.add(name)
            if not _green(rec):
                ever_red[name] = os.path.basename(path)
    for name in sorted(ever_sampled - set(full)):
        problems.append(
            f"{name}: driver has sampled this query but it is ABSENT from "
            f"{os.path.basename(fulls[-1])} — dropped/renamed queries the "
            "driver grades must stay in the full gate"
        )
    for name, where in sorted(ever_red.items()):
        rec = full.get(name)
        if rec is None:
            continue  # already reported above
        if not _green(rec):
            problems.append(
                f"{name}: driver-red in {where} and STILL not green in "
                f"{os.path.basename(fulls[-1])}: {rec}"
            )
    return problems


if __name__ == "__main__":
    found = run()
    for p in found:
        print("FINDING", p)
    print(f"{len(found)} findings")
    sys.exit(1 if found else 0)
