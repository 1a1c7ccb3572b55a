"""Generate PLANS_AUDIT.md: one row per registered query with the
plan-shape facts that matter at 100 TB — shuffle (Exchange) count, join
strategies chosen, whether scan pushdown engaged, and any Python-eval
nodes. Complements the hand-written PLANS.md with complete, regenerable
evidence.

Usage: python tools/plan_audit.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, ".")

JOIN_NODES = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
]
PY_NODES = ["BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"]


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(p: str) -> dict:
    joins = {j: p.count(f") {j}") for j in JOIN_NODES}
    pushed = bool(re.search(r"PushedFilters: \[[^\]]", p))
    return {
        "exchanges": len(re.findall(r"^\(\d+\) Exchange", p, flags=re.MULTILINE)),
        "joins": ", ".join(f"{v}x {j}" for j, v in joins.items() if v) or "—",
        "pushed": "yes" if pushed else "—",
        "python": ", ".join(n for n in PY_NODES if n in p) or "—",
        "topk": "yes" if "TakeOrderedAndProject" in p else "—",
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from quackio_jl_spark.registry import QUERIES
    from quackio_jl_spark.session import get_spark

    spark = get_spark(app_name="plan_audit", cpus=8, driver_memory="8g")
    rows = []
    for name in sorted(QUERIES):
        try:
            rows.append((name, audit(plan_of(QUERIES[name](spark, sf_dir)))))
        except Exception as ex:  # pragma: no cover
            rows.append((name, {"exchanges": "ERR", "joins": str(ex)[:40],
                                "pushed": "", "python": "", "topk": ""}))

    lines = [
        "# PLANS_AUDIT — generated physical-plan facts for every query",
        "",
        f"Regenerate: `python tools/plan_audit.py` (ran at {sf_dir}; plan shape",
        "is data-size-independent up to AQE's runtime join demotions).",
        "Columns: shuffle-Exchange count, join strategies, scan-filter",
        "pushdown engaged, Python-eval nodes (Arrow-batched only, by",
        "design), top-k via TakeOrderedAndProject.",
        "",
        "| query | exchanges | joins | pushdown | python | top-k |",
        "|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        lines.append(
            f"| {name} | {a['exchanges']} | {a['joins']} | {a['pushed']} |"
            f" {a['python']} | {a['topk']} |"
        )
    out = "\n".join(lines) + "\n"
    with open("PLANS_AUDIT.md", "w") as f:
        f.write(out)
    print(f"wrote PLANS_AUDIT.md ({len(rows)} queries)")


if __name__ == "__main__":
    main()
