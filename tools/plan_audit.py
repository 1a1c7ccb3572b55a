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


def _tree_nodes(p: str) -> list[tuple[int, str, int]]:
    """Parse the tree section of a formatted plan into (depth, name, id)
    rows in pre-order. Depth is the column where the node name starts, so
    a node's subtree is the maximal following run of strictly-deeper rows."""
    nodes = []
    for line in p.splitlines():
        if line.startswith("("):  # details section reached
            break
        m = re.search(r"([A-Za-z][A-Za-z0-9 ]*?) \((\d+)\)\s*$", line)
        if m:
            nodes.append((line.index(m.group(1)), m.group(1).strip(), int(m.group(2))))
    return nodes


def _node_detail(p: str, node_id: int) -> str:
    m = re.search(
        rf"^\({node_id}\) .*?(?=^\(\d+\) |\Z)", p, flags=re.MULTILINE | re.DOTALL
    )
    return m.group(0) if m else ""


def _spec_is_partitioned(detail: str) -> bool:
    """A windowspecdefinition lists partition columns FIRST, then order
    columns (tagged ASC/DESC), then the frame. Unpartitioned windows start
    straight at an order column or the frame."""
    m = re.search(r"windowspecdefinition\((.*)", detail, flags=re.DOTALL)
    if not m:
        return True  # no parsable spec: don't flag
    args, depth, first = m.group(1), 0, []
    for ch in args:
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                break
            depth -= 1
        elif ch == "," and depth == 0:
            break
        first.append(ch)
    head = "".join(first).strip()
    return not (
        head.startswith("specifiedwindowframe")
        or re.search(r"\b(ASC|DESC) NULLS (FIRST|LAST)$", head)
    )


def classify_windows(p: str) -> list[str]:
    """Classify every Window node in a formatted plan:

    - ``part``              — has partition columns (scales out)
    - ``unpart-limited``    — no partition columns, but a WindowGroupLimit
                              or TakeOrderedAndProject bounds its input
                              (rank-filter pushdown engaged)
    - ``unpart-kernel``     — the bucketed-prefix kernel's offsets window:
                              input is a HashAggregate grouped on ``_pid``,
                              so the window sees <= n_buckets rows by
                              construction regardless of data size
    - ``unpart-unbounded``  — no partition columns and nothing limits the
                              input: a single-partition sort of whatever
                              feeds it. Fine over provably bounded tables
                              (day/month/bucket rollups), a scale-killer
                              over corpus/dimension-scaled input — the
                              distinction tests/test_plans.py enforces via
                              an explicit waiver list.
    """
    nodes = _tree_nodes(p)
    out = []
    for idx, (depth, name, nid) in enumerate(nodes):
        if name != "Window":
            continue
        if _spec_is_partitioned(_node_detail(p, nid)):
            out.append("part")
            continue
        subtree = []
        for d2, n2, sid in nodes[idx + 1 :]:
            if d2 <= depth:
                break
            subtree.append((n2, sid))
        if any(
            n in ("WindowGroupLimit", "TakeOrderedAndProject")
            for n, _ in subtree
        ):
            out.append("unpart-limited")
            continue
        # the prefix kernel's offsets window orders by the bucket id itself
        # (windowspecdefinition(_pid#N ASC ...)) over the <= n_buckets-row
        # per-bucket aggregate — bounded by construction
        if re.search(
            r"windowspecdefinition\(_pid#\d+ (ASC|DESC)",
            _node_detail(p, nid),
        ):
            out.append("unpart-kernel")
            continue
        out.append("unpart-unbounded")
    return out


def audit(p: str) -> dict:
    joins = {j: p.count(f") {j}") for j in JOIN_NODES}
    pushed = bool(re.search(r"PushedFilters: \[[^\]]", p))
    wins = classify_windows(p)
    wc = {
        c: wins.count(c)
        for c in ("part", "unpart-limited", "unpart-kernel", "unpart-unbounded")
    }
    return {
        "exchanges": len(re.findall(r"^\(\d+\) Exchange", p, flags=re.MULTILINE)),
        "joins": ", ".join(f"{v}x {j}" for j, v in joins.items() if v) or "—",
        "pushed": "yes" if pushed else "—",
        "python": ", ".join(n for n in PY_NODES if n in p) or "—",
        "topk": "yes" if "TakeOrderedAndProject" in p else "—",
        "windows": ", ".join(f"{v}x {c}" for c, v in wc.items() if v) or "—",
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # See through iterative operators: checkpoints become identity and
    # unrolled loops cap at 2 rounds (quackio_jl_spark/lineage.py), so the
    # audited plan contains the FULL iteration body — round-7 VERDICT #2
    # found the Fiedler chain reporting "0 exchanges" because eager
    # localCheckpoints truncated everything the explain could see.
    import os

    os.environ["SPARK_GRAFT_AUDIT_NO_CHECKPOINT"] = "1"
    from quackio_jl_spark.registry import QUERIES
    from quackio_jl_spark.session import get_spark

    spark = get_spark(app_name="plan_audit", cpus=8, driver_memory="8g")
    rows = []
    for name in sorted(QUERIES):
        try:
            rows.append((name, audit(plan_of(QUERIES[name](spark, sf_dir)))))
        except Exception as ex:  # pragma: no cover
            rows.append((name, {"exchanges": "ERR", "joins": str(ex)[:40],
                                "pushed": "", "python": "", "topk": "",
                                "windows": ""}))

    lines = [
        "# PLANS_AUDIT — generated physical-plan facts for every query",
        "",
        f"Regenerate: `python tools/plan_audit.py` (ran at {sf_dir}; plan shape",
        "is data-size-independent up to AQE's runtime join demotions).",
        "Audited under SPARK_GRAFT_AUDIT_NO_CHECKPOINT=1: iterative",
        "operators' checkpoints are identity and loops cap at 2 rounds, so",
        "iteration BODIES are visible (the r7 blind spot). Consequence:",
        "for iterative queries the exchange count tallies the UN-TRUNCATED",
        "2-round plan including lazy recompute duplication — an upper",
        "bound on plan complexity, NOT the runtime shuffle count (at run",
        "time per-round checkpoints keep plan depth O(1)).",
        "Columns: shuffle-Exchange count, join strategies, scan-filter",
        "pushdown engaged, Python-eval nodes (Arrow-batched only, by",
        "design), top-k via TakeOrderedAndProject, window boundedness",
        "(part / unpart-limited / unpart-kernel / unpart-unbounded; the last class is only",
        "acceptable over provably bounded tables — tests/test_plans.py",
        "enforces the waiver list).",
        "",
        "| query | exchanges | joins | pushdown | python | top-k | windows |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        lines.append(
            f"| {name} | {a['exchanges']} | {a['joins']} | {a['pushed']} |"
            f" {a['python']} | {a['topk']} | {a['windows']} |"
        )
    out = "\n".join(lines) + "\n"
    with open("PLANS_AUDIT.md", "w") as f:
        f.write(out)
    print(f"wrote PLANS_AUDIT.md ({len(rows)} queries)")


if __name__ == "__main__":
    main()
