"""Switchable lineage truncation for iterative operators.

Iterative dataflows (PageRank/HITS/Fiedler/PCA/EM/k-center) checkpoint
their per-round state: the logical plan otherwise grows geometrically
(each round references its input several times) and Catalyst's analyzer
blows up after ~6 rounds — caching short-circuits execution but not
analysis. But eager checkpoints also TRUNCATE THE PLAN THE AUDIT SEES:
round-7 VERDICT #2 found `part_fiedler_bisection` reporting "0 exchanges,
no joins" in PLANS_AUDIT.md while being the most expensive bench query,
because tools/plan_audit.py and the live sweep in tests/test_plans.py
could only explain the final post-checkpoint stage. Any scale-hostile
node inside an iteration body was invisible to the audit claiming "zero
CartesianProduct anywhere".

Fix: every iterative operator routes its checkpoints through
:func:`truncate` and its round counts through :func:`audit_rounds`.
Under ``SPARK_GRAFT_AUDIT_NO_CHECKPOINT=1`` (set ONLY by the audit
tools, never by the driver/bench/correctness paths):

- :func:`truncate` becomes identity, so the explained plan contains the
  full iteration body — joins, exchanges, windows and all;
- :func:`audit_rounds` caps unrolled loops at 2 rounds, which exercises
  the per-round body AND the round-to-round composition while keeping
  the un-truncated plan polynomial (10 un-checkpointed Fiedler rounds
  would be ~3^10 analyzer nodes).

Execution semantics are unchanged outside audit mode: with a session
checkpoint dir set (``sc.setCheckpointDir`` — the right choice on a
1000-executor cluster, survives executor loss) a reliable checkpoint is
used; otherwise ``localCheckpoint`` (single-JVM test mode).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_FLAG = "SPARK_GRAFT_AUDIT_NO_CHECKPOINT"


def audit_mode() -> bool:
    return os.environ.get(_FLAG) == "1"


def truncate(df: DataFrame) -> DataFrame:
    """Eagerly checkpoint ``df`` (reliable if the session has a checkpoint
    dir, local otherwise); identity under the audit flag so plan sweeps
    see through iteration bodies."""
    if audit_mode():
        return df
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def audit_rounds(n: int, floor: int = 2) -> int:
    """The round count an unrolled iterative operator should run: ``n``
    normally, ``min(n, floor)`` under the audit flag (enough to audit the
    body and its composition without geometric plan growth)."""
    return min(n, floor) if audit_mode() else n


def truncate_boundary(df: DataFrame) -> DataFrame:
    """Materialize ALWAYS — even in audit mode. For CHAIN BOUNDARIES
    inside composite queries that stack several iterative chains
    (part_spectral_4way = parent Fiedler chain + two induced sub-chains +
    cut statistics referencing the combined labels three times): with
    identity checkpoints the composite's ANALYSIS re-embeds every chain
    at every reference and Catalyst hangs (the audit sweep never returned
    from explain()). Each chain's iteration BODY stays audit-visible
    through the primitive query that owns it (part_fiedler_bisection for
    the Fiedler body); the composite's own audited plan shows its unique
    joins over boundary leaves."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
