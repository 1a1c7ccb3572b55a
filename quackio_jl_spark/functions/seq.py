"""Guarded ascending integer sequences.

Spark's two-arg ``sequence(lo, hi)`` picks step = -1 when ``hi < lo`` and
happily DESCENDS (``sequence(8, 5)`` -> ``[8, 7, 6, 5]``), while DuckDB's
``range(lo, hi+1)`` is empty there — so any in-row window/shingle
enumeration whose computed upper bound can fall below the start silently
emits phantom positions on one engine only (or throws on ``element_at(_, 0)``
under ANSI). The explicit-step form ``sequence(lo, hi, 1)`` is NOT a fix:
it raises when ``hi < lo``. The portable semantics — empty when the range
is empty — need a CASE guard, centralized here so every computed-bound
call site shares one audited implementation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["seq_asc"]


def seq_asc(lo: Column, hi: Column, elem_type: str = "int") -> Column:
    """``sequence(lo, hi)`` with DuckDB ``range``-style semantics: returns
    ``[lo .. hi]`` when ``hi >= lo``, ``[]`` when ``hi < lo`` (never
    descends, never throws), and NULL when either bound is NULL (the guard
    is written ``hi < lo ? [] : sequence``, so a NULL comparison falls
    through to ``sequence``'s own NULL propagation). ``elem_type`` must
    name the common integer type of the bounds so the empty branch matches
    the sequence branch's array type."""
    return F.when(hi < lo, F.array().cast(f"array<{elem_type}>")).otherwise(
        F.sequence(lo, hi)
    )
