"""Session-scoped fragment cache: materialized-view-style reuse of small,
deterministic, expensive-to-build plan fragments across queries.

Several registered queries share identical derived inputs — the part
co-purchase edge list (PageRank, personalized PageRank, the four spectral
queries, Adamic-Adar) and the near-dup cluster map (cluster sizes,
canonical docs, cluster-aware split). Each query stays STANDALONE — any
one of them, called first on a fresh session, builds what it needs — but
when several run in the same session (the driver's gate, the bench, a
user's notebook), rebuilding the same deterministic fragment is wasted
work. This is the classic materialized-view / result-fragment cache every
warehouse ships; Spark's own exchange-reuse does it within one query,
this does it across queries.

Scope and safety:
- Keyed by (SparkContext id, sf_dir, fragment name): a new session or a
  different dataset never sees a stale entry. Within a session the test
  tables are immutable parquet — the reference engine makes the same
  assumption for its read_* calls.
- Values are persisted DataFrames of SMALL derived fragments (aggregated
  graphs, cluster maps — thousands of rows), never corpus tables; memory
  is bounded by the handful of call sites.
- `clear()` drops every cached fragment (used by tests; a long-running
  service would call it on dataset refresh).
- Caching returns the SAME persisted frame, so results are bit-identical
  to the uncached build by construction (the fragment is deterministic).
"""

from __future__ import annotations

_CACHE: dict = {}


def fragment(spark, sf_dir: str, name: str, build):
    """Return the cached DataFrame for (session, sf_dir, name), building
    and persisting it via ``build()`` on first use."""
    key = (id(spark.sparkContext), sf_dir, name)
    df = _CACHE.get(key)
    if df is None:
        df = build().persist()
        _CACHE[key] = df
    return df


def clear():
    """Unpersist and drop every cached fragment."""
    for df in _CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass
    _CACHE.clear()
