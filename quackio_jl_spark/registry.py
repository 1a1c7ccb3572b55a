"""Single import point that materializes the full query/oracle registry."""

from .plans.registry import ORACLES, QUERIES, query, table  # noqa: F401

# Import-for-side-effect: each module registers its queries on import.
from .plans import analytics, expectations, layout, relational, roundtrip, scalars, stats, tpch, tpch2  # noqa: F401, E402
from .operators import asof, bloom, cluster, dedup, learn, merge, multimodal, pipeline, pq, privacy, retrieval, scoring, selection, similarity, skew, text  # noqa: F401, E402

__all__ = ["QUERIES", "ORACLES", "query", "table"]
