"""Connected components — the clustering step every dedup pipeline needs
after pair generation: near-dup PAIRS only say "these two match"; keeping
one copy per GROUP requires the transitive closure (A~B, B~C => one
cluster {A,B,C}).

Spark implementation: iterative min-label propagation over the symmetric
edge list — each round every node takes the min label among itself and its
neighbors; fixpoint = every node labeled with the smallest doc_id in its
component. Rounds ~ graph diameter (near-dup clusters are shallow; the
driver loop runs a bounded number of rounds and stops early on
convergence, checked with one tiny count per round). Each round is one
shuffle on the node id. At web scale you'd switch to the large-star/
small-star algorithm (Kiveris et al.) — same DataFrame mechanics, fewer
rounds on skewed graphs; labels persist per round and unpersist after.

Beyond-reference (driver-mandated dedup pipeline, BASELINE.json
north_star; the reference ships no dedup — SURVEY.md §0 Tier map).
The oracle is a DuckDB recursive CTE (min label over the reachability
set), so the driver hash-checks the full transitive closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.registry import query, table
from .dedup import _SHINGLES_SQL, _bands_sql, _minhash_sig_sql, dedup_minhash_lsh_pairs

__all__ = ["connected_components"]


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, cluster) with cluster = min node id reachable from id.

    ``nodes``: one column ``id_col`` (singletons allowed); ``edges``:
    undirected pairs (``src``, ``dst``)."""
    sym = edges.select(
        F.col(src).alias("ea"), F.col(dst).alias("eb")
    ).union(edges.select(F.col(dst).alias("ea"), F.col(src).alias("eb")))
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    labels = labels.persist()
    labels.count()  # materialize
    for _ in range(max_iter):
        prop = (
            sym.join(labels, sym.eb == labels.id)
            .select(F.col("ea").alias("id"), "label")
        )
        new_labels = (
            labels.select("id", "label")
            .union(prop)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    out = labels.select("id", F.col("label").alias("cluster"))
    labels.unpersist()
    return out


@query(
    "dedup_clusters",
    oracle="WITH RECURSIVE"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + f""",
    bands AS (
      {_bands_sql()}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                               AND a.doc_id < b.doc_id
    ),
    sym AS (
      SELECT doc1 AS a, doc2 AS b FROM cand
      UNION ALL SELECT doc2, doc1 FROM cand
    ),
    walk(id, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT sym.a, w.label FROM walk w JOIN sym ON sym.b = w.id
    )
    SELECT id AS doc_id, MIN(label) AS cluster FROM walk GROUP BY id
    """,
)
def dedup_clusters(spark, sf_dir):
    """Every document labeled with its near-dup cluster id (= the smallest
    doc_id in its connected component of the LSH candidate graph;
    singletons label themselves). To keep one copy per group downstream:
    ``filter(doc_id == cluster)``. The oracle computes the same transitive
    closure with a recursive CTE, so the hash check covers multi-hop
    merges, not just direct pairs."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
    return connected_components(
        docs, pairs, id_col="doc_id", src="doc1", dst="doc2"
    ).select(F.col("id").alias("doc_id"), "cluster")


@query(
    "dedup_cluster_sizes",
    oracle="WITH RECURSIVE"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + f""",
    bands AS (
      {_bands_sql()}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                               AND a.doc_id < b.doc_id
    ),
    sym AS (
      SELECT doc1 AS a, doc2 AS b FROM cand
      UNION ALL SELECT doc2, doc1 FROM cand
    ),
    walk(id, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT sym.a, w.label FROM walk w JOIN sym ON sym.b = w.id
    ),
    comp AS (SELECT id, MIN(label) AS cluster FROM walk GROUP BY id)
    SELECT cluster, COUNT(*) AS size FROM comp
    GROUP BY cluster HAVING COUNT(*) > 1
    """,
)
def dedup_cluster_sizes(spark, sf_dir):
    """Size of every non-trivial near-dup cluster — the dedup yield report
    (sum(size-1) rows would be removed by canonicalization)."""
    return (
        dedup_clusters(spark, sf_dir)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("size"))
        .filter(F.col("size") > 1)
    )
