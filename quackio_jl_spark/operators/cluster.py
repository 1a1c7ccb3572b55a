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


# ------------------------------------------------------------- PageRank-lite

PR_DAMPING = 0.85
_PR_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(28,12))) AS DOUBLE)"

_PR_GRAPH_SQL = """
    pairs AS (
      SELECT a.l_partkey AS part1, b.l_partkey AS part2
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY part1, part2 HAVING COUNT(*) >= 2
    ),
    edges AS (
      SELECT part1 AS src, part2 AS dst FROM pairs
      UNION ALL SELECT part2, part1 FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    deg AS (SELECT src AS id, COUNT(*) AS d FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM nodes)
"""


def _pr_round_sql(prev: str, out: str) -> str:
    contrib = _PR_DSUM.format(x=f"{prev}.r / deg.d")
    return f"""
    {out}_c AS (
      SELECT e.dst AS id, {contrib} AS c
      FROM edges e JOIN {prev} ON {prev}.id = e.src JOIN deg ON deg.id = e.src
      GROUP BY e.dst
    ),
    {out} AS (
      SELECT nodes.id,
        CAST({(1 - PR_DAMPING)!r} AS DOUBLE) / nn.n
          + CAST({PR_DAMPING!r} AS DOUBLE) * COALESCE({out}_c.c, 0.0) AS r
      FROM nodes CROSS JOIN nn LEFT JOIN {out}_c ON {out}_c.id = nodes.id
    )"""


@query(
    "part_pagerank",
    oracle=f"""
    WITH {_PR_GRAPH_SQL},
    r0 AS (SELECT id, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
    {_pr_round_sql('r0', 'r1')},
    {_pr_round_sql('r1', 'r2')}
    SELECT id AS part, r AS rank FROM r2
    """,
)
def part_pagerank(spark, sf_dir):
    """PageRank (2 unrolled power iterations, d=0.85) over the part
    co-occurrence graph: which parts sit at the center of shared baskets.
    Per round: one join edges x ranks (shuffle on src), one decimal-exact
    contribution aggregate on dst (order-independent, so ranks are
    bit-reproducible), one broadcast of the scalar node count. Unrolling
    keeps the whole 2-round computation a single declarative plan; a
    production run loops the same round function with persist() per
    iteration like connected_components does. Dangling-node mass is not
    redistributed (both engines agree on the same simplification)."""
    prs = dedup_minhash_lsh_pairs  # noqa: F841  (namespacing hint only)
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = l.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part1"))
    b = l.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("part2"))
    pairs = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("part1") < F.col("part2")))
        .groupBy("part1", "part2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .select("part1", "part2")
    )
    edges = pairs.select(
        F.col("part1").alias("src"), F.col("part2").alias("dst")
    ).union(pairs.select(F.col("part2").alias("src"), F.col("part1").alias("dst")))
    nodes = edges.select(F.col("src").alias("id")).distinct()
    deg = edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("d"))
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))

    DEC12 = "decimal(28,12)"

    def pr_round(prev):
        contrib = (
            edges.join(prev.withColumnRenamed("id", "pid"), F.col("src") == F.col("pid"))
            .join(deg.withColumnRenamed("id", "did"), F.col("src") == F.col("did"))
            .groupBy(F.col("dst").alias("id"))
            .agg(
                F.sum((F.col("r") / F.col("d")).cast(DEC12))
                .cast("double")
                .alias("c")
            )
        )
        return (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib, "id", "left")
            .select(
                "id",
                (
                    (1 - PR_DAMPING) / F.col("n")
                    + PR_DAMPING * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("r"),
            )
        )

    r0 = nodes.crossJoin(F.broadcast(nn)).select("id", (F.lit(1.0) / F.col("n")).alias("r"))
    r2 = pr_round(pr_round(r0))
    return r2.select(F.col("id").alias("part"), F.col("r").alias("rank"))


@query(
    "dedup_canonical_docs",
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
    comp AS (SELECT id AS doc_id, MIN(label) AS cluster FROM walk GROUP BY id)
    SELECT cluster, doc_id AS canonical_doc, n_tokens FROM (
      SELECT comp.cluster, d.doc_id,
        len(string_split(d.text, ' ')) AS n_tokens,
        ROW_NUMBER() OVER (PARTITION BY comp.cluster
                           ORDER BY len(string_split(d.text, ' ')) DESC, d.doc_id)
          AS rn
      FROM comp JOIN documents d ON d.doc_id = comp.doc_id) t
    WHERE rn = 1
    """,
)
def dedup_canonical_docs(spark, sf_dir):
    """Canonical document per near-dup cluster, chosen by QUALITY (longest
    first, doc_id tie-break) rather than lowest id — the policy a real
    pipeline wants ('keep the most complete copy'). Cluster labels come
    from connected_components; the per-cluster argmax is a window over the
    tiny (doc, cluster, len) projection. Downstream: semi-join the corpus
    on canonical_doc to materialize the deduplicated training set."""
    from pyspark.sql import Window as W

    clusters = dedup_clusters(spark, sf_dir)
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = W.partitionBy("cluster").orderBy(F.col("n_tokens").desc(), "doc_id")
    return (
        clusters.join(d, "doc_id")
        .select(
            "cluster",
            F.col("doc_id").alias("canonical_doc"),
            "n_tokens",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
