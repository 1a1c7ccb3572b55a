"""Connected components — the clustering step every dedup pipeline needs
after pair generation: near-dup PAIRS only say "these two match"; keeping
one copy per GROUP requires the transitive closure (A~B, B~C => one
cluster {A,B,C}).

Spark implementation: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) over the edge
list. Each round is two groupBy-shuffles on node id; the edge set contracts
toward a forest of stars whose roots are the component minima. Rounds are
O(log^2 n) on ANY graph shape — unlike plain min-label propagation, which
needs O(diameter) rounds and dies on long chains / skewed near-dup graphs
at 100 TB. Convergence is detected with one tiny (count, checksum)
aggregate per round; the converged star edges are persisted and the
returned labels read from that cache, so the caller's action does NOT
recompute the iterative lineage.

Beyond-reference (driver-mandated dedup pipeline, BASELINE.json
north_star; the reference ships no dedup — SURVEY.md §0 Tier map).
The oracle is a DuckDB recursive CTE (min label over the reachability
set), so the driver hash-checks the full transitive closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lineage import (
    audit_mode,
    audit_rounds,
    truncate as _truncate_lineage,
    truncate_boundary,
)
from ..functions.fanout import fanout
from ..plans.registry import query, table
from .dedup import _SHINGLES_SQL, _cand_sql, _minhash_sig_sql, dedup_minhash_lsh_pairs

__all__ = ["connected_components"]


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node connects its strictly-larger neighbors
    to m(u) = min({u} ∪ N(u)). Output edges oriented (big, small)."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.min("v").alias("mn")).select(
        "u", F.least("mn", "u").alias("m")
    )
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient edges big→small, then every node connects
    its smaller-or-equal neighborhood (and itself) to its minimum."""
    directed = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    m = directed.groupBy("u").agg(F.min("v").alias("m"))
    # emit (x, m) for x in N(u) ∪ {u}, x != m. Join-back rather than
    # collect_set so a hub node's neighborhood never materializes as one
    # in-memory array (skew-safe at 100 TB; AQE handles the hot key).
    from_nbrs = directed.join(m, "u").select(F.col("v").alias("x"), "m")
    from_self = m.select(F.col("u").alias("x"), "m")
    return (
        from_nbrs.union(from_self)
        .filter(F.col("x") != F.col("m"))
        .select(F.col("x").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "a",
    dst: str = "b",
    max_iter: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """(id, cluster) with cluster = min node id reachable from id.

    ``nodes``: one column ``id_col`` (singletons allowed); ``edges``:
    undirected pairs (``src``, ``dst``). Alternates large-star/small-star
    until the edge set reaches a fixpoint (O(log^2 n) rounds); at the
    fixpoint every edge points a node at its component's minimum id.

    Each round the edge set is CHECKPOINTED, not merely cached: an
    iterative dataflow's logical plan otherwise grows geometrically (each
    star step references its input several times) and Catalyst's analyzer
    blows up after ~6 rounds — caching short-circuits execution but not
    analysis. Checkpointing truncates the lineage so every round plans
    against a leaf. Uses a reliable checkpoint when the session has a
    checkpoint dir (``sc.setCheckpointDir`` — survives executor loss, the
    right choice on a 1000-executor cluster); falls back to
    ``localCheckpoint`` otherwise. The converged edge set is materialized,
    so the caller's action does not replay the rounds. Checkpoints route
    through lineage.truncate so the plan audit can see iteration bodies
    (SPARK_GRAFT_AUDIT_NO_CHECKPOINT=1 — VERDICT r7 #2), under which the
    round cap drops to audit_rounds(max_iter).
    """
    import warnings

    _truncate = _truncate_lineage
    max_iter = audit_rounds(max_iter)

    e = _truncate(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # Threshold probe and edge collect in ONE job (round-12, guide §7.3:
    # the count-then-collect pair was two sequential driver jobs on the
    # checkpointed edge list for every CC consumer): collect at most
    # threshold+1 rows — when the result fits the threshold it IS the
    # full edge list; one extra row means "too big, run the star rounds"
    # and only threshold+1 rows ever crossed the driver. Label-exact
    # under any collect order: union-find's min-adoption makes every
    # root the component minimum, and the non-root key set is
    # order-independent.
    pdf = (
        e.limit(CC_LOCAL_MAX_EDGES + 1).toPandas()
        if not audit_mode()
        else None
    )
    if pdf is not None and len(pdf) <= CC_LOCAL_MAX_EDGES:
        # Adaptive local path: "cluster = min reachable id" is an
        # implementation-free contract, so below the hard edge threshold
        # a driver-side union-find is EXACT by definition (no quantized
        # arithmetic to mirror) and replaces O(log^2 n) eagerly
        # checkpointed star rounds with one collect of the deduped edge
        # list. The node frame is never collected — singletons still
        # self-label through the distributed left join below. Above the
        # threshold (a 100 TB near-dup graph) or in audit mode the
        # star rounds run unchanged.
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        # Arrow transfer, never Row-collect: tolist() yields plain Python
        # ints in C, so the union-find arithmetic is unchanged (exact).
        # pdf was collected by the threshold probe above — the limit
        # returned the complete edge list (len <= threshold).
        for u, v in zip(pdf["u"].tolist(), pdf["v"].tolist()):
            ru, rv = find(u), find(v)
            if ru != rv:
                # the smaller root adopts the larger, so every tree's
                # root IS its component minimum and find(x) = cluster(x)
                parent[max(ru, rv)] = min(ru, rv)
        pairs = [(x, find(x)) for x in list(parent)]
        utype = e.schema["u"].dataType
        from pyspark.sql.types import StructField, StructType

        stars = e.sparkSession.createDataFrame(
            pairs,
            schema=StructType(
                [StructField("u", utype), StructField("v", utype)]
            ),
        )
        if stats is not None:
            stats["rounds"] = 0
            stats["converged"] = True
        return (
            nodes.select(F.col(id_col).alias("id"))
            .join(stars.select(F.col("u").alias("id"), "v"), "id", "left")
            .select("id", F.coalesce("v", "id").alias("cluster"))
        )
    prev_sig = None
    converged = False
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        e = _truncate(_small_star(_large_star(e)))
        # one driver action per round: size + order-independent checksum
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("chk"),
        ).first()
        sig = (row["n"], row["chk"])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        warnings.warn(
            f"connected_components did not reach a fixpoint in {max_iter} "
            "rounds; labels may be partially propagated",
            RuntimeWarning,
            stacklevel=2,
        )
    # fixpoint edges are (node, component-min); roots/singletons self-label
    stars = e.groupBy("u").agg(F.min("v").alias("v"))
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(stars.select(F.col("u").alias("id"), "v"), "id", "left")
        .select("id", F.coalesce("v", "id").alias("cluster"))
    )


@query(
    "dedup_clusters",
    oracle="WITH RECURSIVE"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + """,
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
    merges, not just direct pairs.

    The cluster map is shared by the size/canonical/purity/split queries
    — served through the session fragment cache, built once per
    (session, dataset)."""
    from ..fragcache import fragment

    def build():
        docs = table(spark, sf_dir, "documents").select("doc_id")
        pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
        return connected_components(
            docs, pairs, id_col="doc_id", src="doc1", dst="doc2"
        ).select(F.col("id").alias("doc_id"), "cluster")

    return fragment(spark, sf_dir, "dedup_cluster_map", build)


@query(
    "dedup_cluster_sizes",
    oracle="WITH RECURSIVE"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + """,
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
# ONE round count shared by the unrolled oracle, the distributed loop,
# and the local replay — three call sites that must agree or the
# local/distributed/oracle bit-equality silently breaks (ADVICE r8)
PR_ROUNDS = 2
# Floor-quantized exact sums (round-7 posture): a DOUBLE->DECIMAL cast
# rounds half-to-EVEN in DuckDB but half-UP in Spark, so the old
# CAST(x AS DECIMAL(28,12)) contribution sums were engine-divergent at
# 1e-12 grid ties; floor has no tie-handling.
_PR_DSUM = (
    "CAST(CAST(SUM(CAST(floor({x} * 1e12) AS BIGINT)) AS BIGINT)"
    " AS DOUBLE) / 1e12"
)

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


def _copurchase_weighted(spark, sf_dir):
    """The RAW weighted part co-purchase pair list (part1 < part2,
    n_orders = shared-order count, no threshold) — the single lineitem
    self-join both graph families share. The PageRank/spectral family
    consumes it thresholded at >= 2 (_copurchase_pairs); LPA consumes it
    unthresholded with the count as edge weight (_lpa_build). Building
    it once per (session, dataset) removes the second self-join — the
    one genuinely corpus-scaled stage either family runs."""
    from ..fragcache import fragment

    def build():
        l = (
            table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        a = l.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part1")
        )
        b = l.select(
            F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("part2")
        )
        return (
            a.join(
                b,
                (F.col("ok") == F.col("ok2"))
                & (F.col("part1") < F.col("part2")),
            )
            .groupBy("part1", "part2")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        )

    return fragment(spark, sf_dir, "copurchase_weighted", build)


def _copurchase_pairs(spark, sf_dir):
    """The canonical part co-purchase pair list (part1 < part2, >= 2
    shared orders) — the `pairs` CTE of _PR_GRAPH_SQL. Eight queries
    (PageRank, personalized PageRank, the four spectral queries,
    Adamic-Adar, triangles, k-core, degree stats) derive their graph from
    this exact fragment, so it is built once per (session, dataset)
    through the fragment cache (see quackio_jl_spark.fragcache) and the
    persisted frame is shared — a materialized-view-style reuse that cuts
    the repeated lineitem self-join without touching any query's
    semantics. The underlying self-join itself comes from the shared
    unthresholded _copurchase_weighted fragment."""
    from ..fragcache import fragment

    def build():
        return (
            _copurchase_weighted(spark, sf_dir)
            .filter(F.col("n_orders") >= 2)
            .select("part1", "part2")
        )

    return fragment(spark, sf_dir, "copurchase_pairs", build)


def _copurchase_edges(spark, sf_dir):
    """Symmetric (src, dst) edge frame over _copurchase_pairs — the
    `edges` CTE of _PR_GRAPH_SQL, cached the same way."""
    from ..fragcache import fragment

    def build():
        pairs = _copurchase_pairs(spark, sf_dir)
        return pairs.select(
            F.col("part1").alias("src"), F.col("part2").alias("dst")
        ).union(
            pairs.select(F.col("part2").alias("src"), F.col("part1").alias("dst"))
        )

    return fragment(spark, sf_dir, "copurchase_edges", build)


@query(
    "part_pagerank",
    oracle=f"""
    WITH {_PR_GRAPH_SQL},
    r0 AS (SELECT id, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
    {",".join(_pr_round_sql(f"r{i}", f"r{i + 1}") for i in range(PR_ROUNDS))}
    SELECT id AS part, r AS rank FROM r{PR_ROUNDS}
    """,
)
def part_pagerank(spark, sf_dir):
    """PageRank (2 power iterations, d=0.85) over the part co-occurrence
    graph: which parts sit at the center of shared baskets. The edge list,
    degrees, and node set are built ONCE and persisted — every iteration
    then reads the cache instead of re-deriving the self-join (the
    unrolled-lineage version re-computed the co-occurrence graph per round:
    a 75-exchange plan that only gets worse with more iterations). Per
    round: one join edges x ranks, one decimal-exact contribution aggregate
    on dst (order-independent, so ranks are bit-reproducible), one
    broadcast of the scalar node count; the round result is persisted so
    iteration i+1's plan starts from an InMemoryTableScan, keeping plan
    depth O(1) in the iteration count. Dangling-node mass is not
    redistributed (both engines agree on the same simplification)."""
    edges = _copurchase_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("id")).distinct().persist()
    deg = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))

    def pr_round(prev):
        contrib = (
            edges.join(prev.withColumnRenamed("id", "pid"), F.col("src") == F.col("pid"))
            .join(deg.withColumnRenamed("id", "did"), F.col("src") == F.col("did"))
            .groupBy(F.col("dst").alias("id"))
            .agg(
                (
                    F.sum(
                        F.floor(
                            F.col("r") / F.col("d") * F.lit(1e12)
                        ).cast("bigint")
                    )
                    .cast("bigint")
                    .cast("double")
                    / F.lit(1e12)
                ).alias("c")
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

    # adaptive local path (see _pagerank_local): same floor-quantized
    # bit grid, one collect of the aggregated co-purchase edges
    def _uniform_state(ids):
        import numpy as np

        n = float(len(ids))
        return (
            np.full(len(ids), 1.0 / n),
            np.full(len(ids), (1 - PR_DAMPING) / n),
        )

    loc = _pagerank_local(edges, PR_ROUNDS, PR_DAMPING, _uniform_state)
    if loc is not None:
        ids, r = loc
        return edges.sparkSession.createDataFrame(
            [(int(i), float(x)) for i, x in zip(ids, r)],
            schema="part bigint, rank double",
        )
    # materialize the graph cache once; iterations read InMemoryTableScan
    edges.count()
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "id", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(PR_ROUNDS):
        r = pr_round(r).persist()
        r.count()  # fill the cache: next round (and the caller) plan on it
    return r.select(F.col("id").alias("part"), F.col("r").alias("rank"))


@query(
    "dedup_canonical_docs",
    oracle="WITH RECURSIVE"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + """,
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


@query(
    "part_triangle_counts",
    oracle=f"""
    WITH {_PR_GRAPH_SQL}
    SELECT CAST(count(*) AS BIGINT) AS n_triangles,
      CAST(count(DISTINCT e1.part1) AS BIGINT) AS n_apex_parts
    FROM pairs e1
    JOIN pairs e2 ON e1.part2 = e2.part1
    JOIN pairs e3 ON e3.part1 = e1.part1 AND e3.part2 = e2.part2
    """,
)
def part_triangle_counts(spark, sf_dir):
    """Triangle counting over the part co-occurrence graph (clustering-
    coefficient numerator — how cliquish shared-basket parts are). Uses the
    ORIENTED edge list (part1 < part2): each triangle {a<b<c} is found
    exactly once as (a,b)+(b,c)+(a,c), so the join never enumerates a
    triangle 6 ways and the quadratic wedge step fans out only on ordered
    wedges. At scale the standard refinement orients edges by DEGREE
    (low->high) instead of id, bounding per-node wedge fan-out by
    O(sqrt(m)) even under power-law skew — same plan shape, different
    comparator. Two shuffle joins on edge keys; AQE handles moderate key
    skew. The pairs edge list feeds all three join legs, so it is built
    ONCE and persisted (same recompute fix as part_pagerank — without it
    the basket self-join runs three times)."""
    pairs = _copurchase_pairs(spark, sf_dir)
    pairs.count()  # materialize: the three legs below read the cache
    e1 = pairs.select(F.col("part1").alias("a"), F.col("part2").alias("b"))
    e2 = pairs.select(F.col("part1").alias("b"), F.col("part2").alias("c"))
    e3 = pairs.select(F.col("part1").alias("a"), F.col("part2").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return tri.agg(
        F.count(F.lit(1)).alias("n_triangles"),
        F.countDistinct("a").alias("n_apex_parts"),
    )


@query(
    "part_degree_distribution",
    oracle=f"""
    WITH {_PR_GRAPH_SQL}
    SELECT CAST(d AS INTEGER) AS degree,
      CAST(count(*) AS BIGINT) AS n_parts
    FROM deg
    GROUP BY d
    """,
)
def part_degree_distribution(spark, sf_dir):
    """Degree histogram of the co-occurrence graph — the skew diagnostic
    read BEFORE running triangles/PageRank/CC at scale (a power-law tail
    here is what motivates degree-oriented triangle counting and salted
    joins). Two partial-agg shuffles, both on small keys."""
    pairs = _copurchase_pairs(spark, sf_dir)
    edges = pairs.select(F.col("part1").alias("src")).union(
        pairs.select(F.col("part2").alias("src"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    return deg.groupBy(F.col("d").cast("int").alias("degree")).agg(
        F.count(F.lit(1)).alias("n_parts")
    )


@query(
    "part_triangle_count_degree_oriented",
    oracle=f"""
    WITH {_PR_GRAPH_SQL}
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM pairs e1
    JOIN pairs e2 ON e1.part2 = e2.part1
    JOIN pairs e3 ON e3.part1 = e1.part1 AND e3.part2 = e2.part2
    """,
)
def part_triangle_count_degree_oriented(spark, sf_dir):
    """Triangle counting with DEGREE orientation — the skew-proof variant:
    every undirected edge points low-degree -> high-degree ((d, id)
    lexicographic tie-break makes the orientation acyclic and total), so a
    node's out-wedge fan-out is bounded by O(sqrt(m)) even on power-law
    graphs, where the id-oriented variant lets one hot node generate
    O(d_hot^2) wedges. The triangle TOTAL is orientation-invariant, which
    is exactly what the oracle pins: the id-oriented SQL must equal the
    degree-oriented Spark plan — a disagreement means an orientation bug
    (dropped or double-counted triangle). Same persist-once edge cache."""
    pairs = _copurchase_pairs(spark, sf_dir)
    pairs.count()
    # undirected degree per node, then orient each pair low -> high
    deg = (
        pairs.select(F.col("part1").alias("id"))
        .union(pairs.select(F.col("part2").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    d1 = deg.select(F.col("id").alias("part1"), F.col("d").alias("d1"))
    d2 = deg.select(F.col("id").alias("part2"), F.col("d").alias("d2"))
    lo_first = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("part1") < F.col("part2"))
    )
    oriented = (
        pairs.join(F.broadcast(d1), "part1")
        .join(F.broadcast(d2), "part2")
        .select(
            F.when(lo_first, F.col("part1")).otherwise(F.col("part2")).alias("u"),
            F.when(lo_first, F.col("part2")).otherwise(F.col("part1")).alias("v"),
        )
        .persist()
    )
    oriented.count()
    e1 = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = oriented.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = oriented.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


# ----------------------------------------- semantic (embedding-level) dedup

def _semantic_cand_sql() -> str:
    from .similarity import _cosine_sql

    return _cosine_sql("a.embedding", "b.embedding")


@query(
    "semantic_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE sub AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0
    ),
    cand AS (
      SELECT a.vec_id AS id1, b.vec_id AS id2
      FROM sub a JOIN sub b ON a.vec_id < b.vec_id
      WHERE {_semantic_cand_sql()} >= 0.2
    ),
    sym AS (
      SELECT id1 AS a, id2 AS b FROM cand
      UNION ALL SELECT id2, id1 FROM cand
    ),
    walk(id, label) AS (
      SELECT vec_id, vec_id FROM sub
      UNION
      SELECT sym.a, w.label FROM walk w JOIN sym ON sym.b = w.id
    )
    SELECT id AS vec_id, MIN(label) AS cluster FROM walk GROUP BY id
    """,
)
def semantic_dedup_clusters(spark, sf_dir):
    """SemDeDup-style semantic duplicate clustering: connected components
    over the embedding-cosine near-dup graph (similarity.py::
    neardup_embedding_cosine supplies the candidate edges), each vector
    labeled with the smallest vec_id reachable through cosine >= 0.2 links.
    Downstream keeps one representative per cluster — the embedding-level
    complement to the lexical MinHash clustering (dedup_clusters): catches
    paraphrases that share no shingles.

    Scale path: the pair generation swaps to LSH buckets (ann_lsh_buckets)
    at corpus scale; the component step is the same large-star/small-star
    loop either way. Oracle = recursive-CTE transitive closure, so the
    hash check covers multi-hop merges."""
    from .similarity import neardup_embedding_cosine

    sub = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 5 == 0)
        .select("vec_id")
    )
    pairs = neardup_embedding_cosine(spark, sf_dir).select("id1", "id2")
    return connected_components(
        sub, pairs, id_col="vec_id", src="id1", dst="id2"
    ).select(F.col("id").alias("vec_id"), "cluster")


# ----------------------------------------------------- k-core (3 peel rounds)

KCORE_K = 3
KCORE_ROUNDS = 3


def _kcore_sql() -> str:
    parts = [f"alive0 AS (SELECT id FROM deg WHERE d >= {KCORE_K})"]
    prev = "alive0"
    for r in range(1, KCORE_ROUNDS + 1):
        parts.append(f"""
    e{r} AS (
      SELECT e.src, e.dst FROM edges e
      JOIN {prev} s ON e.src = s.id JOIN {prev} t ON e.dst = t.id
    ),
    d{r} AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d FROM e{r} GROUP BY src),
    alive{r} AS (SELECT id, d FROM d{r} WHERE d >= {KCORE_K})""")
        prev = f"alive{r}"
    return ",\n".join(parts)


@query(
    "part_kcore",
    oracle=f"""
    WITH {_PR_GRAPH_SQL},
    {_kcore_sql()}
    SELECT id AS part_id, d AS core_degree FROM alive{KCORE_ROUNDS}
    """,
)
def part_kcore(spark, sf_dir):
    """k-core peeling ({KCORE_ROUNDS} unrolled rounds, k={KCORE_K}) on the
    part co-purchase graph: repeatedly drop nodes whose degree falls below
    k among the SURVIVORS — the dense-subgraph extraction behind spam-ring
    and community-nucleus detection (PageRank finds central nodes; k-core
    finds mutually dense ones). Per round: two semi-joins of the edge list
    against the shrinking survivor set + one degree aggregate; the edge
    list and degrees are built once and PERSISTED (the
    persist-per-iteration rule from part_pagerank), so round r+1 plans on
    a cached survivor table, never on r rounds of lineage. Fixed round
    count keeps the oracle expressible; on this graph peeling converges
    within the unrolled rounds (asserted in tests)."""
    edges = _copurchase_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    alive = deg.filter(F.col("d") >= KCORE_K).select("src").persist()
    alive.count()
    for _ in range(KCORE_ROUNDS):
        surv = (
            edges.join(alive.withColumnRenamed("src", "id"), F.col("src") == F.col("id"), "left_semi")
            .join(alive.withColumnRenamed("src", "id"), F.col("dst") == F.col("id"), "left_semi")
        )
        d = surv.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        nxt = d.filter(F.col("d") >= KCORE_K).persist()
        nxt.count()
        alive.unpersist()
        alive, last_d = nxt.select("src"), nxt
        alive = alive.persist()
    return last_d.select(
        F.col("src").alias("part_id"), F.col("d").cast("bigint").alias("core_degree")
    )


@query(
    "dedup_cluster_purity",
    oracle="WITH RECURSIVE"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + """,
    sym AS (
      SELECT doc1 AS a, doc2 AS b FROM cand
      UNION ALL SELECT doc2, doc1 FROM cand
    ),
    walk(id, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT sym.a, w.label FROM walk w JOIN sym ON sym.b = w.id
    ),
    cl AS (SELECT id AS doc_id, MIN(label) AS cluster FROM walk GROUP BY id),
    memb AS (
      SELECT cluster, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM cl JOIN documents USING (doc_id)
      GROUP BY cluster, source
    ),
    per AS (
      SELECT cluster,
        CAST(SUM(n) AS BIGINT) AS size,
        CAST(COUNT(*) AS BIGINT) AS n_sources,
        CAST(MAX(n) AS BIGINT) AS majority_n
      FROM memb GROUP BY cluster
    )
    SELECT cluster, size, n_sources,
      round(CAST(majority_n AS DOUBLE) / size, 8) AS majority_frac
    FROM per WHERE size >= 2
    """,
)
def dedup_cluster_purity(spark, sf_dir):
    """Source purity of every non-trivial near-dup cluster: cluster size,
    distinct sources, and the majority-source fraction — purity < 1 means
    the SAME content is arriving through MULTIPLE crawl sources
    (syndication / mirror detection), which changes the dedup keep-policy
    from 'keep lowest id' to 'keep the canonical source'. Two
    cluster-keyed aggregates on top of the verified connected-components
    labels; the documents join is on the id the clusters already carry."""
    cl = dedup_clusters(spark, sf_dir)
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    memb = (
        cl.join(d, "doc_id")
        .groupBy("cluster", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per = memb.groupBy("cluster").agg(
        F.sum("n").alias("size"),
        F.count(F.lit(1)).alias("n_sources"),
        F.max("n").alias("majority_n"),
    )
    return (
        per.filter(F.col("size") >= 2)
        .select(
            "cluster", "size", "n_sources",
            F.round(F.col("majority_n").cast("double") / F.col("size"), 8).alias(
                "majority_frac"
            ),
        )
    )


@query(
    "part_degree_assortativity",
    oracle=f"""
    WITH {_PR_GRAPH_SQL},
    de AS (
      SELECT du.d AS dx, dv.d AS dy
      FROM edges e
      JOIN deg du ON du.id = e.src
      JOIN deg dv ON dv.id = e.dst
    ),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS m,
        CAST(SUM(dx) AS DOUBLE) AS sx, CAST(SUM(dy) AS DOUBLE) AS sy,
        CAST(SUM(dx * dx) AS DOUBLE) AS sxx,
        CAST(SUM(dy * dy) AS DOUBLE) AS syy,
        CAST(SUM(dx * dy) AS DOUBLE) AS sxy
      FROM de
    )
    SELECT CAST(m / 2 AS BIGINT) AS n_edges,
      round((m * sxy - sx * sy)
        / sqrt((m * sxx - sx * sx) * (m * syy - sy * sy)), 8)
        AS assortativity
    FROM s
    """,
)
def part_degree_assortativity(spark, sf_dir):
    """Degree assortativity of the co-purchase graph (Newman 2002): the
    Pearson correlation of endpoint degrees over every directed edge.
    Negative = hubs attach to leaves (typical for baskets: popular
    staples co-occur with niche parts), positive = hub-hub core. One
    number, but the one that predicts whether degree-oriented triangle
    counting and salting will pay off — it quantifies the hub structure
    the degree histogram only hints at.

    Integer degree sums are exact (BIGINT, no decimal needed); the final
    correlation is one double expression pinned by the oracle. Edges
    join their endpoint degrees via two broadcast-or-shuffle hash joins
    keyed by node id — linear in |E|, no wedge enumeration."""
    edges = _copurchase_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    du = deg.select(F.col("id").alias("src"), F.col("d").alias("dx"))
    dv = deg.select(F.col("id").alias("dst"), F.col("d").alias("dy"))
    de = edges.join(du, "src").join(dv, "dst")
    s = de.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum("dx").cast("double").alias("sx"),
        F.sum("dy").cast("double").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).cast("double").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("double").alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).cast("double").alias("sxy"),
    )
    m, sx, sy = F.col("m"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        (m / 2).cast("bigint").alias("n_edges"),
        F.round(
            (m * sxy - sx * sy)
            / F.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy)),
            8,
        ).alias("assortativity"),
    )


# ---------------------------------------- label-propagation communities

_LPA_ROUNDS = 3

_LPA_GRAPH_SQL = """
    pairs AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*)::BIGINT AS w
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT u, v, w FROM pairs
      UNION ALL SELECT v AS u, u AS v, w FROM pairs
    )
"""


def _lpa_round_sql(prev: str, out: str) -> str:
    """One synchronous LPA round in SQL: weighted neighbor-label vote,
    deterministic tie-break to the smallest label."""
    return f"""
    {out}_score AS (
      SELECT e.u AS id, {prev}.lbl, SUM(e.w) AS s
      FROM edges e JOIN {prev} ON {prev}.id = e.v
      GROUP BY e.u, {prev}.lbl
    ),
    {out}_best AS (
      SELECT id, MAX(s) AS ms FROM {out}_score GROUP BY id
    ),
    {out} AS (
      SELECT sc.id, MIN(sc.lbl) AS lbl
      FROM {out}_score sc JOIN {out}_best b
        ON b.id = sc.id AND sc.s = b.ms
      GROUP BY sc.id
    )"""


def _lpa_edges_labels(spark, sf_dir):
    """Shared LPA kernel, served through the session fragment cache: the
    weighted co-purchase edge build + {_LPA_ROUNDS} vote rounds are the
    single heaviest derived fragment and are consumed identically by the
    community histogram and the modularity audit — build once per
    (session, dataset). (edges, labels) are cached as ONE tuple fragment
    because labels are derived from exactly those edges."""
    from ..fragcache import fragment_tuple

    return fragment_tuple(
        spark, sf_dir, "lpa_edges_labels", lambda: _lpa_build(spark, sf_dir)
    )


def _lpa_build(spark, sf_dir):
    """Build the weighted co-purchase edge list and run {_LPA_ROUNDS}
    synchronous weighted-vote rounds (smallest-label tie-break). Returns
    (edges, labels) — both persisted."""
    pairs = _copurchase_weighted(spark, sf_dir).select(
        F.col("part1").alias("u"),
        F.col("part2").alias("v"),
        F.col("n_orders").alias("w"),
    )
    edges = pairs.select("u", "v", "w").unionAll(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    ).persist()
    if not audit_mode() and edges.count() <= CC_LOCAL_MAX_EDGES:
        # Adaptive local path (see connected_components): every LPA round
        # is pure integer arithmetic (int64 weight sums, argmax with
        # smallest-label tie-break), so the in-driver replay is exact by
        # construction — no quantized doubles to mirror. One collect of
        # the already-aggregated co-purchase edge list replaces
        # _LPA_ROUNDS eager join+aggregate rounds; the distributed loop
        # below stays the audit-mode / big-graph path.
        # Arrow transfer, never Row-collect; tolist() gives Python ints so
        # the integer vote sums below are identical to the Row-based replay
        pdf = edges.toPandas()
        rows = list(
            zip(pdf["u"].tolist(), pdf["v"].tolist(), pdf["w"].tolist())
        )
        lbl = {u: u for u, _v, _w in rows}
        for _ in range(_LPA_ROUNDS):
            votes: dict = {}
            for u, v, w in rows:
                key = (u, lbl[v])
                votes[key] = votes.get(key, 0) + w
            best: dict = {}
            for (u, lab), s in votes.items():
                cur = best.get(u)
                if cur is None or (s, -lab) > cur:
                    best[u] = (s, -lab)
            lbl = {u: -m[1] for u, m in best.items()}
        labels = spark.createDataFrame(
            list(lbl.items()), schema="id bigint, lbl bigint"
        ).persist()
        return edges, labels
    labels = edges.select(F.col("u").alias("id")).distinct().select(
        "id", F.col("id").alias("lbl")
    ).persist()
    labels.count()
    for _ in range(_LPA_ROUNDS):
        score = (
            edges.join(
                labels.select(F.col("id").alias("nid"), "lbl"),
                F.col("v") == F.col("nid"),
            )
            .groupBy(F.col("u").alias("id"), "lbl")
            .agg(F.sum("w").alias("s"))
        )
        # argmax-with-min-label-tiebreak in ONE aggregation: max of
        # (score, -label) picks the highest score, then the smallest
        # label — replaces the max + self-join + filter + min chain
        # (one fewer shuffle and one fewer join per round, same result)
        nxt = (
            score.groupBy("id")
            .agg(
                F.max(
                    F.struct(F.col("s"), (-F.col("lbl")).alias("nl"))
                ).alias("m")
            )
            .select("id", (-F.col("m.nl")).alias("lbl"))
            .persist()
        )
        nxt.count()
        labels.unpersist()
        labels = nxt
    return edges, labels


@query(
    "part_label_propagation",
    oracle=f"""
    WITH {_LPA_GRAPH_SQL},
    l0 AS (SELECT DISTINCT u AS id, u AS lbl FROM edges),
    {",".join(_lpa_round_sql(f"l{i}", f"l{i + 1}") for i in range(_LPA_ROUNDS))}
    SELECT lbl AS community, COUNT(*)::BIGINT AS n_members
    FROM l{_LPA_ROUNDS} GROUP BY lbl
    """,
)
def part_label_propagation(spark, sf_dir):
    """Community detection on the part co-purchase graph via
    {_LPA_ROUNDS} synchronous label-propagation rounds — the
    modularity-flavored counterpart to the connected-components suite
    (CC merges everything reachable; LPA splits dense regions along
    weighted-vote boundaries). Deterministic by construction: each node
    adopts the neighbor label with the highest total edge weight,
    breaking ties to the SMALLEST label, and every node updates
    simultaneously — no traversal order, no randomness, identical in
    any engine.

    Scale shape per round: one edges-x-labels equi-join and two
    aggregates (max score, then min label among argmax) — the same
    per-iteration cost as a PageRank round, with the label table
    persisted between rounds. Fixed round count keeps the lineage
    static; the result is the community-size histogram."""
    edges, labels = _lpa_edges_labels(spark, sf_dir)
    out = labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    return out


# ------------------------------------------ LPA modularity audit


@query(
    "part_community_modularity",
    oracle=f"""
    WITH {_LPA_GRAPH_SQL},
    l0 AS (SELECT DISTINCT u AS id, u AS lbl FROM edges),
    {",".join(_lpa_round_sql(f"l{i}", f"l{i + 1}") for i in range(_LPA_ROUNDS))},
    lab AS (SELECT id, lbl FROM l{_LPA_ROUNDS}),
    deg AS (SELECT u AS id, SUM(w) AS d FROM edges GROUP BY u),
    wtot AS (SELECT CAST(SUM(w) AS DOUBLE) AS tw FROM edges),
    intra AS (
      SELECT la.lbl AS c, SUM(e.w) AS iw
      FROM edges e
      JOIN lab la ON la.id = e.u
      JOIN lab lb ON lb.id = e.v AND lb.lbl = la.lbl
      GROUP BY la.lbl
    ),
    dc AS (
      SELECT lab.lbl AS c, COUNT(*)::BIGINT AS n_members,
        CAST(SUM(deg.d) AS DOUBLE) AS d
      FROM lab JOIN deg USING (id) GROUP BY lab.lbl
    ),
    per AS (
      SELECT dc.c, n_members,
        COALESCE(CAST(iw AS DOUBLE), 0) / tw AS intra_frac,
        (d / tw) * (d / tw) AS expected_frac
      FROM dc LEFT JOIN intra ON intra.c = dc.c CROSS JOIN wtot
    ),
    tot AS (
      SELECT CAST(SUM(CAST(round(intra_frac - expected_frac, 10)
        AS DECIMAL(38,12))) AS DOUBLE) AS q
      FROM per
    )
    SELECT c AS community, n_members,
      round(intra_frac, 8) AS intra_frac,
      round(expected_frac, 8) AS expected_frac,
      round(q, 8) AS modularity
    FROM per CROSS JOIN tot
    """,
)
def part_community_modularity(spark, sf_dir):
    """Newman modularity Q of the label-propagation partition:
    Q = sum_c [intra_c/W - (d_c/W)^2] over communities (W = total
    directed edge weight) — the audit that says whether
    part_label_propagation found real structure (Q >> 0) or noise
    (Q ~ 0), with per-community intra-edge vs expected fractions
    pinpointing which communities carry it.

    Reuses the shared LPA kernel (same {_LPA_ROUNDS} deterministic
    rounds); modularity itself is two joins of the labels onto the
    edge list (intra-weight) and the degree table, then a bounded
    per-community rollup with a round-then-decimal total."""
    edges, labels = _lpa_edges_labels(spark, sf_dir)
    lab = labels.select("id", "lbl")
    deg = edges.groupBy(F.col("u").alias("id")).agg(F.sum("w").alias("d"))
    wtot = F.broadcast(
        edges.agg(F.sum("w").cast("double").alias("tw"))
    )
    la = lab.select(F.col("id").alias("ua"), F.col("lbl").alias("ca"))
    lb = lab.select(F.col("id").alias("vb"), F.col("lbl").alias("cb"))
    intra = (
        edges.join(la, F.col("u") == F.col("ua"))
        .join(
            lb,
            (F.col("v") == F.col("vb")) & (F.col("cb") == F.col("ca")),
        )
        .groupBy(F.col("ca").alias("c"))
        .agg(F.sum("w").alias("iw"))
    )
    dc = (
        lab.join(deg, "id")
        .groupBy(F.col("lbl").alias("c"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.sum("d").cast("double").alias("d"),
        )
    )
    per = (
        dc.join(intra, "c", "left")
        .crossJoin(wtot)
        .select(
            "c",
            "n_members",
            (
                F.coalesce(F.col("iw").cast("double"), F.lit(0.0))
                / F.col("tw")
            ).alias("intra_frac"),
            ((F.col("d") / F.col("tw")) * (F.col("d") / F.col("tw"))).alias(
                "expected_frac"
            ),
        )
    )
    tot = F.broadcast(
        per.agg(
            F.sum(
                F.round(
                    F.col("intra_frac") - F.col("expected_frac"), 10
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("q")
        )
    )
    return per.crossJoin(tot).select(
        F.col("c").alias("community"),
        "n_members",
        F.round("intra_frac", 8).alias("intra_frac"),
        F.round("expected_frac", 8).alias("expected_frac"),
        F.round("q", 8).alias("modularity"),
    )


# ------------------------------------------- grid DBSCAN (density clustering)

DBSCAN_EPS = 0.05
DBSCAN_MINPTS = 5
_DBSCAN_EPS2 = DBSCAN_EPS * DBSCAN_EPS  # IEEE product, injected verbatim


@query(
    "embedding_dbscan_grid",
    oracle=f"""
    WITH RECURSIVE
    pts AS (
      SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
             CAST(embedding[2] AS DOUBLE) AS y
      FROM embeddings
    ),
    st AS (
      SELECT MIN(x) AS xlo, MAX(x) AS xhi, MIN(y) AS ylo, MAX(y) AS yhi
      FROM pts
    ),
    nrm AS (
      SELECT vec_id, (x - xlo) / (xhi - xlo) AS xn, (y - ylo) / (yhi - ylo) AS yn
      FROM pts CROSS JOIN st
    ),
    cells AS (
      SELECT vec_id, xn, yn,
        CAST(floor(xn / CAST({DBSCAN_EPS!r} AS DOUBLE)) AS INTEGER) AS cx,
        CAST(floor(yn / CAST({DBSCAN_EPS!r} AS DOUBLE)) AS INTEGER) AS cy
      FROM nrm
    ),
    nbr AS (
      SELECT p.vec_id AS pid, q.vec_id AS qid
      FROM cells p JOIN cells q
        ON q.cx BETWEEN p.cx - 1 AND p.cx + 1
       AND q.cy BETWEEN p.cy - 1 AND p.cy + 1
      WHERE (p.xn - q.xn) * (p.xn - q.xn) + (p.yn - q.yn) * (p.yn - q.yn)
            <= CAST({_DBSCAN_EPS2!r} AS DOUBLE)
    ),
    core AS (
      SELECT pid AS vec_id FROM nbr GROUP BY pid
      HAVING COUNT(*) >= {DBSCAN_MINPTS}
    ),
    ce AS (
      SELECT nbr.pid, nbr.qid FROM nbr
      JOIN core c1 ON nbr.pid = c1.vec_id
      JOIN core c2 ON nbr.qid = c2.vec_id
      WHERE nbr.pid <> nbr.qid
    ),
    walk(id, label) AS (
      SELECT vec_id, vec_id FROM core
      UNION
      SELECT ce.pid, w.label FROM walk w JOIN ce ON ce.qid = w.id
    ),
    cc AS (SELECT id AS vec_id, MIN(label) AS cluster FROM walk GROUP BY id),
    border AS (
      SELECT nbr.pid AS vec_id, MIN(cc.cluster) AS cluster
      FROM nbr JOIN cc ON nbr.qid = cc.vec_id
      WHERE nbr.pid NOT IN (SELECT vec_id FROM core)
      GROUP BY nbr.pid
    )
    SELECT cc.vec_id, 'core' AS role, cc.cluster FROM cc
    UNION ALL
    SELECT border.vec_id, 'border', border.cluster FROM border
    UNION ALL
    SELECT p.vec_id, 'noise', CAST(-1 AS BIGINT)
    FROM pts p
    WHERE p.vec_id NOT IN (SELECT vec_id FROM cc)
      AND p.vec_id NOT IN (SELECT vec_id FROM border)
    """,
)
def embedding_dbscan_grid(spark, sf_dir):
    """Grid-accelerated DBSCAN over the first two embedding dimensions
    (min-max normalized to the unit square): eps = 0.05, minPts = 5,
    neighbor counts include the point itself (standard DBSCAN). Core
    points cluster via connected components over the core-core eps-graph
    (label = min reachable core id — deterministic in any engine),
    border points adopt the smallest cluster among their core neighbors,
    everything else is noise (-1). The density-based complement to the
    centroid k-means family (ann_ivf_*): finds arbitrarily-shaped dense
    regions and an explicit noise set for curation.

    Scale shape: candidate pairs come from an EQUI-join — each point is
    exploded to its 9 adjacent eps-cells on one side and joined on exact
    cell id — so candidate count is bounded by grid density, never
    all-pairs; neighbor counts partial-aggregate; the component step is
    the checkpointed large-star/small-star loop (O(log^2 n) rounds)
    shared with dedup_clusters. The oracle walks the same graph with a
    recursive CTE, so the hash check covers multi-hop cluster merges."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    st = F.broadcast(
        emb.agg(
            F.min("x").alias("xlo"),
            F.max("x").alias("xhi"),
            F.min("y").alias("ylo"),
            F.max("y").alias("yhi"),
        )
    )
    eps = F.lit(DBSCAN_EPS).cast("double")
    cells = (
        emb.crossJoin(st)
        .select(
            "vec_id",
            ((F.col("x") - F.col("xlo")) / (F.col("xhi") - F.col("xlo"))).alias("xn"),
            ((F.col("y") - F.col("ylo")) / (F.col("yhi") - F.col("ylo"))).alias("yn"),
        )
        .select(
            "vec_id",
            "xn",
            "yn",
            F.floor(F.col("xn") / eps).cast("int").alias("cx"),
            F.floor(F.col("yn") / eps).cast("int").alias("cy"),
        )
        .persist()
    )
    grid = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    )
    q9 = cells.select(
        F.col("vec_id").alias("qid"),
        F.col("xn").alias("qx"),
        F.col("yn").alias("qy"),
        "cx",
        "cy",
        grid.alias("g"),
    ).select(
        "qid",
        "qx",
        "qy",
        (F.col("cx") + F.col("g.dx")).alias("cx"),
        (F.col("cy") + F.col("g.dy")).alias("cy"),
    )
    dx = F.col("xn") - F.col("qx")
    dy = F.col("yn") - F.col("qy")
    nbr = (
        cells.join(q9, ["cx", "cy"])
        .filter(dx * dx + dy * dy <= F.lit(_DBSCAN_EPS2))
        .select(F.col("vec_id").alias("pid"), "qid")
        .persist()
    )
    core = (
        nbr.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= DBSCAN_MINPTS)
        .select(F.col("pid").alias("vec_id"))
        .persist()
    )
    ce = (
        nbr.join(core.withColumnRenamed("vec_id", "pid"), "pid")
        .join(core.withColumnRenamed("vec_id", "qid"), "qid")
        .filter(F.col("pid") != F.col("qid"))
        .select("pid", "qid")
    )
    cc = connected_components(core, ce, id_col="vec_id", src="pid", dst="qid").select(
        F.col("id").alias("vec_id"), "cluster"
    )
    border = (
        nbr.join(core.withColumnRenamed("vec_id", "pid"), "pid", "left_anti")
        .join(cc.withColumnRenamed("vec_id", "qid"), "qid")
        .groupBy(F.col("pid").alias("vec_id"))
        .agg(F.min("cluster").alias("cluster"))
    )
    labeled = cc.select("vec_id", F.lit("core").alias("role"), "cluster").unionByName(
        border.select("vec_id", F.lit("border").alias("role"), "cluster")
    )
    noise = (
        cells.select("vec_id")
        .join(labeled.select("vec_id"), "vec_id", "left_anti")
        .select(
            "vec_id",
            F.lit("noise").alias("role"),
            F.lit(-1).cast("bigint").alias("cluster"),
        )
    )
    return labeled.unionByName(noise)


# --------------------------------- external validation: adjusted Rand index

ARI_SEEDS = 4


def _ari_cos_sql(a: str, b: str) -> str:
    from .similarity import _cosine_sql

    return _cosine_sql(a, b)


@query(
    "embedding_clustering_ari",
    oracle=f"""
    WITH seeds AS (
      SELECT vec_id AS sid, embedding AS sv FROM embeddings
      ORDER BY vec_id LIMIT {ARI_SEEDS}
    ),
    scored AS (
      SELECT e.vec_id, e.label, s.sid,
        {_ari_cos_sql('e.embedding', 's.sv')} AS cs
      FROM embeddings e CROSS JOIN seeds s
    ),
    best AS (
      SELECT vec_id, label, sid FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
          ORDER BY cs DESC, sid) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    cont AS (
      SELECT label, sid, CAST(COUNT(*) AS BIGINT) AS n_ij
      FROM best GROUP BY label, sid
    ),
    sums AS (
      SELECT
        CAST(SUM(n_ij * (n_ij - 1) / 2) AS BIGINT) AS sum_ij,
        CAST(SUM(n_ij) AS BIGINT) AS n,
        CAST(COUNT(DISTINCT label) AS BIGINT) AS k_true,
        CAST(COUNT(DISTINCT sid) AS BIGINT) AS k_assigned
      FROM cont
    ),
    ab AS (
      SELECT
        (SELECT CAST(SUM(ai * (ai - 1) / 2) AS BIGINT) FROM
          (SELECT SUM(n_ij) AS ai FROM cont GROUP BY label)) AS a,
        (SELECT CAST(SUM(bj * (bj - 1) / 2) AS BIGINT) FROM
          (SELECT SUM(n_ij) AS bj FROM cont GROUP BY sid)) AS b
    )
    SELECT sums.n, sums.k_true, sums.k_assigned,
      round((sums.sum_ij
          - CAST(ab.a AS DOUBLE) * ab.b / (CAST(sums.n AS DOUBLE) * (sums.n - 1) / 2))
        / ((ab.a + ab.b) / 2.0
          - CAST(ab.a AS DOUBLE) * ab.b / (CAST(sums.n AS DOUBLE) * (sums.n - 1) / 2)),
        8) AS ari
    FROM sums CROSS JOIN ab
    """,
)
def embedding_clustering_ari(spark, sf_dir):
    """Adjusted Rand Index between the corpus's ground-truth labels and a
    deterministic one-step nearest-seed clustering (seeds = the
    {ARI_SEEDS} lowest vec_ids, assignment = argmax cosine, ties to the
    smaller seed): the EXTERNAL cluster-validation metric — chance-
    corrected pair agreement against known labels — completing the
    internal metrics (silhouette, Calinski-Harabasz, Davies-Bouldin)
    that can only say a clustering is compact, not that it is RIGHT.
    ARI near 0 = no better than chance; near 1 = label-recovering.

    Scale shape: {ARI_SEEDS} broadcast seed vectors against one corpus
    scan, per-vector argmax via a vec_id-partitioned window, then the
    contingency table (k_true x k_assigned cells) carries all remaining
    arithmetic as exact integer binomial sums."""
    from pyspark.sql import Window as PW

    from .similarity import cosine

    e = table(spark, sf_dir, "embeddings")
    seeds = F.broadcast(
        e.orderBy("vec_id")
        .limit(ARI_SEEDS)
        .select(F.col("vec_id").alias("sid"), F.col("embedding").alias("sv"))
    )
    scored = e.crossJoin(seeds).select(
        "vec_id", "label", "sid", cosine("embedding", "sv").alias("cs")
    )
    best = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                PW.partitionBy("vec_id").orderBy(F.desc("cs"), "sid")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("label", "sid")
    )
    cont = best.groupBy("label", "sid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ij")
    ).persist()
    sums = cont.agg(
        F.sum(F.col("n_ij") * (F.col("n_ij") - 1) / 2).cast("bigint").alias("sum_ij"),
        F.sum("n_ij").cast("bigint").alias("n"),
        F.count_distinct("label").cast("bigint").alias("k_true"),
        F.count_distinct("sid").cast("bigint").alias("k_assigned"),
    )
    a = (
        cont.groupBy("label")
        .agg(F.sum("n_ij").alias("ai"))
        .agg(F.sum(F.col("ai") * (F.col("ai") - 1) / 2).cast("bigint").alias("a"))
    )
    b = (
        cont.groupBy("sid")
        .agg(F.sum("n_ij").alias("bj"))
        .agg(F.sum(F.col("bj") * (F.col("bj") - 1) / 2).cast("bigint").alias("b"))
    )
    half = F.col("n").cast("double") * (F.col("n") - 1) / 2
    expected = F.col("a").cast("double") * F.col("b") / half
    return (
        sums.crossJoin(F.broadcast(a))
        .crossJoin(F.broadcast(b))
        .select(
            "n",
            "k_true",
            "k_assigned",
            F.round(
                (F.col("sum_ij") - expected)
                / ((F.col("a") + F.col("b")) / 2.0 - expected),
                8,
            ).alias("ari"),
        )
    )


# --------------------------------- clustering stability (label-free)


@query(
    "embedding_clustering_stability",
    oracle=f"""
    WITH s1 AS (
      SELECT vec_id AS sid, embedding AS sv FROM embeddings
      ORDER BY vec_id LIMIT {ARI_SEEDS}
    ),
    s2 AS (
      SELECT vec_id AS sid, embedding AS sv FROM embeddings
      ORDER BY vec_id LIMIT {ARI_SEEDS} OFFSET {ARI_SEEDS}
    ),
    a1 AS (
      SELECT vec_id, sid FROM (
        SELECT e.vec_id, s.sid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
          ORDER BY {_ari_cos_sql('e.embedding', 's.sv')} DESC, s.sid) AS rn
        FROM embeddings e CROSS JOIN s1 s
      ) WHERE rn = 1
    ),
    a2 AS (
      SELECT vec_id, sid FROM (
        SELECT e.vec_id, s.sid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
          ORDER BY {_ari_cos_sql('e.embedding', 's.sv')} DESC, s.sid) AS rn
        FROM embeddings e CROSS JOIN s2 s
      ) WHERE rn = 1
    ),
    cont AS (
      SELECT a1.sid AS c1, a2.sid AS c2, CAST(COUNT(*) AS BIGINT) AS n_ij
      FROM a1 JOIN a2 ON a1.vec_id = a2.vec_id GROUP BY a1.sid, a2.sid
    ),
    sums AS (
      SELECT CAST(SUM(n_ij * (n_ij - 1) / 2) AS BIGINT) AS sum_ij,
        CAST(SUM(n_ij) AS BIGINT) AS n
      FROM cont
    ),
    ab AS (
      SELECT
        (SELECT CAST(SUM(ai * (ai - 1) / 2) AS BIGINT) FROM
          (SELECT SUM(n_ij) AS ai FROM cont GROUP BY c1)) AS a,
        (SELECT CAST(SUM(bj * (bj - 1) / 2) AS BIGINT) FROM
          (SELECT SUM(n_ij) AS bj FROM cont GROUP BY c2)) AS b
    )
    SELECT sums.n,
      round((sums.sum_ij
          - CAST(ab.a AS DOUBLE) * ab.b / (CAST(sums.n AS DOUBLE) * (sums.n - 1) / 2))
        / ((ab.a + ab.b) / 2.0
          - CAST(ab.a AS DOUBLE) * ab.b / (CAST(sums.n AS DOUBLE) * (sums.n - 1) / 2)),
        8) AS stability_ari
    FROM sums CROSS JOIN ab
    """,
)
def embedding_clustering_stability(spark, sf_dir):
    """Label-free clustering STABILITY: the adjusted Rand index between
    two deterministic nearest-seed clusterings grown from DISJOINT seed
    sets (lowest {ARI_SEEDS} vec_ids vs the next {ARI_SEEDS}). High ARI
    means the partition is a property of the data, not of the seeding —
    the standard sanity check (Ben-David et al.) before trusting any
    single k-means/IVF run; low ARI says cluster count or geometry is
    wrong no matter what the internal metrics claim. Pairs with
    embedding_clustering_ari: that one needs ground truth, this one
    does not.

    Scale shape: both assignments are broadcast-seeds scans with a
    vec_id-partitioned argmax window; everything after the join is
    integer binomial arithmetic on the k x k contingency table."""
    from pyspark.sql import Window as PW

    from .similarity import cosine

    e = table(spark, sf_dir, "embeddings")
    first8 = e.orderBy("vec_id").limit(2 * ARI_SEEDS).select(
        F.col("vec_id").alias("sid"), F.col("embedding").alias("sv")
    )
    w8 = PW.orderBy("sid")
    ranked = first8.withColumn("rk", F.row_number().over(w8))
    s1 = F.broadcast(ranked.filter(F.col("rk") <= ARI_SEEDS).drop("rk"))
    s2 = F.broadcast(ranked.filter(F.col("rk") > ARI_SEEDS).drop("rk"))

    def assign(seeds, out):
        scored = e.crossJoin(seeds).select(
            "vec_id", "sid", cosine("embedding", "sv").alias("cs")
        )
        return (
            scored.withColumn(
                "rn",
                F.row_number().over(
                    PW.partitionBy("vec_id").orderBy(F.desc("cs"), "sid")
                ),
            )
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("sid").alias(out))
        )

    cont = (
        assign(s1, "c1")
        .join(assign(s2, "c2"), "vec_id")
        .groupBy("c1", "c2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ij"))
        .persist()
    )
    sums = cont.agg(
        F.sum(F.col("n_ij") * (F.col("n_ij") - 1) / 2).cast("bigint").alias("sum_ij"),
        F.sum("n_ij").cast("bigint").alias("n"),
    )
    a = (
        cont.groupBy("c1")
        .agg(F.sum("n_ij").alias("ai"))
        .agg(F.sum(F.col("ai") * (F.col("ai") - 1) / 2).cast("bigint").alias("a"))
    )
    b = (
        cont.groupBy("c2")
        .agg(F.sum("n_ij").alias("bj"))
        .agg(F.sum(F.col("bj") * (F.col("bj") - 1) / 2).cast("bigint").alias("b"))
    )
    half = F.col("n").cast("double") * (F.col("n") - 1) / 2
    expected = F.col("a").cast("double") * F.col("b") / half
    return (
        sums.crossJoin(F.broadcast(a))
        .crossJoin(F.broadcast(b))
        .select(
            "n",
            F.round(
                (F.col("sum_ij") - expected)
                / ((F.col("a") + F.col("b")) / 2.0 - expected),
                8,
            ).alias("stability_ari"),
        )
    )


# ---------------------------------------------- leakage-safe split by cluster

SPLIT_CLUSTER_TRAIN_PCT = 90


@query(
    "split_by_dedup_cluster",
    oracle="WITH RECURSIVE"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + f""",
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
    SELECT doc_id, cluster,
      CASE WHEN ('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 4))::BIGINT
                % 100 < {SPLIT_CLUSTER_TRAIN_PCT}
           THEN 'train' ELSE 'test' END AS split
    FROM comp
    """,
)
def split_by_dedup_cluster(spark, sf_dir):
    """Leakage-safe train/test assignment: the split is keyed on the
    near-dup CLUSTER id, not the document id, so every member of a
    near-dup group lands on the same side — the fix for the contamination
    `split_leakage_check` detects (a doc-keyed split puts near-identical
    texts in both train and test, inflating eval). The standard discipline
    for any benchmark built from a deduplicated corpus.

    Scale shape: composes the persisted connected-components labels with a
    map-side md5 bucket of the cluster id — beyond the dedup pass it
    piggybacks on, the assignment itself is shuffle-free, deterministic
    across engines/partitionings, and stable under corpus resharding. The
    invariant test proves straddling near-dup pairs drop to ZERO under
    this split while the doc-keyed split leaks."""
    cl = dedup_clusters(spark, sf_dir)
    bucket = F.conv(
        F.substring(F.md5(F.col("cluster").cast("string")), 1, 4), 16, 10
    ).cast("bigint") % 100
    return cl.select(
        "doc_id",
        "cluster",
        F.when(bucket < SPLIT_CLUSTER_TRAIN_PCT, "train")
        .otherwise("test")
        .alias("split"),
    )


# ------------------------------------------------------ HITS (bipartite)

HITS_ROUNDS = 2
# Floor-quantized micro-int sums (the round-7 posture, see _pca_iter_cte):
# floor of IDENTICAL doubles is identical across engines, while
# round(double, N) tie-handling is engine-build-sensitive — the construct
# ADVICE r6 caught flipping PCA iterates at sf0.001. Linear sums quantize
# at 1e-12 (terms <= 1), squared sums at 1e-9 (raw scores can reach
# sqrt(deg), so the coarser grid keeps BIGINT sums in range up to ~sf1).
_HITS_FSUM = (
    "CAST(CAST(SUM(CAST(floor({x} * 1e12) AS BIGINT)) AS BIGINT)"
    " AS DOUBLE) / 1e12"
)
_HITS_FSUM9 = (
    "CAST(CAST(SUM(CAST(floor({x} * 1e9) AS BIGINT)) AS BIGINT)"
    " AS DOUBLE) / 1e9"
)


def _hits_norm_sql(name: str, raw: str) -> str:
    """Normalize CTE ``raw`` (id, s) to unit L2 under name ``name``:
    floor-quantized exact-integer sum of squares, iterate floor-quantized
    to 1e-10 units so no drift compounds (and no engine-sensitive
    round(double, N) ever runs on the state)."""
    return f"""
    {name}_n AS (
      SELECT sqrt({_HITS_FSUM9.format(x='s * s')}) AS nrm
      FROM {raw}
    ),
    {name} AS (
      SELECT id, CAST(floor(s / nrm * 1e10) AS BIGINT) / 1e10 AS s
      FROM {raw}, {name}_n
    )"""


def _hits_oracle() -> str:
    parts = [
        """
    bedges AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    custs AS (SELECT DISTINCT c AS id FROM bedges),
    parts AS (SELECT DISTINCT p AS id FROM bedges),
    h0 AS (
      SELECT id, 1.0 / sqrt((SELECT COUNT(*) FROM custs)) AS s FROM custs
    )"""
    ]
    prev_h = "h0"
    for r in range(1, HITS_ROUNDS + 1):
        parts.append(f"""
    a{r}_raw AS (
      SELECT e.p AS id, {_HITS_FSUM.format(x='h.s')} AS s
      FROM bedges e JOIN {prev_h} h ON h.id = e.c GROUP BY e.p
    ),{_hits_norm_sql(f'a{r}', f'a{r}_raw')},
    h{r}_raw AS (
      SELECT e.c AS id, {_HITS_FSUM.format(x='a.s')} AS s
      FROM bedges e JOIN a{r} a ON a.id = e.p GROUP BY e.c
    ),{_hits_norm_sql(f'h{r}', f'h{r}_raw')}""")
        prev_h = f"h{r}"
    last = HITS_ROUNDS
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT 'authority' AS side, id, s AS score FROM a{last}
    UNION ALL
    SELECT 'hub' AS side, id, s AS score FROM h{last}
    """
    )


@query("customer_part_hits", oracle=_hits_oracle())
def customer_part_hits(spark, sf_dir):
    """HITS hubs/authorities on the bipartite customer->part purchase
    graph (HITS_ROUNDS mutual-reinforcement rounds): authority parts are
    the ones bought by broad, high-hub customers; hub customers are the
    ones whose baskets concentrate on authority parts — the
    Kleinberg recipe on the natural directed structure a co-purchase
    projection throws away.

    Scale shape: the distinct (customer, part) edge list is built once and
    persisted; each half-round is one edges x scores equi-join plus one
    floor-quantized exact-integer aggregate on the opposite side
    (order-independent, so
    scores are bit-reproducible), with L2 normalization via a broadcast
    scalar and 1e-10 floor-quantized iterates (the round-7 PCA posture —
    round(double, N) iterate rounding is engine-build-sensitive at ties).
    Per-round results persist so plan depth stays O(1) in rounds.

    Round-11: both scan sides fan out on the join key (co-partitioned,
    so the fan-out doubles as the join exchange at bench scale) — the
    edge-list build was the dominant Spark-side cost and ran its map
    stages as one task each on single-row-group inputs."""
    o = fanout(
        table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
        "o_orderkey",
    )
    l = fanout(
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey",
    )
    edges = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .persist()
    )
    import math

    if not audit_mode() and edges.count() <= CC_LOCAL_MAX_EDGES:
        # adaptive local path: replay the floor-quantized half-rounds
        # (1e-12 contribution sums, 1e-9 norm grid, 1e-10 iterates) in
        # numpy on the collected distinct bipartite edge list — the same
        # bit grid as the unrolled oracle; distributed above threshold /
        # in audit mode
        import numpy as np

        pdf = edges.toPandas()  # Arrow transfer: ~3x faster than Row
        cv = pdf["c"].to_numpy(dtype=np.int64)
        pv = pdf["p"].to_numpy(dtype=np.int64)
        cids, pids = np.unique(cv), np.unique(pv)
        ci, pi = np.searchsorted(cids, cv), np.searchsorted(pids, pv)

        def half(from_vec, from_idx, to_n, to_idx):
            term = np.floor(from_vec[from_idx] * 1e12).astype(np.int64)
            acc = np.zeros(to_n, dtype=np.int64)
            np.add.at(acc, to_idx, term)
            raw = acc / 1e12
            nrm = math.sqrt(
                float(np.floor(raw * raw * 1e9).astype(np.int64).sum())
                / 1e9
            )
            return np.floor(raw / nrm * 1e10).astype(np.int64) / 1e10

        hv = np.full(len(cids), 1.0 / math.sqrt(float(len(cids))))
        av = None
        for _ in range(HITS_ROUNDS):
            av = half(hv, ci, len(pids), pi)
            hv = half(av, pi, len(cids), ci)
        import pandas as pd

        out = pd.DataFrame(
            {
                "side": ["authority"] * len(pids) + ["hub"] * len(cids),
                "id": np.concatenate([pids, cids]),
                "score": np.concatenate([av, hv]),
            }
        )
        return spark.createDataFrame(
            out, schema="side string, id bigint, score double"
        )

    n_c = edges.select("c").distinct().count()
    h = (
        edges.select(F.col("c").alias("id"))
        .distinct()
        .select("id", F.lit(1.0 / math.sqrt(float(n_c))).alias("s"))
        .persist()
    )
    DEC = "decimal(38,12)"

    def half_round(side_from, side_to, scores):
        raw = (
            edges.join(scores.withColumnRenamed("id", side_from), side_from)
            .groupBy(F.col(side_to).alias("id"))
            .agg(
                (
                    F.sum(F.floor(F.col("s") * F.lit(1e12)).cast("bigint"))
                    .cast("bigint")
                    .cast("double")
                    / F.lit(1e12)
                ).alias("s")
            )
        )
        nrm = F.broadcast(
            raw.agg(
                F.sqrt(
                    F.sum(
                        F.floor(F.col("s") * F.col("s") * F.lit(1e9)).cast(
                            "bigint"
                        )
                    )
                    .cast("bigint")
                    .cast("double")
                    / F.lit(1e9)
                ).alias("nrm")
            )
        )
        return (
            raw.crossJoin(nrm)
            .select(
                "id",
                (
                    F.floor(F.col("s") / F.col("nrm") * F.lit(1e10)).cast(
                        "bigint"
                    )
                    / F.lit(1e10)
                ).alias("s"),
            )
            .persist()
        )

    a = None
    for _ in range(HITS_ROUNDS):
        a = half_round("c", "p", h)
        h = half_round("p", "c", a)
    return a.select(F.lit("authority").alias("side"), "id", F.col("s").alias("score")).unionByName(
        h.select(F.lit("hub").alias("side"), "id", F.col("s").alias("score"))
    )


# --------------------------------------- link prediction (Adamic-Adar)

AA_CENTER_CAP = 200  # skip hub centers: deg > cap contributes ~1/ln(deg) ~ 0
AA_MIN_COMMON = 2    # report pairs sharing >= 2 neighbors


@query(
    "part_link_prediction_adamic_adar",
    oracle=f"""
    WITH {_PR_GRAPH_SQL},
    okc AS (
      SELECT deg.id, deg.d,
        CAST(round(1e6 / ln(deg.d)) AS BIGINT) AS inv_ln_e6
      FROM deg WHERE deg.d <= {AA_CENTER_CAP} AND deg.d >= 2
    ),
    wedges AS (
      SELECT e1.dst AS u, e2.dst AS w, okc.inv_ln_e6
      FROM edges e1
      JOIN okc ON okc.id = e1.src
      JOIN edges e2 ON e2.src = e1.src AND e1.dst < e2.dst
    ),
    scored AS (
      SELECT u, w, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
        CAST(SUM(inv_ln_e6) AS BIGINT) AS aa_score_e6
      FROM wedges GROUP BY u, w
      HAVING COUNT(*) >= {AA_MIN_COMMON}
    )
    SELECT s.u AS part1, s.w AS part2, s.common_neighbors, s.aa_score_e6
    FROM scored s
    LEFT JOIN pairs p ON p.part1 = s.u AND p.part2 = s.w
    WHERE p.part1 IS NULL
    """,
)
def part_link_prediction_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction on the part co-purchase graph: for
    part pairs NOT yet co-purchased, sum 1/ln(deg) over their common
    neighbors (rare shared neighbors weigh more than promiscuous hubs) —
    the assortment recommender's "these two will co-occur next" signal,
    and the classic common-neighbor family member that actually needs
    per-neighbor weights.

    Scale shape: wedges fan out through each CENTER as deg^2, so hub
    centers (deg > AA_CENTER_CAP) are skipped — mirrored in the oracle,
    and principled for AA specifically: a hub's 1/ln(deg) weight is the
    smallest contribution in the sum (the same stopword posture as
    LSH_MAX_BUCKET). Per-center weights are integer micro-units
    (round(1e6/ln d) — one libm call per DISTINCT degree, summed
    exactly), the wedge join reuses the persisted edge/degree frames, and
    existing edges drop out via one anti-join."""
    pairs = _copurchase_pairs(spark, sf_dir)
    edges = _copurchase_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("d"))
    okc = deg.filter(
        (F.col("d") <= AA_CENTER_CAP) & (F.col("d") >= 2)
    ).select(
        "id", F.round(F.lit(1e6) / F.log("d")).cast("bigint").alias("inv_ln_e6")
    )
    e1 = edges.join(okc, edges.src == okc.id).select(
        F.col("src").alias("c"), F.col("dst").alias("u"), "inv_ln_e6"
    )
    e2 = edges.select(F.col("src").alias("c2"), F.col("dst").alias("w"))
    wedges = e1.join(
        e2, (F.col("c") == F.col("c2")) & (F.col("u") < F.col("w"))
    )
    scored = (
        wedges.groupBy("u", "w")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
            F.sum("inv_ln_e6").cast("bigint").alias("aa_score_e6"),
        )
        .filter(F.col("common_neighbors") >= AA_MIN_COMMON)
    )
    return (
        scored.join(
            pairs,
            (scored.u == pairs.part1) & (scored.w == pairs.part2),
            "left_anti",
        )
        .select(
            F.col("u").alias("part1"),
            F.col("w").alias("part2"),
            "common_neighbors",
            "aa_score_e6",
        )
    )


# ----------------------------- link-prediction evaluation (precision@k)

LP_SPLIT = "1996-01-01"  # train co-purchases strictly before, test at/after
LP_KS = (10, 50, 100)
LP_TOPK = max(LP_KS)


@query(
    "part_link_prediction_eval",
    oracle=f"""
    WITH lp AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    cp AS MATERIALIZED (
      SELECT a.l_partkey AS part1, b.l_partkey AS part2, o.o_orderdate AS d
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      JOIN orders o ON o.o_orderkey = a.l_orderkey
    ),
    train_pairs AS MATERIALIZED (
      SELECT DISTINCT part1, part2 FROM cp WHERE d < DATE '{LP_SPLIT}'
    ),
    test_pairs AS MATERIALIZED (
      SELECT n.part1, n.part2 FROM (
        SELECT DISTINCT part1, part2 FROM cp WHERE d >= DATE '{LP_SPLIT}'
      ) n
      LEFT JOIN train_pairs t
        ON t.part1 = n.part1 AND t.part2 = n.part2
      WHERE t.part1 IS NULL
    ),
    edges AS MATERIALIZED (
      SELECT part1 AS src, part2 AS dst FROM train_pairs
      UNION ALL SELECT part2, part1 FROM train_pairs
    ),
    deg AS (SELECT src AS id, COUNT(*) AS dg FROM edges GROUP BY src),
    okc AS (
      SELECT id, CAST(round(1e6 / ln(dg)) AS BIGINT) AS inv_ln_e6
      FROM deg WHERE dg <= {AA_CENTER_CAP} AND dg >= 2
    ),
    wedges AS (
      SELECT e1.dst AS u, e2.dst AS w, okc.inv_ln_e6
      FROM edges e1
      JOIN okc ON okc.id = e1.src
      JOIN edges e2 ON e2.src = e1.src AND e1.dst < e2.dst
    ),
    scored AS (
      SELECT u, w, CAST(COUNT(*) AS BIGINT) AS cn,
        CAST(SUM(inv_ln_e6) AS BIGINT) AS aa
      FROM wedges GROUP BY u, w
      HAVING COUNT(*) >= {AA_MIN_COMMON}
    ),
    pred AS (
      SELECT s.u, s.w, s.aa FROM scored s
      LEFT JOIN train_pairs t ON t.part1 = s.u AND t.part2 = s.w
      WHERE t.part1 IS NULL
    ),
    topk AS (
      SELECT u, w, rnk FROM (
        SELECT u, w, ROW_NUMBER() OVER (ORDER BY aa DESC, u, w) AS rnk
        FROM pred
      ) WHERE rnk <= {LP_TOPK}
    ),
    ntest AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_test_edges FROM test_pairs),
    byk AS (
      SELECT g.k,
        CAST(SUM(CASE WHEN t.rnk <= g.k THEN 1 ELSE 0 END) AS BIGINT) AS n_pred,
        CAST(SUM(CASE WHEN t.rnk <= g.k AND tp.part1 IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      FROM topk t
      LEFT JOIN test_pairs tp ON tp.part1 = t.u AND tp.part2 = t.w
      CROSS JOIN UNNEST(ARRAY{list(LP_KS)}) AS g(k)
      GROUP BY g.k
    )
    SELECT CAST(k AS INTEGER) AS k, n_pred, n_hits, ntest.n_test_edges,
      CASE WHEN n_pred = 0 THEN CAST(0 AS BIGINT)
        ELSE CAST(floor(CAST(n_hits AS DOUBLE) / n_pred * 1e6) AS BIGINT)
      END AS precision_e6
    FROM byk CROSS JOIN ntest
    """,
)
def _parquet_column_max(path: str, col: str):
    """Max of ``col`` from parquet row-group footer statistics — pure
    metadata, no Spark job (guide §6). ``path`` may be a single file or a
    directory of part files. Returns None when any row group lacks the
    statistic (caller falls back to an aggregation), so the answer is
    never approximate: parquet min/max stats are exact bounds for int
    columns, and the max over all row groups IS the column max."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    if not files:
        return None
    best = None
    try:
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            if idx < 0:
                return None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None
                best = st.max if best is None else max(best, st.max)
    except Exception:
        return None
    return best


def part_link_prediction_eval(spark, sf_dir):
    """Measured-quality harness for Adamic-Adar link prediction (SURVEY
    round-7 item — the recall@k pattern the ANN suite already has, applied
    to the graph op): co-purchase edges are TIME-SLICED at {LP_SPLIT}
    (train = pairs co-purchased strictly before, test = pairs newly
    co-purchased at/after and absent from train), AA
    scores are computed on the TRAIN graph only, and precision@k reports
    how many of the top-k predicted non-edges actually formed in the test
    window. This turns the score table into an evaluated predictor with an
    honest temporal protocol (no peeking past the split).

    Determinism: scores are exact integer micro-units with a total
    (score desc, u, w) tie order, so top-k is engine-identical;
    precision is floor-quantized from exact integer counts.

    Scale shape: everything reuses the blocked AA machinery (hub-capped
    wedges on the train graph, anti-join against train edges); the only
    additions are two date-filtered pair aggregates sharing one co-purchase
    scan and a TakeOrderedAndProject top-{LP_TOPK} — the rank window runs
    on <= {LP_TOPK} rows, and the k-grid explode is 3 rows per prediction.

    Round-11: both scans fan out keyed on the join key (the fan-out IS
    the distinct/join exchange at bench scale), and the symmetrized
    train edge list is fanned out — it is byte-tiny, so AQE's
    size-based coalescing would otherwise run the wedge self-join (the
    dominant compute) on a single post-shuffle partition. The four
    in-builder persists (cp/train/test/edges) were dropped mid-round on
    the accumulation argument (un-unpersistable cached frames piling up
    across bench invocations), then RESTORED once the harness grew
    release_foreign_storage(): the accumulation mechanism is gone, and
    honest fresh-session timing showed the persist-free form recomputes
    the co-purchase self-join subtree under every one of its consumers
    across the plan's separate executions (broadcast builds, the .rdd
    fan-out probes) — 15-40 s/pass vs ~6 s with the persists (guide §5:
    persist is right precisely when a frame is reused and recompute
    costs more than the memory pressure; the harness now guarantees the
    frames are freed between queries)."""
    from pyspark.sql import Window as W

    lp = (
        fanout(
            table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
            "l_orderkey",
        )
        .distinct()
    )
    od = fanout(
        table(spark, sf_dir, "orders").select(
            "o_orderkey", F.to_date("o_orderdate").alias("d")
        ),
        "o_orderkey",
    )
    a = lp.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part1"))
    b = lp.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("part2"))
    cp = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("part1") < F.col("part2")))
        .join(od, F.col("ok") == F.col("o_orderkey"))
        .select("part1", "part2", "d")
        .persist()  # 2 consumers (train/test date slices)
    )
    split = F.lit(LP_SPLIT).cast("date")
    # edge = >= 1 co-purchase in the window: the base AA query's >= 2
    # densification would leave a 76-edge train graph at sf0.01 (a vacuous
    # eval); single-window co-purchase is the standard temporal-link
    # protocol anyway
    train = (
        cp.filter(F.col("d") < split)
        .select("part1", "part2")
        .distinct()
        .persist()  # 4 consumers (edges x2, test anti, pred anti)
    )
    test = (
        cp.filter(F.col("d") >= split)
        .select("part1", "part2")
        .distinct()
        .join(train, ["part1", "part2"], "left_anti")
        .persist()  # 2 consumers (ntest broadcast, hitflag join)
    )
    edges = fanout(
        train.select(F.col("part1").alias("src"), F.col("part2").alias("dst"))
        .union(train.select(F.col("part2").alias("src"), F.col("part1").alias("dst"))),
        "src",
        # unconditional (ADVICE r11): the symmetrized train-edge list is
        # byte-tiny by construction at every scale but feeds the wedge
        # self-join (the dominant compute) — at cluster scale a base-scan
        # probe would skip the fanout and AQE would coalesce the tiny
        # frame near-serial. `always` also never probes, so the r11
        # hidden-build-job concern does not return.
        always=True,
    ).persist()  # 3 consumers (deg, both wedge sides)
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("dg")
    )
    okc = deg.filter(
        (F.col("dg") <= AA_CENTER_CAP) & (F.col("dg") >= 2)
    ).select(
        "id", F.round(F.lit(1e6) / F.log("dg")).cast("bigint").alias("inv_ln_e6")
    )
    e1 = edges.join(okc, edges.src == okc.id).select(
        F.col("src").alias("c"), F.col("dst").alias("u"), "inv_ln_e6"
    )
    # round-12 (guide §2.4/§3): wedges via capped neighbor LISTS instead of
    # the e1 ⋈ e2 self-join — the join's second cache read, its exchange
    # and both sort waves disappear; pairs are generated MAP-SIDE from the
    # sorted per-center array and flow straight into the (u,w) partial
    # aggregation, so per-occurrence wedge rows still cross exactly ONE
    # shuffle. Scale-safe: the deg filter above bounds every collected
    # array at AA_CENTER_CAP elements (hub lists are never materialized),
    # and sort_array makes the collect order deterministic. The pair set
    # is identical to the join form (distinct neighbors u < w from the
    # sorted array), and cn/aa are the same exact integer sums.
    nb = e1.groupBy("c", "inv_ln_e6").agg(
        F.sort_array(F.collect_list("u")).alias("ns")
    )
    scored = (
        nb.select(
            "inv_ln_e6",
            F.explode(
                F.expr(
                    "flatten(transform(ns, (x, i) -> transform("
                    "slice(ns, i + 2, size(ns)), y -> struct(x AS u, y AS w))))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.u").alias("u"), F.col("p.w").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cn"),
            F.sum("inv_ln_e6").cast("bigint").alias("aa"),
        )
        .filter(F.col("cn") >= AA_MIN_COMMON)
    )
    pred = scored.join(
        train,
        (scored.u == train.part1) & (scored.w == train.part2),
        "left_anti",
    ).select("u", "w", "aa")
    topk = (
        pred.orderBy(F.col("aa").desc(), "u", "w")
        .limit(LP_TOPK)
        .select(
            "u",
            "w",
            F.row_number()
            .over(W.orderBy(F.col("aa").desc(), "u", "w"))
            .alias("rnk"),
        )
    )
    ntest = F.broadcast(
        test.agg(F.count(F.lit(1)).cast("bigint").alias("n_test_edges"))
    )
    hitflag = (
        topk.join(
            test.withColumn("_hit", F.lit(1)),
            (topk.u == test.part1) & (topk.w == test.part2),
            "left",
        )
        .select("rnk", F.coalesce(F.col("_hit"), F.lit(0)).alias("hit"))
    )
    grid = F.explode(F.array(*[F.lit(k) for k in LP_KS])).alias("k")
    byk = (
        hitflag.select("rnk", "hit", grid)
        .groupBy("k")
        .agg(
            F.sum((F.col("rnk") <= F.col("k")).cast("int"))
            .cast("bigint")
            .alias("n_pred"),
            F.sum(
                ((F.col("rnk") <= F.col("k")) & (F.col("hit") == 1)).cast("int")
            )
            .cast("bigint")
            .alias("n_hits"),
        )
    )
    return byk.crossJoin(ntest).select(
        F.col("k").cast("int").alias("k"),
        "n_pred",
        "n_hits",
        "n_test_edges",
        F.when(F.col("n_pred") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.floor(
                F.col("n_hits").cast("double") / F.col("n_pred") * F.lit(1e6)
            ).cast("bigint")
        )
        .alias("precision_e6"),
    )


# --------------------- spectral bisection (Fiedler vector, normalized L)

FIEDLER_ROUNDS = 10


def _fiedler_chain_sql() -> str:
    """Unrolled power-iteration CTE chain for the Fiedler vector of the
    part co-purchase graph's NORMALIZED Laplacian. We iterate M = I +
    D^-1/2 A D^-1/2 = 2I - L_sym, whose top eigenpair is KNOWN in closed
    form (eigenvalue 2, eigenvector u = D^1/2 1 / sqrt(2m)) — so instead
    of estimating-and-deflating like PCA, every round projects u out
    EXACTLY and the iterate converges to the second eigenvector of M =
    the Fiedler vector of L_sym. Determinism: the round-7 floor-quantized
    micro-int recipe (state BIGINT at 1e-10; every sum exact integer; no
    round(double, N) anywhere)."""
    v0 = (
        "v0 AS MATERIALIZED (SELECT id, CAST((('0x' || "
        "substr(md5('fv:' || CAST(id AS VARCHAR)), 1, 2))::BIGINT - 128) "
        "* 100000000 AS BIGINT) AS v FROM nodes)"
    )
    pre = f"""
    su AS MATERIALIZED (
      SELECT id, sqrt(CAST(d AS DOUBLE)) AS s FROM deg
    ),
    tm AS (SELECT sqrt(CAST(SUM(d) AS DOUBLE)) AS r2m FROM deg),
    {v0}"""
    rounds = []
    for r in range(1, FIEDLER_ROUNDS + 1):
        p = f"v{r - 1}"
        rounds.append(f"""
    m{r} AS (
      SELECT e.src AS id,
        CAST(SUM(CAST(floor((pv.v / 1e10) / (si.s * sj.s) * 1e10)
                 AS BIGINT)) AS BIGINT) AS msum
      FROM edges e
      JOIN {p} pv ON pv.id = e.dst
      JOIN su si ON si.id = e.src
      JOIN su sj ON sj.id = e.dst
      GROUP BY e.src
    ),
    t{r} AS (
      SELECT pv.id, pv.v + m.msum AS t FROM {p} pv JOIN m{r} m USING (id)
    ),
    c{r} AS (
      SELECT CAST(SUM(CAST(floor(su.s / tm.r2m * (t.t / 1e10) * 1e10)
                 AS BIGINT)) AS BIGINT) AS c
      FROM t{r} t JOIN su ON su.id = t.id CROSS JOIN tm
    ),
    q{r} AS (
      SELECT t.id,
        t.t - CAST(floor(c.c / 1e10 * (su.s / tm.r2m) * 1e10) AS BIGINT) AS t
      FROM t{r} t JOIN su ON su.id = t.id CROSS JOIN c{r} c CROSS JOIN tm
    ),
    n{r} AS (
      SELECT sqrt(CAST(CAST(SUM(CAST(floor(t / 1e10 * (t / 1e10) * 1e12)
                 AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12) AS nrm
      FROM q{r}
    ),
    v{r} AS MATERIALIZED (
      SELECT id, CAST(floor(t / 1e10 / n.nrm * 1e10) AS BIGINT) AS v
      FROM q{r}, n{r} n
    )""")
    return "WITH " + _PR_GRAPH_SQL + "," + pre + "," + ",".join(rounds)


FIEDLER_SUB_ROUNDS = 6


def _fiedler_sub_chain_sql(sfx: str, edges_cte: str) -> str:
    """The same unrolled power-iteration chain as _fiedler_chain_sql, but
    over an arbitrary edge CTE with every CTE name suffixed — used by the
    4-way recursive bisection to run one chain per induced side subgraph.
    FIEDLER_SUB_ROUNDS (not FIEDLER_ROUNDS): the induced halves are
    smaller and better-separated, and the parent chain already paid for
    global mixing."""
    ctes = [
        f"nodes{sfx} AS (SELECT DISTINCT src AS id FROM {edges_cte})",
        f"deg{sfx} AS (SELECT src AS id, COUNT(*) AS d"
        f" FROM {edges_cte} GROUP BY src)",
        f"su{sfx} AS MATERIALIZED (SELECT id, sqrt(CAST(d AS DOUBLE)) AS s"
        f" FROM deg{sfx})",
        f"tm{sfx} AS (SELECT sqrt(CAST(SUM(d) AS DOUBLE)) AS r2m"
        f" FROM deg{sfx})",
        f"v0{sfx} AS MATERIALIZED (SELECT id, CAST((('0x' || "
        f"substr(md5('fv:' || CAST(id AS VARCHAR)), 1, 2))::BIGINT - 128) "
        f"* 100000000 AS BIGINT) AS v FROM nodes{sfx})",
    ]
    for r in range(1, FIEDLER_SUB_ROUNDS + 1):
        p = f"v{r - 1}{sfx}"
        ctes.append(f"""
    m{r}{sfx} AS (
      SELECT e.src AS id,
        CAST(SUM(CAST(floor((pv.v / 1e10) / (si.s * sj.s) * 1e10)
                 AS BIGINT)) AS BIGINT) AS msum
      FROM {edges_cte} e
      JOIN {p} pv ON pv.id = e.dst
      JOIN su{sfx} si ON si.id = e.src
      JOIN su{sfx} sj ON sj.id = e.dst
      GROUP BY e.src
    ),
    t{r}{sfx} AS (
      SELECT pv.id, pv.v + m.msum AS t
      FROM {p} pv JOIN m{r}{sfx} m USING (id)
    ),
    c{r}{sfx} AS (
      SELECT CAST(SUM(CAST(floor(su{sfx}.s / tm{sfx}.r2m * (t.t / 1e10)
                 * 1e10) AS BIGINT)) AS BIGINT) AS c
      FROM t{r}{sfx} t JOIN su{sfx} ON su{sfx}.id = t.id CROSS JOIN tm{sfx}
    ),
    q{r}{sfx} AS (
      SELECT t.id,
        t.t - CAST(floor(c.c / 1e10 * (su{sfx}.s / tm{sfx}.r2m) * 1e10)
              AS BIGINT) AS t
      FROM t{r}{sfx} t JOIN su{sfx} ON su{sfx}.id = t.id
      CROSS JOIN c{r}{sfx} c CROSS JOIN tm{sfx}
    ),
    n{r}{sfx} AS (
      SELECT sqrt(CAST(CAST(SUM(CAST(floor(t / 1e10 * (t / 1e10) * 1e12)
                 AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12) AS nrm
      FROM q{r}{sfx}
    ),
    v{r}{sfx} AS MATERIALIZED (
      SELECT id, CAST(floor(t / 1e10 / n.nrm * 1e10) AS BIGINT) AS v
      FROM q{r}{sfx}, n{r}{sfx} n
    )""")
    return ",".join(ctes)


@query(
    "part_fiedler_bisection",
    oracle=_fiedler_chain_sql()
    + f"""
    SELECT id AS part_id, v AS fiedler_e10,
      CASE WHEN v >= 0 THEN 1 ELSE 0 END AS side
    FROM v{FIEDLER_ROUNDS}
    """,
)
def part_fiedler_bisection(spark, sf_dir):
    """Spectral graph bisection: the Fiedler vector (second eigenvector of
    the normalized Laplacian) of the part co-purchase graph, by power
    iteration on M = 2I - L_sym with the KNOWN top eigenvector u = D^(1/2)1
    projected out exactly every round — no eigenvalue estimation, no
    Hotelling deflation error. sign(fiedler) is the classic two-way
    min-conductance-style partition (assortment planning: split the
    catalog so co-purchased parts stay together); on a disconnected graph
    the iterate converges to a component indicator, which is the correct
    zero-cut bisection.

    Determinism: iterate state is BIGINT 1e-10 micro-units with
    floor-quantized per-edge/per-node terms (the round-7 PCA posture), so
    the chain is bit-identical across engines at any SF; sign is pinned by
    the fixed md5-hash start vector.

    Scale shape: graph frames built once and persisted (the pagerank
    lesson); each round is ONE edges-x-iterate equi-join plus three
    node-table maps and two scalar aggregates, with the iterate
    checkpointed every SECOND round (a 2-round body stays far below the
    analyzer's ~6-round blowup; halves the eager-job count) so plan depth
    stays O(1) in rounds. The projection coefficient is a broadcast
    scalar."""
    v, _ = _fiedler_vector(spark, sf_dir)
    return v.select(
        F.col("id").alias("part_id"),
        F.col("v").alias("fiedler_e10"),
        F.when(F.col("v") >= 0, 1).otherwise(0).alias("side"),
    )


def _fiedler_vector(spark, sf_dir):
    """(iterate frame (id, v BIGINT e10 units), persisted symmetric edge
    frame) after FIEDLER_ROUNDS deflated power-iteration rounds — shared
    by the bisection and cut-quality queries."""
    edges = _copurchase_edges(spark, sf_dir)
    return _fiedler_iterate(edges, FIEDLER_ROUNDS), edges


FIEDLER_LOCAL_MAX_EDGES = 2_000_000
CC_LOCAL_MAX_EDGES = 2_000_000


def _graph_index(edges, src="src", dst="dst"):
    """Collect a (persisted, already-aggregated) edge frame below the
    local threshold and index it for numpy kernels: returns (ids, si, di,
    rows) — sorted unique node ids, int64 positional arrays per edge
    endpoint, and the raw rows — or None when the frame is above
    CC_LOCAL_MAX_EDGES or the audit flag demands the distributed plan."""
    import numpy as np

    if audit_mode() or edges.count() > CC_LOCAL_MAX_EDGES:
        return None
    pdf = edges.toPandas()  # Arrow transfer: ~3x faster than Row collect
    svals = pdf[src].to_numpy(dtype=np.int64)
    dvals = pdf[dst].to_numpy(dtype=np.int64)
    ids = np.unique(np.concatenate([svals, dvals]))
    si = np.searchsorted(ids, svals)
    di = np.searchsorted(ids, dvals)
    return ids, si, di, pdf


def _pagerank_local(edges, rounds, damping, state_of):
    """Shared local kernel for the PageRank family: bit-identical replay
    of the distributed round (floor-quantized 1e-12 contribution sums,
    then r = teleport_term + damping*contrib as left-associated IEEE
    doubles). ``state_of(ids)`` returns (round-0 state, PRE-SCALED
    teleport term) — they differ: plain PageRank computes (1-d)/n in ONE
    division while its round 0 is 1.0/n, and mirroring that association
    exactly is what keeps the replay on the oracle's bit grid. Returns
    (ids, r) or None (stay distributed)."""
    import numpy as np

    idx = _graph_index(edges)
    if idx is None:
        return None
    ids, si, di, _rows = idx
    deg = np.bincount(si, minlength=len(ids)).astype(np.float64)
    r, tt = state_of(ids)
    for _ in range(rounds):
        term = np.floor(r[si] / deg[si] * 1e12).astype(np.int64)
        acc = np.zeros(len(ids), dtype=np.int64)
        np.add.at(acc, di, term)
        r = tt + damping * (acc / 1e12)
    return ids, r


def _fiedler_local_kernel(src, dst, rounds):
    """The Fiedler power-iteration recipe over an in-memory edge list —
    the SAME floor-quantized BIGINT/e10 expression tree as the
    distributed loop in :func:`_fiedler_iterate`, term for term and in
    the same association order, evaluated with numpy float64/int64.
    Every double op used (divide, multiply, sqrt, floor) is exactly
    rounded under IEEE 754 binary64 in both numpy and the JVM, and every
    sum is an exact integer sum, so the two paths are bit-identical —
    asserted directly by tests (local vs distributed at sf0.01) and by
    the unchanged DuckDB oracles. Returns (ids, v) numpy arrays."""
    import hashlib

    import numpy as np

    ids = np.unique(src)
    pos = {int(i): k for k, i in enumerate(ids)}
    si = np.fromiter((pos[int(x)] for x in src), dtype=np.int64, count=len(src))
    di = np.fromiter((pos[int(x)] for x in dst), dtype=np.int64, count=len(dst))
    deg = np.bincount(si, minlength=len(ids)).astype(np.int64)
    s = np.sqrt(deg.astype(np.float64))
    r2m = float(np.sqrt(np.float64(deg.sum())))
    sr = s / r2m
    den = s[si] * s[di]
    v = np.fromiter(
        (
            (int(hashlib.md5(f"fv:{int(i)}".encode()).hexdigest()[:2], 16) - 128)
            * 100000000
            for i in ids
        ),
        dtype=np.int64,
        count=len(ids),
    )
    for _round in range(rounds):
        term = np.floor((v[di] / 1e10) / den * 1e10).astype(np.int64)
        msum = np.zeros(len(ids), dtype=np.int64)
        np.add.at(msum, si, term)
        t = v + msum
        c = int(np.floor(sr * (t / 1e10) * 1e10).astype(np.int64).sum())
        t = t - np.floor(float(c) / 1e10 * sr * 1e10).astype(np.int64)
        nrm = float(
            np.sqrt(
                np.float64(
                    np.floor((t / 1e10) * (t / 1e10) * 1e12)
                    .astype(np.int64)
                    .sum()
                )
                / 1e12
            )
        )
        v = np.floor(t / 1e10 / nrm * 1e10).astype(np.int64)
    return ids, v


_ROWS_PER_PARTITION = 250_000


def _right_size(df, *keys):
    """Repartition an iteration-state frame to a DATA-SIZED partition
    count: ceil(rows / 250k), hash-partitioned on ``keys``. The persisted
    graph/iterate frames otherwise inherit the partition count of the
    joins that BUILT them (64 build partitions holding ~100 rows each on
    the sf0.1 co-purchase graph), and every power-iteration round then
    schedules hundreds of near-empty tasks — pure scheduler overhead that
    eager per-round checkpoints multiply by the round count. This is the
    same rows-per-partition reasoning AQE applies to shuffle reads,
    applied to the frames we persist ourselves; on a 100 TB graph the
    count grows linearly with the edge count, uncapped. Results are
    unaffected: every chain aggregate is an exact integer sum
    (order-free) and all per-row math is partition-local."""
    n = df.count()
    parts = max(1, -(-n // _ROWS_PER_PARTITION))
    return df.repartition(parts, *keys)


def _local_if_small(edges, rounds, grouped):
    """Adaptive physical strategy for the Fiedler chains — the broadcast
    -join size rule applied to iteration: when the (already persisted)
    edge frame is under FIEDLER_LOCAL_MAX_EDGES rows, collect it ONCE and
    run the bit-identical numpy kernel (:func:`_fiedler_local_kernel`)
    instead of paying ~7 sequential distributed stage latencies x rounds
    for a graph that fits on the driver; above the threshold — or always
    under the audit flag, so plan sweeps grade the scale path — return
    None and the caller runs the distributed loop. The collect is HARD
    size-gated (like every other collect in the package) and the two
    paths are asserted identical by tests."""
    if audit_mode() or edges.count() > FIEDLER_LOCAL_MAX_EDGES:
        return None
    spark = edges.sparkSession
    pdf = edges.toPandas()
    if grouped:
        import pandas as pd

        outs = []
        for g, sub in pdf.groupby("g", sort=True):
            ids, v = _fiedler_local_kernel(
                sub["src"].to_numpy(), sub["dst"].to_numpy(), rounds
            )
            outs.append(pd.DataFrame({"g": g, "id": ids, "v": v}))
        out = pd.concat(outs) if outs else pd.DataFrame(
            {"g": [], "id": [], "v": []}
        )
        return spark.createDataFrame(out, schema="g int, id bigint, v bigint")
    import pandas as pd

    ids, v = _fiedler_local_kernel(
        pdf["src"].to_numpy(), pdf["dst"].to_numpy(), rounds
    )
    return spark.createDataFrame(
        pd.DataFrame({"id": ids, "v": v}), schema="id bigint, v bigint"
    )


def _fiedler_iterate_grouped(edges, rounds):
    """Side-keyed variant of :func:`_fiedler_iterate`: ``edges`` carries a
    group column ``g`` (node-disjoint subgraphs), and ONE iteration loop
    advances every group's chain simultaneously — every join and
    aggregation keyed by ``g``, the per-chain scalars (r2m, projection
    coefficient c, norm) becoming |groups|-row broadcast frames joined
    back on ``g``. Returns (g, id, v).

    Bit-identical to running :func:`_fiedler_iterate` once per group: the
    grouping key only partitions the integer sums (exact, order-free) and
    every per-row double expression is unchanged, so the per-side unrolled
    DuckDB oracle chains still match. The win is job count — the 4-way
    bisection's two induced sub-chains cost FIEDLER_SUB_ROUNDS eager
    rounds instead of 2x that, and on a real cluster one job over the
    union keeps all executors busy instead of two sequential half-sized
    jobs."""
    local = _local_if_small(edges, rounds, grouped=True)
    if local is not None:
        return local
    edges = _right_size(edges, "g", "src")
    deg = edges.groupBy("g", F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    su = deg.select(
        "g", "id", F.sqrt(F.col("d").cast("double")).alias("s")
    ).persist()
    r2m = F.broadcast(
        deg.groupBy("g").agg(F.sqrt(F.sum("d").cast("double")).alias("r2m"))
    )
    sun = (
        su.join(r2m, "g")
        .select("g", "id", (F.col("s") / F.col("r2m")).alias("sr"))
        .persist()
    )
    si = su.select(
        F.col("g").alias("_gi"), F.col("id").alias("_i"), F.col("s").alias("si")
    )
    sj = su.select(
        F.col("g").alias("_gj"), F.col("id").alias("_j"), F.col("s").alias("sj")
    )
    esd = (
        edges.join(si, (edges.g == si._gi) & (edges.src == si._i))
        .join(sj, (edges.g == sj._gj) & (edges.dst == sj._j))
        .select("g", "src", "dst", (F.col("si") * F.col("sj")).alias("den"))
        .persist()
    )
    v = su.select(
        "g",
        "id",
        (
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("fv:"), F.col("id").cast("string"))),
                        1,
                        2,
                    ),
                    16,
                    10,
                ).cast("bigint")
                - 128
            )
            * F.lit(100000000)
        )
        .cast("bigint")
        .alias("v"),
    )
    v = _truncate_lineage(v)
    n_rounds = audit_rounds(rounds)
    for _round in range(1, n_rounds + 1):
        pv = v.select(
            F.col("g").alias("_gp"), F.col("id").alias("_j"), "v"
        )
        m = (
            esd.join(pv, (esd.g == pv._gp) & (esd.dst == pv._j))
            .groupBy("g", F.col("src").alias("id"))
            .agg(
                F.sum(
                    F.floor(
                        (F.col("v") / F.lit(1e10))
                        / F.col("den")
                        * F.lit(1e10)
                    ).cast("bigint")
                )
                .cast("bigint")
                .alias("msum")
            )
        )
        t = v.join(m, ["g", "id"]).select(
            "g", "id", (F.col("v") + F.col("msum")).alias("t")
        )
        tu = t.join(sun, ["g", "id"])
        c = F.broadcast(
            tu.groupBy("g").agg(
                F.sum(
                    F.floor(
                        F.col("sr")
                        * (F.col("t") / F.lit(1e10))
                        * F.lit(1e10)
                    ).cast("bigint")
                )
                .cast("bigint")
                .alias("c")
            )
        )
        q = tu.join(c, "g").select(
            "g",
            "id",
            (
                F.col("t")
                - F.floor(
                    F.col("c")
                    / F.lit(1e10)
                    * F.col("sr")
                    * F.lit(1e10)
                ).cast("bigint")
            ).alias("t"),
        )
        n = F.broadcast(
            q.groupBy("g").agg(
                F.sqrt(
                    F.sum(
                        F.floor(
                            F.col("t")
                            / F.lit(1e10)
                            * (F.col("t") / F.lit(1e10))
                            * F.lit(1e12)
                        ).cast("bigint")
                    )
                    .cast("bigint")
                    .cast("double")
                    / F.lit(1e12)
                ).alias("nrm")
            )
        )
        v = q.join(n, "g").select(
            "g",
            "id",
            F.floor(F.col("t") / F.lit(1e10) / F.col("nrm") * F.lit(1e10))
            .cast("bigint")
            .alias("v"),
        )
        v = _truncate_lineage(v)
    return v


def _fiedler_iterate(edges, rounds):
    """The deflated power iteration itself over any persisted symmetric
    edge frame (src, dst) — reused by the 4-way recursive bisection on
    the induced per-side subgraphs.

    Round-8 cost shape: everything STATIC across rounds is hoisted out of
    the loop — the per-edge normalizer den = s_i * s_j and the per-node
    projection factor sr = s / r2m are computed once into persisted
    frames, so each round is ONE edges-x-iterate equi-join + one node
    join + two broadcast scalar aggregates (was five joins + three
    crossJoins). The hoisted columns are the exact subtrees the round
    expressions already contained ((si.s * sj.s) and (su.s / tm.r2m)),
    so every IEEE operation and its association are unchanged and the
    unrolled DuckDB oracle still matches bit-for-bit."""
    local = _local_if_small(edges, rounds, grouped=False)
    if local is not None:
        return local
    edges = _right_size(edges, "src")
    deg = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    su = deg.select(
        "id", F.sqrt(F.col("d").cast("double")).alias("s")
    ).persist()
    r2m = F.broadcast(
        deg.agg(F.sqrt(F.sum("d").cast("double")).alias("r2m"))
    )
    sun = (
        su.crossJoin(r2m)
        .select("id", (F.col("s") / F.col("r2m")).alias("sr"))
        .persist()
    )
    si = su.select(F.col("id").alias("_i"), F.col("s").alias("si"))
    sj = su.select(F.col("id").alias("_j"), F.col("s").alias("sj"))
    esd = (
        edges.join(si, edges.src == si._i)
        .join(sj, edges.dst == sj._j)
        .select("src", "dst", (F.col("si") * F.col("sj")).alias("den"))
        .persist()
    )
    v = su.select(
        "id",
        (
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("fv:"), F.col("id").cast("string"))),
                        1,
                        2,
                    ),
                    16,
                    10,
                ).cast("bigint")
                - 128
            )
            * F.lit(100000000)
        )
        .cast("bigint")
        .alias("v"),
    )
    v = _truncate_lineage(v)
    n_rounds = audit_rounds(rounds)
    for _round in range(1, n_rounds + 1):
        m = (
            esd.join(
                v.select(F.col("id").alias("_j"), "v"),
                esd.dst == F.col("_j"),
            )
            .groupBy(F.col("src").alias("id"))
            .agg(
                F.sum(
                    F.floor(
                        (F.col("v") / F.lit(1e10))
                        / F.col("den")
                        * F.lit(1e10)
                    ).cast("bigint")
                )
                .cast("bigint")
                .alias("msum")
            )
        )
        t = v.join(m, "id").select("id", (F.col("v") + F.col("msum")).alias("t"))
        tu = t.join(sun, "id")
        # c and n are 1-row aggregates referenced ONCE each downstream:
        # left lazy (only the round-end iterate v is checkpointed), so each
        # round costs one job instead of three eager materializations
        c = F.broadcast(
            tu.agg(
                F.sum(
                    F.floor(
                        F.col("sr")
                        * (F.col("t") / F.lit(1e10))
                        * F.lit(1e10)
                    ).cast("bigint")
                )
                .cast("bigint")
                .alias("c")
            )
        )
        q = tu.crossJoin(c).select(
            "id",
            (
                F.col("t")
                - F.floor(
                    F.col("c")
                    / F.lit(1e10)
                    * F.col("sr")
                    * F.lit(1e10)
                ).cast("bigint")
            ).alias("t"),
        )
        n = F.broadcast(
            q.agg(
                F.sqrt(
                    F.sum(
                        F.floor(
                            F.col("t")
                            / F.lit(1e10)
                            * (F.col("t") / F.lit(1e10))
                            * F.lit(1e12)
                        ).cast("bigint")
                    )
                    .cast("bigint")
                    .cast("double")
                    / F.lit(1e12)
                ).alias("nrm")
            )
        )
        v = q.crossJoin(n).select(
            "id",
            F.floor(F.col("t") / F.lit(1e10) / F.col("nrm") * F.lit(1e10))
            .cast("bigint")
            .alias("v"),
        )
        # Truncate EVERY round: tu and q are each referenced twice within
        # a round, so k un-truncated rounds recompute ~4^k-fold — measured
        # 6.5k stages / 356 s per chain at k=3, and persist() did not
        # short-circuit it inside a single eager job. One checkpoint per
        # round (the round-7 posture) keeps the recompute factor constant;
        # the round-8 win comes from the hoisted statics (3 fewer joins
        # per round), not from checkpoint thinning.
        v = _truncate_lineage(v)
    return v


@query(
    "part_spectral_cut_quality",
    oracle=_fiedler_chain_sql()
    + f"""
    , sides AS (
      SELECT id, CASE WHEN v >= 0 THEN 1 ELSE 0 END AS side
      FROM v{FIEDLER_ROUNDS}
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM sides) AS n_nodes,
      (SELECT CAST(SUM(side) AS BIGINT) FROM sides) AS n_side_pos,
      CAST((SELECT COUNT(*) FROM edges) / 2 AS BIGINT) AS n_edges,
      CAST((SELECT SUM(CASE WHEN sa.side <> sb.side THEN 1 ELSE 0 END)
            FROM edges e
            JOIN sides sa ON sa.id = e.src
            JOIN sides sb ON sb.id = e.dst) / 2 AS BIGINT) AS cut_edges
    """,
)
def part_spectral_cut_quality(spark, sf_dir):
    """Quality report for the spectral bisection: node counts per side,
    undirected edge count, and the CUT SIZE (edges straddling the sign
    split) — cut_edges / n_edges is the fraction of co-purchase affinity a
    two-way catalog split would sever, the number that says whether the
    Fiedler partition is actually usable. Reuses the persisted iterate +
    edge frames; the cut count is one edges-x-sides equi-join (each
    undirected edge counted twice, divided back out)."""
    v, edges = _fiedler_vector(spark, sf_dir)
    sides = v.select(
        "id", F.when(F.col("v") >= 0, 1).otherwise(0).alias("side")
    ).persist()
    nodes_stats = sides.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum("side").cast("bigint").alias("n_side_pos"),
    )
    ecount = edges.agg(
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges")
    )
    sa = sides.select(F.col("id").alias("_a"), F.col("side").alias("side_a"))
    sb = sides.select(F.col("id").alias("_b"), F.col("side").alias("side_b"))
    cut = (
        edges.join(sa, edges.src == sa._a)
        .join(sb, edges.dst == sb._b)
        .agg(
            (F.sum((F.col("side_a") != F.col("side_b")).cast("int")) / 2)
            .cast("bigint")
            .alias("cut_edges")
        )
    )
    return (
        nodes_stats.crossJoin(F.broadcast(ecount))
        .crossJoin(F.broadcast(cut))
        .select("n_nodes", "n_side_pos", "n_edges", "cut_edges")
    )


@query(
    "part_spectral_cut_vs_random",
    oracle=_fiedler_chain_sql()
    + f"""
    , sides AS (
      SELECT id,
        CASE WHEN v >= 0 THEN 1 ELSE 0 END AS s_spec,
        CASE WHEN substr(md5('rs:' || CAST(id AS VARCHAR)), 1, 1)
             IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE 0 END AS s_rand
      FROM v{FIEDLER_ROUNDS}
    )
    SELECT
      CAST((SELECT COUNT(*) FROM edges) / 2 AS BIGINT) AS n_edges,
      CAST((SELECT SUM(CASE WHEN sa.s_spec <> sb.s_spec THEN 1 ELSE 0 END)
            FROM edges e JOIN sides sa ON sa.id = e.src
            JOIN sides sb ON sb.id = e.dst) / 2 AS BIGINT) AS cut_spectral,
      CAST((SELECT SUM(CASE WHEN sa.s_rand <> sb.s_rand THEN 1 ELSE 0 END)
            FROM edges e JOIN sides sa ON sa.id = e.src
            JOIN sides sb ON sb.id = e.dst) / 2 AS BIGINT) AS cut_random
    """,
)
def part_spectral_cut_vs_random(spark, sf_dir):
    """Is the Fiedler bisection actually better than chance? Same nodes,
    two balanced-ish splits — the spectral sign split vs a deterministic
    md5-hash coin flip — and both cut sizes on the same edge set. A random
    balanced split severs ~half the edges in expectation; the spectral cut
    severing far fewer is the direct evidence the eigenvector found real
    community structure (at sf0.01: 730 vs ~1.7k of 3445). The eval-harness
    companion to part_spectral_cut_quality, same shape as the ANN
    recall@k / link-prediction precision@k pattern."""
    v, edges = _fiedler_vector(spark, sf_dir)
    sides = v.select(
        "id",
        F.when(F.col("v") >= 0, 1).otherwise(0).alias("s_spec"),
        F.substring(
            F.md5(F.concat(F.lit("rs:"), F.col("id").cast("string"))), 1, 1
        )
        .isin(*"01234567")
        .cast("int")
        .alias("s_rand"),
    ).persist()
    sa = sides.select(
        F.col("id").alias("_a"),
        F.col("s_spec").alias("qa"),
        F.col("s_rand").alias("ra"),
    )
    sb = sides.select(
        F.col("id").alias("_b"),
        F.col("s_spec").alias("qb"),
        F.col("s_rand").alias("rb"),
    )
    cuts = (
        edges.join(sa, edges.src == sa._a)
        .join(sb, edges.dst == sb._b)
        .agg(
            (F.sum((F.col("qa") != F.col("qb")).cast("int")) / 2)
            .cast("bigint")
            .alias("cut_spectral"),
            (F.sum((F.col("ra") != F.col("rb")).cast("int")) / 2)
            .cast("bigint")
            .alias("cut_random"),
        )
    )
    ecount = edges.agg((F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges"))
    return (
        ecount.crossJoin(F.broadcast(cuts))
        .select("n_edges", "cut_spectral", "cut_random")
    )


@query(
    "part_spectral_4way",
    oracle=_fiedler_chain_sql()
    + f"""
    , sides AS MATERIALIZED (
      SELECT id, CASE WHEN v >= 0 THEN 1 ELSE 0 END AS side
      FROM v{FIEDLER_ROUNDS}
    ),
    edges_s0 AS MATERIALIZED (
      SELECT e.src, e.dst FROM edges e
      JOIN sides a ON a.id = e.src JOIN sides b ON b.id = e.dst
      WHERE a.side = 0 AND b.side = 0
    ),
    edges_s1 AS MATERIALIZED (
      SELECT e.src, e.dst FROM edges e
      JOIN sides a ON a.id = e.src JOIN sides b ON b.id = e.dst
      WHERE a.side = 1 AND b.side = 1
    ),
    {_fiedler_sub_chain_sql("_a", "edges_s0")},
    {_fiedler_sub_chain_sql("_b", "edges_s1")},
    sub AS (
      SELECT id, CASE WHEN v >= 0 THEN 1 ELSE 0 END AS sub
      FROM v{FIEDLER_SUB_ROUNDS}_a
      UNION ALL
      SELECT id, CASE WHEN v >= 0 THEN 1 ELSE 0 END AS sub
      FROM v{FIEDLER_SUB_ROUNDS}_b
    ),
    quad AS MATERIALIZED (
      SELECT s.id,
        CAST(s.side * 2 + COALESCE(sub.sub, 0) AS BIGINT) AS quadrant
      FROM sides s LEFT JOIN sub ON sub.id = s.id
    ),
    cuts AS (
      SELECT
        CAST(SUM(CASE WHEN sa.side <> sb.side THEN 1 ELSE 0 END) / 2
             AS BIGINT) AS cut_2way,
        CAST(SUM(CASE WHEN qa.quadrant <> qb.quadrant THEN 1 ELSE 0 END) / 2
             AS BIGINT) AS cut_4way,
        CAST(SUM(CASE WHEN sa.side = 0 AND sb.side = 0
                      AND qa.quadrant <> qb.quadrant THEN 1 ELSE 0 END) / 2
             AS BIGINT) AS cut_sub0,
        CAST(SUM(CASE WHEN sa.side = 1 AND sb.side = 1
                      AND qa.quadrant <> qb.quadrant THEN 1 ELSE 0 END) / 2
             AS BIGINT) AS cut_sub1
      FROM edges e
      JOIN sides sa ON sa.id = e.src JOIN sides sb ON sb.id = e.dst
      JOIN quad qa ON qa.id = e.src JOIN quad qb ON qb.id = e.dst
    )
    SELECT q.quadrant,
      CAST(COUNT(*) AS BIGINT) AS n_nodes,
      CAST(SUM(d.d) AS BIGINT) AS volume,
      CAST(SUM(COALESCE(ie.same, 0)) / 2 AS BIGINT) AS internal_edges,
      cuts.cut_2way, cuts.cut_sub0, cuts.cut_sub1, cuts.cut_4way
    FROM quad q
    JOIN deg d ON d.id = q.id
    LEFT JOIN (
      SELECT e.src AS id, COUNT(*) AS same
      FROM edges e JOIN quad qa ON qa.id = e.src
      JOIN quad qb ON qb.id = e.dst
      WHERE qa.quadrant = qb.quadrant GROUP BY e.src
    ) ie ON ie.id = q.id
    CROSS JOIN cuts
    GROUP BY q.quadrant, cuts.cut_2way, cuts.cut_sub0, cuts.cut_sub1,
             cuts.cut_4way
    """,
)
def part_spectral_4way(spark, sf_dir):
    """Recursive spectral 4-way partition (round-7 VERDICT "next" #6): the
    Fiedler bisection's two sides are each bisected AGAIN by a fresh
    FIEDLER_SUB_ROUNDS-round chain on their induced subgraphs, giving
    four catalog quadrants with per-quadrant node count, volume (degree
    mass in the FULL graph — the conductance denominator), and internal
    edge count, alongside the parent 2-way cut, each side's internal
    sub-cut, and the total 4-way cut (= 2way + sub0 + sub1; computed
    independently from the quadrant labels as a consistency check).
    Same-side nodes with no same-side edge are isolated in their induced
    subgraph, never enter its chain, and land deterministically in the
    side's sub-0 quadrant (COALESCE) in both engines.

    Scale shape: the parent chain's cost model (one edges-x-iterate
    equi-join per round, checkpoint every second round) applies per side,
    and the induced subgraphs are node-disjoint — the two sub-chains
    together touch no more edges than the parent. All cut/volume stats
    are integer equi-join aggregates."""
    v, edges = _fiedler_vector(spark, sf_dir)
    # chain BOUNDARIES: materialized even in audit mode (see
    # lineage.truncate_boundary) — three stacked chains re-embedded at
    # every downstream reference hang Catalyst analysis otherwise
    sides = truncate_boundary(
        v.select(
            "id", F.when(F.col("v") >= 0, 1).otherwise(0).alias("side")
        )
    )
    sa = sides.select(F.col("id").alias("_a"), F.col("side").alias("side_a"))
    sb = sides.select(F.col("id").alias("_b"), F.col("side").alias("side_b"))
    tagged = (
        edges.join(sa, edges.src == sa._a)
        .join(sb, edges.dst == sb._b)
        .select("src", "dst", "side_a", "side_b")
        .persist()
    )
    # both induced sub-chains advance in ONE side-keyed iteration
    # (_fiedler_iterate_grouped): half the eager round-jobs, same
    # per-side bits — the oracle keeps its two unrolled chains
    es_g = (
        tagged.filter(F.col("side_a") == F.col("side_b"))
        .select(F.col("side_a").alias("g"), "src", "dst")
        .persist()
    )
    vg = _fiedler_iterate_grouped(es_g, FIEDLER_SUB_ROUNDS)
    sub = truncate_boundary(
        vg.select(
            "id", F.when(F.col("v") >= 0, 1).otherwise(0).alias("sub")
        )
    )
    quad = (
        sides.join(sub, "id", "left")
        .select(
            "id",
            (F.col("side") * 2 + F.coalesce(F.col("sub"), F.lit(0)))
            .cast("bigint")
            .alias("quadrant"),
        )
        .persist()
    )
    qa = quad.select(F.col("id").alias("_qa"), F.col("quadrant").alias("quad_a"))
    qb = quad.select(F.col("id").alias("_qb"), F.col("quadrant").alias("quad_b"))
    etag = (
        tagged.join(qa, tagged.src == qa._qa)
        .join(qb, tagged.dst == qb._qb)
        .select("src", "dst", "side_a", "side_b", "quad_a", "quad_b")
    )
    cuts = F.broadcast(
        etag.agg(
            (F.sum((F.col("side_a") != F.col("side_b")).cast("int")) / 2)
            .cast("bigint")
            .alias("cut_2way"),
            (F.sum((F.col("quad_a") != F.col("quad_b")).cast("int")) / 2)
            .cast("bigint")
            .alias("cut_4way"),
            (
                F.sum(
                    (
                        (F.col("side_a") == 0)
                        & (F.col("side_b") == 0)
                        & (F.col("quad_a") != F.col("quad_b"))
                    ).cast("int")
                )
                / 2
            )
            .cast("bigint")
            .alias("cut_sub0"),
            (
                F.sum(
                    (
                        (F.col("side_a") == 1)
                        & (F.col("side_b") == 1)
                        & (F.col("quad_a") != F.col("quad_b"))
                    ).cast("int")
                )
                / 2
            )
            .cast("bigint")
            .alias("cut_sub1"),
        )
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    internal = (
        etag.filter(F.col("quad_a") == F.col("quad_b"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("same"))
    )
    return (
        quad.join(deg, "id")
        .join(internal, "id", "left")
        .groupBy("quadrant")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("d").cast("bigint").alias("volume"),
            (F.sum(F.coalesce(F.col("same"), F.lit(0))) / 2)
            .cast("bigint")
            .alias("internal_edges"),
        )
        .crossJoin(cuts)
        .select(
            "quadrant", "n_nodes", "volume", "internal_edges",
            "cut_2way", "cut_sub0", "cut_sub1", "cut_4way",
        )
    )


# --------------------------------------- personalized PageRank (seed set)

PPR_DAMPING = 0.85
PPR_SEED_MOD = 97  # part ids divisible by this form the seed set
PPR_ROUNDS = 2
_PPR_FSUM = (
    "CAST(CAST(SUM(CAST(floor({x} * 1e12) AS BIGINT)) AS BIGINT)"
    " AS DOUBLE) / 1e12"
)


def _ppr_round_sql(prev: str, out: str) -> str:
    contrib = _PPR_FSUM.format(x=f"{prev}.r / deg.d")
    return f"""
    {out}_c AS (
      SELECT e.dst AS id, {contrib} AS c
      FROM edges e JOIN {prev} ON {prev}.id = e.src JOIN deg ON deg.id = e.src
      GROUP BY e.dst
    ),
    {out} AS (
      SELECT nodes.id,
        CAST({(1 - PPR_DAMPING)!r} AS DOUBLE)
          * ((CASE WHEN nodes.id % {PPR_SEED_MOD} = 0 THEN 1.0 ELSE 0.0 END)
             / ns.n_seeds)
          + CAST({PPR_DAMPING!r} AS DOUBLE) * COALESCE({out}_c.c, 0.0) AS r
      FROM nodes CROSS JOIN ns LEFT JOIN {out}_c ON {out}_c.id = nodes.id
    )"""


@query(
    "part_personalized_pagerank",
    oracle=f"""
    WITH {_PR_GRAPH_SQL},
    ns AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_seeds FROM nodes
      WHERE id % {PPR_SEED_MOD} = 0
    ),
    r0 AS (
      SELECT nodes.id,
        (CASE WHEN nodes.id % {PPR_SEED_MOD} = 0 THEN 1.0 ELSE 0.0 END)
          / ns.n_seeds AS r
      FROM nodes CROSS JOIN ns
    ),
    {_ppr_round_sql('r0', 'r1')},
    {_ppr_round_sql('r1', 'r2')}
    SELECT id AS part, r AS ppr,
      CASE WHEN id % {PPR_SEED_MOD} = 0 THEN 1 ELSE 0 END AS is_seed
    FROM r2 WHERE r > 0
    """,
)
def part_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank from a deterministic seed set (part ids
    divisible by {PPR_SEED_MOD}): random walks restart AT THE SEEDS, so
    mass concentrates in the seeds' neighborhood instead of spreading to
    global hubs — the "expand this curated set" primitive behind
    seed-based corpus curation (find documents/products like these) and
    audience expansion, on the same co-purchase graph as part_pagerank.
    Zero-mass nodes (unreachable within PPR_ROUNDS hops of a seed) drop
    out; is_seed marks the restart set.

    Determinism: the round-7 floor posture — contribution sums are
    floor-quantized exact BIGINTs at 1e-12, every other step a single
    correctly-rounded IEEE op; dangling mass is not redistributed (both
    engines agree on the simplification, as in part_pagerank).

    Scale shape: identical to part_pagerank (graph built once + persisted,
    per-round one edges x ranks join with map-side partial aggregation,
    broadcast seed count); the teleport vector is a pure function of the
    node id, so no seed table ships anywhere."""
    edges = _copurchase_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("id")).distinct().persist()
    deg = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    is_seed = (F.col("id") % PPR_SEED_MOD) == 0
    ns = F.broadcast(
        nodes.filter(is_seed).agg(F.count(F.lit(1)).cast("bigint").alias("n_seeds"))
    )
    teleport = (
        F.when(is_seed, F.lit(1.0)).otherwise(F.lit(0.0)) / F.col("n_seeds")
    )

    def ppr_round(prev):
        contrib = (
            edges.join(prev.withColumnRenamed("id", "pid"), F.col("src") == F.col("pid"))
            .join(deg.withColumnRenamed("id", "did"), F.col("src") == F.col("did"))
            .groupBy(F.col("dst").alias("id"))
            .agg(
                (
                    F.sum(
                        F.floor(F.col("r") / F.col("d") * F.lit(1e12)).cast(
                            "bigint"
                        )
                    )
                    .cast("bigint")
                    .cast("double")
                    / F.lit(1e12)
                ).alias("c")
            )
        )
        return (
            nodes.crossJoin(ns)
            .join(contrib, "id", "left")
            .select(
                "id",
                (
                    (1 - PPR_DAMPING) * teleport
                    + PPR_DAMPING * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("r"),
            )
        )

    def _seed_state(ids):
        import numpy as np

        x = (ids % PPR_SEED_MOD == 0).astype(np.float64)
        n_seeds = float(int(x.sum()))
        t = x / n_seeds
        return t, (1 - PPR_DAMPING) * t

    loc = _pagerank_local(edges, PPR_ROUNDS, PPR_DAMPING, _seed_state)
    if loc is not None:
        ids, r = loc
        return edges.sparkSession.createDataFrame(
            [
                (int(i), float(x), 1 if int(i) % PPR_SEED_MOD == 0 else 0)
                for i, x in zip(ids, r)
                if x > 0
            ],
            schema="part bigint, ppr double, is_seed int",
        )
    edges.count()
    r = nodes.crossJoin(ns).select("id", teleport.alias("r"))
    for _ in range(PPR_ROUNDS):
        r = ppr_round(r).persist()
        r.count()
    return r.filter(F.col("r") > 0).select(
        F.col("id").alias("part"),
        F.col("r").alias("ppr"),
        F.when(is_seed, 1).otherwise(0).alias("is_seed"),
    )


# --------------------------------------- corpus-version near-dup cluster diff

_VDIFF_CLONE_OFF = 100_000
_VDIFF_BRIDGE_OFF = 200_000

from .dedup import (  # noqa: E402  (shared LSH pipeline pieces)
    N_MINHASH,
    _lsh_chain_sql,
    lsh_pairs_from_signatures,
    minhash_signatures,
)

_VDIFF_ORACLE = f"""
    WITH RECURSIVE
    {_lsh_chain_sql()},
    sym AS (
      SELECT doc1 AS a, doc2 AS b FROM cand
      UNION ALL SELECT doc2, doc1 FROM cand
    ),
    walk(id, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT sym.a, w.label FROM walk w JOIN sym ON sym.b = w.id
    ),
    comp_a AS (SELECT id, MIN(label) AS cluster FROM walk GROUP BY id),
    docs_b AS (
      SELECT d.doc_id,
        CASE WHEN d.doc_id % 19 = 0 AND n.doc_id IS NOT NULL
             THEN n.text ELSE d.text END AS text
      FROM documents d
      LEFT JOIN documents n
        ON n.doc_id = d.doc_id + 1 AND n.doc_id % 17 <> 0
      WHERE d.doc_id % 17 <> 0
      UNION ALL
      SELECT d.doc_id + {_VDIFF_CLONE_OFF}, d.text
      FROM documents d
      LEFT JOIN documents n
        ON n.doc_id = d.doc_id + 1 AND n.doc_id % 17 <> 0
      WHERE d.doc_id % 17 <> 0 AND d.doc_id % 29 = 0
        AND NOT (d.doc_id % 19 = 0 AND n.doc_id IS NOT NULL)
      UNION ALL
      SELECT u.doc_id + {_VDIFF_BRIDGE_OFF}, u.text || ' ' || p.text
      FROM documents u JOIN documents p ON p.doc_id = u.doc_id + 3
      WHERE u.doc_id % 17 <> 0 AND u.doc_id % 37 = 0 AND p.doc_id % 17 <> 0
    ),
    {_lsh_chain_sql("docs_b", "_b")},
    sym_b AS (
      SELECT doc1 AS a, doc2 AS b FROM cand_b
      UNION ALL SELECT doc2, doc1 FROM cand_b
    ),
    walk_b(id, label) AS (
      SELECT doc_id, doc_id FROM docs_b
      UNION
      SELECT sym_b.a, w.label FROM walk_b w JOIN sym_b ON sym_b.b = w.id
    ),
    comp_b AS (SELECT id, MIN(label) AS cluster FROM walk_b GROUP BY id),
    na AS (
      SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_a
      FROM comp_a GROUP BY cluster
    ),
    surv AS (
      SELECT ca.cluster AS cluster_a, cb.cluster AS cluster_b
      FROM comp_a ca
      JOIN documents d ON d.doc_id = ca.id
      LEFT JOIN documents n
        ON n.doc_id = d.doc_id + 1 AND n.doc_id % 17 <> 0
      JOIN comp_b cb ON cb.id = d.doc_id
      WHERE d.doc_id % 17 <> 0
        AND NOT (d.doc_id % 19 = 0 AND n.doc_id IS NOT NULL)
    ),
    pab AS (SELECT DISTINCT cluster_a, cluster_b FROM surv),
    sizes_b AS (
      SELECT cluster, CAST(COUNT(*) AS BIGINT) AS nb
      FROM comp_b GROUP BY cluster
    ),
    nbc AS (SELECT cluster_a, COUNT(*) AS k FROM pab GROUP BY cluster_a),
    nbt AS (
      SELECT pab.cluster_a, CAST(SUM(sizes_b.nb) AS BIGINT) AS n_b
      FROM pab JOIN sizes_b ON sizes_b.cluster = pab.cluster_b
      GROUP BY pab.cluster_a
    ),
    mrg AS (
      SELECT cluster_b FROM pab GROUP BY cluster_b HAVING COUNT(*) > 1
    ),
    mrga AS (
      SELECT DISTINCT pab.cluster_a FROM pab
      JOIN mrg ON mrg.cluster_b = pab.cluster_b
    )
    SELECT na.cluster AS cluster_a, na.n_a,
      CAST(COALESCE(nbt.n_b, 0) AS BIGINT) AS n_b,
      CASE WHEN nbc.k IS NULL THEN 'vanished'
           WHEN nbc.k > 1 THEN 'split'
           WHEN mrga.cluster_a IS NOT NULL THEN 'merged'
           WHEN nbt.n_b > na.n_a THEN 'grew'
           WHEN nbt.n_b < na.n_a THEN 'shrank'
           ELSE 'unchanged' END AS status
    FROM na
    LEFT JOIN nbc ON nbc.cluster_a = na.cluster
    LEFT JOIN nbt ON nbt.cluster_a = na.cluster
    LEFT JOIN mrga ON mrga.cluster_a = na.cluster
"""


@query("dedup_cluster_version_diff", oracle=_VDIFF_ORACLE)
def dedup_cluster_version_diff(spark, sf_dir):
    """Cross-snapshot near-dup CLUSTER diff (round-8 VERDICT "next" #10):
    corpus version B is derived deterministically from version A (every
    17th doc deleted; every 19th doc's text replaced by its successor's;
    every 29th unedited survivor cloned under id+{_VDIFF_CLONE_OFF};
    every 37th survivor spawning a BRIDGE doc under id+{_VDIFF_BRIDGE_OFF}
    whose text concatenates doc u and doc u+3 — new content that can
    join two previously-separate clusters), both versions are clustered
    with the SAME banded MinHash-LSH + connected-components pipeline,
    and every version-A cluster is classified: vanished (no unedited
    survivor), split (survivors land in >1 B-cluster), merged (its
    B-cluster also holds survivors of another A-cluster), grew / shrank
    / unchanged (B-cluster size vs A size). The CASE is ORDERED: a
    cluster that both splits AND merges (its survivors land in >1
    B-cluster, one of which also absorbed another A-cluster) reports
    'split' — splitting is the rarer, more actionable event for a dedup
    index (it means previously-merged docs must be re-keyed), and
    'merged' remains visible on the absorbed partner cluster. Pinned on
    both engines by the planted split+merge fixture in
    tests/test_version_diff_fixture.py.

    Scale design — the incremental-maintenance shape, not a second full
    LSH pass: version A's cluster map and candidate fragment come from
    the session fragment cache; version B's SIGNATURE table is derived
    relationally for every node whose content is an existing doc's text
    (unchanged survivors reuse their own sig row; an edited doc reuses
    its successor's; a clone its original's — md5 signatures depend only
    on text, so the reuse is exact), and only the BRIDGE docs (genuinely
    new content, churn-sized) run the shingle/md5 pipeline. Candidate
    generation stays strictly banded (lsh_pairs_from_signatures — same
    bucket cap), and the CC re-runs only on the derived pair graph. Per
    snapshot the cost is O(churn + band join + cluster graph), not
    O(corpus). The DuckDB oracle recomputes version B FROM SCRATCH over
    the modified texts, so the gate proves incremental == full rebuild.
    All counts are integers; statuses are exact CASE branches."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    nxt = d.select(
        (F.col("doc_id") - 1).alias("p_id"),
        F.col("doc_id").alias("next_id"),
    ).filter(F.col("next_id") % 17 != 0)
    surv = d.filter(F.col("doc_id") % 17 != 0)
    core = (
        surv.join(nxt, F.col("doc_id") == F.col("p_id"), "left")
        .select(
            "doc_id",
            "next_id",
            (
                (F.col("doc_id") % 19 == 0) & F.col("next_id").isNotNull()
            ).alias("edited"),
        )
    )
    part = d.select(
        (F.col("doc_id") - 3).alias("b_id"),
        F.col("doc_id").alias("p_id2"),
        F.col("text").alias("p_text"),
    ).filter(F.col("p_id2") % 17 != 0)
    bridges = (
        surv.filter(F.col("doc_id") % 37 == 0)
        .join(part, F.col("doc_id") == F.col("b_id"))
        .select(
            (F.col("doc_id") + _VDIFF_BRIDGE_OFF).alias("doc_id"),
            F.concat_ws(" ", "text", "p_text").alias("text"),
        )
    )
    clones = core.filter(
        ~F.col("edited") & (F.col("doc_id") % 29 == 0)
    ).select((F.col("doc_id") + _VDIFF_CLONE_OFF).alias("doc_id"))
    nodes_b = (
        core.select("doc_id")
        .unionAll(clones)
        .unionAll(bridges.select("doc_id"))
    )
    # Offsets are fixed constants mirrored by the oracle, so a corpus
    # whose ids reach them would SILENTLY conflate synthetic clone/bridge
    # ids with real docs on both engines (round-9 ADVICE) — fail loudly
    # instead. Round-12 (guide §6): the guard reads the parquet FOOTER
    # max statistic (pure metadata, no Spark job) and only falls back to
    # the 1-row max() agg when statistics are absent.
    max_id = _parquet_column_max(f"{sf_dir}/documents.parquet", "doc_id")
    if max_id is None:
        max_id = d.agg(F.max("doc_id")).first()[0]
    if max_id is not None and max_id >= _VDIFF_CLONE_OFF:
        raise ValueError(
            f"dedup_cluster_version_diff: max(doc_id)={max_id} collides "
            f"with the synthetic clone/bridge id offsets "
            f"({_VDIFF_CLONE_OFF}/{_VDIFF_BRIDGE_OFF}); raise the offsets "
            "for this corpus"
        )
    # incremental signature table: relational reuse of version A's sigs,
    # served through the session signature fragment (round-9 ADVICE) so
    # repeated snapshot diffs / the signature query / the ingest index
    # share ONE corpus signature build
    hcols = [f"h{i}" for i in range(N_MINHASH)]
    from .dedup import corpus_minhash_signatures

    sig_a = corpus_minhash_signatures(spark, sf_dir)
    src_map = (
        core.filter(~F.col("edited")).select(
            "doc_id", F.col("doc_id").alias("src")
        )
        .unionAll(
            core.filter(F.col("edited")).select(
                "doc_id", F.col("next_id").alias("src")
            )
        )
        .unionAll(
            core.filter(~F.col("edited") & (F.col("doc_id") % 29 == 0))
            .select(
                (F.col("doc_id") + _VDIFF_CLONE_OFF).alias("doc_id"),
                F.col("doc_id").alias("src"),
            )
        )
    )
    sig_reused = src_map.join(
        sig_a.select(F.col("doc_id").alias("src"), *hcols), "src"
    ).select("doc_id", *hcols)
    sig_b = sig_reused.unionByName(minhash_signatures(docs=bridges))
    pairs_b = lsh_pairs_from_signatures(sig_b)
    # chain boundaries (see lineage.truncate_boundary): comp_b feeds pab
    # AND sizes_b, ca feeds na AND pab — without a hard materialization
    # each reference re-embeds the whole CC chain in the plan (the
    # part_spectral_4way analysis-blowup class)
    comp_b = truncate_boundary(
        connected_components(
            nodes_b, pairs_b, id_col="doc_id", src="doc1", dst="doc2"
        )
    )
    ca = truncate_boundary(dedup_clusters(spark, sf_dir))
    na = ca.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a")
    )
    pab = (
        ca.join(core.filter(~F.col("edited")).select("doc_id"), "doc_id")
        .join(
            comp_b.select(
                F.col("id").alias("doc_id"),
                F.col("cluster").alias("cluster_b"),
            ),
            "doc_id",
        )
        .select(F.col("cluster").alias("cluster_a"), "cluster_b")
        .distinct()
    )
    sizes_b = comp_b.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("nb")
    )
    nbc = pab.groupBy("cluster_a").agg(F.count(F.lit(1)).alias("k"))
    nbt = (
        pab.join(sizes_b, pab.cluster_b == sizes_b.cluster)
        .groupBy("cluster_a")
        .agg(F.sum("nb").cast("bigint").alias("n_b"))
    )
    mrg = (
        pab.groupBy("cluster_b")
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") > 1)
    )
    mrga = (
        pab.join(mrg.select("cluster_b"), "cluster_b")
        .select("cluster_a")
        .distinct()
        .withColumn("is_m", F.lit(1))
    )
    rep = (
        na.withColumnRenamed("cluster", "cluster_a")
        .join(nbc, "cluster_a", "left")
        .join(nbt, "cluster_a", "left")
        .join(mrga, "cluster_a", "left")
    )
    status = (
        F.when(F.col("k").isNull(), "vanished")
        .when(F.col("k") > 1, "split")
        .when(F.col("is_m").isNotNull(), "merged")
        .when(F.col("n_b") > F.col("n_a"), "grew")
        .when(F.col("n_b") < F.col("n_a"), "shrank")
        .otherwise("unchanged")
    )
    return rep.select(
        "cluster_a",
        "n_a",
        F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_b"),
        status.alias("status"),
    )


# ------------------------------------- ingest-time cluster assignment

from .dedup import BATCH_MOD, LSH_MAX_BUCKET  # noqa: E402


def lsh_ingest_index(spark, sf_dir):
    """The ingest-invariant LSH index — (cluster map, band table, capped
    buckets) over the index corpus (doc_id % BATCH_MOD != 0) — shared by
    dedup_incremental_cluster_assign and streaming twin #15 (round-9
    VERDICT "next" #1: both consumed the SAME deterministic fragment yet
    each rebuilt it per call). Cached as ONE tuple fragment: bands,
    buckets, and clusters all derive from exactly the same signature
    build, so caching them separately could pair frames from different
    builds. In production this is the stored LSH index, bucketed by
    (band, key) — sources/bucketing.py; audit mode bypasses the cache so
    the plan sweep always grades the real build.

    Returns (comp_ix(ix_doc, cluster), bands_ix(ix_doc, band, key),
    iok(band, key))."""
    from ..fragcache import fragment_tuple
    from .dedup import (
        bands_from_signatures,
        corpus_minhash_signatures,
        lsh_pairs_from_signatures,
    )

    def build():
        is_ix = F.col("doc_id") % BATCH_MOD != 0
        sig_ix = corpus_minhash_signatures(spark, sf_dir).filter(is_ix)
        comp_ix = truncate_boundary(
            connected_components(
                table(spark, sf_dir, "documents")
                .select("doc_id")
                .filter(is_ix),
                lsh_pairs_from_signatures(sig_ix),
                id_col="doc_id",
                src="doc1",
                dst="doc2",
            )
        ).select(F.col("id").alias("ix_doc"), "cluster")
        bands_ix = bands_from_signatures(sig_ix).withColumnRenamed(
            "doc_id", "ix_doc"
        )
        iok = (
            bands_ix.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") <= LSH_MAX_BUCKET)
            .select("band", "key")
        )
        return comp_ix, bands_ix, iok

    return fragment_tuple(spark, sf_dir, "lsh_ingest_index", build)

_ASSIGN_IX_SRC = (
    f"(SELECT doc_id, text FROM documents WHERE doc_id % {BATCH_MOD} <> 0) ix"
)
_ASSIGN_NB_SRC = (
    f"(SELECT doc_id, text FROM documents WHERE doc_id % {BATCH_MOD} = 0) nb"
)

_ASSIGN_ORACLE = f"""
    WITH RECURSIVE
    {_lsh_chain_sql(_ASSIGN_IX_SRC, "_ix")},
    {_lsh_chain_sql(_ASSIGN_NB_SRC, "_nb")},
    sym_ix AS (
      SELECT doc1 AS a, doc2 AS b FROM cand_ix
      UNION ALL SELECT doc2, doc1 FROM cand_ix
    ),
    walk_ix(id, label) AS (
      SELECT doc_id, doc_id FROM documents WHERE doc_id % {BATCH_MOD} <> 0
      UNION
      SELECT sym_ix.a, w.label FROM walk_ix w JOIN sym_ix ON sym_ix.b = w.id
    ),
    comp_ix AS (SELECT id, MIN(label) AS cluster FROM walk_ix GROUP BY id),
    iok_ix AS (
      SELECT band, key FROM bands_ix GROUP BY band, key
      HAVING COUNT(*) <= {LSH_MAX_BUCKET}
    ),
    mt AS (
      SELECT DISTINCT n.doc_id AS new_doc, i.doc_id AS ix_doc
      FROM bands_nb n
      JOIN iok_ix ON iok_ix.band = n.band AND iok_ix.key = n.key
      JOIN bands_ix i ON i.band = n.band AND i.key = n.key
    ),
    asg AS (
      SELECT mt.new_doc, MIN(c.cluster) AS cl,
        CAST(COUNT(DISTINCT mt.ix_doc) AS BIGINT) AS n_matched
      FROM mt JOIN comp_ix c ON c.id = mt.ix_doc
      GROUP BY mt.new_doc
    )
    SELECT d.doc_id AS new_doc,
      CAST(COALESCE(asg.cl, d.doc_id) AS BIGINT) AS assigned_cluster,
      CAST(COALESCE(asg.n_matched, 0) AS BIGINT) AS n_matched,
      CASE WHEN asg.new_doc IS NULL THEN 1 ELSE 0 END AS is_new
    FROM documents d LEFT JOIN asg ON asg.new_doc = d.doc_id
    WHERE d.doc_id % {BATCH_MOD} = 0
"""


@query("dedup_incremental_cluster_assign", oracle=_ASSIGN_ORACLE)
def dedup_incremental_cluster_assign(spark, sf_dir):
    """Ingest-time cluster ASSIGNMENT: "today's crawl" (doc_id %
    {BATCH_MOD} == 0) is attached to the EXISTING near-dup clusters of
    the index corpus (everything else) — the companion of
    dedup_incremental_vs_index (which reports pairs) and the per-ingest
    half of dedup_cluster_version_diff (which re-reports whole
    snapshots). A new doc probes the index band table (index-side bucket
    caps, the same skew guard), collects its matched index docs'
    clusters, and is assigned the SMALLEST matched cluster id — or
    itself (is_new = 1) when nothing matches. Index clusters are NOT
    merged by arrivals: the index is immutable within one ingest, the
    production contract that keeps daily assignment O(batch bands).

    Scale shape: the index signature/band/cluster tables are computed
    once — served through the session fragment cache (lsh_ingest_index;
    stored bucketed by (band, key) in production — sources/bucketing.py)
    and shared with streaming twin #15; each ingest shuffles only the
    batch's bands and the batch-sized assignment aggregate. The
    streaming twin (streaming/events.py::incremental_cluster_assign_stream)
    runs the identical plan per micro-batch and is equivalence-tested
    against this operator."""
    from .dedup import bands_from_signatures, corpus_minhash_signatures

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    is_new_doc = F.col("doc_id") % BATCH_MOD == 0
    comp_ix, bands_ix, iok = lsh_ingest_index(spark, sf_dir)
    sig_nb = corpus_minhash_signatures(spark, sf_dir).filter(is_new_doc)
    bands_nb = bands_from_signatures(sig_nb).withColumnRenamed(
        "doc_id", "new_doc"
    )
    mt = (
        bands_nb.join(iok, ["band", "key"])
        .join(bands_ix, ["band", "key"])
        .select("new_doc", "ix_doc")
        .distinct()
    )
    asg = (
        mt.join(comp_ix, "ix_doc")
        .groupBy("new_doc")
        .agg(
            F.min("cluster").alias("cl"),
            F.countDistinct("ix_doc").alias("n_matched"),
        )
    )
    return (
        d.filter(is_new_doc)
        .select(F.col("doc_id").alias("new_doc"))
        .join(asg, "new_doc", "left")
        .select(
            "new_doc",
            F.coalesce("cl", "new_doc").cast("bigint").alias(
                "assigned_cluster"
            ),
            F.coalesce("n_matched", F.lit(0)).cast("bigint").alias(
                "n_matched"
            ),
            F.when(F.col("cl").isNull(), 1).otherwise(0).alias("is_new"),
        )
    )
