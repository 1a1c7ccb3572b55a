"""Similarity search over embedding columns (driver mandate, BASELINE.json
north_star; beyond the reference's I/O-only surface):
brute-force cosine top-k baseline + embedding-cosine near-dup, with an
LSH-bucketed scale path (random-hyperplane signatures, deterministic seeds).

All dot products use floor-based fixed-point accumulation: per-element
``floor(x*y * 1e9)`` summed as int64, divided by 1e9 at the end. Every step
is deterministic IEEE double or exact integer math, identical in any engine
— unlike double->DECIMAL casts, whose rounding paths differ between Spark
(exact BigDecimal + HALF_UP) and DuckDB (scaled double multiply). Bit-equal
cosines matter because top-k ordering and near-dup thresholds sit directly
on those values.

Scale design:
- top-k against a FIXED query set: broadcast the queries, scan the corpus
  once, TakeOrderedAndProject per query — no shuffle of the corpus.
- near-dup among N vectors: brute force is O(N^2) and only acceptable on a
  candidate subset; the scale path buckets by hyperplane-sign signature
  (ann_lsh_buckets) and compares within buckets only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.fanout import fanout
from ..lineage import audit_rounds, truncate as _truncate_lineage
from ..plans.registry import query, table

_SCALE = 1e9  # fixed-point scale: ~9 significant decimals, no int64 overflow
               # for |x*y| sums up to ~9e9 (dims*values far below that here)


def exact_dot(a: Column | str, b: Column | str) -> Column:
    """Order-independent dot product of two float arrays -> double
    (floor fixed-point; see module docstring).

    When both operands are plain column NAMES the expression parses from
    one SQL string (a single py4j round-trip) instead of ~30
    Column-method calls — exact_dot appears inside per-round loops
    (k-center, IVF assignment) where builder chatter is measurable
    (round-11 guide §7.3). The string yields the identical Catalyst tree:
    same ZipWith/ArrayAggregate HOFs, same CAST/FLOOR placement, the
    same left-associated `x * y * 1E9` product, and 1E9 parses as DOUBLE
    exactly like the old F.lit(1e9). Only plain-identifier names take the
    SQL path (ADVICE r11): a name needing quoting (hyphen, space, dot)
    falls through to the Column path below, so both paths accept exactly
    the names F.col does."""
    if isinstance(a, str) and isinstance(b, str) and a.isidentifier() and b.isidentifier():
        assert _SCALE == 1e9
        return F.expr(
            f"aggregate(zip_with({a}, {b}, (x, y) ->"
            " FLOOR(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1E9)),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x) / 1E9"
        )
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(
        a, b, lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(_SCALE))
    )
    return (
        F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x) / F.lit(_SCALE)
    )


def _dot_sql(a: str, b: str) -> str:
    """DuckDB twin of exact_dot (indexed list lambda, int64 fixed-point sum)."""
    return (
        f"(CAST(list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST(floor(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) * 1e9) AS BIGINT))) "
        f"AS DOUBLE) / 1e9)"
    )


def cosine(a, b) -> Column:
    return exact_dot(a, b) / (F.sqrt(exact_dot(a, a)) * F.sqrt(exact_dot(b, b)))


def _cosine_sql(a: str, b: str) -> str:
    return f"{_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"


@query(
    "embedding_norms",
    oracle=f"""
    SELECT vec_id, label,
      CAST(len(embedding) AS INTEGER) AS dim,
      sqrt({_dot_sql('embedding', 'embedding')}) AS l2_norm
    FROM embeddings
    """,
)
def embedding_norms(spark, sf_dir):
    """Array plumbing smoke: per-vector dimension + L2 norm, map-side only."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.sqrt(exact_dot("embedding", "embedding")).alias("l2_norm"),
    )


@query(
    "similarity_topk_cosine",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings
               WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings))
    SELECT vec_id, label, {_cosine_sql('embedding', 'qv')} AS cos_sim
    FROM embeddings, q
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
)
def similarity_topk_cosine(spark, sf_dir):
    """Brute-force cosine top-10 for a single query vector (the min vec_id).
    The query row broadcasts; the corpus is scanned once with a JVM-side
    codegen'd dot product; TakeOrderedAndProject gives the global top-k
    without a shuffle."""
    e = table(spark, sf_dir, "embeddings")
    qid = e.agg(F.min("vec_id").alias("m"))
    q = (
        e.join(F.broadcast(qid), F.col("vec_id") == F.col("m"))
        .select(F.col("embedding").alias("qv"))
    )
    return (
        e.crossJoin(F.broadcast(q))
        .select("vec_id", "label", cosine("embedding", "qv").alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )


@query(
    "neardup_embedding_cosine",
    oracle=f"""
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0)
    SELECT a.vec_id AS id1, b.vec_id AS id2,
      {_cosine_sql('a.embedding', 'b.embedding')} AS cos_sim
    FROM sub a JOIN sub b ON a.vec_id < b.vec_id
    WHERE {_cosine_sql('a.embedding', 'b.embedding')} >= 0.2
    """,
)
def neardup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup over a vec_id%5 candidate subset (at scale
    the subset comes from LSH buckets, not a modulus — see
    ann_lsh_buckets)."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    a = e.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("eb"))
    return (
        a.join(F.broadcast(b), F.col("id1") < F.col("id2"))
        .select("id1", "id2", cosine("ea", "eb").alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.2)
    )


# ---------------------------------------------------- LSH scale path (ANN)

N_HYPERPLANES = 8


def _hyperplane_coeff_sql(p: int, i: str) -> str:
    """Deterministic pseudo-random hyperplane coefficient in [-1, 1):
    derived from md5 of '<plane>:<dim>' — reproducible in any engine."""
    return (
        f"(CAST(('0x' || substr(md5('{p}:' || CAST({i} AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)"
        f" / 2147483648.0 - 1.0)"
    )


def _hyperplane_coeff_py(p: int, i: int) -> float:
    """Python twin of _hyperplane_coeff_sql: same md5 derivation, evaluated
    once on the driver. int(hex,16)/2^31 - 1 is exact in double, so the
    value is bit-identical to what the SQL expression computes."""
    import hashlib

    h = int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:8], 16)
    return h / 2147483648.0 - 1.0


def _plane_sign(p: int, dims: int) -> Column:
    """Sign bit of <embedding, hyperplane_p> (fixed-point accumulation).

    Perf: the coefficient vector is a CONSTANT — materialized driver-side as
    an array literal instead of 64 md5 calls per row (was the bench's worst
    offender: 8 planes x 64 dims x md5 per row)."""
    coeffs = F.array(*[F.lit(_hyperplane_coeff_py(p, i)) for i in range(1, dims + 1)])
    prods = F.zip_with(
        F.col("embedding"),
        coeffs,
        lambda x, c: F.floor(x.cast("double") * c * F.lit(_SCALE)),
    )
    dot = F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return F.when(dot > 0, F.lit(1)).otherwise(F.lit(0))


def _plane_sign_sql(p: int) -> str:
    return (
        "CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1), "
        f"i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * {_hyperplane_coeff_sql(p, 'i')} "
        "* 1e9) AS BIGINT))) > 0 THEN 1 ELSE 0 END"
    )


@query(
    "ann_lsh_buckets",
    oracle="""
    SELECT vec_id,
      CAST(""" + " + ".join(
        f"({_plane_sign_sql(p)} * {1 << p})" for p in range(N_HYPERPLANES)
    ) + """ AS BIGINT) AS bucket
    FROM embeddings
    """,
)
def ann_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH: 8 deterministic md5-seeded hyperplanes give a
    256-bucket signature. This is the ANN scale path: near-neighbors collide
    in buckets, and the subsequent within-bucket brute force replaces the
    global O(N^2). Map-side only — one projection pass over the corpus."""
    return _bucketed(spark, sf_dir).select("vec_id", "bucket")


def _bucketed(spark, sf_dir):
    """(vec_id, embedding, bucket) — the LSH index table."""
    e = table(spark, sf_dir, "embeddings")
    dims = len(e.select("embedding").first()["embedding"])
    bucket = None
    for p in range(N_HYPERPLANES):
        term = _plane_sign(p, dims) * F.lit(1 << p)
        bucket = term if bucket is None else bucket + term
    return e.select("vec_id", "label", "embedding", bucket.cast("bigint").alias("bucket"))


_BUCKET_SQL = "CAST(" + " + ".join(
    f"({_plane_sign_sql(p)} * {1 << p})" for p in range(N_HYPERPLANES)
) + " AS BIGINT)"


@query(
    "ann_search_within_buckets",
    oracle=f"""
    WITH idx AS (SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings),
    q AS (SELECT vec_id AS qid, embedding AS qv, bucket FROM idx WHERE vec_id % 100 = 0),
    cand AS (
      SELECT q.qid, i.vec_id,
        {_cosine_sql('i.embedding', 'q.qv')} AS cos_sim
      FROM q JOIN idx i ON i.bucket = q.bucket AND i.vec_id <> q.qid
    )
    SELECT qid, vec_id, cos_sim, rnk FROM (
      SELECT qid, vec_id, cos_sim,
        CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id)
             AS INTEGER) AS rnk
      FROM cand) t
    WHERE rnk <= 3
    """,
)
def ann_search_within_buckets(spark, sf_dir):
    """The COMPLETE ANN pipeline: LSH-bucket the corpus once, equi-join
    queries to their bucket, exact cosine only within the bucket, top-3 per
    query via row_number. Per-query cost is O(bucket size), not O(N) —
    the shuffle key is the bucket, so work fans out evenly. Brute-force twin
    for recall comparison: similarity_topk_cosine."""
    idx = _bucketed(spark, sf_dir).drop("label")
    q = (
        idx.filter(F.col("vec_id") % 100 == 0)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"),
                F.col("bucket").alias("qbucket"))
    )
    cand = idx.join(
        q, (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("qid"))
    ).select("qid", "vec_id", cosine("embedding", "qv").alias("cos_sim"))
    from pyspark.sql import Window as W

    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        cand.select("qid", "vec_id", "cos_sim", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


# ------------------------------------------- int8 quantized search + rescore

Q_BITS_MAX = 127
RESCORE_CANDIDATES = 10
QUANT_TOPK = 3


def _quantize(col):
    """Per-vector symmetric int8 quantization: scale = 127 / max|x|,
    q[i] = floor(x[i] * scale) (floor, not round — floor(double) is
    bit-identical across engines, banker's-vs-half-up round is not).
    Returns (q: array<int>, scale: double)."""
    x = F.col(col) if isinstance(col, str) else col
    mx = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double"))))
    scale = F.when(mx > 0, F.lit(Q_BITS_MAX) / mx).otherwise(F.lit(1.0))
    q = F.transform(x, lambda v: F.floor(v.cast("double") * scale).cast("int"))
    return q, scale


def _int_dot(a, b):
    """Exact integer dot product of two int arrays -> long."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


_QUANT_SQL = f"""
    qz AS (
      SELECT vec_id, embedding,
        CASE WHEN mx > 0 THEN {Q_BITS_MAX} / mx ELSE 1.0 END AS scale,
        list_transform(embedding,
          v -> CAST(floor(CAST(v AS DOUBLE)
                          * CASE WHEN mx > 0 THEN {Q_BITS_MAX} / mx ELSE 1.0 END)
               AS INTEGER)) AS q
      FROM (
        SELECT vec_id, embedding,
          list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS mx
        FROM embeddings)
    )
"""


def _int_dot_sql(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS BIGINT) * CAST({b}[i] AS BIGINT))) AS BIGINT)"
    )


def _int_cos_sql(a: str, b: str) -> str:
    return (
        f"(CAST({_int_dot_sql(a, b)} AS DOUBLE) "
        f"/ (sqrt(CAST({_int_dot_sql(a, a)} AS DOUBLE)) "
        f"* sqrt(CAST({_int_dot_sql(b, b)} AS DOUBLE))))"
    )


@query(
    "similarity_quantized_rescored",
    oracle=f"""
    WITH {_QUANT_SQL},
    qv AS (SELECT q AS qq, embedding AS qe
           FROM qz WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)),
    approx AS (
      SELECT vec_id, embedding, {_int_cos_sql('q', 'qq')} AS acos
      FROM qz, qv
      ORDER BY acos DESC, vec_id
      LIMIT {RESCORE_CANDIDATES}
    )
    SELECT vec_id, {_cosine_sql('embedding', 'qe')} AS cos_sim
    FROM approx, qv
    ORDER BY cos_sim DESC, vec_id
    LIMIT {QUANT_TOPK}
    """,
)
def similarity_quantized_rescored(spark, sf_dir):
    """Two-stage quantized search: the corpus is symmetric-int8 quantized
    (4x smaller than float32 — at 100 TB of embeddings that is the
    difference between the index fitting executor memory or not), the
    cheap integer-dot cosine ranks everything, the top-{RESCORE_CANDIDATES}
    survivors are RESCORED with full-precision cosine, and the exact top-3
    is returned. Both stages are TakeOrderedAndProject (bounded top-k,
    never a global sort); the query vector broadcasts. Quantization uses
    floor (bit-identical across engines) so the oracle matches exactly."""
    e = table(spark, sf_dir, "embeddings")
    q_arr, _scale = _quantize("embedding")
    qz = e.select("vec_id", "embedding", q_arr.alias("q"))
    qid = e.agg(F.min("vec_id").alias("m"))
    qv = (
        qz.join(F.broadcast(qid), F.col("vec_id") == F.col("m"))
        .select(F.col("q").alias("qq"), F.col("embedding").alias("qe"))
    )
    icos = (
        _int_dot("q", "qq").cast("double")
        / (
            F.sqrt(_int_dot("q", "q").cast("double"))
            * F.sqrt(_int_dot("qq", "qq").cast("double"))
        )
    )
    approx = (
        qz.crossJoin(F.broadcast(qv))
        .select("vec_id", "embedding", "qe", icos.alias("acos"))
        .orderBy(F.col("acos").desc(), "vec_id")
        .limit(RESCORE_CANDIDATES)
    )
    return (
        approx.select("vec_id", cosine("embedding", "qe").alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(QUANT_TOPK)
    )


# --------------------------------------------- kNN label-vote classifier

KNN_K = 5


@query(
    "knn_label_vote",
    oracle=f"""
    WITH q AS MATERIALIZED (
      SELECT vec_id AS qid, embedding AS qv, label AS true_label
      FROM embeddings WHERE vec_id % 100 = 0
    ),
    scored AS MATERIALIZED (
      SELECT q.qid, q.true_label, e.vec_id, e.label,
        ROW_NUMBER() OVER (PARTITION BY q.qid
                           ORDER BY {_cosine_sql('e.embedding', 'q.qv')} DESC,
                                    e.vec_id) AS rn
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.qid
    ),
    votes AS (
      SELECT qid, true_label, label, CAST(count(*) AS BIGINT) AS n_votes
      FROM scored WHERE rn <= {KNN_K}
      GROUP BY qid, true_label, label
    )
    SELECT qid, true_label, label AS pred_label, n_votes FROM (
      SELECT qid, true_label, label, n_votes,
        ROW_NUMBER() OVER (PARTITION BY qid
                           ORDER BY n_votes DESC, label) AS vr
      FROM votes) t
    WHERE vr = 1
    """,
)
def knn_label_vote(spark, sf_dir):
    """kNN majority-vote classification over the embedding space: each query
    (1% sample, same convention as the ANN suite) takes the majority label
    of its {KNN_K} nearest corpus neighbors by exact cosine, ties to the
    smaller label id. The classifier every labeling pipeline starts from
    (and the quality probe for embedding spaces: high kNN agreement =
    labels are linearly recoverable). Scale shape: queries broadcast, one
    corpus scan, per-query top-k window over the 1% fan-out only; the vote
    is a partial-aggregated count + argmax — no corpus shuffle. The
    corpus side fans out of the one-task single-row-group scan so the
    per-pair cosine work parallelizes."""
    e = fanout(table(spark, sf_dir, "embeddings"), "vec_id")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("true_label"),
    )
    from pyspark.sql import Window as W

    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "true_label", "vec_id", "label",
            cosine("embedding", "qv").alias("cs"),
        )
    )
    rn = F.row_number().over(
        W.partitionBy("qid").orderBy(F.col("cs").desc(), "vec_id")
    )
    votes = (
        scored.select("qid", "true_label", "label", rn.alias("rn"))
        .filter(F.col("rn") <= KNN_K)
        .groupBy("qid", "true_label", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    best = F.max(
        F.struct(F.col("n_votes"), (-F.col("label")).alias("nl"), F.col("label"))
    ).alias("b")
    return (
        votes.groupBy("qid", "true_label")
        .agg(best)
        .select(
            "qid",
            "true_label",
            F.col("b.label").alias("pred_label"),
            F.col("b.n_votes").alias("n_votes"),
        )
    )


@query(
    "knn_confusion_matrix",
    oracle=f"""
    WITH q AS MATERIALIZED (
      SELECT vec_id AS qid, embedding AS qv, label AS true_label
      FROM embeddings WHERE vec_id % 100 = 0
    ),
    scored AS MATERIALIZED (
      SELECT q.qid, q.true_label, e.label,
        ROW_NUMBER() OVER (PARTITION BY q.qid
                           ORDER BY {_cosine_sql('e.embedding', 'q.qv')} DESC,
                                    e.vec_id) AS rn
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.qid
    ),
    votes AS (
      SELECT qid, true_label, label, CAST(count(*) AS BIGINT) AS n_votes
      FROM scored WHERE rn <= {KNN_K}
      GROUP BY qid, true_label, label
    ),
    pred AS (
      SELECT qid, true_label, label AS pred_label FROM (
        SELECT qid, true_label, label,
          ROW_NUMBER() OVER (PARTITION BY qid
                             ORDER BY n_votes DESC, label) AS vr
        FROM votes) t
      WHERE vr = 1
    )
    SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n
    FROM pred GROUP BY true_label, pred_label
    """,
)
def knn_confusion_matrix(spark, sf_dir):
    """Confusion matrix of the kNN label-vote classifier — the evaluation
    summary a labeling-pipeline report actually shows. One extra tiny
    aggregate over knn_label_vote's per-query predictions (query-sample
    sized, so the regroup is negligible next to the scoring pass)."""
    return (
        knn_label_vote(spark, sf_dir)
        .groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ------------------------------------------------- embedding whitening

@query(
    "embedding_whitening",
    oracle="""
    WITH x AS MATERIALIZED (
      SELECT vec_id, CAST(i - 1 AS INTEGER) AS j,
        CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e9) AS BIGINT) AS fx
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
    ),
    st AS (
      SELECT j,
        CAST(SUM(fx) AS DOUBLE) / COUNT(*) / 1e9 AS mu,
        CAST(COUNT(*) AS BIGINT) AS n,
        (CAST(SUM(CAST(fx AS DECIMAL(38,0)) * fx) AS DOUBLE) / 1e18
          - (CAST(SUM(fx) AS DOUBLE) / 1e9) * (CAST(SUM(fx) AS DOUBLE) / 1e9)
            / COUNT(*)) / COUNT(*) AS var
      FROM x GROUP BY j
    )
    SELECT vec_id, x.j,
      round((CAST(fx AS DOUBLE) / 1e9 - mu) / sqrt(var + 1e-9), 8) AS v
    FROM x JOIN st ON st.j = x.j
    """,
)
def embedding_whitening(spark, sf_dir):
    """Per-dimension whitening (zero mean, unit variance) — the standard
    embedding post-processing before cosine retrieval or PQ training
    (dominant dimensions otherwise drown the rest of the space).
    Statistics accumulate as exact fixed-point sums — int64 for the mean,
    DECIMAL(38,0) for the sum of squares (|fx^2| <= 1e18, so an int64
    accumulator would overflow past ~9 rows-of-1.0 corpus-side; decimal
    is exact at any corpus size) — so mu and var are bit-identical
    cross-engine; the
    transform itself is a broadcast join of d per-dim stat rows onto the
    exploded corpus — map-side after one (j)-keyed aggregate. Output
    rounded to 8 decimals (sqrt hygiene)."""
    e = table(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id", F.posexplode("embedding").alias("j", "xx")
    ).select(
        "vec_id",
        F.col("j").cast("int").alias("j"),
        F.floor(F.col("xx").cast("double") * F.lit(1e9)).alias("fx"),
    )
    st = x.groupBy("j").agg(
        (F.sum("fx").cast("double") / F.count(F.lit(1)) / F.lit(1e9)).alias("mu"),
        (
            (
                F.sum(F.col("fx").cast("decimal(38,0)") * F.col("fx"))
                .cast("double") / F.lit(1e18)
                - (F.sum("fx").cast("double") / F.lit(1e9))
                * (F.sum("fx").cast("double") / F.lit(1e9))
                / F.count(F.lit(1))
            )
            / F.count(F.lit(1))
        ).alias("var"),
    )
    return x.join(F.broadcast(st), "j").select(
        "vec_id",
        "j",
        F.round(
            (F.col("fx").cast("double") / F.lit(1e9) - F.col("mu"))
            / F.sqrt(F.col("var") + F.lit(1e-9)),
            8,
        ).alias("v"),
    )


# ------------------------------------------- similarity distribution

SIM_HIST_BINS = 20


@query(
    "similarity_histogram",
    oracle=f"""
    WITH q AS MATERIALIZED (
      SELECT vec_id AS qid, embedding AS qv
      FROM embeddings WHERE vec_id % 100 = 0
    ),
    cs AS (
      SELECT least({SIM_HIST_BINS - 1}, CAST(floor(
        ({_cosine_sql('e.embedding', 'q.qv')} + 1.0) / 2.0 * {SIM_HIST_BINS}
      ) AS INTEGER)) AS bin
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.qid
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n
    FROM cs GROUP BY bin
    """,
)
def similarity_histogram(spark, sf_dir):
    """Histogram of query-to-corpus cosine similarities ({SIM_HIST_BINS}
    bins over [-1, 1]) — the calibration evidence behind every similarity
    threshold in the suite (near-dup cutoffs, ANN recall targets): you
    pick 0.8 by looking at THIS distribution, not by folklore. Cosines
    are the exact fixed-point values, binned JVM-side; the query sample
    broadcasts, the corpus is scanned once, and the aggregate ships
    {SIM_HIST_BINS} partial counts per partition."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    binned = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            F.least(
                F.lit(SIM_HIST_BINS - 1),
                F.floor(
                    (cosine("embedding", "qv") + 1.0) / 2.0 * SIM_HIST_BINS
                ).cast("int"),
            ).alias("bin")
        )
    )
    return binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))


@query(
    "ann_search_multiprobe",
    oracle=f"""
    WITH idx AS (SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings),
    q AS (SELECT vec_id AS qid, embedding AS qv, bucket FROM idx WHERE vec_id % 100 = 0),
    probes AS (
      SELECT qid, qv, CAST(xor(bucket, p) AS BIGINT) AS pbucket
      FROM q, UNNEST([0{"".join(f", {1 << p}" for p in range(N_HYPERPLANES))}]) AS u(p)
    ),
    cand AS (
      SELECT DISTINCT probes.qid, i.vec_id, probes.qv
      FROM probes JOIN idx i ON i.bucket = probes.pbucket AND i.vec_id <> probes.qid
    )
    SELECT qid, vec_id, cos_sim, rnk FROM (
      SELECT qid, vec_id,
        {_cosine_sql('i.embedding', 'cand.qv')} AS cos_sim,
        CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
          {_cosine_sql('i.embedding', 'cand.qv')} DESC, vec_id) AS INTEGER) AS rnk
      FROM cand JOIN embeddings i USING (vec_id)) t
    WHERE rnk <= 3
    """,
)
def ann_search_multiprobe(spark, sf_dir):
    """Multiprobe LSH search: each query probes its own bucket PLUS the
    {N_HYPERPLANES} buckets at Hamming distance 1 (one hyperplane sign
    flipped) — the standard recall knob for sign-LSH, mirroring what
    nprobe does for IVF (a vector near a hyperplane lands on either side
    with ~equal probability; probing the flips recovers those misses
    without growing the index). The probe fan-out multiplies only the
    QUERY side (1% sample x 9 buckets); the corpus
    stays single-bucketed, and the candidate dedup + per-query top-k are
    query-sample-sized. tests assert multiprobe recall dominates
    single-probe."""
    idx = _bucketed(spark, sf_dir).drop("label")
    q = idx.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    flips = F.array(*[F.lit(0)] + [F.lit(1 << p) for p in range(N_HYPERPLANES)])
    probes = q.select(
        "qid", "qv",
        F.explode(F.transform(flips, lambda p: F.col("qbucket").bitwiseXOR(p))).alias(
            "pbucket"
        ),
    )
    cand = (
        idx.select("vec_id", "bucket")
        .join(
            F.broadcast(probes),
            (F.col("bucket") == F.col("pbucket")) & (F.col("vec_id") != F.col("qid")),
        )
        .select("qid", "vec_id")
        .distinct()
    )
    scored = cand.join(idx.select("vec_id", "embedding"), "vec_id").join(
        F.broadcast(q.select("qid", "qv")), "qid"
    ).select("qid", "vec_id", cosine("embedding", "qv").alias("cos_sim"))
    from pyspark.sql import Window as W

    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        scored.select("qid", "vec_id", "cos_sim", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


# ------------------------------------------- grid-quantized duplicates

GRID_QUANT_SCALE = 2  # cells of width 0.5 per dimension


@query(
    "embedding_grid_duplicates",
    oracle=f"""
    WITH k AS (
      SELECT vec_id, label,
        md5(array_to_string(list_transform(embedding,
          x -> CAST(CAST(round(CAST(x AS DOUBLE) * {GRID_QUANT_SCALE}, 0)
                         AS BIGINT) AS VARCHAR)), ',')) AS grid_key
      FROM embeddings
    )
    SELECT grid_key,
      CAST(COUNT(*) AS BIGINT) AS n_vecs,
      CAST(MIN(vec_id) AS BIGINT) AS canonical_vec_id,
      CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels
    FROM k GROUP BY grid_key HAVING COUNT(*) > 1
    """,
)
def embedding_grid_duplicates(spark, sf_dir):
    """Grid-quantized near-identical vector buckets: every dimension
    snaps to a 1/{GRID_QUANT_SCALE}-wide cell, the cell-coordinate tuple
    md5s into a blocking key, and buckets with >1 vector surface
    re-exported / near-copy embeddings (n_labels > 1 inside a bucket is
    the mislabel alarm). Quantized coordinates are exact INTEGERS
    rendered to strings — no double-formatting dependence — so the one
    16-byte-key shuffle is bit-identical in both engines. This is the
    degenerate (single-cell) case of LSH blocking: candidates only,
    exactness by construction at the cell width."""
    e = table(spark, sf_dir, "embeddings")
    key = F.md5(
        F.concat_ws(
            ",",
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * GRID_QUANT_SCALE, 0)
                .cast("bigint")
                .cast("string"),
            ),
        )
    )
    return (
        e.groupBy(key.alias("grid_key"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.min("vec_id").cast("bigint").alias("canonical_vec_id"),
            F.count_distinct("label").cast("bigint").alias("n_labels"),
        )
        .filter(F.col("n_vecs") > 1)
    )


# --------------------------------------- MMR diversified retrieval

MMR_LAMBDA = 0.7
MMR_K = 5
MMR_CANDIDATES = 20


def _mmr_oracle() -> str:
    cq = _cosine_sql("e.embedding", "q.qv")
    cab = _cosine_sql("ca.embedding", "cb.embedding")
    steps = []
    for k in range(2, MMR_K + 1):
        prev = f"sel{k - 1}"
        steps.append(f"""
    sc{k} AS (
      SELECT c.vec_id, c.qsim,
        {MMR_LAMBDA} * c.qsim - {1 - MMR_LAMBDA} * (
          SELECT MAX(p.s) FROM pairs p
          JOIN {prev} s ON p.b = s.vec_id WHERE p.a = c.vec_id) AS score
      FROM cand c
      WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})
    ),
    mx{k} AS (SELECT MAX(score) AS ms FROM sc{k}),
    pk{k} AS (
      SELECT MIN(vec_id) AS vid FROM sc{k}, mx{k} WHERE score = ms
    ),
    sel{k} AS MATERIALIZED (
      SELECT vec_id, qsim, score, {k} AS rnk
      FROM sc{k}, pk{k} WHERE vec_id = vid
      UNION ALL SELECT vec_id, qsim, score, rnk FROM {prev}
    )""")
    return f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings
               WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)),
    cand AS MATERIALIZED (
      SELECT e.vec_id, e.embedding, {cq} AS qsim
      FROM embeddings e, q
      ORDER BY qsim DESC, vec_id LIMIT {MMR_CANDIDATES}
    ),
    pairs AS MATERIALIZED (
      SELECT ca.vec_id AS a, cb.vec_id AS b, {cab} AS s
      FROM cand ca, cand cb
    ),
    sc1 AS (SELECT vec_id, qsim, {MMR_LAMBDA} * qsim AS score FROM cand),
    mx1 AS (SELECT MAX(score) AS ms FROM sc1),
    pk1 AS (SELECT MIN(vec_id) AS vid FROM sc1, mx1 WHERE score = ms),
    sel1 AS MATERIALIZED (
      SELECT vec_id, qsim, score, 1 AS rnk FROM sc1, pk1 WHERE vec_id = vid
    ),{",".join(steps)}
    SELECT CAST(rnk AS INTEGER) AS rnk, vec_id,
      round(qsim, 8) AS relevance, round(score, 8) AS mmr_score
    FROM sel{MMR_K}
    """


@query("retrieval_mmr_diversified", oracle=_mmr_oracle())
def retrieval_mmr_diversified(spark, sf_dir):
    """Maximal Marginal Relevance re-ranking: greedy top-{MMR_K}
    selection from the cosine top-{MMR_CANDIDATES} maximizing
    lambda*rel(d) - (1-lambda)*max_sim(d, already-picked) — the
    standard diversity re-ranker (Carbonell-Goldstein 1998) that a RAG
    stack runs after ANN so five near-identical passages don't fill
    the context window. similarity_topk_cosine is the rel-only
    baseline this diversifies.

    Scale shape: the DISTRIBUTED work is the corpus scan producing the
    candidate set (TakeOrderedAndProject, no shuffle) and the bounded
    candidate-pair similarity grid — both through the fixed-point
    exact_dot kernel. The greedy selection itself touches exactly
    MMR_CANDIDATES + MMR_CANDIDATES^2 precomputed numbers, so it runs
    as driver-side control flow (same contract as the iterative
    operators' convergence checks: bounded by construction, never
    corpus-sized). Ties break max-score-then-min-vec_id; final
    rounding happens in a Spark projection so both engines round the
    same doubles."""
    e = table(spark, sf_dir, "embeddings")
    qid = e.agg(F.min("vec_id").alias("m"))
    q = e.join(F.broadcast(qid), F.col("vec_id") == F.col("m")).select(
        F.col("embedding").alias("qv")
    )
    cand = (
        e.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            cosine("embedding", "qv").alias("qsim"),
        )
        .orderBy(F.col("qsim").desc(), "vec_id")
        .limit(MMR_CANDIDATES)
        .persist()
    )
    ca = cand.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("ea")
    )
    cb = cand.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("eb")
    )
    pairs = ca.crossJoin(F.broadcast(cb)).select(
        "a", "b", cosine("ea", "eb").alias("s")
    )
    crows = cand.select("vec_id", "qsim").collect()
    sim = {(r["a"], r["b"]): r["s"] for r in pairs.collect()}
    cand.unpersist()
    rel = {r["vec_id"]: r["qsim"] for r in crows}
    remaining = sorted(rel)
    out = []
    for rnk in range(1, MMR_K + 1):
        best = None
        for v in remaining:
            if rnk == 1:
                score = MMR_LAMBDA * rel[v]
            else:
                score = MMR_LAMBDA * rel[v] - (1 - MMR_LAMBDA) * max(
                    sim[(v, s)] for _, s, _, _ in out
                )
            # max score, then MIN vec_id: remaining is id-ascending, so
            # strict > keeps the first (smallest) id on ties.
            if best is None or score > best[1]:
                best = (v, score)
        out.append((rnk, best[0], rel[best[0]], best[1]))
        remaining.remove(best[0])
    df = spark.createDataFrame(
        out, "rnk int, vec_id bigint, relevance double, mmr_score double"
    )
    return df.select(
        "rnk",
        "vec_id",
        F.round("relevance", 8).alias("relevance"),
        F.round("mmr_score", 8).alias("mmr_score"),
    )


# --------------------------------- embedding geometry health report


@query(
    "embedding_geometry_report",
    oracle=f"""
    WITH h AS (
      SELECT vec_id, embedding, md5(CAST(vec_id AS VARCHAR)) AS hh
      FROM embeddings
    ),
    paired AS (
      SELECT embedding, lead(embedding) OVER w AS emb2
      FROM h
      WINDOW w AS (PARTITION BY substr(hh, 1, 1) ORDER BY hh)
    ),
    cosv AS (
      SELECT {_cosine_sql('embedding', 'emb2')} AS cs
      FROM paired WHERE emb2 IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
      round(CAST(SUM(CAST(round(cs, 9) AS DECIMAL(28,12))) AS DOUBLE)
        / COUNT(*), 8) AS mean_cos,
      round(MIN(cs), 8) AS min_cos,
      round(MAX(cs), 8) AS max_cos,
      round(CAST(SUM(CASE WHEN cs > 0.9 THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*), 8) AS frac_near_dup,
      round(CAST(SUM(CASE WHEN cs < 0 THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*), 8) AS frac_negative
    FROM cosv
    """,
)
def embedding_geometry_report(spark, sf_dir):
    """Embedding-space health check on deterministic pseudo-random pairs:
    vectors are ordered by md5(vec_id) within 16 hash buckets and each
    is paired with its successor — an unbiased-in-practice pair sample
    with ZERO randomness and no quadratic blowup. Reports the cosine
    mean/min/max plus the collapsed fraction (cos > 0.9 between
    unrelated vectors = representation collapse, the classic failure
    before ANN indexing or SemDeDup) and the negative fraction
    (anisotropy direction). Run this BEFORE trusting any
    cosine-thresholded op (semantic_dedup_*, ann_*).

    Scale shape: the hash ordering partitions into 16 independent
    windows (no global sort), pairing is one lead() per partition, and
    the report is a single partial-aggregated reduce; pair count is
    N - 16, linear in the corpus."""
    from pyspark.sql import Window as W_

    h = table(spark, sf_dir, "embeddings").select(
        "embedding", F.md5(F.col("vec_id").cast("string")).alias("hh")
    )
    w = W_.partitionBy(F.substring("hh", 1, 1)).orderBy("hh")
    paired = h.select(
        "embedding", F.lead("embedding").over(w).alias("emb2")
    ).filter(F.col("emb2").isNotNull())
    cosv = paired.select(cosine("embedding", "emb2").alias("cs"))
    n = F.count(F.lit(1))
    return cosv.agg(
        n.cast("bigint").alias("n_pairs"),
        F.round(
            F.sum(F.round(F.col("cs"), 9).cast("decimal(28,12)")).cast("double") / n,
            8,
        ).alias("mean_cos"),
        F.round(F.min("cs"), 8).alias("min_cos"),
        F.round(F.max("cs"), 8).alias("max_cos"),
        F.round(F.sum((F.col("cs") > 0.9).cast("int")).cast("double") / n, 8).alias(
            "frac_near_dup"
        ),
        F.round(F.sum((F.col("cs") < 0).cast("int")).cast("double") / n, 8).alias(
            "frac_negative"
        ),
    )


# --------------------------------- LSH candidate-generation quality


@query(
    "ann_lsh_pair_recall",
    oracle=f"""
    WITH sub AS (
      SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket
      FROM embeddings WHERE vec_id % 5 = 0
    ),
    truth AS (
      SELECT a.vec_id AS id1, b.vec_id AS id2
      FROM sub a JOIN sub b ON a.vec_id < b.vec_id
      WHERE {_cosine_sql('a.embedding', 'b.embedding')} >= 0.2
    ),
    cand AS (
      SELECT a.vec_id AS id1, b.vec_id AS id2
      FROM sub a JOIN sub b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    hit AS (
      SELECT truth.id1, truth.id2 FROM truth
      JOIN cand ON truth.id1 = cand.id1 AND truth.id2 = cand.id2
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS n_hit,
      round((SELECT COUNT(*) FROM hit)
        / CAST((SELECT COUNT(*) FROM cand) AS DOUBLE), 8) AS pair_precision,
      round((SELECT COUNT(*) FROM hit)
        / CAST((SELECT COUNT(*) FROM truth) AS DOUBLE), 8) AS pair_recall
    """,
)
def ann_lsh_pair_recall(spark, sf_dir):
    """Candidate-generation quality of the hyperplane LSH index for
    NEAR-DUP PAIR mining (not top-k search — that harness is
    ann_ivf_recall_at_k): on the vec_id%5 evaluation subset, ground
    truth = all pairs with cosine >= 0.2, candidates = same-bucket
    pairs, and the report is pair precision/recall. This is the number
    that justifies (or vetoes) replacing the O(N^2) verify with
    LSH-bucketed verify in semantic_dedup_clusters at scale: recall is
    what you lose, precision is what you pay.

    Scale shape: the ground-truth side is the harness's deliberately
    bounded evaluation subset; the candidate side is the bucket
    equi-join (never all-pairs), and the three counts reduce to one
    row. At production scale the truth set would itself come from a
    held-out sample — the PLUMBING is identical."""
    sub = _bucketed(spark, sf_dir).filter(F.col("vec_id") % 5 == 0).drop("label")
    a = sub.select(
        F.col("vec_id").alias("id1"),
        F.col("embedding").alias("ea"),
        F.col("bucket").alias("ba"),
    )
    b = sub.select(
        F.col("vec_id").alias("id2"),
        F.col("embedding").alias("eb"),
        F.col("bucket").alias("bb"),
    )
    truth = (
        a.join(F.broadcast(b), F.col("id1") < F.col("id2"))
        .filter(cosine("ea", "eb") >= 0.2)
        .select("id1", "id2")
        .persist()
    )
    cand = (
        a.select("id1", "ba")
        .join(
            b.select("id2", F.col("bb").alias("ba")),
            "ba",
        )
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .persist()
    )
    hit = truth.join(cand, ["id1", "id2"])
    nt = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    nc = cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
    nh = hit.agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    return (
        nt.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(nh))
        .select(
            "n_truth",
            "n_candidates",
            "n_hit",
            F.round(
                F.col("n_hit") / F.col("n_candidates").cast("double"), 8
            ).alias("pair_precision"),
            F.round(F.col("n_hit") / F.col("n_truth").cast("double"), 8).alias(
                "pair_recall"
            ),
        )
    )


# --------------------------------------------- k-center coreset (FPS)

KC_CENTERS = 6


def _d2_sql(a: str, b: str) -> str:
    """Exact squared L2 via three fixed-point dot products (each term is an
    int64 sum / 1e9; the combination is small-magnitude IEEE adds —
    deterministic in any engine)."""
    return (
        f"({_dot_sql(a, a)} - 2 * {_dot_sql(a, b)} + {_dot_sql(b, b)})"
    )


def _kcenter_oracle() -> str:
    parts = [
        """
    c1 AS (
      SELECT vec_id, embedding, CAST(NULL AS DOUBLE) AS radius
      FROM embeddings WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
    ),
    m1 AS (
      SELECT e.vec_id, e.embedding,
        MIN({d2}) AS mind
      FROM embeddings e CROSS JOIN c1 c
      GROUP BY e.vec_id, e.embedding
    )""".format(d2=_d2_sql("e.embedding", "c.embedding"))
    ]
    for r in range(2, KC_CENTERS + 1):
        parts.append(f"""
    p{r} AS (
      SELECT vec_id, embedding, mind,
        ROW_NUMBER() OVER (ORDER BY mind DESC, vec_id) AS rn
      FROM m{r - 1}
    ),
    c{r} AS (SELECT vec_id, embedding, mind AS radius FROM p{r} WHERE rn = 1),
    m{r} AS (
      SELECT m.vec_id, m.embedding,
        least(m.mind, {_d2_sql("m.embedding", "c.embedding")}) AS mind
      FROM m{r - 1} m CROSS JOIN c{r} c
    )""")
    sel = "\n    UNION ALL\n    ".join(
        f"SELECT {r} AS rank, vec_id, radius FROM c{r}"
        for r in range(1, KC_CENTERS + 1)
    )
    return (
        "WITH "
        + ",".join(parts)
        + f""",
    cov AS (SELECT MAX(mind) AS covering_radius FROM m{KC_CENTERS})
    SELECT CAST(s.rank AS INTEGER) AS rank, s.vec_id, s.radius,
      cov.covering_radius
    FROM ({sel}) s CROSS JOIN cov
    """
    )


@query("embedding_kcenter_coreset", oracle=_kcenter_oracle())
def embedding_kcenter_coreset(spark, sf_dir):
    """k-center coreset by farthest-point sampling (Gonzalez's 2-approx —
    the diversity-first data-selection recipe): seed with the min vec_id,
    then repeatedly add the vector FARTHEST from the current center set
    (max of min squared L2, ties to the smaller vec_id). Emits each
    center's selection radius (its distance to the previous centers — a
    non-increasing sequence, the classic coverage curve) plus the final
    covering radius every corpus vector sits within.

    Scale shape: the min-distance column is maintained INCREMENTALLY —
    each round is one crossJoin with the broadcast 1-row new center and a
    least(), never a re-scan against the whole center set, and the argmax
    is a single max(struct) aggregate (map-side combined), never a global
    sort. localCheckpoint per round keeps lineage O(1) in k, exactly the
    LPA/PageRank posture. Distances are fixed-point-exact, so center
    choices cannot drift cross-engine. The corpus fans out of the
    one-task scan; every round's min-distance maintenance and argmax
    inherits the parallel partitioning through the localCheckpoints."""
    e = fanout(
        table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        "vec_id",
    )
    first = e.orderBy("vec_id").limit(1)
    c = first.select("vec_id", F.col("embedding").alias("cv"))

    def d2(a, b):
        return (
            exact_dot(a, a) - 2 * exact_dot(a, b) + exact_dot(b, b)
        )

    m = (
        e.crossJoin(F.broadcast(c.select("cv")))
        .select("vec_id", "embedding", d2("embedding", "cv").alias("mind"))
    )
    m = _truncate_lineage(m)
    centers = [first.select("vec_id", F.lit(None).cast("double").alias("radius"))]
    for _ in range(2, audit_rounds(KC_CENTERS) + 1):
        pick = (
            m.agg(
                F.max(
                    F.struct(
                        F.col("mind"),
                        (-F.col("vec_id")).alias("nv"),
                        F.col("vec_id"),
                        F.col("embedding"),
                    )
                ).alias("p")
            )
            .select(
                F.col("p.vec_id").alias("vec_id"),
                F.col("p.mind").alias("radius"),
                F.col("p.embedding").alias("cv"),
            )
        )
        pick = _truncate_lineage(pick)
        centers.append(pick.select("vec_id", "radius"))
        m = (
            m.crossJoin(F.broadcast(pick.select("cv")))
            .select(
                "vec_id",
                "embedding",
                F.least(F.col("mind"), d2("embedding", "cv")).alias("mind"),
            )
        )
        m = _truncate_lineage(m)
    cov = F.broadcast(m.agg(F.max("mind").alias("covering_radius")))
    out = None
    for rank, cdf in enumerate(centers, start=1):
        row = cdf.select(
            F.lit(rank).cast("int").alias("rank"), "vec_id", "radius"
        )
        out = row if out is None else out.unionByName(row)
    return out.crossJoin(cov)


# --------------------------------- MMD drift between embedding groups

MMD_SCALE = 10_000  # fixed-point quantizer (matches the covariance ops)
MMD_DIM = 64


def _mmd_split_sql(split: str, gexpr: str) -> str:
    """One split's exact-moment MMD CTE chain + final row. Group moments
    are exact integers (fixed-point values summed in BIGINT), the
    mean/second-moment differences go through DECIMAL(38,0) squared sums,
    and ONE division chain at the end produces the double — identical
    across engines with no rounding anywhere."""
    return f"""
    q_{split} AS (
      SELECT {gexpr} AS g, i - 1 AS i, j - 1 AS j,
        CAST(floor(CAST(embedding[i] AS DOUBLE) * {MMD_SCALE}) AS BIGINT) AS qi,
        CAST(floor(CAST(embedding[j] AS DOUBLE) * {MMD_SCALE}) AS BIGINT) AS qj
      FROM embeddings,
        UNNEST(range(1, {MMD_DIM + 1})) AS u(i),
        UNNEST(range(1, {MMD_DIM + 1})) AS v(j)
      WHERE j >= i
    ),
    nn_{split} AS (
      SELECT
        CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) / {MMD_DIM * (MMD_DIM + 1) // 2}
             AS BIGINT) AS n0,
        CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) / {MMD_DIM * (MMD_DIM + 1) // 2}
             AS BIGINT) AS n1
      FROM q_{split}
    ),
    s_{split} AS (
      SELECT i AS j,
        CAST(SUM(CASE WHEN g = 0 THEN qi ELSE 0 END) AS BIGINT) AS s0,
        CAST(SUM(CASE WHEN g = 1 THEN qi ELSE 0 END) AS BIGINT) AS s1
      FROM q_{split} WHERE i = j GROUP BY i
    ),
    m_{split} AS (
      SELECT i, j,
        CAST(SUM(CASE WHEN g = 0 THEN qi * qj ELSE 0 END) AS BIGINT) AS m0,
        CAST(SUM(CASE WHEN g = 1 THEN qi * qj ELSE 0 END) AS BIGINT) AS m1
      FROM q_{split} GROUP BY i, j
    ),
    lin_{split} AS (
      SELECT CAST(SUM(CAST(s0 * nn.n1 - s1 * nn.n0 AS DECIMAL(38,0))
                      * (s0 * nn.n1 - s1 * nn.n0)) AS DOUBLE) AS num
      FROM s_{split} CROSS JOIN nn_{split} nn
    ),
    quad_{split} AS (
      SELECT CAST(SUM(CAST(m0 * nn.n1 - m1 * nn.n0 AS DECIMAL(38,0))
                      * (m0 * nn.n1 - m1 * nn.n0)
                      * (CASE WHEN i = j THEN 1 ELSE 2 END)) AS DOUBLE) AS num
      FROM m_{split} CROSS JOIN nn_{split} nn
    )"""


def _mmd_row_sql(split: str) -> str:
    return f"""
    SELECT '{split}' AS split, nn.n0, nn.n1,
      l.num / (CAST(nn.n0 AS DOUBLE) * nn.n1 * {MMD_SCALE}
               * (CAST(nn.n0 AS DOUBLE) * nn.n1 * {MMD_SCALE})) AS mmd2_linear,
      q.num / (CAST(nn.n0 AS DOUBLE) * nn.n1 * {MMD_SCALE} * {MMD_SCALE}
               * (CAST(nn.n0 AS DOUBLE) * nn.n1 * {MMD_SCALE} * {MMD_SCALE}))
        AS mmd2_quadratic
    FROM lin_{split} l CROSS JOIN quad_{split} q CROSS JOIN nn_{split} nn"""


@query(
    "embedding_mmd_drift",
    oracle="WITH "
    + _mmd_split_sql("half", "CAST(vec_id % 2 AS INTEGER)")
    + ","
    + _mmd_split_sql("label", "CAST(CASE WHEN label = 0 THEN 0 ELSE 1 END AS INTEGER)")
    + _mmd_row_sql("half")
    + " UNION ALL "
    + _mmd_row_sql("label"),
)
def embedding_mmd_drift(spark, sf_dir):
    """Maximum-mean-discrepancy drift test between embedding groups with
    EXACT moment arithmetic: linear-kernel MMD^2 = ||mu_A - mu_B||^2 and
    quadratic-kernel MMD^2 = ||M_A - M_B||_F^2 (M = E[xx^T]; for k(x,y) =
    (x.y)^2, E[(x.y)^2] = tr(M_X M_Y), so the Frobenius gap IS the MMD) —
    the two-sample test a production embedding pipeline runs to catch
    encoder or upstream-distribution drift without picking a bandwidth.
    Two splits side by side: a vec_id-parity NULL split (random halves —
    MMD ~ 0, the empirical noise floor) and the label-parity split (real
    structure — MMD well above the floor); drift alarms compare a
    candidate split against the null row, so the baseline ships with the
    statistic.

    Determinism: fixed-point group sums (exact BIGINT), difference
    squares in DECIMAL(38,0), and one final IEEE division chain — no
    rounding anywhere in the dataflow, so the doubles are bit-identical
    across engines at any SF.

    Scale shape: the corpus is scanned once per split into d(d+1)/2
    moment cells (map-side partial aggregation — group count, not corpus
    count, sized); everything after is d^2 arithmetic. At a billion rows
    the int64 product sums need the same DECIMAL upcast the covariance
    op documents."""
    out = None
    for split, gexpr in (
        ("half", (F.col("vec_id") % 2).cast("int")),
        ("label", F.when(F.col("label") == 0, 0).otherwise(1).cast("int")),
    ):
        # fan out of the one-task scan: the d^2-per-vector moment explode
        # below plans into the scan stage (identity at cluster scale)
        e = fanout(table(spark, sf_dir, "embeddings"), "vec_id")
        qarr = F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * MMD_SCALE).cast("bigint"),
        )
        ex = e.select(gexpr.alias("g"), F.posexplode(qarr).alias("i", "qi"), qarr.alias("q"))
        pairs = ex.select(
            "g",
            F.col("i").cast("int").alias("i"),
            "qi",
            F.posexplode("q").alias("j", "qj"),
        ).filter(F.col("j") >= F.col("i"))
        nn = F.broadcast(
            e.select(gexpr.alias("g")).groupBy().agg(
                F.sum((F.col("g") == 0).cast("int")).cast("bigint").alias("n0"),
                F.sum((F.col("g") == 1).cast("int")).cast("bigint").alias("n1"),
            )
        )
        s = (
            pairs.filter(F.col("i") == F.col("j"))
            .groupBy("i")
            .agg(
                F.sum(F.when(F.col("g") == 0, F.col("qi")).otherwise(0))
                .cast("bigint")
                .alias("s0"),
                F.sum(F.when(F.col("g") == 1, F.col("qi")).otherwise(0))
                .cast("bigint")
                .alias("s1"),
            )
        )
        m = pairs.groupBy("i", F.col("j").cast("int").alias("j")).agg(
            F.sum(F.when(F.col("g") == 0, F.col("qi") * F.col("qj")).otherwise(0))
            .cast("bigint")
            .alias("m0"),
            F.sum(F.when(F.col("g") == 1, F.col("qi") * F.col("qj")).otherwise(0))
            .cast("bigint")
            .alias("m1"),
        )
        DEC0 = "decimal(38,0)"
        dlin = F.col("s0") * F.col("n1") - F.col("s1") * F.col("n0")
        lin = s.crossJoin(nn).agg(
            F.sum(dlin.cast(DEC0) * dlin).cast("double").alias("num")
        )
        dq = F.col("m0") * F.col("n1") - F.col("m1") * F.col("n0")
        w = F.when(F.col("i") == F.col("j"), 1).otherwise(2)
        quad = m.crossJoin(nn).agg(
            F.sum(dq.cast(DEC0) * dq * w).cast("double").alias("num")
        )
        den_lin = (
            F.col("n0").cast("double") * F.col("n1") * F.lit(float(MMD_SCALE))
        )
        den_quad = (
            F.col("n0").cast("double")
            * F.col("n1")
            * F.lit(float(MMD_SCALE))
            * F.lit(float(MMD_SCALE))
        )
        row = (
            lin.withColumnRenamed("num", "lnum")
            .crossJoin(F.broadcast(quad.withColumnRenamed("num", "qnum")))
            .crossJoin(nn)
            .select(
                F.lit(split).alias("split"),
                "n0",
                "n1",
                (F.col("lnum") / (den_lin * den_lin)).alias("mmd2_linear"),
                (F.col("qnum") / (den_quad * den_quad)).alias("mmd2_quadratic"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# ------------------------- MMD permutation test (drift significance)

MMD_PERM_B = 20  # salted null splits


@query(
    "embedding_mmd_permutation_test",
    oracle=f"""
    WITH base AS (
      SELECT vec_id,
        CASE WHEN label = 0 THEN 0 ELSE 1 END AS g_obs, i - 1 AS j,
        CAST(floor(CAST(embedding[i] AS DOUBLE) * {MMD_SCALE}) AS BIGINT) AS q
      FROM embeddings, UNNEST(range(1, {MMD_DIM + 1})) AS u(i)
    ),
    splits AS (
      SELECT b.b, base.j, base.q,
        CASE WHEN b.b = -1 THEN base.g_obs
             WHEN substr(md5('mmdperm:' || CAST(b.b AS VARCHAR) || ':'
                             || CAST(base.vec_id AS VARCHAR)), 1, 1)
                  IN ('0','1','2','3','4','5','6','7')
             THEN 0 ELSE 1 END AS g
      FROM base CROSS JOIN (
        SELECT CAST(x AS INTEGER) AS b
        FROM UNNEST(range(-1, {MMD_PERM_B})) AS t(x)
      ) b
    ),
    s AS (
      SELECT b, j,
        CAST(SUM(CASE WHEN g = 0 THEN q ELSE 0 END) AS BIGINT) AS s0,
        CAST(SUM(CASE WHEN g = 1 THEN q ELSE 0 END) AS BIGINT) AS s1,
        CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM splits GROUP BY b, j
    ),
    mmd AS (
      SELECT b,
        CAST(SUM(CAST(s0 * c1 - s1 * c0 AS DECIMAL(38,0))
                 * (s0 * c1 - s1 * c0)) AS DOUBLE)
          / (CAST(MAX(c0) AS DOUBLE) * MAX(c1) * {MMD_SCALE}
             * (CAST(MAX(c0) AS DOUBLE) * MAX(c1) * {MMD_SCALE})) AS m2
      FROM s GROUP BY b
    )
    SELECT
      (SELECT m2 FROM mmd WHERE b = -1) AS mmd2_observed,
      CAST({MMD_PERM_B} AS BIGINT) AS n_permutations,
      CAST((SELECT COUNT(*) FROM mmd
            WHERE b >= 0 AND m2 >= (SELECT m2 FROM mmd WHERE b = -1))
           AS BIGINT) AS n_null_ge,
      CAST(1 + (SELECT COUNT(*) FROM mmd
                WHERE b >= 0 AND m2 >= (SELECT m2 FROM mmd WHERE b = -1))
           AS BIGINT) AS p_num,
      CAST({MMD_PERM_B + 1} AS BIGINT) AS p_den
    """,
)
def embedding_mmd_permutation_test(spark, sf_dir):
    """Permutation significance for the MMD drift statistic: the observed
    label-0-vs-rest linear-kernel MMD^2 against {MMD_PERM_B} salted-md5
    random relabelings of the SAME corpus (the exchangeability-exact null
    — no asymptotic approximation), with the standard conservative
    p-value (1 + #{{null >= observed}}) / (B + 1) emitted as an exact
    integer fraction. This upgrades embedding_mmd_drift's eyeballed
    null-floor row into a test: p_num = 1 means the observed split beat
    every permutation.

    Determinism: group sums are exact fixed-point BIGINTs per (split, dim)
    cell, difference squares in DECIMAL(38,0), one IEEE division chain per
    split — every null replicate's statistic is bit-identical across
    engines, so even the >= comparisons agree exactly.

    Scale shape: ONE corpus scan fans out to (B+1) x d first-moment cells
    (the b grid explodes per (row, dim) — partial aggregation collapses it
    map-side); no second scan, no permutation shuffle of the data itself
    (only the pure-function group labels change per replicate)."""
    e = table(spark, sf_dir, "embeddings")
    qarr = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * MMD_SCALE).cast("bigint"),
    )
    base = e.select(
        "vec_id",
        F.when(F.col("label") == 0, 0).otherwise(1).alias("g_obs"),
        F.posexplode(qarr).alias("j", "q"),
    )
    bgrid = F.explode(
        F.array(*[F.lit(b) for b in range(-1, MMD_PERM_B)])
    ).alias("b")
    splits = base.select("vec_id", "g_obs", "j", "q", bgrid).select(
        "b",
        "j",
        "q",
        F.when(F.col("b") == -1, F.col("g_obs"))
        .otherwise(
            F.when(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("mmdperm:"),
                            F.col("b").cast("string"),
                            F.lit(":"),
                            F.col("vec_id").cast("string"),
                        )
                    ),
                    1,
                    1,
                ).isin(*"01234567"),
                0,
            ).otherwise(1)
        )
        .alias("g"),
    )
    s = splits.groupBy("b", "j").agg(
        F.sum(F.when(F.col("g") == 0, F.col("q")).otherwise(0))
        .cast("bigint")
        .alias("s0"),
        F.sum(F.when(F.col("g") == 1, F.col("q")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        F.sum((F.col("g") == 0).cast("int")).cast("bigint").alias("c0"),
        F.sum((F.col("g") == 1).cast("int")).cast("bigint").alias("c1"),
    )
    DEC0 = "decimal(38,0)"
    d = F.col("s0") * F.col("c1") - F.col("s1") * F.col("c0")
    mmd = s.groupBy("b").agg(
        (
            F.sum(d.cast(DEC0) * d).cast("double")
            / (
                (F.max("c0").cast("double") * F.max("c1") * F.lit(float(MMD_SCALE)))
                * (F.max("c0").cast("double") * F.max("c1") * F.lit(float(MMD_SCALE)))
            )
        ).alias("m2")
    ).persist()
    obs = F.broadcast(
        mmd.filter(F.col("b") == -1).select(F.col("m2").alias("obs"))
    )
    nulls = mmd.filter(F.col("b") >= 0).crossJoin(obs)
    return (
        nulls.agg(
            F.max("obs").alias("mmd2_observed"),
            F.sum((F.col("m2") >= F.col("obs")).cast("int"))
            .cast("bigint")
            .alias("n_null_ge"),
        )
        .select(
            "mmd2_observed",
            F.lit(MMD_PERM_B).cast("bigint").alias("n_permutations"),
            "n_null_ge",
            (F.lit(1) + F.col("n_null_ge")).cast("bigint").alias("p_num"),
            F.lit(MMD_PERM_B + 1).cast("bigint").alias("p_den"),
        )
        .select(
            "mmd2_observed", "n_permutations", "n_null_ge", "p_num", "p_den"
        )
    )
