"""Ranked retrieval over the documents corpus (driver mandate; beyond the
reference's surface — /root/reference/src/QuackIO.jl is pure I/O, no text
search): BM25 scoring, positional phrase search, and a time-range windowed
activity profile. These are the query-side companions to the inverted-index
builders in operators/text.py.

Scale notes (100 TB):
- BM25 filters the token stream to the query's terms BEFORE any shuffle, so
  the grouped state is O(matching_docs x |query|), never O(corpus tokens).
  Document-frequency and corpus stats are broadcast (a handful of rows).
- Phrase search ships (doc_id, position) postings only for the phrase's two
  terms; the positional join is an equi-join on (doc_id, pos) — co-partitioned
  by the same shuffle, no range scan, no cartesian.
- Score determinism follows functions/exact.py: per-term double arithmetic is
  IEEE-identical across engines, contributions are rounded then summed as
  DECIMAL (associative, order-free), and only the final scalar returns to
  DOUBLE — so a 1000-executor run and the single-threaded oracle agree
  bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.fanout import fanout
from ..plans.registry import query, table

# BM25 constants (Robertson/Sparck-Jones defaults; Lucene's always-positive
# idf variant ln(1 + (N - df + .5)/(df + .5)) so rare-term scores never flip
# negative). Literals are written identically in the Spark plan and the
# oracle SQL: both engines parse the same decimal literal to the same double.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ["spark", "join", "query"]
BM25_TOPK = 10

PHRASE_W1 = "data"
PHRASE_W2 = "column"


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
    WITH dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(dl AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tok AS (
      SELECT d.doc_id, dl.dl, unnest(string_split(d.text, ' ')) AS term
      FROM documents d JOIN dl ON d.doc_id = dl.doc_id
    ),
    tf AS (
      SELECT doc_id, term, dl, COUNT(*) AS tf FROM tok
      WHERE term IN ({terms})
      GROUP BY doc_id, term, dl
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    contrib AS (
      SELECT tf.doc_id,
        round(
          ln(1.0 + ((stats.n - df.df + 0.5) / (df.df + 0.5)))
          * ((tf.tf * ({BM25_K1} + 1.0))
             / (tf.tf + {BM25_K1}
                * ((1.0 - {BM25_B}) + (({BM25_B} * tf.dl) / stats.avgdl)))),
          8) AS c
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN stats
    )
    SELECT doc_id,
      CAST(SUM(CAST(c AS DECIMAL(28,8))) AS DOUBLE) AS bm25
    FROM contrib GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOPK}
    """


@query("bm25_topk", oracle=_bm25_oracle())
def bm25_topk(spark, sf_dir):
    """BM25 ranked retrieval for a fixed conjunctive query.

    Plan shape: one scan; tokens filtered to the query's terms map-side
    (the explode emits only matching tokens, so the first shuffle carries
    O(matching docs x |query terms|) rows); per-(doc, term) tf via groupBy;
    document frequencies + corpus stats are tiny and broadcast; per-doc score
    is an exact decimal sum of rounded per-term contributions; final top-k is
    TakeOrderedAndProject (no global sort). The tokenize/filter pass
    fans out of the one-task single-row-group scan (functions/fanout.py;
    bm25_topk feeds six retrieval queries)."""
    k1, b = F.lit(BM25_K1), F.lit(BM25_B)
    d = fanout(
        table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    toks = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("dl"),
        F.explode(
            F.filter(F.split("text", " "), lambda t: t.isin(BM25_TERMS))
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term", "dl").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = d.select(F.size(F.split("text", " ")).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("dl").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + ((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    )
    contrib = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                idf
                * (
                    (F.col("tf") * (k1 + 1.0))
                    / (
                        F.col("tf")
                        + k1
                        * (
                            (F.lit(1.0) - b)
                            + ((b * F.col("dl")) / F.col("avgdl"))
                        )
                    )
                ),
                8,
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.sum(F.col("c").cast("decimal(28,8)")).cast("double").alias("bm25")
    )
    return scored.orderBy(F.desc("bm25"), "doc_id").limit(BM25_TOPK)


@query(
    "phrase_search_positional",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    hits AS (
      -- lambda-free adjacency scan (UNNEST(range)+WHERE): correlated
      -- list_filter lambdas are the construct class behind the r5/r6
      -- driver-env CDC divergence (oracle_lint R4 bans them).
      SELECT doc_id
      FROM t, UNNEST(range(1, len(toks))) AS u(i)
      WHERE toks[i] = '{PHRASE_W1}' AND toks[i+1] = '{PHRASE_W2}'
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
    FROM hits GROUP BY doc_id
    """,
)
def phrase_search_positional(spark, sf_dir):
    """Exact phrase search via positional postings.

    Builds (doc_id, pos) postings for exactly the phrase's two terms
    (posexplode filtered map-side), then matches adjacency with an equi-join
    on (doc_id, pos): the first term's postings are shifted by +1 so both
    sides shuffle once on the same composite key — the distributed version of
    a positional inverted-index phrase intersection (Manning IR ch.2), with
    no per-doc array materialization on the reduce side.

    The oracle evaluates the same adjacency predicate per document as an
    UNNEST position scan — same semantics, engine-local, lambda-free."""
    d = table(spark, sf_dir, "documents")
    posting = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    first = posting.filter(F.col("tok") == PHRASE_W1).select(
        "doc_id", (F.col("pos") + 1).alias("pos")
    )
    second = posting.filter(F.col("tok") == PHRASE_W2).select("doc_id", "pos")
    return (
        first.join(second, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


@query(
    "events_time_range_stats",
    oracle="""
    SELECT event_id,
      COUNT(*) OVER w AS n_1h,
      CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DECIMAL(28,6))
        AS sum_value_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def events_time_range_stats(spark, sf_dir):
    """Per-event trailing-1-hour activity profile: a RANGE (time-interval)
    window frame, not a ROWS frame — the frame holds every same-user event
    whose timestamp is within the preceding hour, regardless of row count.

    Spark expresses time-RANGE frames as rangeBetween over epoch
    microseconds (exact integers, so the frame boundaries match DuckDB's
    INTERVAL arithmetic exactly); the sum is decimal-exact so frame
    accumulation order is irrelevant (functions/exact.py recipe). One
    shuffle on user_id; the frame is evaluated with a sliding two-pointer
    over each sorted partition — O(n) per partition, no per-row rescans."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    hour_us = 3_600 * 1_000_000
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-hour_us, 0)
    )
    return e.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(28,6)"))
        .over(w)
        .cast("decimal(28,6)")
        .alias("sum_value_1h"),
    )


# ---------------------------------------- Dirichlet query-likelihood LM

QL_MU = 500.0
QL_TERMS = ["spark", "join", "query"]
QL_TOPK = 10


def _ql_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in QL_TERMS)
    nq = len(QL_TERMS)
    return f"""
    WITH dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok
      WHERE term IN ({terms}) GROUP BY doc_id, term
    ),
    cf AS (SELECT term, SUM(tf) AS cf FROM tf GROUP BY term),
    tot AS (SELECT SUM(dl) AS total_tokens FROM dl),
    matched AS (
      SELECT tf.doc_id,
        CAST(SUM(CAST(round(
            ln(1.0 + tf / ({QL_MU} * (cf / CAST(total_tokens AS DOUBLE)))), 10)
          AS DECIMAL(28,10))) AS DOUBLE) AS match_part,
        CAST(COUNT(*) AS BIGINT) AS matched_terms
      FROM tf JOIN cf USING (term) CROSS JOIN tot
      GROUP BY tf.doc_id
    )
    SELECT m.doc_id,
      m.match_part + {nq} * round(ln({QL_MU} / (dl.dl + {QL_MU})), 10)
        AS ql_score,
      m.matched_terms
    FROM matched m JOIN dl USING (doc_id)
    ORDER BY ql_score DESC, m.doc_id
    LIMIT {QL_TOPK}
    """


@query("retrieval_query_likelihood", oracle=_ql_oracle())
def retrieval_query_likelihood(spark, sf_dir):
    """Dirichlet-smoothed query-likelihood ranking (Zhai/Lafferty) — the
    standard LM-retrieval companion to bm25_topk: score(d) = sum_t ln(1 +
    tf/(mu*p(t|C))) + |Q| ln(mu/(|d|+mu)), restricted to documents
    matching at least one query term. Same scale shape as BM25: the token
    stream is filtered to the query's terms BEFORE the only per-doc
    shuffle, corpus term frequencies and the total-token count are
    broadcast 1-to-k-row aggregates, and top-k compiles to
    TakeOrderedAndProject. Determinism: per-term contributions and the
    doc-length normalizer are rounded to 10 decimals then decimal-summed
    (functions/exact.py recipe)."""
    nq = len(QL_TERMS)
    d = table(spark, sf_dir, "documents")
    dl = d.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    tf = (
        d.select(
            "doc_id",
            F.explode(
                F.filter(F.split("text", " "), lambda t: t.isin(QL_TERMS))
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    tot = dl.agg(F.sum("dl").alias("total_tokens"))
    pc = F.col("cf") / F.col("total_tokens").cast("double")
    contrib = F.round(
        F.log(1.0 + F.col("tf") / (QL_MU * pc)), 10
    ).cast("decimal(28,10)")
    matched = (
        tf.join(F.broadcast(cf), "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum(contrib).cast("double").alias("match_part"),
            F.count(F.lit(1)).cast("bigint").alias("matched_terms"),
        )
    )
    norm = F.lit(nq) * F.round(F.log(QL_MU / (F.col("dl") + QL_MU)), 10)
    return (
        matched.join(dl, "doc_id")
        .select(
            "doc_id",
            (F.col("match_part") + norm).alias("ql_score"),
            "matched_terms",
        )
        .orderBy(F.col("ql_score").desc(), "doc_id")
        .limit(QL_TOPK)
    )


# ------------------------------------------- reciprocal-rank fusion

RRF_K = 60
RRF_TOPK = 10


def _rrf_oracle() -> str:
    return f"""
    WITH bm AS ({_bm25_oracle()}),
    ql AS ({_ql_oracle()}),
    br AS (
      SELECT doc_id,
        ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
      FROM bm
    ),
    qr AS (
      SELECT doc_id,
        ROW_NUMBER() OVER (ORDER BY ql_score DESC, doc_id) AS r
      FROM ql
    )
    SELECT COALESCE(br.doc_id, qr.doc_id) AS doc_id,
      round(COALESCE(1.0 / ({RRF_K} + br.r), 0)
            + COALESCE(1.0 / ({RRF_K} + qr.r), 0), 10) AS rrf_score,
      CAST(br.r AS BIGINT) AS bm25_rank,
      CAST(qr.r AS BIGINT) AS ql_rank
    FROM br FULL JOIN qr ON br.doc_id = qr.doc_id
    ORDER BY rrf_score DESC, doc_id
    LIMIT {RRF_TOPK}
    """


@query("retrieval_rrf_fusion", oracle=_rrf_oracle())
def retrieval_rrf_fusion(spark, sf_dir):
    """Reciprocal Rank Fusion of the BM25 and query-likelihood rankers:
    score(d) = sum over rankers of 1/({RRF_K} + rank_d) — the standard
    zero-tuning hybrid-retrieval combiner (robust because it consumes
    RANKS, not incomparable scores). Both input rankings are top-k
    results (k={BM25_TOPK}) — the rank windows and the full-outer merge
    run on 2k rows, so this composes for free on top of any number of
    retrieval legs; at scale the legs themselves remain the only real
    work. Docs missing from a leg contribute 0 from it."""
    from pyspark.sql import Window as W

    bm = bm25_topk(spark, sf_dir)
    ql = retrieval_query_likelihood(spark, sf_dir)
    br = bm.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("bm25"), "doc_id"))
        .alias("r_bm"),
    )
    qr = ql.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("ql_score"), "doc_id"))
        .alias("r_ql"),
    )
    fused = br.join(qr, "doc_id", "full_outer").select(
        "doc_id",
        F.round(
            F.coalesce(1.0 / (RRF_K + F.col("r_bm")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("r_ql")), F.lit(0.0)),
            10,
        ).alias("rrf_score"),
        F.col("r_bm").cast("bigint").alias("bm25_rank"),
        F.col("r_ql").cast("bigint").alias("ql_rank"),
    )
    return fused.orderBy(F.desc("rrf_score"), "doc_id").limit(RRF_TOPK)


# ----------------------------------------------------- nDCG evaluation


def _ndcg_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in QL_TERMS)
    rel = f"""
    rel AS (
      SELECT doc_id, COUNT(*) AS rel
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      WHERE term IN ({terms}) GROUP BY doc_id
    ),
    ideal AS (
      SELECT CAST(SUM(CAST(round(rel / log2(rnk + 1), 10)
                     AS DECIMAL(28,10))) AS DOUBLE) AS idcg
      FROM (SELECT rel,
              ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rnk
            FROM rel)
      WHERE rnk <= {BM25_TOPK}
    )"""
    leg = """
    SELECT '{name}' AS ranker,
      CAST(SUM(CAST(round(COALESCE(rel.rel, 0) / log2(r.rnk + 1), 10)
                    AS DECIMAL(28,10))) AS DOUBLE) AS dcg,
      MAX(idcg) AS idcg,
      CAST(SUM(CAST(round(COALESCE(rel.rel, 0) / log2(r.rnk + 1), 10)
                    AS DECIMAL(28,10))) AS DOUBLE) / MAX(idcg) AS ndcg
    FROM (SELECT doc_id,
            ROW_NUMBER() OVER (ORDER BY {score} DESC, doc_id) AS rnk
          FROM {src}) r
    LEFT JOIN rel USING (doc_id) CROSS JOIN ideal"""
    return f"""
    WITH bm AS ({_bm25_oracle()}),
    ql AS ({_ql_oracle()}),
    {rel}
    {leg.format(name='bm25', score='bm25', src='bm')}
    UNION ALL
    {leg.format(name='query_likelihood', score='ql_score', src='ql')}
    """


@query("retrieval_ndcg_at_k", oracle=_ndcg_oracle())
def retrieval_ndcg_at_k(spark, sf_dir):
    """nDCG@k for the BM25 and query-likelihood rankers against a
    term-frequency pseudo-relevance (rel(d) = total query-term
    occurrences) — the ranking-quality harness pattern: swap in human
    labels and the plan is production eval. DCG discounts each ranked
    doc by log2(rank+1); the ideal ordering (rel desc) normalizes. Both
    rankings are k rows, relevance joins by doc key, and contributions
    round-then-decimal-sum, so the two nDCG numbers are bit-stable and
    directly comparable."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    rel = (
        d.select(
            "doc_id",
            F.explode(
                F.filter(F.split("text", " "), lambda t: t.isin(QL_TERMS))
            ).alias("term"),
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("rel"))
    )
    ideal_contrib = F.round(
        F.col("rel") / F.log2(F.col("rnk") + 1), 10
    ).cast("decimal(28,10)")
    ideal = F.broadcast(
        rel.select(
            "rel",
            F.row_number()
            .over(W.orderBy(F.desc("rel"), "doc_id"))
            .alias("rnk"),
        )
        .filter(F.col("rnk") <= BM25_TOPK)
        .agg(F.sum(ideal_contrib).cast("double").alias("idcg"))
    )

    def leg(name, src, score):
        r = src.select(
            "doc_id",
            F.row_number().over(W.orderBy(F.desc(score), "doc_id")).alias("rnk"),
        )
        contrib = F.round(
            F.coalesce("rel", F.lit(0)) / F.log2(F.col("rnk") + 1), 10
        ).cast("decimal(28,10)")
        return (
            r.join(rel, "doc_id", "left")
            .crossJoin(ideal)
            .agg(
                F.sum(contrib).cast("double").alias("dcg"),
                F.max("idcg").alias("idcg"),
                (F.sum(contrib).cast("double") / F.max("idcg")).alias("ndcg"),
            )
            .select(F.lit(name).alias("ranker"), "dcg", "idcg", "ndcg")
        )

    return leg("bm25", bm25_topk(spark, sf_dir), "bm25").unionAll(
        leg(
            "query_likelihood",
            retrieval_query_likelihood(spark, sf_dir),
            "ql_score",
        )
    )


# --------------------------------------------- ranker agreement


@query(
    "retrieval_ranker_agreement",
    oracle=f"""
    WITH bm AS (
      SELECT doc_id,
        ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r1
      FROM ({_bm25_oracle()})
    ),
    ql AS (
      SELECT doc_id,
        ROW_NUMBER() OVER (ORDER BY ql_score DESC, doc_id) AS r2
      FROM ({_ql_oracle()})
    ),
    j AS (SELECT bm.doc_id, r1, r2 FROM bm JOIN ql USING (doc_id)),
    s AS (
      SELECT COUNT(*)::BIGINT AS m,
        SUM((r1 - r2) * (r1 - r2)) AS sd2
      FROM j
    )
    SELECT {BM25_TOPK} AS k, m AS n_overlap,
      round(m / ({2 * BM25_TOPK}.0 - m), 8) AS jaccard_at_k,
      CASE WHEN m >= 2
        THEN round(1.0 - 6.0 * sd2 / (m * (CAST(m AS DOUBLE) * m - 1.0)), 8)
      END AS spearman_on_overlap
    FROM s
    """,
)
def retrieval_ranker_agreement(spark, sf_dir):
    """Agreement report between the BM25 and query-likelihood rankers
    over their top-{BM25_TOPK} lists: overlap count, Jaccard@k, and
    Spearman rho on the shared documents' ranks — the diagnostic that
    says whether retrieval_rrf_fusion is blending two genuinely
    different opinions (low agreement -> fusion adds recall) or
    re-ranking one opinion twice (high agreement -> fusion is noise).

    Both rankings are k-row tables (TakeOrderedAndProject each); the
    join, rank differences and rho are arithmetic on <= k exact
    integers. Ranks are re-derived with an explicit (score desc,
    doc_id) window so tie order is pinned in both engines."""
    from pyspark.sql import Window as W

    bm = bm25_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("bm25"), "doc_id"))
        .alias("r1"),
    )
    ql = retrieval_query_likelihood(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("ql_score"), "doc_id"))
        .alias("r2"),
    )
    j = bm.join(ql, "doc_id")
    s = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(
            (F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2"))
        ).alias("sd2"),
    )
    md = F.col("m").cast("double")
    return s.select(
        F.lit(BM25_TOPK).alias("k"),
        F.col("m").alias("n_overlap"),
        F.round(F.col("m") / (2.0 * BM25_TOPK - F.col("m")), 8).alias(
            "jaccard_at_k"
        ),
        F.when(
            F.col("m") >= 2,
            F.round(
                1.0 - 6.0 * F.col("sd2") / (F.col("m") * (md * md - 1.0)),
                8,
            ),
        ).alias("spearman_on_overlap"),
    )


# --------------------------------- rank-biased overlap (RBO) agreement

RBO_P = 0.9


@query(
    "retrieval_rbo_agreement",
    oracle=f"""
    WITH bm AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r1
      FROM ({_bm25_oracle()})
    ),
    ql AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY ql_score DESC, doc_id) AS r2
      FROM ({_ql_oracle()})
    ),
    j AS (
      SELECT bm.doc_id, GREATEST(r1, r2) AS m
      FROM bm JOIN ql USING (doc_id)
    ),
    depths AS (SELECT unnest(range(1, {BM25_TOPK} + 1)) AS d),
    xd AS (
      SELECT d, CAST((SELECT COUNT(*) FROM j WHERE j.m <= depths.d) AS BIGINT)
        AS x
      FROM depths
    ),
    terms AS (
      SELECT d, x,
        (1 - {RBO_P!r}) * pow({RBO_P!r}, d - 1) * x / d AS term
      FROM xd
    )
    SELECT CAST({BM25_TOPK} AS BIGINT) AS k,
      CAST({RBO_P!r} AS DOUBLE) AS p,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM j) AS n_overlap,
      round(CAST(SUM(CAST(round(term, 12) AS DECIMAL(28,15))) AS DOUBLE), 8)
        AS rbo_trunc
    FROM terms
    """,
)
def retrieval_rbo_agreement(spark, sf_dir):
    """Rank-biased overlap (Webber et al. 2010, truncated at depth k,
    p = {RBO_P}) between the BM25 and query-likelihood top-k lists:
    RBO = (1-p) * sum_d p^(d-1) * |A_d n B_d| / d — the TOP-WEIGHTED
    agreement measure the flat Jaccard/Spearman report
    (retrieval_ranker_agreement) cannot express: disagreement at rank 1
    costs more than disagreement at rank 10, which is how users
    experience rankings.

    Both rankings are k-row tables; per-depth overlap counts come from
    each shared doc's max rank against a k-row depth grid, and the
    weighted sum is k decimal-rounded terms — everything after the
    two rankers is arithmetic on <= k rows."""
    from pyspark.sql import Window as W

    bm = bm25_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number().over(W.orderBy(F.desc("bm25"), "doc_id")).alias("r1"),
    )
    ql = retrieval_query_likelihood(spark, sf_dir).select(
        "doc_id",
        F.row_number().over(W.orderBy(F.desc("ql_score"), "doc_id")).alias("r2"),
    )
    j = bm.join(ql, "doc_id").select(
        F.greatest("r1", "r2").alias("m")
    ).persist()
    depths = spark.range(1, BM25_TOPK + 1).select(F.col("id").alias("d"))
    xd = (
        depths.crossJoin(j)
        .groupBy("d")
        .agg(F.sum((F.col("m") <= F.col("d")).cast("int")).cast("bigint").alias("x"))
    )
    term = (
        (1 - RBO_P)
        * F.pow(F.lit(RBO_P), F.col("d") - 1)
        * F.col("x")
        / F.col("d")
    )
    n_overlap = F.broadcast(j.agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap")))
    return (
        xd.select(term.alias("term"))
        .agg(
            F.round(
                F.sum(F.round(F.col("term"), 12).cast("decimal(28,15)")).cast(
                    "double"
                ),
                8,
            ).alias("rbo_trunc")
        )
        .crossJoin(n_overlap)
        .select(
            F.lit(BM25_TOPK).cast("bigint").alias("k"),
            F.lit(RBO_P).cast("double").alias("p"),
            "n_overlap",
            "rbo_trunc",
        )
    )


# --------------------------------- pseudo-relevance feedback expansion

PRF_TOPK = 10
PRF_MIN_LEN = 4


@query(
    "retrieval_prf_expansion_terms",
    oracle=f"""
    WITH fb AS (SELECT doc_id FROM ({_bm25_oracle()})),
    fbterms AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        SELECT unnest(string_split(d.text, ' ')) AS term
        FROM documents d JOIN fb ON d.doc_id = fb.doc_id
      )
      WHERE len(term) >= {PRF_MIN_LEN}
        AND term NOT IN ({", ".join(f"'{t}'" for t in BM25_TERMS)})
      GROUP BY term
    ),
    df AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      ) GROUP BY term
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
    SELECT fbterms.term, fbterms.tf, df.df,
      round(fbterms.tf * ln(CAST(nn.n AS DOUBLE) / df.df), 8) AS prf_score
    FROM fbterms JOIN df ON fbterms.term = df.term CROSS JOIN nn
    ORDER BY prf_score DESC, fbterms.term
    LIMIT {PRF_TOPK}
    """,
)
def retrieval_prf_expansion_terms(spark, sf_dir):
    """Pseudo-relevance-feedback query expansion (Rocchio-style term
    selection): take the BM25 top-{PRF_TOPK} documents as assumed-
    relevant feedback, score every non-query term by
    feedback-tf x ln(N/df) (concentrated in the feedback set AND rare in
    the corpus), and emit the top-{PRF_TOPK} expansion terms — the
    second-round query a PRF retriever would run. Completes the IR
    pipeline: rank (bm25), fuse (rrf), evaluate (ndcg, rbo), EXPAND.

    Scale shape: the feedback side is a k-document broadcast semi-join;
    document frequencies reuse the corpus-wide term rollup (vocabulary-
    sized, partial-aggregated); final scoring joins two term tables and
    TakeOrderedAndProject keeps the top-k without a global sort."""
    fb = F.broadcast(bm25_topk(spark, sf_dir).select("doc_id"))
    d = fanout(
        table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    fbterms = (
        d.join(fb, "doc_id")
        .select(F.explode(F.split("text", " ")).alias("term"))
        .filter(
            (F.length("term") >= PRF_MIN_LEN) & (~F.col("term").isin(*BM25_TERMS))
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count_distinct("doc_id").cast("bigint").alias("df"))
    )
    nn = F.broadcast(d.agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    return (
        fbterms.join(df, "term")
        .crossJoin(nn)
        .select(
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 8
            ).alias("prf_score"),
        )
        .orderBy(F.col("prf_score").desc(), "term")
        .limit(PRF_TOPK)
    )


# --------------------------------- query clarity (performance prediction)


@query(
    "retrieval_clarity_score",
    oracle=f"""
    WITH fb AS (SELECT doc_id FROM ({_bm25_oracle()})),
    fbterms AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        SELECT unnest(string_split(d.text, ' ')) AS term
        FROM documents d JOIN fb ON d.doc_id = fb.doc_id
      ) GROUP BY term
    ),
    ctf AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS ctf FROM (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
      ) GROUP BY term
    ),
    tot AS (
      SELECT (SELECT CAST(sum(tf) AS DOUBLE) FROM fbterms) AS t_fb,
             (SELECT CAST(sum(ctf) AS DOUBLE) FROM ctf) AS t_c
    ),
    contrib AS (
      SELECT fbterms.term,
        round((fbterms.tf / tot.t_fb)
              * round(ln((fbterms.tf / tot.t_fb) / (ctf.ctf / tot.t_c)), 8),
              12) AS c
      FROM fbterms JOIN ctf ON fbterms.term = ctf.term CROSS JOIN tot
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM fb) AS n_feedback_docs,
      (SELECT CAST(sum(tf) AS BIGINT) FROM fbterms) AS n_fb_tokens,
      CAST(count(*) AS BIGINT) AS n_terms,
      round(CAST(sum(CAST(c AS DECIMAL(28,15))) AS DOUBLE), 6)
        AS clarity_score
    FROM contrib
    """,
)
def retrieval_clarity_score(spark, sf_dir):
    """Query clarity score (Cronen-Townsend et al. 2002) — the classic
    query-performance predictor: KL divergence (nats) between the language
    model of the BM25 feedback set and the corpus language model,
    sum_t P(t|fb) * ln(P(t|fb) / P(t|corpus)). High clarity = the result
    set speaks a focused sub-language (an easy query); clarity near 0 =
    results look like random corpus text (expect poor retrieval). Closes
    the IR loop: rank -> fuse -> evaluate -> expand -> PREDICT.

    Scale shape: the feedback side is a k-document broadcast semi-join;
    the corpus term rollup is vocabulary-sized and partial-aggregated;
    totals ride as 1-row broadcasts. Per-term contributions round ln to
    8 dp and the product to 12 dp before an order-free decimal sum —
    the repo's cross-engine transcendental contract."""
    fb = F.broadcast(bm25_topk(spark, sf_dir).select("doc_id"))
    d = fanout(
        table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    fbterms = (
        d.join(fb, "doc_id")
        .select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    ctf = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ctf"))
    )
    t_fb = F.broadcast(fbterms.agg(F.sum("tf").cast("double").alias("t_fb")))
    t_c = F.broadcast(ctf.agg(F.sum("ctf").cast("double").alias("t_c")))
    n_fb_docs = F.broadcast(fb.groupBy().count().select(F.col("count").cast("bigint").alias("n_feedback_docs")))
    n_fb_tokens = F.broadcast(
        fbterms.agg(F.sum("tf").cast("bigint").alias("n_fb_tokens"))
    )
    p_fb = F.col("tf") / F.col("t_fb")
    p_c = F.col("ctf") / F.col("t_c")
    contrib = (
        fbterms.join(ctf, "term")
        .crossJoin(t_fb)
        .crossJoin(t_c)
        .select(F.round(p_fb * F.round(F.log(p_fb / p_c), 8), 12).alias("c"))
    )
    return (
        contrib.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.round(
                F.sum(F.col("c").cast("decimal(28,15)")).cast("double"), 6
            ).alias("clarity_score"),
        )
        .crossJoin(n_fb_docs)
        .crossJoin(n_fb_tokens)
        .select("n_feedback_docs", "n_fb_tokens", "n_terms", "clarity_score")
    )
