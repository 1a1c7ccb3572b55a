"""Model-based quality filtering (driver mandate; beyond the reference's
I/O-only surface — /root/reference/src/QuackIO.jl): a fixed-weight logistic
classifier over the document quality signals, the batch shape of the
"quality model" stage every LLM data pipeline runs (fastText/linear probes
in C4/CCNet/RefinedWeb pipelines).

The model here is deliberately a deterministic linear-logistic with frozen
weights so the DuckDB oracle can reproduce every score bit-for-bit; swapping
in a real trained model changes ONLY the scoring expression (a broadcast
weight vector + the same dot product), or — for a non-linear model — an
Arrow-batched ``mapInPandas`` like operators/multimodal.py. The Spark-side
plumbing (map-side feature extraction, no shuffle, scan-pruned columns) is
the production shape either way: at 100 TB this runs at parquet-scan speed,
embarrassingly parallel over row-groups.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..plans.registry import query, table

# Frozen classifier weights (intercept, ln(1+n_tokens), mean_token_len,
# vowel_ratio, digit_ratio). Chosen so the corpus splits non-trivially at
# the 0.5 keep-threshold. Written as decimal literals parsed identically by
# both engines.
W0 = -3.0
W_LOG_TOKENS = 0.9
W_MEAN_TOK_LEN = -0.15
W_VOWEL = 4.0
W_DIGIT = -6.0
KEEP_THRESHOLD = 0.5


# Shared oracle fragment: feats + scored CTEs (also consumed by
# curriculum_stages below).
_SCORED_SQL = f"""
    feats AS (
      SELECT doc_id, lang, source,
        ln(1.0 + len(string_split(text, ' '))) AS f_log_tokens,
        CAST(length(text) AS DOUBLE) / len(string_split(text, ' '))
          AS f_mean_tok_len,
        CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))
             AS DOUBLE) / length(text) AS f_vowel,
        CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
             AS DOUBLE) / length(text) AS f_digit
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, source,
        round(1.0 / (1.0 + exp(-(({W0})
          + ({W_LOG_TOKENS} * f_log_tokens)
          + ({W_MEAN_TOK_LEN} * f_mean_tok_len)
          + ({W_VOWEL} * f_vowel)
          + ({W_DIGIT} * f_digit)))), 8) AS quality_score
      FROM feats
    )
"""


@query(
    "quality_model_filter",
    oracle=f"""
    WITH {_SCORED_SQL}
    SELECT doc_id, lang, source, quality_score,
      CASE WHEN quality_score >= {KEEP_THRESHOLD} THEN TRUE ELSE FALSE END
        AS keep
    FROM scored
    """,
)
def quality_model_filter(spark, sf_dir):
    """Logistic quality classifier + keep/drop decision per document.

    Map-side only: features, the linear score, and the sigmoid are all
    built-in JVM expressions over the scanned row — zero shuffles, columns
    pruned to (doc_id, text, lang, source). The score is rounded to 8
    decimals before the threshold compare so the keep flag is
    engine-portable (same recipe as text_tfidf_top_terms)."""
    d = table(spark, sf_dir, "documents")
    score = quality_score_col()
    return d.select(
        "doc_id",
        "lang",
        "source",
        score.alias("quality_score"),
        (score >= F.lit(KEEP_THRESHOLD)).alias("keep"),
    )


def quality_score_col():
    """The rounded logistic quality score as a Column over a `text` field
    (shared by quality_model_filter and curriculum_stages — identical
    expression tree, identical oracle fragment)."""
    n_chars = F.length("text")
    n_tokens = F.size(F.split("text", " "))
    f_log_tokens = F.log(F.lit(1.0) + n_tokens)
    f_mean_tok_len = n_chars.cast("double") / n_tokens
    f_vowel = (
        n_chars - F.length(F.regexp_replace("text", "[aeiou]", ""))
    ).cast("double") / n_chars
    f_digit = (
        n_chars - F.length(F.regexp_replace("text", "[0-9]", ""))
    ).cast("double") / n_chars
    z = (
        F.lit(W0)
        + (F.lit(W_LOG_TOKENS) * f_log_tokens)
        + (F.lit(W_MEAN_TOK_LEN) * f_mean_tok_len)
        + (F.lit(W_VOWEL) * f_vowel)
        + (F.lit(W_DIGIT) * f_digit)
    )
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 8)


N_STAGES = 4


@query(
    "curriculum_stages",
    oracle=f"""
    WITH {_SCORED_SQL},
    b AS (
      SELECT quantile_cont(quality_score, 0.25) AS b1,
             quantile_cont(quality_score, 0.50) AS b2,
             quantile_cont(quality_score, 0.75) AS b3
      FROM scored
    )
    SELECT doc_id, quality_score,
      CAST(1 + CASE WHEN quality_score > b1 THEN 1 ELSE 0 END
             + CASE WHEN quality_score > b2 THEN 1 ELSE 0 END
             + CASE WHEN quality_score > b3 THEN 1 ELSE 0 END AS INTEGER)
        AS stage
    FROM scored CROSS JOIN b
    """,
)
def curriculum_stages(spark, sf_dir):
    """Curriculum ordering: documents bucketed into {N_STAGES} difficulty
    stages by quality-score quartile. Deliberately NOT a global NTILE —
    that is a single-partition window over one row per document, a
    scale-killer at corpus size. Instead the three quartile boundaries are
    computed with exact interpolated percentiles (cross-engine
    bit-identical, see percentiles_by_status), broadcast, and each row
    bins itself with three comparisons: one tiny aggregate + a map-side
    projection, no global sort, no single reducer. Ties at a boundary go
    to the lower stage in both engines (strict >)."""
    d = table(spark, sf_dir, "documents")
    scored = d.select("doc_id", quality_score_col().alias("quality_score"))
    b = scored.agg(
        F.percentile("quality_score", 0.25).alias("b1"),
        F.percentile("quality_score", 0.50).alias("b2"),
        F.percentile("quality_score", 0.75).alias("b3"),
    )
    s = F.col("quality_score")
    stage = (
        F.lit(1)
        + F.when(s > F.col("b1"), 1).otherwise(0)
        + F.when(s > F.col("b2"), 1).otherwise(0)
        + F.when(s > F.col("b3"), 1).otherwise(0)
    )
    return scored.crossJoin(F.broadcast(b)).select(
        "doc_id", "quality_score", stage.cast("int").alias("stage")
    )


@query(
    "weighted_sample_by_quality",
    oracle=f"""
    WITH {_SCORED_SQL},
    u AS (
      SELECT doc_id, quality_score,
        CAST(('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             AS DOUBLE) / 4294967296.0 AS unif
      FROM scored
    )
    SELECT doc_id, quality_score FROM u WHERE unif < quality_score
    """,
)
def weighted_sample_by_quality(spark, sf_dir):
    """Quality-weighted Bernoulli sampling (the DCLM/RefinedWeb resampling
    shape: keep probability proportional to the quality score, so good
    documents survive and bad ones thin out). The per-row coin is an
    md5-derived uniform in [0,1) keyed on ('wsamp:', doc_id) — a salted,
    engine-reproducible hash, NOT rand(): the sample is identical across
    runs, engines, partitionings and cluster sizes, and re-running the
    pipeline yields the same corpus (the property a training-data lineage
    audit needs). Map-side only; composes with any downstream filter."""
    d = table(spark, sf_dir, "documents")
    unif = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    score = quality_score_col()
    return d.select(
        "doc_id", score.alias("quality_score"), unif.alias("_u")
    ).filter(F.col("_u") < F.col("quality_score")).drop("_u")


CAP_PER_SOURCE = 15


@query(
    "source_cap_topk",
    oracle=f"""
    WITH {_SCORED_SQL},
    ranked AS (
      SELECT doc_id, source, quality_score,
        ROW_NUMBER() OVER (PARTITION BY source
                           ORDER BY quality_score DESC, doc_id) AS rnk
      FROM scored
    )
    SELECT doc_id, source, quality_score, CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= {CAP_PER_SOURCE}
    """,
)
def source_cap_topk(spark, sf_dir):
    """Per-source document cap — the domain-balancing stage every pretraining
    mix runs (no single crawl/domain may dominate the corpus): keep the top
    CAP_PER_SOURCE documents per source by quality score, deterministic
    tie-break on doc_id.

    Scale shape: one hash shuffle on source + a per-source ROW_NUMBER.
    Per-key top-k is rank-then-filter (the canonical Spark shape; AQE skew
    split handles a hot source). The quality expression is the shared
    frozen-logistic column — map-side, no extra pass."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.col("quality_score").desc(), "doc_id"
    )
    return (
        d.select("doc_id", "source", quality_score_col().alias("quality_score"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= CAP_PER_SOURCE)
    )


RANK_BUCKETS = 8


@query(
    "quality_rank_percentile",
    oracle=f"""
    WITH {_SCORED_SQL},
    r AS (
      SELECT doc_id, quality_score,
        CAST(ROW_NUMBER() OVER (ORDER BY quality_score, doc_id) - 1 AS BIGINT)
          AS rnk
      FROM scored
    ),
    nn AS (SELECT COUNT(*) AS n FROM scored)
    SELECT doc_id, quality_score, rnk,
      CAST(rnk AS DOUBLE) / (n - 1) AS pct
    FROM r, nn
    """,
)
def quality_rank_percentile(spark, sf_dir):
    """Global rank-percentile transform of the quality score (the
    rank-to-uniform normalization feeding calibration curves and
    percentile cutoffs) — WITHOUT a single-reducer global sort: the score
    lives in (0, 1), so floor(score * B) is an order-aligned bucket id and
    the shared numbering kernel (per-bucket counts -> broadcast cumulative
    offsets -> in-bucket sort) produces the exact global rank. Skewed
    score mass degrades one bucket's parallelism, never correctness."""
    from .pipeline import _number_in_bucket_order

    d = table(spark, sf_dir, "documents")
    scored = d.select("doc_id", quality_score_col().alias("quality_score"))
    parts = scored.withColumn(
        "_pid",
        F.least(
            F.lit(RANK_BUCKETS - 1),
            F.floor(F.col("quality_score") * RANK_BUCKETS).cast("int"),
        ),
    )
    ranked = _number_in_bucket_order(
        parts,
        ["quality_score", "doc_id"],
        ["doc_id", "quality_score"],
        "rnk",
    ).drop("shard")
    nn = F.broadcast(scored.agg(F.count(F.lit(1)).alias("n")))
    return ranked.crossJoin(nn).select(
        "doc_id",
        "quality_score",
        "rnk",
        (F.col("rnk").cast("double") / (F.col("n") - 1)).alias("pct"),
    )


# ----------------------------------------- weighted fixed-size sampling

RESERVOIR_K = 50


@query(
    "weighted_reservoir_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
        round(
          ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT + 1)
             / 65536.0) / n_chars, 8) AS k
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, w, k, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT doc_id, w, k,
        ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS rnk
      FROM keyed) t
    WHERE rnk <= {RESERVOIR_K}
    """,
)
def weighted_reservoir_sample(spark, sf_dir):
    """Fixed-size weighted sample (Efraimidis-Spirakis A-ES): each doc gets
    key u^(1/w) — equivalently ln(u)/w, ranked descending — with u a
    DETERMINISTIC md5-derived uniform, and the top-{RESERVOIR_K} keys are
    the sample. This is the exactly-k companion to the Bernoulli
    weighted_sample_by_quality: expected inclusion proportional to weight,
    sample size pinned, reproducible on any engine/partitioning. ln() is
    the one non-exact step, so keys are rounded to 8 decimals with doc_id
    tie-break before ranking (established ln() hygiene). The rank-limit
    rewrites to a top-k (TakeOrderedAndProject shape) — never a global
    sort of the corpus."""
    d = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint") + 1
    ) / F.lit(65536.0)
    keyed = d.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("w"),
        F.round(F.log(u) / F.col("n_chars"), 8).alias("k"),
    )
    from pyspark.sql import Window as W

    wr = W.orderBy(F.col("k").desc(), "doc_id")
    return keyed.select(
        "doc_id", "w", "k", F.row_number().over(wr).alias("rnk")
    ).filter(F.col("rnk") <= RESERVOIR_K)


@query(
    "quality_zscore_by_lang",
    oracle=f"""
    WITH {_SCORED_SQL},
    fx AS (
      SELECT doc_id, lang, quality_score,
        CAST(floor(quality_score * 1e9) AS BIGINT) AS f
      FROM scored
    ),
    st AS (
      SELECT lang,
        CAST(SUM(f) AS DOUBLE) / COUNT(*) / 1e9 AS mu,
        (CAST(SUM(CAST(f AS DECIMAL(38,0)) * f) AS DOUBLE) / 1e18
          - (CAST(SUM(f) AS DOUBLE) / 1e9) * (CAST(SUM(f) AS DOUBLE) / 1e9)
            / COUNT(*)) / COUNT(*) AS var
      FROM fx GROUP BY lang
    )
    SELECT doc_id, fx.lang, quality_score,
      round((quality_score - mu) / sqrt(var + 1e-9), 8) AS z
    FROM fx JOIN st ON st.lang = fx.lang
    """,
)
def quality_zscore_by_lang(spark, sf_dir):
    """Per-language z-normalization of the quality score — the grouped
    twin of embedding_whitening, and the right pre-step before applying
    ONE quality threshold across languages (raw score distributions
    differ per language; a global cutoff silently over-filters some).
    Same exactness recipe: int64 fixed-point mean, DECIMAL(38,0) sum of
    squares, group stats broadcast back map-side."""
    d = table(spark, sf_dir, "documents")
    score = quality_score_col()
    fx = d.select(
        "doc_id", "lang", score.alias("quality_score"),
        F.floor(score * F.lit(1e9)).alias("f"),
    )
    st = fx.groupBy("lang").agg(
        (F.sum("f").cast("double") / F.count(F.lit(1)) / F.lit(1e9)).alias("mu"),
        (
            (
                F.sum(F.col("f").cast("decimal(38,0)") * F.col("f")).cast("double")
                / F.lit(1e18)
                - (F.sum("f").cast("double") / F.lit(1e9))
                * (F.sum("f").cast("double") / F.lit(1e9))
                / F.count(F.lit(1))
            )
            / F.count(F.lit(1))
        ).alias("var"),
    )
    return fx.join(F.broadcast(st), "lang").select(
        "doc_id", "lang", "quality_score",
        F.round(
            (F.col("quality_score") - F.col("mu"))
            / F.sqrt(F.col("var") + F.lit(1e-9)), 8,
        ).alias("z"),
    )


# ----------------- cross-source quantile normalization


@query(
    "quality_quantile_normalize",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS score FROM documents
    ),
    pr AS (
      SELECT doc_id, source, score,
        percent_rank() OVER (PARTITION BY source ORDER BY score) AS pr
      FROM scored
    ),
    qs AS (SELECT quantile_cont(score, [0.00, 0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07, 0.08, 0.09, 0.10, 0.11, 0.12, 0.13, 0.14, 0.15, 0.16, 0.17, 0.18, 0.19, 0.20, 0.21, 0.22, 0.23, 0.24, 0.25, 0.26, 0.27, 0.28, 0.29, 0.30, 0.31, 0.32, 0.33, 0.34, 0.35, 0.36, 0.37, 0.38, 0.39, 0.40, 0.41, 0.42, 0.43, 0.44, 0.45, 0.46, 0.47, 0.48, 0.49, 0.50, 0.51, 0.52, 0.53, 0.54, 0.55, 0.56, 0.57, 0.58, 0.59, 0.60, 0.61, 0.62, 0.63, 0.64, 0.65, 0.66, 0.67, 0.68, 0.69, 0.70, 0.71, 0.72, 0.73, 0.74, 0.75, 0.76, 0.77, 0.78, 0.79, 0.80, 0.81, 0.82, 0.83, 0.84, 0.85, 0.86, 0.87, 0.88, 0.89, 0.90, 0.91, 0.92, 0.93, 0.94, 0.95, 0.96, 0.97, 0.98, 0.99, 1.00]) AS q FROM scored),
    grid AS (
      SELECT i AS bucket, q[i + 1] AS gq
      FROM qs, UNNEST(generate_series(0, 100)) AS u(i)
    )
    SELECT doc_id, source, score, round(pr, 8) AS pr,
      round(gq, 8) AS norm_score
    FROM pr JOIN grid ON CAST(round(pr * 100) AS INTEGER) = bucket
    """,
)
def quality_quantile_normalize(spark, sf_dir):
    """Quantile normalization of a per-document score across sources: each
    document's score is replaced by the GLOBAL score at its WITHIN-SOURCE
    percentile — after which every source has the same score
    distribution, so a single corpus-wide quality threshold cuts the same
    fraction from each source instead of silently favoring sources whose
    raw scores run high (the standard bias when one quality model scores
    heterogeneous corpora).

    Scale shape: the within-source percent_rank parallelizes across
    sources; the global quantile function is compressed to a 101-point
    grid computed in ONE percentile aggregate and broadcast — never a
    corpus-wide sort joined per row. Ties share a percent_rank peer
    group identically in both engines, so no tie-break column is needed
    (and none may be added — it would split peers)."""
    d = table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", F.col("n_chars").cast("double").alias("score")
    )
    from pyspark.sql import Window as W

    pr = scored.select(
        "doc_id",
        "source",
        "score",
        F.percent_rank()
        .over(W.partitionBy("source").orderBy("score"))
        .alias("pr"),
    )
    fracs = "array(" + ",".join(f"{i}/100D" for i in range(101)) + ")"
    grid = (
        scored.agg(F.expr(f"percentile(score, {fracs})").alias("gq"))
        .select(F.posexplode("gq").alias("bucket", "gq"))
    )
    return (
        pr.join(
            F.broadcast(grid),
            F.round(F.col("pr") * 100).cast("int") == F.col("bucket"),
        )
        .select(
            "doc_id",
            "source",
            "score",
            F.round("pr", 8).alias("pr"),
            F.round("gq", 8).alias("norm_score"),
        )
    )


# ------------------------------------------ inter-filter agreement


@query(
    "quality_filter_agreement_kappa",
    oracle="""
    WITH r AS (
      SELECT
        CASE WHEN n_chars BETWEEN 200 AND 20000 THEN 1 ELSE 0 END AS a,
        CASE WHEN len(string_split(text, ' ')) >= 30
              AND n_chars / CAST(len(string_split(text, ' ')) AS DOUBLE)
                  BETWEEN 3.0 AND 12.0
             THEN 1 ELSE 0 END AS b
      FROM documents
    ),
    c AS (
      SELECT COUNT(*)::BIGINT AS n,
        SUM(a * b)::BIGINT AS n11,
        SUM(a * (1 - b))::BIGINT AS n10,
        SUM((1 - a) * b)::BIGINT AS n01,
        SUM((1 - a) * (1 - b))::BIGINT AS n00
      FROM r
    )
    SELECT n AS n_docs, n11, n10, n01, n00,
      round(CAST(n11 + n00 AS DOUBLE) / n, 8) AS observed_agreement,
      round(((CAST(n11 + n00 AS DOUBLE) / n)
          - (CAST(n11 + n10 AS DOUBLE) / n * (n11 + n01) / n
             + CAST(n01 + n00 AS DOUBLE) / n * (n10 + n00) / n))
        / (1.0 - (CAST(n11 + n10 AS DOUBLE) / n * (n11 + n01) / n
             + CAST(n01 + n00 AS DOUBLE) / n * (n10 + n00) / n)), 8)
        AS cohens_kappa
    FROM c
    """,
)
def quality_filter_agreement_kappa(spark, sf_dir):
    """Cohen's kappa between two independent document-quality raters —
    a length-band rule (rater A) and a token-count + mean-token-length
    rule (rater B). Raw percent agreement flatters any pair of filters
    that both pass ~everything; kappa subtracts the agreement expected
    from their marginal pass rates, which is the honest way to decide
    whether a second filter adds signal or just re-labels the first.

    Pure map to two 0/1 flags, one count aggregate, closed-form kappa
    from five exact integers — a single corpus pass with no shuffle
    beyond the 1-row rollup."""
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    a = (
        (F.col("n_chars") >= 200) & (F.col("n_chars") <= 20000)
    ).cast("int")
    mean_len = F.col("n_chars") / n_tok.cast("double")
    b = (
        (n_tok >= 30) & (mean_len >= 3.0) & (mean_len <= 12.0)
    ).cast("int")
    r = d.select(a.alias("a"), b.alias("b"))
    c = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b")))
        .cast("bigint")
        .alias("n00"),
    )
    nd = F.col("n")
    po = (F.col("n11") + F.col("n00")).cast("double") / nd
    pe = (F.col("n11") + F.col("n10")).cast("double") / nd * (
        F.col("n11") + F.col("n01")
    ) / nd + (F.col("n01") + F.col("n00")).cast("double") / nd * (
        F.col("n10") + F.col("n00")
    ) / nd
    return c.select(
        F.col("n").alias("n_docs"),
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, 8).alias("observed_agreement"),
        F.round((po - pe) / (1.0 - pe), 8).alias("cohens_kappa"),
    )


# --------------------------------------------- WOE / Information Value

WOE_BAND_CHARS = 50
WOE_MAX_BAND = 10


@query(
    "quality_woe_iv_bands",
    oracle=f"""
    WITH b AS (
      SELECT LEAST(CAST(floor(n_chars / {WOE_BAND_CHARS}.0) AS BIGINT),
               {WOE_MAX_BAND}) AS band,
        SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS g,
        SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS bd
      FROM documents GROUP BY 1
    ),
    t AS (SELECT SUM(g)::BIGINT AS tg, SUM(bd)::BIGINT AS tb FROM b),
    w AS (
      SELECT band, g, bd,
        ln(((g + 0.5) / CAST(tg AS DOUBLE))
           / ((bd + 0.5) / CAST(tb AS DOUBLE))) AS woe,
        ((g + 0.5) / CAST(tg AS DOUBLE) - (bd + 0.5) / CAST(tb AS DOUBLE))
          * ln(((g + 0.5) / CAST(tg AS DOUBLE))
               / ((bd + 0.5) / CAST(tb AS DOUBLE))) AS ivc
      FROM b CROSS JOIN t
    ),
    iv AS (
      SELECT CAST(SUM(CAST(round(ivc, 10) AS DECIMAL(38,12))) AS DOUBLE)
        AS iv_total
      FROM w
    )
    SELECT band, g AS n_good, bd AS n_bad,
      round(woe, 8) AS woe,
      round(ivc, 8) AS iv_contrib,
      round(iv_total, 8) AS iv_total
    FROM w CROSS JOIN iv
    """,
)
def quality_woe_iv_bands(spark, sf_dir):
    """Weight-of-Evidence / Information-Value table for document length
    vs the is-English label — the credit-scoring-style banding report
    that says WHICH length bands carry the signal the AUC ops only
    summarize (|WOE| is the per-band log-odds lift; IV > 0.3 = strong
    predictor). Bands are fixed {WOE_BAND_CHARS}-char widths capped at
    band {WOE_MAX_BAND}; counts get the standard +0.5 Laplace smoothing
    so empty cells stay finite.

    One banded count aggregate, totals broadcast back, per-band WOE in
    closed form from exact integers, and the IV rollup is a
    round-then-decimal sum over the bounded band table."""
    d = table(spark, sf_dir, "documents")
    band = F.least(
        F.floor(F.col("n_chars") / float(WOE_BAND_CHARS)).cast("bigint"),
        F.lit(WOE_MAX_BAND).cast("bigint"),
    )
    b = d.groupBy(band.alias("band")).agg(
        F.sum((F.col("lang") == "en").cast("int")).cast("bigint").alias("g"),
        F.sum((F.col("lang") != "en").cast("int")).cast("bigint").alias("bd"),
    )
    t = F.broadcast(
        b.agg(
            F.sum("g").cast("bigint").alias("tg"),
            F.sum("bd").cast("bigint").alias("tb"),
        )
    )
    pg = (F.col("g") + 0.5) / F.col("tg").cast("double")
    pb = (F.col("bd") + 0.5) / F.col("tb").cast("double")
    woe = F.log(pg / pb)
    ivc = (pg - pb) * woe
    w = b.crossJoin(t).select(
        "band", "g", "bd", woe.alias("woe"), ivc.alias("ivc")
    )
    iv = F.broadcast(
        w.agg(
            F.sum(F.round("ivc", 10).cast("decimal(38,12)"))
            .cast("double")
            .alias("iv_total")
        )
    )
    return w.crossJoin(iv).select(
        "band",
        F.col("g").alias("n_good"),
        F.col("bd").alias("n_bad"),
        F.round("woe", 8).alias("woe"),
        F.round("ivc", 8).alias("iv_contrib"),
        F.round("iv_total", 8).alias("iv_total"),
    )


# --------------------------------------------- gains / lift table


@query(
    "quality_gains_lift_table",
    oracle="""
    WITH pv AS (
      SELECT n_chars AS s, COUNT(*)::BIGINT AS n,
        SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS p
      FROM documents GROUP BY 1
    ),
    t AS (SELECT SUM(n)::BIGINT AS tn, SUM(p)::BIGINT AS tp FROM pv),
    cum AS (
      SELECT s, n, p,
        SUM(n) OVER (ORDER BY s
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca
      FROM pv
    ),
    dec AS (
      SELECT CAST(ceil(10.0 * (tn - ca + n) / tn) AS BIGINT) AS decile,
        n, p
      FROM cum CROSS JOIN t
    ),
    byd AS (
      SELECT decile, SUM(n)::BIGINT AS n_rows, SUM(p)::BIGINT AS n_pos
      FROM dec GROUP BY decile
    ),
    g AS (
      SELECT decile, n_rows, n_pos,
        SUM(n_pos) OVER (ORDER BY decile
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
        SUM(n_rows) OVER (ORDER BY decile
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rows
      FROM byd
    )
    SELECT decile, n_rows, n_pos,
      round(CAST(cum_pos AS DOUBLE) / tp, 8) AS cum_capture,
      round((CAST(n_pos AS DOUBLE) / n_rows)
        / (CAST(tp AS DOUBLE) / tn), 8) AS lift,
      round((CAST(cum_pos AS DOUBLE) / cum_rows)
        / (CAST(tp AS DOUBLE) / tn), 8) AS cum_lift
    FROM g CROSS JOIN t
    """,
)
def quality_gains_lift_table(spark, sf_dir):
    """Cumulative gains / lift table by score decile (score = document
    length, target = is-English, matching the AUC/PR/WOE family): per
    decile of the score ranking, the positive capture rate and the
    lift over random — the targeting report that turns a classifier
    evaluation into "screen the top 3 deciles and you keep X% of the
    positives".

    Decile boundaries come from DESCENDING cumulative counts over the
    distinct-score table (desc_cum = N - asc_cum + n, so the ascending
    bucketed prefix-sum kernel serves unchanged); whole tied-score
    groups land in one decile, keeping the assignment deterministic in
    both engines. The decile rollup and its 10-row cumulative window
    are bounded."""
    from ..functions.prefix import bucketed_prefix_sums

    d = table(spark, sf_dir, "documents")
    pv = d.groupBy(F.col("n_chars").alias("s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("lang") == "en").cast("int")).cast("bigint").alias("p"),
    )
    t = F.broadcast(
        pv.agg(
            F.sum("n").cast("bigint").alias("tn"),
            F.sum("p").cast("bigint").alias("tp"),
        )
    )
    cum = bucketed_prefix_sums(pv, "s", ["n"]).crossJoin(t)
    dec = cum.select(
        F.ceil(
            10.0
            * (F.col("tn") - F.col("cum_n") + F.col("n"))
            / F.col("tn")
        )
        .cast("bigint")
        .alias("decile"),
        "n",
        "p",
    )
    byd = dec.groupBy("decile").agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.sum("p").cast("bigint").alias("n_pos"),
    )
    w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    g = byd.select(
        "decile",
        "n_rows",
        "n_pos",
        F.sum("n_pos").over(w).alias("cum_pos"),
        F.sum("n_rows").over(w).alias("cum_rows"),
    )
    base = F.col("tp").cast("double") / F.col("tn")
    return g.crossJoin(t).select(
        "decile",
        "n_rows",
        "n_pos",
        F.round(F.col("cum_pos").cast("double") / F.col("tp"), 8).alias(
            "cum_capture"
        ),
        F.round(
            (F.col("n_pos").cast("double") / F.col("n_rows")) / base, 8
        ).alias("lift"),
        F.round(
            (F.col("cum_pos").cast("double") / F.col("cum_rows")) / base, 8
        ).alias("cum_lift"),
    )


# --------------------------------------------- F1-optimal threshold


@query(
    "quality_optimal_f1_threshold",
    oracle="""
    WITH pv AS (
      SELECT n_chars AS s,
        SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS p,
        SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS q
      FROM documents GROUP BY n_chars
    ),
    t AS (SELECT SUM(p)::BIGINT AS np, SUM(q)::BIGINT AS nq FROM pv),
    c AS (
      SELECT s, p, q,
        SUM(p) OVER (ORDER BY s) AS cum_p,
        SUM(q) OVER (ORDER BY s) AS cum_q
      FROM pv
    ),
    f AS (
      SELECT s AS thr,
        (np - cum_p + p) AS tp, (nq - cum_q + q) AS fp, np,
        2.0 * (np - cum_p + p)
          / (2.0 * (np - cum_p + p) + (nq - cum_q + q)
             + (cum_p - p)) AS f1
      FROM c CROSS JOIN t
    ),
    mx AS (SELECT MAX(round(f1, 10)) AS mf FROM f),
    pick AS (
      SELECT MIN(thr) AS best_thr FROM f JOIN mx ON round(f1, 10) = mf
    )
    SELECT f.thr AS threshold, CAST(tp AS BIGINT) AS tp,
      CAST(fp AS BIGINT) AS fp,
      CAST(np - tp AS BIGINT) AS fn,
      round(CAST(tp AS DOUBLE) / (tp + fp), 8) AS precision_,
      round(CAST(tp AS DOUBLE) / np, 8) AS recall_,
      round(f1, 8) AS f1
    FROM f JOIN pick ON f.thr = pick.best_thr
    """,
)
def quality_optimal_f1_threshold(spark, sf_dir):
    """The F1-maximizing decision threshold for the length-vs-is-
    English classifier (predict positive when score >= t) with its
    confusion counts, precision and recall at the optimum — the
    actionable cut point the AUC/PR-curve/gains family stops short of
    picking. F1 = 2TP / (2TP + FP + FN) is evaluated at every distinct
    score in one pass over the prefix-summed value table; the argmax
    tie-breaks to the LOWEST threshold (keep more data at equal F1).

    Same scale shape as the AUC ops: one distinct-score aggregate, the
    bucketed prefix-sum kernel, and bounded everything after."""
    from pyspark.sql import Window  # noqa: F401  (module-level W used)
    from ..functions.prefix import bucketed_prefix_sums

    d = table(spark, sf_dir, "documents")
    pv = d.groupBy(F.col("n_chars").alias("s")).agg(
        F.sum((F.col("lang") == "en").cast("bigint")).alias("p"),
        F.sum((F.col("lang") != "en").cast("bigint")).alias("q"),
    )
    t = F.broadcast(
        pv.agg(
            F.sum("p").cast("bigint").alias("np"),
            F.sum("q").cast("bigint").alias("nq"),
        )
    )
    c = bucketed_prefix_sums(pv, "s", ["p", "q"]).crossJoin(t)
    tp = F.col("np") - F.col("cum_p") + F.col("p")
    fp = F.col("nq") - F.col("cum_q") + F.col("q")
    fn = F.col("cum_p") - F.col("p")
    f = c.select(
        F.col("s").alias("thr"),
        tp.alias("tp"),
        fp.alias("fp"),
        F.col("np"),
        (2.0 * tp / (2.0 * tp + fp + fn)).alias("f1"),
    )
    mx = F.broadcast(f.agg(F.max(F.round("f1", 10)).alias("mf")))
    pick = F.broadcast(
        f.join(mx, F.round("f1", 10) == F.col("mf")).agg(
            F.min("thr").alias("best_thr")
        )
    )
    return f.join(pick, F.col("thr") == F.col("best_thr")).select(
        F.col("thr").alias("threshold"),
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        (F.col("np") - F.col("tp")).cast("bigint").alias("fn"),
        F.round(F.col("tp").cast("double") / (F.col("tp") + F.col("fp")), 8)
        .alias("precision_"),
        F.round(F.col("tp").cast("double") / F.col("np"), 8).alias(
            "recall_"
        ),
        F.round("f1", 8).alias("f1"),
    )


# --------------------------------------------- Brier decomposition


@query(
    "quality_brier_decomposition",
    oracle=f"""
    WITH {_SCORED_SQL},
    rows_ AS (
      SELECT quality_score AS p,
        CASE WHEN scored.lang = 'en' THEN 1 ELSE 0 END AS y,
        LEAST(CAST(floor(quality_score * 10) AS BIGINT), 9) AS bin
      FROM scored
    ),
    bins AS (
      SELECT bin, COUNT(*)::BIGINT AS n_k,
        CAST(SUM(CAST(p AS DECIMAL(28,10))) AS DOUBLE) AS sp,
        SUM(y)::BIGINT AS sy,
        CAST(SUM(CAST(round((p - y) * (p - y), 10) AS DECIMAL(38,12)))
          AS DOUBLE) AS sq
      FROM rows_ GROUP BY bin
    ),
    tot AS (
      SELECT SUM(n_k)::BIGINT AS n, CAST(SUM(sy) AS DOUBLE) / SUM(n_k)
        AS ybar,
        CAST(SUM(CAST(sq AS DECIMAL(38,12))) AS DOUBLE) AS sqsum
      FROM bins
    ),
    terms AS (
      SELECT
        CAST(SUM(CAST(round(
          n_k * pow(sp / n_k - CAST(sy AS DOUBLE) / n_k, 2), 10)
          AS DECIMAL(38,12))) AS DOUBLE) AS rel_n,
        CAST(SUM(CAST(round(
          n_k * pow(CAST(sy AS DOUBLE) / n_k - ybar, 2), 10)
          AS DECIMAL(38,12))) AS DOUBLE) AS res_n
      FROM bins CROSS JOIN tot
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
      round(sqsum / n, 8) AS brier,
      round(rel_n / n, 8) AS reliability,
      round(res_n / n, 8) AS resolution,
      round(ybar * (1 - ybar), 8) AS uncertainty,
      round(sqsum / n - (rel_n / n - res_n / n + ybar * (1 - ybar)), 8)
        AS within_bin_term
    FROM tot CROSS JOIN terms
    """,
)
def quality_brier_decomposition(spark, sf_dir):
    """Murphy decomposition of the logistic quality model's Brier
    score against the is-English label: Brier = reliability -
    resolution + uncertainty (+ a within-bin variance term from
    binning) over 10 fixed-width probability bins — the scoring-rule
    audit that says WHY a probabilistic scorer is good or bad
    (quality_calibration_bins draws the curve; this prices it:
    low reliability = calibrated, high resolution = discriminative,
    uncertainty = the label's intrinsic difficulty floor).

    Same map-side logistic as quality_model_filter (shared expression
    tree); one 10-bin aggregate with exact label counts and rounded-
    decimal sums of p and (p-y)^2; every decomposition term is closed
    form from the bin table."""
    d = table(spark, sf_dir, "documents")
    p = quality_score_col()
    rows_ = d.select(
        p.alias("p"),
        (F.col("lang") == "en").cast("int").alias("y"),
        F.least(F.floor(p * 10).cast("bigint"), F.lit(9).cast("bigint")).alias(
            "bin"
        ),
    )
    bins = rows_.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_k"),
        F.sum(F.col("p").cast("decimal(28,10)")).cast("double").alias("sp"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(
            F.round(
                (F.col("p") - F.col("y")) * (F.col("p") - F.col("y")), 10
            ).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("sq"),
    )
    tot = F.broadcast(
        bins.agg(
            F.sum("n_k").cast("bigint").alias("n"),
            (F.sum("sy").cast("double") / F.sum("n_k")).alias("ybar"),
            F.sum(F.col("sq").cast("decimal(38,12)"))
            .cast("double")
            .alias("sqsum"),
        )
    )
    rel_t = F.col("n_k") * F.pow(
        F.col("sp") / F.col("n_k") - F.col("sy").cast("double") / F.col("n_k"),
        2,
    )
    res_t = F.col("n_k") * F.pow(
        F.col("sy").cast("double") / F.col("n_k") - F.col("ybar"), 2
    )
    terms = bins.crossJoin(tot).agg(
        F.sum(F.round(rel_t, 10).cast("decimal(38,12)"))
        .cast("double")
        .alias("rel_n"),
        F.sum(F.round(res_t, 10).cast("decimal(38,12)"))
        .cast("double")
        .alias("res_n"),
    )
    return tot.crossJoin(F.broadcast(terms)).select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(F.col("sqsum") / F.col("n"), 8).alias("brier"),
        F.round(F.col("rel_n") / F.col("n"), 8).alias("reliability"),
        F.round(F.col("res_n") / F.col("n"), 8).alias("resolution"),
        F.round(F.col("ybar") * (1 - F.col("ybar")), 8).alias(
            "uncertainty"
        ),
        F.round(
            F.col("sqsum") / F.col("n")
            - (
                F.col("rel_n") / F.col("n")
                - F.col("res_n") / F.col("n")
                + F.col("ybar") * (1 - F.col("ybar"))
            ),
            8,
        ).alias("within_bin_term"),
    )


# --------------------------------- per-source quantile mapping table

QMAP_DECILES = tuple(range(1, 10))


@query(
    "source_length_quantile_map",
    oracle=f"""
    WITH bysrc AS (
      SELECT source,
        {", ".join(f"quantile_cont(CAST(n_chars AS DOUBLE), {p / 10.0!r}) AS sq{p}" for p in QMAP_DECILES)}
      FROM documents GROUP BY source
    ),
    pooled AS (
      SELECT
        {", ".join(f"quantile_cont(CAST(n_chars AS DOUBLE), {p / 10.0!r}) AS pq{p}" for p in QMAP_DECILES)}
      FROM documents
    ),
    grid AS (
      {" UNION ALL ".join(f"SELECT source, CAST({p / 10.0!r} AS DOUBLE) AS decile, sq{p} AS source_q, pq{p} AS pooled_q FROM bysrc CROSS JOIN pooled" for p in QMAP_DECILES)}
    )
    SELECT source, decile,
      round(source_q, 6) AS source_q,
      round(pooled_q, 6) AS pooled_q,
      round(source_q - pooled_q, 8) AS shift
    FROM grid
    """,
)
def source_length_quantile_map(spark, sf_dir):
    """Quantile-normalization mapping table per source: each source's nine
    document-length deciles next to the POOLED corpus deciles, with the
    shift between them. This is the lookup a quantile-normalizing curator
    applies to put per-source scores on one scale before a global
    threshold (the distribution-alignment sibling of the z-score
    standardization ops — rank-based, so robust to heavy tails), and the
    per-source shift column is a drift report on its own.

    Scale shape: both decile sets come from conditional-percentile
    aggregates (typed sort buffers, partial-merged — the F.percentile <->
    quantile_cont bit-pairing established by quality_calibration_bins);
    the grid unpivots from a sources x 1 table, so output is
    9 x n_sources regardless of corpus size."""
    d = table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("double").alias("x")
    )
    bysrc = d.groupBy("source").agg(
        *[F.percentile("x", p / 10.0).alias(f"sq{p}") for p in QMAP_DECILES]
    )
    pooled = F.broadcast(
        d.agg(*[F.percentile("x", p / 10.0).alias(f"pq{p}") for p in QMAP_DECILES])
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(p / 10.0).alias("decile"),
                F.col(f"sq{p}").alias("source_q"),
                F.col(f"pq{p}").alias("pooled_q"),
            )
            for p in QMAP_DECILES
        ]
    )
    return (
        bysrc.crossJoin(pooled)
        .select("source", F.explode(pairs).alias("r"))
        .select(
            "source",
            F.col("r.decile").alias("decile"),
            F.round("r.source_q", 6).alias("source_q"),
            F.round("r.pooled_q", 6).alias("pooled_q"),
            F.round(F.col("r.source_q") - F.col("r.pooled_q"), 8).alias("shift"),
        )
    )


# --------------------------------------------- Qini uplift curve


@query(
    "ab_qini_uplift_curve",
    oracle="""
    WITH peruser AS (
      SELECT user_id,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 2 AS treated,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
          AS s,
        CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS BIGINT) AS conv
      FROM events GROUP BY user_id
    ),
    pv AS (
      SELECT s,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(treated) AS BIGINT) AS nt,
        CAST(SUM(1 - treated) AS BIGINT) AS nc,
        CAST(SUM(CASE WHEN treated = 1 THEN conv ELSE 0 END) AS BIGINT) AS pt,
        CAST(SUM(CASE WHEN treated = 0 THEN conv ELSE 0 END) AS BIGINT) AS pc
      FROM peruser GROUP BY s
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn FROM pv),
    cum AS (
      SELECT s, n, nt, nc, pt, pc,
        SUM(n) OVER (ORDER BY s
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca
      FROM pv
    ),
    dec AS (
      SELECT CAST(ceil(10.0 * (tn - ca + n) / tn) AS BIGINT) AS decile,
        nt, nc, pt, pc
      FROM cum CROSS JOIN t
    ),
    byd AS (
      SELECT decile,
        CAST(SUM(nt) AS BIGINT) AS n_treated,
        CAST(SUM(nc) AS BIGINT) AS n_control,
        CAST(SUM(pt) AS BIGINT) AS conv_treated,
        CAST(SUM(pc) AS BIGINT) AS conv_control
      FROM dec GROUP BY decile
    ),
    g AS (
      SELECT decile, n_treated, n_control, conv_treated, conv_control,
        SUM(n_treated) OVER w AS cnt, SUM(n_control) OVER w AS cnc,
        SUM(conv_treated) OVER w AS cpt, SUM(conv_control) OVER w AS cpc
      FROM byd
      WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
        AND CURRENT ROW)
    )
    SELECT decile, n_treated, n_control, conv_treated, conv_control,
      CASE WHEN cnc = 0 THEN NULL
        ELSE round(cpt - cpc * (CAST(cnt AS DOUBLE) / cnc), 6) END AS qini,
      CASE WHEN cnc = 0 OR cnt = 0 THEN NULL
        ELSE round(CAST(cpt AS DOUBLE) / cnt - CAST(cpc AS DOUBLE) / cnc, 8)
        END AS cum_uplift
    FROM g
    """,
)
def ab_qini_uplift_curve(spark, sf_dir):
    """Qini uplift curve by targeting-score decile: users ranked by click
    count (the targeting score), hash-split into treated/control, and per
    cumulative decile the incremental conversions
    qini = cum_conv_t - cum_conv_c * (cum_n_t / cum_n_c) plus the
    cumulative uplift rate difference. THE evaluation for "whom should
    we treat first" — a model can have great AUC on conversion yet a
    flat Qini curve (it finds sure things, not persuadables).

    Scale shape: one user-grain rollup, then the distinct-score grouped
    table through the same descending-decile prefix-sum kernel as
    quality_gains_lift_table (whole tied-score groups share a decile —
    deterministic in both engines); every curve aggregate is an exact
    integer sum and the windows run on 10 rows."""
    from ..functions.prefix import bucketed_prefix_sums

    e = table(spark, sf_dir, "events")
    peruser = (
        e.groupBy("user_id")
        .agg(
            F.sum((F.col("event_type") == "click").cast("int"))
            .cast("bigint")
            .alias("s"),
            F.max((F.col("event_type") == "purchase").cast("int"))
            .cast("bigint")
            .alias("conv"),
        )
        .select(
            "s",
            "conv",
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
                ).cast("bigint")
                % 2
            ).alias("treated"),
        )
    )
    pv = peruser.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("treated").cast("bigint").alias("nt"),
        F.sum(1 - F.col("treated")).cast("bigint").alias("nc"),
        F.sum(F.when(F.col("treated") == 1, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("pt"),
        F.sum(F.when(F.col("treated") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("pc"),
    )
    t = F.broadcast(pv.agg(F.sum("n").cast("bigint").alias("tn")))
    cum = bucketed_prefix_sums(pv, "s", ["n"]).crossJoin(t)
    dec = cum.select(
        F.ceil(10.0 * (F.col("tn") - F.col("cum_n") + F.col("n")) / F.col("tn"))
        .cast("bigint")
        .alias("decile"),
        "nt",
        "nc",
        "pt",
        "pc",
    )
    byd = dec.groupBy("decile").agg(
        F.sum("nt").cast("bigint").alias("n_treated"),
        F.sum("nc").cast("bigint").alias("n_control"),
        F.sum("pt").cast("bigint").alias("conv_treated"),
        F.sum("pc").cast("bigint").alias("conv_control"),
    )
    w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    g = byd.select(
        "decile",
        "n_treated",
        "n_control",
        "conv_treated",
        "conv_control",
        F.sum("n_treated").over(w).alias("cnt"),
        F.sum("n_control").over(w).alias("cnc"),
        F.sum("conv_treated").over(w).alias("cpt"),
        F.sum("conv_control").over(w).alias("cpc"),
    )
    return g.select(
        "decile",
        "n_treated",
        "n_control",
        "conv_treated",
        "conv_control",
        F.when(F.col("cnc") == 0, F.lit(None))
        .otherwise(
            F.round(
                F.col("cpt")
                - F.col("cpc") * (F.col("cnt").cast("double") / F.col("cnc")),
                6,
            )
        )
        .alias("qini"),
        F.when((F.col("cnc") == 0) | (F.col("cnt") == 0), F.lit(None))
        .otherwise(
            F.round(
                F.col("cpt").cast("double") / F.col("cnt")
                - F.col("cpc").cast("double") / F.col("cnc"),
                8,
            )
        )
        .alias("cum_uplift"),
    )
