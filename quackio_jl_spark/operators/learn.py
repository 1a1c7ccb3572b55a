"""Learned-model operators trained *inside* the engine (driver mandate;
beyond the reference's I/O-only surface — /root/reference/src/QuackIO.jl):
the distributed-ML counterparts of scoring.py's frozen-weight classifier.
Every estimator here is fit from the corpus itself with nothing but
DataFrame aggregations — the canonical "sufficient statistics via
map-side partial aggregation" shape that scales to 100 TB because model
state is a handful of numbers while the data never leaves the executors:

- Multinomial naive-Bayes language ID: token-count sufficient statistics,
  Laplace smoothing, argmax posterior per document.
- Full-batch gradient-descent logistic regression: K unrolled iterations,
  each one scan + one 5-number gradient aggregate (the classic
  parameter-server-free distributed GD loop).
- Isotonic calibration (pool-adjacent-violators) via the minimax closed
  form over an aggregated bin table — the PAV sweep is sequential, but
  after binning the problem is B=10 rows, so the O(B^3) minimax join is
  free and fully declarative.
- Data-parallel shard->worker scheduling audit: round-robin assignment
  (torch DistributedSampler's default), per-worker token skew, and the
  drop-last data loss every trainer silently pays.

Determinism engineering (the repo-wide recipe, functions/exact.py): all
per-row transcendentals are rounded to a fixed number of decimals, all
cross-row sums run in DECIMAL (exact, associative), so results are
bit-identical for any partition count and match the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.fanout import fanout
from ..plans.registry import query, table

# ------------------------------------------------------- naive Bayes langid

# Per-(token, lang) log-likelihoods are scaled to exact micro-units
# (round(ln(p) * 1e6) -> BIGINT, the DSIR recipe from selection.py) so
# per-document posteriors are exact integer sums — immune both to
# accumulation order AND to the engines' differing round(x, n) boundary
# behavior on doubles.


# Shared oracle CTE chain ending in post(doc_id, lang_true, m, post6) —
# the per-(doc, lang) integer micro-unit log-posterior (SQL twin of
# _nb_doc_posteriors).
_NB_POST_SQL = """
    toks AS (
      SELECT doc_id, lang AS lang_true, unnest(string_split(text, ' ')) AS t
      FROM documents
    ),
    langs AS (SELECT DISTINCT lang AS m FROM documents),
    vocab AS (SELECT DISTINCT t FROM toks),
    vsize AS (SELECT COUNT(*) AS v FROM vocab),
    cnt AS (SELECT t, lang_true AS m, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    nl AS (SELECT lang_true AS m, COUNT(*) AS ntok FROM toks GROUP BY 1),
    grid AS (
      SELECT vocab.t, langs.m,
        CAST(round(ln((COALESCE(cnt.c, 0) + 1.0)
                      / (nl.ntok + vsize.v)) * 1e6) AS BIGINT) AS lp6
      FROM vocab CROSS JOIN langs
      CROSS JOIN vsize
      LEFT JOIN cnt ON cnt.t = vocab.t AND cnt.m = langs.m
      JOIN nl ON nl.m = langs.m
    ),
    priors AS (
      SELECT lang AS m,
        CAST(round(ln(CAST(COUNT(*) AS DOUBLE)
                      / (SELECT COUNT(*) FROM documents)) * 1e6)
             AS BIGINT) AS lprior6
      FROM documents GROUP BY 1
    ),
    doc_lang AS (
      SELECT toks.doc_id, toks.lang_true, grid.m,
        SUM(grid.lp6) AS ll6
      FROM toks JOIN grid ON grid.t = toks.t
      GROUP BY 1, 2, 3
    ),
    post AS (
      SELECT doc_id, lang_true, doc_lang.m AS m,
        ll6 + priors.lprior6 AS post6
      FROM doc_lang JOIN priors ON priors.m = doc_lang.m
    )
"""


@query(
    "langid_naive_bayes",
    oracle="WITH "
    + _NB_POST_SQL
    + """
    , scored AS (
      SELECT doc_id, lang_true AS lang, m,
        round(post6 / 1e6, 6) AS score,
        ROW_NUMBER() OVER (
          PARTITION BY doc_id ORDER BY post6 DESC, m DESC
        ) AS rk
      FROM post
    )
    SELECT doc_id, lang, m AS pred_lang, score,
      CASE WHEN m = lang THEN TRUE ELSE FALSE END AS correct
    FROM scored WHERE rk = 1
    """,
)
def langid_naive_bayes(spark, sf_dir):
    """Multinomial naive-Bayes language ID trained on the corpus itself
    (resubstitution eval): P(lang) priors + Laplace-smoothed P(token|lang),
    argmax posterior per document.

    A learned counterpart to text.py's trigram *heuristic* langid: the
    model IS two aggregates (token x lang counts, lang priors). Scale
    shape: the (vocab x languages) likelihood grid is linear in vocabulary
    size — model-sized, not corpus-sized — and the per-document scoring is
    one equi-join of the token stream against that grid plus one exact
    decimal-sum aggregate per (doc, lang). The argmax is a 5-rows-per-doc
    window partitioned BY DOCUMENT — never a global sort. Log-likelihoods
    are scaled to integer micro-units before summing so the posterior is
    identical for any partition count (the selection.py DSIR recipe)."""
    scored = _nb_doc_posteriors(spark, sf_dir).withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy(
                F.col("post6").desc(), F.col("m").desc()
            )
        ),
    )
    return scored.filter(F.col("rk") == 1).select(
        "doc_id",
        F.col("lang_true").alias("lang"),
        F.col("m").alias("pred_lang"),
        F.round(F.col("post6") / 1e6, 6).alias("score"),
        (F.col("m") == F.col("lang_true")).alias("correct"),
    )


def _nb_doc_posteriors(spark, sf_dir):
    """Shared NB kernel: per-(doc, lang) integer micro-unit log-posteriors
    ``post6`` (token log-likelihood grid + lang prior), used by the argmax
    classifier and by the uncertainty-sampling margin selector.

    Plan shape (round-11 optimization): the tokenizer explode fans out of
    the one-task single-row-group scan, and the token stream collapses
    ONCE to per-(doc, token) frequencies (``tf``; its aggregation
    exchange is identical in all four consuming branches, so AQE's
    runtime stage reuse computes it once — measured faster than an
    explicit persist, which accumulates cache across bench passes).
    Every statistic is an exact integer reweighting of the instance
    stream — sum over instances of lp6 == sum over distinct doc-tokens
    of tfreq*lp6 — so results are bit-identical to the per-instance
    form the oracle computes."""
    d = table(spark, sf_dir, "documents")
    toks = fanout(
        d.select("doc_id", F.col("lang").alias("lang_true"), "text"),
        "doc_id",
    ).select(
        "doc_id",
        "lang_true",
        F.explode(F.split("text", " ")).alias("t"),
    )
    tf = toks.groupBy("doc_id", "lang_true", "t").agg(
        F.count(F.lit(1)).alias("tfreq")
    )
    langs = d.select(F.col("lang").alias("m")).distinct()
    # Round-12 (same rollup recipe as langid_nb_crossval): per-(doc,token)
    # rows cross ONE aggregation into the vocabulary-sized cnt; vocab and
    # the per-language token totals are exact rollups of it (distinct t
    # sets agree; ntok = Σ_t c per m) — previously the vocab/nl branches
    # re-aggregated the corpus-sized tf inside separate broadcast builds.
    cnt = tf.groupBy("t", F.col("lang_true").alias("m")).agg(
        F.sum("tfreq").alias("c")
    )
    vocab = cnt.select("t").distinct()
    vsize = F.broadcast(vocab.agg(F.count(F.lit(1)).alias("v")))
    nl = F.broadcast(cnt.groupBy("m").agg(F.sum("c").alias("ntok")))
    grid = (
        vocab.crossJoin(F.broadcast(langs))
        .crossJoin(vsize)
        .join(cnt, ["t", "m"], "left")
        .join(nl, "m")
        .select(
            "t",
            "m",
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
                    / (F.col("ntok") + F.col("v"))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("lp6"),
        )
    )
    tot = F.broadcast(d.agg(F.count(F.lit(1)).alias("ndocs")))
    priors = F.broadcast(
        d.groupBy(F.col("lang").alias("m"))
        .agg(F.count(F.lit(1)).alias("nm"))
        .crossJoin(tot)
        .select(
            "m",
            F.round(
                F.log(F.col("nm").cast("double") / F.col("ndocs")) * 1e6
            )
            .cast("bigint")
            .alias("lprior6"),
        )
    )
    doc_lang = (
        tf.join(grid, "t")
        .groupBy("doc_id", "lang_true", "m")
        .agg(F.sum(F.col("tfreq") * F.col("lp6")).alias("ll6"))
        .join(priors, "m")
    )
    return doc_lang.select(
        "doc_id",
        "lang_true",
        "m",
        (F.col("ll6") + F.col("lprior6")).alias("post6"),
    )


# ------------------------------------- gradient-descent logistic regression

_GD_LR = 0.05
_GD_ITERS = 3

# Rounded document features shared by the Spark plan and the oracle: the
# same four quality signals as scoring.quality_score_col, rounded to 8
# decimals so both engines iterate from bit-identical inputs.
_GD_FEATS_SQL = """
    feats AS (
      SELECT doc_id,
        CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
        round(ln(1.0 + len(string_split(text, ' '))), 8) AS x1,
        round(CAST(length(text) AS DOUBLE)
              / len(string_split(text, ' ')), 8) AS x2,
        round(CAST(length(text)
              - length(regexp_replace(text, '[aeiou]', '', 'g')) AS DOUBLE)
              / length(text), 8) AS x3,
        round(CAST(length(text)
              - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
              / length(text), 8) AS x4
      FROM documents
    )
"""


def _gd_oracle() -> str:
    """Build the unrolled K-iteration GD oracle: each iteration is a
    sigmoid-scoring CTE + an exact decimal gradient CTE + a weight-update
    CTE; the output unions one (iter, loss, weights) row per iteration."""
    parts = ["WITH " + _GD_FEATS_SQL.strip().rstrip()]
    prev_w = "(SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4)"
    selects = []
    for it in range(1, _GD_ITERS + 1):
        parts.append(
            f"""p{it} AS (
      SELECT f.*, w.*,
        round(1.0 / (1.0 + exp(-(w.w0 + w.w1 * f.x1 + w.w2 * f.x2
                                 + w.w3 * f.x3 + w.w4 * f.x4))), 8) AS p
      FROM feats f CROSS JOIN {prev_w} w
    )"""
        )
        parts.append(
            f"""g{it} AS (
      SELECT COUNT(*) AS n,
        ANY_VALUE(w0) AS w0, ANY_VALUE(w1) AS w1, ANY_VALUE(w2) AS w2,
        ANY_VALUE(w3) AS w3, ANY_VALUE(w4) AS w4,
        SUM(CAST(round(p - y, 10) AS DECIMAL(38,12))) AS s0,
        SUM(CAST(round((p - y) * x1, 10) AS DECIMAL(38,12))) AS s1,
        SUM(CAST(round((p - y) * x2, 10) AS DECIMAL(38,12))) AS s2,
        SUM(CAST(round((p - y) * x3, 10) AS DECIMAL(38,12))) AS s3,
        SUM(CAST(round((p - y) * x4, 10) AS DECIMAL(38,12))) AS s4,
        SUM(CAST(round(-(y * ln(greatest(p, 1e-8))
              + (1.0 - y) * ln(greatest(1.0 - p, 1e-8))), 10)
            AS DECIMAL(38,12))) AS sll
      FROM p{it}
    )"""
        )
        parts.append(
            f"""w{it} AS (
      SELECT
        round(w0 - {_GD_LR} * (CAST(s0 AS DOUBLE) / n), 8) AS w0,
        round(w1 - {_GD_LR} * (CAST(s1 AS DOUBLE) / n), 8) AS w1,
        round(w2 - {_GD_LR} * (CAST(s2 AS DOUBLE) / n), 8) AS w2,
        round(w3 - {_GD_LR} * (CAST(s3 AS DOUBLE) / n), 8) AS w3,
        round(w4 - {_GD_LR} * (CAST(s4 AS DOUBLE) / n), 8) AS w4
      FROM g{it}
    )"""
        )
        selects.append(
            f"""SELECT {it} AS iter,
      round(CAST((SELECT sll FROM g{it}) AS DOUBLE)
            / (SELECT n FROM g{it}), 8) AS loss,
      (SELECT w0 FROM w{it}) AS w_intercept,
      (SELECT w1 FROM w{it}) AS w_log_tokens,
      (SELECT w2 FROM w{it}) AS w_mean_tok_len,
      (SELECT w3 FROM w{it}) AS w_vowel,
      (SELECT w4 FROM w{it}) AS w_digit"""
        )
        prev_w = f"w{it}"
    return ",\n    ".join(parts) + "\n    " + "\nUNION ALL\n".join(selects)


@query("logreg_gd_training_curve", oracle=_gd_oracle())
def logreg_gd_training_curve(spark, sf_dir):
    """Full-batch gradient-descent logistic regression (predict lang='en'
    from the four quality features), K=3 unrolled iterations; one row per
    iteration with the in-iteration mean log-loss and the updated weights.

    The parameter-server-free distributed GD loop: model state is FIVE
    NUMBERS, so each iteration is one corpus scan producing one 1-row
    gradient aggregate that is broadcast back into the next iteration's
    scoring expression — no driver-side .collect() of anything but the
    final 3-row curve, no shuffle of document rows at all (the only
    exchange per iteration is the partial-agg combine). The feature frame
    is persisted once and reused across iterations (the PageRank
    persist-per-iteration rule, operators/cluster.py). Determinism: rounded
    per-row sigmoid/gradient terms, DECIMAL(38,12) sums, weights rounded to
    8 decimals each step — bit-identical for any partition count.

    Round-11: the feature extraction (two regexp passes over every
    document) fans out of the one-task single-row-group scan, and the
    persisted feature frame keeps that parallel partitioning for every
    GD iteration."""
    d = fanout(
        table(spark, sf_dir, "documents").select("doc_id", "lang", "text"),
        "doc_id",
    )
    n_chars = F.length("text")
    n_tokens = F.size(F.split("text", " "))
    feats = d.select(
        F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
        F.round(F.log(F.lit(1.0) + n_tokens), 8).alias("x1"),
        F.round(n_chars.cast("double") / n_tokens, 8).alias("x2"),
        F.round(
            (n_chars - F.length(F.regexp_replace("text", "[aeiou]", ""))).cast(
                "double"
            )
            / n_chars,
            8,
        ).alias("x3"),
        F.round(
            (n_chars - F.length(F.regexp_replace("text", "[0-9]", ""))).cast(
                "double"
            )
            / n_chars,
            8,
        ).alias("x4"),
    ).persist()

    w = F.broadcast(
        spark.range(1).select(
            F.lit(0.0).alias("w0"),
            F.lit(0.0).alias("w1"),
            F.lit(0.0).alias("w2"),
            F.lit(0.0).alias("w3"),
            F.lit(0.0).alias("w4"),
        )
    )
    # Round-12 (guide §7.3 driver cost; the merge.py FS-EM recipe): the
    # loop body parses each iteration's arithmetic from the ORACLE's own
    # SQL text via one F.expr per column — 6810 -> ~600 py4j round-trips
    # per build (host-independent counts, pinned in
    # tests/test_driver_cost.py). Every expression mirrors _gd_oracle()
    # verbatim (same left-to-right association, same explicit CASTs; the
    # DECIMAL literals 1.0/0.05 promote to DOUBLE against DOUBLE operands
    # with exact values, as the oracle's own engine does), so the
    # Catalyst tree and the results are bit-identical to the Column form
    # — verified by collect-equality and the oracle hash gate.
    _p_expr = (
        "round(1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2"
        " + w3 * x3 + w4 * x4))), 8) AS p"
    )
    _g_exprs = [
        "count(1) AS n",
        "any_value(w0) AS w0",
        "any_value(w1) AS w1",
        "any_value(w2) AS w2",
        "any_value(w3) AS w3",
        "any_value(w4) AS w4",
        "SUM(CAST(round(p - y, 10) AS DECIMAL(38,12))) AS s0",
        "SUM(CAST(round((p - y) * x1, 10) AS DECIMAL(38,12))) AS s1",
        "SUM(CAST(round((p - y) * x2, 10) AS DECIMAL(38,12))) AS s2",
        "SUM(CAST(round((p - y) * x3, 10) AS DECIMAL(38,12))) AS s3",
        "SUM(CAST(round((p - y) * x4, 10) AS DECIMAL(38,12))) AS s4",
        "SUM(CAST(round(-(y * ln(greatest(p, 1e-8))"
        " + (1.0 - y) * ln(greatest(1.0 - p, 1e-8))), 10)"
        " AS DECIMAL(38,12))) AS sll",
    ]
    _upd_exprs = [
        f"round(w{i} - {_GD_LR} * (CAST(s{i} AS DOUBLE) / n), 8) AS w{i}"
        for i in range(5)
    ]
    rows = None
    for it in range(1, _GD_ITERS + 1):
        scored = feats.crossJoin(w).selectExpr("*", _p_expr)
        g = scored.agg(*[F.expr(e) for e in _g_exprs])
        w = F.broadcast(g.selectExpr(*_upd_exprs))
        row = g.crossJoin(
            w.selectExpr(
                "w0 AS u0", "w1 AS u1", "w2 AS u2", "w3 AS u3", "w4 AS u4"
            )
        ).selectExpr(
            f"{it} AS iter",
            "round(CAST(sll AS DOUBLE) / n, 8) AS loss",
            "u0 AS w_intercept",
            "u1 AS w_log_tokens",
            "u2 AS w_mean_tok_len",
            "u3 AS w_vowel",
            "u4 AS w_digit",
        )
        rows = row if rows is None else rows.unionAll(row)
    return rows


# ------------------------------------------------ isotonic calibration (PAV)

_ISO_BINS = 10


@query(
    "quality_isotonic_calibration",
    oracle=f"""
    WITH scored AS (
      SELECT
        round(1.0 / (1.0 + exp(-((-3.0)
          + (0.9 * ln(1.0 + len(string_split(text, ' '))))
          + (-0.15 * (CAST(length(text) AS DOUBLE)
                      / len(string_split(text, ' '))))
          + (4.0 * (CAST(length(text)
              - length(regexp_replace(text, '[aeiou]', '', 'g')) AS DOUBLE)
              / length(text)))
          + (-6.0 * (CAST(length(text)
              - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
              / length(text)))))), 8) AS p,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    bins AS (
      SELECT least(CAST(floor(p * {_ISO_BINS}) AS BIGINT),
                   {_ISO_BINS - 1}) AS bin,
        COUNT(*) AS n_k, SUM(y) AS sy
      FROM scored GROUP BY 1
    ),
    intervals AS (
      SELECT i.bin AS lo, j.bin AS hi,
        round(CAST(SUM(m.sy) AS DOUBLE) / SUM(m.n_k), 8) AS wavg
      FROM bins i JOIN bins j ON i.bin <= j.bin
      JOIN bins m ON m.bin BETWEEN i.bin AND j.bin
      GROUP BY 1, 2
    ),
    inner_min AS (
      SELECT b.bin, iv.lo, MIN(iv.wavg) AS mn
      FROM bins b JOIN intervals iv ON iv.lo <= b.bin AND iv.hi >= b.bin
      GROUP BY 1, 2
    ),
    fit AS (SELECT bin, MAX(mn) AS iso_rate FROM inner_min GROUP BY 1)
    SELECT bins.bin, bins.n_k,
      round(CAST(bins.sy AS DOUBLE) / bins.n_k, 8) AS raw_rate,
      fit.iso_rate
    FROM bins JOIN fit ON fit.bin = bins.bin
    """,
)
def quality_isotonic_calibration(spark, sf_dir):
    """Isotonic (monotone nondecreasing) calibration of the quality score
    against the lang='en' outcome, via the minimax closed form of
    pool-adjacent-violators: fit_k = max_(i<=k) min_(j>=k) wavg(y, i..j).

    The PAV sweep is inherently sequential, but calibration operates on
    BINNED data: one corpus-wide aggregate reduces 10^11 rows to
    {_ISO_BINS} (bin, n, sum_y) rows, after which the O(B^3) minimax
    triple-join is driver-trivial and fully declarative — no UDF, no
    collect. Weighted averages divide exact BIGINT sums, rounded to 8
    decimals in both engines; min/max over rounded values are exact, so
    the fitted curve is bit-reproducible. Same bin layout as
    quality_calibration_bins (least(floor(p*10), 9))."""
    from .scoring import quality_score_col

    d = table(spark, sf_dir, "documents")
    p = quality_score_col()
    rows_ = d.select(
        p.alias("p"), (F.col("lang") == "en").cast("int").alias("y")
    )
    bins = rows_.groupBy(
        F.least(
            F.floor(F.col("p") * _ISO_BINS).cast("bigint"),
            F.lit(_ISO_BINS - 1).cast("bigint"),
        ).alias("bin")
    ).agg(F.count(F.lit(1)).alias("n_k"), F.sum("y").alias("sy"))
    i = bins.select(F.col("bin").alias("lo"))
    j = bins.select(F.col("bin").alias("hi"))
    m = bins.select(
        F.col("bin").alias("mb"), F.col("n_k").alias("mn_k"), F.col("sy").alias("msy")
    )
    intervals = (
        i.join(j, F.col("lo") <= F.col("hi"))
        .join(m, (F.col("mb") >= F.col("lo")) & (F.col("mb") <= F.col("hi")))
        .groupBy("lo", "hi")
        .agg(
            F.round(
                F.sum("msy").cast("double") / F.sum("mn_k"), 8
            ).alias("wavg")
        )
    )
    inner_min = (
        bins.select("bin")
        .join(
            intervals,
            (F.col("lo") <= F.col("bin")) & (F.col("hi") >= F.col("bin")),
        )
        .groupBy("bin", "lo")
        .agg(F.min("wavg").alias("mn"))
    )
    fit = inner_min.groupBy("bin").agg(F.max("mn").alias("iso_rate"))
    return bins.join(fit, "bin").select(
        "bin",
        "n_k",
        F.round(F.col("sy").cast("double") / F.col("n_k"), 8).alias("raw_rate"),
        "iso_rate",
    )


# ------------------------------------- data-parallel shard scheduling audit

_SW_SHARD_DOCS = 50
_SW_WORKERS = 8
_SW_BATCH = 16


@query(
    "shard_worker_assignment_balance",
    oracle=f"""
    WITH sharded AS (
      SELECT doc_id // {_SW_SHARD_DOCS} AS shard,
        CAST((doc_id // {_SW_SHARD_DOCS}) % {_SW_WORKERS} AS BIGINT) AS worker,
        len(string_split(text, ' ')) AS n_toks
      FROM documents
    ),
    per_worker AS (
      SELECT worker, COUNT(DISTINCT shard) AS n_shards,
        COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
        CAST(COUNT(*) // {_SW_BATCH} AS BIGINT) AS n_batches
      FROM sharded GROUP BY 1
    ),
    sync AS (SELECT MIN(n_batches) AS lockstep_steps FROM per_worker)
    SELECT worker, n_shards, n_docs, n_tokens, n_batches,
      sync.lockstep_steps,
      CAST(n_docs - sync.lockstep_steps * {_SW_BATCH} AS BIGINT)
        AS dropped_docs,
      round(CAST(n_tokens AS DOUBLE)
        / ((SELECT SUM(n_tokens) FROM per_worker)
           / CAST({_SW_WORKERS} AS DOUBLE)), 8) AS token_skew
    FROM per_worker CROSS JOIN sync
    """,
)
def shard_worker_assignment_balance(spark, sf_dir):
    """Data-parallel epoch schedule audit: shards round-robin onto
    {_SW_WORKERS} workers (torch DistributedSampler's default), per-worker
    doc/token load, and the lockstep-step count — the MINIMUM per-worker
    batch count, which is what a synchronous trainer actually runs, with
    `dropped_docs` quantifying the drop-last data loss per worker and
    `token_skew` the compute imbalance (1.0 = perfectly even).

    One groupBy over a pure-function key (shard = doc_id // {_SW_SHARD_DOCS},
    worker = shard % {_SW_WORKERS}); the per-worker table is WORKER-sized
    (8 rows), so the lockstep minimum is a broadcast 1-row aggregate, not
    a window over data rows. At 100 TB this is one scan + one partial-agg
    combine."""
    d = table(spark, sf_dir, "documents")
    sharded = d.select(
        (F.col("doc_id") / _SW_SHARD_DOCS).cast("bigint").alias("shard"),
        F.size(F.split("text", " ")).alias("n_toks"),
    ).withColumn(
        "worker", (F.col("shard") % _SW_WORKERS).cast("bigint")
    )
    per_worker = sharded.groupBy("worker").agg(
        F.countDistinct("shard").alias("n_shards"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        (F.count(F.lit(1)) / _SW_BATCH).cast("bigint").alias("n_batches"),
    )
    sync = F.broadcast(
        per_worker.agg(
            F.min("n_batches").alias("lockstep_steps"),
            F.sum("n_tokens").alias("tot_tokens"),
        )
    )
    return per_worker.crossJoin(sync).select(
        "worker",
        "n_shards",
        "n_docs",
        "n_tokens",
        "n_batches",
        "lockstep_steps",
        (F.col("n_docs") - F.col("lockstep_steps") * _SW_BATCH)
        .cast("bigint")
        .alias("dropped_docs"),
        F.round(
            F.col("n_tokens").cast("double")
            / (F.col("tot_tokens") / F.lit(float(_SW_WORKERS))),
            8,
        ).alias("token_skew"),
    )


# ---------------------------------------- uncertainty sampling (active learning)

_MARGIN_TOPN = 20


@query(
    "annotation_margin_targets",
    oracle="WITH "
    + _NB_POST_SQL
    + f"""
    , ranked AS (
      SELECT doc_id, lang_true, m, post6,
        ROW_NUMBER() OVER (
          PARTITION BY doc_id ORDER BY post6 DESC, m DESC
        ) AS rk
      FROM post
    ),
    perdoc AS (
      SELECT doc_id, ANY_VALUE(lang_true) AS lang,
        MAX(CASE WHEN rk = 1 THEN m END) AS pred_lang,
        MAX(CASE WHEN rk = 2 THEN m END) AS second_lang,
        round((MAX(CASE WHEN rk = 1 THEN post6 END)
               - MAX(CASE WHEN rk = 2 THEN post6 END)) / 1e6, 6) AS margin
      FROM ranked WHERE rk <= 2 GROUP BY 1
    )
    SELECT doc_id, lang, pred_lang, second_lang, margin
    FROM perdoc
    ORDER BY margin ASC, doc_id ASC
    LIMIT {_MARGIN_TOPN}
    """,
)
def annotation_margin_targets(spark, sf_dir):
    """Uncertainty sampling for annotation (active learning's margin
    criterion, Lewis & Gale '94 / Scheffer '01): the {_MARGIN_TOPN}
    documents where the NB classifier's top-1 vs top-2 posterior margin is
    smallest — exactly the rows a labeling budget should buy first, and the
    canonical human-in-the-loop step of a data-curation pipeline.

    Scale shape: reuses the NB posterior kernel (token-stream equi-join
    against the model-sized likelihood grid), then a per-document window
    (languages-per-doc rows, never corpus-wide), a doc-keyed conditional
    aggregate, and a TakeOrderedAndProject top-{_MARGIN_TOPN} — per-partition
    heaps, no global sort. Margins are differences of exact integer
    micro-unit posteriors, so the selected set is deterministic for any
    partition count."""
    ranked = _nb_doc_posteriors(spark, sf_dir).withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy(
                F.col("post6").desc(), F.col("m").desc()
            )
        ),
    ).filter(F.col("rk") <= 2)
    perdoc = ranked.groupBy("doc_id").agg(
        F.any_value("lang_true").alias("lang"),
        F.max(F.when(F.col("rk") == 1, F.col("m"))).alias("pred_lang"),
        F.max(F.when(F.col("rk") == 2, F.col("m"))).alias("second_lang"),
        F.round(
            (
                F.max(F.when(F.col("rk") == 1, F.col("post6")))
                - F.max(F.when(F.col("rk") == 2, F.col("post6")))
            )
            / 1e6,
            6,
        ).alias("margin"),
    )
    return perdoc.orderBy(F.col("margin").asc(), F.col("doc_id").asc()).limit(
        _MARGIN_TOPN
    )


# ------------------------------- K-fold cross-validated NB (count subtraction)

_CV_FOLDS = 3


@query(
    "langid_nb_crossval",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang AS lang_true,
        CAST(doc_id % {_CV_FOLDS} AS BIGINT) AS fold,
        unnest(string_split(text, ' ')) AS t
      FROM documents
    ),
    langs AS (SELECT DISTINCT lang AS m FROM documents),
    vocab AS (SELECT DISTINCT t FROM toks),
    vsize AS (SELECT COUNT(*) AS v FROM vocab),
    cnt AS (SELECT t, lang_true AS m, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    cntf AS (
      SELECT t, lang_true AS m, fold, COUNT(*) AS cf
      FROM toks GROUP BY 1, 2, 3
    ),
    nl AS (SELECT lang_true AS m, COUNT(*) AS ntok FROM toks GROUP BY 1),
    nlf AS (
      SELECT lang_true AS m, fold, COUNT(*) AS ntokf
      FROM toks GROUP BY 1, 2
    ),
    nd AS (SELECT lang AS m, COUNT(*) AS ndocs FROM documents GROUP BY 1),
    ndf AS (
      SELECT lang AS m, CAST(doc_id % {_CV_FOLDS} AS BIGINT) AS fold,
        COUNT(*) AS ndocsf
      FROM documents GROUP BY 1, 2
    ),
    ntot AS (SELECT COUNT(*) AS n FROM documents),
    ntotf AS (
      SELECT CAST(doc_id % {_CV_FOLDS} AS BIGINT) AS fold, COUNT(*) AS nf
      FROM documents GROUP BY 1
    ),
    priorsf AS (
      SELECT nd.m, ntotf.fold,
        CAST(round(ln(
          CAST(nd.ndocs - COALESCE(ndf.ndocsf, 0) AS DOUBLE)
          / (ntot.n - ntotf.nf)) * 1e6) AS BIGINT) AS lprior6
      FROM nd CROSS JOIN ntotf CROSS JOIN ntot
      LEFT JOIN ndf ON ndf.m = nd.m AND ndf.fold = ntotf.fold
    ),
    doc_lang AS (
      SELECT toks.doc_id, toks.lang_true, toks.fold, langs.m,
        SUM(CAST(round(ln(
          (COALESCE(cnt.c, 0) - COALESCE(cntf.cf, 0) + 1.0)
          / (nl.ntok - COALESCE(nlf.ntokf, 0) + vsize.v)) * 1e6) AS BIGINT))
          AS ll6
      FROM toks
      CROSS JOIN langs
      CROSS JOIN vsize
      LEFT JOIN cnt ON cnt.t = toks.t AND cnt.m = langs.m
      LEFT JOIN cntf ON cntf.t = toks.t AND cntf.m = langs.m
        AND cntf.fold = toks.fold
      JOIN nl ON nl.m = langs.m
      LEFT JOIN nlf ON nlf.m = langs.m AND nlf.fold = toks.fold
      GROUP BY 1, 2, 3, 4
    ),
    ranked AS (
      SELECT doc_id, lang_true, doc_lang.fold, doc_lang.m,
        ROW_NUMBER() OVER (
          PARTITION BY doc_id
          ORDER BY (ll6 + priorsf.lprior6) DESC, doc_lang.m DESC
        ) AS rk
      FROM doc_lang
      JOIN priorsf ON priorsf.m = doc_lang.m AND priorsf.fold = doc_lang.fold
    )
    SELECT fold, COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN m = lang_true THEN 1 ELSE 0 END) AS BIGINT)
        AS n_correct,
      round(CAST(SUM(CASE WHEN m = lang_true THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*), 6) AS accuracy
    FROM ranked WHERE rk = 1
    GROUP BY 1
    """,
)
def langid_nb_crossval(spark, sf_dir):
    """K-fold cross-validated naive Bayes via SUFFICIENT-STATISTIC
    SUBTRACTION: instead of training {_CV_FOLDS} separate models, compute
    global token counts ONCE plus tiny per-fold counts, and score each
    document against (global - own fold) — the leave-fold-out model falls
    out of count arithmetic because NB's sufficient statistics are additive.
    Output: per-fold held-out accuracy (the honest generalization number
    the resubstitution `langid_naive_bayes` can't give).

    Scale shape: two count aggregates over the token stream (global and
    per-fold — the per-fold table is only K x the model size), then ONE
    scoring pass: token stream x languages with model-sized left joins; the
    smoothed leave-fold-out log-likelihood is computed at score time from
    the joined counts. No per-fold retraining scans, no corpus-sized
    intermediate keyed by fold. Deterministic: integer micro-unit rounding
    before the exact per-(doc,lang) sum, language-desc tie-break."""
    d = table(spark, sf_dir, "documents")
    fold = (F.col("doc_id") % _CV_FOLDS).cast("bigint")
    # Round-11 optimization, same recipe as _nb_doc_posteriors: fan the
    # tokenizer out of the one-task scan, collapse the instance stream
    # to per-(doc, fold, token) frequencies (AQE stage reuse shares the
    # collapse across branches), and reweight every
    # downstream integer statistic by tfreq — exact-count arithmetic, so
    # results are bit-identical to the per-instance form.
    toks = fanout(
        d.select(
            "doc_id", F.col("lang").alias("lang_true"), fold.alias("fold"), "text"
        ),
        "doc_id",
    ).select(
        "doc_id",
        "lang_true",
        "fold",
        F.explode(F.split("text", " ")).alias("t"),
    )
    tff = toks.groupBy("doc_id", "lang_true", "fold", "t").agg(
        F.count(F.lit(1)).alias("tfreq")
    )
    langs = d.select(F.col("lang").alias("m")).distinct()
    # Round-12 (guide §2.2/§2.3, the r11 type-table rollup recipe applied
    # to the fold marginals): per-(doc,token) rows cross ONE aggregation
    # into the vocabulary-sized cntf; cnt/nl/nlf/vsize are exact integer
    # rollups of it (c = Σ_folds cf; ntok = Σ_t c; ntokf = Σ_t cf;
    # distinct t sets agree) — previously each was its own corpus-sized
    # re-aggregation of tff inside a separate broadcast build.
    cntf = tff.groupBy("t", F.col("lang_true").alias("m"), "fold").agg(
        F.sum("tfreq").alias("cf")
    )
    cnt = cntf.groupBy("t", "m").agg(F.sum("cf").alias("c"))
    vsize = F.broadcast(
        cnt.select("t").distinct().agg(F.count(F.lit(1)).alias("v"))
    )
    nl = F.broadcast(cnt.groupBy("m").agg(F.sum("c").alias("ntok")))
    nlf = F.broadcast(
        cntf.groupBy("m", "fold").agg(F.sum("cf").alias("ntokf"))
    )
    nd = d.groupBy(F.col("lang").alias("m")).agg(
        F.count(F.lit(1)).alias("ndocs")
    )
    ndf = d.groupBy(F.col("lang").alias("m"), fold.alias("fold")).agg(
        F.count(F.lit(1)).alias("ndocsf")
    )
    ntot = d.agg(F.count(F.lit(1)).alias("n"))
    ntotf = d.groupBy(fold.alias("fold")).agg(F.count(F.lit(1)).alias("nf"))
    priorsf = F.broadcast(
        nd.crossJoin(ntotf)
        .crossJoin(ntot)
        .join(ndf, ["m", "fold"], "left")
        .select(
            "m",
            "fold",
            F.round(
                F.log(
                    (
                        F.col("ndocs") - F.coalesce(F.col("ndocsf"), F.lit(0))
                    ).cast("double")
                    / (F.col("n") - F.col("nf"))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("lprior6"),
        )
    )
    lp6 = (
        F.round(
            F.log(
                (
                    F.coalesce(F.col("c"), F.lit(0))
                    - F.coalesce(F.col("cf"), F.lit(0))
                    + F.lit(1.0)
                )
                / (
                    F.col("ntok")
                    - F.coalesce(F.col("ntokf"), F.lit(0))
                    + F.col("v")
                )
            )
            * 1e6
        )
        .cast("bigint")
    )
    doc_lang = (
        tff.crossJoin(F.broadcast(langs))
        .crossJoin(vsize)
        .join(cnt, ["t", "m"], "left")
        .join(cntf, ["t", "m", "fold"], "left")
        .join(nl, "m")
        .join(nlf, ["m", "fold"], "left")
        .groupBy("doc_id", "lang_true", "fold", "m")
        .agg(F.sum(F.col("tfreq") * lp6).alias("ll6"))
        .join(priorsf, ["m", "fold"])
    )
    ranked = doc_lang.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy(
                (F.col("ll6") + F.col("lprior6")).desc(), F.col("m").desc()
            )
        ),
    ).filter(F.col("rk") == 1)
    return ranked.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("m") == F.col("lang_true"), 1).otherwise(0)).alias(
            "n_correct"
        ),
        F.round(
            F.sum(
                F.when(F.col("m") == F.col("lang_true"), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("accuracy"),
    )


# --------------------------------- calibration improvement (ECE raw vs iso)


@query(
    "quality_calibration_improvement",
    oracle=f"""
    WITH scored AS (
      SELECT
        round(1.0 / (1.0 + exp(-((-3.0)
          + (0.9 * ln(1.0 + len(string_split(text, ' '))))
          + (-0.15 * (CAST(length(text) AS DOUBLE)
                      / len(string_split(text, ' '))))
          + (4.0 * (CAST(length(text)
              - length(regexp_replace(text, '[aeiou]', '', 'g')) AS DOUBLE)
              / length(text)))
          + (-6.0 * (CAST(length(text)
              - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
              / length(text)))))), 8) AS p,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    bins AS (
      SELECT least(CAST(floor(p * {_ISO_BINS}) AS BIGINT),
                   {_ISO_BINS - 1}) AS bin,
        COUNT(*) AS n_k, SUM(y) AS sy,
        SUM(CAST(p AS DECIMAL(28,12))) AS sp
      FROM scored GROUP BY 1
    ),
    intervals AS (
      SELECT i.bin AS lo, j.bin AS hi,
        round(CAST(SUM(m.sy) AS DOUBLE) / SUM(m.n_k), 8) AS wavg
      FROM bins i JOIN bins j ON i.bin <= j.bin
      JOIN bins m ON m.bin BETWEEN i.bin AND j.bin
      GROUP BY 1, 2
    ),
    inner_min AS (
      SELECT b.bin, iv.lo, MIN(iv.wavg) AS mn
      FROM bins b JOIN intervals iv ON iv.lo <= b.bin AND iv.hi >= b.bin
      GROUP BY 1, 2
    ),
    fit AS (SELECT bin, MAX(mn) AS iso_rate FROM inner_min GROUP BY 1),
    terms AS (
      SELECT bins.n_k,
        CAST(round(bins.n_k * abs(
          round(CAST(bins.sp AS DOUBLE) / bins.n_k, 8)
          - round(CAST(bins.sy AS DOUBLE) / bins.n_k, 8)), 6)
          AS DECIMAL(28,6)) AS raw_term,
        CAST(round(bins.n_k * abs(
          fit.iso_rate
          - round(CAST(bins.sy AS DOUBLE) / bins.n_k, 8)), 6)
          AS DECIMAL(28,6)) AS iso_term
      FROM bins JOIN fit ON fit.bin = bins.bin
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
      round(CAST(SUM(raw_term) AS DOUBLE) / SUM(n_k), 8) AS ece_raw,
      round(CAST(SUM(iso_term) AS DOUBLE) / SUM(n_k), 8) AS ece_iso,
      round(CAST(SUM(raw_term) AS DOUBLE) / SUM(n_k)
            - CAST(SUM(iso_term) AS DOUBLE) / SUM(n_k), 8) AS ece_reduction
    FROM terms
    """,
)
def quality_calibration_improvement(spark, sf_dir):
    """The "so what" of calibration: expected calibration error (ECE) of
    the raw logistic quality score vs the isotonic-calibrated score, over
    the same 10 bins as quality_isotonic_calibration. ECE_raw weights each
    bin's |mean predicted p - realized rate|; after the isotonic map the
    bin's prediction IS the fitted rate, so ECE_iso measures what the PAV
    fit cannot explain (it is 0 when the fit is free to match every bin —
    nonzero exactly where monotonicity binds, i.e. where pooling merged
    violator bins).

    Scale shape: one corpus aggregate to 10 bins (with an extra exact
    decimal sum of p per bin), the same O(B^3) declarative minimax on the
    bin table, and a 10-row rollup. Per-bin terms are rounded then
    decimal-summed, so both engines report identical ECEs."""
    from .scoring import quality_score_col

    d = table(spark, sf_dir, "documents")
    rows_ = d.select(
        quality_score_col().alias("p"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    bins = rows_.groupBy(
        F.least(
            F.floor(F.col("p") * _ISO_BINS).cast("bigint"),
            F.lit(_ISO_BINS - 1).cast("bigint"),
        ).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n_k"),
        F.sum("y").alias("sy"),
        F.sum(F.col("p").cast("decimal(28,12)")).alias("sp"),
    )
    i = bins.select(F.col("bin").alias("lo"))
    j = bins.select(F.col("bin").alias("hi"))
    m = bins.select(
        F.col("bin").alias("mb"), F.col("n_k").alias("mn_k"), F.col("sy").alias("msy")
    )
    intervals = (
        i.join(j, F.col("lo") <= F.col("hi"))
        .join(m, (F.col("mb") >= F.col("lo")) & (F.col("mb") <= F.col("hi")))
        .groupBy("lo", "hi")
        .agg(F.round(F.sum("msy").cast("double") / F.sum("mn_k"), 8).alias("wavg"))
    )
    inner_min = (
        bins.select("bin")
        .join(
            intervals,
            (F.col("lo") <= F.col("bin")) & (F.col("hi") >= F.col("bin")),
        )
        .groupBy("bin", "lo")
        .agg(F.min("wavg").alias("mn"))
    )
    fit = inner_min.groupBy("bin").agg(F.max("mn").alias("iso_rate"))
    raw_rate = F.round(F.col("sy").cast("double") / F.col("n_k"), 8)
    mean_p = F.round(F.col("sp").cast("double") / F.col("n_k"), 8)
    terms = bins.join(fit, "bin").select(
        "n_k",
        F.round(F.col("n_k") * F.abs(mean_p - raw_rate), 6)
        .cast("decimal(28,6)")
        .alias("raw_term"),
        F.round(F.col("n_k") * F.abs(F.col("iso_rate") - raw_rate), 6)
        .cast("decimal(28,6)")
        .alias("iso_term"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.round(F.sum("raw_term").cast("double") / F.sum("n_k"), 8).alias("ece_raw"),
        F.round(F.sum("iso_term").cast("double") / F.sum("n_k"), 8).alias("ece_iso"),
        F.round(
            F.sum("raw_term").cast("double") / F.sum("n_k")
            - F.sum("iso_term").cast("double") / F.sum("n_k"),
            8,
        ).alias("ece_reduction"),
    )


# ----------------------------------------- confident-learning label noise


@query(
    "label_confident_joint",
    oracle="WITH "
    + _NB_POST_SQL
    + """
    , mx AS (
      SELECT doc_id, lang_true, MAX(post6) AS mx6 FROM post
      GROUP BY doc_id, lang_true
    ),
    r AS (
      SELECT p.doc_id, p.lang_true, p.m,
        CAST(round(exp((p.post6 - mx.mx6) / 1e6) * 1e6) AS BIGINT) AS r6
      FROM post p JOIN mx USING (doc_id, lang_true)
    ),
    s AS (SELECT doc_id, CAST(SUM(r6) AS BIGINT) AS s6 FROM r GROUP BY doc_id),
    conf AS (
      SELECT r.doc_id, r.lang_true, r.m,
        CAST(r.r6 * 1000000 // s.s6 AS BIGINT) AS c6
      FROM r JOIN s USING (doc_id)
    ),
    thr AS (
      SELECT m, CAST(SUM(c6) AS BIGINT) AS sum_c6,
        CAST(COUNT(*) AS BIGINT) AS n_m
      FROM conf WHERE lang_true = m GROUP BY m
    ),
    hits AS (
      SELECT c.doc_id, c.lang_true, c.m, c.c6
      FROM conf c JOIN thr t USING (m)
      WHERE c.c6 * t.n_m >= t.sum_c6
    ),
    pick AS (
      SELECT doc_id, lang_true, m AS pred_lang,
        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c6 DESC, m) AS rn
      FROM hits
    )
    SELECT lang_true AS noisy_lang, pred_lang,
      CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pick WHERE rn = 1
    GROUP BY noisy_lang, pred_lang
    """,
)
def label_confident_joint(spark, sf_dir):
    """Confident-learning joint count matrix (Northcutt et al.'s cleanlab
    estimator): per-class confidence thresholds t_j = mean self-confidence
    of docs LABELED j, then each document is assigned to the class it
    exceeds the threshold for most confidently; the (noisy_label,
    confident_label) count matrix's off-diagonal mass estimates the label
    error rate per class pair — the audit run before trusting any labeled
    split.

    Determinism engineering: NB posteriors convert to micro-unit integer
    confidences c6 = floor(softmax * 1e6) (per-term exp rounded once), and
    the threshold test is the INTEGER cross-multiplication
    c6 * n_j >= sum_c6_j — no mean is ever materialized as a float, so the
    gate cannot tie-flake. Scale shape: one posterior grid (the shared NB
    kernel), two bounded aggregates (per-class thresholds, the k x k
    joint), one doc-partitioned argmax over <= |langs| rows per doc."""
    # persist: the posterior grid feeds four branches (mx, r, thr via
    # conf, hits) — without it the NB kernel's token/grid subtree re-runs
    # per branch (86-exchange plan; with reuse it collapses to the kernel
    # once + bounded rollups)
    post = _nb_doc_posteriors(spark, sf_dir).persist()
    mx = post.groupBy("doc_id", "lang_true").agg(F.max("post6").alias("mx6"))
    r = post.join(mx, ["doc_id", "lang_true"]).select(
        "doc_id",
        "lang_true",
        "m",
        F.round(F.exp((F.col("post6") - F.col("mx6")) / F.lit(1e6)) * 1e6)
        .cast("bigint")
        .alias("r6"),
    )
    r = r.persist()
    s = r.groupBy("doc_id").agg(F.sum("r6").cast("bigint").alias("s6"))
    conf = r.join(s, "doc_id").select(
        "doc_id",
        "lang_true",
        "m",
        F.floor(F.col("r6") * F.lit(1000000) / F.col("s6"))
        .cast("bigint")
        .alias("c6"),
    )
    thr = F.broadcast(
        conf.filter(F.col("lang_true") == F.col("m"))
        .groupBy("m")
        .agg(
            F.sum("c6").cast("bigint").alias("sum_c6"),
            F.count(F.lit(1)).cast("bigint").alias("n_m"),
        )
    )
    conf = conf.persist()
    hits = conf.join(thr, "m").filter(
        F.col("c6") * F.col("n_m") >= F.col("sum_c6")
    )
    pick = (
        hits.groupBy("doc_id", "lang_true")
        .agg(
            F.min(F.struct((-F.col("c6")).alias("nc"), F.col("m"))).alias("p")
        )
        .select("lang_true", F.col("p.m").alias("pred_lang"))
    )
    return pick.groupBy(
        F.col("lang_true").alias("noisy_lang"), "pred_lang"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))


# --------------------------------------------- temperature scaling


TEMP_GRID_PCT = tuple(range(50, 301, 25))  # temperatures as integer percent


@query(
    "quality_temperature_scaling",
    oracle=None,  # set below: reuses scoring's shared CTE
)
def quality_temperature_scaling(spark, sf_dir):
    """Temperature scaling of the quality classifier (Guo et al.'s
    one-parameter calibration): sweep T over a fixed grid, rescale the
    logit z/T, and report each temperature's exact-integer NLL against
    the is-English label with the argmin flagged (ties to the smaller T).
    The parametric sibling of quality_isotonic_calibration — one number
    to deploy instead of a bin table, and the standard first fix when a
    model is systematically over/under-confident.

    Determinism engineering: logits are rounded once (8 dp) from the
    clamped frozen score, each per-(doc, T) NLL term is rounded to
    micro-units and summed as exact BIGINTs, so the sweep is
    bit-identical at any partition count. Scale shape: one corpus scan
    exploded by the |grid| broadcast (map-side), one bounded aggregate
    per T, argmin over |grid| rows."""
    from .scoring import quality_score_col

    d = table(spark, sf_dir, "documents")
    p = quality_score_col()
    pc = F.greatest(F.least(p, F.lit(0.999999)), F.lit(0.000001))
    base = d.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        F.round(F.log(pc / (1 - pc)), 8).alias("z"),
    )
    grid = spark.createDataFrame([(t,) for t in TEMP_GRID_PCT], "t_pct int")
    pT = 1.0 / (1.0 + F.exp(-F.col("z") * 100.0 / F.col("t_pct")))
    nll6 = F.round(
        -(
            F.col("y") * F.log(F.greatest(pT, F.lit(1e-12)))
            + (1 - F.col("y")) * F.log(F.greatest(1.0 - pT, F.lit(1e-12)))
        )
        * 1e6
    ).cast("bigint")
    agg = (
        base.crossJoin(F.broadcast(grid))
        .select("t_pct", nll6.alias("nll6"))
        .groupBy("t_pct")
        .agg(F.sum("nll6").cast("bigint").alias("nll_e6"))
        .persist()
    )
    best = F.broadcast(agg.agg(F.min("nll_e6").alias("m")))
    bestt = F.broadcast(
        agg.crossJoin(best)
        .filter(F.col("nll_e6") == F.col("m"))
        .agg(F.min("t_pct").alias("bt"))
    )
    return agg.crossJoin(bestt).select(
        "t_pct", "nll_e6", (F.col("t_pct") == F.col("bt")).alias("is_best")
    )


def _register_temp_oracle():
    from ..plans.registry import ORACLES
    from .scoring import _SCORED_SQL

    grid = ", ".join(map(str, TEMP_GRID_PCT))
    ORACLES["quality_temperature_scaling"] = f"""
    WITH {_SCORED_SQL},
    base AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        round(ln(greatest(least(quality_score, 0.999999), 0.000001)
          / (1 - greatest(least(quality_score, 0.999999), 0.000001))), 8)
          AS z
      FROM scored
    ),
    grid AS (SELECT UNNEST([{grid}]) AS t_pct),
    terms AS (
      SELECT grid.t_pct,
        CAST(round(
          -(y * ln(greatest(1.0 / (1.0 + exp(-z * 100.0 / grid.t_pct)), 1e-12))
            + (1 - y) * ln(greatest(
                1.0 - 1.0 / (1.0 + exp(-z * 100.0 / grid.t_pct)), 1e-12)))
          * 1e6) AS BIGINT) AS nll6
      FROM base CROSS JOIN grid
    ),
    agg AS (
      SELECT CAST(t_pct AS INTEGER) AS t_pct,
        CAST(SUM(nll6) AS BIGINT) AS nll_e6
      FROM terms GROUP BY t_pct
    ),
    best AS (SELECT MIN(nll_e6) AS m FROM agg)
    SELECT agg.t_pct, agg.nll_e6,
      agg.nll_e6 = best.m AND agg.t_pct = (
        SELECT MIN(a2.t_pct) FROM agg a2, best b2 WHERE a2.nll_e6 = b2.m
      ) AS is_best
    FROM agg CROSS JOIN best
    """


_register_temp_oracle()


# ------------------------------- split-conformal language prediction sets

CONF_ALPHA = 0.1  # target 90% coverage
CONF_CAL_HEX = ("0", "1", "2", "3")  # md5 first hex -> 25% calibration slice


@query(
    "langid_conformal_sets",
    oracle=f"""
    WITH {{nb}},
    mx AS (SELECT doc_id, MAX(post6) AS mx FROM post GROUP BY doc_id),
    cal AS (
      SELECT p.doc_id, m.mx - p.post6 AS s
      FROM post p JOIN mx m USING (doc_id)
      WHERE p.m = p.lang_true
        AND substr(md5('conf:' || CAST(p.doc_id AS VARCHAR)), 1, 1)
            IN {CONF_CAL_HEX}
    ),
    ncal AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cal),
    qi AS (
      SELECT n,
        CAST(least(CAST(ceil((n + 1) * {1 - CONF_ALPHA}) AS BIGINT), n)
             AS BIGINT) AS qidx
      FROM ncal
    ),
    vc AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS cnt FROM cal GROUP BY s
    ),
    cum AS (
      SELECT s, SUM(cnt) OVER (ORDER BY s
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cnt
      FROM vc
    ),
    qh AS (
      SELECT CAST(MIN(s) AS BIGINT) AS qhat
      FROM cum CROSS JOIN qi WHERE cum_cnt >= qi.qidx
    ),
    ev AS (
      SELECT p.doc_id, p.lang_true,
        CAST(SUM(CASE WHEN m.mx - p.post6 <= qh.qhat THEN 1 ELSE 0 END)
             AS BIGINT) AS set_size,
        MAX(CASE WHEN p.m = p.lang_true AND m.mx - p.post6 <= qh.qhat
            THEN 1 ELSE 0 END) AS covered
      FROM post p JOIN mx m USING (doc_id) CROSS JOIN qh
      WHERE substr(md5('conf:' || CAST(p.doc_id AS VARCHAR)), 1, 1)
            NOT IN {CONF_CAL_HEX}
      GROUP BY p.doc_id, p.lang_true
    )
    SELECT qi.n AS n_cal, qh.qhat AS qhat_e6,
      CAST(COUNT(*) AS BIGINT) AS n_eval,
      CAST(SUM(covered) AS BIGINT) AS n_covered,
      CAST(SUM(set_size) AS BIGINT) AS sum_set_size
    FROM ev CROSS JOIN qi CROSS JOIN qh
    GROUP BY qi.n, qh.qhat
    """.format(nb=_NB_POST_SQL),
)
def langid_conformal_sets(spark, sf_dir):
    """Split-conformal prediction sets for the NB language classifier —
    the distribution-free calibration recipe (Vovk; Angelopoulos & Bates
    '21) that turns ANY scorer into sets with finite-sample coverage:
    nonconformity = (max-class log-posterior - true-class log-posterior)
    in exact integer micro-units; qhat = the ceil((n+1)(1-alpha))-th
    smallest calibration score (clamped to n); an eval doc's prediction
    set = every language within qhat of its argmax. Reported: calibration
    size, the integer threshold, and eval coverage + total set size —
    coverage ~>= {1 - CONF_ALPHA:.0%} by the conformal guarantee (up to
    the documented caveat that this NB is corpus-fit, so calibration
    scores are slightly optimistic — the audit demonstrates the conformal
    MECHANICS on exact integers; a production run fits the scorer on a
    disjoint slice).

    Scale shape: scores ride the shared NB posterior kernel; the q-th
    order statistic comes from value-count aggregation + the bucketed
    prefix-sum kernel (never a global sort of the calibration slice);
    set construction is one aggregate over the (doc, lang) posterior
    grid. Everything hashed is an exact BIGINT."""
    from ..functions.prefix import bucketed_prefix_sums

    post = _nb_doc_posteriors(spark, sf_dir).persist()
    is_cal = F.substring(
        F.md5(F.concat(F.lit("conf:"), F.col("doc_id").cast("string"))), 1, 1
    ).isin(*CONF_CAL_HEX)
    # round-12: mx via a window over the doc partition (one exchange on
    # the cached posterior grid) instead of groupBy + self-join (two
    # exchanges + a join); same max over the same 5-row groups.
    scored = (
        post.withColumn("mx", F.max("post6").over(W.partitionBy("doc_id")))
        .withColumn("is_cal", is_cal)
        .persist()
    )
    cal = scored.filter(
        (F.col("m") == F.col("lang_true")) & F.col("is_cal")
    ).select("doc_id", (F.col("mx") - F.col("post6")).alias("s"))
    # round-12: persist the value-count table — it is bounded by the
    # nonconformity score RANGE (integer micro-units), not the corpus,
    # and it feeds four separate broadcast-build executions (the range
    # probe + bucket offsets inside bucketed_prefix_sums, the qidx
    # aggregate, and the qhat scan); without the persist each build
    # re-aggregated the calibration slice (guide §5).
    vc = (
        cal.groupBy("s")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist()
    )
    # n_cal = sum of value counts — exact integer identity with
    # count(cal), read from the tiny cached vc instead of re-scanning
    # the calibration slice.
    qi = F.broadcast(
        vc.agg(F.sum("cnt").cast("bigint").alias("n")).select(
            "n",
            F.least(
                F.ceil((F.col("n") + 1) * F.lit(1 - CONF_ALPHA)).cast("bigint"),
                F.col("n"),
            ).alias("qidx"),
        )
    )
    cum = bucketed_prefix_sums(vc, "s", ["cnt"])
    qh = F.broadcast(
        cum.crossJoin(qi)
        .filter(F.col("cum_cnt") >= F.col("qidx"))
        .agg(F.min("s").cast("bigint").alias("qhat"))
    )
    ev = (
        scored.filter(~F.col("is_cal"))
        .crossJoin(qh)
        .groupBy("doc_id", "lang_true")
        .agg(
            F.sum(
                ((F.col("mx") - F.col("post6")) <= F.col("qhat")).cast("int")
            )
            .cast("bigint")
            .alias("set_size"),
            F.max(
                (
                    (F.col("m") == F.col("lang_true"))
                    & ((F.col("mx") - F.col("post6")) <= F.col("qhat"))
                ).cast("int")
            ).alias("covered"),
        )
    )
    return (
        ev.crossJoin(qi)
        .crossJoin(qh)
        .groupBy(F.col("n").alias("n_cal"), F.col("qhat").alias("qhat_e6"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.sum("covered").cast("bigint").alias("n_covered"),
            F.sum("set_size").cast("bigint").alias("sum_set_size"),
        )
    )
