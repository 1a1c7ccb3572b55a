"""Data-selection operators (driver mandate; beyond the reference's I/O-only
surface — /root/reference/src/QuackIO.jl): the "which documents go into the
training mix" stages of an LLM data pipeline that act on corpus-level
statistics rather than per-document heuristics (those live in scoring.py /
text.py):

- DSIR importance weights (Xie et al. 2023, "Data Selection for Language
  Models via Importance Resampling"): hashed bag-of-ngram likelihood ratio
  between a target domain and the raw corpus.
- Lexicon blocklist filtering (the C4 "badwords" stage): weighted term
  lists joined map-side against the token stream.
- Boilerplate scrub (CCNet line-level dedup): drop passages that repeat
  across many documents, report per-document removal fractions.
- Fuzzy decontamination: n-gram containment of benchmark documents inside
  training documents (the thresholded variant of the exact shared-gram
  check in pipeline.contamination_check).

All hashes are md5-based so the DuckDB oracles reproduce every value
bit-for-bit; all ratio-style scores are summed as scaled integers so the
result is independent of floating-point accumulation order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.fanout import fanout
from ..lineage import audit_mode, audit_rounds, truncate as _truncate_lineage
from ..plans.registry import query, table
from .dedup import _PARA_SEGS_SQL, _para_segments

# --------------------------------------------------------------- DSIR

# Hashed-feature importance resampling: bucket every token occurrence into
# DSIR_BUCKETS hashed bins, estimate the target-domain distribution p and the
# raw-corpus distribution q over bins (Laplace-smoothed), and score each
# document by the log importance weight sum_tokens ln(p_b / q_b). The target
# domain here is the English slice (`lang = 'en'`) — standing in for "quality
# reference corpus" (Wikipedia/books in the paper); swapping the target is a
# one-line filter change.
DSIR_BUCKETS = 128
DSIR_TARGET_LANG = "en"


@query(
    "dsir_importance_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
        CAST(('0x' || substr(md5('ds:' || t), 1, 4)) AS BIGINT)
          % {DSIR_BUCKETS} AS b
      FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
            FROM documents)
    ),
    raw AS (SELECT b, COUNT(*) AS cr FROM toks GROUP BY b),
    tgt AS (SELECT b, COUNT(*) AS ct FROM toks
            WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b),
    tot AS (
      SELECT (SELECT COUNT(*) FROM toks) AS r_total,
             (SELECT COUNT(*) FROM toks
              WHERE lang = '{DSIR_TARGET_LANG}') AS t_total
    ),
    lr AS (
      SELECT raw.b,
        CAST(round(ln(
          ((COALESCE(ct, 0) + 1.0) / (t_total + {DSIR_BUCKETS}))
          / ((cr + 1.0) / (r_total + {DSIR_BUCKETS}))
        ) * 1e6) AS BIGINT) AS lr6
      FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot
    )
    SELECT doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_toks,
      round(SUM(lr6) / 1e6, 6) AS log_iw
    FROM toks JOIN lr USING (b)
    GROUP BY doc_id
    """,
)
def dsir_importance_weights(spark, sf_dir):
    """Per-document DSIR log importance weight over hashed unigram features.

    Scale shape: the feature table is DSIR_BUCKETS rows no matter the corpus
    size — two tiny aggregates (target & raw bin counts) build it, it
    broadcasts back onto the token stream, and the only corpus-sized shuffle
    is the per-document sum. The per-bucket log-ratio is rounded once and
    scaled to an integer, so each document's sum is exact (no accumulation-
    order drift between engines).

    Round-11: the hashed token stream (four consuming branches) fans
    out of the one-task single-row-group scan so the explode + md5
    bucketing runs in parallel."""
    d = table(spark, sf_dir, "documents")
    toks = fanout(d.select("doc_id", "lang", "text"), "doc_id").select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("t"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("ds:"), F.col("t"))), 1, 4), 16, 10)
            .cast("bigint")
            % DSIR_BUCKETS
        ).alias("b"),
    )
    raw = toks.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        toks.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tot = toks.agg(
        F.count(F.lit(1)).alias("r_total"),
        F.count(F.when(F.col("lang") == DSIR_TARGET_LANG, 1)).alias("t_total"),
    )
    p = (F.coalesce(F.col("ct"), F.lit(0)) + 1.0) / (F.col("t_total") + DSIR_BUCKETS)
    q = (F.col("cr") + 1.0) / (F.col("r_total") + DSIR_BUCKETS)
    lr = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select("b", F.round(F.log(p / q) * 1e6).cast("bigint").alias("lr6"))
    )
    return (
        toks.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.round(F.sum("lr6") / 1e6, 6).alias("log_iw"),
        )
    )


# ---------------------------------------------------------- blocklist

# Weighted lexicon filter (the C4 badwords stage, generalized to severity
# weights). Weights are stored as exact micro-units so per-document sums are
# integers. Terms chosen from the synthetic vocabulary so the keep/drop split
# is non-trivial at test scale; a production list is the same broadcast join.
BLOCKLIST = [("slow", 1_000_000), ("big", 500_000), ("hash", 250_000)]
BLOCK_THRESHOLD = 0.035  # flag_score >= threshold -> drop


@query(
    "blocklist_filter_report",
    oracle=f"""
    WITH lex(tok, w6) AS (VALUES {", ".join(f"('{t}', {w})" for t, w in BLOCKLIST)}),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    )
    SELECT doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_toks,
      CAST(COUNT(w6) AS BIGINT) AS n_flagged,
      round(COALESCE(SUM(w6), 0) / 1e6 / COUNT(*), 8) AS flag_score,
      CASE WHEN round(COALESCE(SUM(w6), 0) / 1e6 / COUNT(*), 8)
                < {BLOCK_THRESHOLD} THEN TRUE ELSE FALSE END AS keep
    FROM toks LEFT JOIN lex USING (tok)
    GROUP BY doc_id
    """,
)
def blocklist_filter_report(spark, sf_dir):
    """Per-document weighted blocklist hit report + keep/drop decision.

    Scale shape: the lexicon (thousands of rows in production) broadcasts;
    the token stream never shuffles on the term — the only corpus-sized
    exchange is the per-document aggregate. Severity weights are integer
    micro-units so the score is exact before the single rounding."""
    d = table(spark, sf_dir, "documents")
    lex = spark.createDataFrame(BLOCKLIST, "tok string, w6 long")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    score = F.round(
        F.coalesce(F.sum("w6"), F.lit(0)) / F.lit(1e6) / F.count(F.lit(1)), 8
    )
    return (
        toks.join(F.broadcast(lex), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.count("w6").alias("n_flagged"),
            score.alias("flag_score"),
            (score < F.lit(BLOCK_THRESHOLD)).alias("keep"),
        )
    )


# ---------------------------------------------------- boilerplate scrub

# CCNet-style passage scrub: a segment (PARA_TOKENS-token window, same
# segmentation as dedup.dedup_paragraphs) is boilerplate when it occurs in
# at least SCRUB_MIN_DOCS distinct documents; ALL its occurrences are
# dropped (unlike dedup_paragraphs, which keeps a canonical copy). The
# report is what a corpus owner reads to calibrate the threshold.
SCRUB_MIN_DOCS = 3


@query(
    "boilerplate_scrub_report",
    oracle=_PARA_SEGS_SQL
    + f"""
    , freq AS (
      SELECT seg_hash, COUNT(DISTINCT doc_id) AS n_docs
      FROM segs GROUP BY seg_hash
    )
    SELECT s.doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_segments,
      CAST(COUNT(CASE WHEN f.n_docs >= {SCRUB_MIN_DOCS} THEN 1 END)
           AS BIGINT) AS n_scrubbed,
      round(COUNT(CASE WHEN f.n_docs >= {SCRUB_MIN_DOCS} THEN 1 END)
            * 1.0 / COUNT(*), 8) AS frac_scrubbed
    FROM segs s JOIN freq f USING (seg_hash)
    GROUP BY s.doc_id
    """,
)
def boilerplate_scrub_report(spark, sf_dir):
    """Per-document boilerplate removal report: segments whose corpus-wide
    document frequency reaches SCRUB_MIN_DOCS are scrubbed everywhere.

    Scale shape: two shuffles on 16-byte segment hashes (document-frequency
    aggregate, then the join back) plus the per-document aggregate — the
    segment table carries hashes, never passage text. The frequency side is
    heavy-hitter-only in practice; at 100 TB, pre-filter it to
    n_docs >= threshold before the join so the broadcast/shuffle side
    shrinks to the boilerplate set."""
    segs = _para_segments(spark, sf_dir)
    freq = segs.groupBy("seg_hash").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    scrubbed = F.count(F.when(F.col("n_docs") >= SCRUB_MIN_DOCS, 1))
    return (
        segs.join(freq, "seg_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            scrubbed.alias("n_scrubbed"),
            F.round(scrubbed * 1.0 / F.count(F.lit(1)), 8).alias("frac_scrubbed"),
        )
    )


# ------------------------------------------------ fuzzy decontamination

# Thresholded containment decontamination: score (train, bench) pairs by the
# fraction of the benchmark document's shingles the training document
# contains — catching paraphrased/partial leakage the exact shared-gram
# count (pipeline.contamination_check) only tallies. Shingles are shorter
# than contamination_check's (4 vs 8 tokens) because containment is a
# soft-overlap measure: short shingles trade precision for recall, and the
# threshold flag restores precision.
CONTAM_K = 4
CONTAIN_THRESHOLD = 0.05

_CONTAM_GRAMS_SQL = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= {CONTAM_K}
    ),
    grams AS (
      SELECT DISTINCT doc_id,
        substr(md5(array_to_string(t[i+1:i+{CONTAM_K}], ' ')), 1, 16) AS h
      FROM toks, UNNEST(range(len(t) - {CONTAM_K - 1})) AS u(i)
    )
"""


@query(
    "decontamination_containment",
    oracle=_CONTAM_GRAMS_SQL
    + f"""
    , bench AS (SELECT doc_id AS bench_doc, h FROM grams WHERE doc_id % 50 = 0),
    btot AS (SELECT bench_doc, COUNT(*) AS n_bench FROM bench GROUP BY bench_doc),
    train AS (SELECT doc_id AS train_doc, h FROM grams WHERE doc_id % 50 <> 0),
    shared AS (
      SELECT train_doc, bench_doc, COUNT(*) AS n_shared
      FROM train JOIN bench USING (h)
      GROUP BY train_doc, bench_doc
    )
    SELECT train_doc, bench_doc, n_shared,
      round(n_shared * 1.0 / n_bench, 8) AS containment,
      CASE WHEN n_shared * 1.0 / n_bench >= {CONTAIN_THRESHOLD}
           THEN TRUE ELSE FALSE END AS flagged
    FROM shared JOIN btot USING (bench_doc)
    """,
)
def decontamination_containment(spark, sf_dir):
    """Every (train, bench) candidate pair with its shingle-containment
    score, flagged when the train document covers >= CONTAIN_THRESHOLD of
    the benchmark document's distinct shingles.

    Scale shape: identical to contamination_check — the benchmark gram set
    (a few MB for any real eval suite) broadcasts twice (grams + per-bench
    totals); the corpus is scanned once map-side and shuffles only into the
    per-pair count. Containment (n_shared / |bench|) is the right
    asymmetric measure: benchmark docs are short, training docs long."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= CONTAM_K
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - CONTAM_K),
                lambda i: F.substring(
                    F.md5(F.concat_ws(" ", F.slice("t", i + 1, CONTAM_K))), 1, 16
                ),
            )
        ).alias("h"),
    ).distinct()
    bench = grams.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_doc"), "h"
    )
    btot = bench.groupBy("bench_doc").agg(F.count(F.lit(1)).alias("n_bench"))
    train = grams.filter(F.col("doc_id") % 50 != 0).select(
        F.col("doc_id").alias("train_doc"), "h"
    )
    shared = (
        train.join(F.broadcast(bench), "h")
        .groupBy("train_doc", "bench_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    contain = F.col("n_shared") * 1.0 / F.col("n_bench")
    return shared.join(F.broadcast(btot), "bench_doc").select(
        "train_doc",
        "bench_doc",
        "n_shared",
        F.round(contain, 8).alias("containment"),
        (contain >= F.lit(CONTAIN_THRESHOLD)).alias("flagged"),
    )


# ------------------------------------------------------- DoReMi reweighting

# One deterministic DoReMi multiplicative-weights step (Xie et al. 2023,
# "DoReMi: Optimizing Data Mixtures Speeds Up Language Model Pretraining").
# The paper's "excess loss" of a domain (how much worse the generalist
# reference model does there) is proxied by the KL divergence of the
# domain's unigram token distribution from the corpus-wide distribution —
# closed-form, so the DuckDB oracle reproduces it exactly. Domain weights:
# w_s  proportional to  u_s * exp(eta * KL_s)  with a uniform baseline u and
# eta = 1 (the uniform u cancels in the normalization).
DOREMI_ETA = 1.0


@query(
    "doremi_domain_weights",
    oracle="""
    WITH st AS (
      SELECT source, t AS tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT source, unnest(string_split(text, ' ')) AS t
            FROM documents)
      GROUP BY source, t
    ),
    stot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM st GROUP BY source),
    tk AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS c_t FROM st GROUP BY tok),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM st),
    terms AS (
      SELECT st.source,
        CAST(round((CAST(c AS DOUBLE) / n_s)
          * ln((CAST(c AS DOUBLE) / n_s) / (CAST(c_t AS DOUBLE) / n)), 12)
          AS DECIMAL(38,14)) AS term
      FROM st JOIN stot USING (source) JOIN tk USING (tok) CROSS JOIN tot
    ),
    kl AS (
      SELECT source, round(CAST(SUM(term) AS DOUBLE), 8) AS kl_nats
      FROM terms GROUP BY source
    ),
    ew AS (
      SELECT source, kl_nats,
        CAST(round(exp(kl_nats), 10) AS DECIMAL(38,12)) AS e10
      FROM kl
    ),
    z AS (SELECT SUM(e10) AS z FROM ew)
    SELECT source, CAST(n_s AS BIGINT) AS n_toks, kl_nats,
      round(CAST(e10 AS DOUBLE) / CAST(z AS DOUBLE), 8) AS weight
    FROM ew JOIN stot USING (source) CROSS JOIN z
    """,
)
def doremi_domain_weights(spark, sf_dir):
    """Per-source DoReMi-step mixture weights from unigram-KL excess loss.

    Scale shape: the only corpus-sized work is the (source, token) count
    aggregate; everything downstream is bounded by |sources| x |vocab| and
    collapses to |sources| rows before the scalar normalizer attaches by
    broadcast. Per-term KL contributions are rounded then decimal-summed
    (order-independent), the same recipe as source_js_divergence."""
    d = table(spark, sf_dir, "documents")
    st = (
        d.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    stot = st.groupBy("source").agg(F.sum("c").cast("bigint").alias("n_s"))
    tk = st.groupBy("tok").agg(F.sum("c").cast("bigint").alias("c_t"))
    tot = st.agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c").cast("double") / F.col("n_s")
    q = F.col("c_t").cast("double") / F.col("n")
    terms = (
        st.join(F.broadcast(stot), "source")
        .join(tk, "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.round(p * F.log(p / q), 12).cast("decimal(38,14)").alias("term"),
        )
    )
    kl = terms.groupBy("source").agg(
        F.round(F.sum("term").cast("double"), 8).alias("kl_nats")
    )
    ew = kl.select(
        "source",
        "kl_nats",
        F.round(F.exp(F.col("kl_nats") * DOREMI_ETA), 10)
        .cast("decimal(38,12)")
        .alias("e10"),
    )
    z = ew.agg(F.sum("e10").alias("z"))
    return (
        ew.join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(z))
        .select(
            "source",
            F.col("n_s").alias("n_toks"),
            "kl_nats",
            F.round(
                F.col("e10").cast("double") / F.col("z").cast("double"), 8
            ).alias("weight"),
        )
    )


# ------------------------------------------- data-constrained epoch planning

# Muennighoff et al. 2023 ("Scaling Data-Constrained Language Models"):
# repeating data decays in value; the effective unique-token count of a
# budget spent as R repetitions over U unique tokens is
#   D_eff = U + U * R* * (1 - exp(-R / R*)),   R* ~ 15 epochs (fitted).
# The planner splits a total token budget across sources by T=2 temperature
# weights (small sources repeat more) and reports, per source, the epoch
# count, the effective tokens, and whether it has hit diminishing returns.
BUDGET_MULT = 4  # total budget = 4x the corpus's unique tokens
R_STAR = 15.0
EFFICIENCY_FLOOR = 0.75


@query(
    "token_budget_epoch_plan",
    oracle=f"""
    WITH src AS (
      SELECT source,
        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS u_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(u_tokens) AS BIGINT) AS u FROM src),
    w AS (
      SELECT source, u_tokens, u,
        sqrt(CAST(u_tokens AS DOUBLE) / u) AS w_raw
      FROM src CROSS JOIN tot
    ),
    z AS (SELECT SUM(w_raw) AS z FROM w),
    alloc AS (
      SELECT source, u_tokens,
        CAST(floor({BUDGET_MULT} * u * round(w_raw / z, 8) ) AS BIGINT)
          AS budget_tokens
      FROM w CROSS JOIN z
    ),
    plan AS (
      SELECT source, u_tokens, budget_tokens,
        round(CAST(budget_tokens AS DOUBLE) / u_tokens, 6) AS epochs,
        greatest(round(CAST(budget_tokens AS DOUBLE) / u_tokens - 1, 8), 0)
          AS r8
      FROM alloc
    )
    SELECT source, u_tokens, budget_tokens, epochs,
      round(u_tokens + u_tokens * {R_STAR} * (1 - exp(-r8 / {R_STAR})), 4)
        AS eff_tokens,
      round((u_tokens + u_tokens * {R_STAR} * (1 - exp(-r8 / {R_STAR})))
            / budget_tokens, 8) AS efficiency,
      CASE WHEN (u_tokens + u_tokens * {R_STAR} * (1 - exp(-r8 / {R_STAR})))
                / budget_tokens < {EFFICIENCY_FLOOR}
           THEN TRUE ELSE FALSE END AS diminishing
    FROM plan
    """,
)
def token_budget_epoch_plan(spark, sf_dir):
    """Epoch allocation under the data-constrained scaling law.

    Scale shape: one per-source token-count aggregate; every later step is
    |sources| rows with scalar totals attached by broadcast. The decayed-
    value formula uses the repetition count rounded once (r8) so both
    engines exponentiate the identical double."""
    d = table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("u_tokens")
    )
    tot = src.agg(F.sum("u_tokens").cast("bigint").alias("u"))
    w = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "u_tokens",
        "u",
        F.sqrt(F.col("u_tokens").cast("double") / F.col("u")).alias("w_raw"),
    )
    z = w.agg(F.sum("w_raw").alias("z"))
    alloc = w.crossJoin(F.broadcast(z)).select(
        "source",
        "u_tokens",
        F.floor(
            BUDGET_MULT * F.col("u") * F.round(F.col("w_raw") / F.col("z"), 8)
        )
        .cast("bigint")
        .alias("budget_tokens"),
    )
    epochs = F.round(
        F.col("budget_tokens").cast("double") / F.col("u_tokens"), 6
    )
    r8 = F.greatest(
        F.round(F.col("budget_tokens").cast("double") / F.col("u_tokens") - 1, 8),
        F.lit(0.0),
    )
    eff = F.col("u_tokens") + F.col("u_tokens") * R_STAR * (
        1 - F.exp(-r8 / R_STAR)
    )
    return alloc.select(
        "source",
        "u_tokens",
        "budget_tokens",
        epochs.alias("epochs"),
        F.round(eff, 4).alias("eff_tokens"),
        F.round(eff / F.col("budget_tokens"), 8).alias("efficiency"),
        (eff / F.col("budget_tokens") < EFFICIENCY_FLOOR).alias("diminishing"),
    )


# ------------------------------------------------- packing efficiency audit

@query(
    "packing_efficiency_report",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
    ),
    chunks AS (
      SELECT doc_id, lang, CAST(i AS INTEGER) AS chunk_id,
        len(t[i * 24 + 1 : i * 24 + 32]) AS n_tokens
      FROM toks, UNNEST(range((len(t) + 23) // 24)) AS u(i)
    ),
    packed AS (
      SELECT lang, n_tokens,
        CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id, chunk_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW)
              - n_tokens) // 256 AS BIGINT) AS context_id
      FROM chunks
    ),
    per_ctx AS (
      SELECT lang, context_id, CAST(SUM(n_tokens) AS BIGINT) AS ctx_tokens
      FROM packed GROUP BY lang, context_id
    )
    SELECT lang,
      CAST(COUNT(*) AS BIGINT) AS n_contexts,
      CAST(SUM(ctx_tokens) AS BIGINT) AS total_tokens,
      MIN(ctx_tokens) / 256.0 AS min_fill,
      MAX(ctx_tokens) / 256.0 AS max_fill,
      CAST(COUNT(CASE WHEN ctx_tokens > 256 THEN 1 END) AS BIGINT)
        AS n_overfull
    FROM per_ctx
    GROUP BY lang
    """,
)
def packing_efficiency_report(spark, sf_dir):
    """Fill-factor audit of cumsum context packing (the downstream check
    on pack_chunks_into_contexts): per language stream, how full the
    packed training contexts are and how many spill past the budget
    (cumsum packing assigns a chunk by its START offset, so a chunk
    straddling a boundary overfills its context — the audit quantifies
    that trade against sequential first-fit).

    Scale shape: the per-language window is the packing op's own shape;
    the audit adds one bounded aggregate over contexts then collapses to
    |languages| rows. All fills are exact integer ratios rounded once."""
    from pyspark.sql import Window as W

    from .pipeline import CONTEXT_BUDGET, chunk_documents

    chunks = chunk_documents(spark, sf_dir).drop("chunk_hash")
    langs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    packed = chunks.join(F.broadcast(langs), "doc_id").select(
        "lang",
        "n_tokens",
        (before / CONTEXT_BUDGET).cast("bigint").alias("context_id"),
    )
    per_ctx = packed.groupBy("lang", "context_id").agg(
        F.sum("n_tokens").cast("bigint").alias("ctx_tokens")
    )
    # total_tokens is the exact BIGINT (avg fill = total / (n * budget));
    # min/max fills are UNROUNDED k/256 — exact dyadic doubles, identical
    # bits in any IEEE engine. The previous rounded avg ratio sat exactly
    # on an 8-dp half-boundary (oracle_lint R3 finding).
    return per_ctx.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_contexts"),
        F.sum("ctx_tokens").cast("bigint").alias("total_tokens"),
        (F.min("ctx_tokens") / F.lit(256.0)).alias("min_fill"),
        (F.max("ctx_tokens") / F.lit(256.0)).alias("max_fill"),
        F.count(F.when(F.col("ctx_tokens") > CONTEXT_BUDGET, 1)).alias(
            "n_overfull"
        ),
    )


# ---------------------------------------------------- preference pairing

# Deterministic preference-pair construction (the DPO/RLHF reward-data
# shape): within each language, rank documents by the frozen quality score
# and pair the i-th best with the i-th worst — (chosen, rejected, margin)
# triples with the largest score gaps first. A real pipeline swaps the
# heuristic score for a reward model; the pairing plan is identical.
N_PREF_PAIRS = 10


@query(
    "preference_pairs_by_quality",
    oracle=None,  # set below to reuse scoring's shared CTE
)
def preference_pairs_by_quality(spark, sf_dir):
    """Top-vs-bottom quality pairing per language stream.

    Scale shape: two opposite-direction ranks over the same per-language
    window (one shuffle on lang), then a join of the two N_PREF_PAIRS-row
    slices per language — bounded output, broadcast join. Margins subtract
    already-rounded scores, so no fresh float hazard."""
    from pyspark.sql import Window as W

    from .scoring import quality_score_col

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", quality_score_col().alias("q")
    )
    w_best = W.partitionBy("lang").orderBy(F.col("q").desc(), "doc_id")
    w_worst = W.partitionBy("lang").orderBy(F.col("q").asc(), F.col("doc_id").desc())
    best = d.select(
        "lang",
        F.col("doc_id").alias("chosen_doc"),
        F.col("q").alias("q_chosen"),
        F.row_number().over(w_best).alias("pair_rank"),
    ).filter(F.col("pair_rank") <= N_PREF_PAIRS)
    worst = d.select(
        "lang",
        F.col("doc_id").alias("rejected_doc"),
        F.col("q").alias("q_rejected"),
        F.row_number().over(w_worst).alias("pair_rank"),
    ).filter(F.col("pair_rank") <= N_PREF_PAIRS)
    return (
        best.join(F.broadcast(worst), ["lang", "pair_rank"])
        .filter(F.col("chosen_doc") != F.col("rejected_doc"))
        .select(
            "lang",
            "pair_rank",
            "chosen_doc",
            "rejected_doc",
            F.round(F.col("q_chosen") - F.col("q_rejected"), 8).alias("margin"),
        )
    )


def _register_pref_oracle():
    from ..plans.registry import ORACLES
    from .scoring import _SCORED_SQL

    ORACLES["preference_pairs_by_quality"] = f"""
    WITH {_SCORED_SQL},
    best AS (
      SELECT lang, doc_id AS chosen_doc, quality_score AS q_chosen,
        ROW_NUMBER() OVER (PARTITION BY lang
                           ORDER BY quality_score DESC, doc_id) AS pair_rank
      FROM scored
    ),
    worst AS (
      SELECT lang, doc_id AS rejected_doc, quality_score AS q_rejected,
        ROW_NUMBER() OVER (PARTITION BY lang
                           ORDER BY quality_score ASC, doc_id DESC) AS pair_rank
      FROM scored
    )
    SELECT lang, CAST(pair_rank AS BIGINT) AS pair_rank,
      chosen_doc, rejected_doc,
      round(q_chosen - q_rejected, 8) AS margin
    FROM best JOIN worst USING (lang, pair_rank)
    WHERE pair_rank <= {N_PREF_PAIRS} AND chosen_doc <> rejected_doc
    """


_register_pref_oracle()


# ----------------------------------------------- stage fingerprint audit

# Reproducibility audit: an order-insensitive content fingerprint + row
# count after each curation stage (raw -> exact-dedup survivors -> quality
# keep -> blocklist keep). Two runs of the pipeline — any cluster size, any
# partitioning — must produce identical rows here, or something
# non-deterministic crept in. The fingerprint sums a 28-bit md5 slice per
# surviving document, so it is insensitive to row order and exact in int64
# far past any real corpus size.


@query(
    "corpus_stage_fingerprints",
    oracle=None,  # set below to reuse scoring's shared CTE
)
def corpus_stage_fingerprints(spark, sf_dir):
    """(stage, n_docs, fingerprint) after each curation stage.

    Scale shape: each stage is one aggregate over doc-level survivors
    (exact-dedup needs its hash shuffle; quality is map-side; blocklist is
    a broadcast join + doc aggregate); the output is 4 rows. The
    fingerprint is SUM of a per-doc 7-hex-digit md5 slice — commutative,
    so partitioning and merge order cannot change it."""
    d = table(spark, sf_dir, "documents")

    def fp(docs):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.md5("text"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("bigint")
        return docs.agg(
            F.count(F.lit(1)).alias("n_docs"), F.sum(h).alias("fingerprint")
        )

    from .scoring import KEEP_THRESHOLD, quality_score_col

    raw = fp(d).select(F.lit("1_raw").alias("stage"), "n_docs", "fingerprint")
    canon = d.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("keep_id"))
    deduped = fp(
        d.join(canon, d.doc_id == canon.keep_id, "left_semi")
    ).select(F.lit("2_exact_dedup").alias("stage"), "n_docs", "fingerprint")
    quality = fp(d.filter(quality_score_col() >= KEEP_THRESHOLD)).select(
        F.lit("3_quality").alias("stage"), "n_docs", "fingerprint"
    )
    kept_ids = blocklist_filter_report(spark, sf_dir).filter("keep").select("doc_id")
    blocked = fp(d.join(kept_ids, "doc_id", "left_semi")).select(
        F.lit("4_blocklist").alias("stage"), "n_docs", "fingerprint"
    )
    return raw.unionByName(deduped).unionByName(quality).unionByName(blocked)


def _register_fp_oracle():
    from ..plans.registry import ORACLES
    from .scoring import _SCORED_SQL

    fp = ("CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)), 1, 7)) "
          "AS BIGINT)")
    ORACLES["corpus_stage_fingerprints"] = f"""
    WITH {_SCORED_SQL},
    lex(tok, w6) AS (VALUES {", ".join(f"('{t}', {w})" for t, w in BLOCKLIST)}),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    bl_keep AS (
      SELECT doc_id
      FROM toks LEFT JOIN lex USING (tok)
      GROUP BY doc_id
      HAVING round(COALESCE(SUM(w6), 0) / 1e6 / COUNT(*), 8) < {BLOCK_THRESHOLD}
    ),
    canon AS (SELECT MIN(doc_id) AS keep_id FROM documents GROUP BY md5(text))
    SELECT '1_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM({fp}) AS BIGINT) AS fingerprint FROM documents
    UNION ALL
    SELECT '2_exact_dedup', CAST(COUNT(*) AS BIGINT),
      CAST(SUM({fp}) AS BIGINT)
    FROM documents WHERE doc_id IN (SELECT keep_id FROM canon)
    UNION ALL
    SELECT '3_quality', CAST(COUNT(*) AS BIGINT), CAST(SUM({fp}) AS BIGINT)
    FROM documents WHERE doc_id IN
      (SELECT doc_id FROM scored WHERE quality_score >= 0.5)
    UNION ALL
    SELECT '4_blocklist', CAST(COUNT(*) AS BIGINT), CAST(SUM({fp}) AS BIGINT)
    FROM documents WHERE doc_id IN (SELECT doc_id FROM bl_keep)
    """


_register_fp_oracle()


# ----------------------------------------------------- ensemble quality vote

# Consensus across four INDEPENDENT quality gates (logistic classifier,
# Gopher rules, CCNet LM tercile, lexicon blocklist). Production pipelines
# run several cheap filters and keep documents most gates agree on; the
# per-filter vote columns are what an ablation reads to see which gate is
# doing the work.
ENSEMBLE_MIN_VOTES = 3


@query(
    "quality_ensemble_vote",
    oracle=None,  # set below: embeds the member filters' own oracles
)
def quality_ensemble_vote(spark, sf_dir):
    """Per-document keep votes from all four quality gates + consensus.

    Scale shape: each member gate keeps its own (verified) plan; the
    ensemble is three doc_id-keyed joins and a map-side vote count. No new
    corpus-sized state — the expensive token aggregates are the members'
    own, and at scale the four vote columns would be computed in one pass
    over a shared token explode."""
    from .scoring import KEEP_THRESHOLD, quality_score_col
    from .text import _ccnet_doc_terciles, gopher_quality_flags

    d = table(spark, sf_dir, "documents").select(
        "doc_id", (quality_score_col() >= KEEP_THRESHOLD).alias("v_logistic")
    )
    g = gopher_quality_flags(spark, sf_dir).select(
        "doc_id", F.col("gopher_keep").alias("v_gopher")
    )
    c = _ccnet_doc_terciles(spark, sf_dir).select(
        "doc_id", (F.col("tercile") != 3).alias("v_ccnet")
    )
    b = blocklist_filter_report(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("v_blocklist")
    )
    votes = sum(
        F.col(v).cast("int")
        for v in ("v_logistic", "v_gopher", "v_ccnet", "v_blocklist")
    )
    return (
        d.join(g, "doc_id")
        .join(c, "doc_id")
        .join(b, "doc_id")
        .select(
            "doc_id",
            "v_logistic",
            "v_gopher",
            "v_ccnet",
            "v_blocklist",
            votes.alias("n_keep_votes"),
            (votes >= ENSEMBLE_MIN_VOTES).alias("consensus_keep"),
        )
    )


def _register_ensemble_oracle():
    from ..plans.registry import ORACLES
    from . import text  # noqa: F401 -- registers the member oracles first
    from .scoring import _SCORED_SQL

    gopher = ORACLES["gopher_quality_flags"]
    blocklist = ORACLES["blocklist_filter_report"]
    votes = ("(CASE WHEN s.quality_score >= 0.5 THEN 1 ELSE 0 END"
             " + CASE WHEN g.gopher_keep THEN 1 ELSE 0 END"
             " + CASE WHEN t.tercile <> 3 THEN 1 ELSE 0 END"
             " + CASE WHEN bl.keep THEN 1 ELSE 0 END)")
    ORACLES["quality_ensemble_vote"] = f"""
    WITH {_SCORED_SQL},
    g AS ({gopher}),
    bl AS ({blocklist}),
    ctoks AS (
      SELECT doc_id, lang, t
      FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS w
            FROM documents), UNNEST(w) AS u(t)
    ),
    cfreq AS (SELECT t, COUNT(*) AS c FROM ctoks GROUP BY t),
    ctot AS (SELECT COUNT(*) AS n FROM ctoks),
    cdoc AS (
      SELECT doc_id, lang,
        round(AVG(-ln(c / CAST(n AS DOUBLE))), 8) AS s
      FROM ctoks JOIN cfreq USING (t) CROSS JOIN ctot
      GROUP BY doc_id, lang
    ),
    terc AS (
      SELECT doc_id,
        NTILE(3) OVER (PARTITION BY lang ORDER BY s, doc_id) AS tercile
      FROM cdoc
    )
    SELECT s.doc_id,
      (s.quality_score >= 0.5) AS v_logistic,
      g.gopher_keep AS v_gopher,
      (t.tercile <> 3) AS v_ccnet,
      bl.keep AS v_blocklist,
      CAST({votes} AS INTEGER) AS n_keep_votes,
      ({votes} >= {ENSEMBLE_MIN_VOTES}) AS consensus_keep
    FROM scored s
    JOIN g ON g.doc_id = s.doc_id
    JOIN terc t ON t.doc_id = s.doc_id
    JOIN bl ON bl.doc_id = s.doc_id
    """


_register_ensemble_oracle()


# ------------------------------------------- long-context resample weights

@query(
    "length_bucket_resample_weights",
    oracle="""
    WITH lens AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ),
    b AS (
      SELECT doc_id, n_tokens,
        CAST(length(bin(n_tokens)) - 1 AS INTEGER) AS octave
      FROM lens WHERE n_tokens > 0
    ),
    agg AS (
      SELECT octave, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
        CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
      FROM b GROUP BY octave
    ),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS k FROM agg)
    SELECT octave, n_docs, min_tokens, max_tokens,
      round(CAST(n_docs AS DOUBLE) / n, 8) AS actual_share,
      round(CAST(n AS DOUBLE) / (k * n_docs), 8) AS weight
    FROM agg CROSS JOIN tot
    """,
)
def length_bucket_resample_weights(spark, sf_dir):
    """Per-length-octave resampling weights targeting a UNIFORM length
    distribution — the long-context finetuning recipe (long documents are
    rare in crawls; upweight them so every context scale is represented).
    weight = target_share / actual_share; feed it to the weighted
    samplers (weighted_sample_by_quality / mixture_sample_by_source).

    Scale shape: the octave is the bit length of the token count — an
    EXACT integer in both engines (floor(log2(n)) via ln ratios can flip
    at powers of two on a last-ulp difference). One tiny aggregate, scalar
    totals attached by broadcast."""
    d = table(spark, sf_dir, "documents")
    lens = d.select(F.size(F.split("text", " ")).alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    b = lens.select(
        "n_tokens",
        (F.length(F.bin("n_tokens")) - 1).cast("int").alias("octave"),
    )
    agg = b.groupBy("octave").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("n_tokens").cast("bigint").alias("min_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
    )
    tot = agg.agg(
        F.sum("n_docs").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "octave",
        "n_docs",
        "min_tokens",
        "max_tokens",
        F.round(F.col("n_docs").cast("double") / F.col("n"), 8).alias(
            "actual_share"
        ),
        F.round(
            F.col("n").cast("double") / (F.col("k") * F.col("n_docs")), 8
        ).alias("weight"),
    )


# ------------------------------- Min-K% Prob contamination (Shi et al. '23)

MINK_BENCH_MOD = 20  # doc_id % 20 == 0 -> the held-out "benchmark" slice
MINK_FRAC_DEN = 5  # K = lowest 1/5 of bigram log-probs


@query(
    "mink_prob_contamination",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
        CASE WHEN doc_id % {MINK_BENCH_MOD} = 0 THEN 1 ELSE 0 END AS is_bench
      FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    bg AS (
      SELECT doc_id, is_bench, t[i+1] AS w1,
        t[i+1] || ' ' || t[i+2] AS bigram
      FROM toks, UNNEST(range(len(t) - 1)) AS u(i)
    ),
    bgc AS (
      SELECT bigram, count(*) AS cb FROM bg WHERE is_bench = 0 GROUP BY 1
    ),
    ugc AS (
      SELECT w1, count(*) AS cu FROM bg WHERE is_bench = 0 GROUP BY 1
    ),
    vs AS (SELECT COUNT(DISTINCT w1) AS v FROM bg WHERE is_bench = 0),
    scored AS (
      SELECT bg.doc_id,
        round(ln((COALESCE(bgc.cb, 0) + 1.0)
                 / (COALESCE(ugc.cu, 0) + vs.v)), 8) AS lp
      FROM bg
      LEFT JOIN bgc USING (bigram)
      LEFT JOIN ugc USING (w1)
      CROSS JOIN vs
      WHERE bg.is_bench = 1
    ),
    ranked AS (
      SELECT doc_id, lp,
        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY lp ASC) AS rn,
        COUNT(*) OVER (PARTITION BY doc_id) AS n
      FROM scored
    )
    SELECT doc_id, CAST(ANY_VALUE(n) AS BIGINT) AS n_bigrams,
      CAST(greatest(1, ANY_VALUE(n) // {MINK_FRAC_DEN}) AS BIGINT) AS k,
      round(CAST(SUM(CAST(lp AS DECIMAL(20,8))) AS DOUBLE)
            / greatest(1, ANY_VALUE(n) // {MINK_FRAC_DEN}), 8)
        AS min_k_avg_logprob
    FROM ranked
    WHERE rn <= greatest(1, n // {MINK_FRAC_DEN})
    GROUP BY doc_id
    """,
)
def mink_prob_contamination(spark, sf_dir):
    """Min-K% Prob membership/contamination signal (Shi et al. 2023,
    "Detecting Pretraining Data from Large Language Models"): score each
    held-out "benchmark" document under a language model fit on the REST
    of the corpus, then average only its K% least likely spans. A document
    the model has actually seen scores anomalously high even on its worst
    spans — the statistic n-gram-overlap decontamination misses when the
    copy is lightly paraphrased. Here the LM is the corpus bigram model
    (train slice only; vocab-size Laplace smoothing so an UNSEEN context
    scores ln(1/V), never 0) and spans are bigrams.

    Scale shape: train/bench is a pure-function row tag; the count tables
    are model-sized broadcasts; scoring is one left-join pass over BENCH
    bigrams only (5% of the corpus); the lowest-K selection is a
    per-document window (never corpus-wide). The K-subset average is an
    exact decimal sum over 8dp-rounded terms — ties at the K boundary have
    equal values, so the average is deterministic for any tie order."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.split("text", " ").alias("t"),
        (F.col("doc_id") % MINK_BENCH_MOD == 0).alias("is_bench"),
    ).filter(F.size("t") >= 2)
    bg = toks.select(
        "doc_id",
        "is_bench",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.struct(
                    F.element_at("t", i + 1).alias("w1"),
                    F.concat_ws(" ", F.slice("t", i + 1, 2)).alias("bigram"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "is_bench", "p.w1", "p.bigram")
    train = bg.filter(~F.col("is_bench"))
    bgc = train.groupBy("bigram").agg(F.count(F.lit(1)).alias("cb"))
    ugc = train.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    vs = F.broadcast(train.agg(F.countDistinct("w1").alias("v")))
    lp = F.round(
        F.log(
            (F.coalesce(F.col("cb"), F.lit(0)) + 1.0)
            / (F.coalesce(F.col("cu"), F.lit(0)) + F.col("v"))
        ),
        8,
    )
    scored = (
        bg.filter(F.col("is_bench"))
        .join(F.broadcast(bgc), "bigram", "left")
        .join(F.broadcast(ugc), "w1", "left")
        .crossJoin(vs)
        .select("doc_id", lp.alias("lp"))
    )
    wd = W.partitionBy("doc_id")
    ranked = scored.select(
        "doc_id",
        "lp",
        F.row_number().over(wd.orderBy(F.col("lp").asc())).alias("rn"),
        F.count(F.lit(1)).over(wd).alias("n"),
    )
    k = F.greatest(F.lit(1).cast("bigint"), (F.col("n") / MINK_FRAC_DEN).cast("bigint"))
    return (
        ranked.filter(F.col("rn") <= k)
        .groupBy("doc_id")
        .agg(
            F.any_value("n").cast("bigint").alias("n_bigrams"),
            F.greatest(
                F.lit(1).cast("bigint"),
                (F.any_value("n") / MINK_FRAC_DEN).cast("bigint"),
            ).alias("k"),
            F.round(
                F.sum(F.col("lp").cast("decimal(20,8)")).cast("double")
                / F.greatest(
                    F.lit(1).cast("bigint"),
                    (F.any_value("n") / MINK_FRAC_DEN).cast("bigint"),
                ),
                8,
            ).alias("min_k_avg_logprob"),
        )
    )


# ------------------------------------------- Bradley-Terry source ratings

BT_ROUNDS = 3
# Floor-quantized exact sums (round-7 posture; see _pca_iter_cte): terms
# are floor-quantized doubles (identical across engines — floor has no
# tie-handling, unlike round(double, N)) summed in DECIMAL(38,0), which
# stays exact even when the greatest(..., 1e-12) guard makes a term huge
# (a BIGINT sum could overflow there; floor(x) of a > 2^53 double is the
# same integer-valued double on both engines, and its DECIMAL cast is
# exact).
_BT_FSUM = (
    "CAST(CAST(SUM(CAST(floor({x} * 1e6) AS DECIMAL(38,0))) AS DOUBLE)"
    " / 1e6 AS DOUBLE)"
)
# finer grid for the normalizer: its terms are O(1) strengths, and a 1e-6
# grid would inflate sum(p) by ~k x quantization (the rank test's 1e-6
# simplex tolerance); 1e-12 keeps BIGINT sums in range for O(1) terms
_BT_FSUM12 = (
    "CAST(CAST(SUM(CAST(floor({x} * 1e12) AS BIGINT)) AS BIGINT)"
    " AS DOUBLE) / 1e12"
)


def _bt_oracle() -> str:
    from .pipeline import SHUFFLE_SALT
    from .scoring import _SCORED_SQL

    prelude = f"""{_SCORED_SQL},
    posd AS (
      SELECT s.doc_id, d.source, s.quality_score AS q,
        CAST(ROW_NUMBER() OVER (
          ORDER BY md5('{SHUFFLE_SALT}' || CAST(s.doc_id AS VARCHAR)), s.doc_id
        ) - 1 AS BIGINT) AS pos
      FROM scored s JOIN documents d USING (doc_id)
    ),
    duels AS (
      SELECT CASE WHEN (a.q, a.doc_id) > (b.q, b.doc_id)
                  THEN a.source ELSE b.source END AS ws,
             CASE WHEN (a.q, a.doc_id) > (b.q, b.doc_id)
                  THEN b.source ELSE a.source END AS ls
      FROM posd a JOIN posd b
        ON a.pos % 2 = 0 AND b.pos = a.pos + 1 AND a.source <> b.source
    ),
    gd AS (
      SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT ws AS i, ls AS j FROM duels
        UNION ALL SELECT ls, ws FROM duels
      ) GROUP BY i, j
    ),
    players AS (SELECT DISTINCT i AS source FROM gd),
    wins AS (
      SELECT p.source, CAST(COALESCE(w.n, 0) AS BIGINT) AS w
      FROM players p LEFT JOIN (
        SELECT ws AS source, COUNT(*) AS n FROM duels GROUP BY ws
      ) w USING (source)
    ),
    kk AS (SELECT COUNT(*) AS k FROM players),
    p0 AS (SELECT source, 1.0 / kk.k AS p FROM players CROSS JOIN kk)"""
    rounds = []
    prev = "p0"
    for r in range(1, BT_ROUNDS + 1):
        rounds.append(f"""
    den{r} AS (
      SELECT g.i AS source,
        {_BT_FSUM.format(x='g.n / greatest(pi.p + pj.p, 1e-12)')} AS den
      FROM gd g
      JOIN {prev} pi ON pi.source = g.i
      JOIN {prev} pj ON pj.source = g.j
      GROUP BY g.i
    ),
    raw{r} AS (
      SELECT w.source, w.w / greatest(d.den, 1e-12) AS s
      FROM wins w JOIN den{r} d USING (source)
    ),
    tot{r} AS (SELECT {_BT_FSUM12.format(x='s')} AS t FROM raw{r}),
    p{r} AS (
      SELECT source, CAST(floor(s / t * 1e10) AS BIGINT) / 1e10 AS p
      FROM raw{r}, tot{r}
    )""")
        prev = f"p{r}"
    return (
        "WITH "
        + prelude
        + ","
        + ",".join(rounds)
        + f"""
    SELECT w.source, g.games, w.w AS wins, p.p AS strength
    FROM wins w
    JOIN (SELECT i AS source, CAST(SUM(n) AS BIGINT) AS games
          FROM gd GROUP BY i) g USING (source)
    JOIN p{BT_ROUNDS} p USING (source)
    """
    )


@query("source_bradley_terry_strengths", oracle=_bt_oracle())
def source_bradley_terry_strengths(spark, sf_dir):
    """Bradley-Terry strength ratings for SOURCES from document quality
    duels — the pairwise-preference aggregation behind reward-model data
    audits and arena-style rankings: adjacent documents in the epoch-0
    deterministic shuffle duel (higher frozen quality score wins, doc_id
    breaks exact ties; same-source duels drop), and BT_ROUNDS
    minorization-maximization rounds fit p_i with
    p_i <- W_i / sum_j n_ij / (p_i + p_j), renormalized to sum 1.

    Scale shape: duels come from ONE equi-join on the shuffle position
    (pos pairing 2i vs 2i+1 — corpus-linear, no quadratic pair space);
    everything after the duel rollup lives on the <= |sources|^2 win
    matrix with decimal-exact sums and 10-dp iterate rounding, so the
    fit is bit-reproducible at any partition count. greatest(x, 1e-12)
    guards the all-losses boundary identically in both engines."""
    from .pipeline import shuffle_corpus_deterministic
    from .scoring import quality_score_col

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", quality_score_col().alias("q")
    )
    pos = shuffle_corpus_deterministic(spark, sf_dir).select("doc_id", "pos")
    posd = d.join(pos, "doc_id")
    a = posd.select(
        (F.col("pos") / 2).cast("bigint").alias("g"),
        F.col("source").alias("sa"),
        F.struct(F.col("q"), F.col("doc_id")).alias("ka"),
    ).filter(F.col("pos") % 2 == 0)
    b = posd.select(
        ((F.col("pos") - 1) / 2).cast("bigint").alias("g"),
        F.col("source").alias("sb"),
        F.struct(F.col("q"), F.col("doc_id")).alias("kb"),
    ).filter(F.col("pos") % 2 == 1)
    duels = (
        a.join(b, "g")
        .filter(F.col("sa") != F.col("sb"))
        .select(
            F.when(F.col("ka") > F.col("kb"), F.col("sa"))
            .otherwise(F.col("sb"))
            .alias("ws"),
            F.when(F.col("ka") > F.col("kb"), F.col("sb"))
            .otherwise(F.col("sa"))
            .alias("ls"),
        )
        .persist()
    )
    gd = (
        duels.select(F.col("ws").alias("i"), F.col("ls").alias("j"))
        .unionAll(duels.select(F.col("ls").alias("i"), F.col("ws").alias("j")))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .persist()
    )
    players = gd.select(F.col("i").alias("source")).distinct()
    wins = players.join(
        duels.groupBy(F.col("ws").alias("source")).agg(
            F.count(F.lit(1)).alias("n")
        ),
        "source",
        "left",
    ).select("source", F.coalesce("n", F.lit(0)).cast("bigint").alias("w"))
    if not audit_mode():
        # Adaptive local path (see _fiedler_local_kernel /
        # _pca_chains_local): the distributed work — the corpus-linear
        # duel join and the (i, j, n) rollup — is done; everything after
        # lives on the <= |sources|^2 win matrix, a constant-bounded
        # collect. The MM rounds replay the EXACT floor-quantized
        # expression tree below (Python-int sums for the DECIMAL(38)
        # accumulators, IEEE doubles elsewhere), so the unrolled DuckDB
        # oracle still matches bit-for-bit; the distributed branch stays
        # the audit-mode plan and is asserted identical by tests.
        import math as _math

        gd_rows = gd.collect()
        win_rows = wins.collect()
        srcs = sorted({r["source"] for r in win_rows})
        w = {r["source"]: r["w"] for r in win_rows}
        games = {s: 0 for s in srcs}
        for r in gd_rows:
            games[r["i"]] += r["n"]
        p = {s: 1.0 / len(srcs) for s in srcs}
        for _ in range(BT_ROUNDS):
            den_acc = {s: 0 for s in srcs}
            for r in gd_rows:
                x = r["n"] / max(p[r["i"]] + p[r["j"]], 1e-12) * 1e6
                den_acc[r["i"]] += int(_math.floor(x))
            s_raw = {
                s: w[s] / max(float(den_acc[s]) / 1e6, 1e-12) for s in srcs
            }
            t = (
                float(sum(int(_math.floor(s_raw[s] * 1e12)) for s in srcs))
                / 1e12
            )
            p = {
                s: float(_math.floor(s_raw[s] / t * 1e10)) / 1e10
                for s in srcs
            }
        return spark.createDataFrame(
            [(s, games[s], w[s], p[s]) for s in srcs],
            schema="source string, games bigint, wins bigint, strength double",
        )
    kk = players.agg(F.count(F.lit(1)).alias("k"))
    p = players.crossJoin(F.broadcast(kk)).select(
        "source", (F.lit(1.0) / F.col("k")).alias("p")
    )
    DEC0 = "decimal(38,0)"

    def fsum6(x):
        # floor-quantized exact sum (see _BT_FSUM): floor, DECIMAL(38,0)
        # sum, one correctly-rounded divide back — no round(double, N)
        return (
            F.sum(F.floor(x * F.lit(1e6)).cast(DEC0)).cast("double")
            / F.lit(1e6)
        ).cast("double")

    for _ in range(audit_rounds(BT_ROUNDS)):
        pi = p.select(F.col("source").alias("i"), F.col("p").alias("p_i"))
        pj = p.select(F.col("source").alias("j"), F.col("p").alias("p_j"))
        den = (
            gd.join(F.broadcast(pi), "i")
            .join(F.broadcast(pj), "j")
            .groupBy(F.col("i").alias("source"))
            .agg(
                fsum6(
                    F.col("n")
                    / F.greatest(F.col("p_i") + F.col("p_j"), F.lit(1e-12))
                ).alias("den")
            )
        )
        raw = wins.join(den, "source").select(
            "source",
            (F.col("w") / F.greatest(F.col("den"), F.lit(1e-12))).alias("s"),
        )
        tot = F.broadcast(
            raw.agg(
                (
                    F.sum(F.floor(F.col("s") * F.lit(1e12)).cast("bigint"))
                    .cast("bigint")
                    .cast("double")
                    / F.lit(1e12)
                ).alias("t")
            )
        )
        p = (
            raw.crossJoin(tot)
            .select(
                "source",
                (
                    F.floor(F.col("s") / F.col("t") * F.lit(1e10)).cast("bigint")
                    / F.lit(1e10)
                ).alias("p"),
            )
        )
        p = _truncate_lineage(p)
    games = gd.groupBy(F.col("i").alias("source")).agg(
        F.sum("n").cast("bigint").alias("games")
    )
    return (
        wins.join(games, "source")
        .join(p, "source")
        .select("source", "games", F.col("w").alias("wins"), F.col("p").alias("strength"))
    )
