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
    order drift between engines)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
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
