"""PII detection / redaction operators for training-data pipelines (driver
mandate; beyond the reference's surface — /root/reference/src/QuackIO.jl is
pure I/O and ships no text processing).

A pretraining corpus scrub is a map-side regex pass: detect spans that look
like emails / phone numbers, replace them with typed placeholder tokens, and
report per-slice hit counts so the pipeline owner can audit what was removed.
Everything here is built-in `regexp_replace` / `regexp_extract_all` — JVM
whole-stage-codegen, zero shuffles for the redaction itself, one partial-agg
shuffle for the audit summary. At 100 TB this is embarrassingly parallel
over parquet row-groups; no skew surface at all.

The test tables carry no real PII (documents.text is synthetic tokens), so
the queries first synthesize deterministic contact strings from customer
keys — identically in Spark and the DuckDB oracle — then run the actual
detection/redaction under hash-checked comparison. The regex subset used
(character classes, bounded repetition, alternation, anchors) is chosen to
behave identically in Java regex (Spark) and RE2 (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.registry import query, table

# Patterns deliberately restricted to the Java-regex ∩ RE2 common subset.
PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"
EMAIL_RE = r"\b[a-z0-9._]+@[a-z0-9.]+\.[a-z]{2,}\b"

# Deterministic synthesized contact blob: every 3rd customer gets a phone,
# every 4th an email, derived from the key so both engines agree bit-for-bit.
_NOTES_SQL = """
  'account ' || c_name || ' segment ' || c_mktsegment
  || CASE WHEN c_custkey % 3 = 0
          THEN ' call 555-' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
               || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
          ELSE '' END
  || CASE WHEN c_custkey % 4 = 0
          THEN ' mail ' || lower(replace(c_name, '#', '.')) || '@example.com'
          ELSE '' END
"""


def _notes_col():
    return F.concat(
        F.lit("account "),
        F.col("c_name"),
        F.lit(" segment "),
        F.col("c_mktsegment"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("c_custkey") % 4 == 0,
            F.concat(
                F.lit(" mail "),
                F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
    )


@query(
    "pii_redact_customers",
    oracle=f"""
    WITH notes AS (
      SELECT c_custkey, {_NOTES_SQL} AS raw FROM customer
    )
    SELECT c_custkey,
      regexp_replace(
        regexp_replace(raw, '{PHONE_RE}', '[PHONE]', 'g'),
        '{EMAIL_RE}', '[EMAIL]', 'g') AS redacted,
      CAST(len(regexp_extract_all(raw, '{PHONE_RE}')) AS INTEGER) AS n_phone,
      CAST(len(regexp_extract_all(raw, '{EMAIL_RE}')) AS INTEGER) AS n_email
    FROM notes
    """,
)
def pii_redact_customers(spark, sf_dir):
    """Typed-placeholder PII redaction: phones -> [PHONE], emails -> [EMAIL],
    with per-row hit counts. Pure map-side regexp_replace — the whole scrub
    is one codegen'd projection over the scan; Spark's regexp_replace is
    global (all occurrences), matching the oracle's 'g' flag."""
    c = table(spark, sf_dir, "customer")
    raw = _notes_col()
    redacted = F.regexp_replace(
        F.regexp_replace(raw, PHONE_RE, "[PHONE]"), EMAIL_RE, "[EMAIL]"
    )
    return c.select(
        "c_custkey",
        redacted.alias("redacted"),
        F.size(F.regexp_extract_all(raw, F.lit(PHONE_RE), F.lit(0))).alias("n_phone"),
        F.size(F.regexp_extract_all(raw, F.lit(EMAIL_RE), F.lit(0))).alias("n_email"),
    )


@query(
    "pii_scan_summary",
    oracle=f"""
    WITH notes AS (
      SELECT c_mktsegment,
        len(regexp_extract_all({_NOTES_SQL}, '{PHONE_RE}')) AS n_phone,
        len(regexp_extract_all({_NOTES_SQL}, '{EMAIL_RE}')) AS n_email
      FROM customer
    )
    SELECT c_mktsegment,
      CAST(count(*) AS BIGINT) AS n_rows,
      CAST(sum(n_phone) AS BIGINT) AS total_phone,
      CAST(sum(n_email) AS BIGINT) AS total_email,
      CAST(sum(CASE WHEN n_phone + n_email > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS rows_with_pii
    FROM notes
    GROUP BY c_mktsegment
    """,
)
def pii_scan_summary(spark, sf_dir):
    """Audit rollup for the scrub: per market segment, how many rows carried
    PII and how many spans of each type were found. One partial-aggregated
    shuffle on a 5-value key — the detection work stays map-side."""
    c = table(spark, sf_dir, "customer")
    raw = _notes_col()
    per_row = c.select(
        "c_mktsegment",
        F.size(F.regexp_extract_all(raw, F.lit(PHONE_RE), F.lit(0))).alias("n_phone"),
        F.size(F.regexp_extract_all(raw, F.lit(EMAIL_RE), F.lit(0))).alias("n_email"),
    )
    return per_row.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_phone").cast("bigint").alias("total_phone"),
        F.sum("n_email").cast("bigint").alias("total_email"),
        F.sum(
            F.when(F.col("n_phone") + F.col("n_email") > 0, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("rows_with_pii"),
    )


# ---------------------------------------------------------------------------
# Differentially-private count release (seeded Laplace mechanism)
# ---------------------------------------------------------------------------

_DP_EPS = 1.0


@query(
    "dp_mechanism_demo_event_counts",
    oracle=f"""
    WITH counts AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS true_count
      FROM events GROUP BY event_type
    ),
    noised AS (
      SELECT event_type, true_count,
        CAST(('0x' || substr(md5('dp:' || event_type), 1, 8)) AS BIGINT)
          / 4294967296.0 AS u
      FROM counts
    )
    SELECT event_type,
      round(true_count
        + (-1.0 / {_DP_EPS})
          * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
          * round(ln(1 - 2 * least(abs(u - 0.5), 0.4999999999)), 8),
        4) AS noisy_count,
      CAST({_DP_EPS} AS DOUBLE) AS demo_epsilon
    FROM noised
    """,
)
def dp_mechanism_demo_event_counts(spark, sf_dir):
    """Laplace-mechanism DEMO (named so it cannot be mistaken for a
    private release: the noise below is a deterministic function of the
    group key, so anyone can recompute and subtract it, and repeated
    releases reuse identical noise — the column is demo_epsilon, not a
    privacy budget). What it demonstrates/verifies cross-engine is the
    MECHANISM ARITHMETIC of a Laplace count release: per-event-type counts plus
    Laplace(1/epsilon) noise, epsilon = 1, sensitivity 1 (event-level DP —
    bounding per-USER contribution first is the stricter user-level variant
    and composes with this mechanism unchanged).

    The noise is SEEDED: u = md5('dp:'||key) first-8-hex / 2^32 (a
    deterministic uniform), Laplace via the inverse CDF
    -(1/eps)*sign(u-1/2)*ln(1-2|u-1/2|). Production releases would use a
    real RNG; the seeded form makes the mechanism testable and the release
    reproducible across engines/runs — the oracle hash-verifies the exact
    noise arithmetic (ln rounded to 8 dp before scaling, the repo's
    standard cross-engine transcendental contract).

    Scale shape: one partial-aggregated count shuffle on a tiny key; the
    noise is a projection over the handful of group rows."""
    e = table(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 8), 16, 10)
        .cast("long")
        / F.lit(4294967296.0)
    )
    a = F.least(F.abs(u - 0.5), F.lit(0.4999999999))
    noise = (
        (F.lit(-1.0) / _DP_EPS)
        * F.when(u >= 0.5, 1.0).otherwise(-1.0)
        * F.round(F.log(1 - 2 * a), 8)
    )
    return counts.select(
        "event_type",
        F.round(F.col("true_count") + noise, 4).alias("noisy_count"),
        F.lit(_DP_EPS).alias("demo_epsilon"),
    )
