"""Explicit bloom-filter join pruning with a false-positive audit.

Beyond-reference scale tooling (SURVEY.md §3): a shuffle join between a
100 TB fact and a dimension too large to broadcast moves EVERY fact row
through the exchange, even though most match nothing. The classic fix is a
bloom filter built from the dimension's join keys: a few KB of bits,
broadcast to every scan task, filters the fact map-side BEFORE the shuffle
— no false negatives (the exact join result is unchanged), a bounded
false-positive rate (wasted shuffle rows, not wrong answers).

Spark's optimizer already injects runtime bloom filters for selective
shuffle joins (tested in tests/test_scale_patterns.py); this module builds
the SAME structure explicitly with engine-portable arithmetic (md5-derived
positions, 32-bit words in BIGINT columns) so the bit-set, the pass set,
and the false-positive count are bit-identical in Spark and DuckDB — the
oracle verifies the filter itself, not just the final join.

The membership probe is strictly per-row and map-side: the <=32-word
filter is folded into ONE map value, broadcast, and each fact row checks
its k bits with element_at — no explode, no per-row-key aggregation (the
synthetic lineitem has duplicate (orderkey, linenumber) pairs, so there is
deliberately no "row id" anywhere in this pipeline).

Parameters: m = 1024 bits stored as 32 x 32-bit words (bits never touch
the BIGINT sign), k = 3 seeded md5 hashes. At ~80 dimension keys that is
~21% bit occupancy -> FP rate ~(0.21)^3 ~ 1%, so across ~2k distinct
non-matching fact keys the audit exercises a real false-positive path
(false positives strike per KEY, not per row — sized accordingly).

No counterpart in the reference (single-process DuckDB joins without a
shuffle to protect; /root/reference/src/QuackIO.jl is a SQL-string shim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.fanout import fanout
from ..plans.registry import query, table

_M_BITS = 1024
_WORD = 32
_SEEDS = (1, 2, 3)
_DIM_BRAND = "Brand#13"


def _pos(key_col, seed: int):
    """Bloom bit position for (key, seed): first 8 md5 hex chars -> uint32
    -> mod m. Identical text/arithmetic pipeline in both engines."""
    h = F.md5(F.concat(F.lit(f"bf{seed}:"), key_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _M_BITS


def _pos_sql(key_expr: str, seed: int) -> str:
    return (
        f"CAST(('0x' || substr(md5('bf{seed}:' || CAST({key_expr} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {_M_BITS}"
    )


def _bloom_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filter: (word_idx, word) rows, word = OR of 1<<bit over every
    (dimension key, seed) landing in that 32-bit word. <=32 rows — the
    broadcastable representation of the dimension's key set."""
    dim = table(spark, sf_dir, "part").filter(F.col("p_brand") == _DIM_BRAND)
    poss = dim.select(
        F.explode(
            F.array(*[_pos(F.col("p_partkey"), s).alias(f"p{s}") for s in _SEEDS])
        ).alias("pos")
    )
    return (
        poss.select(
            (F.col("pos") / _WORD).cast("long").alias("word_idx"),
            (F.col("pos") % _WORD).cast("int").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("word"))
    )


_WORDS_SQL = f"""
  SELECT pos // {_WORD} AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % {_WORD} AS INTEGER)) AS word
  FROM (
    SELECT unnest([{_pos_sql('p_partkey', 1)},
                   {_pos_sql('p_partkey', 2)},
                   {_pos_sql('p_partkey', 3)}]) AS pos
    FROM part WHERE p_brand = '{_DIM_BRAND}'
  )
  GROUP BY 1
"""


def _bloom_passed_fact(
    spark: SparkSession, sf_dir: str, cols: list[str]
) -> DataFrame:
    """Fact rows (selected `cols`, which must include l_partkey) that pass
    the bloom filter — the map-side prefilter output. The probe fans out
    of the one-task single-row-group scan (functions/fanout.py): the
    k-seed hash + word lookup per fact row is the dominant cost and
    plans into the scan stage."""
    fact = fanout(
        table(spark, sf_dir, "lineitem").select(*cols), "l_partkey"
    )
    wmap = F.broadcast(
        _bloom_words(spark, sf_dir).agg(
            F.map_from_entries(
                F.collect_list(F.struct("word_idx", "word"))
            ).alias("_wmap")
        )
    )
    probed = fact.crossJoin(wmap)
    cond = F.lit(True)
    for s in _SEEDS:
        pos = _pos(F.col("l_partkey"), s)
        word = F.coalesce(
            F.element_at(F.col("_wmap"), (pos / _WORD).cast("long")),
            F.lit(0).cast("long"),
        )
        # pyspark's shiftright takes a literal count only; AND against a
        # computed 2^bit mask instead (exact: bit < 32, word < 2^32).
        mask = F.pow(F.lit(2.0), (pos % _WORD).cast("int")).cast("long")
        cond = cond & (word.bitwiseAND(mask) != 0)
    return probed.filter(cond).drop("_wmap")


_PASS_COND_SQL = " AND ".join(
    f"""(coalesce((SELECT word FROM words w
        WHERE w.word_idx = ({_pos_sql('l.l_partkey', s)}) // {_WORD}), 0)
        >> CAST(({_pos_sql('l.l_partkey', s)}) % {_WORD} AS INTEGER)) % 2 = 1"""
    for s in _SEEDS
)


@query(
    "bloom_prune_join_stats",
    oracle=f"""
    WITH words AS ({_WORDS_SQL}),
    tagged AS (
      SELECT CASE WHEN d.p_partkey IS NULL THEN 0 ELSE 1 END AS is_match
      FROM lineitem l
      LEFT JOIN (SELECT p_partkey FROM part WHERE p_brand = '{_DIM_BRAND}') d
        ON d.p_partkey = l.l_partkey
      WHERE {_PASS_COND_SQL}
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_fact_rows,
      CAST(count(*) AS BIGINT) AS bloom_pass_rows,
      CAST(sum(is_match) AS BIGINT) AS true_match_rows,
      CAST(sum(1 - is_match) AS BIGINT) AS false_positive_rows,
      round(CAST(sum(1 - is_match) AS DOUBLE)
            / (SELECT count(*) FROM lineitem), 8) AS fp_rate
    FROM tagged
    """,
)
def bloom_prune_join_stats(spark, sf_dir):
    """Audit of the bloom prefilter: how many fact rows pass the filter,
    how many are true joins, how many are false positives (wasted shuffle
    rows — the price of the bits), and the FP rate over the full fact.
    Zero false negatives is enforced by `bloom_pruned_revenue`'s oracle
    (bloom-pruned result == plain-join result).

    Plan shape: the probe is a projection after one 1-row broadcast; the
    fact is scanned once and never shuffled on the join key."""
    fact_n = table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_fact_rows")
    )
    dim = table(spark, sf_dir, "part").filter(F.col("p_brand") == _DIM_BRAND)
    passed = _bloom_passed_fact(spark, sf_dir, ["l_partkey"])
    tagged = passed.join(
        F.broadcast(dim.select("p_partkey")),
        passed.l_partkey == F.col("p_partkey"),
        "left",
    ).select(
        F.when(F.col("p_partkey").isNull(), 0).otherwise(1).alias("is_match")
    )
    agg = tagged.agg(
        F.count(F.lit(1)).alias("bloom_pass_rows"),
        F.sum("is_match").cast("bigint").alias("true_match_rows"),
        F.sum(1 - F.col("is_match")).cast("bigint").alias("false_positive_rows"),
    )
    return (
        agg.crossJoin(F.broadcast(fact_n))
        .withColumn(
            "fp_rate",
            F.round(
                F.col("false_positive_rows").cast("double") / F.col("n_fact_rows"),
                8,
            ),
        )
        .select(
            "n_fact_rows",
            "bloom_pass_rows",
            "true_match_rows",
            "false_positive_rows",
            "fp_rate",
        )
    )


@query(
    "bloom_pruned_revenue",
    oracle=f"""
    SELECT l.l_partkey,
           CAST(sum(l.l_extendedprice * (1 - l.l_discount)) AS DECIMAL(38, 4))
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = '{_DIM_BRAND}'
    GROUP BY 1
    """,
)
def bloom_pruned_revenue(spark, sf_dir):
    """Revenue per part of one brand, computed through the bloom prefilter
    and then an exact join. The oracle is the PLAIN join — hash-equality
    proves the bloom path loses no true matches (no false negatives) and
    that false positives are eliminated by the exact join that follows.

    At scale: the prefilter runs map-side in the fact scan, so only
    ~(match + FP) rows reach the join exchange instead of the full fact.
    Here the dim is broadcastable anyway; the pattern is for when it is
    not, while its 4 KB bloom always is."""
    passed = _bloom_passed_fact(
        spark, sf_dir, ["l_partkey", "l_extendedprice", "l_discount"]
    )
    dim = table(spark, sf_dir, "part").filter(F.col("p_brand") == _DIM_BRAND)
    joined = passed.join(
        F.broadcast(dim.select("p_partkey")),
        passed.l_partkey == F.col("p_partkey"),
        "inner",
    )
    return joined.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(38,4)")
            * (1 - F.col("l_discount").cast("decimal(38,4)"))
        )
        .cast("decimal(38,4)")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
