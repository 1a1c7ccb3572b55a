"""Scalar-function surface packs: strings, dates, math (SURVEY.md §2.6).

The reference reaches DuckDB's whole scalar library through its lazy SQL
handle; these packs demonstrate the equivalent breadth on Spark with
oracle-checked values. Transcendentals (exp/ln/log10) are rounded to 8
decimals on BOTH sides — libm implementations may differ in the last ulp
between JVMs and DuckDB, and 1e-8 is far coarser than that while far finer
than any analytical use.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query, table


@query(
    "string_pack2",
    oracle="""
    SELECT p_partkey,
      split_part(p_name, ' ', 2) AS second_word,
      translate(p_brand, '#', '-') AS brand_dash,
      repeat(left(p_name, 2), 3) AS rep2,
      reverse(p_type) AS rtype,
      lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
      trim(' ' || p_name || ' ') AS trimmed,
      replace(p_name, ' ', '_') AS snake,
      regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
      CAST(strpos(p_name, ' ') AS INTEGER) AS first_space,
      right(p_type, 3) AS type_sfx
    FROM part
    """,
)
def string_pack2(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part("p_name", F.lit(" "), F.lit(2)).alias("second_word"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.repeat(F.substring("p_name", 1, 2), 3).alias("rep2"),
        F.reverse("p_type").alias("rtype"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.regexp_replace("p_name", " ", "_").alias("snake"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.instr("p_name", " ").alias("first_space"),
        F.substring("p_type", -3, 3).alias("type_sfx"),
    )


@query(
    "date_pack2",
    oracle="""
    SELECT o_orderkey,
      CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
      CAST(quarter(o_orderdate) AS INTEGER) AS q,
      CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
      CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
      CAST(last_day(o_orderdate) AS DATE) AS month_end,
      CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
      CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
      CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec
    FROM orders
    """,
)
def date_pack2(spark, sf_dir):
    """Date/time surface. isodow == Spark weekday()+1 (Mon=1..Sun=7);
    Spark's dayofweek (Sun=1) deliberately avoided — engines disagree."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        (F.weekday(d) + 1).alias("iso_dow"),
        F.quarter(d).alias("q"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("iso_week"),
        F.last_day(d).alias("month_end"),
        F.add_months(F.to_date(d), 1).alias("next_month"),
        F.to_date(F.date_trunc("month", d)).alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.to_date(d)).alias("days_to_y2k"),
        F.unix_timestamp(d).alias("epoch_sec"),
    )


@query(
    "math_pack",
    oracle="""
    SELECT l_orderkey, l_linenumber,
      abs(l_extendedprice - 50000.0) AS abs_diff,
      CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil7,
      CAST(floor(l_quantity / 7.0) AS BIGINT) AS floor7,
      l_extendedprice / 1000.0 AS price_k,
      sqrt(l_extendedprice) AS root_price,
      power(l_discount + 1.0, 2.0) AS disc_sq,
      round(exp(l_discount), 6) AS exp_disc,
      round(ln(l_extendedprice), 6) AS ln_price,
      round(log10(l_extendedprice), 6) AS log10_price,
      CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
      CAST(mod(CAST(l_quantity AS BIGINT), 5) AS BIGINT) AS qty_mod5,
      greatest(l_discount, l_tax) AS max_rate,
      least(l_discount, l_tax) AS min_rate
    FROM lineitem
    """,
)
def math_pack(spark, sf_dir):
    """Math surface. sqrt/power with exact-dyadic exponents are IEEE
    correctly-rounded (identical everywhere); exp/ln/log10 rounded to 6 —
    coarse enough that a 1-2 ulp libm difference between builds cannot
    reach a rounding half-boundary over this row count (oracle_lint R3
    found an ln_price value 9 ulps from an 8-dp boundary; 6 dp puts the
    nearest boundary ~10^7 ulps away for every row)."""
    l = table(spark, sf_dir, "lineitem")
    price, qty, disc, tax = (
        F.col("l_extendedprice"),
        F.col("l_quantity"),
        F.col("l_discount"),
        F.col("l_tax"),
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 50000.0).alias("abs_diff"),
        F.ceil(qty / 7.0).alias("ceil7"),
        F.floor(qty / 7.0).alias("floor7"),
        (price / 1000.0).alias("price_k"),
        F.sqrt(price).alias("root_price"),
        F.pow(disc + 1.0, 2.0).alias("disc_sq"),
        F.round(F.exp(disc), 6).alias("exp_disc"),
        F.round(F.log(price), 6).alias("ln_price"),
        F.round(F.log10(price), 6).alias("log10_price"),
        F.signum(disc - 0.05).alias("disc_sign"),
        (qty.cast("bigint") % 5).alias("qty_mod5"),
        F.greatest(disc, tax).alias("max_rate"),
        F.least(disc, tax).alias("min_rate"),
    )


@query(
    "null_semantics_pack",
    oracle="""
    SELECT o_orderkey,
      NULLIF(o_orderstatus, 'O') AS status_or_null,
      COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS coalesced,
      (NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL) AS is_null_safe_eq,
      CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL THEN -1.0
           ELSE o_totalprice END AS guarded_price
    FROM orders
    """,
)
def null_semantics_pack(spark, sf_dir):
    """NULL-semantics parity: NULLIF manufacture, COALESCE recovery,
    null-safe equality (Spark's <=> == SQL IS NOT DISTINCT FROM), and a
    CASE null guard — the classic cross-engine traps, value-checked over
    every row. (Three-valued logic means a plain = NULL comparison yields
    NULL; the null-safe operator is the only one that returns TRUE.)"""
    o = table(spark, sf_dir, "orders")
    son = F.nullif("o_orderstatus", F.lit("O"))
    return o.select(
        "o_orderkey",
        son.alias("status_or_null"),
        F.coalesce(son, F.lit("open")).alias("coalesced"),
        son.eqNullSafe(F.lit(None).cast("string")).alias("is_null_safe_eq"),
        F.when(son.isNull(), F.lit(-1.0)).otherwise(F.col("o_totalprice")).alias(
            "guarded_price"
        ),
    )


@query(
    "unicode_functions_pack",
    oracle="""
    SELECT r_regionkey,
      length(r_name || ' — café 中文 🚀') AS n_chars,
      CAST(strlen(r_name || ' — café 中文 🚀') AS INTEGER) AS n_bytes,
      upper('café') AS up,
      reverse('abc') AS rev,
      substr(r_name || ' — café 中文 🚀', 1, 12) AS prefix12
    FROM region
    """,
)
def unicode_functions_pack(spark, sf_dir):
    """Unicode parity: length counts CODE POINTS (not bytes) in both
    engines, byte length via octet_length/strlen, case mapping on
    accented letters, and substr slicing through multibyte content —
    engine-compat traps exercised on real multibyte strings (em dash,
    accents, CJK, an emoji)."""
    r = table(spark, sf_dir, "region")
    s = F.concat(F.col("r_name"), F.lit(" — café 中文 🚀"))
    return r.select(
        "r_regionkey",
        F.length(s).alias("n_chars"),
        F.octet_length(s).alias("n_bytes"),
        F.upper(F.lit("café")).alias("up"),
        F.reverse(F.lit("abc")).alias("rev"),
        F.substring(s, 1, 12).alias("prefix12"),
    )


@query(
    "regexp_pack",
    oracle=r"""
    SELECT doc_id,
      regexp_extract(text, '\b(s[a-z]+)', 1) AS first_s_word,
      regexp_extract(text, '([a-z]+)\s+(table)', 2) AS before_table_hit,
      CAST(len(regexp_extract_all(text, 'table')) AS INTEGER) AS n_table,
      regexp_matches(text, 'scan.*stream|stream.*scan') AS scan_and_stream
    FROM documents
    """,
)
def regexp_pack(spark, sf_dir):
    """Regex parity pack: group extraction (explicit group index, '' on no
    match in both engines), occurrence counting, and alternation matching —
    all JVM-side regexp expressions inside codegen; the classic
    text-wrangling surface an analytics engine must get right."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"\b(s[a-z]+)", 1).alias("first_s_word"),
        F.regexp_extract("text", r"([a-z]+)\s+(table)", 2).alias("before_table_hit"),
        F.regexp_count("text", F.lit("table")).cast("int").alias("n_table"),
        F.col("text").rlike("scan.*stream|stream.*scan").alias("scan_and_stream"),
    )


@query(
    "decimal_interval_pack",
    oracle="""
    SELECT o_orderkey,
      CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS dec_str,
      CAST(CAST(o_totalprice AS DECIMAL(18,2))
           * CAST('1.1' AS DECIMAL(3,1)) AS DOUBLE) AS dec_mul,
      CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS dec_round1,
      CAST(o_orderdate + INTERVAL 3 DAY AS TIMESTAMP) AS plus3d,
      CAST(o_orderdate + INTERVAL 90 MINUTE AS TIMESTAMP) AS plus90min,
      CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
      CAST(DATE '2020-01-31'
           + to_months(CAST(o_orderkey % 13 AS INTEGER)) AS DATE) AS eom_clamp,
      CAST(epoch(TIMESTAMP '2000-01-01 00:00:00')
           - epoch(o_orderdate) AS BIGINT) AS sec_to_y2k
    FROM orders
    """,
)
def decimal_interval_pack(spark, sf_dir):
    """Decimal + interval semantics pinned cross-engine (SURVEY §1.3 lists
    both as free-from-engine; this makes the claim checked, not assumed):

    - double->DECIMAL(18,2) cast, then VARCHAR rendering (scale digits kept
      by both engines: '123.40', not '123.4');
    - exact decimal multiplication with scale growth, compared through the
      final double conversion (both engines compute the exact product);
    - round(decimal, 1): Spark HALF_UP == DuckDB half-away-from-zero on the
      positive domain (why this pack sticks to positive prices);
    - day/minute interval addition on timestamps; month addition on dates
      including END-OF-MONTH CLAMPING (2020-01-31 + 1 month = 2020-02-29 in
      both engines — the classic cross-engine disagreement with engines
      that overflow into March);
    - interval-free epoch difference (DuckDB epoch() vs Spark
      unix_timestamp agree on UTC naive instants).
    """
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    dec2 = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_orderkey",
        dec2.cast("string").alias("dec_str"),
        (dec2 * F.lit("1.1").cast("decimal(3,1)")).cast("double").alias("dec_mul"),
        F.round(dec2, 1).cast("double").alias("dec_round1"),
        (d + F.expr("INTERVAL 3 DAY")).alias("plus3d"),
        (d + F.expr("INTERVAL 90 MINUTE")).alias("plus90min"),
        F.add_months(F.to_date(d), 2).alias("plus2m"),
        F.add_months(
            F.lit("2020-01-31").cast("date"), (F.col("o_orderkey") % 13).cast("int")
        ).alias("eom_clamp"),
        (
            F.unix_timestamp(F.lit("2000-01-01 00:00:00").cast("timestamp"))
            - F.unix_timestamp(d)
        ).alias("sec_to_y2k"),
    )


@query(
    "bitwise_pack",
    oracle="""
    SELECT o_orderkey,
      o_orderkey & 255 AS band,
      o_orderkey | 4096 AS bor,
      xor(o_orderkey, o_custkey) AS bxor,
      o_orderkey << 2 AS shl,
      o_orderkey >> 3 AS shr,
      CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def bitwise_pack(spark, sf_dir):
    """Bitwise scalar pack: and/or/xor, shifts, popcount — the primitives
    under hash partitioners, bloom filters and the simhash/z-order
    operators, pinned cross-engine on the same rows. All JVM built-ins
    inside whole-stage codegen."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(F.col("o_custkey")).alias("bxor"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.bit_count(k).alias("popcount"),
    )


@query(
    "array_hof_pack",
    oracle="""
    SELECT p_partkey,
      array_to_string(list_transform(w, x -> upper(x)), '|') AS words_upper,
      CAST(len(list_filter(w, x -> length(x) > 4)) AS INTEGER) AS n_long_words,
      len(list_filter(w, x -> x LIKE 'a%')) > 0 AS has_a_word,
      len(list_filter(w, x -> length(x) < 2)) = 0 AS all_len_ge2,
      CAST(list_aggregate(list_transform(w, x -> length(x)), 'sum')
           AS BIGINT) AS total_chars,
      array_to_string(
        list_transform(list_zip(w, list_reverse(w)),
                       x -> x[1] || '-' || x[2]), ',') AS zipped,
      array_to_string(list_sort(w), ',') AS sorted_csv,
      CAST(len(list_distinct(w)) AS INTEGER) AS n_distinct_words,
      array_to_string(list_slice(w, 1, 2), ',') AS first2,
      CAST(list_position(w, w[-1]) AS INTEGER) AS last_word_first_pos,
      CAST(list_aggregate(generate_series(1, 1 + p_size % 5), 'sum')
           AS BIGINT) AS seq_sum
    FROM (SELECT p_partkey, p_size, string_split(p_name, ' ') AS w FROM part)
    """,
)
def array_hof_pack(spark, sf_dir):
    """Higher-order array-function surface (SURVEY.md §2.6 array breadth):
    transform / filter / exists / forall / aggregate (fold) / zip_with /
    array_sort / array_distinct / slice / array_position / sequence, all
    value-pinned against DuckDB's list_* lambda family on the same rows.

    Every lambda here runs inside whole-stage codegen (Catalyst
    HigherOrderFunction expressions, not Python) — this is the idiom the
    LLM-pipeline operators (shingling, signature folds, IVF assignment)
    build on, isolated into a per-primitive oracle so a cross-engine
    semantics drift (1-based lambda indexes, slice bounds, position of
    duplicates) is caught here and not deep inside a dedup plan."""
    p = table(spark, sf_dir, "part")
    w = F.split("p_name", " ")
    d = p.select("p_partkey", F.col("p_size"), w.alias("w"))
    return d.select(
        "p_partkey",
        F.array_join(F.transform("w", lambda x: F.upper(x)), "|").alias(
            "words_upper"
        ),
        F.size(F.filter("w", lambda x: F.length(x) > 4)).alias("n_long_words"),
        F.exists("w", lambda x: x.startswith("a")).alias("has_a_word"),
        F.forall("w", lambda x: F.length(x) >= 2).alias("all_len_ge2"),
        F.aggregate(
            "w", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
        F.array_join(
            F.zip_with("w", F.reverse("w"), lambda a, b: F.concat_ws("-", a, b)),
            ",",
        ).alias("zipped"),
        F.array_join(F.array_sort("w"), ",").alias("sorted_csv"),
        F.size(F.array_distinct("w")).alias("n_distinct_words"),
        F.array_join(F.slice("w", 1, 2), ",").alias("first2"),
        F.array_position("w", F.element_at("w", -1))
        .cast("int")
        .alias("last_word_first_pos"),
        F.aggregate(
            F.sequence(F.lit(1), F.lit(1) + F.col("p_size") % 5),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("seq_sum"),
    )


@query(
    "map_hof_pack",
    oracle="""
    SELECT o_orderkey,
      3 AS n_keys,
      'custkey,priority,status' AS keys_csv,
      o_orderstatus AS status_val,
      upper(o_orderpriority) || ',' || upper(o_orderstatus) || ',' ||
        CAST(o_custkey AS VARCHAR) AS upper_vals_csv,
      2 AS n_keys_no_custkey,
      'priority=' || o_orderpriority || ';status=' || o_orderstatus ||
        ';custkey=' || CAST(o_custkey AS VARCHAR) AS entries_csv,
      4 AS n_keys_concat,
      'X' AS status_after_zip
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def map_hof_pack(spark, sf_dir):
    """Map-typed column surface: create_map / map_keys / map_values /
    element_at / transform_values / map_filter / map_entries / map_concat
    / map_zip_with. The map is constructed from orders columns so the
    DuckDB oracle pins the same output values straight from the source
    columns — the oracle checks results, not implementation. All
    operations are Catalyst map expressions (codegen), demonstrating that
    typed metadata maps (the multimodal operators' sidecar pattern,
    operators/multimodal.py) stay JVM-side end to end."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    m = F.create_map(
        F.lit("priority"), F.col("o_orderpriority"),
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("custkey"), F.col("o_custkey").cast("string"),
    )
    d = o.select("o_orderkey", m.alias("m"))
    return d.select(
        "o_orderkey",
        F.size("m").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("keys_csv"),
        F.element_at("m", "status").alias("status_val"),
        F.array_join(
            F.map_values(F.transform_values("m", lambda k, v: F.upper(v))), ","
        ).alias("upper_vals_csv"),
        F.size(F.map_filter("m", lambda k, v: k != "custkey")).alias(
            "n_keys_no_custkey"
        ),
        F.array_join(
            F.transform(
                F.map_entries("m"),
                lambda e: F.concat_ws("=", e.getField("key"), e.getField("value")),
            ),
            ";",
        ).alias("entries_csv"),
        F.size(
            F.map_concat("m", F.create_map(F.lit("extra"), F.lit("1")))
        ).alias("n_keys_concat"),
        F.element_at(
            F.map_zip_with(
                "m",
                F.create_map(F.lit("status"), F.lit("X")),
                lambda k, v1, v2: F.coalesce(v2, v1),
            ),
            "status",
        ).alias("status_after_zip"),
    )


@query(
    "try_functions_pack",
    oracle="""
    SELECT o_orderkey,
      CASE WHEN o_orderkey % 7 = 0 THEN NULL
        ELSE o_totalprice / (o_orderkey % 7) END AS safe_div,
      TRY_CAST(o_orderpriority AS INTEGER) AS bad_int_cast,
      TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
      CASE WHEN o_orderkey = 0 THEN 9223372036854775807
        ELSE NULL END AS overflow_add,
      CASE WHEN o_orderkey > 3037000499 THEN NULL
        ELSE o_orderkey * o_orderkey END AS safe_square,
      NULL AS oob_element,
      TRY_CAST('2024-13-40' AS DATE) AS bad_date
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def try_functions_pack(spark, sf_dir):
    """ANSI-safety scalar surface: try_divide / try_cast / try_add /
    try_multiply / try_element_at / try_to_date — NULL instead of a
    runtime error on division by zero, overflow, malformed casts, and
    out-of-bounds subscripts. The contract a 100 TB batch job needs: one
    poisoned row must not kill a 10-hour stage.

    The oracle pins each NULL case explicitly (CASE/TRY_CAST), so this
    doubles as documentation of exactly which inputs Spark's try_*
    family nulls out. Everything is codegen'd JVM expressions."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), k % 7).alias("safe_div"),
        F.expr("try_cast(o_orderpriority AS int)").alias("bad_int_cast"),
        F.expr("try_cast(substr(o_orderpriority, 1, 1) AS int)").alias(
            "prio_digit"
        ),
        F.try_add(F.lit(9223372036854775807), k).alias("overflow_add"),
        F.try_multiply(k, k).alias("safe_square"),
        F.try_element_at(F.array(F.lit(1)), F.lit(5).cast("int")).alias(
            "oob_element"
        ),
        F.try_to_date(F.lit("2024-13-40")).alias("bad_date"),
    )
