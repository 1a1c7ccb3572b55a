"""Round-trip queries: the write_table -> read_* path exercised UNDER the
driver's oracle gate (not just unit tests). The Spark side writes a real
file with the engine's own sink, reads it back with the engine's own scan,
and aggregates; the oracle computes the same aggregate straight from the
source parquet — so any loss/corruption in the sink or scan (type mangling,
null handling, quoting, compression) breaks the hash match.

Mirrors the reference's central invariant: isequal(read(write(tbl)), tbl)
(/root/reference/test/runtests.jl:18-26,40,44,56).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ..functions.exact import DEC
from ..sources.readers import read_csv, read_json
from ..sources.writers import write_table
from .registry import query, table

_ORACLE = """
    SELECT o_orderstatus,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total,
      CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    GROUP BY o_orderstatus
"""


def _agg(df):
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
        F.sum("o_orderkey").alias("key_sum"),
    )


def _roundtrip(spark, sf_dir, fmt, read_opts=None, **write_opts):
    src = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    path = os.path.join(
        tempfile.mkdtemp(prefix="quackio_rt_"), f"orders_rt.{fmt}" + write_opts.pop("suffix", "")
    )
    write_table(src, path, format=fmt, **write_opts)
    schema = {"o_orderkey": "bigint", "o_orderstatus": "varchar", "o_totalprice": "double"}
    reader = read_csv if fmt == "csv" else read_json
    back = reader(spark, path, columns=schema, **(read_opts or {}))
    return _agg(back)


@query("roundtrip_csv", oracle=_ORACLE)
def roundtrip_csv(spark, sf_dir):
    """orders -> engine CSV sink -> engine CSV scan (explicit schema) ->
    aggregate; must equal the oracle's direct-parquet aggregate."""
    return _roundtrip(spark, sf_dir, "csv")


@query("roundtrip_csv_gzip_delim", oracle=_ORACLE)
def roundtrip_csv_gzip_delim(spark, sf_dir):
    """Same, through gzip compression and a non-default delimiter."""
    return _roundtrip(
        spark, sf_dir, "csv",
        read_opts={"delim": "|"}, suffix=".gz", compression="gzip", delim="|",
    )


@query("roundtrip_json", oracle=_ORACLE)
def roundtrip_json(spark, sf_dir):
    """orders -> NDJSON sink -> JSON scan -> aggregate."""
    return _roundtrip(spark, sf_dir, "json")


@query(
    "roundtrip_hive_partitioned",
    oracle="""
    SELECT o_orderstatus,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderstatus
    """,
)
def roundtrip_hive_partitioned(spark, sf_dir):
    """orders -> hive-partitioned parquet write (partition_by=o_orderstatus,
    DuckDB COPY PARTITION_BY twin) -> partition-discovered read
    (hive_partitioning=True) -> filter to ONE partition -> aggregate.
    The filter must become partition PRUNING (asserted in
    tests/test_plans.py::test_hive_partition_pruning): at 100 TB the scan
    reads 1/3 of the files, not all of them with a post-filter. The oracle
    computes the same aggregate straight from the source parquet, so a
    partition value mangled in the dir-name round-trip breaks the hash."""
    import os
    import tempfile

    from ..sources.readers import read_parquet

    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="quackio_rt_"), "orders_hive")
    write_table(
        src, path, format="parquet", single_file=False, partition_by=["o_orderstatus"]
    )
    back = read_parquet(spark, path, hive_partitioning=True)
    return (
        back.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
        )
    )


@query("roundtrip_glob_scan", oracle=_ORACLE)
def roundtrip_glob_scan(spark, sf_dir):
    """orders split across two parquet files in one directory, read back
    with a GLOB pattern ('dir/*.parquet' — DuckDB accepts globs anywhere a
    path goes, reference pass-through src/QuackIO.jl:115,121; Spark's
    Hadoop glob syntax is the same). Aggregate must equal the straight
    oracle: the glob saw every file, each exactly once."""
    import os
    import tempfile

    from ..sources.readers import read_parquet

    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    d = tempfile.mkdtemp(prefix="quackio_rt_glob_")
    write_table(
        src.filter(F.col("o_orderkey") % 2 == 0),
        os.path.join(d, "even.parquet"),
    )
    write_table(
        src.filter(F.col("o_orderkey") % 2 == 1),
        os.path.join(d, "odd.parquet"),
    )
    return _agg(read_parquet(spark, os.path.join(d, "*.parquet")))


@query(
    "roundtrip_union_by_name",
    oracle="""
    SELECT COUNT(*) AS n,
      COUNT(o_totalprice) AS n_price,
      COUNT(o_orderstatus) AS n_status,
      CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM (
      SELECT o_orderkey, o_totalprice, NULL AS o_orderstatus
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, NULL, o_orderstatus
      FROM orders WHERE o_orderkey % 2 = 1
    )
    """,
)
def roundtrip_union_by_name(spark, sf_dir):
    """Two parquet files with DIFFERENT column subsets, read back with
    union_by_name=True (DuckDB's multi-file schema alignment; Spark twin is
    parquet mergeSchema) — columns align by NAME and files missing a column
    contribute NULLs, which the per-column COUNTs verify exactly."""
    import os
    import tempfile

    from ..sources.readers import read_parquet

    src = table(spark, sf_dir, "orders")
    d = tempfile.mkdtemp(prefix="quackio_rt_ubn_")
    write_table(
        src.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice"),
        os.path.join(d, "a.parquet"),
    )
    write_table(
        src.filter(F.col("o_orderkey") % 2 == 1).select("o_orderkey", "o_orderstatus"),
        os.path.join(d, "b.parquet"),
    )
    back = read_parquet(spark, os.path.join(d, "*.parquet"), union_by_name=True)
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_totalprice").alias("n_price"),
        F.count("o_orderstatus").alias("n_status"),
        F.sum("o_orderkey").alias("key_sum"),
    )


_NESTED_ORACLE = """
    SELECT o_orderstatus AS status,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total,
      CAST(SUM(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS BIGINT)
        AS urgent,
      COUNT(*) AS consistent
    FROM orders
    GROUP BY o_orderstatus
"""


def _nest(src):
    """Struct with HOSTILE field names (space + unicode + quote, the
    reference's adversarial-identifier precedent
    /root/reference/test/runtests.jl:72-76) plus a map column."""
    return src.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("order status"),
            F.col("o_totalprice").alias("prix tötal'"),
        ).alias("info"),
        F.create_map(
            F.lit("priority"), F.col("o_orderpriority"),
            F.lit("status"), F.col("o_orderstatus"),
        ).alias("tags"),
    )


def _nested_agg(back):
    return back.groupBy(F.col("info.`order status`").alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("info.`prix tötal'`").cast(DEC)).cast("double").alias("total"),
        F.sum(
            F.when(F.col("tags")["priority"].startswith("1"), 1).otherwise(0)
        ).alias("urgent"),
        # map value must still agree with the struct field after the trip
        F.sum(
            F.when(F.col("tags")["status"] == F.col("info.`order status`"), 1)
            .otherwise(0)
        ).alias("consistent"),
    )


@query("roundtrip_nested_struct", oracle=_NESTED_ORACLE)
def roundtrip_nested_struct(spark, sf_dir):
    """orders -> struct(hostile names)+map columns -> parquet sink ->
    parquet scan -> nested-field probes -> aggregate (SURVEY §1.3: nested
    data 'comes along for free' in the reference via DuckDB; this makes the
    claim true here). The oracle computes the same numbers flat from the
    source parquet, so any field-name mangling, value loss, or struct/map
    entry reordering in the round-trip breaks the hash."""
    import os
    import tempfile

    from ..sources.readers import read_parquet

    src = table(spark, sf_dir, "orders")
    path = os.path.join(tempfile.mkdtemp(prefix="quackio_rt_"), "orders_nested")
    write_table(_nest(src), path, format="parquet", single_file=False)
    return _nested_agg(read_parquet(spark, path))


@query("roundtrip_nested_struct_json", oracle=_NESTED_ORACLE)
def roundtrip_nested_struct_json(spark, sf_dir):
    """Same nested payload through the NDJSON sink/scan with an explicit
    nested schema (struct fields with spaces/unicode/quotes survive JSON
    key quoting; map<string,string> read back as a real MapType)."""
    import os
    import tempfile

    src = table(spark, sf_dir, "orders")
    path = os.path.join(
        tempfile.mkdtemp(prefix="quackio_rt_"), "orders_nested.json"
    )
    write_table(_nest(src), path, format="json", single_file=False)
    back = read_json(
        spark,
        path,
        columns={
            "o_orderkey": "bigint",
            "info": "struct<`order status`:string,`prix tötal'`:double>",
            "tags": "map<string,string>",
        },
    )
    return _nested_agg(back)


@query("roundtrip_parquet_zstd", oracle=_ORACLE)
def roundtrip_parquet_zstd(spark, sf_dir):
    """orders -> zstd-compressed parquet sink (directory mode, the scale
    path) -> parquet scan -> aggregate. Covers S8 for the columnar format;
    zstd is the production codec choice at 100 TB (better ratio than
    snappy at similar scan speed)."""
    import os
    import tempfile

    from ..sources.readers import read_parquet

    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="quackio_rt_"), "orders_rt_zstd")
    write_table(src, path, format="parquet", single_file=False, compression="zstd")
    return _agg(read_parquet(spark, path))


@query("roundtrip_orc_native", oracle=_ORACLE)
def roundtrip_orc_native(spark, sf_dir):
    """orders -> ORC sink (zstd) -> ORC scan -> aggregate. Beyond-reference
    format breadth: DuckDB has no ORC scanner so the reference cannot touch
    ORC at all; Spark reads/writes it natively, and the cross-engine oracle
    still verifies content because it aggregates the original parquet."""
    import os
    import tempfile

    from ..sources.readers import read_orc

    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="quackio_rt_"), "orders_rt.orc")
    write_table(src, path, compression="gzip")  # format guessed; gzip->zlib
    return _agg(read_orc(spark, path))


@query("roundtrip_sharded_write", oracle=_ORACLE)
def roundtrip_sharded_write(spark, sf_dir):
    """orders -> directory-mode parquet sink with a bounded rows-per-file cap
    (spark_options maxRecordsPerFile — the knob that keeps output shards at a
    target size when a 100 TB job writes from few large tasks) -> glob scan
    of the shards -> aggregate. tests/test_io_roundtrip asserts the file
    count and per-file bound; this query gates the data integrity."""
    import os
    import tempfile

    from ..sources.readers import read_parquet

    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="quackio_rt_"), "orders_sharded")
    write_table(
        src,
        path,
        format="parquet",
        single_file=False,
        spark_options={"maxRecordsPerFile": "500"},
    )
    return _agg(read_parquet(spark, path))


@query(
    "roundtrip_text_files",
    oracle="""
    SELECT doc_id, text AS content FROM documents WHERE doc_id < 20
    """,
)
def roundtrip_text_files(spark, sf_dir):
    """documents -> engine TEXT sink partitioned by doc_id (one directory
    per document, raw bytes, no quoting/escaping layer) -> whole-file
    read_text scan -> doc_id re-derived from the partition path. Exercises
    the raw-.txt-shard ingestion path (DuckDB read_text parity) under the
    oracle gate: any byte mangling in the text sink or whole-file scan
    breaks the hash match against the source parquet."""
    from ..sources.readers import read_text

    src = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select("doc_id", "text")
    )
    d = tempfile.mkdtemp(prefix="quackio_rt_") + "/docs_txt"
    write_table(src, d, format="text", single_file=False, partition_by=["doc_id"])
    back = read_text(spark, d + "/doc_id=*/part-*")
    return back.select(
        F.regexp_extract("filename", r"doc_id=(\d+)", 1)
        .cast("bigint")
        .alias("doc_id"),
        # the text sink terminates every record with \n; strip the one
        # terminator so content compares against the source bytes
        F.regexp_replace("content", "\n$", "").alias("content"),
    )


@query(
    "roundtrip_schema_evolution",
    oracle="""
    SELECT o_orderstatus,
      COUNT(*) AS n,
      CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey END) AS BIGINT)
        AS key_sum_v2,
      CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_v2,
      CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN NULL
        ELSE o_orderkey END) AS BIGINT) AS key_sum_v1
    FROM orders GROUP BY o_orderstatus
    """,
)
def roundtrip_schema_evolution(spark, sf_dir):
    """Schema evolution on a parquet directory: a v1 writer emits
    (status, key), a later v2 writer adds a column (key2) to the same
    dataset directory; a mergeSchema read must see the union schema with
    NULLs for v1's missing column — the append-only evolution contract
    every long-lived 100 TB dataset relies on (each parquet footer is
    self-describing; the union is resolved at planning time, not by
    rewriting old files)."""
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    d = tempfile.mkdtemp(prefix="quackio_rt_") + "/evolving"
    v1 = src.filter(F.col("o_orderkey") % 2 != 0)
    v2 = src.filter(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_orderkey2", F.col("o_orderkey")
    )
    v1.write.mode("overwrite").parquet(d)
    v2.write.mode("append").parquet(d)
    back = spark.read.option("mergeSchema", "true").parquet(d)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey2").cast("bigint").alias("key_sum_v2"),
        F.sum(F.col("o_orderkey2").isNotNull().cast("int"))
        .cast("bigint")
        .alias("n_v2"),
        F.sum(F.when(F.col("o_orderkey2").isNull(), F.col("o_orderkey")))
        .cast("bigint")
        .alias("key_sum_v1"),
    )


@query(
    "roundtrip_decimal_column",
    oracle="""
    SELECT o_orderstatus,
      COUNT(*) AS n,
      SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total_dec,
      MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS max_dec
    FROM orders GROUP BY o_orderstatus
    """,
)
def roundtrip_decimal_column(spark, sf_dir):
    """DECIMAL data column through the parquet sink and scan: prices cast
    to DECIMAL(12,2) are written, read back, and aggregated IN DECIMAL —
    the exact-money path SURVEY §1.3 claims 'comes along for free' from
    the engine, made true under the gate. The sum stays a decimal in the
    result (Spark widens to (22,2), DuckDB to (38,2) — both exact; the
    comparator sees identical digit strings), so any precision loss in
    either the writer's logical-type mapping or the vectorized decimal
    reader breaks the hash."""
    src = table(spark, sf_dir, "orders").select(
        "o_orderstatus", F.col("o_totalprice").cast("decimal(12,2)").alias("p")
    )
    d = tempfile.mkdtemp(prefix="quackio_rt_") + "/dec.parquet"
    write_table(src, d, format="parquet", single_file=False)
    back = spark.read.parquet(d)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p").cast("decimal(38,2)").alias("total_dec"),
        F.max("p").alias("max_dec"),
    )


@query(
    "roundtrip_binary_column",
    oracle="""
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(CASE WHEN substr(hex(unhex(md5(CAST(o_orderkey AS VARCHAR)))),
        1, 32) = upper(md5(CAST(o_orderkey AS VARCHAR)))
        THEN 1 ELSE 0 END) AS BIGINT) AS n_intact,
      CAST(SUM(octet_length(unhex(md5(CAST(o_orderkey AS VARCHAR)))))
        AS BIGINT) AS total_bytes
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def roundtrip_binary_column(spark, sf_dir):
    """BINARY data column through parquet: 16 raw md5 bytes per row are
    written, read back, and verified byte-for-byte by re-hexing — the
    opaque-payload path the multimodal operators (operators/multimodal.py)
    depend on. The oracle computes the same integrity figures without any
    file I/O, so a writer that mangled or truncated binary values (or a
    reader that decoded them as text) fails the hash."""
    src = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.unhex(F.md5(F.col("o_orderkey").cast("string"))).alias("payload"),
        )
    )
    d = tempfile.mkdtemp(prefix="quackio_rt_") + "/bin.parquet"
    write_table(src, d, format="parquet", single_file=False)
    back = spark.read.parquet(d)
    intact = (
        F.hex("payload") == F.upper(F.md5(F.col("o_orderkey").cast("string")))
    ).cast("int")
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(intact).cast("bigint").alias("n_intact"),
        F.sum(F.octet_length("payload")).cast("bigint").alias("total_bytes"),
    )


# ------------------------------------------ parquet footer statistics


def _footer_int64_stats(sf_dir: str, name: str = "orders"):
    """Per-row-group INT64 column stats read from the parquet FOOTER via
    pyarrow, without touching data pages (the read_kv_metadata posture).
    Returns [(rg, column, n_values, null_count, min, max, comp_bytes,
    uncomp_bytes)] — per-row-group detail is pinned against DuckDB's
    parquet_metadata() in tests/test_sources_extended.py; the oracle-gated
    query below checks the footer against the DATA (views are the only
    thing the driver's oracle runner can see)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(os.path.join(sf_dir, f"{name}.parquet")).metadata
    rows = []
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for c in range(g.num_columns):
            col = g.column(c)
            if col.physical_type != "INT64":
                continue
            st = col.statistics
            # INT64 physical also backs timestamps; keep plain integers
            # only (min/max arrive as datetime for logical TIMESTAMP).
            if st is not None and st.has_min_max and not isinstance(st.min, int):
                continue
            rows.append(
                (
                    rg,
                    col.path_in_schema,
                    col.num_values,
                    st.null_count if st is not None else None,
                    int(st.min) if st is not None and st.has_min_max else None,
                    int(st.max) if st is not None and st.has_min_max else None,
                    col.total_compressed_size,
                    col.total_uncompressed_size,
                )
            )
    return rows


@query(
    "parquet_footer_column_stats",
    oracle="""
    SELECT 'o_orderkey' AS column_name,
      CAST(COUNT(o_orderkey) AS BIGINT) AS n_values,
      CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS null_count,
      CAST(MIN(o_orderkey) AS BIGINT) AS min_value,
      CAST(MAX(o_orderkey) AS BIGINT) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
      CAST(COUNT(o_custkey) AS BIGINT),
      CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
      CAST(MIN(o_custkey) AS BIGINT),
      CAST(MAX(o_custkey) AS BIGINT)
    FROM orders
    """,
)
def parquet_footer_column_stats(spark, sf_dir):
    """Parquet footer statistics vs data truth — the file-skipping
    evidence a 100 TB lakehouse lives on: per INT64 column, the footer's
    value count, null count and min/max (what predicate pushdown prunes
    on), aggregated across row groups, ORACLE-CHECKED against the same
    numbers computed from the data itself. A footer that lies (stale
    stats, truncated min/max) breaks this gate — exactly the corruption
    class that makes pruning silently drop rows at scale.

    Scale shape: footers are O(row-groups x columns) metadata read
    driver-side without touching data pages; on a cluster this becomes a
    parallel listing over the manifest. Per-row-group detail (including
    compressed/uncompressed bytes) is additionally pinned byte-for-byte
    against DuckDB's parquet_metadata() in the test suite."""
    rows = _footer_int64_stats(sf_dir)
    agg: dict[str, list] = {}
    for _rg, col, n, nulls, mn, mx, _cb, _ub in rows:
        a = agg.setdefault(col, [0, 0, None, None])
        a[0] += n
        a[1] += nulls or 0
        a[2] = mn if a[2] is None else min(a[2], mn)
        a[3] = mx if a[3] is None else max(a[3], mx)
    out = [(c, a[0], a[1], a[2], a[3]) for c, a in agg.items()]
    return spark.createDataFrame(
        out,
        "column_name string, n_values bigint, null_count bigint, "
        "min_value bigint, max_value bigint",
    )


@query(
    "roundtrip_parquet_http_ranged",
    oracle="""
    SELECT o_orderpriority,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
      CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
      CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        AS cents
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def roundtrip_parquet_http_ranged(spark, sf_dir):
    """Remote parquet over HTTP Range requests, oracle-gated end-to-end
    (round-7 VERDICT "next" #4, closing r7 "what's missing" #1): a local
    Range-honoring server fronts the sf_dir, the orders table is read via
    sources/httpranged.py::read_parquet_url_ranged — the driver Range-GETs
    ONLY the footer, each executor Range-GETs only its row group's bytes
    (DuckDB-httpfs's remote-parquet protocol, the reference's underlying
    capability) — and the aggregate must hash-match DuckDB reading the
    same file locally. The query RAISES if any whole-file GET happened,
    so the gate itself enforces zero-full-download.

    The bare eager localCheckpoint (not the switchable audit helper) is
    execution-critical, not plan-depth management: the HTTP server is
    torn down before the function returns, so the scan must materialize
    while it is still up. Determinism: floor(price * 100) is one IEEE
    multiply + floor — identical in both engines; everything else is
    integer."""
    from ..sources.httpranged import (
        RangeFileHandler,
        read_parquet_url_ranged,
        serve_directory_ranged,
    )

    httpd, port = serve_directory_ranged(sf_dir)
    RangeFileHandler.range_count = RangeFileHandler.full_count = 0
    try:
        df = read_parquet_url_ranged(
            spark, f"http://127.0.0.1:{port}/orders.parquet"
        )
        out = (
            df.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.min("o_orderkey").cast("bigint").alias("min_key"),
                F.max("o_orderkey").cast("bigint").alias("max_key"),
                F.sum(
                    F.floor(F.col("o_totalprice") * 100).cast("bigint")
                )
                .cast("bigint")
                .alias("cents"),
            )
            .localCheckpoint(eager=True)
        )
        if RangeFileHandler.full_count > 0:
            raise ValueError(
                "roundtrip_parquet_http_ranged: a whole-file GET ran "
                f"({RangeFileHandler.full_count}); the ranged scan must "
                "touch only footer + row-group byte spans"
            )
        return out
    finally:
        httpd.shutdown()


@query(
    "roundtrip_parquet_http_pruned",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
      CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
      CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        AS cents
    FROM orders
    WHERE o_orderkey BETWEEN 1000 AND 2000
    """,
)
def roundtrip_parquet_http_pruned(spark, sf_dir):
    """Zone-map row-group skipping over remote parquet: orders is
    rewritten key-sorted into many small row groups, served over the
    Range-honoring HTTP server, and scanned with rg_filter=(o_orderkey,
    1000, 2000) — the footer min/max statistics prune every row group
    whose key span misses the predicate BEFORE any body byte is
    requested (DuckDB-httpfs's remote zone-map behavior). The query
    RAISES unless pruning actually dropped groups AND no whole-file GET
    ran, so the gate enforces the scan shape, and the exact .filter()
    on top makes the aggregate hash-match DuckDB reading the original
    table. Same bare eager localCheckpoint as the unpruned twin: the
    server dies when the function returns."""
    import tempfile

    import pyarrow.parquet as pq

    from ..sources.httpranged import (
        RangeFileHandler,
        read_parquet_url_ranged,
        serve_directory_ranged,
    )

    src = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice"],
    ).sort_by("o_orderkey")
    tmp = tempfile.mkdtemp(prefix="http_pruned_")
    pq.write_table(src, f"{tmp}/orders_sorted.parquet", row_group_size=500)
    httpd, port = serve_directory_ranged(tmp)
    RangeFileHandler.range_count = RangeFileHandler.full_count = 0
    try:
        url = f"http://127.0.0.1:{port}/orders_sorted.parquet"
        df = read_parquet_url_ranged(
            spark, url, rg_filter=("o_orderkey", 1000, 2000)
        )
        n_total_groups = pq.read_metadata(
            f"{tmp}/orders_sorted.parquet"
        ).num_row_groups
        n_kept = df.rdd.getNumPartitions()
        if not n_kept < n_total_groups:
            raise ValueError(
                f"zone-map pruning kept all {n_total_groups} row groups; "
                "expected the key-sorted layout to skip most of them"
            )
        out = (
            df.filter(F.col("o_orderkey").between(1000, 2000))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.min("o_orderkey").cast("bigint").alias("min_key"),
                F.max("o_orderkey").cast("bigint").alias("max_key"),
                F.sum(
                    F.floor(F.col("o_totalprice") * 100).cast("bigint")
                )
                .cast("bigint")
                .alias("cents"),
            )
            .localCheckpoint(eager=True)
        )
        if RangeFileHandler.full_count > 0:
            raise ValueError("whole-file GET ran during a pruned scan")
        return out
    finally:
        httpd.shutdown()


@query(
    "roundtrip_csv_http_ranged",
    oracle="""
    SELECT o_orderpriority,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
      CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
      CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def roundtrip_csv_http_ranged(spark, sf_dir):
    """Remote CSV over HTTP Range requests, oracle-gated end-to-end
    (round-8 VERDICT "next" #4 — the line-format symmetry to
    roundtrip_parquet_http_ranged): orders is exported to CSV, served by
    the local Range-honoring server, and read via read_csv_url_ranged —
    the driver never touches the body, executors range-read
    newline-aligned spans and parse with from_csv under an explicit DDL
    schema. Integer-only measures (count/min/max/sum of keys) so the
    text round-trip is exact; the query RAISES if any whole-file GET
    happened, same in-gate enforcement as the parquet twin. 64 KiB
    partition spans force a genuinely parallel multi-range scan. The
    eager localCheckpoint materializes before the server dies."""
    import tempfile

    import pyarrow as pa
    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq

    from ..sources.httpranged import (
        RangeFileHandler,
        read_csv_url_ranged,
        serve_directory_ranged,
    )

    src = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    src = src.cast(
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderpriority", pa.string()),
            ]
        )
    )
    tmp = tempfile.mkdtemp(prefix="http_csv_")
    pacsv.write_csv(src, f"{tmp}/orders.csv")
    httpd, port = serve_directory_ranged(tmp)
    RangeFileHandler.range_count = RangeFileHandler.full_count = 0
    try:
        df = read_csv_url_ranged(
            spark,
            f"http://127.0.0.1:{port}/orders.csv",
            schema="o_orderkey bigint, o_custkey bigint, "
            "o_orderpriority string",
            # 1 MiB spans: still a genuinely parallel multi-range scan at
            # every SF, without serializing hundreds of tiny GETs through
            # the single-threaded test server
            partition_bytes=1 << 20,
        )
        out = (
            df.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.min("o_orderkey").cast("bigint").alias("min_key"),
                F.max("o_orderkey").cast("bigint").alias("max_key"),
                F.sum("o_custkey").cast("bigint").alias("sum_cust"),
            )
            .localCheckpoint(eager=True)
        )
        if RangeFileHandler.full_count > 0:
            raise ValueError(
                "roundtrip_csv_http_ranged: a whole-file GET ran "
                f"({RangeFileHandler.full_count}); the ranged reader must "
                "touch only line-aligned byte spans"
            )
        return out
    finally:
        httpd.shutdown()


@query(
    "roundtrip_json_http_ranged",
    oracle="""
    SELECT o_orderstatus,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
      CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
      CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def roundtrip_json_http_ranged(spark, sf_dir):
    """Remote NDJSON over HTTP Range requests, oracle-gated end-to-end
    (round-8 VERDICT "next" #4): orders is exported line-delimited,
    served by the Range-honoring server, and read via
    read_json_url_ranged — executors range-read newline-aligned spans
    and parse with from_json under the explicit DDL schema (no inference
    pass, which a 100 TB remote read can't afford). Integer-only
    measures, in-gate zero-whole-file-GET enforcement, eager
    materialization before server teardown — the same contract as the
    CSV and parquet twins."""
    import tempfile

    import pyarrow.parquet as pq

    from ..sources.httpranged import (
        RangeFileHandler,
        read_json_url_ranged,
        serve_directory_ranged,
    )

    src = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderstatus"],
    ).to_pandas()
    tmp = tempfile.mkdtemp(prefix="http_json_")
    # vectorized NDJSON export (a per-row json.dumps loop cost more than
    # the ranged scan it feeds at sf0.1)
    src.to_json(f"{tmp}/orders.ndjson", orient="records", lines=True)
    httpd, port = serve_directory_ranged(tmp)
    RangeFileHandler.range_count = RangeFileHandler.full_count = 0
    try:
        df = read_json_url_ranged(
            spark,
            f"http://127.0.0.1:{port}/orders.ndjson",
            schema="o_orderkey bigint, o_custkey bigint, "
            "o_orderstatus string",
            # 1 MiB spans: still a genuinely parallel multi-range scan at
            # every SF, without serializing hundreds of tiny GETs through
            # the single-threaded test server
            partition_bytes=1 << 20,
        )
        out = (
            df.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.min("o_orderkey").cast("bigint").alias("min_key"),
                F.max("o_orderkey").cast("bigint").alias("max_key"),
                F.sum("o_custkey").cast("bigint").alias("sum_cust"),
            )
            .localCheckpoint(eager=True)
        )
        if RangeFileHandler.full_count > 0:
            raise ValueError(
                "roundtrip_json_http_ranged: a whole-file GET ran "
                f"({RangeFileHandler.full_count}); the ranged reader must "
                "touch only line-aligned byte spans"
            )
        return out
    finally:
        httpd.shutdown()


@query(
    "roundtrip_parquet_http_multifile",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
      CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
      CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        AS cents
    FROM orders
    WHERE o_orderkey BETWEEN 1000 AND 2000
    """,
)
def roundtrip_parquet_http_multifile(spark, sf_dir):
    """Multi-file remote parquet over HTTP Range requests (round-8
    VERDICT "next" #7): orders is key-sorted, split ROUND-ROBIN into two
    parquet files (so each file spans the full key range and is itself
    key-sorted — the layout a partitioned remote dataset has per shard),
    each written with many small row groups, served by the
    Range-honoring server, and scanned with
    read_parquet_url_ranged([url1, url2]) — one partition per
    (file, row group), footer probe + zone-map skipping applied PER
    FILE: the remote analogue of the local multi-file union (SURVEY S5)
    and the last step to DuckDB-httpfs parity for partitioned remote
    datasets. The query RAISES unless pruning drops groups in BOTH
    files while keeping at least one in EACH (so both files' bodies are
    genuinely read) and zero whole-file GETs ran. The exact .filter()
    on top makes the aggregate hash-match DuckDB reading the original
    single-file table."""
    import tempfile

    import pyarrow.parquet as pq

    from ..sources.httpranged import (
        RangeFileHandler,
        read_parquet_url_ranged,
        serve_directory_ranged,
    )

    src = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice"],
    ).sort_by("o_orderkey")
    tmp = tempfile.mkdtemp(prefix="http_multi_")
    for i in (0, 1):
        shard = src.take(list(range(i, src.num_rows, 2)))
        pq.write_table(
            shard, f"{tmp}/part{i}.parquet", row_group_size=500
        )
    httpd, port = serve_directory_ranged(tmp)
    RangeFileHandler.range_count = RangeFileHandler.full_count = 0
    try:
        urls = [
            f"http://127.0.0.1:{port}/part0.parquet",
            f"http://127.0.0.1:{port}/part1.parquet",
        ]
        df = read_parquet_url_ranged(
            spark, urls, rg_filter=("o_orderkey", 1000, 2000)
        )
        n_total_groups = sum(
            pq.read_metadata(f"{tmp}/part{i}.parquet").num_row_groups
            for i in (0, 1)
        )
        # plan the same scan once more reader-side to see WHICH file
        # each surviving partition belongs to (the DataFrame API hides
        # InputPartition values); footers only, zero body bytes
        from ..sources.httpranged import HttpParquetReader

        planned = HttpParquetReader(
            {
                "urls": "\n".join(urls),
                "rgfiltercol": "o_orderkey",
                "rgfilterlo": "1000",
                "rgfilterhi": "2000",
            }
        ).partitions()
        kept_files = {p.value[0] for p in planned}
        n_kept = df.rdd.getNumPartitions()
        if not 0 < n_kept < n_total_groups:
            raise ValueError(
                f"multi-file zone-map pruning kept {n_kept} of "
                f"{n_total_groups} row groups; expected a strict,"
                " non-empty subset"
            )
        if kept_files != set(urls):
            raise ValueError(
                "round-robin shards both span the key range, so pruning "
                f"must keep groups in BOTH files; kept only {kept_files}"
            )
        out = (
            df.filter(F.col("o_orderkey").between(1000, 2000))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.min("o_orderkey").cast("bigint").alias("min_key"),
                F.max("o_orderkey").cast("bigint").alias("max_key"),
                F.sum(
                    F.floor(F.col("o_totalprice") * 100).cast("bigint")
                )
                .cast("bigint")
                .alias("cents"),
            )
            .localCheckpoint(eager=True)
        )
        if RangeFileHandler.full_count > 0:
            raise ValueError(
                "roundtrip_parquet_http_multifile: a whole-file GET ran "
                f"({RangeFileHandler.full_count})"
            )
        return out
    finally:
        httpd.shutdown()


@query(
    "roundtrip_parquet_http_hive",
    oracle="""
    SELECT o_orderstatus AS status,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
      CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
      CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderstatus
    """,
)
def roundtrip_parquet_http_hive(spark, sf_dir):
    """Hive-partitioned remote parquet manifest (round-9 VERDICT "next"
    #3 — the last httpfs-parity corner): orders is laid out as
    ``status=<v>/part0.parquet`` hive directories, a manifest lists the
    relative entries, and the scan (read_parquet_manifest_ranged with
    hive=True) parses the ``key=value`` path segments into a string
    partition column. The caller's ``status = 'F'`` filter reaches
    HttpParquetReader.pushFilters (Catalyst EqualTo pushdown into the
    Python DataSource) and prunes the other files BEFORE their footers
    are probed — the query RAISES if any pruned file's path shows up in
    the request log AT ALL (stronger than the zero-full-GET gates: not
    even a HEAD), and if any parquet body is fetched un-ranged. The
    grouped aggregate carries the path-derived partition column through
    to the oracle comparison, so the hash check also covers the value
    parsing (including the percent-decode path). DuckDB gives the
    reference this shape via httpfs + hive_partitioning=1
    (/root/reference/README.md:43,53)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..sources.httpranged import (
        RangeFileHandler,
        read_parquet_manifest_ranged,
        serve_directory_ranged,
    )

    src = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderstatus"],
    )
    statuses = sorted(
        pc.unique(src.column("o_orderstatus")).to_pylist()
    )
    tmp = tempfile.mkdtemp(prefix="http_hive_")
    entries = []
    for st in statuses:
        os.makedirs(f"{tmp}/status={st}")
        shard = src.filter(
            pc.equal(src.column("o_orderstatus"), st)
        ).drop_columns(["o_orderstatus"])  # hive: the value lives in the path
        pq.write_table(
            shard, f"{tmp}/status={st}/part0.parquet", row_group_size=2000
        )
        entries.append(f"status={st}/part0.parquet")
    # 'F' first so the schema probe (always the first manifest entry's
    # footer) targets a SURVIVING file and the pruned ones go untouched
    entries.sort(key=lambda e: (not e.startswith("status=F"), e))
    with open(f"{tmp}/manifest.txt", "w") as fh:
        fh.write("\n".join(entries) + "\n")
    httpd, port = serve_directory_ranged(tmp)
    RangeFileHandler.range_count = RangeFileHandler.full_count = 0
    RangeFileHandler.paths = []
    RangeFileHandler.full_paths = []
    try:
        df = read_parquet_manifest_ranged(
            spark, f"http://127.0.0.1:{port}/manifest.txt", hive=True
        )
        out = (
            df.filter(F.col("status") == "F")
            .groupBy("status")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.min("o_orderkey").cast("bigint").alias("min_key"),
                F.max("o_orderkey").cast("bigint").alias("max_key"),
                F.sum("o_custkey").cast("bigint").alias("sum_cust"),
            )
            .localCheckpoint(eager=True)
        )
        pruned_touched = sorted(
            p
            for p in RangeFileHandler.paths
            if p.endswith(".parquet") and "status=F" not in p
        )
        if pruned_touched:
            raise ValueError(
                "roundtrip_parquet_http_hive: the status='F' pushdown "
                "must skip the other partitions' files entirely (no "
                f"HEAD, no footer probe), but the server saw "
                f"{pruned_touched}"
            )
        full_parquet = [
            p for p in RangeFileHandler.full_paths if p.endswith(".parquet")
        ]
        if full_parquet:
            raise ValueError(
                "roundtrip_parquet_http_hive: whole-file GET of "
                f"{full_parquet}; parquet bodies must be range-read"
            )
        return out
    finally:
        httpd.shutdown()


@query(
    "roundtrip_parquet_http_hive_typed",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
      CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
    FROM orders
    WHERE year(o_orderdate) >= 1999
    GROUP BY year(o_orderdate)
    """,
)
def roundtrip_parquet_http_hive_typed(spark, sf_dir):
    """TYPED hive partitions with RANGE pushdown — the date-partitioned
    lake pattern at 100 TB: orders is laid out as ``year=<y>`` hive
    directories (year(o_orderdate), spanning several years at every SF),
    hive_types declares the partition column as int, and the caller's
    ``year >= 1999`` range filter is pushed into
    HttpParquetHiveReader.pushFilters, compared on the PARSED value
    (never lexicographic — that is exactly why untyped string partitions
    refuse range pushdown), pruning every older year's file BEFORE any
    footer probe. The query RAISES if a pruned year's file shows up in
    the request log at all, if fewer than two years survive or fewer
    than two are pruned (the fixture must genuinely exercise both
    sides), or if any parquet body is fetched un-ranged. The per-year
    aggregate carries the typed path-derived column through the DuckDB
    comparison."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..sources.httpranged import (
        RangeFileHandler,
        read_parquet_manifest_ranged,
        serve_directory_ranged,
    )

    src = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    yr = pc.year(src.column("o_orderdate"))
    src = src.drop_columns(["o_orderdate"]).append_column("yr", yr)
    years = sorted(pc.unique(src.column("yr")).to_pylist())
    if sum(y >= 1999 for y in years) < 2 or sum(y < 1999 for y in years) < 2:
        raise ValueError(
            f"fixture needs >=2 years on each side of 1999, got {years}"
        )
    tmp = tempfile.mkdtemp(prefix="http_hive_typed_")
    entries = []
    for y in years:
        os.makedirs(f"{tmp}/year={y}")
        shard = src.filter(pc.equal(src.column("yr"), y)).drop_columns(
            ["yr"]
        )
        pq.write_table(shard, f"{tmp}/year={y}/part0.parquet")
        entries.append(f"year={y}/part0.parquet")
    # newest year first: the schema probe targets the first entry, which
    # must be a SURVIVOR so pruned years stay provably untouched
    entries.reverse()
    with open(f"{tmp}/manifest.txt", "w") as fh:
        fh.write("\n".join(entries) + "\n")
    httpd, port = serve_directory_ranged(tmp)
    RangeFileHandler.range_count = RangeFileHandler.full_count = 0
    RangeFileHandler.paths = []
    RangeFileHandler.full_paths = []
    try:
        df = read_parquet_manifest_ranged(
            spark,
            f"http://127.0.0.1:{port}/manifest.txt",
            hive=True,
            hive_types={"year": "int"},
        )
        out = (
            df.filter(F.col("year") >= 1999)
            .groupBy("year")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.min("o_orderkey").cast("bigint").alias("min_key"),
                F.sum("o_custkey").cast("bigint").alias("sum_cust"),
            )
            .select(
                F.col("year").cast("bigint").alias("year"),
                "n_orders",
                "min_key",
                "sum_cust",
            )
            .localCheckpoint(eager=True)
        )
        pruned_touched = sorted(
            p
            for p in RangeFileHandler.paths
            if p.endswith(".parquet")
            and int(p.split("year=")[1].split("/")[0]) < 1999
        )
        if pruned_touched:
            raise ValueError(
                "roundtrip_parquet_http_hive_typed: year >= 1999 must "
                "skip older partitions entirely (no HEAD, no footer "
                f"probe), but the server saw {pruned_touched}"
            )
        full_parquet = [
            p for p in RangeFileHandler.full_paths if p.endswith(".parquet")
        ]
        if full_parquet:
            raise ValueError(
                "roundtrip_parquet_http_hive_typed: whole-file GET of "
                f"{full_parquet}; parquet bodies must be range-read"
            )
        return out
    finally:
        httpd.shutdown()
