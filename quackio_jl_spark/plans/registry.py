"""Query/oracle registry backing the driver contract (__spark_entry__.py).

Each registered query is a ``(spark, sf_dir) -> DataFrame`` callable; most
carry an equivalent DuckDB ANSI-SQL oracle string. Aliasing rule: every
computed column is aliased identically in the Spark plan and the oracle SQL
(the driver sorts columns by name and hash-compares values).

Registration is import-driven: importing ``quackio_jl_spark.registry``
pulls in every module that defines queries.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# ---------------------------------------------------------------- table cache
# spark.read.parquet() costs ~130 ms per call even warm (footer read +
# reader setup over py4j), and the bench's timed region includes the query
# builder — across 131 benched queries x 2-3 table() calls each, repeated
# footer reads were ~25-30% of the whole suite's wall-clock (round-11
# measurement; guide §5 "the driver should do almost no data work").
# A DataFrame is an immutable lazy plan handle: caching it per
# (live SparkContext, sf_dir, table) returns the identical plan, and every
# action still scans the parquet afresh — nothing about RESULTS is cached.
# Keying follows fragcache: applicationId + startTime identify one live
# context (never a recycled id()); entries of stopped contexts are evicted
# on the next call. Values are plan handles, not persisted data, so there
# is no storage to bound — _MAX_TABLE_ENTRIES is plain dict hygiene for a
# long-lived multi-dataset service.
_TABLE_CACHE: dict = {}
_TABLE_LOCK = threading.Lock()
_MAX_TABLE_ENTRIES = 256


def clear_table_cache() -> None:
    """Drop every cached table handle (tests; dataset refresh)."""
    with _TABLE_LOCK:
        _TABLE_CACHE.clear()


def query(name: str, oracle: str | None = None):
    """Decorator: register a query and (optionally) its DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check —
    reserved for genuinely non-SQL-expressible operators."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to TIMESTAMP.

    The testdata parquet stores naive timestamps (isAdjustedToUTC=false), which
    Spark >= 3.4 infers as TIMESTAMP_NTZ. DuckDB reads the same column as plain
    TIMESTAMP and treats the wall-clock value as the instant; with the session
    timezone pinned to UTC (session.py) this cast is the identical
    naive-as-UTC interpretation, and it unlocks epoch functions (unix_micros,
    unix_timestamp) that reject NTZ input. Columns already TIMESTAMP pass
    through untouched."""
    ntz = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
    if not ntz:
        return df
    from pyspark.sql import functions as F

    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table (TESTDATA.md contract).

    Returns a cached plan handle when the same (session, sf_dir, name) was
    loaded before — identical lazy plan, parquet still scanned per action
    (see the _TABLE_CACHE note above).

    Historical testdata generations stored events.ts as TIMESTAMP(NANOS),
    which Spark's vectorized parquet reader rejects; we read it as long
    (nanosAsLong) and truncate to microseconds with integer division —
    bit-identical to DuckDB's nanos->micros truncation. (Double division
    would lose precision: at 1.7e18 ns a double's ulp is ~256 ns.)
    Current generations store naive micros; see _normalize_timestamps."""
    sc = spark.sparkContext
    try:
        # Session identity in the key (ADVICE r11): a DataFrame is bound
        # to its SparkSession (conf, registered sources, session state),
        # so two sessions over one context (spark.newSession()) must not
        # share handles. id(spark) is safe here because the value tuple
        # below keeps a strong reference to ``spark`` for the entry's
        # lifetime — the id cannot be recycled while the entry lives.
        key = (sc.applicationId, sc.startTime, id(spark), sf_dir, name)
    except Exception:
        key = None
    if key is not None:
        with _TABLE_LOCK:
            hit = _TABLE_CACHE.get(key)
            if hit is not None and getattr(hit[0], "_jsc", None) is not None:
                return hit[2]
    df = _load_table(spark, sf_dir, name)
    if key is not None:
        with _TABLE_LOCK:
            for k in [
                k
                for k, (osc, _s, _v) in _TABLE_CACHE.items()
                if getattr(osc, "_jsc", None) is None
            ]:
                del _TABLE_CACHE[k]
            # capacity: evict oldest entries (insertion order), never the
            # whole cache (ADVICE r11 — wholesale clear() dropped live
            # entries in the long-lived multi-dataset service case)
            while len(_TABLE_CACHE) >= _MAX_TABLE_ENTRIES:
                del _TABLE_CACHE[next(iter(_TABLE_CACHE))]
            _TABLE_CACHE[key] = (sc, spark, df)
    return df


def _load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _normalize_timestamps(df)
    return _normalize_timestamps(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
