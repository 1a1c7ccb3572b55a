"""Per-query cross-engine output-type comparison (round-7 VERDICT "next" #5).

For every oracle-gated query, capture the Spark result schema (analysis
only — the DataFrame is never executed) and the DuckDB DESCRIBE of its
oracle, canonicalize both to a shared type alphabet, and record the two
type vectors side by side in SCHEMA_VECTORS.json. Any query whose vectors
disagree is a latent driver-red: a harness that materializes the oracle
through pandas/Arrow renders DECIMAL vs DOUBLE, HUGEINT vs BIGINT, or
DATE vs TIMESTAMP differently from Spark even when the VALUES compare
equal row-by-row — the exact class of bug behind three rounds of
dedup_cdc_chunks divergence (an uncast HUGEINT SUM).

Canonical alphabet: int (all signed integer widths — Python ints compare
equal across widths in every harness), double (DOUBLE/FLOAT/REAL),
decimal(p,s) (exact — a scale drift changes the rendered string), str,
bool, date, timestamp, bin, list<T>, struct<...>, plus a passthrough for
anything unrecognized (flagged by construction since the other engine
won't produce the same spelling).

Usage: python tools/schema_vectors.py [sf_dir]   (exit 1 on mismatches)
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, ".")

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
)


def canon_duckdb(t: str) -> str:
    t = t.strip().upper()
    if t.startswith("DECIMAL"):
        return "decimal" + t[len("DECIMAL") :].replace(" ", "").lower()
    if t.endswith("[]"):
        return f"list<{canon_duckdb(t[:-2])}>"
    m = re.fullmatch(r"STRUCT\((.*)\)", t, flags=re.DOTALL)
    if m:
        fields = []
        depth = 0
        cur = ""
        for ch in m.group(1) + ",":
            if ch == "(" or ch == "<":
                depth += 1
            elif ch == ")" or ch == ">":
                depth -= 1
            if ch == "," and depth == 0:
                name, _, ft = cur.strip().partition(" ")
                name = name.strip('"').lower()
                fields.append(f"{name}:{canon_duckdb(ft)}")
                cur = ""
            else:
                cur += ch
        return "struct<" + ",".join(fields) + ">"
    return {
        "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
        "HUGEINT": "HUGEINT",  # deliberately NOT canonicalized: always flags
        "UBIGINT": "UBIGINT", "UINTEGER": "UINTEGER",
        "USMALLINT": "USMALLINT", "UTINYINT": "UTINYINT",
        "UHUGEINT": "UHUGEINT",
        "DOUBLE": "double", "FLOAT": "double", "REAL": "double",
        "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
        "TIMESTAMP": "timestamp", "TIMESTAMP WITH TIME ZONE": "timestamp",
        "BLOB": "bin",
    }.get(t, t.lower())


def canon_spark(t) -> str:
    from pyspark.sql import types as T

    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(t, (T.DoubleType, T.FloatType)):
        return "double"
    if isinstance(t, T.DecimalType):
        return f"decimal({t.precision},{t.scale})"
    if isinstance(t, T.StringType):
        return "str"
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(t, T.BinaryType):
        return "bin"
    if isinstance(t, T.ArrayType):
        return f"list<{canon_spark(t.elementType)}>"
    if isinstance(t, T.StructType):
        return (
            "struct<"
            + ",".join(f"{f.name.lower()}:{canon_spark(f.dataType)}" for f in t.fields)
            + ">"
        )
    return t.simpleString()


def run(sf_dir: str, out_path: str | None = "SCHEMA_VECTORS.json") -> dict:
    import duckdb

    import __spark_entry__ as entrymod
    from quackio_jl_spark.session import get_spark

    spark = get_spark(app_name="schema_vectors", cpus=8, driver_memory="8g")
    con = duckdb.connect()
    for t in _TABLES.split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    report: dict[str, dict] = {}
    mismatches = 0
    for name in sorted(queries):
        if name not in oracles:
            continue  # rows-only by design: no oracle vector to compare
        rec: dict = {}
        report[name] = rec
        try:
            sdf = queries[name](spark, sf_dir)
            svec = {f.name.lower(): canon_spark(f.dataType) for f in sdf.schema.fields}
        except Exception as e:
            rec["err"] = f"spark: {type(e).__name__}: {str(e)[:200]}"
            mismatches += 1
            continue
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            ovec = {row[0].lower(): canon_duckdb(row[1]) for row in desc}
        except Exception as e:
            rec["err"] = f"oracle: {type(e).__name__}: {str(e)[:200]}"
            mismatches += 1
            continue
        rec["spark"] = svec
        rec["duckdb"] = ovec
        diff = {
            c: (svec.get(c), ovec.get(c))
            for c in set(svec) | set(ovec)
            if svec.get(c) != ovec.get(c)
        }
        rec["match"] = not diff
        if diff:
            rec["diff"] = diff
            mismatches += 1
    summary = {
        "_summary": {
            "queries_compared": len(report),
            "mismatches": mismatches,
            "sf_dir": sf_dir,
            "duckdb": duckdb.__version__,
        }
    }
    summary.update(report)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {out_path}")
    for name, rec in report.items():
        if rec.get("err") or not rec.get("match", False):
            print(f"MISMATCH {name}: {rec.get('diff') or rec.get('err')}")
    print(f"{mismatches} mismatches / {len(report)} compared")
    return summary


if __name__ == "__main__":
    # usage: schema_vectors.py [sf_dir] [out_path] — type drift can be
    # data-dependent (DECIMAL precision widening), so both the sf0.001
    # and the sf0.01 grading data get a pinned artifact:
    #   python tools/schema_vectors.py /root/testdata/sf0.001
    #   python tools/schema_vectors.py /root/testdata/sf0.01 SCHEMA_VECTORS_SF0.01.json
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "SCHEMA_VECTORS.json"
    s = run(sf, out)
    sys.exit(1 if s["_summary"]["mismatches"] else 0)
