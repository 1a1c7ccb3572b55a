"""Local stand-in for the driver's t2 oracle gate.

Runs every queries() entry at a given sf_dir, runs its oracle_sql() twin in
DuckDB over the same parquet, and compares row count + column names + an
order-insensitive value comparison (exact on sorted rows). Prints per-query
PASS/FAIL and a summary; exits nonzero on failure.

Usage: python tools/check_correctness.py [--json out.json] [sf_dir] [query ...]

--json writes a per-query artifact in the driver's CORRECTNESS_r0x.json
shape (rows/schema/hash matches + row counts) so full-gate runs are
reproducible evidence committed to the repo, not just a console claim.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")


def normalize(rows, cols):
    """Rows -> sorted list of tuples with columns sorted by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from quackio_jl_spark.session import get_spark

    argv = sys.argv[1:]
    json_path = None
    if argv and argv[0] == "--json":
        json_path = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    # SPARK_GRAFT_CPUS must win here — the partition-count-invariance check
    # (PLANS.md) runs this gate at 7 and 32 shuffle partitions.
    import os

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # Free persisted storage that no live fragment owns between queries:
    # a 558-query gate in one session otherwise accumulates every
    # in-query persist/localCheckpoint for its whole lifetime (guide §5).
    from quackio_jl_spark.fragcache import release_foreign_storage

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    records: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        release_foreign_storage(spark)
        t0 = time.time()
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        records[name] = rec
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception as e:
            failures.append(name)
            rec["err"] = f"spark error: {type(e).__name__}: {str(e)[:300]}"
            print(f"FAIL {name}: {rec['err']}")
            continue
        if name not in oracles:
            rec.update(rows_match=True, schema_match=True, hash_match=None,
                       err="rows-only (no oracle by design)")
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            rec["oracle_rows"] = len(orows)
        except Exception as e:
            failures.append(name)
            rec["err"] = f"oracle error: {type(e).__name__}: {str(e)[:300]}"
            print(f"FAIL {name}: {rec['err']}")
            continue
        status = []
        rec["rows_match"] = len(srows) == len(orows)
        if not rec["rows_match"]:
            status.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        rec["schema_match"] = sorted(scols) == sorted(ocols)
        if not rec["schema_match"]:
            status.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not status:
            ns, no = normalize(srows, scols), normalize(orows, ocols)
            rec["hash_match"] = ns == no
            if not rec["hash_match"]:
                diffs = [(a, b) for a, b in zip(ns, no) if a != b][:3]
                status.append(f"values differ, first diffs: {diffs}")
        if status:
            failures.append(name)
            rec["err"] = "; ".join(status)
            print(f"FAIL {name}: {rec['err']}")
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    if json_path:
        import json
        import platform

        import pyspark

        # Round 5's one driver-red row was DuckDB-build sensitivity; gate
        # artifacts now record the engines they were produced with so a
        # cross-environment mismatch is diagnosable from the artifact alone.
        records["_env"] = {
            "duckdb": duckdb.__version__,
            "pyspark": pyspark.__version__,
            "python": platform.python_version(),
            "platform": platform.platform(),
            "sf_dir": sf_dir,
        }
        with open(json_path, "w") as f:
            json.dump(records, f, indent=2)
        print(f"wrote {json_path} ({len(records) - 1} queries)")

    print(f"\n{len(failures)} failures / {len(only) if only else len(queries)} checked")
    if failures:
        print("failed:", ", ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
