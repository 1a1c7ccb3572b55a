"""Reader/writer parity with the reference's own tests (SURVEY.md §5):
golden-file byte assertions, round-trip invariants, format guard, multi-file
union, hostile identifiers, metadata round-trip.

Reference citations per test are to /root/reference/test/runtests.jl.
"""

import gzip
import os

import pytest

from quackio_jl_spark import (
    read_csv,
    read_file,
    read_json,
    read_kv_metadata,
    read_parquet,
    write_table,
)


def _lines(path):
    with open(path) as f:
        return f.read().splitlines()


# ---------------------------------------------------------------- golden CSV

def test_csv_golden(tmp_path, spark, basic_df):
    """runtests.jl:16 — byte-exact CSV: 'a,b,c' / '1,x,1.0' / '2,yz,'."""
    p = str(tmp_path / "t.csv")
    write_table(basic_df, p)
    assert _lines(p) == ["a,b,c", "1,x,1.0", "2,yz,"]


def test_csv_delim_golden(tmp_path, spark, basic_df):
    """runtests.jl:29 — delim=';' golden."""
    p = str(tmp_path / "t.csv")
    write_table(basic_df, p, delim=";")
    assert _lines(p) == ["a;b;c", "1;x;1.0", "2;yz;"]


def test_csv_no_header(tmp_path, spark, basic_df):
    """runtests.jl:58 — header=false."""
    p = str(tmp_path / "t.csv")
    write_table(basic_df, p, header=False)
    assert _lines(p) == ["1,x,1.0", "2,yz,"]


def test_json_golden(tmp_path, spark, basic_df):
    """runtests.jl:43 — NDJSON with explicit null."""
    p = str(tmp_path / "t.json")
    write_table(basic_df, p)
    assert _lines(p) == ['{"a":1,"b":"x","c":1.0}', '{"a":2,"b":"yz","c":null}']


def test_parquet_binary_sanity(tmp_path, spark, basic_df):
    """runtests.jl:38-39 — PAR1 magic, sane size."""
    p = str(tmp_path / "t.parquet")
    write_table(basic_df, p)
    raw = open(p, "rb").read()
    assert raw[:4] == b"PAR1"
    assert 300 < len(raw) < 5000


def test_format_uppercase_rejected(tmp_path, spark, basic_df):
    """runtests.jl:35-36 — uppercase format must throw (injection guard)."""
    with pytest.raises(ValueError):
        write_table(basic_df, str(tmp_path / "t.csv"), format="CSV")


# ---------------------------------------------------------------- round-trips

def _as_rows(df):
    return sorted([tuple(r) for r in df.collect()])


@pytest.mark.parametrize("ext", ["csv", "parquet", "json"])
def test_roundtrip(tmp_path, spark, basic_df, ext):
    """runtests.jl:18-26,40,44 — isequal(read(write(tbl)), tbl)."""
    p = str(tmp_path / f"t.{ext}")
    write_table(basic_df, p)
    readers = {"csv": read_csv, "parquet": read_parquet, "json": read_json}
    back = readers[ext](spark, p)
    assert _as_rows(back.select("a", "b", "c")) == _as_rows(basic_df)


def test_roundtrip_gzip_csv(tmp_path, spark, basic_df):
    """runtests.jl:31-33 — gzip via filename extension."""
    p = str(tmp_path / "t.csv.gz")
    write_table(basic_df, p, compression="gzip")
    with gzip.open(p, "rt") as f:
        assert f.read().splitlines()[0] == "a,b,c"
    back = read_csv(spark, p)
    assert _as_rows(back.select("a", "b", "c")) == _as_rows(basic_df)


def test_eager_lazy_equivalence(tmp_path, spark, basic_df):
    """runtests.jl:107-113 — eager materializations agree with the lazy handle."""
    p = str(tmp_path / "t.csv")
    write_table(basic_df, p)
    lazy = read_csv(spark, p)  # DataFrame == SQLCollection analogue
    rows = read_csv(spark, p, materializer="rows")
    pdf = read_csv(spark, p, materializer="pandas")
    assert sorted(map(tuple, rows)) == _as_rows(lazy)
    # pandas represents SQL NULL as NaN; normalize for comparison
    norm = [
        tuple(None if isinstance(v, float) and v != v else v for v in t)
        for t in pdf.itertuples(index=False)
    ]
    assert sorted(norm) == _as_rows(lazy)


# ------------------------------------------------- pushdown kwargs / renames

def test_select_limit_pushdown(tmp_path, spark, basic_df):
    """doc :17-19, runtests.jl:136-138 — select=, rename pairs, limit=."""
    p = str(tmp_path / "t.csv")
    write_table(basic_df, p)
    df = read_csv(spark, p, select=["a", "b"])
    assert df.columns == ["a", "b"]
    df2 = read_csv(spark, p, select=[("a", "c")])
    assert df2.columns == ["c"]
    assert _as_rows(df2) == [(1,), (2,)]
    df3 = read_csv(spark, p, limit=1)
    assert df3.count() == 1


def test_multi_file_union(tmp_path, spark, basic_df):
    """runtests.jl:78-82 — [f1, f2] concatenates: a=[1,2,1,2]."""
    p1, p2 = str(tmp_path / "t1.csv"), str(tmp_path / "t2.csv")
    write_table(basic_df, p1)
    write_table(basic_df, p2)
    df = read_csv(spark, [p1, p2])
    assert sorted(r["a"] for r in df.collect()) == [1, 1, 2, 2]


def test_names_positional_rename(tmp_path, spark, basic_df):
    """runtests.jl:72-76 — names= positional rename incl. hostile identifiers."""
    p = str(tmp_path / "t.csv")
    write_table(basic_df, p)
    hostile = ["xx", "абв ' \"", "\\ 1"]
    df = read_csv(spark, p, names=hostile)
    assert df.columns == hostile


def test_columns_explicit_schema(tmp_path, spark, basic_df):
    """runtests.jl:67-71 — columns= full schema override (float->double etc.)."""
    p = str(tmp_path / "t.csv")
    write_table(basic_df, p)
    df = read_csv(spark, p, columns={"a": "float", "b": "varchar", "c": "int"})
    assert dict(df.dtypes) == {"a": "double", "b": "string", "c": "bigint"}


def test_names_with_columns_columns_wins(tmp_path, spark, basic_df):
    """names= combined with columns= in ONE read: DuckDB (the reference's
    kwarg pass-through engine) lets columns= define the full schema and
    ignores names= — verified against duckdb 1.0 directly. Kwarg order
    cannot matter (Python kwargs), but both spellings are exercised."""
    p = str(tmp_path / "t.csv")
    write_table(basic_df, p)
    schema = {"p": "bigint", "q": "varchar", "r": "double"}
    df1 = read_csv(spark, p, columns=schema, names=["u", "v", "w"])
    df2 = read_csv(spark, p, names=["u", "v", "w"], columns=schema)
    for df in (df1, df2):
        assert df.columns == ["p", "q", "r"]
        assert dict(df.dtypes) == {"p": "bigint", "q": "string", "r": "double"}
    # and the DuckDB oracle agrees on the same file
    import duckdb

    r = duckdb.connect().execute(
        f"SELECT * FROM read_csv('{p}', "
        "columns={'p': 'BIGINT', 'q': 'VARCHAR', 'r': 'DOUBLE'}, "
        "names=['u','v','w'])"
    )
    assert [c[0] for c in r.description] == ["p", "q", "r"]
    assert sorted(r.fetchall()) == sorted(
        tuple(row) for row in df1.collect()
    )


def test_auto_type_candidates(tmp_path, spark, basic_df):
    """runtests.jl:66 — restrict inference to int/varchar: c becomes string."""
    p = str(tmp_path / "t.csv")
    write_table(basic_df, p)
    df = read_csv(spark, p, auto_type_candidates=["int", "varchar"])
    d = dict(df.dtypes)
    assert d["c"] == "string"
    assert d["a"] in ("int", "bigint")


def test_hostile_column_rename(tmp_path, spark):
    """runtests.jl:140-142 — column 'a b' renamed to 'c d'."""
    df = spark.createDataFrame([(1,), (2,)], schema="`a b` long")
    p = str(tmp_path / "t.csv")
    write_table(df, p)
    back = read_csv(spark, p, select=[("a b", "c d")])
    assert back.columns == ["c d"]
    assert _as_rows(back) == [(1,), (2,)]


def test_hostile_file_path(tmp_path, spark, basic_df):
    """runtests.jl:52-56 — paths with spaces and quotes round-trip."""
    p = str(tmp_path / "t ' quote ' .csv")
    write_table(basic_df, p)
    back = read_csv(spark, p)
    assert _as_rows(back.select("a", "b", "c")) == _as_rows(basic_df)


# -------------------------------------------------------------- format guess

@pytest.mark.slow
def test_read_file_guessing(tmp_path, spark, basic_df):
    """runtests.jl:116-126 — format sniffed from extension."""
    for ext in ("csv", "parquet", "json"):
        p = str(tmp_path / f"t.{ext}")
        write_table(basic_df, p)
        df = read_file(spark, p)
        assert _as_rows(df.select("a", "b", "c")) == _as_rows(basic_df)


def test_read_file_rejects_kwargs_when_guessed(tmp_path, spark, basic_df):
    """src/QuackIO.jl:85-89 — kwargs need explicit filetype."""
    p = str(tmp_path / "t.csv")
    write_table(basic_df, p)
    with pytest.raises(ValueError):
        read_file(spark, p, delim=";")
    df = read_file(spark, p, filetype="csv", delim=",")
    assert df.count() == 2


# ------------------------------------------------------------------- metadata

def test_parquet_kv_metadata_roundtrip(tmp_path, spark, basic_df):
    """runtests.jl:158-165 — KV metadata with quote-y values and
    stringified non-strings; zstd compression; internal keys excluded."""
    p = str(tmp_path / "t.parquet")
    write_table(basic_df, p, kv_metadata={"writer": "Quack'IO", "1": 2}, compression="zstd")
    meta = read_kv_metadata(p)
    assert meta == {"writer": "Quack'IO", "1": "2"}
    back = read_parquet(spark, p)
    assert _as_rows(back.select("a", "b", "c")) == _as_rows(basic_df)


def test_kv_metadata_ignored_for_csv(tmp_path, spark, basic_df):
    """runtests.jl:171-173 — non-parquet formats ignore metadata."""
    p = str(tmp_path / "t.csv")
    write_table(basic_df, p, kv_metadata={"x": "y"})
    assert _lines(p)[0] == "a,b,c"


def test_directory_write_scale_path(tmp_path, spark, basic_df):
    """single_file=False — the 100 TB path: directory of parts, readable back."""
    p = str(tmp_path / "out_parquet")
    write_table(basic_df, p, format="parquet", single_file=False)
    assert os.path.isdir(p)
    back = read_parquet(spark, p)
    assert _as_rows(back.select("a", "b", "c")) == _as_rows(basic_df)


def test_force_quote_per_column_golden(tmp_path, spark, basic_df):
    """Reference golden (/root/reference/test/runtests.jl:61-64): only the
    named columns are quoted; nulls stay as unquoted empty fields."""
    from quackio_jl_spark.sources.writers import write_table

    p = str(tmp_path / "fq.csv")
    write_table(basic_df, p, force_quote=["a", "c"])
    assert open(p).read().splitlines() == ['a,b,c', '"1",x,"1.0"', '"2",yz,']
    write_table(basic_df, p, force_quote=("a", "c"))  # tuple form, same result
    assert open(p).read().splitlines() == ['a,b,c', '"1",x,"1.0"', '"2",yz,']


def test_write_modes(tmp_path, spark, basic_df):
    """Directory-mode write modes: overwrite replaces, append accumulates,
    ignore is a no-op on existing data, error raises."""
    import pytest

    from quackio_jl_spark.sources.readers import read_parquet
    from quackio_jl_spark.sources.writers import write_table

    p = str(tmp_path / "modes.parquet")
    write_table(basic_df, p, single_file=False)
    assert read_parquet(spark, p).count() == 2
    write_table(basic_df, p, single_file=False, mode="append")
    assert read_parquet(spark, p).count() == 4
    write_table(basic_df, p, single_file=False, mode="overwrite")
    assert read_parquet(spark, p).count() == 2
    write_table(basic_df, p, single_file=False, mode="ignore")
    assert read_parquet(spark, p).count() == 2
    with pytest.raises(Exception):
        write_table(basic_df, p, single_file=False, mode="error")


def test_single_file_write_modes(tmp_path, spark, basic_df):
    """Single-file mode honors error/ignore and REJECTS append instead of
    silently clobbering (the move-into-place mechanism can't append)."""
    p = str(tmp_path / "single.csv")
    write_table(basic_df, p)
    with pytest.raises(FileExistsError):
        write_table(basic_df, p, mode="error")
    before = _lines(p)
    write_table(basic_df.limit(1), p, mode="ignore")
    assert _lines(p) == before  # untouched
    with pytest.raises(ValueError, match="single_file"):
        write_table(basic_df, p, mode="append")
    write_table(basic_df.limit(1), p, mode="overwrite")
    assert len(_lines(p)) == 2  # header + 1 row


# ------------------------------------------------------------------- ORC

def test_orc_roundtrip_and_guessing(tmp_path, spark, basic_df):
    """ORC single-file write -> read_orc and extension-guessed read_file;
    gzip is translated to ORC's zlib codec."""
    from quackio_jl_spark import read_orc

    p = str(tmp_path / "t.orc")
    write_table(basic_df, p, compression="gzip")
    back = read_orc(spark, p).orderBy("a").collect()
    assert [(r["a"], r["b"], r["c"]) for r in back] == [(1, "x", 1.0), (2, "yz", None)]
    guessed = read_file(spark, p).orderBy("a").collect()
    assert [r["a"] for r in guessed] == [1, 2]


def test_orc_unknown_option_raises(tmp_path, spark, basic_df):
    from quackio_jl_spark.sources.options import UnknownOptionError

    with pytest.raises(UnknownOptionError):
        write_table(basic_df, str(tmp_path / "t.orc"), row_group_size=100)


def test_sharded_write_bounds_file_rows(tmp_path, spark):
    """maxRecordsPerFile via spark_options: every shard <= the cap, and the
    write actually sharded (more than one part file)."""
    df = spark.range(2000).selectExpr("id", "id * 2 AS v")
    out = str(tmp_path / "sharded")
    write_table(
        df, out, format="parquet", single_file=False,
        spark_options={"maxRecordsPerFile": "500"},
    )
    parts = [p for p in os.listdir(out) if p.startswith("part-")]
    assert len(parts) >= 2
    import pyarrow.parquet as pq

    for p in parts:
        assert pq.read_metadata(os.path.join(out, p)).num_rows <= 500
    assert read_parquet(spark, out).count() == 2000
