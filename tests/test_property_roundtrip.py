"""Property-based round-trip invariants (hypothesis): for random small
tables of ints/floats/strings/nulls, read(write(tbl)) preserves the data in
every format — the reference's central invariant
(/root/reference/test/runtests.jl:18-26) generalized beyond its fixtures.

Strings are drawn from a printable alphabet including quotes, commas,
semicolons and unicode so CSV quoting/escaping is genuinely exercised.
"""

from __future__ import annotations

import math
import os
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from quackio_jl_spark.sources.readers import read_csv, read_json, read_parquet
from quackio_jl_spark.sources.writers import write_table

# troublesome-but-legal content: delimiters, quotes, backslashes, unicode
_ALPHABET = "abxyz ,;'\"\\é中"

_cell_int = st.one_of(st.none(), st.integers(min_value=-(2**31), max_value=2**31))
_cell_float = st.one_of(
    st.none(),
    st.floats(allow_nan=False, allow_infinity=False, width=64, min_value=-1e12, max_value=1e12),
)
_cell_str = st.one_of(
    st.none(), st.text(alphabet=_ALPHABET, min_size=0, max_size=12)
)


@st.composite
def tables(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    rows = [
        (
            draw(_cell_int),
            draw(_cell_float),
            draw(_cell_str),
        )
        for _ in range(n)
    ]
    return rows


def _norm(rows):
    out = []
    for a, b, c in rows:
        if isinstance(b, float) and b is not None:
            b = float(f"{b:.10g}")  # csv prints ~17 sig digits; compare at 10
        out.append((a, b, c))
    return sorted(out, key=repr)


def _roundtrip(spark, rows, fmt):
    df = spark.createDataFrame(rows, "a long, b double, c string")
    path = os.path.join(tempfile.mkdtemp(prefix="prop_"), f"t.{fmt}")
    write_table(df, path, format=fmt)
    if fmt == "parquet":
        back = read_parquet(spark, path)
    elif fmt == "json":
        back = read_json(
            spark, path, columns={"a": "bigint", "b": "double", "c": "varchar"}
        )
    else:
        back = read_csv(
            spark, path, columns={"a": "bigint", "b": "double", "c": "varchar"}
        )
    return [(r["a"], r["b"], r["c"]) for r in back.collect()]


_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.mark.slow
@given(rows=tables())
@_SETTINGS
def test_parquet_roundtrip_exact(spark, rows):
    assert _norm(_roundtrip(spark, rows, "parquet")) == _norm(rows)


@pytest.mark.slow
@given(rows=tables())
@_SETTINGS
def test_json_roundtrip(spark, rows):
    assert _norm(_roundtrip(spark, rows, "json")) == _norm(rows)


@pytest.mark.slow
@given(rows=tables())
@_SETTINGS
def test_csv_roundtrip(spark, rows):
    got, want = _norm(_roundtrip(spark, rows, "csv")), _norm(rows)
    # CSV cannot distinguish null from empty string; normalize both to None
    # BEFORE ordering (an '' vs None difference flips the sort order)
    fix = lambda t: (t[0], t[1], t[2] if t[2] else None)  # noqa: E731
    assert sorted((fix(t) for t in got), key=repr) == sorted(
        (fix(t) for t in want), key=repr
    )


# ---------------- binned interval-overlap join == brute force

_iv = st.tuples(
    st.integers(min_value=0, max_value=3),      # user key
    st.integers(min_value=0, max_value=500),    # start
    st.integers(min_value=0, max_value=200),    # duration
)
_iv_sets = st.tuples(
    st.lists(_iv, min_size=0, max_size=8),
    st.lists(_iv, min_size=0, max_size=8),
    st.sampled_from([7, 64, 100, 1000]),        # bin width
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=_iv_sets)
def test_binned_overlap_join_matches_brute_force(spark, data):
    """The bin-explode + emit-once overlap join must produce EXACTLY the
    brute-force overlap pairs for arbitrary interval sets and bin widths
    — including intervals shorter/longer than a bin, zero-length
    intervals, and boundary-touching pairs (inclusive semantics)."""
    from quackio_jl_spark.operators.asof import overlap_join_intervals

    left, right, bin_w = data
    mk = lambda ivs: spark.createDataFrame(  # noqa: E731
        [(u, s0, s0 + d) for u, s0, d in ivs] or [(None, None, None)],
        "user_id long, s long, e long",
    ).filter("user_id IS NOT NULL")
    res = overlap_join_intervals(mk(left), mk(right), bin_w).collect()
    got = sorted(
        (r["user_id"], r["overlap_start_us"], r["overlap_end_us"]) for r in res
    )
    want = sorted(
        (u1, max(s1, s2), min(e1, e2))
        for u1, s1, d1 in left
        for u2, s2, d2 in right
        if u1 == u2
        for e1 in [s1 + d1]
        for e2 in [s2 + d2]
        if s1 <= e2 and s2 <= e1
    )
    assert got == want


# ------------- banded fuzzy duplicate pairs == brute force

_rec = st.tuples(
    st.integers(min_value=0, max_value=2),          # custkey
    st.integers(min_value=0, max_value=300),        # price (int, exact)
    st.integers(min_value=0, max_value=60),         # day offset
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    recs=st.lists(_rec, min_size=0, max_size=10),
    tol=st.sampled_from([0, 3, 10]),
)
def test_banded_duplicate_pairs_match_brute_force(spark, recs, tol):
    """Banded blocking must find EXACTLY the brute-force fuzzy pairs for
    arbitrary records and tolerances — in particular pairs whose prices
    straddle a band boundary in either direction, and each pair exactly
    once (the band-identity emit rule)."""
    import datetime

    from quackio_jl_spark.operators.merge import banded_duplicate_pairs

    day0 = datetime.date(2020, 1, 1)
    rows = [
        (i, c, float(p), day0 + datetime.timedelta(days=dd))
        for i, (c, p, dd) in enumerate(recs)
    ]
    df = spark.createDataFrame(
        rows or [(None, None, None, None)],
        "o_orderkey long, o_custkey long, o_totalprice double, d date",
    ).filter("o_orderkey IS NOT NULL")
    got = sorted(
        (r["orderkey_a"], r["orderkey_b"])
        for r in banded_duplicate_pairs(df, tol, 30, tol + 1.0).collect()
    )
    want = sorted(
        (i, j)
        for i, (c1, p1, d1) in enumerate(recs)
        for j, (c2, p2, d2) in enumerate(recs)
        if i < j and c1 == c2 and abs(p1 - p2) <= tol and abs(d1 - d2) <= 30
    )
    assert got == want


# -------------------- Kaplan-Meier curve == pure-Python estimator


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),   # duration
            st.integers(min_value=0, max_value=1),    # event flag
        ),
        min_size=1,
        max_size=15,
    )
)
def test_km_curve_matches_python_estimator(spark, obs):
    """The windowed KM plan must reproduce the textbook product-limit
    estimator for arbitrary duration/censoring patterns — ties between
    events and censorings at the same time included (both leave the risk
    set at that time; censorings do not reduce survival)."""
    from quackio_jl_spark.plans.stats import km_curve

    df = spark.createDataFrame(obs, "dur long, event long")
    got = {
        r["t_days"]: (r["n_churned"], r["n_at_risk"], r["survival"])
        for r in km_curve(df).collect()
    }
    # pure-Python product-limit estimator
    n_risk = len(obs)
    s = 1.0
    want = {}
    for t in sorted({d for d, _ in obs}):
        d_t = sum(1 for d, e in obs if d == t and e == 1)
        leave_t = sum(1 for d, _ in obs if d == t)
        if d_t > 0:
            s *= 1.0 - d_t / n_risk
            want[t] = (d_t, n_risk, round(s, 8))
        n_risk -= leave_t
    assert set(got) == set(want)
    for t, (d_t, nr, sv) in want.items():
        gd, gn, gs = got[t]
        assert (gd, gn) == (d_t, nr), (t, got[t], want[t])
        assert abs(gs - sv) < 1e-6, (t, gs, sv)


# ----------------- rank tests == pure-Python references


def _write_parquet(tmpdir, name, pydict):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table(pydict), os.path.join(tmpdir, f"{name}.parquet"))


def _avg_ranks(values):
    """value -> average rank (1-based, ties averaged)."""
    s = sorted(values)
    ranks = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[s[i]] = (i + 1 + j) / 2.0
        i = j
    return ranks


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["click", "view"]),
            st.integers(min_value=0, max_value=8),  # value * 0.5
        ),
        min_size=4,
        max_size=24,
    )
)
def test_mannwhitney_matches_python(spark, rows):
    """The grouped-rank Mann-Whitney plan must reproduce the textbook
    tie-averaged U and tie-corrected z for arbitrary small samples."""
    import math

    from hypothesis import assume

    from quackio_jl_spark.registry import QUERIES

    g1 = [v * 0.5 for t, v in rows if t == "click"]
    g2 = [v * 0.5 for t, v in rows if t == "view"]
    assume(g1 and g2 and len(set(g1 + g2)) >= 2)

    tmpdir = tempfile.mkdtemp(prefix="quackio_mwu_")
    _write_parquet(
        tmpdir,
        "events",
        {
            "event_type": [t for t, _ in rows],
            "value": [v * 0.5 for _, v in rows],
        },
    )
    row = QUERIES["mannwhitney_u_click_vs_view"](spark, tmpdir).collect()[0]

    ranks = _avg_ranks(g1 + g2)
    n1, n2 = len(g1), len(g2)
    big_n = n1 + n2
    r1 = sum(ranks[v] for v in g1)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    from collections import Counter

    tsum = sum(c**3 - c for c in Counter(g1 + g2).values())
    sigma = math.sqrt(
        n1 * n2 / 12.0 * ((big_n + 1) - tsum / (big_n * (big_n - 1)))
    )
    assert row["n_click"] == n1 and row["n_view"] == n2
    assert abs(row["u_stat"] - u1) < 1e-6
    assert abs(row["z_score"] - (u1 - n1 * n2 / 2.0) / sigma) < 1e-6


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),    # custkey
            st.integers(min_value=0, max_value=99),   # day offset
            st.integers(min_value=1, max_value=40),   # price * 0.5
        ),
        min_size=2,
        max_size=24,
    )
)
def test_wilcoxon_matches_python(spark, rows):
    """The signed-rank plan must reproduce the textbook W+ and
    tie-corrected z (zero diffs dropped, |d| ties rank-averaged)."""
    import datetime
    import math
    from collections import Counter, defaultdict

    from hypothesis import assume

    from quackio_jl_spark.registry import QUERIES

    base = datetime.datetime(2024, 1, 1)
    dates = [base + datetime.timedelta(days=d) for _, d, _ in rows]
    lo, hi = min(dates), max(dates)
    mid = lo + datetime.timedelta(days=(hi - lo).days // 2)
    spend = defaultdict(lambda: [0.0, 0.0])
    for (c, d, p), dt in zip(rows, dates):
        spend[c][0 if dt <= mid else 1] += p * 0.5
    diffs = [
        round(h2 - h1, 6)
        for h1, h2 in spend.values()
        if round(h2 - h1, 6) != 0
    ]
    assume(diffs)

    tmpdir = tempfile.mkdtemp(prefix="quackio_wsr_")
    _write_parquet(
        tmpdir,
        "orders",
        {
            "o_custkey": [c for c, _, _ in rows],
            "o_orderdate": dates,
            "o_totalprice": [p * 0.5 for _, _, p in rows],
        },
    )
    row = QUERIES["wilcoxon_signed_rank_spend"](spark, tmpdir).collect()[0]

    ranks = _avg_ranks([abs(d) for d in diffs])
    n = len(diffs)
    w_plus = sum(ranks[abs(d)] for d in diffs if d > 0)
    tsum = sum(c**3 - c for c in Counter(abs(d) for d in diffs).values())
    sigma = math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - tsum / 48.0)
    assert row["n_pairs"] == n
    assert abs(row["w_plus"] - w_plus) < 1e-6
    assert abs(row["z_score"] - (w_plus - n * (n + 1) / 4.0) / sigma) < 1e-6


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3"]),
            st.integers(min_value=0, max_value=6),  # integer observation
        ),
        min_size=6,
        max_size=30,
    )
)
def test_kruskal_wallis_matches_python(spark, rows):
    """The grouped-rank Kruskal-Wallis plan must reproduce the textbook
    tie-corrected H for arbitrary small k-sample data. Drives the
    registered query through synthetic lineitem/orders parquet whose
    join produces exactly the generated (group, delay) rows."""
    import datetime
    import math
    from collections import Counter

    from hypothesis import assume

    from quackio_jl_spark.registry import QUERIES

    groups = {g for g, _ in rows}
    values = [v for _, v in rows]
    assume(len(groups) >= 2 and len(set(values)) >= 2)

    # Build orders (one per row, priority = group) and lineitem rows whose
    # ship date is orderdate + delay days.
    base = datetime.datetime(2024, 1, 1)
    tmpdir = tempfile.mkdtemp(prefix="quackio_kw_")
    _write_parquet(
        tmpdir,
        "orders",
        {
            "o_orderkey": list(range(len(rows))),
            "o_orderdate": [base] * len(rows),
            "o_orderpriority": [g for g, _ in rows],
        },
    )
    _write_parquet(
        tmpdir,
        "lineitem",
        {
            "l_orderkey": list(range(len(rows))),
            "l_shipdate": [
                base + datetime.timedelta(days=v) for _, v in rows
            ],
        },
    )
    out = {
        r["o_orderpriority"]: r
        for r in QUERIES["kruskal_wallis_ship_latency"](
            spark, tmpdir
        ).collect()
    }

    ranks = _avg_ranks(values)
    big_n = len(values)
    by_g = {g: [v for gg, v in rows if gg == g] for g in groups}
    # engines round half-away-from-zero; Python's round() is banker's
    ssum = sum(
        math.floor(sum(ranks[v] for v in vs) ** 2 / len(vs) * 1e4 + 0.5)
        / 1e4
        for vs in by_g.values()
    )
    h = 12.0 / (big_n * (big_n + 1)) * ssum - 3.0 * (big_n + 1)
    tsum = sum(c**3 - c for c in Counter(values).values())
    h_corr = h / (1.0 - tsum / (big_n**3 - big_n))
    assert set(out) == groups
    for g, vs in by_g.items():
        assert out[g]["n_items"] == len(vs)
        assert abs(out[g]["rank_sum"] - sum(ranks[v] for v in vs)) < 1e-6
        assert abs(out[g]["h_stat"] - h) < 1e-6
        assert abs(out[g]["h_tie_corrected"] - h_corr) < 1e-5


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),    # custkey
            st.integers(min_value=0, max_value=4),    # nation
            st.integers(min_value=1, max_value=200),  # price
        ),
        min_size=2,
        max_size=25,
    )
)
def test_theil_decomposition_identity(spark, rows):
    """Theil-T must satisfy its defining identity on arbitrary data:
    total = between + sum(share_g * within_g), and total must equal the
    directly-computed population Theil index of per-customer spend."""
    import math
    from collections import defaultdict

    from hypothesis import assume

    from quackio_jl_spark.registry import QUERIES

    # distinct customers must map to one nation each
    cust_nation = {}
    ok = True
    for c, n, _ in rows:
        if c in cust_nation and cust_nation[c] != n:
            ok = False
        cust_nation[c] = n
    assume(ok)

    tmpdir = tempfile.mkdtemp(prefix="quackio_theil_")
    import datetime

    _write_parquet(
        tmpdir,
        "orders",
        {
            "o_custkey": [c for c, _, _ in rows],
            "o_orderdate": [datetime.datetime(2024, 1, 1)] * len(rows),
            "o_totalprice": [float(p) for _, _, p in rows],
        },
    )
    _write_parquet(
        tmpdir,
        "customer",
        {
            "c_custkey": list(cust_nation),
            "c_nationkey": [cust_nation[c] for c in cust_nation],
        },
    )
    nations = sorted({n for n in cust_nation.values()})
    _write_parquet(
        tmpdir,
        "nation",
        {"n_nationkey": nations, "n_name": [f"N{n}" for n in nations]},
    )
    out = QUERIES["theil_index_nation_spend"](spark, tmpdir).collect()

    spend = defaultdict(float)
    for c, _, p in rows:
        spend[c] += float(p)
    xs = list(spend.values())
    mu = sum(xs) / len(xs)
    t_direct = sum((x / mu) * math.log(x / mu) for x in xs) / len(xs)

    total_from_parts = sum(
        r["between_contrib"] + r["income_share"] * r["theil_within"]
        for r in out
    )
    assert out, "no rows"
    assert abs(out[0]["theil_total"] - t_direct) < 1e-5
    assert abs(total_from_parts - t_direct) < 1e-5


# --------------------------- PAV minimax closed form == sequential PAV


def _pav_sequential(bins):
    """Textbook pool-adjacent-violators on (n_k, sy) bins in bin order:
    merge adjacent pools while a violator (decreasing weighted mean)
    exists; every bin inherits its pool's weighted mean."""
    pools = [[n, sy] for n, sy in bins]  # [weight, weighted_sum]
    spans = [[i, i] for i in range(len(bins))]
    i = 0
    while i + 1 < len(pools):
        if pools[i][1] * pools[i + 1][0] > pools[i + 1][1] * pools[i][0]:
            # mean_i > mean_{i+1}: merge and restart scan from the left
            pools[i][0] += pools[i + 1][0]
            pools[i][1] += pools[i + 1][1]
            spans[i][1] = spans[i + 1][1]
            del pools[i + 1], spans[i + 1]
            i = max(0, i - 1)
        else:
            i += 1
    fit = [0.0] * len(bins)
    for (w, s), (lo, hi) in zip(pools, spans):
        for k in range(lo, hi + 1):
            fit[k] = s / w
    return fit


def _pav_minimax(bins):
    """The closed form the engine computes declaratively
    (operators/learn.py::quality_isotonic_calibration):
    fit_k = max_{i<=k} min_{j>=k} wavg(i..j)."""
    B = len(bins)

    def wavg(i, j):
        w = sum(bins[k][0] for k in range(i, j + 1))
        s = sum(bins[k][1] for k in range(i, j + 1))
        return s / w

    return [
        max(min(wavg(i, j) for j in range(k, B)) for i in range(k + 1))
        for k in range(B)
    ]


@given(
    st.lists(
        st.tuples(st.integers(1, 50), st.integers(0, 50)).map(
            lambda t: (t[0], min(t[0], t[1]))  # sy <= n_k (binary outcome)
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_pav_minimax_equals_sequential(bins):
    mm = _pav_minimax(bins)
    seq = _pav_sequential(bins)
    assert all(math.isclose(a, b, rel_tol=0, abs_tol=1e-12) for a, b in zip(mm, seq))
    # and the result is nondecreasing + mean-preserving
    assert all(a <= b + 1e-12 for a, b in zip(mm, mm[1:]))
    n = sum(b[0] for b in bins)
    assert math.isclose(
        sum(w * f for (w, _), f in zip(bins, mm)) / n,
        sum(b[1] for b in bins) / n,
        abs_tol=1e-9,
    )


# --------------------- Holt oracle == textbook recursion (duckdb-only)


@given(
    st.lists(
        # eighth-units: exact in IEEE binary AND in DECIMAL(28,6), so the
        # oracle's decimal revenue cast is lossless for every draw (the
        # engines' half-even vs half-up decimal-cast tie behavior is out of
        # scope here — real prices are 2dp and never tie at 6dp)
        st.integers(min_value=4, max_value=8_000_000).map(lambda k: k / 8),
        min_size=2,
        max_size=24,
    )
)
@settings(max_examples=60, deadline=None)
def test_holt_oracle_matches_textbook_recursion(ys):
    """Run the registered DuckDB oracle for orders_monthly_holt_trend on a
    synthetic monthly series and compare to a plain-Python Holt recursion
    with the same per-step rounding — validates the declarative
    formulation itself (the Spark twin is pinned to this oracle by the
    hash gate)."""
    import duckdb

    from quackio_jl_spark.plans.stats import HOLT_ALPHA, HOLT_BETA
    from quackio_jl_spark.registry import ORACLES

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders AS SELECT "
        "make_date(1995 + (i // 12), 1 + (i % 12), 1 + (i % 27)) AS o_orderdate, "
        "CAST(y AS DOUBLE) AS o_totalprice "
        "FROM (SELECT UNNEST(range(len($ys))) AS i, UNNEST($ys) AS y)",
        {"ys": ys},
    )
    row = con.execute(ORACLES["orders_monthly_holt_trend"]).fetchone()
    n_months, level, trend, mae, f1, f2, f3 = row

    # plain-Python twin with the ENGINES' rounding (half away from zero —
    # python's round() is banker's and diverges on exact ties)
    def r(x, n):
        s = 10.0 ** n
        return math.floor(x * s + 0.5) / s if x >= 0 else math.ceil(x * s - 0.5) / s

    series = [r(y, 6) for y in ys]
    l, b, sae = series[0], r(series[1] - series[0], 8), 0.0
    for y in series[1:]:
        pred = l + b
        l_new = r(HOLT_ALPHA * y + (1 - HOLT_ALPHA) * pred, 8)
        b = r(HOLT_BETA * (l_new - l) + (1 - HOLT_BETA) * b, 8)
        l = l_new
        sae += r(abs(y - pred), 8)

    assert n_months == len(ys)
    assert level == pytest.approx(l, abs=1e-9)
    assert trend == pytest.approx(b, abs=1e-9)
    assert mae == pytest.approx(r(sae / (len(ys) - 1), 8), abs=1e-9)
    for h, f in ((1, f1), (2, f2), (3, f3)):
        assert f == pytest.approx(r(l + h * b, 6), abs=1e-9)
