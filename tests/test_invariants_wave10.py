"""Round-7 invariants: entity-resolution multi-hop closure on a planted
fixture (ADVICE r6: the sf gates exercise linkage_entity_clusters on at
most one, possibly single-pair, component — the transitive-merge claim
needs non-trivial coverage), and FS EM convergence behavior.
"""

from __future__ import annotations

import pytest

from quackio_jl_spark.registry import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def linkage_fixture_dir(tmp_path_factory):
    """A synthetic orders table where the banded candidate generator finds
    A~B and B~C but NOT A~C (price gap 12 > tolerance 10), all three
    agreeing on every FS comparison field, plus 27 background singleton
    orders spreading the field histograms so u << m and both candidate
    pairs score net-positive. The correct entity resolution merges A, B, C
    into ONE 3-record entity through the B hop."""
    import pandas as pd

    rows = [
        # (orderkey, custkey, totalprice, orderdate, priority, status)
        (1, 1, 100.0, "1995-01-03", "1-URGENT", "O"),
        (2, 1, 105.0, "1995-01-10", "1-URGENT", "O"),
        (3, 1, 112.0, "1995-01-17", "1-URGENT", "O"),
    ]
    prios = ["2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    stats = ["F", "P"]
    for i in range(27):
        rows.append(
            (
                10 + i,
                100 + i,  # distinct custkeys: never candidates
                500.0 + 40.0 * i,  # spread prices
                f"199{5 + i % 3}-{1 + i % 12:02d}-15",
                prios[i % len(prios)],
                stats[i % len(stats)],
            )
        )
    df = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
            "o_orderstatus",
        ],
    )
    # date32, matching the real testdata (nanosecond timestamps read back
    # as BIGINT without the session's nanos conf)
    df["o_orderdate"] = pd.to_datetime(df["o_orderdate"]).dt.date
    d = tmp_path_factory.mktemp("linkage_fixture")
    df.to_parquet(d / "orders.parquet", index=False)
    return str(d)


def test_entity_clusters_merge_multi_hop(spark, linkage_fixture_dir):
    """A~B and B~C candidates with net-positive FS scores must collapse to
    ONE entity of 3 records even though A~C was never a candidate pair —
    the transitive-closure property the query's docstring claims."""
    rows = QUERIES["linkage_entity_clusters"](
        spark, linkage_fixture_dir
    ).collect()
    assert len(rows) == 1, f"expected one merged entity, got {rows}"
    assert rows[0]["entity"] == 1 and rows[0]["n_records"] == 3


def test_entity_clusters_fixture_matches_oracle(linkage_fixture_dir):
    """The recursive-CTE oracle agrees on the planted multi-hop component —
    so the cross-engine closure comparison is exercised on a component
    that actually has a hop (the sf gates give it at most one pair)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{linkage_fixture_dir}/orders.parquet')"
    )
    got = con.execute(ORACLES["linkage_entity_clusters"]).fetchall()
    assert got == [(1, 3)]


def test_fs_em_converged_lambda_trajectory(spark):
    """EM sanity on the real gate data: lambda stays a probability in
    (0, 1) every round, parameters are valid micro-unit probabilities, and
    the round-over-round lambda step shrinks or stays equal (monotone
    damping is not guaranteed by EM in general, but on this unimodal
    2-class mixture the trajectory must at least stay finite and bounded —
    the divergence failure mode is what this pins)."""
    # sf0.01: the smallest SF with a non-empty candidate-pair set (at
    # sf0.001 every EM sum is NULL-over-empty, which the oracle gate pins
    # separately)
    rows = QUERIES["linkage_fs_em_converged"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 3  # one per comparison field
    for r in rows:
        for c in ("m_final_e8", "u_final_e8"):
            assert 0 <= r[c] <= 10**8, (r["field"], c, r[c])
        lams = [r["lambda1_e8"], r["lambda2_e8"], r["lambda3_e8"]]
        assert all(0 < v < 10**8 for v in lams), lams
    # lambda identical across field rows (it's a global parameter)
    assert len({(r["lambda1_e8"], r["lambda2_e8"], r["lambda3_e8"]) for r in rows}) == 1


def test_personalized_pagerank_concentrates_at_seeds(spark):
    """PPR sanity: probability mass stays on the simplex (<= 1; dangling
    mass may leak, never grow), every score is nonnegative, and the mean
    seed score strictly exceeds the mean non-seed score — the property
    that distinguishes PERSONALIZED restart from global PageRank."""
    rows = QUERIES["part_personalized_pagerank"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows and all(r["ppr"] >= 0 for r in rows)
    assert sum(r["ppr"] for r in rows) <= 1.0 + 1e-9
    seed = [r["ppr"] for r in rows if r["is_seed"] == 1]
    non = [r["ppr"] for r in rows if r["is_seed"] == 0]
    assert seed and non
    assert sum(seed) / len(seed) > sum(non) / len(non)


def test_conformal_sets_cover_and_stay_sane(spark):
    """Split-conformal mechanics: qhat is a nonnegative integer threshold,
    every eval set holds between 1 (the argmax is always within 0 of
    itself) and n_langs languages on average, and realized coverage sits
    in a generous band around the 90% target (the corpus-fit-NB caveat
    plus finite-sample noise can pull a specific split below 1 - alpha;
    collapse far below is what this pins)."""
    r = QUERIES["langid_conformal_sets"](
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    assert r["qhat_e6"] >= 0 and r["n_cal"] > 0 and r["n_eval"] > 0
    n_langs = 5
    avg_set = r["sum_set_size"] / r["n_eval"]
    assert 1.0 <= avg_set <= n_langs
    cov = r["n_covered"] / r["n_eval"]
    assert 0.75 <= cov <= 1.0


def test_mmd_label_split_exceeds_null_floor(spark):
    """embedding_mmd_drift's reason to exist: the label-0-vs-rest split
    must show materially more mean/second-moment discrepancy than the
    vec_id-parity null split on both kernels, and every statistic is a
    nonnegative squared distance."""
    rows = {
        r["split"]: r
        for r in QUERIES["embedding_mmd_drift"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    for r in rows.values():
        assert r["mmd2_linear"] >= 0 and r["mmd2_quadratic"] >= 0
        assert r["n0"] > 0 and r["n1"] > 0
    assert rows["label"]["mmd2_linear"] > 1.5 * rows["half"]["mmd2_linear"]
    assert rows["label"]["mmd2_quadratic"] > rows["half"]["mmd2_quadratic"]


def test_mmd_permutation_test_rejects_null(spark):
    """The label split must be significant against the salted permutation
    null (p = p_num/p_den <= 0.1 on this separable fixture), the p-value
    is a valid conservative fraction, and the observed statistic matches
    embedding_mmd_drift's label row bit-for-bit (shared arithmetic)."""
    r = QUERIES["embedding_mmd_permutation_test"](
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    assert 1 <= r["p_num"] <= r["p_den"] == r["n_permutations"] + 1
    assert r["p_num"] / r["p_den"] <= 0.1
    drift = {
        row["split"]: row
        for row in QUERIES["embedding_mmd_drift"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert r["mmd2_observed"] == drift["label"]["mmd2_linear"]


def test_conformal_band_holds_at_small_sf_too(spark):
    """Round-7 VERDICT "next" #8 (first half): the realized-coverage band
    must hold on the sf0.001 fixture as well — the SF that exposed the
    round-6 PCA flake. Same generous band as the sf0.01 check: corpus-fit
    NB scores are not perfectly exchangeable, so a specific split may sit
    below 1 - alpha; collapse is what this pins."""
    r = QUERIES["langid_conformal_sets"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r["qhat_e6"] >= 0 and r["n_cal"] > 0 and r["n_eval"] > 0
    cov = r["n_covered"] / r["n_eval"]
    assert 0.75 <= cov <= 1.0
    assert 1.0 <= r["sum_set_size"] / r["n_eval"] <= 5


def test_split_conformal_exact_coverage_guarantee(spark):
    """Round-7 VERDICT "next" #8 (second half): split-conformal's
    finite-sample guarantee E[coverage] >= 1 - alpha is EXACT when
    calibration and eval scores are exchangeable — which the corpus query
    can't promise (the NB is fit on the same corpus), but a synthetic
    exchangeable fixture can. 20 independent salted experiments, each
    with its own md5-derived iid scores and its own ~50/50 split, run the
    exact same threshold recipe as langid_conformal_sets (order statistic
    ceil((n_cal+1)*(1-alpha)) over the calibration scores). Everything is
    a pure hash function of (salt, id), so the observed mean coverage is
    deterministic: 0.906152 >= 0.9 documents the guarantee the operator's
    docstring claims; per-split minimum 0.8892 shows the single-split dip
    the corpus band tests allow for."""
    N, SALTS = 2000, 20
    r = spark.sql(f"""
        WITH ids AS (SELECT id FROM range(1, {N + 1})),
        salted AS (
          SELECT b, id,
            CAST(conv(substr(md5(concat(
              'score:', CAST(b AS STRING), ':', CAST(id AS STRING))), 1, 8),
              16, 10) AS BIGINT) AS s,
            CASE WHEN substr(md5(concat(
              'split', CAST(b AS STRING), ':', CAST(id AS STRING))), 1, 1)
              IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE 0 END AS is_cal
          FROM ids LATERAL VIEW explode(sequence(0, {SALTS - 1})) t AS b
        ),
        cal_ranked AS (
          SELECT b, s,
            ROW_NUMBER() OVER (PARTITION BY b ORDER BY s, id) AS rk,
            COUNT(*) OVER (PARTITION BY b) AS n_cal
          FROM salted WHERE is_cal = 1
        ),
        qhat AS (
          SELECT b, MIN(s) AS qhat FROM cal_ranked
          WHERE rk >= CAST(ceil((n_cal + 1) * 0.9) AS BIGINT)
          GROUP BY b
        ),
        cov AS (
          SELECT e.b,
            AVG(CASE WHEN e.s <= q.qhat THEN 1.0 ELSE 0.0 END) AS coverage
          FROM salted e JOIN qhat q ON e.b = q.b
          WHERE e.is_cal = 0 GROUP BY e.b
        )
        SELECT MIN(coverage) AS min_cov, AVG(coverage) AS mean_cov
        FROM cov
    """).collect()[0]
    assert float(r["mean_cov"]) >= 0.9, (
        f"exchangeable-fixture mean coverage {r['mean_cov']} < nominal 0.9"
    )
    assert float(r["min_cov"]) >= 0.85


def test_temperature_mixture_invariants(spark):
    """Temperature sampling mechanics: per tau the floor-quantized weights
    sum to 1e8 minus at most one floor-loss unit per source; tau=1.00 is
    natural sampling (upsample == 1e6 up to floor loss); and at tau<1 the
    smallest source is upsampled while the largest is downsampled, more
    strongly the lower the tau."""
    rows = QUERIES["mixture_temperature_sampling"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    by_tau = {}
    for r in rows:
        by_tau.setdefault(r["tau"], []).append(r)
    assert set(by_tau) == {"0.25", "0.50", "0.75", "1.00"}
    for tau, grp in by_tau.items():
        tot = sum(r["weight_e8"] for r in grp)
        assert 100_000_000 - len(grp) <= tot <= 100_000_000
        if tau == "1.00":
            for r in grp:
                assert 1_000_000 - 2 <= r["upsample_e6"] <= 1_000_000
    smallest = min(by_tau["0.25"], key=lambda r: r["n_tokens"])["source"]
    largest = max(by_tau["0.25"], key=lambda r: r["n_tokens"])["source"]
    up = {
        tau: {r["source"]: r["upsample_e6"] for r in grp}
        for tau, grp in by_tau.items()
    }
    assert up["0.25"][smallest] > up["0.50"][smallest] > 1_000_000
    assert up["0.25"][largest] < up["0.50"][largest] < 1_000_000


@pytest.mark.slow
def test_fiedler_local_kernel_matches_distributed(spark, monkeypatch):
    """The adaptive local path (numpy kernel under FIEDLER_LOCAL_MAX_EDGES)
    must be BIT-IDENTICAL to the distributed power-iteration loop — both
    for the single chain and for the side-keyed grouped chain. Forcing the
    threshold to -1 exercises the distributed branch on the same edges."""
    from quackio_jl_spark.operators import cluster as C

    v_local, edges = C._fiedler_vector(spark, SF)
    loc = {r["id"]: r["v"] for r in v_local.collect()}
    monkeypatch.setattr(C, "FIEDLER_LOCAL_MAX_EDGES", -1)
    v_dist = C._fiedler_iterate(edges, C.FIEDLER_ROUNDS)
    dist = {r["id"]: r["v"] for r in v_dist.collect()}
    assert loc == dist and len(loc) > 0

    from pyspark.sql import functions as F

    sides = v_local.select(
        "id", F.when(F.col("v") >= 0, 1).otherwise(0).alias("side")
    )
    sa = sides.select(F.col("id").alias("_a"), F.col("side").alias("ga"))
    sb = sides.select(F.col("id").alias("_b"), F.col("side").alias("gb"))
    es_g = (
        edges.join(sa, edges.src == F.col("_a"))
        .join(sb, edges.dst == F.col("_b"))
        .filter(F.col("ga") == F.col("gb"))
        .select(F.col("ga").alias("g"), "src", "dst")
        .persist()
    )
    gd = {
        (r["g"], r["id"]): r["v"]
        for r in C._fiedler_iterate_grouped(es_g, 3).collect()
    }
    monkeypatch.setattr(C, "FIEDLER_LOCAL_MAX_EDGES", 2_000_000)
    gl = {
        (r["g"], r["id"]): r["v"]
        for r in C._fiedler_iterate_grouped(es_g, 3).collect()
    }
    assert gd == gl and len(gl) > 0


def test_pca_local_chains_match_distributed(spark, monkeypatch):
    """The PCA local path (numpy chains over the collected constant-size
    covariance) must be bit-identical to the distributed d x d composition
    it replaces — forced by nulling the local dispatch."""
    from quackio_jl_spark.operators import pipeline as P

    loc = sorted(
        tuple(r) for r in P.embedding_pca_top3(spark, SF).collect()
    )
    monkeypatch.setattr(P, "_pca_chains_local", lambda *a, **k: None)
    dist = sorted(
        tuple(r) for r in P.embedding_pca_top3(spark, SF).collect()
    )
    assert loc == dist and len(loc) == 192


def test_bradley_terry_local_fit_matches_distributed(spark, monkeypatch):
    """The local MM fit over the collected win matrix must be bit-identical
    to the distributed rounds (audit_mode patched True forces the
    distributed branch while the env flag stays unset, so rounds and
    checkpoints run at full fidelity)."""
    from quackio_jl_spark.operators import selection as S

    loc = sorted(
        tuple(r)
        for r in S.source_bradley_terry_strengths(spark, SF).collect()
    )
    monkeypatch.setattr(S, "audit_mode", lambda: True)
    dist = sorted(
        tuple(r)
        for r in S.source_bradley_terry_strengths(spark, SF).collect()
    )
    assert loc == dist and len(loc) > 0


def test_lpa_local_rounds_match_distributed(spark, monkeypatch):
    """The local LPA replay (integer vote sums + smallest-label argmax)
    must equal the distributed synchronous rounds exactly.
    fragcache.clear() between runs so the second run actually rebuilds
    (edges, labels) through the distributed branch."""
    from quackio_jl_spark import fragcache
    from quackio_jl_spark.operators import cluster as C

    fragcache.clear()
    loc = sorted(
        tuple(r) for r in C.part_label_propagation(spark, SF).collect()
    )
    fragcache.clear()
    monkeypatch.setattr(C, "CC_LOCAL_MAX_EDGES", -1)
    dist = sorted(
        tuple(r) for r in C.part_label_propagation(spark, SF).collect()
    )
    fragcache.clear()
    assert loc == dist and len(loc) > 0


def test_cc_local_matches_distributed(spark, monkeypatch):
    """The CC local union-find replay must equal the distributed
    large-star/small-star rounds exactly on the real near-dup graph —
    the sixth iterative family gets the same bit-equality pin as the
    other five. fragcache.clear() between runs so the second run
    actually rebuilds through the distributed branch."""
    from quackio_jl_spark import fragcache
    from quackio_jl_spark.operators import cluster as C

    fragcache.clear()
    loc = sorted(tuple(r) for r in C.dedup_clusters(spark, SF).collect())
    fragcache.clear()
    monkeypatch.setattr(C, "CC_LOCAL_MAX_EDGES", -1)
    dist = sorted(tuple(r) for r in C.dedup_clusters(spark, SF).collect())
    fragcache.clear()
    assert loc == dist and len(loc) > 0


def test_pagerank_family_local_matches_distributed(spark, monkeypatch):
    """PageRank, personalized PageRank and HITS local kernels must be
    bit-identical to their distributed rounds."""
    from quackio_jl_spark.operators import cluster as C

    names = [
        "part_pagerank",
        "part_personalized_pagerank",
        "customer_part_hits",
    ]
    fns = {
        "part_pagerank": C.part_pagerank,
        "part_personalized_pagerank": C.part_personalized_pagerank,
        "customer_part_hits": C.customer_part_hits,
    }
    loc = {n: sorted(tuple(r) for r in fns[n](spark, SF).collect()) for n in names}
    monkeypatch.setattr(C, "CC_LOCAL_MAX_EDGES", -1)
    for n in names:
        dist = sorted(tuple(r) for r in fns[n](spark, SF).collect())
        assert loc[n] == dist and len(dist) > 0, n


def test_bbit_minhash_dominance_invariant(spark):
    """b-bit matches dominate full-width matches (a full 8-hex match
    always matches on the last bit), and the debiased 1-bit estimator
    stays in [0, 1]."""
    from quackio_jl_spark.registry import QUERIES

    rows = QUERIES["dedup_minhash_bbit_estimate"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["k_bit"] >= r["k_full"]
        assert 0.0 <= r["est_1bit"] <= 1.0
        assert abs(r["est_full"] - r["k_full"] / 8) < 1e-15


def test_version_diff_recomputes_signatures_only_for_new_content(
    spark, monkeypatch
):
    """The incremental contract of dedup_cluster_version_diff: the
    shingle/md5 signature pipeline runs exactly TWICE — once for the
    version-A corpus (the shared minhash_sig_corpus fragment, reused
    relationally by unchanged/edited/clone nodes AND by the version-A
    cluster-map build) and once for the BRIDGE docs (the only genuinely
    new content, churn-sized: well under a tenth of the corpus). A
    third call would mean the operator re-signs existing content — the
    O(corpus)-per-snapshot regression the design exists to avoid.

    The spy must cover BOTH namespaces (round-9 ADVICE: the old
    cluster-only spy missed the corpus pass inside the dedup-module
    fragment builds after a cache clear): corpus signatures run through
    dedup.minhash_signatures (via corpus_minhash_signatures), bridges
    through cluster.py's own imported binding."""
    from quackio_jl_spark import fragcache
    from quackio_jl_spark.operators import cluster as C
    from quackio_jl_spark.operators import dedup as D

    fragcache.clear()
    calls = []
    real = D.minhash_signatures

    def spy(docs=None, sh=None):
        calls.append((docs if docs is not None else sh).count())
        return real(docs=docs, sh=sh)

    monkeypatch.setattr(D, "minhash_signatures", spy)
    monkeypatch.setattr(C, "minhash_signatures", spy)
    out = C.dedup_cluster_version_diff(spark, SF)
    n = out.count()
    fragcache.clear()
    assert n > 0
    assert len(calls) == 2, f"expected 2 signature builds, saw {len(calls)}"
    corpus, bridges = sorted(calls, reverse=True)
    assert bridges * 10 < corpus, (corpus, bridges)
