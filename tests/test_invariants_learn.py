"""Structural invariants of the late-round-5 waves: learned-model
operators (operators/learn.py), CDC chunking + evasion-robust dedup
(operators/dedup.py), cluster-keyed splits (operators/cluster.py), resize
planning + aspect-bucket padding (operators/multimodal.py), Holt trend
(plans/stats.py), watermark lateness, continuation pairs, and Min-K%
contamination (operators/selection.py) — checked on the sf0.001 fixture
or on synthetic frames that reach branches the fixture can't (resize >224,
out-of-order arrivals, planted benchmark copies, perturbed duplicates).
These complement the DuckDB oracle gate: the oracle proves Spark and
DuckDB agree; these prove the shared formulation is self-consistent
(GD descends, isotonic is monotone, CDC re-synchronizes after an insert,
the cluster split never leaks, Min-K% fires on a verbatim copy)."""

from __future__ import annotations

import pytest

from quackio_jl_spark.operators.learn import (
    _GD_ITERS,
    _SW_BATCH,
    _SW_WORKERS,
)
from quackio_jl_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q(spark):
    def run(name):
        return QUERIES[name](spark, SF).collect()

    return run


def test_naive_bayes_beats_chance_and_covers_corpus(q, spark):
    rows = q("langid_naive_bayes")
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n_docs  # exactly one prediction per document
    langs = {
        r["lang"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("lang")
        .distinct()
        .collect()
    }
    assert all(r["pred_lang"] in langs for r in rows)
    acc = sum(1 for r in rows if r["correct"]) / len(rows)
    # Resubstitution accuracy of a fitted NB must beat the majority-class
    # rate on a 5-language corpus (chance ~ largest prior).
    from collections import Counter

    maj = Counter(r["lang"] for r in rows).most_common(1)[0][1] / len(rows)
    assert acc >= maj
    # Log-posteriors are negative and finite.
    assert all(r["score"] < 0 for r in rows)


def test_gd_loss_strictly_decreases(q):
    rows = sorted(q("logreg_gd_training_curve"), key=lambda r: r["iter"])
    assert [r["iter"] for r in rows] == list(range(1, _GD_ITERS + 1))
    losses = [r["loss"] for r in rows]
    # Full-batch GD with a sane lr on a convex loss must descend monotonically.
    assert all(a > b for a, b in zip(losses, losses[1:]))
    # Iteration 1 starts from w=0 => p=0.5 => loss = ln 2.
    assert losses[0] == pytest.approx(0.69314718, abs=1e-6)


def test_gd_partition_count_invariance(spark):
    # The rounded-decimal gradient recipe must make weights identical for
    # any partitioning of the feature frame.
    df = QUERIES["logreg_gd_training_curve"](spark, SF)
    base = sorted(map(tuple, df.collect()))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = sorted(
            map(tuple, QUERIES["logreg_gd_training_curve"](spark, SF).collect())
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == again


def test_isotonic_fit_is_monotone_and_mean_preserving(q):
    rows = sorted(q("quality_isotonic_calibration"), key=lambda r: r["bin"])
    iso = [r["iso_rate"] for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(iso, iso[1:]))  # nondecreasing
    for r in rows:
        assert 0.0 <= r["iso_rate"] <= 1.0
        assert 0.0 <= r["raw_rate"] <= 1.0
    # Weighted mean preservation (a PAV identity), up to rounding of the
    # per-interval averages.
    n = sum(r["n_k"] for r in rows)
    raw_mean = sum(r["n_k"] * r["raw_rate"] for r in rows) / n
    iso_mean = sum(r["n_k"] * r["iso_rate"] for r in rows) / n
    assert iso_mean == pytest.approx(raw_mean, abs=1e-4)


def test_shard_schedule_conserves_docs_and_bounds_drop(q, spark):
    rows = q("shard_worker_assignment_balance")
    assert len(rows) <= _SW_WORKERS
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs  # nothing lost pre-drop
    steps = {r["lockstep_steps"] for r in rows}
    assert len(steps) == 1  # lockstep count is global
    (lockstep,) = steps
    assert lockstep == min(r["n_batches"] for r in rows)
    for r in rows:
        assert r["dropped_docs"] == r["n_docs"] - lockstep * _SW_BATCH
        assert r["dropped_docs"] >= 0
        assert r["token_skew"] > 0


def test_margin_targets_are_the_least_confident(q, spark):
    rows = q("annotation_margin_targets")
    assert len(rows) == 20
    margins = [r["margin"] for r in rows]
    assert all(m >= 0 for m in margins)  # top1 - top2 is nonnegative
    assert margins == sorted(margins)  # ascending uncertainty order
    # The selected docs must be MORE uncertain than the corpus at large:
    # every selected margin is <= the max selected margin by construction;
    # verify against the full posterior table that no unselected doc has a
    # strictly smaller margin.
    from quackio_jl_spark.operators.learn import _nb_doc_posteriors

    post = _nb_doc_posteriors(spark, SF).collect()
    by_doc = {}
    for r in post:
        by_doc.setdefault(r["doc_id"], []).append(r["post6"])
    full_margins = {
        d: round((sorted(v, reverse=True)[0] - sorted(v, reverse=True)[1]) / 1e6, 6)
        for d, v in by_doc.items()
        if len(v) >= 2
    }
    cutoff = margins[-1]
    selected = {r["doc_id"] for r in rows}
    worse = [d for d, m in full_margins.items() if m < cutoff and d not in selected]
    assert not worse


def test_crossval_folds_partition_corpus(q, spark):
    from quackio_jl_spark.operators.learn import _CV_FOLDS

    rows = q("langid_nb_crossval")
    assert sorted(r["fold"] for r in rows) == list(range(_CV_FOLDS))
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["n_correct"] <= r["n_docs"]
        assert 0.0 <= r["accuracy"] <= 1.0
    # Held-out accuracy should still beat the ~1/5 chance floor on this
    # separable fixture (languages have disjoint-ish vocabularies).
    overall = sum(r["n_correct"] for r in rows) / n_docs
    assert overall > 0.25


def test_cdc_chunking_is_shift_resilient(spark):
    """The CDC marquee property: prepending bytes to a document changes
    only the chunks before the first re-synchronizing boundary, so most
    chunk hashes survive — unlike fixed-size chunking where one inserted
    byte shifts EVERY chunk."""
    from quackio_jl_spark.operators.dedup import _cdc_chunk_table

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest where nobody ever goes at night "
        "because the shadows are long and the paths are winding and old"
    ) * 3
    shifted = "XYZPREFIX " + base
    df = spark.createDataFrame(
        [(1, base), (2, shifted)], ["doc_id", "text"]
    )
    chunks = _cdc_chunk_table(df).collect()
    h1 = {r["chunk_hash"] for r in chunks if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in chunks if r["doc_id"] == 2}
    assert len(h1) > 3  # the fixture actually chunks
    overlap = len(h1 & h2) / len(h1)
    # After the first boundary past the insertion, cut points re-align.
    assert overlap >= 0.5
    # Fixed-size chunking on the same pair shares (almost) nothing.
    fixed = {
        (r["doc_id"], i): r["text"][i : i + 64]
        for r in df.collect()
        for i in range(0, len(r["text"]), 64)
    }
    f1 = {v for (d, _), v in fixed.items() if d == 1}
    f2 = {v for (d, _), v in fixed.items() if d == 2}
    assert len(f1 & f2) / len(f1) < overlap


def test_cdc_short_docs_no_phantom_cuts(spark):
    """Regression for the descending-sequence hazard: Spark's two-arg
    sequence(8, n) DESCENDS when n < 8 ([8,7,6,5] for n=5), which would
    emit phantom cut points past the end of a sub-window-length document
    (DuckDB's range(8, n+1) is empty there). The guarded kernel must give
    every 0-to-7-char doc exactly ONE chunk spanning the whole text, drop
    NULL-text docs, and never cut past length(text)."""
    import duckdb

    from quackio_jl_spark.operators.dedup import _cdc_chunk_table

    fixtures = [
        (1, ""),
        (2, "a"),
        (3, "abcdefg"),  # 7 chars: one below the window
        (4, "abcdefgh"),  # exactly the window
        (5, None),
        (6, "the quick brown fox jumps over the lazy dog " * 4),
    ]
    df = spark.createDataFrame(fixtures, "doc_id int, text string")
    chunks = _cdc_chunk_table(df).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 5 not in by_doc  # NULL text yields no chunks
    lens = {d: (t if t is not None else "") for d, t in fixtures}
    for doc_id in (1, 2, 3, 4):
        rows = by_doc[doc_id]
        assert len(rows) == 1, f"doc {doc_id}: expected 1 chunk, got {rows}"
        assert rows[0]["chunk_len"] == len(lens[doc_id])
    # exact tiling everywhere => no phantom cut ever extended a doc
    for doc_id, rows in by_doc.items():
        assert sum(r["chunk_len"] for r in rows) == len(lens[doc_id])
    # cross-engine: the lambda-free oracle CTE agrees on this hostile frame
    from quackio_jl_spark.operators.dedup import _CDC_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({d}, {'NULL' if t is None else repr(t)})" for d, t in fixtures
        )
        + ") AS v(doc_id, text)"
    )
    oracle = con.execute(
        "WITH " + _CDC_SQL + " SELECT doc_id, chunk_idx, chunk_len, chunk_hash "
        "FROM chunks ORDER BY doc_id, chunk_idx"
    ).fetchall()
    spark_rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_len"], r["chunk_hash"])
        for r in chunks
    )
    assert spark_rows == [tuple(r) for r in oracle]


def test_cdc_chunks_tile_each_document(q, spark):
    rows = q("dedup_cdc_chunks")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    total_chars = docs.selectExpr("sum(length(text))").collect()[0][0]
    assert sum(r["total_chars"] for r in rows) == total_chars  # exact tiling
    for r in rows:
        assert 0 <= r["dup_chunks"] <= r["n_chunks"]
        assert 0 <= r["dup_chars"] <= r["total_chars"]


def test_cluster_split_eliminates_leakage(q, spark):
    """The whole point of split_by_dedup_cluster: near-dup pairs never
    straddle the split (same cluster => same side), while the doc-keyed
    split is allowed to leak."""
    from quackio_jl_spark.operators.dedup import dedup_minhash_lsh_pairs
    from quackio_jl_spark.registry import QUERIES

    assign = {r["doc_id"]: r for r in q("split_by_dedup_cluster")}
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(assign) == n_docs
    # same cluster -> same split, by construction and in the output
    by_cluster = {}
    for r in assign.values():
        by_cluster.setdefault(r["cluster"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    # zero straddling near-dup pairs under the cluster split
    pairs = dedup_minhash_lsh_pairs(spark, SF).collect()
    straddle = [
        (p["doc1"], p["doc2"])
        for p in pairs
        if assign[p["doc1"]]["split"] != assign[p["doc2"]]["split"]
    ]
    assert straddle == []
    # both sides are non-empty (the split still splits)
    sides = {r["split"] for r in assign.values()}
    assert sides == {"train", "test"}


def test_resize_plan_snaps_clamps_and_never_upscales(spark):
    """Drive the resize kernel with synthetic dims (the sf fixture's fake
    decode never exceeds the 224 threshold, so the resize branch needs
    explicit coverage): long side clamps to 224, outputs snap DOWN to
    multiples of 8 with a floor of 8, small images pass through untouched,
    and the quarter-unit aspect bucket clamps to [1, 16]."""
    from quackio_jl_spark.operators.multimodal import (
        AR_Q,
        RESIZE_LONG_SIDE,
        RESIZE_SNAP,
        _resize_plan,
    )

    dims = [
        (1, "image", 100, 50),     # small: pass-through
        (2, "image", 448, 224),    # 2x over: exact halving
        (3, "image", 1000, 10),    # extreme AR: min-dim floor + bucket clamp
        (4, "video", 10, 1000),    # inverse extreme
        (5, "image", 225, 225),    # just over threshold
        (6, "image", 224, 224),    # exactly at threshold: untouched
        (7, "image", 300, 200),    # non-integral scale: snap down
    ]
    df = spark.createDataFrame(dims, ["doc_id", "media_type", "width", "height"])
    rows = {r["doc_id"]: r for r in _resize_plan(df).collect()}

    for r in rows.values():
        long_out = max(r["out_width"], r["out_height"])
        if r["resized"]:
            assert long_out <= RESIZE_LONG_SIDE
            assert r["out_width"] % RESIZE_SNAP == 0
            assert r["out_height"] % RESIZE_SNAP == 0
        else:
            assert (r["out_width"], r["out_height"]) == (r["width"], r["height"])
            assert max(r["width"], r["height"]) <= RESIZE_LONG_SIDE
        assert r["out_width"] >= RESIZE_SNAP and r["out_height"] >= RESIZE_SNAP
        assert 1 <= r["ar_bucket_q"] <= 16
        # floor(AR_Q * w/h + 0.5), clamped — integer-exact reference
        expect = min(16, max(1, (AR_Q * 2 * r["width"] + r["height"]) // (2 * r["height"])))
        assert r["ar_bucket_q"] == expect

    assert not rows[1]["resized"] and not rows[6]["resized"]
    assert (rows[2]["out_width"], rows[2]["out_height"]) == (224, 112)
    assert rows[3]["out_height"] == RESIZE_SNAP  # floored, never 0
    assert rows[3]["ar_bucket_q"] == 16 and rows[4]["ar_bucket_q"] == 1
    assert rows[5]["resized"]
    # non-integral scale: floor(200*224/300)=149 -> snap 144
    assert (rows[7]["out_width"], rows[7]["out_height"]) == (224, 144)


def test_evasion_normalization_catches_perturbed_duplicates(spark):
    """Zero-width injection, homoglyph swaps, case/whitespace jitter all
    collapse to one group under the evasion normalizer while raw md5 sees
    distinct texts; genuinely different texts stay separate."""
    from quackio_jl_spark.operators.dedup import _evasion_normalize

    base = "the quick brown fox"
    variants = [
        base,
        "the qu​ick brown fox",        # zero-width space inside a word
        "the quick br­own fox",         # soft hyphen
        "The  Quick   Brown Fox",            # case + whitespace jitter
        "the quick brown fоx",          # Cyrillic о for o
        "thе quick brown fox",          # Cyrillic е for e
    ]
    rows = [(i, t) for i, t in enumerate(variants)] + [(99, "something else")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    import pyspark.sql.functions as F

    out = df.select(
        "doc_id", _evasion_normalize(F.col("text")).alias("norm")
    ).collect()
    norms = {r["doc_id"]: r["norm"] for r in out}
    assert len({norms[i] for i in range(len(variants))}) == 1
    assert norms[99] != norms[0]
    # raw hashes of the variants are all distinct (the evasion premise)
    raw = df.select("doc_id", F.md5("text").alias("h")).collect()
    assert len({r["h"] for r in raw if r["doc_id"] != 99}) == len(variants)


def test_holt_trend_tracks_a_linear_series(spark):
    """Feed the Holt fold an exactly linear monthly series: level must
    converge onto the line and the h-step forecasts must extrapolate it."""
    from quackio_jl_spark.registry import QUERIES
    import datetime, tempfile, os

    # Build a tiny orders parquet with revenue exactly 100 + 10*t per month.
    rows = []
    t = 0
    for year in (1995, 1996):
        for m in range(1, 13):
            rows.append((t, datetime.date(year, m, 1), float(100 + 10 * t)))
            t += 1
    df = spark.createDataFrame(rows, ["o_orderkey", "o_orderdate", "o_totalprice"])
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    out = QUERIES["orders_monthly_holt_trend"](spark, d).collect()[0]
    assert out["n_months"] == 24
    # The last observation is 100 + 10*23 = 330; a converged Holt fit on a
    # noiseless line has level == last y and trend == slope.
    assert out["level"] == pytest.approx(330.0, abs=1e-4)
    assert out["trend"] == pytest.approx(10.0, abs=1e-4)
    assert out["forecast_1"] == pytest.approx(340.0, abs=1e-3)
    assert out["forecast_3"] == pytest.approx(360.0, abs=1e-3)
    # One-step errors vanish once the fit locks on; MAE stays tiny.
    assert out["mae_one_step"] < 1e-6


def test_evasion_dedup_stream_matches_batch_groups(spark):
    """Streaming first-arrival dedup on the evasion-robust digest keeps
    exactly one representative per normalized group the batch operator
    reports, and every kept doc really belongs to its group."""
    import pyspark.sql.functions as F
    from quackio_jl_spark.operators.dedup import _evasion_normalize
    from quackio_jl_spark.streaming.events import evasion_dedup_stream

    kept = evasion_dedup_stream(spark, SF, queryName="t_evasion").collect()
    batch = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id", F.md5(_evasion_normalize(F.col("text"))).alias("norm_key")
        )
        .collect()
    )
    groups = {}
    for r in batch:
        groups.setdefault(r["norm_key"], set()).add(r["doc_id"])
    assert len(kept) == len(groups)  # one survivor per normalized group
    assert {r["norm_key"] for r in kept} == set(groups)
    for r in kept:
        assert r["doc_id"] in groups[r["norm_key"]]


def test_calibration_improvement_is_nonnegative_and_bounded(q):
    """Isotonic regression is the L2-optimal monotone fit on the bins, so
    mapping each bin's prediction to its fitted rate can only reduce the
    binned ECE; both ECEs live in [0, 1]."""
    row = q("quality_calibration_improvement")[0]
    assert 0.0 <= row["ece_iso"] <= row["ece_raw"] <= 1.0
    assert row["ece_reduction"] == pytest.approx(
        row["ece_raw"] - row["ece_iso"], abs=1e-8
    )
    assert row["n_bins"] >= 1


def test_ar_bucket_padding_beats_global_padding(q):
    """Bucketed padding can never waste more pixels than padding every
    item to the global max dims — per bucket, max dims are dominated by
    the global max while useful pixels are identical."""
    rows = q("multimodal_ar_bucket_padding")
    assert rows
    g = {r["pad_frac_global"] for r in rows}
    assert len(g) == 1  # the global number is global
    (pad_global,) = g
    for r in rows:
        assert 0.0 <= r["pad_frac_bucketed"] <= pad_global <= 1.0
        assert r["max_w"] <= 224 and r["max_h"] <= 224
    # aggregate waste under bucketing is strictly below the naive collate
    tot = sum(r["n_items"] for r in rows)
    agg = sum(r["n_items"] * r["pad_frac_bucketed"] for r in rows) / tot
    assert agg < pad_global


def test_watermark_audit_on_out_of_order_feed(spark):
    """Synthetic feed with known lateness: events arrive (by event_id) with
    some event times 2 and 20 minutes behind the high-water mark; the audit
    must bucket them and produce a nondecreasing kept_fraction reaching 1."""
    import datetime, os, tempfile

    from quackio_jl_spark.registry import QUERIES

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        (1, ts(0)), (2, ts(10)), (3, ts(8)),    # 2 min late
        (4, ts(20)), (5, ts(0)),                # 20 min late
        (6, ts(30)), (7, ts(30)), (8, ts(29)),  # 1 min late
    ]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp")
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = sorted(
        QUERIES["events_watermark_lateness_audit"](spark, d).collect(),
        key=lambda r: (r["wm_minutes"] == -1, r["wm_minutes"]),
    )
    by_bucket = {r["wm_minutes"]: r for r in out}
    assert by_bucket[0]["n"] == 5      # on-time events
    assert by_bucket[1]["n"] == 1      # the 1-minute straggler
    assert by_bucket[5]["n"] == 1      # the 2-minute one (<=5 bucket)
    assert by_bucket[60]["n"] == 1     # the 20-minute one (<=60 bucket)
    kept = [r["kept_fraction"] for r in out]
    assert kept == sorted(kept)
    assert kept[-1] == 1.0


def test_mink_prob_flags_a_planted_copy(spark):
    """Plant a benchmark doc that verbatim-copies a training doc: its
    Min-K% score must dominate every genuinely held-out doc (their worst
    bigrams are unseen by the train LM; the copy's worst bigrams are not)."""
    import os, tempfile

    from quackio_jl_spark.registry import QUERIES

    train_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    # training docs: ids 1..19 and 21 (none % 20 == 0); 21 carries train_text
    rows = [(i, f"tok{i}a tok{i}b tok{i}c tok{i}d tok{i}e " * 6) for i in range(1, 20)]
    rows.append((21, train_text))
    rows.append((20, train_text))  # bench doc: VERBATIM copy of doc 21
    rows.append((40, "omega psi chi phi upsilon tau sigma rho " * 5))  # clean bench
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    out = {r["doc_id"]: r for r in QUERIES["mink_prob_contamination"](spark, d).collect()}
    assert set(out) == {20, 40}  # exactly the bench slice is scored
    assert out[20]["min_k_avg_logprob"] > out[40]["min_k_avg_logprob"] + 1.0


def test_pca_top3_consistency(q):
    """PC-1 of the deflation chain must equal the single-component query
    bit-for-bit (same pinned arithmetic); every component is unit-norm
    (iterates are normalized then rounded to 10 dp); deflation removes
    energy, so Rayleigh norms are non-increasing and positive."""
    rows3 = q("embedding_pca_top3")
    rows1 = {r["j"]: r for r in q("embedding_pca_power_iteration")}
    by_comp = {}
    for r in rows3:
        by_comp.setdefault(r["component"], {})[r["j"]] = r
    assert set(by_comp) == {1, 2, 3}
    for j, r in by_comp[1].items():
        assert r["loading"] == rows1[j]["loading"]
        assert r["eigenvalue"] == rows1[j]["eigenvalue"]
    eig = {c: next(iter(m.values()))["eigenvalue"] for c, m in by_comp.items()}
    assert eig[1] >= eig[2] >= eig[3] > 0
    for c, m in by_comp.items():
        nrm = sum(r["loading"] ** 2 for r in m.values()) ** 0.5
        assert abs(nrm - 1.0) < 1e-6, (c, nrm)


def test_cdc_inrow_chunker_equals_window_kernel(spark):
    """_cdc_chunks_inrow (the stream-safe window-free form) must produce
    the EXACT row set of _cdc_chunk_table on real data and on the hostile
    short/empty/NULL frame — the invariant that lets the streaming ingest
    twin share the batch operator's semantics."""
    from quackio_jl_spark.operators.dedup import (
        _cdc_chunk_table,
        _cdc_chunks_inrow,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    a = {tuple(r) for r in _cdc_chunk_table(d).collect()}
    b = {tuple(r) for r in _cdc_chunks_inrow(d).collect()}
    assert a == b and a
    hostile = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "abcdefgh"), (4, None),
         (5, "the quick brown fox " * 10)],
        "doc_id int, text string",
    )
    a = {tuple(r) for r in _cdc_chunk_table(hostile).collect()}
    b = {tuple(r) for r in _cdc_chunks_inrow(hostile).collect()}
    assert a == b
