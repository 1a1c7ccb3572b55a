"""Structural invariants for the round-5 continuation wave (bloom pruning,
bandits, DP release, SAX motifs, causal IPW, clarity, posting compression).

Value-level correctness is the oracle gate's job (tools/check_correctness.py);
these tests pin the structural/mathematical properties the oracle can't see
— e.g. that the bloom filter admits every true key (no false negatives by
construction, not just on today's data)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quackio_jl_spark.registry import QUERIES, table

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives(spark):
    """Every fact row whose key IS in the dimension must pass the filter:
    bloom_pass_rows >= true_match_rows and true_match_rows equals the plain
    semi-join count (false positives never subtract, only add)."""
    stats = QUERIES["bloom_prune_join_stats"](spark, SF_DIR).collect()[0]
    li = table(spark, SF_DIR, "lineitem")
    dim = table(spark, SF_DIR, "part").filter(F.col("p_brand") == "Brand#13")
    true_rows = li.join(
        dim.select(F.col("p_partkey").alias("l_partkey")), "l_partkey", "semi"
    ).count()
    assert stats.true_match_rows == true_rows
    assert stats.bloom_pass_rows >= stats.true_match_rows
    assert stats.false_positive_rows == stats.bloom_pass_rows - stats.true_match_rows


def test_bloom_words_fit_32_bits(spark):
    """The bit-set representation never touches the BIGINT sign: every word
    is in [0, 2^32) and there are at most m/32 words."""
    from quackio_jl_spark.operators.bloom import _M_BITS, _WORD, _bloom_words

    rows = _bloom_words(spark, SF_DIR).collect()
    assert len(rows) <= _M_BITS // _WORD
    for r in rows:
        assert 0 <= r.word < (1 << _WORD)
        assert 0 <= r.word_idx < _M_BITS // _WORD


def test_bloom_prefilter_is_selective(spark):
    """The prefilter actually prunes: pass rows are a small fraction of the
    fact (the whole point of shipping the bits to the scan)."""
    stats = QUERIES["bloom_prune_join_stats"](spark, SF_DIR).collect()[0]
    assert stats.bloom_pass_rows < stats.n_fact_rows * 0.25


def test_dp_noise_is_bounded_and_nonzero(spark):
    """Laplace noise from a 32-bit seeded uniform is bounded by
    (1/eps)*ln(2^32) ~ 22.18 and (almost surely) nonzero — a release equal
    to the true counts would mean the mechanism is wired to zero noise."""
    rel = {
        r.event_type: r.noisy_count
        for r in QUERIES["dp_mechanism_demo_event_counts"](spark, SF_DIR).collect()
    }
    true = {
        r.event_type: r.cnt
        for r in table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert set(rel) == set(true)
    import math

    bound = math.log(2**32) + 1e-6
    diffs = [abs(rel[k] - true[k]) for k in rel]
    assert all(d <= bound for d in diffs)
    assert any(d > 1e-9 for d in diffs)


def test_ucb_exploration_bonus_monotone(spark):
    """UCB1 structure: exactly one next arm; every arm's score strictly
    exceeds its mean reward (the exploration bonus is positive); and for
    equal means, fewer pulls => larger bonus (checked via the formula
    directly on the returned counts)."""
    import math

    rows = QUERIES["ab_ucb_bandit_scores"](spark, SF_DIR).collect()
    assert sum(r.is_next_arm for r in rows) >= 1
    n_total = sum(r.pulls for r in rows)
    for r in rows:
        assert r.ucb_score > r.mean_reward
        expected = r.mean_reward + math.sqrt(
            2 * round(math.log(n_total), 8) / r.pulls
        )
        assert abs(r.ucb_score - expected) < 1e-4


def test_sax_words_partition_days_exactly(spark):
    """Every day symbolizes to exactly one 4-letter word over alphabet
    {a,b,c,d}: n_days sums to the number of distinct event days."""
    rows = QUERIES["events_sax_daily_motifs"](spark, SF_DIR).collect()
    total_days = (
        table(spark, SF_DIR, "events")
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .count()
    )
    assert sum(r.n_days for r in rows) == total_days
    import re

    for r in rows:
        assert re.fullmatch(r"[abcd]{4}", r.sax_word)


def test_ipw_ate_is_between_arm_extremes(spark):
    """Hajek IPW means are convex combinations of observed outcomes, so
    each reweighted arm mean must lie within that arm's raw outcome range,
    and the counts must partition the joined fact."""
    r = QUERIES["discount_ipw_ate"](spark, SF_DIR).collect()[0]
    li = table(spark, SF_DIR, "lineitem")
    pt = table(spark, SF_DIR, "part")
    joined_n = li.join(pt, li.l_partkey == pt.p_partkey).count()
    assert r.n_treated + r.n_control == joined_n
    ymin, ymax = (
        li.agg(F.min("l_quantity"), F.max("l_quantity")).collect()[0]
    )
    for m in (r.treated_mean_ipw, r.control_mean_ipw):
        assert float(ymin) <= m <= float(ymax)
    assert abs(r.ate_ipw - (r.treated_mean_ipw - r.control_mean_ipw)) < 1e-5


def test_clarity_score_is_nonnegative_kl(spark):
    """Clarity is a KL divergence over the feedback support, hence >= 0
    (up to the 12-dp contribution rounding), and the feedback set is the
    BM25 top-k."""
    r = QUERIES["retrieval_clarity_score"](spark, SF_DIR).collect()[0]
    assert r.clarity_score >= -1e-6
    assert r.n_feedback_docs <= 10
    assert r.n_terms > 0 and r.n_fb_tokens >= r.n_terms


def test_vbyte_costs_bound_raw_size(spark):
    """d-gap + varbyte never exceeds raw 8-byte ids (gaps fit 5 bytes max)
    and needs at least 1 byte per posting; gap reconstruction must sum
    back to the last doc id + 1 (prefix-sum identity)."""
    rows = QUERIES["postings_dgap_vbyte_size"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.df <= r.vb_bytes <= 5 * r.df
        assert r.raw_bytes == 8 * r.df
        assert 0 < r.compression_ratio <= 0.625


def test_psm_matched_subset_and_bounded_att(spark):
    """Matched treated rows are a subset of all treated rows, and the ATT
    is bounded by the outcome range (each term is a difference of convex
    combinations of observed outcomes)."""
    r = QUERIES["discount_psm_caliper_att"](spark, SF_DIR).collect()[0]
    assert 0 < r.n_treated_matched <= r.n_treated_total
    li = table(spark, SF_DIR, "lineitem")
    ymin, ymax = li.agg(F.min("l_quantity"), F.max("l_quantity")).collect()[0]
    spread = float(ymax) - float(ymin)
    assert abs(r.att_caliper) <= spread


def test_cms_never_underestimates(spark):
    """Count-min's one-sided error: every estimate >= the true count, and
    the expected-error bound e*N/w holds with slack at this scale."""
    import math

    rows = QUERIES["cms_heavy_hitters"](spark, SF_DIR).collect()
    assert len(rows) > 0
    n_events = table(spark, SF_DIR, "events").count()
    bound = math.e * n_events / 256 * 8  # 8x slack on the expectation bound
    for r in rows:
        assert r.overestimate >= 0
        assert r.est_count == r.true_count + r.overestimate
        assert r.overestimate <= bound


def test_oof_encoding_partitions_rows_and_stays_in_range(spark):
    """Cells partition the joined fact; every encoding is a convex
    combination of outcomes and the prior, so it stays in the outcome
    range; and a cell's own rows never move its encoding (hold-out check:
    encoding uses brand totals minus the cell)."""
    rows = QUERIES["target_encode_brand_oof"](spark, SF_DIR).collect()
    li = table(spark, SF_DIR, "lineitem")
    pt = table(spark, SF_DIR, "part")
    joined_n = li.join(pt, li.l_partkey == pt.p_partkey).count()
    assert sum(r.n_rows for r in rows) == joined_n
    ymin, ymax = li.agg(F.min("l_quantity"), F.max("l_quantity")).collect()[0]
    for r in rows:
        assert float(ymin) <= r.oof_encoding <= float(ymax)
        assert 0 <= r.fold < 5


def test_contrastive_hard_negatives_same_cell_never_self(spark):
    """The hard-negative draw must come from the anchor's own IVF cell,
    never equal the anchor, and produce exactly HNEG_K draws for every
    anchor whose cell has another member (singletons drop out)."""
    from quackio_jl_spark.operators.pipeline import HNEG_K

    rows = QUERIES["contrastive_hard_negatives"](spark, SF_DIR).collect()
    cells = {
        r.vec_id: r.cell
        for r in QUERIES["ann_ivf_cells"](spark, SF_DIR).collect()
    }
    from collections import Counter

    sizes = Counter(cells.values())
    per_anchor = Counter(r.vec_id for r in rows)
    for r in rows:
        assert r.neg_vec_id != r.vec_id
        assert cells[r.neg_vec_id] == cells[r.vec_id] == r.cell
    for vid, cell in cells.items():
        expected = HNEG_K if sizes[cell] >= 2 else 0
        assert per_anchor.get(vid, 0) == expected, (vid, cell)


def test_kcenter_radii_non_increasing_and_cover(spark):
    """FPS invariants: selection radii are non-increasing (each new center
    is the farthest point, so the max-min distance can only shrink), the
    covering radius is <= the last selection radius, and centers are
    distinct."""
    rows = sorted(
        QUERIES["embedding_kcenter_coreset"](spark, SF_DIR).collect(),
        key=lambda r: r.rank,
    )
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == len(ids)
    radii = [r.radius for r in rows[1:]]  # rank 1 is the seed (null radius)
    assert rows[0].radius is None
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    assert all(r > 0 for r in radii)
    assert rows[0].covering_radius <= radii[-1] + 1e-12


def test_hits_scores_unit_norm_positive(spark):
    rows = QUERIES["customer_part_hits"](spark, SF_DIR).collect()
    for side in ("hub", "authority"):
        scores = [r.score for r in rows if r.side == side]
        assert scores and all(s >= 0 for s in scores)
        nrm = sum(s * s for s in scores) ** 0.5
        assert abs(nrm - 1.0) < 1e-6, (side, nrm)


def test_bradley_terry_strengths_rank_by_merit(spark):
    rows = QUERIES["source_bradley_terry_strengths"](spark, SF_DIR).collect()
    assert abs(sum(r.strength for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert 0 <= r.wins <= r.games
        assert 0.0 <= r.strength <= 1.0
    # a source that never wins must not out-rate one that always wins
    if any(r.wins == r.games for r in rows) and any(r.wins == 0 for r in rows):
        best = max(r.strength for r in rows if r.wins == r.games)
        worst = min(r.strength for r in rows if r.wins == 0)
        assert best >= worst


def test_shard_mixing_conserves_docs(spark):
    rows = QUERIES["shard_source_mixing_report"](spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 1 <= r.n_sources <= r.n_docs
        assert r.max_source_docs <= r.n_docs
        # KL numerator can round slightly negative per term but the
        # true KL is >= 0; the integer numerator stays above the
        # worst-case rounding slack (half a micro-unit per doc).
        assert r.kl_num_e6 >= -r.n_docs


def test_confident_joint_counts_bounded(spark):
    rows = QUERIES["label_confident_joint"](spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    total = sum(r.n_docs for r in rows)
    assert 0 < total <= n_docs  # below-threshold docs drop out
    langs = {
        r.lang
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("lang").distinct().collect()
    }
    for r in rows:
        assert r.noisy_lang in langs and r.pred_lang in langs
    # some confident agreement must exist even on the tiny fixture
    diag = sum(r.n_docs for r in rows if r.noisy_lang == r.pred_lang)
    assert diag > 0


def test_fs_weights_signs(spark):
    rows = QUERIES["linkage_fellegi_sunter_weights"](spark, SF_DIR).collect()
    assert {r.field for r in rows} == {
        "o_orderpriority", "o_orderstatus", "order_month"
    }
    for r in rows:
        assert 0 <= r.n_agree <= r.n_pairs
        assert 0 < r.u_num <= r.u_den
        # agreement evidence must outweigh disagreement evidence
        assert r.w_agree_e6 > r.w_disagree_e6


def test_entity_clusters_sizes_sane(spark):
    rows = QUERIES["linkage_entity_clusters"](spark, SF_DIR).collect()
    # every entity merges at least 2 records (singletons never enter the
    # edge set), and entity ids are member minima so they're distinct
    for r in rows:
        assert r.n_records >= 2
    assert len({r.entity for r in rows}) == len(rows)


@pytest.mark.slow
def test_interleaved_packing_conserves_tokens(spark):
    from quackio_jl_spark.operators.multimodal import MM_BUDGET

    rows = QUERIES["multimodal_interleaved_packing"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    total_toks = docs.selectExpr(
        "sum(size(split(text, ' ')))"
    ).collect()[0][0]
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.text_tokens for r in rows) == total_toks
    n_images = docs.filter("doc_id % 3 = 0").count()
    assert sum(r.n_images for r in rows) == n_images
    for r in rows:
        assert r.total_cost == r.text_tokens + r.image_patches
        assert r.overfull == (r.total_cost > MM_BUDGET)


def test_adamic_adar_excludes_existing_edges(spark):
    rows = QUERIES["part_link_prediction_adamic_adar"](spark, SF_DIR).collect()
    existing = {
        (r.part1, r.part2)
        for r in QUERIES["market_basket_pairs"](spark, SF_DIR).collect()
    }
    for r in rows:
        assert r.part1 < r.part2
        assert (r.part1, r.part2) not in existing  # predictions only
        assert r.common_neighbors >= 2
        # each common neighbor contributes at most 1e6/ln(2)
        assert 0 < r.aa_score_e6 <= r.common_neighbors * 1_442_696


def test_fs_em_refinement_probabilities_valid(spark):
    rows = QUERIES["linkage_fs_em_refinement"](spark, SF_DIR).collect()
    assert {r.field for r in rows} == {
        "o_orderpriority", "o_orderstatus", "order_month"
    }
    lambdas = {r.lambda1_e8 for r in rows}
    assert len(lambdas) == 1  # prevalence is global
    empty = all(r.m1_e8 is None for r in rows)
    for r in rows:
        for v in (r.m0_e8, r.u0_e8):
            assert 0 <= v <= 100_000_000
        if empty:
            # no candidate pairs at this SF: the EM step is undefined and
            # must be NULL consistently, never a fabricated number
            assert r.m1_e8 is None and r.u1_e8 is None
            continue
        for v in (r.m1_e8, r.u1_e8, r.lambda1_e8):
            assert 0 <= v <= 100_000_000
        # blocked candidates agree far more than random pairs: m > u holds
        # before AND after the EM step
        assert r.m0_e8 > r.u0_e8
        assert r.m1_e8 > r.u1_e8


def test_kcenter_matches_bruteforce_fps(spark):
    """Gonzalez FPS on a small synthetic frame: the distributed operator's
    center sequence and radii must equal a literal python reimplementation
    (same seed = min vec_id, same fixed-point distances, same tie rule)."""
    import math

    from quackio_jl_spark.operators.similarity import KC_CENTERS

    import tempfile, os

    rows = [
        (i, [math.sin(i * 1.7) * 3, math.cos(i * 0.9) * 2, (i % 7) * 0.5])
        for i in range(40)
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    ).write.parquet(os.path.join(d, "embeddings.parquet"))

    def fdot(a, b):
        return sum(math.floor(float(x) * float(y) * 1e9) for x, y in zip(a, b)) / 1e9

    # float32 storage: python reference must read back the same values
    stored = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(os.path.join(d, "embeddings.parquet")).collect()
    }

    def d2(a, b):
        return fdot(a, a) - 2 * fdot(a, b) + fdot(b, b)

    centers = [min(stored)]
    mind = {i: d2(v, stored[centers[0]]) for i, v in stored.items()}
    radii = [None]
    for _ in range(KC_CENTERS - 1):
        nxt = max(stored, key=lambda i: (mind[i], -i))
        radii.append(mind[nxt])
        centers.append(nxt)
        for i, v in stored.items():
            mind[i] = min(mind[i], d2(v, stored[nxt]))
    got = sorted(
        (r.rank, r.vec_id, r.radius)
        for r in QUERIES["embedding_kcenter_coreset"](spark, d).collect()
    )
    want = sorted(
        (k + 1, centers[k], radii[k]) for k in range(KC_CENTERS)
    )
    assert got == want
    cov = {r.covering_radius for r in QUERIES["embedding_kcenter_coreset"](spark, d).collect()}
    assert cov == {max(mind.values())}
