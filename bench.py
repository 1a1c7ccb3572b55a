"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes end-to-end via the ``noop`` sink (full plan execution,
no driver-side materialization cost), after a small JVM warm-up.

Per-query times are MEDIANS over $SPARK_GRAFT_BENCH_REPEATS (default 3)
full passes of the suite — this host's wall-clock swings several-fold under
noisy neighbors (20.5-154 s observed for identical code), and interleaved
passes + medians suppress transient spikes that back-to-back repeats or
single runs would absorb into one query's number.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q13_customer_distribution",
    "q16_supplier_part_count",
    "join_left_orders_per_customer",
    "window_running_spend",
    "events_hourly_window",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "neardup_ngram_jaccard",
    "similarity_topk_cosine",
    "ann_lsh_buckets",
    "ann_ivf_search",
    "chunk_documents",
    "split_train_test",
    "text_quality_score",
    "text_langid_heuristic",
    "text_bpe_token_count",
]

# Round-5 flagship additions, timed separately so the headline total stays
# comparable across rounds (the driver's trend line sums `queries` only via
# `value`; these land in `extended_queries`).
EXTENDED = [
    "ann_pq_codes",
    "ann_pq_adc_topk",
    "ann_ivfpq_search",
    "tfidf_cosine_pairs",
    "trigram_lm_doc_score",
    "dedup_incremental_vs_index",
    "length_grouped_batches",
    "shuffle_corpus_deterministic",
    "knn_label_vote",
    "weighted_reservoir_sample",
    # Late round-5 statistics/tokenization pack.
    "tokenize_with_vocab",
    "boilerplate_ngrams",
    "top_pmi_collocations",
    "quality_score_auc",
    "ks_test_click_vs_view",
    "lineitem_corr_matrix",
    # Round-5 session additions: quality gates, substring dedup, overlap join.
    "gopher_quality_flags",
    "ccnet_lm_buckets",
    "neardup_duplicated_spans",
    "source_overlap_matrix",
    "interval_overlap_join_binned",
    "quality_quantile_normalize",
    "events_gapfill_linear_interpolation",
    "lineitem_mahalanobis_outliers",
    "customer_survival_km",
    "vocab_growth_heaps",
    "part_degree_assortativity",
    "orders_duplicate_invoices",
    "customer_order_streaks",
    # Continuation wave: rank tests, inequality, communities, validity.
    "mannwhitney_u_click_vs_view",
    "kruskal_wallis_ship_latency",
    "wilcoxon_signed_rank_spend",
    "theil_index_nation_spend",
    "part_label_propagation",
    "embedding_simplified_silhouette",
    "embedding_cluster_validity",
    "top_llr_collocations",
    "quality_gains_lift_table",
    "monthly_price_index_laspeyres",
    "neardup_weighted_jaccard",
    "retrieval_mmr_diversified",
    "bigram_lm_kneser_ney_score",
    "ab_test_cuped_adjustment",
    "survival_logrank_by_segment",
    "text_compressibility_ratio",
    "ann_ivf_balance_report",
    # Wave 8: scale-pattern + sketch + causal + IR additions.
    "bloom_prune_join_stats",
    "cms_heavy_hitters",
    "postings_dgap_vbyte_size",
    "retrieval_clarity_score",
    "discount_ipw_ate",
    "target_encode_brand_oof",
    "events_sax_daily_motifs",
    # Wave 9/10: data-selection + mixture-planning + storage-coupled ops.
    "dsir_importance_weights",
    "boilerplate_scrub_report",
    "doremi_domain_weights",
    "incremental_agg_maintenance",
    "ann_ivf_index_persisted_search",
    # Wave 11: learned models, active learning, CDC dedup, resize planning.
    "langid_naive_bayes",
    "langid_nb_crossval",
    "logreg_gd_training_curve",
    "quality_isotonic_calibration",
    "annotation_margin_targets",
    "shard_worker_assignment_balance",
    "dedup_cdc_chunks",
    "split_by_dedup_cluster",
    "multimodal_resize_plan",
    "multimodal_ar_bucket_padding",
    "quality_calibration_improvement",
    "orders_monthly_holt_trend",
    "dedup_evasion_robust_groups",
    "continuation_eval_pairs",
    "events_watermark_lateness_audit",
    "mink_prob_contamination",
    # Round-6 wave: selection/ranking/linkage/audit families.
    "embedding_kcenter_coreset",
    "customer_part_hits",
    "source_bradley_terry_strengths",
    "shard_source_mixing_report",
    "label_confident_joint",
    "linkage_fellegi_sunter_weights",
    "contrastive_hard_negatives",
    "embedding_pca_top3",
    "linkage_entity_clusters",
    "multimodal_interleaved_packing",
    "parquet_footer_column_stats",
    "part_link_prediction_adamic_adar",
    "linkage_fs_em_refinement",
    "unigram_lm_viterbi_segmentation",
    # Round-7 wave: convergence/eval/spectral flagships.
    "linkage_fs_em_converged",
    "part_link_prediction_eval",
    "bigram_lm_heldout_perplexity",
    "part_fiedler_bisection",
    "part_spectral_cut_quality",
    "part_spectral_4way",
    "part_personalized_pagerank",
    "epoch_shuffle_decorrelation",
    "orders_trimmed_winsorized_means",
    "langid_conformal_sets",
    "embedding_mmd_drift",
    "embedding_mmd_permutation_test",
    # Round-8 wave: adaptive-localization beneficiaries now cheap enough
    # to time alongside the rest of the graph family.
    "part_pagerank",
    "part_spectral_cut_vs_random",
    "mixture_temperature_sampling",
    # Round-9 wave: incremental corpus-version maintenance + remote I/O.
    "dedup_cluster_version_diff",
    "dedup_incremental_cluster_assign",
    "roundtrip_parquet_http_multifile",
    "roundtrip_csv_http_ranged",
    "roundtrip_json_http_ranged",
    # Round-10 wave: hive-pruned remote manifests.
    "roundtrip_parquet_http_hive",
    "roundtrip_parquet_http_hive_typed",
]


# Noise-control sentinels (round-11 VERDICT "what's wrong" #2 / "next" #3):
# the movers normalization used the whole 21-query HEADLINE set as the
# host-noise control on the premise it was "untouched since r1" — round 11
# then optimized all 21, so the control drift (0.64x) was CODE, and every
# extended query's normalized ratio was inflated ~1.56x. The control set is
# now these reserved sentinels: queries whose builders are pinned by source
# hash in tests/test_artifacts.py (test_noise_sentinel_builders_unchanged),
# so a round that touches one goes red until the sentinel is consciously
# rotated out — the set is provably disjoint from the round's diff.
NOISE_SENTINELS = [
    "dedup_exact",
    "chunk_documents",
    "split_train_test",
    "text_quality_score",
    "text_bpe_token_count",
]

_TREND_START = "<!-- TREND_TABLE:START (generated by bench.py) -->"
_TREND_END = "<!-- TREND_TABLE:END -->"

_MOVERS_START = "<!-- MOVERS_TABLE:START (generated by bench.py) -->"
_MOVERS_END = "<!-- MOVERS_TABLE:END -->"

_SNIPPET_START = "<!-- SURVEY_SNIPPET:START (generated by bench.py --survey-snippet) -->"
_SNIPPET_END = "<!-- SURVEY_SNIPPET:END -->"


def _replace_between(path: str, start: str, end: str, block: str, heading: str) -> None:
    """Swap the marked block inside ``path`` (appending a new section
    under ``heading`` when the markers don't exist yet)."""
    try:
        text = open(path).read()
    except OSError:
        return
    if start in text and end in text:
        text = text.split(start)[0] + block + text.split(end, 1)[1]
    else:
        text = text.rstrip() + f"\n\n## {heading}\n\n" + block + "\n"
    open(path, "w").write(text)


def noise_factor(prev: dict, cur: dict) -> float:
    """Host-noise factor of THIS run vs the previous artifacts: the
    median cur/prev ratio over the NOISE_SENTINELS control set —
    queries reserved as never-optimized (builder source pinned by
    test_artifacts.py), so their collective drift measures the shared
    VM + global harness, not per-query plan work (identical code has
    measured 20.5-154 s here). 1.0 when fewer than 3 control queries
    overlap (synthetic inputs)."""
    ratios = sorted(
        cur[q] / prev[q]
        for q in NOISE_SENTINELS
        if prev.get(q) and cur.get(q) and prev[q] > 0
    )
    if len(ratios) < 3:
        return 1.0
    return statistics.median(ratios)


def update_movers_table(repo_dir: str, prev: dict, cur: dict, prev_label: str) -> None:
    """Top-5 per-query regressions and improvements of THIS run vs the
    previous committed artifacts, written between the MOVERS markers in
    BASELINE.md — round-9 VERDICT "next" #6: the trend table tracks
    only totals, so a real single-query regression was findable only by
    hand-diffing BENCH_EXTENDED.json.

    Round-10 VERDICT "next" #2 (mechanized adjudication): raw ratios on
    this shared VM flag host spikes every round (five untouched queries
    were flagged in r10 alone, `langid_naive_bayes` three rounds
    running). Each ratio is therefore NORMALIZED by the same-run
    noise_factor() — the median drift of the 21-query headline control
    set, untouched since r1 — and only normalized ratios >1.5x (AND
    >0.5 s absolute) are flagged. A query that merely drifted with the
    host divides out to ~1.0x; a genuinely regressed query keeps its
    ratio. Flagged rows still get a `bench.py --retime` pass before
    being believed."""
    noise = noise_factor(prev, cur)
    movers = []
    for name, c in cur.items():
        p = prev.get(name)
        if not p or not c or p <= 0:
            continue
        ratio = c / p
        norm = ratio / noise
        if abs(c - p) > 0.5 and (norm > 1.5 or norm < 1 / 1.5):
            movers.append((norm, ratio, name, p, c))
    regs = sorted((m for m in movers if m[0] > 1), reverse=True)[:5]
    imps = sorted(m for m in movers if m[0] < 1)[:5]
    rows = [
        f"| {name} | {p:.3f} | {c:.3f} | {r:.2f}x | {n:.2f}x |"
        f" {'REGRESSION — adjudicate' if n > 1 else 'improvement'} |"
        for n, r, name, p, c in [*regs, *imps]
    ] or ["| _none above threshold (normalized >1.5x and >0.5 s)_ | | | | | |"]
    block = "\n".join(
        [
            _MOVERS_START,
            "",
            f"Current bench run vs {prev_label} (headline + extended,"
            " per-query medians); ratios normalized by the reserved"
            " sentinel control set's same-run host factor"
            f" ({noise:.2f}x; controls: {', '.join(NOISE_SENTINELS)}):",
            "",
            "| query | prev (s) | current (s) | ratio | normalized |"
            " direction |",
            "|---|---|---|---|---|---|",
            *rows,
            "",
            _MOVERS_END,
        ]
    )
    _replace_between(
        os.path.join(repo_dir, "BASELINE.md"),
        _MOVERS_START,
        _MOVERS_END,
        block,
        "Per-query movers (latest run vs previous round)",
    )


def _tracked_artifacts(repo_dir: str, pattern: str) -> list[str]:
    """Repo-relative paths of git-TRACKED files matching ``pattern``,
    sorted; falls back to a filesystem glob when ``repo_dir`` is not a
    git repo (e.g. a `git archive` export). Round-10 VERDICT "what's
    wrong" #1: the driver's post-close bench run drops an UNTRACKED
    BENCH_r{N}.json into the working tree, and a filesystem glob then
    resolved "committed artifacts" to a file no commit contains,
    reddening the SURVEY-snippet pinning test every round. Tracked-only
    resolution also fixes the movers-table "previous round" pick
    (ADVICE r10): an in-round re-run can no longer compare against the
    same run's own freshly-written artifact."""
    import fnmatch
    import glob
    import subprocess

    try:
        out = subprocess.run(
            ["git", "ls-files", "--", pattern],
            cwd=repo_dir,
            capture_output=True,
            text=True,
            timeout=30,
        )
        if out.returncode == 0:
            return sorted(
                p for p in out.stdout.splitlines()
                if p.strip() and fnmatch.fnmatch(os.path.basename(p), pattern)
            )
    except Exception:
        pass
    return sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(repo_dir, pattern))
    )


def _read_committed_json(repo_dir: str, relpath: str):
    """Parse ``relpath`` as committed at HEAD (``git show HEAD:path``),
    falling back to the working-tree copy outside a git repo. The
    working-tree copy is deliberately NOT trusted inside a repo: the
    driver's post-close run rewrites tracked artifacts
    (BENCH_EXTENDED.json) in place without committing, and "numbers
    derived from committed artifacts" must mean the committed bytes."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "show", f"HEAD:{relpath}"],
            cwd=repo_dir,
            capture_output=True,
            timeout=30,
        )
        if out.returncode == 0:
            return json.loads(out.stdout.decode("utf-8"))
        # inside a repo but not committed (or no commits yet): treat as
        # absent rather than silently reading uncommitted bytes
        probe = subprocess.run(
            ["git", "rev-parse", "--is-inside-work-tree"],
            cwd=repo_dir,
            capture_output=True,
            timeout=30,
        )
        if probe.returncode == 0 and probe.stdout.strip() == b"true":
            return None
    except Exception:
        pass
    try:
        return json.load(open(os.path.join(repo_dir, relpath)))
    except Exception:
        return None


def survey_snippet(repo_dir: str) -> str:
    """The round-close build-status numbers, derived ONLY from committed
    artifacts (round-9 VERDICT "next" #5: hand-copied prose drifted from
    the committed JSON). tests/test_artifacts.py pins SURVEY.md's copy
    to this exact string. "Committed" is literal (round-10 VERDICT
    "what's wrong" #1): artifacts resolve via `git ls-files` and read
    via `git show HEAD:` so the driver's post-close drop of an
    untracked BENCH_r{N}.json / in-place rewrite of BENCH_EXTENDED.json
    can never change this string between commits."""
    bench_rel = _tracked_artifacts(repo_dir, "BENCH_r[0-9][0-9].json")
    cf_rel = _tracked_artifacts(repo_dir, "CORRECTNESS_FULL_r[0-9][0-9].json")
    parts = []
    if bench_rel:
        b = _read_committed_json(repo_dir, bench_rel[-1]) or {}
        p = b.get("parsed") or {}
        parts.append(
            f"driver bench ({os.path.basename(bench_rel[-1])}): headline"
            f" {p.get('value')} s at sf{p.get('sf')},"
            f" extended {p.get('extended_total_sec')} s,"
            f" {p.get('n_queries_registered')} queries registered"
        )
    e = _read_committed_json(repo_dir, "BENCH_EXTENDED.json")
    if e is not None:
        parts.append(
            f"committed extended detail (BENCH_EXTENDED.json):"
            f" {e.get('extended_total_sec')} s /"
            f" {len(e.get('extended_queries', {}))} queries at"
            f" sf{e.get('sf')}"
        )
    if cf_rel:
        cf = _read_committed_json(repo_dir, cf_rel[-1]) or {}
        recs = {k: v for k, v in cf.items() if not k.startswith("_")}
        fails = [
            k
            for k, v in recs.items()
            if v.get("err") and not str(v["err"]).startswith("rows-only")
        ]
        rows_only = [
            k
            for k, v in recs.items()
            if str(v.get("err") or "").startswith("rows-only")
        ]
        parts.append(
            f"full gate ({os.path.basename(cf_rel[-1])}): {len(fails)}"
            f" failures / {len(recs)} checked"
            f" ({len(rows_only)} rows-only by design)"
        )
    return (
        "Round-close numbers, generated from committed artifacts by"
        " `python bench.py --survey-snippet` — " + "; ".join(parts) + "."
    )


def update_survey_snippet(repo_dir: str) -> str:
    snippet = survey_snippet(repo_dir)
    block = "\n".join([_SNIPPET_START, "", snippet, "", _SNIPPET_END])
    _replace_between(
        os.path.join(repo_dir, "SURVEY.md"),
        _SNIPPET_START,
        _SNIPPET_END,
        block,
        "Round-close numbers (generated)",
    )
    return snippet


def update_trend_table(repo_dir: str) -> None:
    """Regenerate the per-round headline/extended trend table between the
    TREND_TABLE markers in BASELINE.md from the committed BENCH_r0*.json
    artifacts — one committed place to read the trend instead of N JSONs
    (round-7 VERDICT "next" #10). Best-effort: bench output must never
    fail on doc regeneration. Reads git-TRACKED artifacts at their
    committed content, same rationale as survey_snippet()."""
    rows = []
    for rel in _tracked_artifacts(repo_dir, "BENCH_r[0-9][0-9].json"):
        d = _read_committed_json(repo_dir, rel)
        if d is None:
            continue
        p = d.get("parsed") or {}
        if not p:
            # the driver's artifact captured only a truncated log tail
            # (r5): keep the round visible rather than silently skipping
            rows.append(
                f"| r{d.get('n', '?')} | — (artifact captured no JSON"
                " line) | — | — | — |"
            )
            continue
        ext = p.get("extended_total_sec")
        rows.append(
            f"| r{d.get('n', '?')} | {p.get('value', '—')} |"
            f" {ext if ext is not None else '—'} |"
            f" {p.get('n_queries_registered', '—')} |"
            f" {p.get('repeats', 1)} |"
        )
    if not rows:
        return
    table = "\n".join(
        [
            _TREND_START,
            "",
            "| round | headline total (s, sf0.1) | extended total (s) |"
            " queries registered | repeats |",
            "|---|---|---|---|---|",
            *rows,
            "",
            "Headline list unchanged since r1 (21 queries); extended suite"
            " grows with the",
            "registry, so compare its totals only per-query"
            " (BENCH_EXTENDED.json). All",
            "numbers are driver-measured on a shared VM — identical code has"
            " measured",
            "20.5-154 s across rounds, so treat any single round-over-round"
            " ratio as",
            "directional and trust only patterns that repeat across rounds.",
            _TREND_END,
        ]
    )
    baseline = os.path.join(repo_dir, "BASELINE.md")
    try:
        text = open(baseline).read()
    except OSError:
        return
    if _TREND_START in text and _TREND_END in text:
        pre = text.split(_TREND_START)[0]
        post = text.split(_TREND_END, 1)[1]
        text = pre + table + post
    else:
        text = text.rstrip() + "\n\n## Round-over-round trend\n\n" + table + "\n"
    open(baseline, "w").write(text)


_RETIME_CONTROLS = NOISE_SENTINELS[:3]


def _prev_committed_queries(repo_dir: str) -> tuple[dict, str]:
    """Per-query medians from the previous round's COMMITTED artifacts
    (extended side file + latest tracked driver artifact)."""
    prev_all: dict = {}
    prev_label = "previous committed artifacts"
    e = _read_committed_json(repo_dir, "BENCH_EXTENDED.json")
    if e is not None:
        prev_all.update(e.get("extended_queries", {}))
    bench_rel = _tracked_artifacts(repo_dir, "BENCH_r[0-9][0-9].json")
    if bench_rel:
        b = _read_committed_json(repo_dir, bench_rel[-1]) or {}
        prev_all.update((b.get("parsed") or {}).get("queries", {}))
        prev_label = (
            f"{os.path.basename(bench_rel[-1])} + committed"
            " BENCH_EXTENDED.json"
        )
    return prev_all, prev_label


def retime(names: list[str], sf_dir: str, repeats: int = 5) -> dict:
    """Dedicated adjudication bench for movers-table rows (round-10
    VERDICT "next" #2): re-times the named queries over ``repeats``
    interleaved passes ALONGSIDE the noise controls (q1 et al.,
    untouched since r1), so the verdict is the noise-normalized ratio
    vs the committed previous-round numbers — not a raw wall-clock that
    the shared VM can triple on its own. Returns (and main() prints)
    one JSON object with per-query medians, control medians, the
    committed prev numbers, and normalized ratios."""
    from quackio_jl_spark.registry import QUERIES
    from quackio_jl_spark.session import get_spark

    spark = get_spark(app_name="quackio_retime")

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    from quackio_jl_spark.fragcache import release_foreign_storage

    controls = [c for c in _RETIME_CONTROLS if c not in names]
    suite = list(names) + controls
    for name in suite:  # warm-up: codegen/class-loading constants
        run(QUERIES[name](spark, sf_dir))
        release_foreign_storage(spark)
    samples: dict[str, list[float]] = {n: [] for n in suite}
    for _ in range(max(1, repeats)):
        for name in suite:
            t0 = time.perf_counter()
            run(QUERIES[name](spark, sf_dir))
            samples[name].append(time.perf_counter() - t0)
            release_foreign_storage(spark)
    med = {n: round(statistics.median(ts), 3) for n, ts in samples.items()}
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    prev_all, prev_label = _prev_committed_queries(repo_dir)
    ctrl_ratios = sorted(
        med[c] / prev_all[c] for c in controls if prev_all.get(c)
    )
    noise = statistics.median(ctrl_ratios) if ctrl_ratios else 1.0
    out = {
        "metric": "retime_adjudication",
        "sf_dir": sf_dir,
        "repeats": repeats,
        "queries": {n: med[n] for n in names},
        "controls": {c: med[c] for c in controls},
        "noise_factor": round(noise, 3),
        "prev": {n: prev_all.get(n) for n in suite},
        "prev_label": prev_label,
        "normalized_ratio": {
            n: round(med[n] / prev_all[n] / noise, 3)
            for n in names
            if prev_all.get(n)
        },
    }
    return out


def main() -> None:
    import sys

    if "--retime" in sys.argv:
        names = sys.argv[sys.argv.index("--retime") + 1 :]
        if not names:
            raise SystemExit("usage: bench.py --retime <query> [<query>...]")
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        print(json.dumps(retime(names, sf_dir)))
        return
    if "--trend-only" in sys.argv:
        # Regenerate the BASELINE.md trend table from the committed
        # BENCH_r0N.json artifacts WITHOUT running the bench — the
        # driver writes round N's artifact only after round N closes, so
        # each round runs this once at start to pick up the previous
        # round's row (keeps the committed table complete through the
        # latest artifact even when the bench itself only runs later).
        update_trend_table(os.path.dirname(os.path.abspath(__file__)))
        return
    if "--survey-snippet" in sys.argv:
        # Regenerate the SURVEY.md round-close numbers from the committed
        # artifacts (and print them) WITHOUT running the bench.
        print(update_survey_snippet(os.path.dirname(os.path.abspath(__file__))))
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from quackio_jl_spark.registry import QUERIES
    from quackio_jl_spark.session import get_spark

    spark = get_spark(app_name="quackio_bench")

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # Warm-up: run every headline query once at the smallest SF so the
    # timed pass measures steady-state engine throughput, not first-use
    # constants (JVM class loading, whole-stage-codegen compilation — the
    # generated code is data-size-independent, so compiling against
    # sf0.001 warms the cache for the sf0.1 run). Falls back to the bench
    # dir itself if the small SF isn't present.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    # Between queries (outside every timed region) the harness releases
    # persisted storage that no live fragment owns — in-query persists /
    # localCheckpoints that a builder can never free once its action has
    # run. Without this, a 131-query x (1 warm-up + N passes) session
    # accumulates hundreds of orphaned frames and the block-manager /
    # GC pressure lands on whichever queries run late in the suite
    # (text_compressibility_ratio benched 40 s in-suite vs 0.9 s alone;
    # guide §5 "unpersist when done"). Timing methodology is unchanged:
    # same queries, same noop-sink action, same interleaved medians.
    from quackio_jl_spark.fragcache import release_foreign_storage

    for name in HEADLINE + EXTENDED:
        run(QUERIES[name](spark, warm_dir))
        release_foreign_storage(spark)

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE + EXTENDED}
    # Builder (py4j plan construction) vs action (task execution) split
    # per query (round-11 VERDICT "next" #6): the timed region is UNCHANGED
    # (t0..append still brackets builder + action exactly as before) — the
    # split just records where inside it the time went, settling the
    # harness-vs-plan decomposition and explaining the ~1.0 8-core scaling
    # ratios of builder-bound sub-second queries.
    build_samples: dict[str, list[float]] = {name: [] for name in HEADLINE + EXTENDED}
    for _ in range(repeats):
        for name in HEADLINE + EXTENDED:
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            run(df)
            samples[name].append(time.perf_counter() - t0)
            build_samples[name].append(t1 - t0)
            release_foreign_storage(spark)

    med = {name: round(statistics.median(ts), 3) for name, ts in samples.items()}
    bmed = {name: round(statistics.median(ts), 3) for name, ts in build_samples.items()}
    times = {name: med[name] for name in HEADLINE}
    extended = {name: med[name] for name in EXTENDED}
    total = round(sum(times.values()), 3)
    # Previous round's per-query numbers from the COMMITTED artifacts
    # (git ls-files / git show): an in-round re-run can never compare
    # against its own freshly-written side file (ADVICE r10).
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    try:
        prev_all, prev_label = _prev_committed_queries(repo_dir)
    except Exception:
        prev_all, prev_label = {}, "previous committed artifacts"
    # Extended per-query medians go to a SIDE FILE: round 5's single stdout
    # line grew to ~3.4 KB with them inlined and overflowed the driver's
    # ~2 KB tail capture (BENCH_r05.json parsed=null). The driver-facing
    # stdout line below stays <1 KB (21 headline queries + scalars).
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_EXTENDED.json"),
        "w",
    ) as fh:
        json.dump(
            {
                "extended_queries": extended,
                "extended_total_sec": round(sum(extended.values()), 3),
                "sf": sf,
                "repeats": repeats,
                "aggregation": "median_per_query_over_interleaved_passes",
                # per-query builder (plan-construction) medians for EVERY
                # benched query; each query's action time is its entry in
                # queries/extended_queries minus this.
                "builder_queries": {n: bmed[n] for n in HEADLINE + EXTENDED},
                "builder_total_sec": round(sum(bmed.values()), 3),
            },
            fh,
            indent=1,
        )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "repeats": repeats,
                "extended_total_sec": round(sum(extended.values()), 3),
                "extended_detail": "BENCH_EXTENDED.json",
                "n_queries_registered": len(QUERIES),
                # builder (plan-construction) share of `value`; per-query
                # split in BENCH_EXTENDED.json (additions-only: the stdout
                # contract's existing keys are unchanged).
                "builder_sec": round(sum(bmed[n] for n in HEADLINE), 3),
            }
        )
    )
    try:
        update_trend_table(repo_dir)
        if prev_all:
            update_movers_table(repo_dir, prev_all, med, prev_label)
    except Exception:
        pass  # trend/movers tables are documentation; never fail the bench


if __name__ == "__main__":
    main()
