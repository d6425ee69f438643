"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Headliners are the operators with published reference numbers
(BASELINE.md): exact + approximate outlier detection, MRFFT, frequent
items, word count — plus the star-schema join/agg spine. Each runs as
one Catalyst plan; timing includes the action (count of the result,
mirroring how the reference times each operator around its action).
"""

from __future__ import annotations

import gc
import json
import os
import time

from big_data_hw_23_24_spark.queries import _ensure_loaded, _REGISTRY
from big_data_hw_23_24_spark.session import get_session

HEADLINE = [
    "mr_approx_outliers",     # C2 — the reference's centerpiece
    "exact_outliers",         # C1 — grid equi-join (reference: O(N²) driver)
    "mrfft_radius",           # C4 — coreset → FFT → broadcast radius
    "frequent_users_exact",   # K3 batch face
    "wordcount",              # C6
    "pricing_summary",        # A1/A8 hash agg
    "revenue_by_nation",      # star-schema joins
    "top_customers_per_nation",  # window top-k
    "dedup_minhash_lsh",      # LLM op: banded LSH near-dedup
    "knn_cosine_bruteforce",  # LLM op: exact cosine top-k baseline
    "events_by_window",       # event-time tumbling window agg
    "events_asof_orders",     # as-of join via union+window rewrite
    "order_events_3d",        # interval join via bucket-explode rewrite
    "dedup_embedding_lsh",    # hyperplane-LSH embedding near-dedup
    "doc_tfidf_top_terms",    # LLM op: TF-IDF keyword extraction
    "doc_chunks",             # LLM op: overlapping token chunking
    "frequent_users_cms",     # count-min sketch heavy hitters
    "sessions_builtin_window",  # native session_window aggregate
    "customer_rolling_30d",   # RANGE-frame rolling window
    "knn_cosine_quantized",   # LLM op: int8-scan + exact-rerank search
    # r5 additions — the headline set widened from 20 to 26 queries, so
    # compare per-query (not the total) across rounds
    "dedup_incremental",      # batch-vs-corpus fingerprint dedup
    "bpe_pair_counts",        # tokenizer prep: vocab-exploded pair counts
    "vocab_coverage",         # tokenizer prep: coverage curve
    "doc_repetition_scores",  # repetition quality signals, 1-shuffle plan
    "doc_pack_sequences",     # per-shard context-window packing
    "corpus_source_mix",      # deterministic data-mixing sampler
    # r6 additions (set now 28 — compare per-query across rounds)
    "knn_pq_adc",             # PQ code-scan ADC search + LUT broadcast
    "doc_boilerplate_share",  # cross-doc boilerplate exposure scoring
    "dedup_semantic_clusters",  # SemDeDup cluster-keyed cosine dedup
    "corpus_quality_budget",  # two-pass global prefix-sum budget cut
    # late-r6 additions (set now 39)
    "doc_bm25_multi",         # inverted-index batch BM25 retrieval
    "doc_dsir_weights",       # DSIR hashed-bigram importance weights
    "doc_quality_classifier",  # zero-shuffle hashed linear classifier
    "corpus_temperature_mix",  # temperature source upsampling
    "doc_span_dedup",         # exact repeated-span removal
    "user_funnel_3stage",     # sequential event funnel
    "user_retention_cohorts",  # weekly retention matrix
    "corpus_dedup_paragraphs",  # CCNet cross-doc paragraph dedup
    "dedup_incremental_minhash",  # batch-vs-signature-store near-dup
    # r7 additions (set now 45)
    "dedup_minhash_banded",   # md5-family banded LSH self-join face
    "doc_decontaminate_spans",  # benchmark-gram span stripping
    "dedup_url_normalized",   # provenance URL dedup groups
    "doc_lm_quality_buckets",  # CCNet per-language head/middle/tail
    "dedup_containment_pairs",  # asymmetric containment near-dup
    "events_zorder_key",      # Morton layout key kernel
    "embedding_gram_matrix",  # one-pass BLAS Gram/PCA prep
    "doc_sentence_chunks",    # sentence-boundary greedy packing
    "corpus_pmi_collocations",  # PMI phrase mining
    "events_skew_report",     # key-skew diagnosis
    # late-r7 additions (set now 61; the stdout line now always takes
    # the slowest-20 fallback — full per-query detail in
    # BENCH_DETAIL.json)
    "doc_gopher_rules",       # Gopher rule battery, zero-shuffle fold
    "corpus_priority_sample",  # weighted HT sampling via grouped top-k
    "corpus_zipf_fit",        # regr_* rank-frequency fit
    "events_item_pagerank",   # 3-iteration vertex-keyed PageRank
    "corpus_source_overlap",  # gram-keyed containment matrix
    "doc_unicode_nfc",        # Arrow NFC normalization
    "knn_mmr_rerank",         # unrolled greedy MMR diversification
    "events_daily_anomaly",   # trailing-baseline z-scores
    "corpus_vocab_growth",    # Heaps-law growth curve
    "corpus_snapshot_diff",   # fingerprint change set, full-outer join
    "corpus_length_ks_matrix",  # KS drift matrix over the value grid
    "streaming_spacesaving_topk",  # mergeable SpaceSaving sketch
    # r8 additions (stdout line always slowest-20, full detail in
    # BENCH_DETAIL.json; the live count is asserted in
    # tests/test_bench_output.py, not tallied in comments)
    "dedup_incremental_bloom",  # bloom-routed incremental dedup
    "dedup_embedding_lsh_pinned",  # md5-pinned sign-plane LSH face
    "bpe_learned_merges",       # full BPE training loop (8 rounds)
    "corpus_apply_snapshot",    # keyed MERGE of the snapshot change set
    "corpus_length_batches",    # global-rank padded batching
    "corpus_dedup_impact",      # cluster-size histogram + token cost
    "doc_html_extract",         # HTML -> text extraction
    "events_transition_matrix",  # per-user Markov next-event matrix
    "doc_chat_render",          # ChatML SFT spans
    "media_frame_plan",         # stride frame-sampling schedule
    "events_item_cooccurrence",  # capped-basket item Jaccard
    "corpus_epoch_schedule",    # data-constrained repeat factors
    "corpus_split_drift",       # split-representativeness KS
    "corpus_dup_rate_daily",    # crawler-health dup-rate trend
    "events_rfm_segments",      # exact-ntile RFM grid
    "corpus_gram_novelty",      # per-doc first-owner gram novelty
    "corpus_ngram_table",       # pruned 1-3-gram LM count table
    "doc_rake_keyphrases",      # RAKE keyphrases, integer millis
    # late-r8 additions
    "customers_k_anonymity",    # quasi-identifier class-size audit
    "doc_blocklist_gate",       # lexicon safety gate
    "doc_csv_ingest",           # PERMISSIVE CSV-line source face
    "events_user_burstiness",   # self-normalized bot screen
    "corpus_quality_calibration",  # prob deciles x lexicon flag rate
    "orders_market_basket",     # basket pair mining with lift
    "events_session_paths",     # session opening-path mining
    "corpus_language_confusion",  # detector-vs-label confusion matrix
    "corpus_shard_manifest",    # order-insensitive shard checksums
    # r9 additions (streaming_backfill_catchup is deliberately NOT
    # benched: its runtime is availableNow trigger scheduling, not
    # data-path work — the streaming faces have never been in HEADLINE)
    "doc_span_dedup_keepone",   # ExactSubstr keep-one span dedup
    "doc_char_span_flags",      # char 20-gram winnowed repeat flags
    "doc_rerank_features",      # (query, doc) features on the shortlist
    "events_kmv_distinct",      # KMV distinct sketch, two key types
    "corpus_scd2_history",      # SCD2 validity intervals
    "dedup_simhash_pinned",     # md5-pinned 60-bit SimHash pairs
    "doc_pretoken_stats",       # BPE-ish regex pre-tokenizer stats
    "knn_ivf_pinned",           # fixed-centroid IVF probe search
    # dedup_eval_minhash is deliberately NOT benched: its ground-truth
    # side is the EXACT all-pairs Jaccard (definitionally the
    # non-scale-path form, run once per rollout as a gate, 7.5 s at
    # sf0.1) — benching it as a recurring data-path op would
    # misrepresent the perf surface; both constituent faces are
    # benched on their own
    "events_trending_items",    # time-decayed trending top-20
    "events_value_percentiles",  # exact interpolated p50/p90/p99
    "events_item_triangles",    # degree-ordered triangle counting
    "frequent_users_cms_pinned",  # md5-pinned CMS estimates
    # r10 additions
    "events_percentile_drift",  # GK-sketch-vs-exact rank drift audit
    "media_block_dedup",        # aligned-block binary payload dedup
    "parts_skyline",            # 2-D Pareto frontier (prefix-max spine)
    "orders_itemset_triples",   # A-priori triples, relative support
    "doc_hybrid_rrf",           # BM25 + QL fused by reciprocal rank
    "corpus_drift_psi",         # PSI drift on baseline-decile edges
    "events_attribution",       # U-shaped multi-touch credit (ppm)
    "events_kmv_setops",        # KMV union/intersection/Jaccard + gate
    "corpus_incremental_stats",  # IVM: delta-maintained group stats
    "parts_hierarchy_rollup",   # bounded-depth closure vs recursive CTE
    "events_zorder_pruning",    # data-skipping audit, 2 layouts x 4 probes
    # r11 additions
    "doc_linkage_blocked",      # blocked fuzzy record linkage
    "doc_linkage_snm",          # sorted-neighborhood linkage (rank spine)
    "events_calendar_gaps",     # missing-day feed-outage islands
    "orders_benford_audit",     # Benford first-digit deviation report
    "media_header_parse",       # binary magic/dims sniff + quarantine
    "dedup_eval_bcubed",        # B-cubed cluster gate (size aggs only)
    "doc_homoglyph_scan",       # confusable-evasion skeleton election
    "corpus_profile_report",    # one-pass column profile
    "lineitem_contracts",       # contract validation + FK anti-join
    "knn_reciprocal_best",      # mutual nearest neighbors
    "corpus_shard_movement",    # rendezvous shard-growth audit
    "events_type_trend",        # grouped closed-form OLS vs regr_*
    "corpus_weighted_median_length",  # weighted median, collapsed window
    "doc_prefix_completions",   # autocomplete prefix grouped top-k
    "embedding_centroid_drift",  # per-label centroid drift monitor
    # r12 additions
    "knn_reciprocal_ivf",       # mutual NN routed through pinned IVF
    "events_interval_join",     # bucketed range join (promo windows)
    "doc_readability",          # Flesch scores, zero-shuffle map
    "doc_domain_cap",           # per-domain diversity cap (top-k spine)
    "corpus_labeler_agreement",  # Cohen's kappa detector-vs-label
    "corpus_compaction_plan",   # small-files planner on the cumsum spine
    "doc_phrase_search",        # positional-index exact phrase lookup
    "events_ab_uplift",         # Welch z on hash-assigned arms
    "events_rolling_distinct_kmv",  # 7-day actives via KMV merge
    "doc_context_fit",          # head+tail truncation, zero-shuffle map
    "dedup_setsim_prefix",      # exact Jaccard join, prefix-filtered
    "events_bootstrap_ci",      # Poisson-bootstrap grouped 95% CI
    "doc_mojibake_scan",        # cp1252 double-encoding scan + repair
    "suppliers_sole_delay",     # Q21 shape, decorrelated to windows
    "corpus_preference_pairs",  # DPO pair mining, margin-gated
    "customers_typo_pairs",     # FastSS deletion-neighborhood join
    "events_ewma_forecast",     # EWMA forecast + MAPE backtest
    "users_survival_km",        # Kaplan-Meier right-censored curve
    # r13 additions
    "events_cusum_changepoint",  # CUSUM level-shift localization
    "events_theilsen_trend",    # median-of-pairwise-slopes trend
    "events_mannwhitney",       # rank-sum test on the cumsum spine
    "customers_revenue_gini",   # Lorenz/Gini per segment (rank spine)
    "customers_order_distribution",  # TPC-H Q13 zero-bucket histogram
    "parts_small_qty_revenue",  # TPC-H Q17 decorrelated to a window
    "customers_large_volume",   # TPC-H Q18 HAVING + broadcast top-20
    "knn_hubness",              # k-NN in-degree skew (run-once gate)
    "knn_prefix_dim_eval",      # Matryoshka prefix-dim recall gate
    "embedding_triplet_mining",  # hardest-pos / semi-hard-neg mining
    "embedding_rp_distortion",  # JL +-1 projection distortion audit
    "events_graph_assortativity",  # Newman r of the co-occurrence graph
    "corpus_jsd_matrix",        # pairwise source JSD (vocab grid)
    "events_peak_concurrency",  # sweep-line concurrency (cumsum spine)
    "schema_fk_orphans",        # star FK orphan audit, 7 edges
    "events_hll_pinned",        # bit-pinned HLL vs exact, two m's
    "events_rec_hitrate",       # recommender temporal-holdout eval
    "doc_retrieval_mrr",        # passage-origin BM25 eval (exact ppm)
    "corpus_quantile_normalize",  # pooled-quantile batch-effect fix
    "orders_ivm_join_view",     # join-view IVM via delta algebra
    "events_hilbert_pruning",   # Hilbert vs zorder, measured
    "events_chisq_independence",  # X^2 + Cramer's V on the cell grid
    # late-r13 additions: the TPC-H completion quintet
    "parts_min_cost_supplier",  # TPC-H Q2 correlated-min, decorrelated
    "parts_value_share",        # TPC-H Q11 global-scalar HAVING
    "supplier_top_revenue",     # TPC-H Q15 view + max, exact cents
    "suppliers_dominant_share",  # TPC-H Q20 nested-IN share threshold
    "customers_dormant_rich",   # TPC-H Q22 scalar avg + anti-join
    "events_spearman_drift",    # Spearman rho on doubled mid-ranks
    "events_acf_daily",         # lag-1/7 ACF, exact moment sums
    "users_bh_fdr",             # BH step-up FDR decision vector
    "events_did_uplift",        # DiD with planted treated-post effect
    "embedding_silhouette",     # label-separation gate, narrow map
    "embedding_top_eigen",      # integer-exact power iteration
    "events_link_prediction",   # Adamic-Adar top-k, integer micros
    "corpus_quota_allocation",  # Hamilton largest-remainder quotas
    "events_orc_roundtrip",     # partitioned ORC write->read fidelity
    "events_hits_authority",    # HITS integer double-rounds, top-20
    "events_isotonic_purchase",  # PAV minimax calibration fit
    "events_label_propagation",  # clamped-seed majority LPA, 3 rounds
    "events_anova_value",       # one-way ANOVA, F + eta-squared
    "events_ccf_view_purchase",  # lead-lag CCF, exact moment sums
    "events_twap_value",        # step-function time-weighted average
    # r14 addition
    "media_wav_decode",         # REAL WAV decode (stdlib codec, Arrow)
    # dedup_eval_lsh_recall is deliberately NOT benched: it runs BOTH
    # the exact setsim join and the banded pipeline on a dual-salted
    # corpus (~9 s at sf0.1) — a run-once rollout gate whose two
    # components are separately benched (dedup_setsim_prefix,
    # dedup_minhash_banded)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load_start = os.getloadavg()[0]  # before the JVM spins up
    spark = get_session("bench")
    _ensure_loaded()

    # Warm-up pass at the smallest sf: spins up Python workers, JIT +
    # whole-stage codegen, parquet reader paths. The reference times
    # its operators the same way — after the input RDD is cached and
    # counted (G019HW1.java:68-73), i.e. excluding startup costs.
    for name in HEADLINE:
        _REGISTRY[name].spark_fn(spark, "/root/testdata/sf0.001").count()

    # r5 postmortem: events_by_window/order_events_3d "regressed"
    # 30-44% in r5 with unchanged plans; standalone reruns beat their
    # r4 numbers (0.44/0.47 s vs 0.50/0.64). Root cause: the first
    # timed rep at the TARGET sf pays parquet-footer + page-cache
    # warming whose cost depends on which queries happened to run
    # before — sweep-order noise, not a plan change. Cure: one
    # untimed per-query warm run at the target sf, so min-of-3 times
    # warm executions only.

    # Min of 3 runs per query: single-shot timings proved to be
    # run-order noise (r2's dedup_minhash_lsh benched 18.2 s vs 5.9 s
    # standalone), and the r4 median was still skewed by external
    # machine load (revenue_by_nation 5.96 s driver-side vs 0.55 s
    # clean). The minimum is the standard estimator of intrinsic cost
    # (timeit's documented rationale): external load only ever adds
    # time, so the fastest run is the most accurate one.
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in HEADLINE:
        # r11 postmortem: with 126 queries in one JVM, late-position
        # faces drifted up to 12x (corpus_profile_report 0.28 -> 3.3 s)
        # with unchanged plans — localCheckpoint blocks from every
        # prior query accumulate in the block manager until Python
        # garbage-collects the DataFrame references and the
        # ContextCleaner reclaims them. An explicit collect() per
        # query releases the dead checkpoint RDDs before timing.
        gc.collect()
        fn = _REGISTRY[name].spark_fn
        fn(spark, sf_dir).count()  # untimed target-sf warm (see above)
        runs: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            runs.append(time.perf_counter() - t0)
            assert n >= 0
        timings[name] = round(min(runs), 3)
        medians[name] = round(sorted(runs)[1], 3)
    # Full per-query detail (min AND median of 3) goes to a side file;
    # the stdout line stays compact. r6 postmortem: the driver captures
    # only the LAST 2000 chars of output, and the r6 line (39 queries
    # × min+median dicts) outgrew that buffer — BENCH_r06.json stored
    # a mid-dict tail and parsed=null, losing the round's official
    # record. The printed line must stay under the buffer, so medians
    # live in BENCH_DETAIL.json and the line carries min-of-3 only.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    # Provenance: the r12 verdict found the driver's under-load run
    # differs from the builder's idle run by up to 2x on individual
    # faces — so the detail file must SAY which condition produced it.
    # The 1-minute loadavg before warm-up and after the last timed rep
    # is recorded verbatim (objective, no self-assessment); a loadavg
    # well above the bench's own footprint at START means the numbers
    # were taken under external load and cross-round comparisons
    # should prefer a committed idle record.
    detail = {"estimator": "min3_warmed", "sf": float(sf),
              "load": {"loadavg_1m_start": round(load_start, 2),
                       "loadavg_1m_end": round(os.getloadavg()[0], 2),
                       "note": ("1-min loadavg at bench start/end; "
                                "start >> 0 means external load — "
                                "compare rounds on committed idle "
                                "records only")},
              "queries_min": timings, "queries_median": medians}
    try:  # keep the opt-in sf1 probe record (tests/test_sf1_probe.py)
        with open(detail_path) as f:
            prev = json.load(f)
        if "sf1_probe" in prev:
            detail["sf1_probe"] = prev["sf1_probe"]
    except (OSError, ValueError):
        pass
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(format_output_line(timings, float(sf), load_start=load_start))


def format_output_line(timings: dict[str, float], sf: float,
                       limit: int = 1900,
                       load_start: float | None = None) -> str:
    """One compact JSON line, guaranteed under the driver's 2000-char
    tail-capture buffer. The estimator is named in the output so
    cross-round comparisons can't silently conflate a methodology
    change (r4 median→r5 min) with a real speedup.

    ``load_start`` (r15, additions-only per the r14 verdict): the
    1-minute loadavg sampled before the JVM spun up rides the one-line
    JSON so downstream PERF diffs are self-describing about host
    contention — both r13 and r14 driver benches started loaded
    (2.25 / 4.15) and the detail file's record was overwritten by the
    later c8 pass, leaving the comparison un-qualifiable."""
    total = round(sum(timings.values()), 3)
    extra = ({"load_start": round(load_start, 2)}
             if load_start is not None else {})
    line = json.dumps({
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "estimator": "min3_warmed",  # min of 3 after an untimed
                                     # per-query warm run at target sf
        "queries": timings,
        "sf": sf,
        **extra,
    }, separators=(",", ":"))
    if len(line) > limit:  # hard guard: never outgrow the tail buffer
        slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:20])
        line = json.dumps({
            "metric": "headline_queries_total_runtime",
            "value": total, "unit": "sec", "estimator": "min3_warmed",
            "n_queries": len(timings), "queries": slowest,
            "queries_full": "BENCH_DETAIL.json", "sf": sf,
            **extra,
        }, separators=(",", ":"))
    return line


if __name__ == "__main__":
    main()
