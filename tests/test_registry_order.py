"""Registration-order invariants.

The round driver checks only the FIRST ~50 registered queries against
their DuckDB oracles (r03 cut off at 50/74 and the whole LLM surface
went unverified). These tests pin the contract that keeps that from
regressing: the checked window is exactly the oracle-bearing surface,
and everything after it is either no-oracle-by-design or a redundant
face whose semantics a window query already covers.
"""

from __future__ import annotations

from big_data_hw_23_24_spark.queries import (
    _CHECKED_WINDOW,
    _ensure_loaded,
    _REGISTRY,
)

_ensure_loaded()


def test_window_is_at_most_50_and_all_exist():
    assert len(_CHECKED_WINDOW) <= 50
    assert len(set(_CHECKED_WINDOW)) == len(_CHECKED_WINDOW)
    missing = [n for n in _CHECKED_WINDOW if n not in _REGISTRY]
    assert not missing, missing


def test_registry_starts_with_the_checked_window():
    names = list(_REGISTRY)
    assert tuple(names[:len(_CHECKED_WINDOW)]) == _CHECKED_WINDOW


def test_every_window_query_has_an_oracle():
    no_oracle = [n for n in _CHECKED_WINDOW if _REGISTRY[n].oracle is None]
    assert not no_oracle, no_oracle


def test_every_oracle_bearing_query_outside_window_is_documented():
    """An oracle-bearing query BELOW the window gets no driver row — a
    silent evidence gap unless it is a declared redundant face. Keep
    this list in sync deliberately, never by accident."""
    declared_redundant = {
        # semantics driver-checked by the named window query
        "running_order_total",       # ⊂ customer_rolling_30d
        "sales_rollup",              # ⊂ sales_grouping_sets
        "sales_cube",                # ⊂ sales_grouping_sets
        "distinct_users_salted",     # same oracle as distinct_users_by_type
        "parts_above_avg_size",      # ⊂ parts_above_avg_revenue_bloom
        "parts_size50_revenue_bloom",  # ⊂ parts_above_avg_revenue_bloom
        "order_events_3d",           # same join as streaming_order_events_3d
        "user_sessions",             # ⊂ sessions_builtin_window (same oracle
                                     #   semantics, gaps-and-islands face)
        "exact_outliers_topk",       # top-k face of exact_outliers (O2 green
                                     #   via smallest_cells_topk)
        "top_customers_per_nation",  # window-rank face; windows green via
                                     #   customer_rolling_30d
        "top_brands_by_revenue",     # join+agg+top-k ⊂ other green faces
        "revenue_by_nation",         # star join; broadcast plan-asserted in
                                     #   test_plans.py
        "orders_by_month",           # date bucketing ⊂ events_by_window
        "props_k_stats",             # JSON face; MapType green via
                                     #   user_event_type_map
        "approx_distinct_users_hll", # sketch face; exact green via
                                     #   distinct_users_by_type
        "part_type_breakdown",       # plain group-agg ⊂ many green faces
        "customers_with_open_orders",  # semi face ⊂ customer_order_membership
        "customers_without_orders",  # anti face ⊂ customer_order_membership
                                     #   (and was a vacuous 0-row green)
        # rotated out in r5 AFTER earning green rows in r03+r04, to
        # free window slots for never-checked queries; operators stay
        # green via in-window siblings
        "avg_word_length",           # A5 avg/sum ⊂ pricing_summary;
                                     #   tokenize ⊂ wordcount
        "suppliers_sorted",          # O1 ordered output ⊂ smallest_cells_topk
        "distinct_users_by_type",    # A6 ⊂ streaming_distinct_count
        "embedding_stats",           # global max/avg ⊂ pricing_summary +
                                     #   conditional_agg_priority
        "doc_fingerprints",          # md5-of-normalized-text ⊂
                                     #   dedup_exact_groups + dedup_incremental
        "doc_token_stats",           # per-doc n_tokens ⊂ doc_repetition_scores;
                                     #   ratio signals ⊂ doc_quality_scores
        "jaccard_pairs_exact",       # identical shingle CTE + pairs computation
                                     #   embedded in dedup_components' oracle
        "knn_cosine_bruteforce",     # cosine_topk ⊂ knn_cosine_filtered
                                     #   (same operator + metadata pre-filter)
        # rotated out in r6 AFTER earning green rows (counts below), to
        # admit the five queries queued since r5; operators stay green
        # via in-window siblings
        "doc_quality_scores",        # 4 green rows r01-r05; signal family
                                     #   ⊂ doc_repetition_scores (in window)
        "doc_language_id",           # 4 green rows r01-r05; narrow-map
                                     #   signal ⊂ doc_repetition_scores
        "doc_pii_redact",            # green r04+r05; same regexp machinery
                                     #   as doc_pii_scan (in window)
        "dedup_survivor_groups",     # green r04+r05; components + rank
                                     #   ⊂ dedup_components (in window) +
                                     #   ranking green via customer_balance_deciles
        "cell_grid_histogram",       # green r01-r05; grid-cell CTE embedded
                                     #   in mr_approx_outliers' oracle (in window)
        "embedding_quantize_int8",   # green r04+r05; quantize step composed
                                     #   and re-checked inside
                                     #   knn_cosine_quantized (in window)
        "doc_train_val_split",       # green r04+r05; content-hash bucket
                                     #   machinery ⊂ corpus_source_mix
                                     #   (in window, same splits.py core)
        "sessions_builtin_window",   # green r03-r05; identical session
                                     #   semantics + oracle shape as
                                     #   streaming_sessions (in window)
        # rotated out mid-r6 AFTER earning green rows, to admit the
        # four late-r6 queries (PQ rerank, boilerplate share,
        # dropDuplicates face, multimodal features)
        "frequent_users_exact",      # green r01-r05; A9 exact
                                     #   frequent-items semantics also
                                     #   driver-checked by
                                     #   streaming_frequent_exact
                                     #   (in window, same
                                     #   group-count-threshold oracle)
        "conditional_agg_priority",  # green r02-r05; A8 count-if
                                     #   accumulators ⊂
                                     #   mr_approx_outliers (in window,
                                     #   sure/uncertain conditional
                                     #   sums)
        "events_by_window",          # green r02-r05; tumbling F.window
                                     #   is the slide==width special
                                     #   case of events_by_hopping_window
                                     #   (in window)
        "price_quantiles_approx",    # green r04+r05; percentile
                                     #   semantics driver-checked by
                                     #   acctbal_median_by_nation
                                     #   (in window, UDAF face)
        # rotated out in r7 AFTER earning green rows, to admit the
        # entire 25-query r6 queued tier in one rotation. Green-row
        # counts from CORRECTNESS_r01..r06; operator families stay
        # represented by the named in-window siblings (or carry
        # maximal 5-6-row evidence where the face IS the operator).
        "dedup_exact_groups",        # 5 greens r01-r06; md5-fingerprint
                                     #   groups ⊂ dedup_incremental
                                     #   (in window, same fingerprint CTE)
        "dedup_components",          # 3 greens r04-r06; components +
                                     #   survivor election re-checked by
                                     #   dedup_survivors_best (in window)
        "knn_cosine_quantized",      # 3 greens r04-r06; int8 quantize +
                                     #   exact-rerank ⊂ knn_pq_rerank
                                     #   (in window, coarser quantizer)
        "doc_tfidf_top_terms",       # 3 greens r04-r06; tf/df scoring +
                                     #   grouped top-k ⊂ doc_bm25_multi
                                     #   (in window, same machinery)
        "doc_chunks",                # 3 greens r04-r06; token-position
                                     #   segmentation ⊂ doc_pack_sequences
                                     #   (in window)
        "doc_sentences_udtf",        # 3 greens r04-r06; UDTF explode
                                     #   face; split+explode semantics
                                     #   ⊂ doc_c4_line_filter (in window)
        "doc_pii_scan",              # 3 greens r04-r06; regexp-extract
                                     #   machinery also exercised by
                                     #   doc_c4_line_filter (in window)
        "doc_contamination_scan",    # 3 greens r04-r06; 8-gram overlap
                                     #   mining ⊂ corpus_boilerplate_ngrams
                                     #   + doc_span_dedup (in window)
        "media_decode_meta",         # 5 greens r01-r06; Arrow mapInPandas
                                     #   plumbing ⊂ media_feature_vectors
                                     #   (in window)
        "dedup_embedding_cosine",    # 3 greens r04-r06; cosine threshold
                                     #   pairing ⊂ dedup_semantic_clusters
                                     #   + knn_cosine_filtered (in window)
        "mr_approx_outliers",        # 6 greens r01-r06 (C2, max evidence)
        "smallest_cells_topk",       # 6 greens r01-r06 (O2 top-k)
        "exact_outliers",            # 6 greens r01-r06 (C1)
        "streaming_distinct_count",  # 5 greens r02-r06; distinct face
                                     #   ⊂ streaming_dropdup_items +
                                     #   streaming_frequent_exact (in window)
        "streaming_sessions",        # 4 greens r03-r06; session windows
                                     #   (applyInPandasWithState face)
        "streaming_order_events_3d", # 3 greens r04-r06; stream-static
                                     #   interval join ⊂ events_asof_orders
                                     #   family (in window)
        "pricing_summary",           # 6 greens r01-r06 (A1/A5, max evidence)
        "wordcount",                 # 6 greens r01-r06 (P6/C6, max evidence)
        "customer_rolling_30d",      # 4 greens r03-r06; RANGE-frame window
                                     #   ordering ⊂ customer_balance_deciles
                                     #   (in window, window-rank face)
        "segment_set_ops",           # 6 greens r01-r06 (set ops, max
                                     #   evidence)
        "user_event_type_map",       # 4 greens r03-r06; MapType/JSON face
        "parts_above_avg_revenue_bloom",  # 3 greens r04-r06; bloom-filter
                                     #   semi-join + scalar subquery face
        "sales_grouping_sets",       # 4 greens r03-r06; rollup/cube/
                                     #   grouping-sets face
        "returns_pivot_by_status",   # 4 greens r03-r06; pivot face
        "buyers_full_outer_active",  # 4 greens r03-r06; full-outer face
        # retired mid-r7 (4 greens each) to admit the two MinHash
        # oracle conversions (dedup_incremental_minhash,
        # dedup_minhash_banded) the same round they gained oracles
        "events_asof_orders",        # 4 greens r03-r06; as-of
                                     #   union+window rewrite face
        "acctbal_median_by_nation",  # 4 greens r03-r06; UDAF
                                     #   (applyInPandas) median face
        # rotated out in r8 AFTER earning green rows, to admit the
        # entire 26-query r7 queued tier (E77-E103 + mid-r7 additions)
        # in one rotation. Green-row counts from CORRECTNESS_r01..r07;
        # operator families stay represented by the named in-window
        # siblings.
        "knn_cosine_filtered",       # 3 greens r05-r07; cosine top-k +
                                     #   metadata pre-filter ⊂
                                     #   knn_mmr_rerank (in window, same
                                     #   cosine machinery over a pool)
        "dedup_incremental",         # 3 greens r05-r07; fingerprint
                                     #   anti-join ⊂ corpus_snapshot_diff
                                     #   (same fingerprint CTE) +
                                     #   dedup_incremental_minhash
                                     #   (in window)
        "bpe_pair_counts",           # 3 greens r05-r07; vocabulary pair
                                     #   aggregation ⊂ corpus_bpe_fertility
                                     #   (in window, same BPE machinery)
        "vocab_coverage",            # 3 greens r05-r07; vocabulary
                                     #   aggregation family green via
                                     #   corpus_vocab_growth (in window)
        "doc_repetition_scores",     # 3 greens r05-r07; repetition/ratio
                                     #   signal battery ⊂ doc_gopher_rules
                                     #   (in window, superset battery)
        "doc_pack_sequences",        # 3 greens r05-r07; greedy packing
                                     #   fold ⊂ doc_sentence_chunks
                                     #   (in window, same JVM fold)
        "corpus_source_mix",         # 3 greens r05-r07; source-share
                                     #   machinery ⊂ corpus_temperature_mix
                                     #   (in window, same splits.py core)
        "streaming_ingest_dedup",    # 3 greens r05-r07; epoch-keyed
                                     #   ingest harness ⊂
                                     #   streaming_ingest_minhash
                                     #   (in window, same harness + store)
        "customer_order_membership", # 4 greens r04-r07; K4/J4 semi/anti
                                     #   probes also exercised inside
                                     #   streaming_ingest_minhash's
                                     #   known-signature anti-join and
                                     #   corpus_leakage_safe_split
        "frequent_users_cms",        # 4 greens r04-r07; CMS sketch face;
                                     #   exact frequent-items semantics
                                     #   carried 2 greens by
                                     #   streaming_frequent_exact
        "events_customer_salted_join",  # 4 greens r04-r07; skew-salting
                                     #   face; skew family in window via
                                     #   events_skew_report
        "doc_unigram_logprob",       # 2 greens r06+r07; LM scoring
                                     #   composed + re-checked inside
                                     #   doc_lm_quality_buckets (in window)
        "doc_bigram_logprob",        # 2 greens r06+r07; same — the bucket
                                     #   face consumes both LM scores
        "embedding_nearest_centroid",  # 2 greens r06+r07; J3 broadcast
                                     #   min-distance join; broadcast
                                     #   scoring ⊂ knn_mmr_rerank pool
        "events_by_hopping_window",  # 2 greens r06+r07; time-bucketed agg
                                     #   family ⊂ events_daily_anomaly
                                     #   (in window, day buckets + window)
        "customer_balance_deciles",  # 2 greens r06+r07; rank spine
                                     #   machinery ⊂ doc_lm_quality_buckets
                                     #   (in window, range-partitioned
                                     #   global rank) + corpus_robust_stats
        "doc_bpe_tokens",            # 2 greens r06+r07; BPE encode fold
                                     #   ⊂ corpus_bpe_fertility (in window)
        "embedding_lloyd_round",     # 2 greens r06+r07; sufficient-stats
                                     #   mapInPandas kernel family ⊂
                                     #   embedding_gram_matrix (in window)
        "streaming_frequent_exact",  # 2 greens r06+r07; A7/A9/K3 exact
                                     #   face; streaming harness in window
                                     #   via streaming_ingest_minhash +
                                     #   streaming_quality_gate
        "knn_pq_rerank",             # 2 greens r06+r07; PQ + exact rerank
                                     #   ⊂ knn_pq_adc (in window, same
                                     #   codes/LUT machinery)
        "doc_boilerplate_share",     # 2 greens r06+r07; ⊂
                                     #   corpus_boilerplate_ngrams
                                     #   (in window, same mining CTE)
        "streaming_dropdup_items",   # 2 greens r06+r07; dropDuplicates
                                     #   face; streaming dedup in window
                                     #   via streaming_ingest_minhash
        "media_feature_vectors",     # 2 greens r06+r07; multimodal Arrow
                                     #   mapInPandas plumbing; Arrow UDF
                                     #   path in window via doc_unicode_nfc
        "embedding_pq_codes",        # 1 green r07; PQ encode sub-step
                                     #   composed + re-checked inside
                                     #   knn_pq_adc (in window)
        "doc_bm25_topk",             # 1 green r07; single-query BM25 ⊂
                                     #   doc_bm25_multi (in window, same
                                     #   postings + two-stage top-k)
        "corpus_dedup_paragraphs",   # 1 green r07; paragraph-keyed
                                     #   min-struct election ⊂
                                     #   doc_dedup_lines (in window, same
                                     #   line-keyed election)
        # rotated out in r9 AFTER earning 2 green rows each (r07+r08),
        # to admit the entire 27-query r8 queued tier (E104-E130) in
        # one rotation. "(in window)" annotations above refer to the
        # window as of the round the entry was retired; the operator
        # families below stay represented by the named r9-window
        # siblings.
        "knn_pq_adc",                # 2 greens r07+r08; PQ codes + ADC
                                     #   LUT scan; quantized-scan family
                                     #   in window via
                                     #   dedup_embedding_lsh_pinned
                                     #   (int8 codes) + knn_mmr_rerank
        "corpus_boilerplate_ngrams", # 2 greens r07+r08; line-ngram
                                     #   mining CTE ⊂ corpus_ngram_table
                                     #   (in window, same pruned-count
                                     #   shape) + corpus_gram_novelty
        "doc_c4_line_filter",        # 2 greens r07+r08; line-rule
                                     #   battery ⊂ doc_html_extract's
                                     #   line pipeline + doc_gopher_rules
                                     #   (in window)
        "doc_dedup_lines",           # 2 greens r07+r08; line-keyed
                                     #   first-owner election ⊂
                                     #   corpus_gram_novelty (in window,
                                     #   same min-struct election on
                                     #   positioned grams)
        "corpus_stratified_sample",  # 2 greens r07+r08; per-stratum
                                     #   hash-threshold sampling ⊂
                                     #   corpus_epoch_schedule +
                                     #   corpus_quality_calibration
                                     #   (in window, same md5 buckets)
        "corpus_quality_budget",     # 2 greens r07+r08; budgeted
                                     #   selection on the rank spine ⊂
                                     #   corpus_length_batches (in
                                     #   window, same global-rank spine)
        "dedup_semantic_clusters",   # 2 greens r07+r08; per-cluster
                                     #   equi-join dedup ⊂
                                     #   corpus_dedup_impact (in window,
                                     #   same cluster machinery) +
                                     #   dedup_embedding_lsh_pinned
        "doc_winnow_fingerprints",   # 2 greens r07+r08; winnowing
                                     #   window-min fingerprints ⊂
                                     #   corpus_gram_novelty +
                                     #   corpus_shard_manifest (in
                                     #   window, same rolling-hash core)
        "doc_overlap_pairs",         # 2 greens r07+r08; inverted-index
                                     #   pair join ⊂ events_item_cooccurrence
                                     #   (in window, same capped pair
                                     #   join) + dedup_containment_pairs
        "corpus_token_shards",       # 2 greens r07+r08; contiguous
                                     #   shard assignment on the rank
                                     #   spine ⊂ corpus_shard_manifest +
                                     #   corpus_length_batches (in window)
        "doc_token_entropy",         # 2 greens r07+r08; token-dist
                                     #   entropy ⊂ corpus_ngram_table's
                                     #   count table + corpus_zipf_fit
                                     #   (in window)
        "corpus_stats_card",         # 2 greens r07+r08; corpus summary
                                     #   battery ⊂ corpus_robust_stats +
                                     #   corpus_dup_rate_daily (in window)
        "doc_bm25_multi",            # 2 greens r07+r08; batch BM25
                                     #   postings + grouped top-k; scoring
                                     #   join family in window via
                                     #   doc_rake_keyphrases (grouped
                                     #   top-k) + corpus_ngram_table
        "doc_dsir_weights",          # 2 greens r07+r08; importance
                                     #   weights via hashed-ngram LM
                                     #   ratio ⊂ corpus_quality_calibration
                                     #   (in window, same bucketing)
        "doc_quality_classifier",    # 2 greens r07+r08; linear scorer +
                                     #   sigmoid ⊂ corpus_quality_calibration
                                     #   (in window, consumes the same
                                     #   classifier probabilities)
        "corpus_temperature_mix",    # 2 greens r07+r08; temperature
                                     #   resampling ⊂ corpus_epoch_schedule
                                     #   (in window, same repeat-factor
                                     #   arithmetic on source shares)
        "streaming_quality_gate",    # 2 greens r07+r08; foreachBatch
                                     #   gate harness; streaming family
                                     #   in window via streaming_ingest_minhash
                                     #   (retired) → now represented by
                                     #   the rows-only streaming faces +
                                     #   in-suite live tests
        "doc_span_dedup",            # 2 greens r07+r08; positioned-gram
                                     #   span removal ⊂ corpus_gram_novelty
                                     #   (in window, same positioned-gram
                                     #   table); keep-one face queued r10
        "dedup_survivors_best",      # 2 greens r07+r08; best-survivor
                                     #   election ⊂ corpus_dedup_impact
                                     #   (in window, same components +
                                     #   min-struct election)
        "user_funnel_3stage",        # 2 greens r07+r08; ordered-event
                                     #   sequence matching ⊂
                                     #   events_session_paths +
                                     #   events_transition_matrix
                                     #   (in window, same sequence CTEs)
        "user_retention_cohorts",    # 2 greens r07+r08; cohort day-grid
                                     #   join ⊂ corpus_dup_rate_daily +
                                     #   events_rfm_segments (in window,
                                     #   same day-bucket machinery)
        "corpus_bpe_fertility",      # 2 greens r07+r08; BPE encode fold
                                     #   ⊂ bpe_learned_merges (in window,
                                     #   same trainer + encode machinery)
        "dedup_incremental_minhash", # 2 greens r07+r08; batch-vs-store
                                     #   banded equi-join ⊂
                                     #   dedup_incremental_bloom (in
                                     #   window, same store + statuses)
                                     #   + dedup_minhash_banded (retired
                                     #   with 4 greens r05-r08)
        "dedup_minhash_banded",      # 4 greens r05-r08; banded MinHash
                                     #   LSH self-join; banding machinery
                                     #   in window via
                                     #   dedup_embedding_lsh_pinned +
                                     #   dedup_incremental_bloom
        # retired in r9 with 1 green (r08) because the r9 window admits
        # a sibling that re-checks the same machinery end-to-end
        "doc_jsonl_ingest",          # 1 green r08; PERMISSIVE line-parse
                                     #   ingest ⊂ doc_csv_ingest (in
                                     #   window, same jsonl.py payload
                                     #   builder + ok-probe shape)
        "corpus_length_ks_matrix",   # 1 green r08; ks_distance_matrix ⊂
                                     #   corpus_split_drift (in window,
                                     #   same operators/grouped.py core)
        "corpus_snapshot_diff",      # 1 green r08; change_set CTE
                                     #   composed + re-checked inside
                                     #   corpus_apply_snapshot (in
                                     #   window, merge of the same diff)
        # retired in r10 AFTER earning 2 greens (r08+r09), to admit the
        # 14-query r9 queue; each names the in-window sibling that
        # keeps its machinery driver-checked
        "doc_decontaminate_spans",   # 2 greens r08+r09; benchmark-gram
                                     #   span matching ⊂
                                     #   doc_span_dedup_keepone (in
                                     #   window, same positioned-gram
                                     #   inverted-index + span strip)
        "dedup_url_normalized",      # 2 greens r08+r09; normalize +
                                     #   exact-fingerprint election ⊂
                                     #   corpus_dup_rate_daily (in
                                     #   window, min(struct) election) +
                                     #   dedup_incremental_bloom (exact
                                     #   fingerprint statuses)
        "doc_lm_quality_buckets",    # 2 greens r08+r09; gram-LM fold ⊂
                                     #   corpus_ngram_table (in window,
                                     #   same count-table machinery);
                                     #   bucket gating ⊂
                                     #   corpus_quality_calibration
        "embedding_gram_matrix",     # 2 greens r08+r09; Arrow-batch
                                     #   embedding aggregates ⊂
                                     #   knn_ivf_pinned (in window, same
                                     #   pandas_udf kernel bridge) +
                                     #   dedup_embedding_lsh_pinned
        "corpus_leakage_safe_split", # 2 greens r08+r09; component-keyed
                                     #   hash split ⊂ corpus_split_drift
                                     #   (in window, same split-bucket
                                     #   machinery + drift audit)
        "streaming_ingest_minhash",  # 2 greens r08+r09; epoch-keyed
                                     #   idempotent sink ⊂
                                     #   streaming_backfill_catchup (in
                                     #   window); banded fingerprints ⊂
                                     #   dedup_simhash_pinned +
                                     #   dedup_embedding_lsh_pinned
        "doc_contrastive_negatives", # 2 greens r08+r09; shortlist pair
                                     #   construction + per-query
                                     #   grouped sampling ⊂
                                     #   doc_rerank_features (in window,
                                     #   same broadcast-shortlist join)
        "corpus_pmi_collocations",   # 2 greens r08+r09; bigram/unigram
                                     #   joint aggregates ⊂
                                     #   corpus_ngram_table (in window,
                                     #   same one-scan gram counts)
        "corpus_zipf_fit",           # 2 greens r08+r09; vocab-scale
                                     #   rank-spine regression ⊂
                                     #   corpus_ngram_table (counts) +
                                     #   corpus_length_batches (in
                                     #   window, same global-rank spine)
        "corpus_source_overlap",     # 2 greens r08+r09; pairwise set
                                     #   overlap / Jaccard matrix ⊂
                                     #   events_item_cooccurrence (in
                                     #   window, same capped pair join)
        "knn_mmr_rerank",            # 2 greens r08+r09; shortlist
                                     #   rerank ⊂ knn_ivf_pinned (in
                                     #   window, ANN route+verify) +
                                     #   doc_rerank_features (pair
                                     #   scoring over broadcast pool)
        "events_daily_anomaly",      # 2 greens r08+r09; day-bucket
                                     #   baseline windows ⊂
                                     #   corpus_dup_rate_daily (in
                                     #   window, same day grid);
                                     #   distribution stats ⊂
                                     #   events_value_percentiles
        "corpus_vocab_growth",       # 2 greens r08+r09; first-occurrence
                                     #   election + cumulative window ⊂
                                     #   corpus_gram_novelty (in window,
                                     #   same first-owner machinery)
        "corpus_robust_stats",       # 2 greens r08+r09; median/MAD ⊂
                                     #   events_value_percentiles (in
                                     #   window, exact interpolated
                                     #   percentile spine)
        # retired in r11 AFTER earning 2 greens (r09+r10), to admit the
        # 12-query r10 queue; each names the in-window sibling that
        # keeps its machinery driver-checked
        "corpus_apply_snapshot",     # 2 greens r09+r10; keyed MERGE of
                                     #   a change set ⊂ corpus_scd2_history
                                     #   (in window, same full-outer
                                     #   snapshot join + upsert/tombstone
                                     #   classification)
        "corpus_length_batches",     # 2 greens r09+r10; global-rank
                                     #   spine batching ⊂
                                     #   events_value_percentiles (in
                                     #   window, same range-partitioned
                                     #   rank spine) + corpus_epoch_schedule
                                     #   (packing-tier budget math)
        "doc_html_extract",          # 2 greens r09+r10; tag-strip /
                                     #   entity-decode narrow map ⊂
                                     #   doc_unicode_nfc (in window, same
                                     #   single-pass normalization shape)
                                     #   + doc_csv_ingest (ingest probe)
        "events_transition_matrix",  # 2 greens r09+r10; per-user
                                     #   lag-window sequence pairs ⊂
                                     #   events_session_paths (in window,
                                     #   same user-ordered lag machinery)
        "doc_chat_render",           # 2 greens r09+r10; content-span
                                     #   assembly + loss masks ⊂
                                     #   doc_char_span_flags (in window,
                                     #   same exact char-span arithmetic)
        "media_frame_plan",          # 2 greens r09+r10; codec-free
                                     #   multimodal schedule ⊂
                                     #   media_block_dedup (in window,
                                     #   binary-payload tier, same typed
                                     #   metadata plumbing)
        "events_item_cooccurrence",  # 2 greens r09+r10; capped-basket
                                     #   pair join ⊂ events_item_triangles
                                     #   (in window, same oriented pair
                                     #   machinery) + orders_itemset_triples
        "corpus_split_drift",        # 2 greens r09+r10; KS split audit ⊂
                                     #   corpus_drift_psi (in window,
                                     #   same binned-distribution drift
                                     #   comparison machinery)
        "corpus_ngram_table",        # 2 greens r09+r10; one-scan gram
                                     #   counts ⊂ corpus_gram_novelty (in
                                     #   window, same shingle explode +
                                     #   count-table aggregation)
        "customers_k_anonymity",     # 2 greens r09+r10; quasi-identifier
                                     #   class-size audit ⊂
                                     #   doc_payment_pii_scan (in window,
                                     #   privacy tier, same flag-and-count
                                     #   shape over grouped classes)
        "doc_blocklist_gate",        # 2 greens r09+r10; lexicon token
                                     #   gate ⊂ doc_gopher_rules (in
                                     #   window, same broadcast-lexicon
                                     #   token-match rule battery)
        "orders_market_basket",      # 2 greens r09+r10; pair support +
                                     #   lift ⊂ orders_itemset_triples
                                     #   (in window, same basket pair
                                     #   mining, A-priori-pruned to L3)
        # retired in r12 AFTER earning ≥2 greens each, to admit the
        # 15-query r11 queue (E157-E171); each names the in-window
        # sibling that keeps its machinery driver-checked
        "events_zorder_key",         # 4 greens r08-r11; bit-interleave
                                     #   key ⊂ events_zorder_pruning
                                     #   (in window, same interleave
                                     #   expression + measured file
                                     #   pruning on the written layout)
        "dedup_containment_pairs",   # 4 greens r08-r11; inverted-index
                                     #   capped pair join + asymmetric
                                     #   overlap ⊂ media_block_dedup
                                     #   (in window, same inverted
                                     #   index + max_df stop-key guard)
        "doc_unicode_nfc",           # 4 greens r08-r11; single-pass
                                     #   normalization narrow map ⊂
                                     #   doc_homoglyph_scan (in window,
                                     #   same translate-based skeleton
                                     #   normalization + election)
        "corpus_dedup_impact",       # 3 greens r09-r11; cluster-size
                                     #   histogram aggregates ⊂
                                     #   dedup_eval_bcubed (in window,
                                     #   same cluster-size aggregation,
                                     #   no pair materialized)
        "corpus_dup_rate_daily",     # 3 greens r09-r11; day-grid dup
                                     #   trend ⊂ events_calendar_gaps
                                     #   (in window, same calendar-day
                                     #   spine) + corpus_drift_psi
                                     #   (windowed distribution drift)
        "corpus_shard_manifest",     # 3 greens r09-r11; shard content
                                     #   checksums ⊂ corpus_shard_movement
                                     #   (in window, same shard
                                     #   assignment machinery, HRW keys)
        "doc_rake_keyphrases",       # 3 greens r09-r11; phrase mining +
                                     #   grouped top-3 ⊂
                                     #   doc_prefix_completions (in
                                     #   window, same grouped top-k
                                     #   rank spine) + corpus_gram_novelty
        "corpus_language_confusion", # 3 greens r09-r11; detector-vs-
                                     #   truth eval matrix (per-cell
                                     #   recall) ⊂ dedup_eval_bcubed
                                     #   (in window, same extrinsic
                                     #   P/R-vs-truth evaluation shape)
        "events_session_paths",      # 3 greens r09-r11; per-user
                                     #   ordered-sequence lag machinery
                                     #   ⊂ events_attribution (in
                                     #   window, same user-ordered
                                     #   window walk)
        "dedup_embedding_lsh_pinned",  # 3 greens r09-r11; md5-pinned
                                     #   banded chunk equi-join ⊂
                                     #   dedup_simhash_pinned (in
                                     #   window, same pinned banding +
                                     #   verify join over int codes)
        "events_value_percentiles",  # 2 greens r10+r11; exact
                                     #   interpolated percentile spine
                                     #   ⊂ events_percentile_drift (in
                                     #   window, same percentile
                                     #   machinery) +
                                     #   corpus_weighted_median_length
                                     #   (in window, cumulative-weight
                                     #   spine)
        "events_kmv_distinct",       # 2 greens r10+r11; KMV sketch
                                     #   build + estimate ⊂
                                     #   events_kmv_setops (in window,
                                     #   same sketch, k in schema
                                     #   metadata, union/intersect)
        "events_trending_items",     # 2 greens r10+r11; grouped
                                     #   trend-over-time scoring ⊂
                                     #   events_type_trend (in window,
                                     #   closed-form grouped OLS slope)
        "dedup_eval_minhash",        # 2 greens r10+r11; run-once
                                     #   rollout gate (exact truth vs
                                     #   approximate side) ⊂
                                     #   knn_eval_ivf + dedup_eval_bcubed
                                     #   (both in window, same
                                     #   gate composition)
        "doc_span_dedup_keepone",    # 2 greens r10+r11; positioned-
                                     #   gram inverted index + span
                                     #   strip ⊂ corpus_gram_novelty
                                     #   (in window, same positioned-
                                     #   gram first-owner election)
        # retired in r13 AFTER earning ≥2 greens each (six 5-green,
        # six 4-green, seven 3-green), to admit the 19-query r12 queue
        # (E172-E189 + knn_eval_reciprocal); each names the sibling —
        # in-window or admitted this same rotation — that keeps its
        # machinery driver-checked. ("in window" in OLDER annotations
        # above reflects the rotation that wrote them; a sibling that
        # has itself since rotated out stays full-value oracle-compared
        # in test_oracle_parity every suite run, so the evidence chain
        # holds.)
        "doc_payment_pii_scan",      # 5 greens r08-r12; shared-lexicon
                                     #   scan battery (Luhn digits) ⊂
                                     #   doc_homoglyph_scan (in window,
                                     #   same broadcast-lexicon
                                     #   scan-and-flag shape); Luhn
                                     #   checksum pinned in
                                     #   tests/test_cleaning.py
        "doc_sentence_chunks",       # 5 greens r08-r12; fold chunker /
                                     #   window-fitting ⊂ doc_context_fit
                                     #   (admitted r13, same
                                     #   truncate-to-budget span
                                     #   arithmetic, zero-shuffle map)
        "events_skew_report",        # 5 greens r08-r12; one-pass
                                     #   grouped skew stats ⊂
                                     #   corpus_profile_report (in
                                     #   window, same single-aggregate
                                     #   profiling battery)
        "doc_gopher_rules",          # 5 greens r08-r12; zero-shuffle
                                     #   per-doc rule battery ⊂
                                     #   doc_readability (admitted r13,
                                     #   same fold-expression signal
                                     #   battery in textstats.py)
        "corpus_priority_sample",    # 5 greens r08-r12; weight-ordered
                                     #   selection spine ⊂
                                     #   corpus_weighted_median_length
                                     #   (in window, same cumulative-
                                     #   weight rank spine)
        "events_item_pagerank",      # 5 greens r08-r12; fixed-round
                                     #   keyed-join graph iteration ⊂
                                     #   events_item_triangles (in
                                     #   window, graph tier, same edge
                                     #   build + keyed join machinery)
        "bpe_learned_merges",        # 4 greens r09-r12; vocab-scale
                                     #   tokenizer aggregates ⊂
                                     #   doc_pretoken_stats (in window,
                                     #   same pretokenize explode +
                                     #   count-table machinery)
        "dedup_incremental_bloom",   # 4 greens r09-r12; incremental-
                                     #   store statuses ⊂
                                     #   corpus_incremental_stats (in
                                     #   window, same new/dup/carry
                                     #   status machinery); membership
                                     #   join ⊂ dedup_setsim_prefix
                                     #   (admitted r13)
        "corpus_epoch_schedule",     # 4 greens r09-r12; repeat-factor
                                     #   schedule on the cumsum spine ⊂
                                     #   corpus_compaction_plan
                                     #   (admitted r13, same range-
                                     #   partitioned running-total
                                     #   spine grouping)
        "doc_csv_ingest",            # 4 greens r09-r12; typed parse +
                                     #   ok-probe ingest face ⊂
                                     #   media_header_parse (in window,
                                     #   same sniff-parse-validate
                                     #   probe shape); S2 core row
                                     #   stays golden-tested in
                                     #   tests/test_sources.py
        "corpus_quality_calibration",  # 4 greens r09-r12; score-decile
                                     #   vs label agreement audit ⊂
                                     #   corpus_labeler_agreement
                                     #   (admitted r13, same
                                     #   detector-vs-label agreement
                                     #   machinery, kappa form)
        "corpus_gram_novelty",       # 4 greens r09-r12; positioned-
                                     #   gram posting index +
                                     #   first-owner election ⊂
                                     #   doc_phrase_search (admitted
                                     #   r13, same positional posting
                                     #   build + position equi-join)
        "events_rfm_segments",       # 3 greens r10-r12; exact-ntile
                                     #   grid on the rank spine ⊂
                                     #   events_percentile_drift (in
                                     #   window, same exact rank-spine
                                     #   percentile machinery)
        "events_user_burstiness",    # 3 greens r10-r12; inter-arrival
                                     #   gap stats (lag + grouped CV) ⊂
                                     #   events_calendar_gaps (in
                                     #   window, same per-key ordered
                                     #   lag-gap machinery)
        "doc_char_span_flags",       # 3 greens r10-r12; exact char-
                                     #   span arithmetic ⊂
                                     #   doc_mojibake_scan (admitted
                                     #   r13, same marker-position
                                     #   span scan from a shared
                                     #   lexicon) + doc_context_fit
        "doc_rerank_features",       # 3 greens r10-r12; retrieval
                                     #   feature join ⊂ doc_hybrid_rrf
                                     #   (in window, same pruned-
                                     #   postings index + per-query
                                     #   score join machinery)
        "corpus_scd2_history",       # 3 greens r10-r12; keyed
                                     #   change-tracking windows ⊂
                                     #   corpus_incremental_stats (in
                                     #   window, same incremental
                                     #   snapshot-diff machinery)
        "knn_ivf_pinned",            # 3 greens r10-r12; pinned-IVF
                                     #   probe routing ⊂
                                     #   knn_reciprocal_ivf (admitted
                                     #   r13, routes BOTH directions
                                     #   through the same pinned-IVF
                                     #   index build + nprobe join)
        "frequent_users_cms_pinned",  # 3 greens r10-r12; pinned-sketch
                                     #   build + merge ⊂
                                     #   events_rolling_distinct_kmv
                                     #   (admitted r13, same
                                     #   deterministic-hash sketch
                                     #   merge) + events_kmv_setops
                                     #   (in window); CMS width/depth
                                     #   error bound property-tested
                                     #   in tests/test_frequent.py
        # retired in r14 AFTER earning ≥2 greens each (four 4-green,
        # twelve 3-green, fourteen 2-green), to admit 30 of the
        # 44-query r13 queue (E190-E233, new machinery first per the
        # r13 verdict); each names the sibling — in-window or admitted
        # this same rotation — that keeps its machinery driver-
        # checked. media_header_parse (2 greens) is the one KEPT
        # holdover: the multimodal tier's only window face has no
        # sibling anywhere. All retirees stay full-value oracle-
        # compared at two SFs in test_oracle_parity every suite run.
        "streaming_backfill_catchup",  # 4 greens r10-r13; epoch-keyed
                                     #   idempotent catch-up ⊂
                                     #   streaming_late_data_audit
                                     #   (admitted r14 — the streaming
                                     #   tier's window face, same
                                     #   epoch/watermark protocol
                                     #   machinery); live-stream path
                                     #   stays tested in tests/
                                     #   test_streaming_llm.py
        "dedup_simhash_pinned",      # 4 greens r10-r13; banded bit-
                                     #   signature bucket join ⊂
                                     #   dedup_eval_lsh_recall
                                     #   (admitted r14, banded-LSH
                                     #   buckets measured against the
                                     #   exact join) + dedup_setsim_prefix
                                     #   (in window); the SWAR bit vote
                                     #   stays pinned in tests/test_dedup.py
        "doc_pretoken_stats",        # 4 greens r10-r13; pretokenize
                                     #   explode + count-table ⊂
                                     #   doc_phrase_search (in window,
                                     #   same tokenize-explode posting
                                     #   build); BPE pretokenizer
                                     #   pinned in tests/test_tokenizer.py
        "events_item_triangles",     # 4 greens r10-r13; capped-edge
                                     #   oriented wedge join ⊂
                                     #   events_link_prediction
                                     #   (admitted r14, Adamic-Adar on
                                     #   the same capped co-occurrence
                                     #   wedges) + events_graph_assortativity
        "events_percentile_drift",   # 3 greens r11-r13; exact rank-
                                     #   spine percentiles ⊂
                                     #   events_spearman_drift (admitted
                                     #   r14, same global rank spine) +
                                     #   customers_revenue_gini
                                     #   (admitted r14, Lorenz = the
                                     #   cumulative-weight rank spine)
        "knn_eval_ivf",              # 3 greens r11-r13; IVF-vs-exact
                                     #   rollout gate ⊂
                                     #   knn_eval_reciprocal (in
                                     #   window, same IVF-routed vs
                                     #   exact gate composition, recall
                                     #   AND precision)
        "media_block_dedup",         # 3 greens r11-r13; binary block
                                     #   fingerprint hash-agg — the
                                     #   payload scan tier stays
                                     #   driver-checked via
                                     #   media_header_parse (KEPT in
                                     #   window) and the fingerprint
                                     #   hash-agg spine ⊂
                                     #   dedup_setsim_prefix (in
                                     #   window); Arrow plumbing stays
                                     #   golden-tested in tests/
                                     #   test_multimodal.py
        "parts_skyline",             # 3 greens r11-r13; dominance
                                     #   theta join as bucketed
                                     #   equi-join + residual ⊂
                                     #   events_interval_join (in
                                     #   window, same bucket-explode
                                     #   theta-join form); skyline
                                     #   semantics pinned in
                                     #   tests/test_relational.py
        "orders_itemset_triples",    # 3 greens r11-r13; A-priori
                                     #   capped pair/triple joins ⊂
                                     #   events_link_prediction
                                     #   (admitted r14, same capped
                                     #   co-occurrence pair machinery)
        "doc_hybrid_rrf",            # 3 greens r11-r13; pruned-
                                     #   postings index + per-query
                                     #   score join ⊂ doc_retrieval_mrr
                                     #   (admitted r14, BM25 eval over
                                     #   the SAME shared index) +
                                     #   doc_phrase_search (in window)
        "corpus_drift_psi",          # 3 greens r11-r13; smoothed-
                                     #   distribution divergence ⊂
                                     #   corpus_jsd_matrix (admitted
                                     #   r14, same add-one-smoothed
                                     #   divergence machinery over the
                                     #   global vocab)
        "events_attribution",        # 3 greens r11-r13; per-user
                                     #   ordered credit assignment ⊂
                                     #   events_rec_hitrate (admitted
                                     #   r14, same per-user temporal
                                     #   ordering/holdout machinery)
        "events_kmv_setops",         # 3 greens r11-r13; KMV sketch
                                     #   build/merge/estimate ⊂
                                     #   events_rolling_distinct_kmv
                                     #   (in window, same deterministic-
                                     #   hash KMV merge machinery)
        "corpus_incremental_stats",  # 3 greens r11-r13; incremental
                                     #   snapshot-diff statuses ⊂
                                     #   orders_ivm_join_view (admitted
                                     #   r14 — delta-algebra IVM, the
                                     #   strictly stronger incremental-
                                     #   view face)
        "parts_hierarchy_rollup",    # 3 greens r11-r13; bounded-depth
                                     #   keyed self-join chain +
                                     #   per-level aggregate ⊂
                                     #   events_hits_authority +
                                     #   events_label_propagation
                                     #   (both admitted r14, same
                                     #   fixed-round keyed-join
                                     #   iteration machinery)
        "events_zorder_pruning",     # 3 greens r11-r13; ⊂
                                     #   events_hilbert_pruning
                                     #   (admitted r14 — the strictly
                                     #   stronger face: measures
                                     #   zorder AND hilbert AND linear
                                     #   pruning on identical probes)
        "doc_linkage_blocked",       # 2 greens r12+r13; blocked pair
                                     #   generation ⊂ customers_typo_pairs
                                     #   (in window, FastSS edit-1
                                     #   join — the stronger linkage
                                     #   face with the definitional
                                     #   all-pairs oracle)
        "doc_linkage_snm",           # 2 greens r12+r13; sorted-
                                     #   neighborhood windowed pairs ⊂
                                     #   customers_typo_pairs (in
                                     #   window, same linkage tier);
                                     #   SNM window semantics pinned
                                     #   in tests/test_linkage.py
        "events_calendar_gaps",      # 2 greens r12+r13; per-key
                                     #   ordered lag-gap machinery ⊂
                                     #   events_acf_daily (admitted
                                     #   r14, same per-key ordered lag
                                     #   on the day grid) +
                                     #   users_survival_km (in window)
        "orders_benford_audit",      # 2 greens r12+r13; observed-vs-
                                     #   expected digit distribution ⊂
                                     #   events_chisq_independence
                                     #   (admitted r14, same expected-
                                     #   cell X² machinery on the
                                     #   category grid)
        "dedup_eval_bcubed",         # 2 greens r12+r13; truth-vs-
                                     #   predicted cluster scoring ⊂
                                     #   dedup_eval_lsh_recall
                                     #   (admitted r14, same truth-vs-
                                     #   approx pair-scoring gate) +
                                     #   embedding_silhouette
                                     #   (admitted r14)
        "doc_homoglyph_scan",        # 2 greens r12+r13; broadcast-
                                     #   lexicon scan-and-flag ⊂
                                     #   doc_mojibake_scan (in window,
                                     #   same shared-lexicon marker
                                     #   scan machinery)
        "corpus_profile_report",     # 2 greens r12+r13; one-pass
                                     #   aggregate battery ⊂
                                     #   events_anova_value (admitted
                                     #   r14, same one-aggregate exact
                                     #   sufficient-statistics shape) +
                                     #   lineitem profiling pinned in
                                     #   tests/test_profile.py
        "lineitem_contracts",        # 2 greens r12+r13; data-contract
                                     #   assertion battery ⊂
                                     #   schema_fk_orphans (admitted
                                     #   r14, the referential half of
                                     #   the same audit tier, planted
                                     #   violations + anti-joins)
        "knn_reciprocal_best",       # 2 greens r12+r13; run-once
                                     #   exact mutual-NN gate ⊂
                                     #   knn_reciprocal_ivf +
                                     #   knn_eval_reciprocal (both in
                                     #   window — the pipeline form
                                     #   and the gate that scores it
                                     #   against this exact set)
        "corpus_shard_movement",     # 2 greens r12+r13; snapshot-to-
                                     #   snapshot assignment diff ⊂
                                     #   orders_ivm_join_view (admitted
                                     #   r14, same delta-between-
                                     #   snapshots algebra)
        "events_type_trend",         # 2 greens r12+r13; grouped OLS
                                     #   slope ⊂ events_theilsen_trend
                                     #   (admitted r14, robust trend on
                                     #   the same per-type day grid);
                                     #   closed-form OLS pinned in
                                     #   tests/test_grouped.py
        "corpus_weighted_median_length",  # 2 greens r12+r13;
                                     #   cumulative-weight rank spine ⊂
                                     #   customers_revenue_gini
                                     #   (admitted r14 — the Lorenz
                                     #   curve IS the cumulative-weight
                                     #   spine) + events_mannwhitney
                                     #   (admitted r14, cumsum spine)
        "doc_prefix_completions",    # 2 greens r12+r13; prefix explode
                                     #   + grouped top-k ⊂
                                     #   doc_domain_cap (in window,
                                     #   same two-stage grouped top-k)
                                     #   + doc_phrase_search (in window,
                                     #   posting explode)
        "embedding_centroid_drift",  # 2 greens r12+r13; label-centroid
                                     #   aggregate + compare ⊂
                                     #   embedding_silhouette (admitted
                                     #   r14, same label-centroid
                                     #   machinery with the separation
                                     #   readout) + embedding_top_eigen
        # ---- retired in the r15 rotation (VERDICT r14 task 8): 15
        # multi-green holdovers make room for the full 15-name queue
        # (8 TPC-H shapes + 6 shape variants + media_wav_decode);
        # each names the sibling — in-window or admitted this same
        # rotation — that keeps its machinery driver-checked. The 5
        # kept 2-green members (customers_typo_pairs,
        # knn_eval_reciprocal, doc_phrase_search, events_interval_join,
        # doc_context_fit) each anchor machinery referenced by prior
        # retirees' annotations and covered by no other window face.
        # All retirees stay full-value oracle-compared at two SFs in
        # test_oracle_parity every suite run and remain in the bench.
        "media_header_parse",        # 3 greens r12-r14; binary
                                     #   magic/dims sniff + quarantine
                                     #   ⊂ media_wav_decode (admitted
                                     #   r15 — the strictly stronger
                                     #   multimodal face: REAL RIFF
                                     #   container parse through the
                                     #   stdlib codec, same Arrow
                                     #   kernel shape, same quarantine
                                     #   branch); header table pinned
                                     #   in tests/test_multimodal.py
        "knn_reciprocal_ivf",        # 2 greens r13+r14; IVF-routed
                                     #   mutual NN ⊂ knn_eval_reciprocal
                                     #   (KEPT in window — the gate
                                     #   runs this same routed pipeline
                                     #   AND scores it against the
                                     #   exact mutual set)
        "doc_readability",           # 2 greens r13+r14; zero-shuffle
                                     #   per-doc text-metric map ⊂
                                     #   doc_context_fit (KEPT in
                                     #   window, same zero-shuffle
                                     #   narrow-map tier); syllable
                                     #   heuristic pinned in
                                     #   tests/test_llm_ops.py
        "doc_domain_cap",            # 2 greens r13+r14; two-stage
                                     #   grouped top-k cap ⊂
                                     #   doc_retrieval_mrr (in window,
                                     #   grouped top-k over the shared
                                     #   postings) + doc_phrase_search
                                     #   (KEPT in window)
        "corpus_labeler_agreement",  # 2 greens r13+r14; detector-vs-
                                     #   label confusion-cell grid ⊂
                                     #   events_chisq_independence (in
                                     #   window, same observed/expected
                                     #   cell-grid machinery)
        "corpus_compaction_plan",    # 2 greens r13+r14; small-files
                                     #   planner on the cumsum spine ⊂
                                     #   events_peak_concurrency (in
                                     #   window, same global-cumsum
                                     #   spine) + corpus_quantile_normalize
                                     #   (admitted r15, rank spine)
        "events_ab_uplift",          # 2 greens r13+r14; hash-assigned
                                     #   arms + Welch conditional sums
                                     #   ⊂ events_did_uplift (admitted
                                     #   r15, same conditional-sum
                                     #   uplift machinery with the
                                     #   planted-effect oracle) +
                                     #   events_mannwhitney (in window)
        "events_rolling_distinct_kmv",  # 2 greens r13+r14; pinned
                                     #   KMV register merge ⊂
                                     #   events_hll_pinned (admitted
                                     #   r15, same bit-pinned sketch
                                     #   register machinery vs exact)
        "dedup_setsim_prefix",       # 2 greens r13+r14; prefix-filtered
                                     #   exact Jaccard join ⊂
                                     #   dedup_eval_lsh_recall (in
                                     #   window — its ground-truth side
                                     #   IS this exact setsim join, run
                                     #   on a dual-salted corpus)
        "events_bootstrap_ci",       # 2 greens r13+r14; md5-replicate
                                     #   Poisson weights + grouped sums
                                     #   ⊂ events_anova_value (in
                                     #   window, grouped exact
                                     #   sufficient statistics) +
                                     #   embedding_rp_distortion
                                     #   (admitted r15, same
                                     #   deterministic-hash replicate
                                     #   machinery)
        "doc_mojibake_scan",         # 2 greens r13+r14; byte-table
                                     #   decode scan + repair branch ⊂
                                     #   media_wav_decode (admitted
                                     #   r15, byte-payload decode with
                                     #   quarantine branch); the cp1252
                                     #   table stays pinned in
                                     #   tests/test_llm_ops.py
        "suppliers_sole_delay",      # 2 greens r13+r14; TPC-H Q21
                                     #   shape decorrelated to windows
                                     #   ⊂ parts_small_qty_revenue +
                                     #   customers_dormant_rich (both
                                     #   admitted r15 — per-key window
                                     #   decorrelation and scalar +
                                     #   anti-join, the same Q-shape
                                     #   machinery split across the
                                     #   octet)
        "corpus_preference_pairs",   # 2 greens r13+r14; margin-gated
                                     #   pair mining ⊂
                                     #   embedding_triplet_mining (in
                                     #   window, same grouped hardest-
                                     #   pair mining machinery)
        "events_ewma_forecast",      # 2 greens r13+r14; ordered
                                     #   recursive scan + backtest ⊂
                                     #   events_twap_value (in window,
                                     #   step-function time-weighted
                                     #   scan) + events_cusum_changepoint
                                     #   (in window, ordered cumulative
                                     #   scan)
        "users_survival_km",         # 2 greens r13+r14; ordered
                                     #   cumulative-product day grid ⊂
                                     #   users_bh_fdr (in window,
                                     #   ordered cumulative step-up
                                     #   decision) + events_acf_daily
                                     #   (in window, day-grid moments)
    }
    # genuinely-new ops added after this round's window filled; each
    # waits for the next rotation (once the current window earns its
    # rows) and is full-value oracle-compared in test_oracle_parity
    # meanwhile. The r6 queue (25) was admitted wholesale in r7, the
    # r7 queue (26) in r8, the r8 queue (27) in r9, the r9 queue (14)
    # in r10, the r10 queue (12) in r11, the r11 queue (15) in r12,
    # the r12 queue (19) in r13, and 30 of the 44-name r13 queue in
    # r14 (new machinery first, per the r13 verdict) — this set holds
    # the 14-name overhang deferred to the r15 rotation: the 8 TPC-H
    # shapes plus 6 shape variants whose machinery an admitted face
    # already drives (each annotated), plus the ONE r14 production
    # (media_wav_decode — the real-codec upgrade the r13 verdict asked
    # for if a codec appeared; the stdlib wave module qualifies).
    # Queue depth 15, exactly at the r13 verdict's ≤15 drain target.
    queued_for_rotation: set[str] = set()
    # the r15 rotation admitted the ENTIRE 15-name queue (the 8 TPC-H
    # shapes + 6 shape variants + media_wav_decode) — the queue is
    # EMPTY for the first time since r5, per the feature freeze of the
    # optimization rounds (no new faces were produced in r15)
    _r14_queue_admitted_r15: set[str] = {
        "customers_order_distribution",  # TPC-H Q13 shape
        "parts_small_qty_revenue",   # TPC-H Q17 shape
        "customers_large_volume",    # TPC-H Q18 shape
        "parts_min_cost_supplier",   # TPC-H Q2 shape
        "parts_value_share",         # TPC-H Q11 shape
        "supplier_top_revenue",      # TPC-H Q15 shape
        "suppliers_dominant_share",  # TPC-H Q20 shape
        "customers_dormant_rich",    # TPC-H Q22 shape
        "events_hll_pinned",         # bit-pinned HLL vs exact
        "corpus_quantile_normalize",  # pooled-quantile rank spine
        "events_did_uplift",         # difference-in-differences
        "events_ccf_view_purchase",  # lead-lag cross-correlation
        "embedding_rp_distortion",   # JL +-1 projection distortion
        "corpus_quota_allocation",   # Hamilton largest-remainder
        "media_wav_decode",          # REAL WAV decode (stdlib codec)
    }
    _r12_queue_admitted_r13: set[str] = {
        "knn_reciprocal_ivf",        # r12: mutual NN with both
                                     #   directions routed through the
                                     #   pinned-IVF index — the
                                     #   pipeline-embeddable form of
                                     #   knn_reciprocal_best
        "knn_eval_reciprocal",       # r12: mutual-NN rollout gate —
                                     #   IVF-routed pairs scored
                                     #   against the exact mutual set
                                     #   (pair recall AND precision)
        "events_interval_join",      # r12: bucketed interval-overlap
                                     #   (range) join — equi-join on
                                     #   (key, time bucket) with the
                                     #   BETWEEN as a residual; oracle
                                     #   is the definitional theta join
        "doc_readability",           # r12: Flesch reading ease + FK
                                     #   grade (vowel-group syllable
                                     #   heuristic, zero-shuffle map)
        "doc_domain_cap",            # r12: per-registrable-domain
                                     #   diversity cap (k best docs,
                                     #   two-stage grouped top-k)
        "corpus_labeler_agreement",  # r12: Cohen's kappa between the
                                     #   language detector and the
                                     #   provenance labels (oracle
                                     #   composes the confusion face)
        "corpus_compaction_plan",    # r12: small-files compaction
                                     #   planner — contiguous target-
                                     #   size groups on the cumsum
                                     #   spine; oracle = definitional
                                     #   running-total window
        "doc_phrase_search",         # r12: positional-index exact
                                     #   phrase search (adjacency
                                     #   equi-join chain over pruned
                                     #   postings)
        "events_ab_uplift",          # r12: A/B readout — Welch z from
                                     #   one conditional-sum pass on
                                     #   per-user integer cents
        "events_rolling_distinct_kmv",  # r12: trailing-7-day distinct
                                     #   users via per-day KMV sketch
                                     #   merge + exact ride-along
        "doc_context_fit",           # r12: head+tail context-window
                                     #   truncation (middle-out, seam
                                     #   marker, zero-shuffle map)
        "dedup_setsim_prefix",       # r12: EXACT all-pairs Jaccard
                                     #   via AllPairs/PPJoin prefix
                                     #   filtering; oracle = the
                                     #   definitional all-pairs join
        "events_bootstrap_ci",       # r12: Poisson-bootstrap grouped
                                     #   CI — md5-deterministic
                                     #   Poisson(1) replicate weights,
                                     #   41 replicates in one explode +
                                     #   one hash aggregate, CI ranks
                                     #   on order statistics
        "doc_mojibake_scan",         # r12: UTF-8-as-cp1252 double-
                                     #   encoding scan + measured
                                     #   repair from the shared
                                     #   14-marker lexicon (salted
                                     #   every-23rd corrupted copy)
        "suppliers_sole_delay",      # r12: TPC-H Q21 shape — the
                                     #   correlated EXISTS/NOT EXISTS
                                     #   pair decorrelated into two
                                     #   window columns; oracle = the
                                     #   textbook correlated form
        "corpus_preference_pairs",   # r12: RLHF/DPO pair mining —
                                     #   best-vs-worst per prompt from
                                     #   one max_by/min_by aggregate
                                     #   with a margin gate
        "customers_typo_pairs",      # r12: FastSS deletion-
                                     #   neighborhood edit-1 join;
                                     #   oracle = the definitional
                                     #   all-pairs theta join
                                     #   (completeness proof as data)
        "events_ewma_forecast",      # r12: grouped EWMA next-day
                                     #   forecast + MAPE backtest on
                                     #   integer-micro decay weights
        "users_survival_km",         # r12: Kaplan-Meier time-to-first-
                                     #   error curve, right-censored at
                                     #   the 72h cutoff; estimator on
                                     #   the bounded duration grid
    }
    _admitted_r9: set[str] = {
        "bpe_learned_merges",        # r8 oracle conversion: training
                                     #   rounds unrolled as framed-symbol
                                     #   CTEs (argmax + greedy merge)
        "dedup_embedding_lsh_pinned",  # r8 oracle conversion: md5-pinned
                                     #   ±1 sign planes over int8 codes
                                     #   make the banded LSH dataflow
                                     #   exactly value-checkable
        "corpus_apply_snapshot",     # r8: idempotent keyed MERGE of the
                                     #   snapshot change set (upsert +
                                     #   tombstone) with merge-path
                                     #   provenance
        "dedup_incremental_bloom",   # r8: bloom-prefiltered incremental
                                     #   dedup (identical statuses,
                                     #   join only on possible members)
        "corpus_length_batches",     # r8: length-bucketed padded
                                     #   batching with exact pad-waste
                                     #   audit (global-rank spine)
        "corpus_dedup_impact",       # r8: cluster-size histogram with
                                     #   exact token cost of dedup
        "doc_html_extract",          # r8: HTML -> text extraction
                                     #   (block/tag strip, entity
                                     #   decode, link count)
        "events_transition_matrix",  # r8: per-user Markov next-event
                                     #   matrix with row-normalized
                                     #   probabilities
        "doc_chat_render",           # r8: ChatML SFT rendering with
                                     #   exact loss-mask content spans
        "media_frame_plan",          # r8: stride frame-sampling
                                     #   schedule (codec-free half of
                                     #   the video path)
        "events_item_cooccurrence",  # r8: capped-basket item-item
                                     #   Jaccard (skew-bounded pair
                                     #   join)
        "corpus_epoch_schedule",     # r8: data-constrained repeat
                                     #   factors with cap + deficit
        "corpus_split_drift",        # r8: KS representativeness audit
                                     #   of the content-hash split
        "corpus_dup_rate_daily",     # r8: per-window crawler-health
                                     #   dup-rate trend
        "events_rfm_segments",       # r8: exact-ntile RFM grid on the
                                     #   rank spine, integer cents
        "corpus_gram_novelty",       # r8: per-doc first-owner n-gram
                                     #   novelty (dedup-strength signal)
        "corpus_ngram_table",        # r8: pruned 1-3-gram LM count
                                     #   table, one scan all orders
        "doc_rake_keyphrases",       # r8: RAKE phrases, integer-milli
                                     #   scores, grouped top-3
        "customers_k_anonymity",     # r8: quasi-identifier class-size
                                     #   audit with under-k flags
        "doc_blocklist_gate",        # r8: lexicon safety gate, token
                                     #   match, narrow map
        "doc_csv_ingest",            # r8: PERMISSIVE CSV-line source
                                     #   face (from_csv + ok probe)
        "events_user_burstiness",    # r8: self-normalized inter-arrival
                                     #   bot screen, integer micros
        "corpus_quality_calibration",  # r8: prob deciles x lexicon
                                     #   flag rate calibration audit
        "orders_market_basket",      # r8: basket pair mining with ppm
                                     #   support + lift
        "events_session_paths",      # r8: 30-min-gap session opening
                                     #   paths (gaps-and-islands)
        "corpus_language_confusion",  # r8: detector-vs-label confusion
                                     #   matrix with per-cell recall
        "corpus_shard_manifest",     # r8: order-insensitive shard
                                     #   content checksums
    }
    # the 14-query r9 queue was admitted wholesale in the r10 rotation
    _admitted_r10: set[str] = {
        "doc_span_dedup_keepone", "doc_char_span_flags",
        "doc_rerank_features", "streaming_backfill_catchup",
        "events_kmv_distinct", "corpus_scd2_history",
        "dedup_simhash_pinned", "doc_pretoken_stats", "knn_ivf_pinned",
        "dedup_eval_minhash", "events_trending_items",
        "events_value_percentiles", "events_item_triangles",
        "frequent_users_cms_pinned",
    }
    # the 12-query r10 queue was admitted wholesale in the r11 rotation
    _admitted_r11: set[str] = {
        "events_percentile_drift", "knn_eval_ivf", "media_block_dedup",
        "parts_skyline", "orders_itemset_triples", "doc_hybrid_rrf",
        "corpus_drift_psi", "events_attribution", "events_kmv_setops",
        "corpus_incremental_stats", "parts_hierarchy_rollup",
        "events_zorder_pruning",
    }
    # the 15-query r11 queue was admitted wholesale in the r12 rotation
    _admitted_r12: set[str] = {
        "doc_linkage_blocked", "doc_linkage_snm", "events_calendar_gaps",
        "orders_benford_audit", "media_header_parse", "dedup_eval_bcubed",
        "doc_homoglyph_scan", "corpus_profile_report", "lineitem_contracts",
        "knn_reciprocal_best", "corpus_shard_movement", "events_type_trend",
        "corpus_weighted_median_length", "doc_prefix_completions",
        "embedding_centroid_drift",
    }
    # 30 of the 44-name r13 queue admitted in the r14 rotation (the
    # other 14 stay in queued_for_rotation above for r15)
    _r13_queue_admitted_r14: set[str] = {
        "events_hilbert_pruning", "events_label_propagation",
        "events_hits_authority", "events_peak_concurrency",
        "streaming_late_data_audit", "orders_ivm_join_view",
        "events_orc_roundtrip", "knn_hubness", "knn_prefix_dim_eval",
        "embedding_silhouette", "dedup_eval_lsh_recall",
        "events_rec_hitrate", "doc_retrieval_mrr",
        "events_link_prediction", "events_graph_assortativity",
        "embedding_triplet_mining", "embedding_top_eigen",
        "corpus_jsd_matrix", "schema_fk_orphans",
        "events_cusum_changepoint", "events_theilsen_trend",
        "events_mannwhitney", "customers_revenue_gini",
        "events_chisq_independence", "events_spearman_drift",
        "events_acf_daily", "users_bh_fdr", "events_isotonic_purchase",
        "events_anova_value", "events_twap_value",
    }
    # every formerly-queued name either still sits inside the checked
    # window or was retired to declared_redundant AFTER ≥2 green rows
    # (the r11 rotation retired 12 two-green r9 admissions; the r12
    # rotation retired 15 names holding 2-4 greens each; the r13
    # rotation retired 19 names holding 3-5 greens each; the r14
    # rotation retired 30 names holding 2-4 greens each, keeping
    # media_header_parse as the multimodal tier's only window face)
    window_or_retired = set(_CHECKED_WINDOW) | declared_redundant
    assert _admitted_r9 <= window_or_retired, \
        _admitted_r9 - window_or_retired
    assert _admitted_r10 <= window_or_retired, \
        _admitted_r10 - window_or_retired
    assert _admitted_r11 <= window_or_retired, \
        _admitted_r11 - window_or_retired
    assert _admitted_r12 <= window_or_retired, \
        _admitted_r12 - window_or_retired
    assert _r12_queue_admitted_r13 <= window_or_retired, \
        _r12_queue_admitted_r13 - window_or_retired
    assert _r13_queue_admitted_r14 <= set(_CHECKED_WINDOW), \
        _r13_queue_admitted_r14 - set(_CHECKED_WINDOW)
    assert _r14_queue_admitted_r15 <= set(_CHECKED_WINDOW), \
        _r14_queue_admitted_r15 - set(_CHECKED_WINDOW)
    assert len((_r13_queue_admitted_r14 | _r14_queue_admitted_r15)
               - {"media_wav_decode"}) == 44
    tail = list(_REGISTRY)[len(_CHECKED_WINDOW):]
    undocumented = [n for n in tail
                    if _REGISTRY[n].oracle is not None
                    and n not in declared_redundant | queued_for_rotation]
    assert not undocumented, undocumented
