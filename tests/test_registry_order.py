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
    }
    # genuinely-new ops added after this round's window filled; each
    # waits for the next rotation (once the current window earns its
    # rows) and is full-value oracle-compared in test_oracle_parity
    # meanwhile. The r6 queue (25 queries) was admitted wholesale in
    # the r7 rotation — this set holds only post-rotation additions.
    queued_for_rotation = {
        # added mid-r7 after the window was re-filled
        "doc_decontaminate_spans",   # span-level benchmark decontam (r8)
        "dedup_url_normalized",      # provenance URL dedup groups (r8)
        "doc_lm_quality_buckets",    # CCNet per-lang LM buckets (r8)
        "dedup_containment_pairs",   # asymmetric containment dedup (r8)
        "events_zorder_key",         # Morton layout key kernel (r8)
        "embedding_gram_matrix",     # distributed Gram/PCA prep (r8)
        "corpus_leakage_safe_split", # component-keyed split (r8)
        "streaming_ingest_minhash",  # streaming near-dup ingest (r8)
        "doc_contrastive_negatives", # seed-free negative sampling (r8)
        "doc_payment_pii_scan",      # Luhn-validated card scan (r8)
        "doc_sentence_chunks",       # sentence-packed RAG chunks (r8)
        "events_skew_report",        # key-skew diagnosis report (r8)
        "corpus_pmi_collocations",   # PMI phrase mining (r8)
        "doc_jsonl_ingest",          # PERMISSIVE JSONL source face (r8)
        "doc_gopher_rules",          # Gopher quality-rule battery (r8)
        "corpus_priority_sample",    # weighted HT sampling (r8)
        "corpus_zipf_fit",           # rank-frequency OLS diagnostic (r8)
        "events_item_pagerank",      # fixed-iteration PageRank (r8)
        "corpus_source_overlap",     # cross-slice containment matrix (r8)
        "doc_unicode_nfc",           # NFC normalization (Arrow UDF) (r8)
        "knn_mmr_rerank",            # MMR diversified top-k (r8)
        "events_daily_anomaly",      # trailing-baseline z-scores (r8)
        "corpus_vocab_growth",       # Heaps-law growth curve (r8)
        "corpus_snapshot_diff",      # fingerprint change set (r8)
        "corpus_length_ks_matrix",   # distributional drift test (r8)
        "corpus_robust_stats",       # exact-rank trimmed/winsor means (r8)
    }
    tail = list(_REGISTRY)[len(_CHECKED_WINDOW):]
    undocumented = [n for n in tail
                    if _REGISTRY[n].oracle is not None
                    and n not in declared_redundant | queued_for_rotation]
    assert not undocumented, undocumented
