"""The oracle-checked query registry.

Every implemented operator from SURVEY.md §2 (plus the north-star
extensions) is exposed here as a named query: a ``(spark, sf_dir) ->
DataFrame`` callable and, where SQL-expressible, an equivalent DuckDB
SQL string over the same parquet tables. ``__spark_entry__.py`` simply
re-exports this registry.

Conventions:
* every computed column is aliased identically in the Spark plan and
  the oracle SQL (the driver hash-compares by sorted column name);
* floating aggregates are rounded in BOTH engines so double summation
  order can't flip the hash;
* all queries return deterministic row sets (no rand(), no floats as
  sort tiebreakers).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.tables import POINTS_FROM_EVENTS_SQL, load_table, points_from_events


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Query(name, fn, oracle, doc)
        return fn
    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: q.spark_fn for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in _REGISTRY.items()
            if q.oracle is not None}


_LOADED = False

# The driver's correctness gate checks the FIRST ~50 registered queries
# (CORRECTNESS_r03 cut off at 50 of 74, leaving the whole LLM surface
# unverified), so registration order is part of the product contract.
# This list is the checked window: every oracle-bearing query, LLM
# surface first, exactly 50 names. Everything registered but not named
# here follows after — by design those are (a) no-oracle-by-design ops
# (samplers, MRFFT, banded LSH — their guarantees are property-tested,
# a driver rows-only run adds nothing), (b) redundant faces whose
# semantics are already driver-checked by a window query (e.g.
# rollup/cube ⊂ grouping sets, running total ⊂ customer_rolling_30d),
# and (c) faces rotated out AFTER earning a green driver row, to make
# room for never-checked queries — each with an in-window sibling
# covering its operator (the full annotated list lives in
# tests/test_registry_order.py::declared_redundant); all of them
# stay oracle-compared in tests/test_oracle_parity.py.
# tests/test_registry_order.py pins the invariants.
_CHECKED_WINDOW: tuple[str, ...] = (
    # ---- r15 rotation (VERDICT r14 task 8): the full 15-name queue
    # admitted (the 8 TPC-H shapes + 6 shape variants + the r14
    # production media_wav_decode — queue now EMPTY), over 15 retired
    # multi-green holdovers (media_header_parse with 3 greens, now
    # that media_wav_decode gives the multimodal tier a stronger
    # window face, + fourteen 2-green r13 admissions; every retiree
    # annotated with its in-window or incoming sibling in
    # tests/test_registry_order.py::declared_redundant and still
    # oracle-compared at two SFs every suite run). The 5 kept
    # 2-green members each anchor machinery no other window face
    # covers: customers_typo_pairs (the linkage tier's named sibling
    # for both r14 linkage retirees), knn_eval_reciprocal (the
    # mutual-NN gate both reciprocal retirees point at),
    # doc_phrase_search (positional-adjacency postings, named by
    # three r14 retirees), events_interval_join (bucket-explode
    # range join, parts_skyline's named sibling), doc_context_fit
    # (the zero-shuffle doc-map tier face, doc_readability's
    # sibling).
    # ---- r12 queue admitted in r13, kept members (2 greens) ----
    "knn_eval_reciprocal",
    "events_interval_join",
    "doc_phrase_search",
    "doc_context_fit",
    "customers_typo_pairs",
    # ---- r13 queue admitted in r14 (30 of 44; E190-E233), first
    # driver-checked (green) in r14. Ordered new-machinery-first
    # per the r13 verdict: layout/streaming/graph/eval tiers, then
    # the stats battery. ----
    "events_hilbert_pruning",
    "events_label_propagation",
    "events_hits_authority",
    "events_peak_concurrency",
    "streaming_late_data_audit",
    "orders_ivm_join_view",
    "events_orc_roundtrip",
    "knn_hubness",
    "knn_prefix_dim_eval",
    "embedding_silhouette",
    "dedup_eval_lsh_recall",
    "events_rec_hitrate",
    "doc_retrieval_mrr",
    "events_link_prediction",
    "events_graph_assortativity",
    "embedding_triplet_mining",
    "embedding_top_eigen",
    "corpus_jsd_matrix",
    "schema_fk_orphans",
    # the stats battery (exact sufficient statistics tier)
    "events_cusum_changepoint",
    "events_theilsen_trend",
    "events_mannwhitney",
    "customers_revenue_gini",
    "events_chisq_independence",
    "events_spearman_drift",
    "events_acf_daily",
    "users_bh_fdr",
    "events_isotonic_purchase",
    "events_anova_value",
    "events_twap_value",
    # ---- r13/r14 queue admitted in r15: the TPC-H shape octet, the
    # six shape variants of already-admitted machinery, and the
    # multimodal tier's real-codec face ----
    "customers_order_distribution",
    "parts_small_qty_revenue",
    "customers_large_volume",
    "parts_min_cost_supplier",
    "parts_value_share",
    "supplier_top_revenue",
    "suppliers_dominant_share",
    "customers_dormant_rich",
    "events_hll_pinned",
    "corpus_quantile_normalize",
    "events_did_uplift",
    "events_ccf_view_purchase",
    "embedding_rp_distortion",
    "corpus_quota_allocation",
    "media_wav_decode",
)


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent), then
    reorder the registry so the driver's checked window (first ~50)
    covers exactly the oracle-bearing surface."""
    global _LOADED
    if _LOADED:
        return
    from . import queries_relational  # noqa: F401
    from . import queries_algorithms  # noqa: F401
    from . import queries_llm  # noqa: F401
    ordered = {name: _REGISTRY[name] for name in _CHECKED_WINDOW}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    _REGISTRY.clear()
    _REGISTRY.update(ordered)
    _LOADED = True


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return points_from_events(load_table(spark, sf_dir, "events"))


# DuckDB CTE matching _points exactly (same expression text as
# POINTS_FROM_EVENTS_SQL so both engines compute identical doubles).
POINTS_CTE = f"WITH points AS ({POINTS_FROM_EVENTS_SQL})"
