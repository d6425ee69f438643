"""Physical-plan contracts: the scale properties are asserted, not hoped
for. If a refactor reintroduces a cartesian join, loses a parquet
filter pushdown, or breaks the one-scan shape of MRApproxOutliers,
these fail."""

from __future__ import annotations

import pytest

from big_data_hw_23_24_spark.plans.inspect import (
    explain_str,
    pushed_filters,
    uses_broadcast_join,
)
from big_data_hw_23_24_spark.queries import _ensure_loaded, _REGISTRY

_ensure_loaded()
SF = "/root/testdata/sf0.001"


def _plan(spark, name, mode="simple"):
    return explain_str(_REGISTRY[name].spark_fn(spark, SF), mode)


def test_pricing_summary_pushes_date_filter(spark):
    df = _REGISTRY["pricing_summary"].spark_fn(spark, SF)
    filters = " ".join(pushed_filters(df))
    assert "LessThanOrEqual(l_shipdate" in filters


def test_pricing_summary_prunes_columns(spark):
    # 11-column lineitem, 6-column read: ReadSchema must not be SELECT *
    df = _REGISTRY["pricing_summary"].spark_fn(spark, SF)
    text = explain_str(df, "formatted")
    read = next(ln for ln in text.splitlines() if "ReadSchema" in ln)
    assert "l_comment" not in read
    assert "l_orderkey" not in read  # unused by the aggregation


def test_star_join_broadcasts_dims(spark):
    df = _REGISTRY["revenue_by_nation"].spark_fn(spark, SF)
    assert uses_broadcast_join(df)
    assert "CartesianProduct" not in explain_str(df, "simple")


def test_mr_approx_is_single_scan_no_join(spark):
    plan = _plan(spark, "mr_approx_outliers", "simple")
    # one parquet scan, zero joins: histogram → offset explode → agg
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_exact_outliers_equi_join_not_bnl(spark):
    plan = _plan(spark, "exact_outliers", "simple")
    # the 3×3 probe is an equi hash join, never a nested-loop scan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan


def test_wordcount_partial_aggregation(spark):
    # map-side combine: partial + final HashAggregate pair
    plan = _plan(spark, "wordcount", "formatted")
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan


def test_topk_uses_take_ordered(spark):
    plan = _plan(spark, "top_brands_by_revenue", "simple")
    assert "TakeOrderedAndProject" in plan


def test_knn_scores_jvm_side(spark):
    # brute-force cosine stays in JVM expressions: no Python eval nodes
    plan = _plan(spark, "knn_cosine_bruteforce", "simple")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def _minhash_lazy_plan(spark):
    # materialize=False: the registry entry eagerly checkpoints (its
    # plan collapses to an RDD scan), so assert on the lazy pipeline
    from big_data_hw_23_24_spark.operators.dedup import minhash_near_duplicates
    from big_data_hw_23_24_spark.sources.tables import load_table
    docs = load_table(spark, SF, "documents")
    return explain_str(
        minhash_near_duplicates(docs, threshold=0.7, materialize=False),
        "simple")


def test_minhash_pipeline_jvm_side(spark):
    plan = _minhash_lazy_plan(spark)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_lsh_banding_has_no_signature_joinback(spark):
    # exactly 3 joins: band self-join + 2 shingle-verify joins — the
    # signature is carried through the explode, never joined back
    plan = _minhash_lazy_plan(spark)
    n_joins = sum(plan.count(j) for j in
                  ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"))
    assert n_joins <= 3, plan


def test_udaf_is_single_grouped_pandas_kernel(spark):
    # UDAF extension point: ONE FlatMapGroupsInPandas after the key
    # shuffle — no driver collect, no per-row Python
    plan = _plan(spark, "acctbal_median_by_nation", "simple")
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "BatchEvalPython" not in plan


@pytest.mark.parametrize("name", ["doc_quality_scores", "doc_language_id",
                                  "doc_token_stats"])
def test_textstats_are_narrow_maps(spark, name):
    # no shuffle at all: scan → project, exchange-free
    plan = _plan(spark, name, "simple")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan