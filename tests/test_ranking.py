"""operators/ranking.py: the scalable global rank/ntile must agree
EXACTLY with the single-reducer window functions it replaces."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_hw_23_24_spark.operators.ranking import (
    global_ntile,
    global_rank,
)
from big_data_hw_23_24_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_global_rank_matches_window_row_number(spark):
    c = load_table(spark, SF, "customer").select(
        "c_custkey", F.col("c_acctbal").alias("bal"))
    got = {r.c_custkey: r.rank for r in
           global_rank(c, ["bal", "c_custkey"],
                       num_partitions=7).collect()}
    w = Window.orderBy("bal", "c_custkey")
    want = {r.c_custkey: r.rank for r in
            c.select("c_custkey",
                     F.row_number().over(w).alias("rank")).collect()}
    assert got == want


@pytest.mark.parametrize("n,parts", [(10, 7), (3, 2), (4, 32)])
def test_global_ntile_matches_window_ntile(spark, n, parts):
    c = load_table(spark, SF, "customer").select(
        "c_custkey", F.col("c_acctbal").alias("bal"))
    got = {r.c_custkey: r.t for r in
           global_ntile(c, n, ["bal", "c_custkey"], out_col="t",
                        num_partitions=parts).collect()}
    w = Window.orderBy("bal", "c_custkey")
    want = {r.c_custkey: r.t for r in
            c.select("c_custkey", F.ntile(n).over(w).alias("t")).collect()}
    assert got == want


def test_global_rank_broadcast_offset_path_many_partitions(spark):
    """Above 256 range partitions the offsets ship as a broadcast
    table, not a literal map — same ranks either way."""
    c = load_table(spark, SF, "customer").select(
        "c_custkey", F.col("c_acctbal").alias("bal"))
    got = {r.c_custkey: r.rank for r in
           global_rank(c, ["bal", "c_custkey"],
                       num_partitions=300).collect()}
    w = Window.orderBy("bal", "c_custkey")
    want = {r.c_custkey: r.rank for r in
            c.select("c_custkey",
                     F.row_number().over(w).alias("rank")).collect()}
    assert got == want


def test_global_ntile_fewer_rows_than_buckets(spark):
    df = spark.createDataFrame([(i,) for i in range(3)], "x int")
    got = sorted((r.x, r.t) for r in
                 global_ntile(df, 10, ["x"], out_col="t").collect())
    # ntile semantics: first N buckets take one row each
    assert got == [(0, 1), (1, 2), (2, 3)]


def test_global_ntile_empty_input(spark):
    df = spark.createDataFrame([], "x int")
    assert global_ntile(df, 10, ["x"], out_col="t").count() == 0


def test_global_rank_plan_has_no_single_partition_exchange(spark):
    c = load_table(spark, SF, "customer").select(
        "c_custkey", F.col("c_acctbal").alias("bal"))
    plan = global_rank(c, ["bal", "c_custkey"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan  # the pid-partitioned numbering window
