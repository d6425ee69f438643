"""Sink round-trips: parquet (partitioned), CSV, JSON — written results
must read back value-identical, and a partitioned write must produce a
prunable hive layout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _pricing(spark):
    from big_data_hw_23_24_spark.queries import _REGISTRY, _ensure_loaded

    _ensure_loaded()
    return _REGISTRY["pricing_summary"].spark_fn(spark, SF)


def _as_sets(df):
    return {tuple(r) for r in df.collect()}


def test_parquet_partitioned_roundtrip_and_pruning(spark, tmp_path):
    from big_data_hw_23_24_spark.sources.sinks import read_parquet, write_parquet

    out = str(tmp_path / "pq")
    res = _pricing(spark)
    write_parquet(res, out, partition_by=["l_returnflag"], coalesce=1)
    # hive layout present → downstream partition pruning
    assert any(d.startswith("l_returnflag=") for d in os.listdir(out))
    back = read_parquet(spark, out).select(*res.columns)
    assert _as_sets(back) == _as_sets(res)
    # pruned scan reads only the one partition directory
    plan = (back.where(F.col("l_returnflag") == "A")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan, plan


def test_csv_roundtrip(spark, tmp_path):
    from big_data_hw_23_24_spark.sources.sinks import read_csv, write_csv

    out = str(tmp_path / "csv")
    res = _pricing(spark)
    write_csv(res, out, coalesce=1)
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in res.schema.fields)
    back = read_csv(spark, out, schema).select(*res.columns)
    assert _as_sets(back) == _as_sets(res)


def test_json_roundtrip(spark, tmp_path):
    from big_data_hw_23_24_spark.sources.sinks import write_json

    out = str(tmp_path / "js")
    res = _pricing(spark)
    write_json(res, out, coalesce=1)
    back = (spark.read.schema(res.schema).json(out)).select(*res.columns)
    assert _as_sets(back) == _as_sets(res)
