"""Structured Streaming harness tests: deterministic file-source batches
replaying the events item sequence, plus rate-source smoke."""

from __future__ import annotations

import os
import shutil
import tempfile
from collections import Counter

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_hw_23_24_spark.operators.frequent import ReservoirSampler, StickySampler
from big_data_hw_23_24_spark.streaming.frequent_stream import (
    FrequentItemsMonitor,
    rate_item_stream,
    run_frequent_items,
    streaming_histogram,
)

SF = "/root/testdata/sf0.001"
SCHEMA = T.StructType([
    T.StructField("seq", T.LongType()),
    T.StructField("item", T.LongType()),
])


@pytest.fixture(scope="module")
def stream_dir(spark):
    """events.user_id ordered by (ts, event_id) → 10 parquet files with
    increasing mtimes: a deterministic micro-batch sequence."""
    from big_data_hw_23_24_spark.sources.tables import load_table
    from pyspark.sql import Window as W

    e = load_table(spark, SF, "events")
    w = W.orderBy("ts", "event_id")
    rows = (e.select(F.col("user_id").alias("item"), "ts", "event_id")
            .withColumn("seq", F.row_number().over(w) - 1)
            .select("seq", "item").collect())
    items = [r.item for r in sorted(rows, key=lambda r: r.seq)]

    d = tempfile.mkdtemp(prefix="stream_batches_")
    chunk = 100
    t0 = 1_700_000_000
    for i in range(0, len(rows), chunk):
        part = [(j, items[j]) for j in range(i, min(i + chunk, len(items)))]
        pdf = spark.createDataFrame(part, SCHEMA).coalesce(1)
        path = os.path.join(d, f"batch_{i // chunk:03d}")
        pdf.write.mode("overwrite").parquet(path)
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (t0 + i, t0 + i))
    yield d, items
    shutil.rmtree(d, ignore_errors=True)


def _file_stream(spark, d):
    return (spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(d, "batch_*")))


def test_foreachbatch_harness_matches_sequential_replay(spark, stream_dir):
    d, items = stream_dir
    n, phi, eps, delta = 800, 0.05, 0.02, 0.1
    monitor = FrequentItemsMonitor(n=n, phi=phi, eps=eps, delta=delta)
    run_frequent_items(spark, _file_stream(spark, d), monitor,
                       timeout_sec=90)

    # n-item cutoff honored exactly (G016HW3.java:80-88 semantics)
    assert monitor.stream_length == n
    assert sum(monitor.histogram.values()) == n
    first_n = items[:n]
    assert monitor.histogram == dict(Counter(first_n))

    # sequential estimators identical to a direct replay (same seed)
    rs = ReservoirSampler(m=monitor.reservoir.m, seed=42)
    rs.add_many(first_n)
    assert monitor.reservoir.sample == rs.sample

    st = StickySampler(phi, eps, delta, n, seed=42)
    st.add_many(first_n)
    assert monitor.sticky.table == st.table

    # final report: ± annotation consistent with the true-frequent set
    rep = monitor.report(spark)
    true_items = {r.item for r in rep["true_frequent"].collect()}
    for r in rep["sticky"].collect():
        assert (r.sign == "+") == (r.item in true_items)


def test_stateful_streaming_histogram(spark, stream_dir):
    d, items = stream_dir
    agg = streaming_histogram(spark, _file_stream(spark, d))
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName("hist_out").start())
    q.processAllAvailable()
    q.stop()
    got = {r.item: r.cnt
           for r in spark.sql("SELECT * FROM hist_out").collect()}
    assert got == dict(Counter(items))


def test_rate_stream_planted_heavy_items(spark):
    n = 20_000
    monitor = FrequentItemsMonitor(n=n, phi=0.05, eps=0.02, delta=0.1)
    stream = rate_item_stream(spark, rows_per_second=50_000, n_heavy=10)
    run_frequent_items(spark, stream, monitor, timeout_sec=90)
    assert monitor.stream_length == n
    rep = monitor.report(spark)
    true_items = sorted(r.item for r in rep["true_frequent"].collect())
    # heavy_share=100 → every position is a planted item 0..9, each 10%
    assert true_items == list(range(10))
    sticky_items = sorted(r.item for r in rep["sticky"].collect())
    assert set(true_items) <= set(sticky_items)
