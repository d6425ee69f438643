"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_fanout(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a df whose scan has too FEW partitions
    for expansion-heavy downstream work (explode to n-grams/shingles,
    per-row kernels): a sub-row-group-sized parquet file arrives as ONE
    split, serializing a 50× explode onto one core while 31 idle.

    No-op when the input already carries ≥ ``min_partitions`` (default
    ``sc.defaultParallelism``) — at 100 TB the scan has thousands of
    splits and the repartition must NOT add a shuffle; this guard is
    what makes the call safe to leave in the operator. The partition
    count probe is plan metadata only (no job).

    This is the declarative descendant of the reference's eager
    ``repartition(L)`` (G019HW1.java:68, X1): same intent — match
    parallelism to the work, not the input layout — applied only when
    the layout actually under-supplies partitions.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
