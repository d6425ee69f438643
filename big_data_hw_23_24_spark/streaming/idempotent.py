"""Effectively-once foreachBatch sinks via idempotent epoch writes.

Structured Streaming re-runs a micro-batch after failure with the SAME
``epoch_id`` (the reference's own template documents the resulting
at-least-once behavior, ``DistinctItemsExample.py:92-93``; SURVEY §7
risk 5 carries it). The standard cure is an idempotent sink: key every
write by epoch so a replayed batch overwrites its own previous attempt
instead of appending a duplicate.

``IdempotentBatchWriter`` writes each micro-batch to
``<root>/epoch=<id>/`` with ``overwrite`` mode — a retry of epoch N
replaces epoch N, never doubles it — and the union of epoch directories
is readable as one hive-partitioned dataset. This is the parquet
version of the dynamic-partition-overwrite trick; transactional tables
(Delta/Iceberg) do the same with a commit log, which this container
doesn't ship.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class IdempotentBatchWriter:
    """``foreachBatch`` callable: epoch-keyed overwrite parquet sink."""

    def __init__(self, root: str):
        self.root = root

    def __call__(self, batch: DataFrame, epoch_id: int) -> None:
        # overwrite of THIS epoch's directory only: a replayed batch
        # replaces its own prior (possibly partial) attempt
        (batch.write.mode("overwrite")
         .parquet(os.path.join(self.root, f"epoch={epoch_id}")))

    def read(self, spark: SparkSession) -> DataFrame:
        """All committed epochs as one DataFrame (epoch is a partition
        column, so readers can also prune by it)."""
        return spark.read.option("basePath", self.root) \
            .parquet(os.path.join(self.root, "epoch=*"))
