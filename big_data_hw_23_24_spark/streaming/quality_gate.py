"""Streaming corpus ingestion with a quality gate.

The ingestion-time sibling of the batch cleaning/classifier stages in
``apps.corpus_pipeline``: documents arrive in micro-batches and each
batch is scored and gated BEFORE it ever lands in the corpus store —
the production shape where filtering happens on ingest (cheap, narrow,
per-batch) rather than as a later full-corpus pass.

The gate itself is stateless (the hashed linear classifier plus a
minimum-length rule are pure per-row maps), so unlike the dedup
ingester there is no cross-epoch state to read; idempotency still
matters — a replayed micro-batch must overwrite its own prior attempt,
not double the epoch — so every epoch writes through the
``IdempotentBatchWriter`` epoch-keyed overwrite sink.

Scale shape: per micro-batch a single narrow JVM fold (zero shuffle)
and one epoch-partitioned parquet write; throughput is scan-bound.
Reference parity: extends the HW3 micro-batch harness
(``G016HW3.java:79-101``) from counting to content gating.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .idempotent import IdempotentBatchWriter


class StreamingQualityGate:
    """``foreachBatch`` callable: score, flag and epoch-write docs.

    Each incoming document is scored by the hashed linear classifier
    (``operators.cleaning.linear_quality_score``) and flagged
    ``kept = (prob >= min_prob) AND (n_tokens >= min_tokens)``. ALL
    rows are written with their flags (auditability: a dropped doc is
    visible with its reason-bearing scores), partitioned by epoch.
    """

    def __init__(self, root: str, min_prob: float = 0.5,
                 min_tokens: int = 5):
        self.min_prob = min_prob
        self.min_tokens = min_tokens
        self.writer = IdempotentBatchWriter(os.path.join(root, "scored"))

    def __call__(self, batch: DataFrame, epoch_id: int) -> None:
        from ..operators.cleaning import linear_quality_score

        scored = linear_quality_score(batch)
        out = scored.select(
            "doc_id", "n_tokens", "logit", "prob",
            ((F.col("prob") >= self.min_prob)
             & (F.col("n_tokens") >= self.min_tokens)).alias("kept"))
        self.writer(out, epoch_id)

    def results(self, spark: SparkSession) -> DataFrame:
        """Every ingested doc with scores, flags and its epoch."""
        return self.writer.read(spark)


def run_quality_gate(spark: SparkSession, stream: DataFrame,
                     gate: StreamingQualityGate,
                     timeout_sec: int = 120) -> None:
    """Drive the bounded replay to completion (availableNow: process
    everything the source has, then stop — the bounded-read face)."""
    q = (stream.writeStream.foreachBatch(gate)
         .trigger(availableNow=True)
         .option("checkpointLocation", gate.writer.root + "_ckpt")
         .start())
    assert q.awaitTermination(timeout_sec), \
        f"quality-gate stream did not finish within {timeout_sec}s"
