"""Streaming ingest health: per-trigger throughput and watermark lag.

The ops-side complement of the ingest gates (quality gate, dedup,
MinHash): those decide WHAT enters the corpus, this reports HOW the
ingestion is running — is the stream keeping up (processed rows/sec vs
arrival), how far event time trails processing time (watermark lag =
late-data exposure), and how long each trigger takes. On a cluster
these are the numbers an on-call reads before touching anything.

Source of truth is Spark's own ``StreamingQueryProgress`` feed: every
trigger emits one progress object on the driver (bounded — Spark
retains ``spark.sql.streaming.numRecentProgressUpdates`` of them, 100
by default), so turning them into a DataFrame is a driver-side
construction of an inherently driver-sized list, not a collect of
distributed data. Values (durations, rates, wall-clock stamps) are
runtime-dependent by nature → rows-only query face, with the
structural invariants (monotonic batch ids, non-decreasing watermark,
input-row conservation, non-negative lag) property-tested instead
(SURVEY §5's no-oracle-by-design category).

Reference scope: north-star extension of the HW3 monitoring loop
(``G016HW3.java:104-134`` prints per-batch counts from the driver);
this is the same idea carried to Structured Streaming's progress API.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

_SCHEMA = ("batch_id long, trigger_ts string, num_input_rows long, "
           "processed_rows_per_sec double, trigger_ms long, "
           "watermark string, watermark_lag_ms long")


def _parse_ts(s: str) -> datetime | None:
    """Progress timestamps are ISO-8601 with a Z suffix."""
    if not s:
        return None
    try:
        return datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None


def query_progress(query) -> list[dict]:
    """Normalize ``query.recentProgress`` to plain dicts (PySpark
    surfaces progress as dicts; guard the object form for safety)."""
    out = []
    for p in query.recentProgress:
        if isinstance(p, dict):
            out.append(p)
        else:  # pragma: no cover - JVM object form
            out.append(json.loads(p.json))
    return out


def health_report(spark: SparkSession, progress: list[dict]) -> DataFrame:
    """Progress objects → one health row per trigger.

    Columns: ``batch_id``, ``trigger_ts`` (ISO), ``num_input_rows``,
    ``processed_rows_per_sec``, ``trigger_ms`` (triggerExecution),
    ``watermark`` (ISO, null until the first watermark is emitted —
    Spark's epoch-zero placeholder is mapped to null rather than
    reported as a billion-hour lag), ``watermark_lag_ms`` (trigger
    wall-clock minus watermark; the late-data exposure window).
    """
    rows = []
    for p in progress:
        wm = (p.get("eventTime") or {}).get("watermark")
        if wm and wm.startswith("1970-01-01T00:00:00"):
            wm = None  # not yet initialized, not a real lag
        t = _parse_ts(p.get("timestamp", ""))
        w = _parse_ts(wm) if wm else None
        if w is not None and w.tzinfo is None:
            w = w.replace(tzinfo=timezone.utc)
        lag = int((t - w).total_seconds() * 1000) \
            if (t is not None and w is not None) else None
        rows.append((
            int(p["batchId"]),
            p.get("timestamp", ""),
            int(p.get("numInputRows", 0) or 0),
            float(p.get("processedRowsPerSecond", 0.0) or 0.0),
            int((p.get("durationMs") or {}).get("triggerExecution", 0)
                or 0),
            wm,
            lag,
        ))
    return spark.createDataFrame(rows, _SCHEMA)
