"""Registration shim for the E211 late-data audit face (kept beside
the other streaming registrations; split out so the streaming module
imports lazily at query call time like every other face)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import register
from .sources.tables import load_table


def register_late_audit() -> None:
    from .streaming.late_audit import late_audit_oracle_sql

    @register(
        "streaming_late_data_audit",
        late_audit_oracle_sql(),
        doc="watermarked tumbling-count replay under md5-shuffled "
            "(event-time-decorrelated) arrival: APPEND-mode emissions "
            "vs the full protocol simulation — per-batch cumulative "
            "maxima, eviction at the reported watermark, the late-row "
            "filter lagging one batch behind it, never-finalized tail "
            "windows withheld; 6 h windows, 12 h delay, 10 "
            "micro-batches",
    )
    def streaming_late_data_audit(spark, sf_dir):
        from .streaming.late_audit import run_late_data_audit

        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return run_late_data_audit(spark,
                                   load_table(spark, sf_dir, "events"))
