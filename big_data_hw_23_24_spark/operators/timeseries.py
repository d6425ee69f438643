"""Event-volume time-series diagnostics: trailing-baseline anomaly
scores.

A pipeline ingesting event streams (or document crawls) wants "did
today's volume for this slice deviate from its recent baseline" as a
standing health check — ingestion failures read as z ≪ 0, bot floods
and crawler loops as z ≫ 0. The classic rule: z-score of today's
count against the TRAILING window (yesterday and back), never
including the scored day in its own baseline.

Shape: one (key, day) pre-aggregate — map-side combinable, one
shuffle — then window functions over the per-day table, PARTITIONED
BY key and ordered by day with a bounded ROWS frame. The windowed
side is days × keys rows (tiny vs the event table), so the window
never sees corpus-scale data; at 100 TB of events the only heavy step
is the first aggregate, which is the minimum possible work for the
answer.

Reference scope: extends the reference's A1/A8 aggregate tier
(G016HW2.java histogram aggregates) with the event-analytics surface
the north-star asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def daily_anomaly_scores(events: DataFrame, key_col: str = "event_type",
                         ts_col: str = "ts", trailing_days: int = 7,
                         min_baseline: int = 3,
                         z_threshold: float = 2.0) -> DataFrame:
    """Per-(key, day) count anomaly vs the trailing-``trailing_days``
    baseline → ``(key, day, n, baseline_avg, baseline_std, z,
    is_anomaly)``.

    ``z = (n − avg) / std`` over the ROWS frame ``[−trailing_days,
    −1]`` (strictly prior days); null when the baseline has fewer
    than ``min_baseline`` days or zero variance — a flat baseline
    makes any deviation infinite-z, which is a data-quality signal of
    its own, not an anomaly score. ``is_anomaly`` is the
    ``|z| > z_threshold`` decision with nulls coalesced to false.
    """
    daily = (events
             .groupBy(F.col(key_col), F.to_date(ts_col).alias("day"))
             .agg(F.count("*").alias("n")))
    w = (Window.partitionBy(key_col).orderBy("day")
         .rowsBetween(-trailing_days, -1))
    avg = F.avg("n").over(w)
    std = F.stddev_samp("n").over(w)
    cnt = F.count("n").over(w)
    z = F.when((cnt >= min_baseline) & (std > 0),
               (F.col("n") - avg) / std)
    return (daily
            .select(key_col, "day", F.col("n").cast("long").alias("n"),
                    F.when(cnt >= min_baseline, F.round(avg, 6))
                    .alias("baseline_avg"),
                    F.when(cnt >= min_baseline, F.round(std, 6))
                    .alias("baseline_std"),
                    F.round(z, 6).alias("z"),
                    F.coalesce(F.abs(z) > z_threshold, F.lit(False))
                    .alias("is_anomaly")))
