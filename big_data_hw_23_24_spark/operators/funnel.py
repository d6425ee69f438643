"""Sequential funnel analysis over an event stream.

The classic event-analytics query (Amplitude/Mixpanel "funnels",
ClickHouse ``windowFunnel``): how many users performed stage 1, then
stage 2 STRICTLY AFTER their first stage-1 event, then stage 3 after
that, … Order matters — a purchase before the first view does not
count as funnel progress.

Semantics (first-touch): t₁ = the user's earliest stage-1 event;
tᵢ = the earliest stage-i event with ts > tᵢ₋₁. ``depth`` = number of
stages reached. This is the standard greedy definition; it maximizes
depth for the strict-order rule given first-touch anchoring.

Scale shape: one aggregate per stage, each keyed on the user — the
first shuffle establishes user partitioning and every later
stage-aggregate + left join reuses that key (co-partitioned equi
joins, AQE broadcasts the shrinking reached-set when it fits). The
event stream is filtered to the stage's type BEFORE its shuffle, so
each stage moves only its own events. No windows, no driver state.

Reference scope: the reference engine has no event-analytics surface;
this extends the engine's events toolbox (as-of joins, tumbling /
hopping / session windows) with the ordered-sequence aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_depths"]


def funnel_depths(events: DataFrame, stages: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Per-user funnel progress → (user_id, depth).

    Only users who reached stage 1 appear; ``depth`` ∈ [1, len(stages)]
    counts the stages reached in strict first-touch order.
    """
    if len(stages) < 2:
        raise ValueError(f"a funnel needs at least 2 stages, got {stages}")
    if len(set(stages)) != len(stages):
        raise ValueError(f"duplicate stage types in {stages}")

    reached = (events.where(F.col(type_col) == stages[0])
               .groupBy(user_col).agg(F.min(ts_col).alias("_t1")))
    for i, st in enumerate(stages[1:], start=2):
        nxt = (events.where(F.col(type_col) == st)
               .join(reached.select(user_col, f"_t{i - 1}"), user_col)
               .where(F.col(ts_col) > F.col(f"_t{i - 1}"))
               .groupBy(user_col).agg(F.min(ts_col).alias(f"_t{i}")))
        reached = reached.join(nxt.select(user_col, f"_t{i}"),
                               user_col, "left")
    depth = F.lit(1)
    for i in range(2, len(stages) + 1):
        depth = depth + F.col(f"_t{i}").isNotNull().cast("int")
    return reached.select(F.col(user_col),
                          depth.cast("int").alias("depth"))
