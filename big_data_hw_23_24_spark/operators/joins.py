"""As-of (time-travel) join — a join shape the reference lacks
entirely (SURVEY.md §2.5: J1-J4 are its complete join surface) but
that any time-series / feature-backfill pipeline needs: for each left
row, attach the payload of the *latest* right row at-or-before the
left row's time within the same key.

Spark-first design: the naive formulation is an inequality join
(``l.key = r.key AND r.t <= l.t`` + keep-latest), which Catalyst can
only execute as a broadcast-nested-loop or a sort-merge with a
per-key quadratic tail — both collapse at 100 TB. Instead we use the
classic union+window rewrite:

1. tag right rows (side=0) and left rows (side=1), align schemas,
   union;
2. one window per key ordered by ``(time, side, tiebreak)``:
   ``last(payload, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` carries the most
   recent right payload forward to every left row;
3. keep the left rows and expand the carried payload.

Cost: ONE shuffle of |left| + |right| rows on the key plus an
in-partition sort — the same price as a plain equi-join, linear in
input, no pairwise expansion. Skewed keys degrade to a sort of that
key's rows, never to a cross product.

Determinism: at equal times right rows sort *before* left rows
(inclusive as-of), and right-vs-right ties are broken by
``tiebreak_col`` ascending, so the carried payload is the one with the
greatest ``(time, tiebreak)`` — matching an oracle's
``ROW_NUMBER() OVER (ORDER BY t DESC, tiebreak DESC) = 1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(left: DataFrame, right: DataFrame,
              left_key: str, right_key: str,
              left_time: str, right_time: str,
              payload_cols: list[str],
              tiebreak_col: str | None = None) -> DataFrame:
    """Backward (inclusive) as-of join.

    Returns every ``left`` row's columns plus ``payload_cols`` from the
    latest ``right`` row with ``right_time <= left_time`` and matching
    key — nulls when no such row exists (left-join semantics).
    ``payload_cols`` must not collide with ``left`` column names.
    """
    # Null right times sort FIRST in the window, so without this guard a
    # null-time row's payload would be carried to every left row of its
    # key — the documented contract (r.t <= l.t) excludes such rows.
    r = right.where(F.col(right_time).isNotNull()).select(
        F.col(right_key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        (F.col(tiebreak_col) if tiebreak_col is not None else F.lit(0))
        .cast("long").alias("_tb"),
        F.struct(*payload_cols).alias("_asof"),
    )
    l = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_tb"),
        F.lit(None).cast(r.schema["_asof"].dataType).alias("_asof"),
        F.struct(*left.columns).alias("_row"),
    )
    u = r.withColumn("_row", F.lit(None).cast(l.schema["_row"].dataType)) \
         .unionByName(l)
    w = (W.partitionBy("_k").orderBy("_t", "_side", "_tb")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (
        u.withColumn("_m", F.last("_asof", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
        .select("_row.*", "_m.*")
    )


def time_bucket_range_join(left: DataFrame, right: DataFrame,
                           left_key: str, right_key: str,
                           left_time: str, right_time: str,
                           window_sec: int) -> DataFrame:
    """Interval join: all (left, right) pairs with matching key and
    ``right_time ∈ [left_time, left_time + window_sec)``.

    Same scale problem as the as-of join — the naive form is an
    inequality join — solved with the same family of rewrite the
    engine uses for the Chebyshev cell join (offset-explode,
    ``operators/outliers.py``): quantize time into buckets exactly
    ``window_sec`` wide, explode each left row to its bucket and the
    next (a window starting anywhere inside bucket b ends inside
    b or b+1, never later), hash equi-join on (key, bucket), then
    apply the exact range predicate. ONE shuffle keyed on
    (key, bucket); each right row carries a single bucket so no pair
    is produced twice. Cost: 2× left-side duplication, linear.

    Column names of ``left`` and ``right`` must be disjoint.
    """
    lb = F.floor(F.unix_timestamp(F.col(left_time)) / F.lit(window_sec))
    rb = F.floor(F.unix_timestamp(F.col(right_time)) / F.lit(window_sec))
    l = left.withColumn("_b", F.explode(F.array(lb, lb + 1)))
    r = right.withColumn("_b", rb)
    return (
        l.join(r, (F.col(left_key) == F.col(right_key))
               & (l["_b"] == r["_b"]))
        .where((F.col(right_time) >= F.col(left_time))
               & (F.col(right_time)
                  < F.col(left_time) + F.expr(f"INTERVAL {window_sec} SECONDS")))
        .drop("_b")
    )
