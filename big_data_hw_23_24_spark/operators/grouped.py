"""Grouped custom aggregation (UDAF extension point, SURVEY §2.9).

When an aggregate has no built-in Column expression (interpolated
percentiles, per-group model fits, ...), the Spark-first shape is
``groupBy(...).applyInPandas(kernel, schema)``: one shuffle on the
group keys, then an Arrow-batched pandas kernel per group — a single
FlatMapGroupsInPandas node, no driver-side collect. The kernel below
(interpolated percentile) mirrors ANSI ``percentile_cont``, which is
also its DuckDB oracle.

Scale note: each group must fit in one executor's memory (the whole
group is materialized as a pandas DataFrame). Fine for dimension-keyed
groups (nations, brands); for ultra-high-cardinality values per key,
prefer ``percentile_approx`` or a two-pass exact algorithm.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def grouped_percentile(df: DataFrame, keys: list[str], value_col: str,
                       p: float = 0.5, out_col: str = "pctl") -> DataFrame:
    """Exact interpolated percentile of ``value_col`` per group.

    Semantics match ``percentile_cont(p) WITHIN GROUP (ORDER BY v)``:
    linear interpolation between the two adjacent order statistics
    (pandas ``quantile(..., interpolation="linear")``). Returns one row
    per group: (*keys, out_col, n).
    """
    key_fields = ", ".join(
        f"{k} {df.schema[k].dataType.simpleString()}" for k in keys)
    schema = f"{key_fields}, {out_col} double, n long"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[value_col].dropna()
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row[out_col] = [float(vals.quantile(p, interpolation="linear"))
                        if len(vals) else None]
        row["n"] = [len(vals)]
        return pd.DataFrame(row)

    return df.groupBy(*keys).applyInPandas(kernel, schema)


def grouped_topk(df: DataFrame, group_cols: list[str],
                 order_by: list, k: int,
                 rank_col: str = "rank") -> DataFrame:
    """Exact top-``k`` per group WITHOUT a per-group reducer funnel.

    The naive ``row_number() OVER (PARTITION BY g ORDER BY ...)``
    routes EVERY row of a group through one reducer — for a skewed or
    giant group that task is the job. This runs the exact two-stage
    shape instead: stage 1 ranks within ``(physical partition, group)``
    and keeps k (P×G small reducers, each seeing only its slice);
    stage 2 ranks the ≤ k·P survivors per group. A group's global
    top-k is always a subset of its per-partition top-ks, so the
    result is exact.

    ``order_by`` must totally order rows (append a unique tiebreaker)
    or the returned ``rank_col`` is nondeterministic within ties.
    Extracted from (and now backing) ``selection.stratified_sample``
    and ``retrieval.bm25_search_many``.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    local = Window.partitionBy(F.spark_partition_id(),
                               *group_cols).orderBy(*order_by)
    survivors = (df.withColumn("_gtk_r", F.row_number().over(local))
                 .where(F.col("_gtk_r") <= k).drop("_gtk_r"))
    final = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (survivors.withColumn(rank_col, F.row_number().over(final))
            .where(F.col(rank_col) <= k))
