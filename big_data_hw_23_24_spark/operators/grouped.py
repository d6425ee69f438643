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
