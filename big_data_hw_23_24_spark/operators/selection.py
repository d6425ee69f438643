"""Deterministic corpus selection: exact per-stratum sampling and
token-budget curation.

Data mixing (operators.splits) answers "what FRACTION of each source
goes in"; these operators answer the other two curation questions a
training run actually asks:

* ``stratified_sample`` — "give me exactly k documents per source,
  reproducibly" (eval-set carving, per-domain probes, ablation
  subsets). Rate-based mixing can't hit an exact count; ``df.sample``
  isn't reproducible across engines or partitionings. Ordering by the
  md5 of the key is both: a uniform, seed-free, engine-portable
  shuffle.
* ``quality_budget`` — "fill a token budget with the best documents"
  (the compute-optimal data-curation step: rank by a quality signal,
  take documents in rank order until the budget is spent).

Scale shapes:

* Per-stratum top-k runs in TWO keyed stages: stage 1 ranks within
  ``(stratum, physical partition)`` — P×S reducers, each seeing only
  its slice — and keeps k; stage 2 ranks the surviving ≤ k·P rows per
  stratum. The global top-k per stratum is always a subset of the
  per-partition top-ks, so this is exact; no stratum ever funnels all
  its rows through one task, which is what a naive
  ``row_number() OVER (PARTITION BY source)`` does to a 10 TB stratum.
* The budget cut uses :func:`operators.ranking.global_cumsum` — the
  two-pass range-partitioned prefix sum — so no single-partition
  window ever sees the corpus.

The reference engine has no sampling surface beyond the sequential
reservoir (G016HW3.java:104-120, K1); both operators here are
north-star extensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .ranking import global_cumsum


def stratified_sample(df: DataFrame, strata_cols: list[str], k: int,
                      key: Column | str,
                      rank_col: str = "sample_rank") -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, chosen by md5
    order of ``key`` — deterministic across runs, partitionings and
    engines. ``key`` must be unique per row (it is the tiebreak).

    Adds ``rank_col`` (1-based within the stratum, in the same md5
    order) so callers can take nested subsamples (rank ≤ j for j < k)
    that are prefix-consistent with the full sample.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(key.cast("string"))
    local = Window.partitionBy(F.spark_partition_id(),
                               *strata_cols).orderBy(h, key)
    survivors = (df.withColumn("_h", h)
                 .withColumn("_r", F.row_number().over(local))
                 .where(F.col("_r") <= k)
                 .drop("_r"))
    final = Window.partitionBy(*strata_cols).orderBy("_h", key)
    return (survivors
            .withColumn(rank_col, F.row_number().over(final))
            .where(F.col(rank_col) <= k)
            .drop("_h"))


def quality_budget(df: DataFrame, order_by: list[Column | str],
                   size_col: str, budget: int,
                   cum_col: str = "cum_size",
                   keep_partial: bool = False) -> DataFrame:
    """Take rows in ``order_by`` order (best first — pass descending
    quality plus a unique tiebreaker) until the running total of
    ``size_col`` reaches ``budget``.

    ``keep_partial=False`` keeps rows whose INCLUSIVE running total
    fits the budget (never overshoots); ``True`` also admits the first
    row that crosses it (never undershoots while data remains). The
    returned frame carries ``cum_col`` so downstream stages can see
    how full the budget ran.
    """
    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    cum = global_cumsum(df, order_by, size_col, out_col=cum_col)
    if keep_partial:
        # row crosses the line iff everything BEFORE it fit
        return cum.where(F.col(cum_col) - F.col(size_col) < budget)
    return cum.where(F.col(cum_col) <= budget)


def token_shards(df: DataFrame, order_by: list[Column | str],
                 size_col: str, target: int,
                 shard_col: str = "shard",
                 cum_col: str = "cum_size") -> DataFrame:
    """Assign rows to ~``target``-sized shards in ``order_by`` order —
    equal-WORK output shards (by token/byte count, not row count),
    the layout a training run actually wants: every data-parallel
    reader streams the same number of tokens.

    shard = floor(start_offset / target), where start_offset is the
    exclusive prefix sum of ``size_col`` — each row lands in the shard
    its first token falls in, so shard sizes deviate from ``target``
    by at most one document. The prefix sum is the range-partitioned
    two-pass :func:`operators.ranking.global_cumsum`; downstream,
    ``sources.sinks.write_parquet(partition_by=[shard])`` gives one
    directory per shard. Pass an md5-of-key order for a deterministic
    pre-shuffled layout (the engine's seed-free convention).
    """
    if target <= 0:
        raise ValueError(f"target must be positive, got {target}")
    cum = global_cumsum(df, order_by, size_col, out_col=cum_col)
    return cum.withColumn(
        shard_col,
        F.floor((F.col(cum_col) - F.col(size_col)) / target)
        .cast("bigint"))
