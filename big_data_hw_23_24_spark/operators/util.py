"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lowered_words(col: Column | str) -> Column:
    """The engine-wide tokenizer expression: lowercase, single-space
    split, empty tokens dropped. Several pinned invariants (BM25
    single ≡ batch agreement, hashed ≡ weighted classifier
    equivalence, every DuckDB oracle's ``list_filter(string_split(
    lower(text), ' '), ...)`` mirror) depend on byte-identical
    tokenization — change it HERE or nowhere."""
    col = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(col), " "), lambda w: w != "")


def ensure_fanout(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a df whose scan has too FEW partitions
    for expansion-heavy downstream work (explode to n-grams/shingles,
    per-row kernels): a sub-row-group-sized parquet file arrives as ONE
    split, serializing a 50× explode onto one core while 31 idle.

    No-op when the input already carries ≥ ``min_partitions`` (default
    ``sc.defaultParallelism``) — at 100 TB the scan has thousands of
    splits and the repartition must NOT add a shuffle; this guard is
    what makes the call safe to leave in the operator.

    CALL THIS ON SCAN-ROOTED FRAMES ONLY (a read + narrow projections).
    The partition probe goes through ``df.rdd``, and under AQE
    converting a DataFrame with upstream SHUFFLES to an RDD can
    materialize those exchanges as real jobs at construction time,
    which the later action does not reuse — on a scan-rooted frame
    there is nothing to materialize and the probe is metadata-only.
    Every in-repo call site feeds it the raw docs scan; operators that
    can also receive post-shuffle frames expose a ``fanout=False``
    opt-out (e.g. ``remove_repeated_spans``) so callers keep the
    contract honest.

    This is the declarative descendant of the reference's eager
    ``repartition(L)`` (G019HW1.java:68, X1): same intent — match
    parallelism to the work, not the input layout — applied only when
    the layout actually under-supplies partitions.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
