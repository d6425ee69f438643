"""CLI app: corpus deduplication report.

The extension-surface counterpart of the reference's homework
programs (`G019HW1.java` prints an outlier report; this prints a
dedup report): run the full dedup stack over a parquet corpus of
``(doc_id, text)`` documents and report, per method, how many
duplicate pairs / groups survive and what fraction of the corpus a
dedup pass would drop.

Methods (all from ``operators/dedup.py`` / ``operators/similarity.py``):
  exact      md5-of-normalized-text groups
  minhash    MinHash-LSH near-dup pairs (Jaccard >= --threshold)
  simhash    SimHash pairs within --hamming bits

Usage:
  python -m big_data_hw_23_24_spark.apps.dedup_report <corpus.parquet>
         [--threshold 0.7] [--hamming 3]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, path: str, threshold: float = 0.7,
        max_hamming: int = 3) -> list[str]:
    from ..operators.dedup import (
        exact_duplicate_groups,
        minhash_near_duplicates,
        simhash_near_duplicates,
    )

    docs = spark.read.parquet(path).select("doc_id", "text").cache()
    n_docs = docs.count()

    exact = exact_duplicate_groups(docs).cache()
    ex_groups = exact.count()
    ex_extra = (exact.agg(F.sum(F.col("n_docs") - 1)).collect()[0][0]
                or 0)

    mh = minhash_near_duplicates(docs, threshold=threshold)
    mh_pairs = mh.count()
    mh_docs = (mh.select(F.col("id_b").alias("d")).distinct().count())

    sh = simhash_near_duplicates(docs, max_hamming=max_hamming)
    sh_pairs = sh.count()

    drop_frac = (ex_extra + mh_docs) / max(n_docs, 1)
    return [
        f"Documents = {n_docs}",
        f"Exact duplicate groups = {ex_groups} "
        f"(redundant copies = {ex_extra})",
        f"MinHash-LSH near-dup pairs (J >= {threshold}) = {mh_pairs} "
        f"(droppable docs = {mh_docs})",
        f"SimHash pairs (hamming <= {max_hamming}) = {sh_pairs}",
        f"Upper-bound drop fraction = {drop_frac:.4f}",
    ]


def main(argv: list[str]) -> int:
    if not argv:
        print("Usage: dedup_report <corpus.parquet> "
              "[--threshold T] [--hamming H]")
        return 1
    path = argv[0]
    threshold, hamming = 0.7, 3
    it = iter(argv[1:])
    for a in it:
        if a == "--threshold":
            threshold = float(next(it))
        elif a == "--hamming":
            hamming = int(next(it))
    from ..session import get_session

    spark = get_session("DedupReport")
    for line in run(spark, path, threshold, hamming):
        print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
