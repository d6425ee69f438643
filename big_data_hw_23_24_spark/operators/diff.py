"""Dataset snapshot diffing: content-fingerprint change sets between
two corpus versions.

A training-data pipeline re-crawls and re-cleans continuously; before
promoting a new snapshot it wants the CHANGE SET versus the one the
last model trained on — what was added, what disappeared, what was
silently rewritten (re-extraction changes, host takedowns, cleaning
regressions). Diffing by bytes is meaningless after re-serialization;
diffing by the dedup fingerprint (md5 of normalized text, the
engine-wide ``operators.dedup`` convention) answers the real question:
did the CONTENT change.

Shape: each side reduces to ``(id, fingerprint)`` — a 32-byte
projection of the corpus — then ONE full-outer equi-join on the id.
No text ever shuffles; at 100 TB both shuffle payloads are id+hash.
The status taxonomy is total: added / removed / modified / unchanged.

Reference scope: north-star extension (the reference has no
versioning surface); composes with ``dedup_incremental``'s
batch-vs-corpus join, which answers the prospective question
("is this new doc already in the corpus") where this answers the
retrospective one ("what happened between snapshots").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text


def snapshot_diff(old: DataFrame, new: DataFrame,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Content diff of two snapshots → ``(id, status, old_fp,
    new_fp)`` with ``status`` ∈ added | removed | modified |
    unchanged.

    Ids present only in ``new`` are ``added``, only in ``old`` are
    ``removed``; ids in both compare md5-of-normalized-text
    fingerprints. Null text normalizes like empty text (fingerprint
    of ``''``), so a doc whose text became null reads as modified,
    not as a join anomaly.
    """
    fp = F.md5(F.coalesce(normalized_text(F.col(text_col)), F.lit("")))
    o = old.select(F.col(id_col), fp.alias("old_fp"))
    n = new.select(F.col(id_col), fp.alias("new_fp"))
    status = (F.when(F.col("old_fp").isNull(), F.lit("added"))
              .when(F.col("new_fp").isNull(), F.lit("removed"))
              .when(F.col("old_fp") == F.col("new_fp"),
                    F.lit("unchanged"))
              .otherwise(F.lit("modified")))
    return (o.join(n, id_col, "full_outer")
            .select(id_col, status.alias("status"), "old_fp", "new_fp"))


def snapshot_diff_summary(old: DataFrame, new: DataFrame,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """The one-line promotion gate: status counts of
    :func:`snapshot_diff` → ``(status, n_docs)``."""
    return (snapshot_diff(old, new, id_col, text_col)
            .groupBy("status")
            .agg(F.count("*").cast("long").alias("n_docs")))
