"""Embedding similarity search: brute-force cosine top-k + IVF scale path.

North-star extension. The `embeddings` table carries `array<float>`
vectors; two search paths:

* ``cosine_topk``: exact brute force — broadcast the (small) query set,
  score every corpus vector with JVM array intrinsics
  (``zip_with`` + ``aggregate``, no Python), rank per query with a
  partitioned window. The right baseline, and exactly what you run on
  a candidate set after any ANN pruning.
* ``ivf_topk``: inverted-file ANN — k-means-lite centroids learned on
  a driver sample (bounded, like MRFFT's coreset), corpus partitioned
  by nearest centroid, queries probe only the ``nprobe`` nearest
  lists. The scan is pruned by a factor ≈ n_lists/nprobe; at 100 TB
  the cluster assignment is a one-off narrow map and the probe join is
  an equi-join on list id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _dot(a, b):
    """JVM-side dot product of two array columns (double accumulator)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def with_l2_norm(emb: DataFrame, vec_col: str = "embedding",
                 out_col: str = "norm") -> DataFrame:
    return emb.withColumn(out_col, F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding"
                ) -> DataFrame:
    """Exact top-k cosine neighbors per query → (query_id, neighbor_id,
    cosine, rank). Excludes self-matches. Deterministic: ties broken by
    neighbor id."""
    q = with_l2_norm(queries.select(F.col(id_col).alias("query_id"),
                                    F.col(vec_col).alias("q_vec")),
                     "q_vec", "q_norm")
    c = with_l2_norm(corpus.select(F.col(id_col).alias("neighbor_id"),
                                   F.col(vec_col).alias("c_vec")),
                     "c_vec", "c_norm")
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(_dot(F.col("q_vec"), F.col("c_vec"))
                        / (F.col("q_norm") * F.col("c_norm")), 6)
                .alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                          F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)) \
        .where(F.col("rank") <= k)


def _kmeans_lite(sample: np.ndarray, n_lists: int, iters: int = 8,
                 seed: int = 42) -> np.ndarray:
    """Tiny k-means on a driver-side sample (bounded like MRFFT R2)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_lists, len(sample)),
                     replace=False)
    centroids = sample[idx].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(len(centroids)):
            members = sample[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return centroids


def _nearest_lists_expr(centroids: np.ndarray, vec_col, n: int):
    """Column: array of the n nearest centroid ids for a vector.

    Centroid set is tiny (n_lists × dim floats) → embedded as a
    literal array in the plan, the broadcast-variable pattern (X4).
    Scoring is JVM-side: per centroid a dot-based distance, then the
    ids sorted by (distance, id) via array_sort on structs.
    """
    dists = F.array(*[
        F.struct(
            F.aggregate(
                F.zip_with(vec_col, F.array(*[F.lit(float(x)) for x in c]),
                           lambda a, b: (a.cast("double") - b)
                           * (a.cast("double") - b)),
                F.lit(0.0), lambda acc, v: acc + v).alias("dist"),
            F.lit(j).alias("list_id"))
        for j, c in enumerate(centroids)
    ])
    return F.slice(F.transform(F.array_sort(dists), lambda s: s.list_id),
                   1, n)


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_lists: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             sample_size: int = 10_000, seed: int = 42) -> DataFrame:
    """IVF approximate top-k cosine → same schema as ``cosine_topk``.

    Train centroids on a bounded driver sample, assign each corpus
    vector to its nearest list (narrow map), probe the nprobe nearest
    lists per query (explode + equi-join on list_id), exact-score only
    the probed lists. Recall < 1 by design; tests measure it against
    ``cosine_topk``.
    """
    sample = np.array(
        [r[0] for r in
         corpus.select(vec_col).limit(sample_size).collect()],
        dtype=np.float64)
    centroids = _kmeans_lite(sample, n_lists, seed=seed)

    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"))
    c = c.withColumn("list_id",
                     _nearest_lists_expr(centroids, F.col("c_vec"), 1)[0])
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    q = q.withColumn("probe",
                     F.explode(_nearest_lists_expr(centroids,
                                                   F.col("q_vec"), nprobe)))

    nq = with_l2_norm(F.broadcast(q), "q_vec", "q_norm")
    nc = with_l2_norm(c, "c_vec", "c_norm")
    scored = (
        nq.join(nc, nq.probe == nc.list_id)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(_dot(F.col("q_vec"), F.col("c_vec"))
                        / (F.col("q_norm") * F.col("c_norm")), 6)
                .alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                          F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)) \
        .where(F.col("rank") <= k)
