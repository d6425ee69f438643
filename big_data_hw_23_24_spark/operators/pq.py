"""Product quantization (PQ): sub-codebook vector compression and
asymmetric-distance (ADC) search — the tier above int8 quantization on
the ANN ladder (``operators/similarity.py``).

PQ splits each d-dim vector into ``m`` contiguous subvectors and
replaces each with the id of its nearest centroid from a per-subspace
codebook of ``k`` centroids: d floats become m small codes (64×4 bytes
→ 8 bytes here), and distances are approximated without decoding via a
per-query lookup table (LUT): ``dist(q, x) ≈ Σ_j LUT[j][code_j(x)]``
where ``LUT[j][c] = ‖q_j − centroid_{j,c}‖²`` (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — public
method).

Spark-first shapes, all JVM expressions:

* encode: explode each vector to its m (j, subvector) rows (narrow),
  ONE broadcast hash join against the m·k-row codebook table, min-by
  argmin per (vec, subspace) — never a per-row Python loop;
* ADC search: the corpus side joins its (vec, j, code) rows to the
  broadcast (query, j, code)-keyed LUT and sum-aggregates per
  (query, vec) — the scan reads 8-byte codes, not 256-byte vectors,
  and the exact-rerank stage (``cosine_topk`` / brute L2) touches only
  the shortlist, mirroring ``quantized_topk``.

Codebook training (``pq_train``) is per-subspace k-means on a bounded
driver sample (what FAISS does) — iterative and sample-based, so
rows-only; the deterministic encode/search kernels take FIXED
codebooks and carry full DuckDB oracles (the
``embedding_nearest_centroid`` move, applied per subspace).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _subvector_rows(df: DataFrame, m: int, vec_col: str,
                    id_col: str) -> DataFrame:
    """(id, j, sub): each vector exploded to its m contiguous
    subvectors — a narrow map (transform + inline explode), no
    shuffle. Vector length must be divisible by ``m`` (checked at
    runtime via an ANSI-safe filter contract: callers see missing rows
    rather than silently ragged slices)."""
    v = F.col(vec_col).cast("array<double>")
    sub = (F.size(v) / m).cast("int")
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.struct(j.cast("int").alias("j"),
                           F.slice(v, j * sub + 1, sub).alias("sub")))
    return (df.where(F.size(v) % m == 0)
            .select(F.col(id_col), F.inline(subs)))


def fixed_codebooks(df: DataFrame, m: int, k: int,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """Deterministic codebooks for the oracle faces: centroid ``c`` of
    subspace ``j`` is subvector ``j`` of the corpus vector with
    ``id == c`` (the fixed-centroid move of the Lloyd/IVF faces) →
    (j, centroid_id, cv)."""
    return (_subvector_rows(df.where(F.col(id_col) < k), m, vec_col, id_col)
            .select("j", F.col(id_col).cast("int").alias("centroid_id"),
                    F.col("sub").alias("cv")))


def pq_encode(df: DataFrame, codebooks: DataFrame, m: int,
              vec_col: str = "embedding", id_col: str = "vec_id",
              round_to: int = 6) -> DataFrame:
    """Encode every vector → (id, j, code, dist_sq): the long-form PQ
    code table (one row per subspace; ``collect_list`` it back to an
    array at the sink if desired — the long form is what ADC joins
    against anyway). ``dist_sq`` is the subspace quantization error,
    whose sum over j is the vector's reconstruction error.

    One broadcast join (m·k codebook rows) + one min-by aggregate;
    ties broken by centroid_id ascending in both this plan and the
    SQL oracle.
    """
    ex = _subvector_rows(df, m, vec_col, id_col)
    dist = F.aggregate(
        F.zip_with("sub", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)
    return (ex.join(F.broadcast(codebooks), "j")
            .select(F.col(id_col), "j",
                    F.struct(dist.alias("d"),
                             F.col("centroid_id").alias("cid")).alias("s"))
            .groupBy(id_col, "j").agg(F.min("s").alias("b"))
            .select(F.col(id_col), "j",
                    F.col("b.cid").alias("code"),
                    F.round(F.col("b.d"), round_to).alias("dist_sq")))


def pq_adc_topk(codes: DataFrame, queries: DataFrame,
                codebooks: DataFrame, m: int, k_top: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                round_to: int = 6, exclude_self: bool = False) -> DataFrame:
    """Asymmetric-distance top-k → (query_id, neighbor_id, adist,
    rank): for each query, the ``k_top`` corpus vectors with the
    smallest LUT-approximated squared L2 distance.

    The LUT is (query × subspace × centroid) — bounded by
    |queries|·m·k rows, broadcast — so the corpus side is ONE hash
    join on (j, code) plus a (query, vec) sum aggregate: the data
    path reads codes only, never raw vectors. Per-cell LUT distances
    are rounded before summing so cross-engine float summation order
    cannot flip ranks; ties broken by neighbor id.
    """
    lut = (_subvector_rows(queries, m, vec_col, id_col)
           .withColumnRenamed(id_col, "query_id")
           .join(codebooks, "j")
           .select("query_id", "j", F.col("centroid_id").alias("code"),
                   F.round(F.aggregate(
                       F.zip_with("sub", "cv",
                                  lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, x: acc + x),
                       round_to).alias("d")))
    scored = (codes.join(F.broadcast(lut), ["j", "code"])
              .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
              .agg(F.round(F.sum("d"), round_to).alias("adist")))
    if exclude_self:  # before ranking, so rank k really is the k-th other
        scored = scored.where(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k_top))


def pq_rerank_topk(corpus: DataFrame, codes: DataFrame,
                   queries: DataFrame, codebooks: DataFrame, m: int,
                   k_top: int = 10, fetch: int = 40,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   round_to: int = 6) -> DataFrame:
    """The full production PQ search path → (query_id, neighbor_id,
    dist_sq, rank): ADC over the code table produces a ``fetch``-deep
    shortlist (code-bytes scan only), then EXACT squared-L2 reranks
    just those |queries|·fetch pairs against the raw vectors — the
    ``quantized_topk`` two-stage shape with PQ as the cheap stage.

    The rerank join touches the raw-vector table once, filtered to the
    shortlist (an equi-join on the neighbor id — AQE broadcasts the
    shortlist side); exact distances are rounded before ranking, ties
    broken by neighbor id, so results are engine-stable end to end.
    """
    short = pq_adc_topk(codes, queries, codebooks, m, k_top=fetch,
                        exclude_self=True,
                        vec_col=vec_col, id_col=id_col) \
        .select("query_id", "neighbor_id")
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("nv"))
    dist = F.aggregate(
        F.zip_with("qv", "nv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)
    w = Window.partitionBy("query_id").orderBy("dist_sq", "neighbor_id")
    return (short.join(F.broadcast(q), "query_id").join(c, "neighbor_id")
            .select("query_id", "neighbor_id",
                    F.round(dist, round_to).alias("dist_sq"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k_top))


def pq_bucket_pairs(df: DataFrame, codebooks: DataFrame, m: int,
                    threshold: float = 0.95,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    round_to: int = 6) -> DataFrame:
    """Embedding duplicate pairs via PQ-code buckets → (id_a, id_b,
    cosine): vectors whose FULL m-code tuples coincide get an exact
    cosine verification — SemDeDup's cluster-then-verify shape with PQ
    cells as the clusters.

    This is the IDENTITY tier of embedding dedup: identical vectors
    always share a bucket (deterministic quantization), tiny
    perturbations almost always do, but looser similarity has only
    single-cell recall — borderline vectors quantize into different
    cells (measured 14-34% on cosine≥0.4 pairs at coarse configs).
    Use the banded random-hyperplane LSH
    (``similarity.embedding_lsh_duplicates``) when recall at loose
    thresholds matters; use this when the corpus carries re-encoded
    copies of identical content and the cheap bucket key (m small
    ints, computable from stored PQ codes with NO vector read) pays
    for itself.

    Scale shape: candidate generation is a hash equi-join on the
    bounded bucket key (never all-pairs); exact cosine runs only
    inside buckets, whose sizes are the PQ cell occupancies. Pairs
    emitted once with ``id_a < id_b``.
    """
    enc = pq_encode(df, codebooks, m, vec_col=vec_col, id_col=id_col)
    keys = (enc.groupBy(id_col)
            .agg(F.concat_ws("-", F.transform(
                F.sort_array(F.collect_list(F.struct("j", "code"))),
                lambda s: s.code.cast("string"))).alias("bucket")))
    vecs = df.select(F.col(id_col),
                     F.col(vec_col).cast("array<double>").alias("v"))
    side = keys.join(vecs, id_col)
    a = side.select(F.col(id_col).alias("id_a"), "bucket",
                    F.col("v").alias("va"))
    b = side.select(F.col(id_col).alias("id_b"), "bucket",
                    F.col("v").alias("vb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.zip_with(c, c, lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x))
    cos = F.round(dot / (norm("va") * norm("vb")), round_to)
    return (a.join(b, "bucket")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", cos.alias("cosine"))
            .where(F.col("cosine") >= threshold))


def pq_train(df: DataFrame, m: int, k: int,
             vec_col: str = "embedding", id_col: str = "vec_id",
             sample_size: int = 10_000, seed: int = 42) -> DataFrame:
    """Train per-subspace codebooks on a bounded seeded driver sample
    (the FAISS recipe; the sample bound is the L·K-coreset driver-state
    contract) → (j, centroid_id, cv) ready for ``pq_encode``.

    Rows-only by design (k-means init + iteration); quality is pinned
    by recall/reconstruction property tests against exact search.
    """
    from .similarity import _kmeans_lite

    vecs = df.select(F.col(vec_col).cast("array<double>").alias("v")) \
        .where(F.col("v").isNotNull())
    n = vecs.count()
    if n == 0:
        raise ValueError("pq_train: no non-null vectors")
    frac = min(1.0, (sample_size * 1.25) / max(n, 1))
    sample = np.array(
        [r.v for r in vecs.sample(fraction=frac, seed=seed)
         .limit(sample_size).collect()], dtype=np.float64)
    d = sample.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rows = []
    for j in range(m):
        cents = _kmeans_lite(sample[:, j * sub:(j + 1) * sub], k,
                             seed=seed + j)
        rows += [(j, c, [float(x) for x in cents[c]])
                 for c in range(len(cents))]
    return df.sparkSession.createDataFrame(
        rows, "j int, centroid_id int, cv array<double>")
